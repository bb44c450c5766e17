package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test corpus (TESTDATA.md).
  *
  * The `events` table stores TIMESTAMP(NANOS) which Spark's parquet
  * reader rejects; we read nanos as long (legacy conf) and convert to a
  * proper TimestampType with exact integer division (`div`, not `/` —
  * ns-since-epoch exceeds 2^53 so a double intermediate would lose
  * microseconds).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
