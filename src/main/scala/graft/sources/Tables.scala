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

  /** Time-window scan of events with the predicate pushed to the RAW
    * int64 nanosecond column — a filter on the converted `ts` lands above
    * the projection and never reaches the parquet reader (observed:
    * PushedFilters=[IsNotNull(ts)] only). At scale this is the
    * difference between a range-pruned scan and reading every row group.
    * Bounds are UTC wall-clock strings; lo exclusive, hi inclusive
    * (matching `ts > lo AND ts <= hi`).
    */
  def eventsBetween(spark: SparkSession, dir: String, lo: String, hi: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def ns(s: String): Long =
      java.time.LocalDateTime
        .parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
        .getEpochSecond * 1000000000L
    spark.read
      .parquet(s"$dir/events.parquet")
      .filter(col("ts") > ns(lo) && col("ts") <= ns(hi))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
