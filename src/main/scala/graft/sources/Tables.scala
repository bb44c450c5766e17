package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the test corpus (TESTDATA.md).
  *
  * The `events` table's `ts` column has shipped in two physical
  * encodings across testdata generations: TIMESTAMP(NANOS) (which
  * Spark's parquet reader rejects unless nanos are read as long — we
  * then convert with exact integer division: `div`, not `/`, because
  * ns-since-epoch exceeds 2^53 and a double intermediate would lose
  * microseconds) and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false
  * (surfacing as TIMESTAMP_NTZ). Both generators write UTC wall-clock
  * values and the engine runs with session timezone UTC, so both
  * normalize to the same TimestampType instants. The branch inspects
  * the loaded schema, not a config, so a mixed-generation lake reads
  * correctly file-set by file-set.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  private def raw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already TimestampType
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(raw(spark, dir))

  /** Time-window scan of events with the predicate pushed to the RAW
    * stored column — a filter on the converted `ts` lands above the
    * projection and never reaches the parquet reader (observed:
    * PushedFilters=[IsNotNull(ts)] only). At scale this is the
    * difference between a range-pruned scan and reading every row group.
    * Bounds are UTC wall-clock strings; lo exclusive, hi inclusive
    * (matching `ts > lo AND ts <= hi`). The pushed literal matches the
    * stored type: int64 nanos for the NANOS generation, an NTZ
    * timestamp literal for the MICROS one.
    */
  def eventsBetween(spark: SparkSession, dir: String, lo: String, hi: String): DataFrame = {
    val df = raw(spark, dir)
    def ldt(s: String): java.time.LocalDateTime =
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    val (loLit, hiLit): (Column, Column) = df.schema("ts").dataType match {
      case LongType =>
        def ns(s: String): Long =
          ldt(s).toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
        (lit(ns(lo)), lit(ns(hi)))
      case TimestampNTZType => (lit(ldt(lo)), lit(ldt(hi)))
      case _ =>
        def inst(s: String) = java.time.Instant.from(ldt(s).atOffset(java.time.ZoneOffset.UTC))
        (lit(inst(lo)), lit(inst(hi)))
    }
    normalizeTs(df.filter(col("ts") > loLit && col("ts") <= hiLit))
  }
}
