package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics operators (SURVEY.md §2.4-2.6): event histograms,
  * daily counts with calendar gap-fill, sort/limit readbacks, rolling
  * windows. All single-shuffle groupBy/window plans; partial aggregation
  * (map-side combine) comes free from Catalyst.
  */
object Analytics {

  /** A1 event histogram with grand total via rollup
    * (reference `chatbot.py:150-163` + python-side sum).
    */
  def eventHistogram(events: DataFrame, typeCol: String = "event_type"): DataFrame =
    events
      .rollup(col(typeCol))
      .count()
      .select(coalesce(col(typeCol), lit("TOTAL")).as(typeCol), col("count").as("n"))

  /** A2/ST6 daily tumbling counts (reference
    * `automl_anomaly_detection.py:188-213` — there derived from file
    * names; here from the event log itself, the 100 TB-sane source).
    */
  def dailyCounts(
      events: DataFrame,
      tsCol: String = "ts",
      filterExpr: Column = lit(true)
  ): DataFrame =
    events
      .filter(filterExpr)
      .groupBy(to_date(col(tsCol)).as("date"))
      .agg(count(lit(1)).cast("double").as("value"))

  /** J4 calendar gap-fill: left-join daily counts against a generated
    * calendar, missing days -> 0.0 (reference
    * `automl_anomaly_detection.py:215-227`). The calendar is a
    * `sequence()` literal — rows are generated at the executor, no
    * driver loop.
    */
  def gapFill(
      daily: DataFrame,
      start: String,
      end: String,
      dateCol: String = "date",
      valueCol: String = "value"
  ): DataFrame = {
    val spark = daily.sparkSession
    val calendar = spark
      .range(1)
      .select(
        explode(
          sequence(to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))
        ).as(dateCol)
      )
    calendar
      .join(daily, Seq(dateCol), "left")
      .na
      .fill(0.0, Seq(valueCol))
  }

  /** O1-O3 deterministic top-k: full ordering (value desc, then tiebreak
    * asc) before limit. A global sort-limit is a TakeOrderedAndProject in
    * the physical plan — only k rows cross the shuffle.
    */
  def topK(df: DataFrame, valueCol: String, tieBreak: String, k: Int): DataFrame =
    df.orderBy(col(valueCol).desc, col(tieBreak).asc).limit(k)

  /** W1 latest-per-key (reference `app/app.py:176-178`): row_number desc
    * over (key) ordered by (ts, tiebreak) -> first row.
    */
  def latestPerKey(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreak: String
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieBreak).desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Top-k per group (the distributed form of O-class readbacks): rank
    * within each group, keep k. One shuffle on the group keys.
    */
  def topKPerGroup(
      df: DataFrame,
      groupKeys: Seq[String],
      valueCol: String,
      tieBreak: String,
      k: Int
  ): DataFrame = {
    val w = Window
      .partitionBy(groupKeys.map(col): _*)
      .orderBy(col(valueCol).desc, col(tieBreak).asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event exceeds `gapSeconds`. Session ids are a running sum
    * of session-start flags per key — pure window algebra, one shuffle;
    * the streaming analogue is `flatMapGroupsWithState` with a session
    * timeout.
    */
  def sessionize(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreak: String,
      gapSeconds: Long
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull || unix_micros(col(tsCol).cast("timestamp")) -
        unix_micros(prev.cast("timestamp")) > gapSeconds * 1000000L,
      1L
    ).otherwise(0L)
    events
      .withColumn("_new", isNew)
      .withColumn(
        "session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
      )
      .drop("_new")
  }

  /** W3 rolling aggregate over the preceding `window` rows (inclusive of
    * current) per partition key.
    */
  def rolling(
      df: DataFrame,
      partitionKeys: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      window: Int
  ): DataFrame = {
    val w = Window
      .partitionBy(partitionKeys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-window, 0)
    df.withColumn("rolling_avg", avg(col(valueCol)).over(w))
      .withColumn("rolling_std", stddev_samp(col(valueCol)).over(w))
  }
}
