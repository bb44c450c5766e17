package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** The reference's fourth entry point (`chatbot.py:110-197`): an
  * intent-routed query interface over the event log. The reference
  * classifies intent with an external QA service (`chatbot.py:72-108`)
  * and hard-codes credentials we obviously do not reproduce; a keyword
  * router gives identical routing for its three intents, and only the
  * `historical` path was ever a real query (A1 + P6).
  */
object Chatbot {

  sealed trait Intent
  case object Historical extends Intent
  case object AnomalyIntent extends Intent
  case object Prediction extends Intent

  def classify(question: String): Intent = {
    val q = question.toLowerCase
    if (q.contains("anomal") || q.contains("unusual") || q.contains("outlier")) AnomalyIntent
    else if (q.contains("predict") || q.contains("forecast") || q.contains("will ")) Prediction
    else Historical
  }

  /** `historical`: change counts by event type over the last N days
    * (reference SQL at `chatbot.py:147-166`), with the rollup total the
    * reference computed python-side.
    */
  def historical(eventLog: DataFrame, days: Int = 7): DataFrame = {
    val cutoff = date_sub(current_timestamp().cast("date"), days)
    Analytics.eventHistogram(eventLog.filter(col("ts") >= cutoff))
  }

  /** [[historical]] with a DETERMINISTIC as-of: the last-N-days window
    * anchors at the newest event in the log (one-row agg broadcast into
    * the filter — no driver round trip, no wall clock), so the query is
    * replayable and hash-pinnable (driver oracle q58). The reference's
    * wall-clock variant stays above for live use.
    */
  def historicalAsOf(eventLog: DataFrame, days: Int = 7): DataFrame = {
    val anchor = eventLog.agg(max(to_date(col("ts"))).as("anchor"))
    val recent = eventLog
      .crossJoin(broadcast(anchor))
      .filter(to_date(col("ts")) >= date_sub(col("anchor"), days))
    Analytics.eventHistogram(recent)
  }

  /** `anomaly` readback — REAL results where the reference returns a
    * canned placeholder (`chatbot.py:168-179` answers "No anomalies
    * detected" unconditionally): daily error-count series → rolling
    * z-score (the W3/W4 composition driver query q08 pins) → the top-k
    * anomalies by score with the O2 sort-limit, ties to the earlier
    * date. Deterministic: the series is the log's own calendar, no wall
    * clock.
    */
  def anomalies(
      eventLog: DataFrame,
      k: Int = 5,
      lookback: Int = 7,
      threshold: Double = 2.0
  ): DataFrame = {
    val daily =
      Analytics.dailyCounts(eventLog, filterExpr = col("event_type") === "error")
    // gap-fill over the LOG's calendar (all event types bound the span,
    // one-row agg -> executor-side sequence, no wall clock / no driver
    // round trip). Without it, error-free days vanish from the series:
    // a sparse-error log never reaches Anomaly.score's minPoints and
    // answers "no anomalies" unconditionally — the reference's canned
    // behavior this route exists to replace — and the rolling window
    // spans the last N days WITH errors instead of N calendar days.
    val bounds = eventLog
      .agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
    val filled = Analytics.gapFillToBounds(daily, bounds)
    val scored = graft.ops.Anomaly
      .score(filled, Seq.empty, lookback = lookback, threshold = threshold)
      .filter(col("is_anomaly"))
    Analytics
      .topK(scored, "score", "date", k)
      .select(col("date"), col("value"), col("expected_value"), col("score"))
  }

  /** `prediction` — a real linear forecast where the reference returns
    * a hard-coded stub (`chatbot.py:181-191`: "12 maintenance needs
    * predicted", constant): OLS trend over the daily event counts
    * (exact-moment discipline, [[graft.ops.Stats.trendPerGroup]])
    * extrapolated `horizon` days past the newest day in the log.
    * One scan to daily counts; the fit and the anchor are 1-row
    * broadcasts — no driver round trip, fully deterministic.
    */
  def forecast(eventLog: DataFrame, horizon: Int = 30): DataFrame = {
    val pts = Analytics
      .dailyCounts(eventLog)
      .select(
        lit(1).as("g"),
        datediff(col("date"), lit("1970-01-01").cast("date")).cast("long").as("x"),
        col("value").cast("long").as("y")
      )
    val fit = graft.ops.Stats.trendPerGroup(pts, Seq("g"), "x", "y")
    val anchor = pts.agg(max(col("x")).as("x_max"))
    fit
      .crossJoin(broadcast(anchor))
      .select(
        col("n").as("n_days"),
        col("slope"),
        col("intercept"),
        (col("slope") * (col("x_max") + lit(horizon)).cast("double") + col("intercept"))
          .as("predicted_daily_value"),
        lit(horizon).as("horizon_days")
      )
  }

  /** Route a question to its query — the reference's
    * `intent_handlers` dispatch (`chatbot.py:128-134`), with all three
    * intents backed by real queries (the reference only ever
    * implemented `historical`; its other two handlers return canned
    * placeholders).
    */
  def route(spark: SparkSession, eventLog: DataFrame, question: String): DataFrame =
    classify(question) match {
      case Historical    => historical(eventLog)
      case AnomalyIntent => anomalies(eventLog)
      case Prediction    => forecast(eventLog)
    }

  /** Pre-round-12 name for [[route]]. */
  def query(spark: SparkSession, eventLog: DataFrame, question: String): DataFrame =
    route(spark, eventLog, question)
}
