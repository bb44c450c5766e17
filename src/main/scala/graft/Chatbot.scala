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

  /** Route a question to its query. Anomaly/prediction return the
    * reference's canned-stub shape (`chatbot.py:168-191`) as one-row
    * frames; historical runs the real aggregation.
    */
  def query(spark: SparkSession, eventLog: DataFrame, question: String): DataFrame = {
    import spark.implicits._
    classify(question) match {
      case Historical => historical(eventLog)
      case AnomalyIntent =>
        Seq(("anomaly", "see Pipeline.anomalyScan results")).toDF("intent", "answer")
      case Prediction =>
        Seq(("prediction", "forecasting is not implemented")).toDF("intent", "answer")
    }
  }
}
