package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-Type-2 temporal table semantics (reference `consumer.py:152-197`,
  * `cdc_data_dump.sql:108-118`): per record key keep every version with
  * `[valid_from, valid_to)` and an `is_current` flag.
  *
  * The reference mutates rows one event at a time (UPDATE expire + INSERT,
  * ~110 events/s ceiling, BASELINE.md). Here the whole chain is ONE window
  * computation over the append-only event log — no in-place updates, no
  * per-event round-trips; this is the merge-on-read design that survives
  * 100 TB (the event log is partitionable by key hash / date, and the
  * window shuffles once on the grouping keys).
  */
object Scd2 {

  /** Fold an event log into the SCD2 version table.
    *
    * @param events columns: event_id, event_type (insert|update|delete),
    *               `ts`, plus `keys` identifying the record, plus a
    *               payload column (e.g. `new_values`).
    * @param keys   record identity, e.g. Seq(company_id, table_name, key_value)
    * @param tsCol  event-time column; versions are ordered by (ts, event_id)
    *               so replays are deterministic under ts ties.
    * Idempotent on event_id (reference ST1: UNIQUE + ON CONFLICT DO
    * NOTHING -> dropDuplicates).
    */
  def apply(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      payloadCol: String = "new_values",
      eventIdCol: String = "event_id",
      eventTypeCol: String = "event_type"
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(eventIdCol))
    events
      .dropDuplicates(eventIdCol)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn(
        "is_current",
        // a delete closes the chain: the delete's own "version" is a
        // tombstone, never current (consumer.py:184-197 delete path)
        col("valid_to").isNull && col(eventTypeCol) =!= "delete"
      )
      .select(
        keys.map(col) ++ Seq(
          col(eventIdCol),
          col(eventTypeCol),
          col(payloadCol).as("data"),
          col("valid_from"),
          col("valid_to"),
          col("is_current")
        ): _*
      )
  }

  /** Current-state view: `filter(is_current)` (reference P4,
    * `deltaprocessing.py:119`).
    */
  def currentState(scd2: DataFrame): DataFrame = scd2.filter(col("is_current"))

  /** Incremental merge for streaming `foreachBatch`: recompute the version
    * chain only for keys touched by the batch (reference J2 point-lookup
    * generalized to a set-wise merge; no Delta jar in this environment so
    * this is the MERGE equivalent).
    *
    * Scale: `existing` is only scanned for the touched keys (a broadcast
    * semi-join when the batch is small), and only those groups re-window.
    * A backfill batch can carry more keys than the driver can broadcast,
    * so the hint is size-guarded: past `broadcastKeyLimit` distinct keys
    * the joins fall back to shuffle semi/anti joins (AQE may still
    * upgrade them at runtime if the actual build side turns out small).
    * The touched-key set is materialized once ([[Materialize]]) so the
    * guard's count and both joins reuse it instead of re-running the
    * batch's distinct three times per micro-batch.
    */
  def merge(
      existing: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      payloadCol: String = "new_values",
      broadcastKeyLimit: Long = 4000000L
  ): DataFrame = {
    val touched = Materialize(batch.select(keys.map(col): _*).distinct())
    // limit() takes an Int — clamp so an over-Int limit can neither make
    // it negative (AnalysisException) nor wrap and falsely pass the guard
    val probe = math.min(broadcastKeyLimit + 1, Int.MaxValue.toLong).toInt
    val fitsBroadcast = touched.limit(probe).count() <= broadcastKeyLimit
    val touchedHinted = if (fitsBroadcast) broadcast(touched) else touched
    val untouched = existing.join(touchedHinted, keys, "left_anti")
    // rebuild events for touched keys from their existing versions + batch
    val replay = existing
      .join(touchedHinted, keys, "left_semi")
      .select(
        keys.map(col) ++ Seq(
          col("event_id"),
          col("event_type"),
          col("data").as(payloadCol),
          col("valid_from").as(tsCol)
        ): _*
      )
      .unionByName(
        batch.select(
          keys.map(col) ++ Seq(
            col("event_id"),
            col("event_type"),
            col(payloadCol),
            col(tsCol)
          ): _*
        )
      )
    untouched.unionByName(apply(replay, keys, tsCol, payloadCol))
  }

  /** Point-in-time lookup: the version valid at `at` (temporal query over
    * the interval table; reference has only is_current lookups, J2).
    */
  def asOf(scd2: DataFrame, at: java.sql.Timestamp): DataFrame =
    scd2.filter(
      col("valid_from") <= lit(at) &&
        (col("valid_to").isNull || col("valid_to") > lit(at)) &&
        col("event_type") =!= "delete"
    )
}
