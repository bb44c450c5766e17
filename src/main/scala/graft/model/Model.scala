package graft.model

import java.sql.Timestamp

/** Core data model of the engine.
  *
  * Mirrors the reference's central IR (reference `app/app.py:80-89`
  * `CDCEvent` pydantic model; `cdc_data_dump.sql:27-40` `cdc_events`
  * table) re-expressed as Spark-encodable case classes. Payloads are
  * `Map[String,String]` — the Spark equivalent of the reference's JSONB
  * `old_values`/`new_values` blobs where every value degrades to string
  * (reference Delta schema is all-string, see SURVEY.md §1.2).
  */
final case class CdcEvent(
    event_id: String,
    event_type: String, // insert | update | delete
    company_id: String,
    table_name: String,
    ts: Timestamp,
    key_column: String,
    key_value: String,
    old_values: Map[String, String],
    new_values: Map[String, String],
    // per-column change set: col -> (old, new); only differing columns
    // (reference computes this at app/app.py:230-232)
    changed: Map[String, ColChange]
)

final case class ColChange(old: String, `new`: String)

/** One version row of the SCD-Type-2 temporal table
  * (reference `cdc_data_dump.sql:108-118` `company_data`).
  */
final case class VersionedRecord(
    company_id: String,
    table_name: String,
    record_key: String,
    data: Map[String, String],
    valid_from: Timestamp,
    valid_to: Option[Timestamp],
    is_current: Boolean
)

/** One scored point of a daily anomaly series
  * (reference `automl_anomaly_detection.py:233-246`).
  */
final case class AnomalyPoint(
    ts: String, // 'YYYY-MM-DD'
    value: Double,
    expected_value: Double,
    score: Double,
    is_anomaly: Boolean
)
