package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The core CDC operator: diff two wide snapshots keyed on one column and
  * emit insert/update/delete events.
  *
  * Semantics follow the reference's `detect_changes`
  * (reference `app/app.py:119-264`), re-expressed as ONE distributed
  * full-outer join instead of driver-side dict comparison:
  *
  *  - rows only in `newDf`                      -> insert
  *  - rows in both with any differing column    -> update (+ per-column
  *    `{old,new}` change map, reference `app/app.py:230-232`)
  *  - rows only in `prevDf`                     -> delete
  *
  * Reference quirks preserved (SURVEY.md §2.3 J1):
  *  (a) duplicate keys collapse last-row-wins (`app/app.py:206-207`) —
  *      here "last" is defined by an explicit `orderCol` (deterministic),
  *      falling back to input order via monotonically_increasing_id;
  *  (b) update comparison iterates columns of the NEW row only — columns
  *      dropped from the schema do not trigger updates (`app/app.py:230`);
  *  (c) comparison is null-safe: null == null is no-change (`<=>`), the
  *      Python `None == None` behavior after NaN normalization;
  *  (d) comparison happens on STRINGS — every value is cast to string
  *      first, matching the reference's all-string degradation.
  *
  * Scale notes: a single shuffle on the key column (the full-outer join);
  * the per-column change map is computed with codegen'd map expressions
  * (`map_zip_with` + `map_filter`), no UDFs, no driver-side state. At
  * 100 TB both sides shuffle-partition on `keyCol`; if one snapshot is
  * dimension-sized the join becomes a broadcast automatically under AQE.
  */
object SnapshotDiff {

  /** Canonicalize a wide row to (key string, map col->string value). */
  private def canonical(df: DataFrame, keyCol: String, orderCol: Option[String]): DataFrame = {
    val dataCols = df.columns.filter(_ != keyCol)
    val kv = dataCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val ord = orderCol.map(col(_).cast("long")).getOrElse(monotonically_increasing_id())
    df.select(
      col(keyCol).cast("string").as("_key"),
      map(kv.toIndexedSeq: _*).as("_vals"),
      ord.as("_ord")
    )
  }

  /** Last-row-wins key dedup (reference `app/app.py:206-207`). */
  private def dedup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("_key").orderBy(col("_ord").desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn", "_ord")
  }

  /** Diff `newDf` against `prevDf`.
    *
    * @param orderCol optional column defining "last" for last-row-wins
    *                 dedup; when None, input file order is used.
    * @return columns: event_type, key_column, key_value, old_values,
    *         new_values, changed (map col -> struct(old,new))
    */
  def diff(
      newDf: DataFrame,
      prevDf: Option[DataFrame],
      keyCol: String,
      orderCol: Option[String] = None
  ): DataFrame = {
    val n = dedup(canonical(newDf, keyCol, orderCol)).as("n")
    prevDf match {
      case None =>
        // missing previous snapshot => every row inserts (app/app.py:156-174)
        n.select(
          lit("insert").as("event_type"),
          lit(keyCol).as("key_column"),
          col("_key").as("key_value"),
          map().cast("map<string,string>").as("old_values"),
          col("_vals").as("new_values"),
          insertChangedMap(col("_vals")).as("changed")
        )
      case Some(prev) =>
        val p = dedup(canonical(prev, keyCol, orderCol)).as("p")
        val joined = n.join(p, col("n._key") === col("p._key"), "full_outer")
        val emptyMap = map().cast("map<string,string>")
        // coalesce the missing side to an empty map so the change map is
        // total: insert -> every new column, delete -> empty (keys absent
        // from the new map are filtered), update -> differing columns
        val newVals = coalesce(col("n._vals"), emptyMap)
        val oldVals = coalesce(col("p._vals"), emptyMap)
        val eventType = when(col("p._key").isNull, "insert")
          .when(col("n._key").isNull, "delete")
          .otherwise("update")
        joined
          .select(
            eventType.as("event_type"),
            lit(keyCol).as("key_column"),
            coalesce(col("n._key"), col("p._key")).as("key_value"),
            oldVals.as("old_values"),
            newVals.as("new_values"),
            // inserts report EVERY new column (a null-valued column is
            // still "new"); the null-safe compare only applies to updates
            when(col("p._key").isNull, insertChangedMap(newVals))
              .otherwise(changedMap(oldVals, newVals))
              .as("changed")
          )
          // updates with zero changed columns are no-ops, not events
          // (reference emits an update only `if changes`, app/app.py:233-246)
          .filter(col("event_type") =!= "update" || size(col("changed")) > 0)
    }
  }

  /** Per-column `{old,new}` change map over NEW-row columns only.
    * `map_zip_with` pairs values by key; entries whose key is absent from
    * the new map (dropped columns) are filtered out, as are unchanged
    * pairs (null-safe compare).
    */
  /** Composite-key diff (engine extension — the reference keys on the
    * single first column only): same insert/update/delete + change-map
    * semantics as [[diff]], keyed on `keyCols`, which come back as
    * ordinary columns instead of the stringified key_value. The CDC kind
    * column is named `change_type` (not `event_type`) so key columns
    * named event_type don't collide. Null key parts join null-safely
    * (`<=>` on the key struct). One shuffle on the composite key.
    */
  def diffKeys(
      newDf: DataFrame,
      prevDf: DataFrame,
      keyCols: Seq[String],
      orderCol: Option[String] = None
  ): DataFrame = {
    def canon(df: DataFrame): DataFrame = {
      val dataCols = df.columns.filterNot(keyCols.contains)
      val kv = dataCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
      val ord = orderCol.map(col(_).cast("long")).getOrElse(monotonically_increasing_id())
      df.select(
        struct(keyCols.map(c => col(c).cast("string").as(c)): _*).as("_key"),
        map(kv.toIndexedSeq: _*).as("_vals"),
        ord.as("_ord")
      )
    }
    val n = dedup(canon(newDf)).as("n")
    val p = dedup(canon(prevDf)).as("p")
    val joined = n.join(p, col("n._key") <=> col("p._key"), "full_outer")
    val emptyMap = map().cast("map<string,string>")
    val newVals = coalesce(col("n._vals"), emptyMap)
    val oldVals = coalesce(col("p._vals"), emptyMap)
    val key = coalesce(col("n._key"), col("p._key"))
    joined
      .select(
        keyCols.map(c => key.getField(c).as(c)) ++ Seq(
          when(col("p._key").isNull, "insert")
            .when(col("n._key").isNull, "delete")
            .otherwise("update")
            .as("change_type"),
          oldVals.as("old_values"),
          newVals.as("new_values"),
          when(col("p._key").isNull, insertChangedMap(newVals))
            .otherwise(changedMap(oldVals, newVals))
            .as("changed")
        ): _*
      )
      .filter(col("change_type") =!= "update" || size(col("changed")) > 0)
  }

  /** Insert change map: every new column, old side null — including
    * columns whose new value is null (the unchanged-filter's
    * `!(null <=> null)` would otherwise silently drop them and
    * `size(changed)` would undercount the row's columns).
    */
  private def insertChangedMap(newVals: Column): Column =
    map_zip_with(
      map().cast("map<string,string>"),
      newVals,
      (_, o, nv) => struct(o.as("old"), nv.as("new"))
    )

  private def changedMap(oldVals: Column, newVals: Column): Column = {
    val zipped = map_zip_with(
      oldVals,
      newVals,
      (_, o, nv) => struct(o.as("old"), nv.as("new"))
    )
    map_filter(
      zipped,
      (k, v) =>
        map_contains_key(newVals, k) && !(v.getField("old") <=> v.getField("new"))
    )
  }

  /** Convenience: diff + event envelope columns (uuid, ts, company/table),
    * yielding the full CdcEvent shape (reference `app/app.py:152-170`).
    */
  def diffAsEvents(
      newDf: DataFrame,
      prevDf: Option[DataFrame],
      keyCol: String,
      companyId: String,
      tableName: String,
      orderCol: Option[String] = None
  ): DataFrame =
    diff(newDf, prevDf, keyCol, orderCol).select(
      expr("uuid()").as("event_id"),
      col("event_type"),
      lit(companyId).as("company_id"),
      lit(tableName).as("table_name"),
      current_timestamp().as("ts"),
      col("key_column"),
      col("key_value"),
      col("old_values"),
      col("new_values"),
      col("changed")
    )
}
