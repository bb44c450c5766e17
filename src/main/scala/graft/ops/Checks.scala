package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality constraint checks (deequ/dbt-test-style) — the
  * validation pass a pipeline runs before publishing a table. Each
  * check returns the VIOLATIONS (empty result = constraint holds), so
  * results plug into alerting/quarantine flows directly.
  *
  * Scale: duplicate/orphan checks are one hash shuffle each;
  * null-profiling is a single map-side aggregate regardless of column
  * count.
  */
object Checks {

  /** Key tuples occurring more than once (uniqueness violation). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Null count per column, one pass (long format: col_name, n_nulls).
    * An empty input reports 0 per column (not null — `sum` over zero
    * rows is null and would break `> 0` gates and Long decoders).
    */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val agged = df.select(
      cols.map(c => coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c)): _*
    )
    agged
      .select(
        explode(
          array(cols.map(c => struct(lit(c).as("col_name"), col(c).as("n_nulls"))): _*)
        ).as("x")
      )
      .select(col("x.col_name"), col("x.n_nulls"))
  }

  /** Referential-integrity violations: child rows whose key has no match
    * in `parent` (left anti join — AQE broadcasts a small parent).
    * SQL FK semantics: rows with a NULL key part are NOT violations
    * (a nullable FK is legitimately unset) and are excluded; use
    * [[nullCounts]] to police nullability separately.
    */
  def orphans(
      child: DataFrame,
      parent: DataFrame,
      childKeys: Seq[String],
      parentKeys: Seq[String]
  ): DataFrame = {
    val cond = childKeys
      .zip(parentKeys)
      .map { case (c, p) => child(c) === parent(p) }
      .reduce(_ && _)
    child
      .filter(childKeys.map(col(_).isNotNull).reduce(_ && _))
      .join(parent, cond, "left_anti")
  }
}
