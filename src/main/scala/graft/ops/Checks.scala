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

  /** Key-skew profile: the top-`topK` hottest key values with their
    * row share and the hot/mean ratio — the measurement that decides
    * whether a join/agg key needs salting ([[Skew]]) or AQE skew-join
    * handling BEFORE the job falls over at scale, and the evidence a
    * post-mortem cites after. One hash shuffle (the per-key count);
    * the share/ratio math re-aggregates the counted frame. Deterministic
    * output: ties break on the key's string form, shares truncate to 4
    * decimals, the ratio uses integer counts over an exact row total.
    *
    * NULL keys are counted under the sentinel `"<null>"` rather than
    * dropped or left as SQL NULL: a NULL-heavy column is one of the
    * most common real skew culprits (every NULL lands in one shuffle
    * partition), and a literal NULL key would also make the tie-break
    * engine-dependent (Spark orders NULLS FIRST ascending, DuckDB
    * NULLS LAST) — the sentinel keeps the ordering total and portable.
    *
    * Known collision, accepted: a key whose STRING FORM is literally
    * `"<null>"` merges with the NULL bucket (counts and shares
    * combine). For skew DIAGNOSIS that conflation is harmless — both
    * populations hash to one shuffle partition only if they collide in
    * the real key space, and a corpus using `"<null>"` as a live value
    * has bigger problems — but it is a conflation: callers needing
    * exact NULL accounting should pre-map NULLs to a sentinel outside
    * their key's value space before profiling.
    */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df
      .groupBy(coalesce(col(keyCol).cast("string"), lit("<null>")).as("key_value"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("total_rows"),
      count(lit(1)).as("n_keys")
    )
    counts
      .orderBy(col("n").desc, col("key_value").asc)
      .limit(topK)
      .crossJoin(broadcast(totals))
      .select(
        col("key_value"),
        col("n"),
        (floor(col("n") * 10000.0 / col("total_rows")) / 10000.0).as("share"),
        // hot-key multiple of the mean per-key count: > ~8-10 on a join
        // key is where a 1000-executor shuffle develops stragglers
        (floor(col("n") * col("n_keys") * 10000.0 / col("total_rows")) / 10000.0)
          .as("x_mean")
      )
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
