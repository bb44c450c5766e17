package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-data
  * curation. Randomness is replaced by ordering on `md5(id)`: the
  * permutation is uniform for hash purposes, yet reproducible across
  * engines, runs, and partitionings — no `rand(seed)` (whose draw order
  * depends on partitioning) and no driver-side state. Every operator is
  * one window shuffle on the group keys.
  */
object Sampling {

  private def hashOrder(idCol: String) = md5(col(idCol).cast("string"))

  /** Deterministic "random" n-per-group sample: rank rows inside each
    * stratum by md5(id) and keep the first n. The per-group analog of
    * reservoir sampling, exactly reproducible.
    */
  def perGroupSample(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      n: Int
  ): DataFrame = {
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(hashOrder(idCol), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Mixture construction under a per-stratum budget: walk each group in
    * md5(id) order accumulating `weightCol` (e.g. token counts) and keep
    * rows while the running total stays within `budget` — "take ~N
    * tokens per source", the standard mixing step before training. A row
    * that crosses the budget is kept (budgets are soft caps); everything
    * after it is dropped.
    */
  def budgetPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      weightCol: String,
      budget: Long
  ): DataFrame = {
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(hashOrder(idCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(weightCol)).over(w))
      .filter(col("_cum") - col(weightCol) < budget)
      .drop("_cum")
  }
}
