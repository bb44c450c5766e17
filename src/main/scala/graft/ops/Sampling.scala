package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Sequence packing: assign each row a sequence id such that every
    * sequence holds ~`budget` of `weightCol` (token counts) — the
    * batching step that turns a curated corpus into fixed-size training
    * sequences. Rows walk their stratum in md5(id) order; a row joins
    * the sequence its cumulative START falls in (docs are not split;
    * sequences overflow by at most one row's weight, the standard greedy
    * approximation). One window shuffle per stratum — strata (e.g.
    * language) bound the sort, no global ordering.
    */
  def packSequences(
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
    df.withColumn("seq_id", floor((sum(col(weightCol)).over(w) - col(weightCol)) / budget))
  }

  /** Uniform bucket in [0, 4096) from the first 3 hex chars of md5(id) —
    * entirely map-side (no global ordering/window, which would funnel
    * 100 TB through one partition) and engine-portable: both Spark and
    * the oracle compute it from `md5`, `substring` and `instr` alone.
    */
  def hashBucket(idCol: String): Column = {
    val hex = hashOrder(idCol) // the object's one canonical id hash
    def nib(i: Int): Column = instr(lit("0123456789abcdef"), substring(hex, i, 1)) - 1
    (nib(1) * 256 + nib(2) * 16 + nib(3)).cast("long")
  }

  /** Deterministic train/val/test assignment: md5-bucket each row and
    * carve [0, 4096) by cumulative fractions. A row's split depends only
    * on its id — stable under reprocessing, appends, and repartitioning
    * (the property `rand(seed)` splits lack). A null id yields a null
    * split (propagated explicitly — silently concentrating null-id rows
    * into one split would skew train/test separation).
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)]
  ): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall { case (_, f) => f > 0.0 && f <= 1.0 },
      "each split fraction must be in (0, 1]")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val bucket = hashBucket(idCol)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    // fold over all but the last split: the final carve is the otherwise
    val carve = splits.init.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) =>
        when(bucket < math.round(hi * 4096).toInt, lit(name)).otherwise(acc)
    }
    df.withColumn("split", when(bucket.isNull, lit(null)).otherwise(carve))
  }

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

  /** Temperature-flattened mixture sampling — the multilingual "alpha
    * sampling" scheme (XLM-R / mT5): draw ~`targetRows` rows whose
    * per-source share is proportional to n_s^0.5 instead of n_s, so
    * small sources are up-weighted relative to their natural share and
    * no single giant source dominates the mix.
    *
    * Fixed at alpha = 0.5 because `sqrt` is IEEE-correctly-rounded —
    * identical in every engine — which keeps the draw bit-reproducible
    * cross-engine (the q60 determinism contract); a generic alpha would
    * ride on `pow`, whose last-ulp behavior is libm-specific. The one
    * float SUM (the sqrt normalizer) goes through DECIMAL(30,12) so it
    * is exact and order-independent; quotas are then
    * `min(n_s, floor(targetRows * sqrt(n_s) / z))`, filled in md5(id)
    * order. Scale: one count aggregation, one broadcast quota join, one
    * per-source window — the [[perGroupSample]] shape.
    */
  def temperatureSample(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      targetRows: Long
  ): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
    val z = counts
      .agg(sum(sqrt(col("_n").cast("double")).cast("decimal(30,12)")).cast("double").as("_z"))
    val quotas = counts
      .crossJoin(broadcast(z))
      .select(
        col(sourceCol),
        least(
          col("_n"),
          floor(lit(targetRows.toDouble) * sqrt(col("_n").cast("double")) / col("_z"))
        ).as("_k")
      )
    val w = Window
      .partitionBy(col(sourceCol))
      .orderBy(hashOrder(idCol), col(idCol))
    df.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("_k"))
      .drop("_rn", "_k")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis '06):
    * each row draws an exponential key e = −ln(u)/w from its own
    * deterministic uniform u, and the k smallest keys are the sample —
    * inclusion probability rises with weight, no row twice, one pass.
    *
    * The draw is seeded-hash pseudorandomness, not entropy:
    * u = h / 2^24 with h = (md5(seed ‖ id) first 24 bits) + 1, and
    * −ln(u) = glog(2^24) − glog(h) via the IEEE-exact integer-argument
    * [[Dsir.glog]] — the whole key is bit-identical in any IEEE-754
    * engine (q93's DuckDB oracle) and under any partitioning. Ties
    * break by id.
    *
    * Scale: key is a map-side projection; selection is sort-limit
    * (TakeOrdered — only k rows per partition cross the wire), the
    * [[graft.ops.Analytics.topK]] shape.
    */
  def weightedSample(
      df: DataFrame,
      weightCol: String,
      idCol: String,
      k: Int,
      seed: String
  ): DataFrame = {
    val h = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 6), 16, 10)
      .cast("long") + 1
    val e = (Dsir.glog(lit(16777216L)) - Dsir.glog(h)) / col(weightCol).cast("double")
    df.withColumn("es_key", e)
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }
}
