package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable histogram sketches — the pre-aggregation shape that makes
  * percentile dashboards affordable at 100 TB. Instead of rescanning the
  * raw corpus for every quantile question, each partition (day, source,
  * shard) folds its rows once into a fixed-width histogram (`nBins`
  * longs); sketches then MERGE by integer addition — associative,
  * commutative, exact — so a month is the sum of 30 day-sketches and a
  * corpus rollup is the sum of its source rows, each merge touching
  * O(groups × bins) rows instead of the raw data.
  *
  * Chosen over KLL/t-digest deliberately: those sketches are
  * merge-order-sensitive (their compaction randomizes), which breaks
  * both the engine's cross-engine oracle discipline and reproducibility
  * across Spark's nondeterministic partition merge order. A fixed-grid
  * histogram is deterministic under ANY merge order, and with bins sized
  * to the telemetry range the quantile error is bounded by one bin
  * width (asserted in SketchesSpec).
  *
  * Reference semantics: the reference's dashboard rollups
  * (`app/app.py:214-246`) recompute value histograms from the raw frame
  * on every request; this operator family is the at-scale replacement.
  *
  * Values are CLAMPED into [lo, hi): below-range rows land in bin 0,
  * above-range rows in bin nBins-1 (documented trade — no separate
  * under/overflow bins keeps the bin id arithmetic identical in Spark
  * and the DuckDB oracle, and tail clamping only widens the error of
  * quantiles that already sit on the configured boundary).
  */
object Sketches {

  /** Bin id for a value: floor((clamp(v) - lo) / width), in [0, nBins). */
  def binOf(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    require(nBins > 0 && hi > lo, "need hi > lo and nBins > 0")
    val w = (hi - lo) / nBins
    least(greatest(floor((v.cast("double") - lit(lo)) / lit(w)), lit(0.0)), lit((nBins - 1).toDouble))
      .cast("long")
  }

  /** Fold rows into one histogram row per (groupCols, bin): a map-side
    * partial aggregation followed by one shuffle on the group keys —
    * the only pass that ever sees the raw data. Empty bins are absent
    * (sparse representation); merge and quantile read treat absence as
    * zero.
    */
  def histogramSketch(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      lo: Double,
      hi: Double,
      nBins: Int
  ): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+ binOf(col(valueCol), lo, hi, nBins).as("bin")): _*)
      .agg(count(lit(1)).as("n"))

  /** Merge sketches down to a coarser grouping (or to a single corpus
    * row with `newGroups = Nil`): exact long addition per bin. This is
    * the operation that must NOT see raw data — it runs on O(groups ×
    * bins) rows, so rolling 1000 shard-sketches into a corpus sketch is
    * driver-trivial no matter how big the shards were.
    */
  def mergeSketches(sketch: DataFrame, newGroups: Seq[String]): DataFrame =
    sketch.groupBy((newGroups.map(col) :+ col("bin")): _*).agg(sum(col("n")).as("n"))

  /** Quantile estimates from a sketch: for each probability p, locate
    * the bin containing rank p·N and interpolate linearly inside it.
    * Error ≤ one bin width by construction (SketchesSpec pins this
    * against exact percentiles). Two window passes over the sketch rows
    * (bins, not raw data) + an explode of the literal prob list — cost
    * is independent of the data the sketch summarizes.
    *
    * The arithmetic is pure long/literal-double IEEE ops in a fixed
    * expression shape, so the DuckDB oracle reproduces it bit-exactly.
    */
  def quantilesFromSketch(
      sketch: DataFrame,
      groupCols: Seq[String],
      probs: Seq[Double],
      lo: Double,
      hi: Double,
      nBins: Int
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), "probs in [0,1]")
    val w = (hi - lo) / nBins
    val grp = groupCols.map(col)
    val byBin = Window.partitionBy(grp: _*).orderBy(col("bin"))
    val all = Window.partitionBy((if (grp.isEmpty) Seq(lit(1)) else grp): _*)
    val cum = sketch
      .withColumn("cum", sum(col("n")).over(byBin))
      .withColumn("total", sum(col("n")).over(all))
    // rank is strictly > 0 (greatest with 1e-12) so p=0 resolves to the
    // first populated bin instead of matching no bin at all.
    val ranked = cum
      .crossJoin(spark_explode_probs(probs))
      .withColumn("rank", greatest(col("p") * col("total"), lit(1e-12)))
      .filter(col("cum") >= col("rank") && (col("cum") - col("n")) < col("rank"))
    ranked.select(
      (grp :+ col("p")) :+
        (lit(lo) + (col("bin") + (col("rank") - (col("cum") - col("n"))) / col("n")) * lit(w))
          .as("q_est"): _*
    )
  }

  private def spark_explode_probs(probs: Seq[Double]) = {
    import org.apache.spark.sql.SparkSession
    SparkSession.active.range(1).select(explode(array(probs.map(lit): _*)).as("p"))
  }

  /** Persist a sketch (tiny — O(groups × bins) rows) so later sessions
    * merge it without the raw scan. Plain parquet; readback is
    * spark.read.parquet.
    */
  def writeSketch(sketch: DataFrame, path: String): Unit =
    sketch.write.mode("overwrite").parquet(path)

  /** Equi-depth partition assignment from a (global) histogram sketch:
    * `pid = min(floor(cdf(v) · k), k−1)` — every partition receives
    * ≈1/k of the data MASS regardless of how skewed the value
    * distribution is, and partitions are contiguous value ranges (the
    * property range-joins and sorted writes want). This is the
    * sketch-driven alternative to `repartitionByRange`'s per-job
    * sampling: boundaries are derived from a mergeable at-rest sketch,
    * so they are STABLE across jobs and days (same sketch → same
    * boundaries → co-partitioned outputs), and assignment is a
    * broadcast join + two arithmetic ops per row. Balance error is
    * bounded by the largest bin's mass fraction (same bound as
    * [[cdfFromSketch]], which this composes).
    */
  def equiDepthPartition(
      df: DataFrame,
      valueCol: String,
      sketch: DataFrame,
      lo: Double,
      hi: Double,
      nBins: Int,
      k: Int
  ): DataFrame = {
    require(k > 0, "need k > 0")
    cdfFromSketch(df, valueCol, Nil, sketch, lo, hi, nBins)
      .withColumn(
        "pid",
        least(floor(col("cdf") * k).cast("long"), lit((k - 1).toLong))
      )
      .drop("cdf")
  }

  /** Per-row CDF / rank normalization against a histogram sketch — the
    * scale-correct replacement for `percent_rank()`'s global sort: the
    * sketch (usually of the SAME data, or a persisted one from
    * [[writeSketch]]) is enriched with per-bin cumulative counts (a
    * window over O(groups × bins) rows, NOT the data) and BROADCAST-
    * joined back onto the rows; each value's CDF position is the mass
    * strictly below its bin plus a linear in-bin interpolation. No
    * shuffle of `df` at all — a 100 TB feature-normalization pass is
    * one map-side join. Estimate error ≤ one bin's mass fraction
    * (SketchesSpec pins vs exact percent_rank).
    *
    * Deterministic across engines: cumulative counts are exact longs;
    * the interpolation is the same fixed shape of IEEE-exact ops in
    * Spark and the DuckDB oracle.
    *
    * Rows whose GROUP never appeared in the sketch (new data scored
    * against a persisted sketch from a corpus that had no such group)
    * are NOT dropped: the join back is a left join, and such rows get a
    * NULL `cdf` — the explicit "the model has no mass for this group"
    * signal, distinct from 0.0 (which means "below all of the group's
    * mass"). Callers that want to treat unseen groups as unscorable
    * filter `cdf.isNull`; same-corpus scoring never produces one.
    */
  def cdfFromSketch(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      sketch: DataFrame,
      lo: Double,
      hi: Double,
      nBins: Int
  ): DataFrame = {
    val w = (hi - lo) / nBins
    val grp = groupCols.map(col)
    val byBin = Window.partitionBy(grp: _*).orderBy(col("bin"))
    val all = Window.partitionBy((if (grp.isEmpty) Seq(lit(1)) else grp): _*)
    // densify to the full bin grid per group (still O(groups × bins))
    // BEFORE the join: when scoring NEW data against a persisted
    // sketch, a row may land in a bin the sketch corpus never
    // populated — with a sparse sketch the inner join would silently
    // drop it; the dense n=0 row scores it at cum_below/total, the
    // correct CDF for a value the summarized corpus had no mass at.
    // Same-corpus scoring is unaffected (every hit bin has its row).
    val grid = {
      val bins = explode(sequence(lit(0L), lit((nBins - 1).toLong))).as("bin")
      if (grp.isEmpty) sketch.sparkSession.range(1).select(bins)
      else sketch.select(grp: _*).distinct().select(grp :+ bins: _*)
    }
    val dense = grid
      .join(sketch, groupCols :+ "bin", "left")
      .na.fill(0L, Seq("n"))
    val enriched = dense
      .withColumn("cum_below", sum(col("n")).over(byBin) - col("n"))
      .withColumn("total", sum(col("n")).over(all))
    val frac = least(
      greatest(
        (col(valueCol).cast("double") - (lit(lo) + col("bin") * lit(w))) / lit(w),
        lit(0.0)
      ),
      lit(1.0)
    )
    df.filter(col(valueCol).isNotNull)
      .withColumn("bin", binOf(col(valueCol), lo, hi, nBins))
      .join(broadcast(enriched), groupCols :+ "bin", "left")
      .withColumn("cdf", (col("cum_below") + col("n") * frac) / col("total"))
      .drop("bin", "cum_below", "n", "total")
  }

  /** Robust clamping (winsorization) against sketch quantiles: caps
    * `valueCol` into the per-group [pLow, pHigh] quantile band derived
    * from a (possibly at-rest / streamed) histogram sketch — the
    * outlier-taming preprocessing step before scale-sensitive features.
    * The bounds table is O(groups) rows and BROADCASTS onto the data;
    * the clamp is one `least(greatest(...))` projection — the corpus
    * never shuffles. Appends `<valueCol>_winsor`.
    */
  def winsorizeFromSketch(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      sketch: DataFrame,
      pLow: Double,
      pHigh: Double,
      lo: Double,
      hi: Double,
      nBins: Int
  ): DataFrame = {
    require(pLow < pHigh, s"need pLow < pHigh, got $pLow >= $pHigh")
    val q = quantilesFromSketch(sketch, groupCols, Seq(pLow, pHigh), lo, hi, nBins)
    val bounds = q
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(when(col("p") === pLow, col("q_est"))).as("_qlo"),
        min(when(col("p") === pHigh, col("q_est"))).as("_qhi")
      )
    df.join(broadcast(bounds), groupCols)
      .withColumn(
        s"${valueCol}_winsor",
        least(greatest(col(valueCol).cast("double"), col("_qlo")), col("_qhi"))
      )
      .drop("_qlo", "_qhi")
  }

  /** Misra–Gries heavy hitters with EXACT confirmation: every item of
    * `itemCol` whose total count is ≥ `minCount`, with its exact
    * count — guaranteed complete (not approximate output; the sketch
    * only prunes the candidate space).
    *
    * `minFreq` is a FRACTION of the total item count (so the same
    * query text scales across corpus sizes); the returned set is every
    * item with count ≥ ceil(minFreq · N).
    *
    * Pass 1 runs a capacity-`capacity` Misra–Gries summary per
    * partition (mapPartitions; constant memory per task). MG's bound —
    * an item undercounted by at most n_p/(capacity+1) survives the
    * partition if its local count exceeds that — plus pigeonhole across
    * partitions gives: any item with GLOBAL count > N/(capacity+1)
    * survives in at least one partition summary. Pass 2 semi-joins the
    * corpus against the broadcast candidate set and counts exactly.
    * The completeness precondition minFreq > 1/(capacity+1) is checked
    * up front — violating it would silently return a subset.
    *
    * 100 TB shape: pass 1 is map-side only (≤ capacity+1 rows out per
    * task); candidates are ≤ tasks × capacity rows but in practice
    * ≈ the true heavy set — if a pathological corpus inflates it past
    * broadcast size, re-run pass 2 with a shuffle semi-join (drop the
    * `broadcast` hint); the guarantee is unchanged.
    */
  def heavyHitters(
      items: DataFrame,
      itemCol: String,
      capacity: Int,
      minFreq: Double
  ): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    require(
      minFreq > 1.0 / (capacity + 1),
      s"completeness violated: minFreq=$minFreq must exceed 1/(capacity+1) = " +
        s"1/${capacity + 1} — raise capacity or minFreq"
    )
    val spark = items.sparkSession
    import spark.implicits._
    val toks = items.select(col(itemCol).cast("string").as("item")).filter(col("item").isNotNull)
    // Pass 1: per-partition MG survivors + one (null, n_p) sentinel.
    val summaries = Materialize(
      toks
        .as[String]
        .mapPartitions { it =>
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          var np = 0L
          it.foreach { item =>
            np += 1
            counters.get(item) match {
              case Some(c) => counters.update(item, c + 1)
              case None =>
                if (counters.size < capacity) counters.update(item, 1L)
                else {
                  // decrement-all step; drop zeros
                  val dead = List.newBuilder[String]
                  counters.foreach { case (k, v) =>
                    if (v == 1L) dead += k else counters.update(k, v - 1)
                  }
                  dead.result().foreach(counters.remove)
                }
            }
          }
          counters.iterator.map { case (k, _) => (k, 0L) } ++ Iterator((null: String, np))
        }
        .toDF("item", "np")
    )
    val total =
      summaries.filter(col("item").isNull).agg(sum(col("np"))).as[Option[Long]].head().getOrElse(0L)
    val minCount = math.ceil(minFreq * total).toLong
    val candidates = summaries.filter(col("item").isNotNull).select("item").distinct()
    toks
      .join(broadcast(candidates), "item")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("item").as(itemCol), col("n"))
  }
}
