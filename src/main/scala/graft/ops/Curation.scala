package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed form of the engine's
  * LLM-data operators, in the order real pipelines run them (CCNet /
  * Gopher / DSIR papers' shape):
  *
  *   1. boilerplate strip   ([[TextAnalysis.stripBoilerplate]])
  *   2. heuristic quality gate ([[TextAnalysis.quality]] score ≥ min)
  *   3. perplexity gate     ([[Dsir.bigramSurprisal]] avg_nll ≤ max —
  *      fitted on the post-quality survivors, so token salad that
  *      slipped the heuristics is scored against a cleaner model;
  *      docs with fewer than 2 tokens carry no bigram evidence and
  *      are dropped here)
  *   4. exact dedup         ([[Dedup.exact]] min-id keeper)
  *   5. DSIR selection      ([[Dsir.importanceWeightsWithin]] against
  *      a caller-labeled target subset; keep the top `keepFraction`
  *      by quantized weight)
  *
  * Returns the kept docs (doc_id + cleaned text + logw_q) plus a
  * per-stage survivor-count report for pipeline observability — the
  * numbers a curation run logs at every stage.
  *
  * Scale shape: every stage is one of the audited per-operator shapes
  * (explodes + bounded-model broadcasts + hash-shuffles on doc ids);
  * the composition adds NO new join pattern — stages hand off slim
  * (doc_id, text) frames, and each stage's corpus pass is pinned by
  * that operator's own plan discipline. Stage counts are NOT separate
  * `count()` jobs: every stage frame is lazily pinned, one action
  * materializes the whole chain, and a single flags-join aggregation
  * over the pinned frames reads all six survivor counts in one job.
  *
  * Selection default is the SCALE path: the top-`keepFraction` cut is
  * a threshold on the sketch-CDF of the quantized weight
  * ([[Sketches.cdfFromSketch]] — a broadcast of O(bins) rows, no
  * shuffle of the scored corpus), which keeps ≈ the requested fraction
  * with boundary docs possibly differing by one 1/256 bin's mass from
  * the exact rank cut (the documented trade). `exactRank = true`
  * restores the exact `row_number` cut for oracle-grade runs — that is
  * a single-task global sort (Window with no partitionBy), logged as a
  * warning because at 100 TB it funnels the corpus through one
  * executor; opt into it only when the corpus is known small.
  */
object Curation {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Curation")

  final case class StageCounts(
      input: Long,
      afterBoilerplate: Long,
      afterQuality: Long,
      afterPerplexity: Long,
      afterDedup: Long,
      kept: Long
  )

  /** Run the five-stage pipeline. `targetCond` labels the DSIR target
    * subset over the ORIGINAL columns (e.g. `col("lang") === "en"`).
    * See the object scaladoc for the `exactRank` selection trade
    * (sketch-CDF threshold by default; exact global-sort rank on
    * opt-in, warned — single-task at scale).
    */
  def curate(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      targetCond: Column,
      minQuality: Double = 0.5,
      maxAvgNll: Double = 9.0,
      segTokens: Int = 8,
      minDocsBoiler: Int = 50,
      keepFraction: Double = 0.5,
      exactRank: Boolean = false
  ): (DataFrame, StageCounts) = {
    val (kept, report) = curateDeferred(
      docs, textCol, idCol, targetCond, minQuality, maxAvgNll, segTokens,
      minDocsBoiler, keepFraction, exactRank)
    (kept, report())
  }

  /** [[curate]] with the stage-count report DEFERRED behind a thunk: a
    * caller consuming only the kept frame (the driver query, the soak)
    * never pays the report's flags-join job — the pipeline itself is
    * identical, every stage still pins eagerly. Forcing the thunk runs
    * the one report job over the already-pinned stage frames, exactly
    * the numbers [[curate]] returns.
    */
  def curateDeferred(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      targetCond: Column,
      minQuality: Double = 0.5,
      maxAvgNll: Double = 9.0,
      segTokens: Int = 8,
      minDocsBoiler: Int = 50,
      keepFraction: Double = 0.5,
      exactRank: Boolean = false
  ): (DataFrame, () => StageCounts) = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0,1]")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"), targetCond.as("_tgt"))

    // 1. boilerplate: rebuild text from surviving segments; drop docs
    //    that were pure boilerplate (clean_text null). `_tgt` rides
    //    through the strip's own explode/rebuild (extra passthrough) —
    //    the former re-join of the stripped corpus onto base shuffled
    //    the whole corpus once more for one boolean (guide §2.4)
    val stripped = TextAnalysis
      .stripBoilerplate(base, "text", "doc_id", segTokens, minDocsBoiler, extra = Seq("_tgt"))
      .filter(col("clean_text").isNotNull)
      .select(col("doc_id"), col("clean_text").as("text"), col("_tgt"))
    val afterBoiler = Materialize(stripped)

    // 2. heuristic quality gate — scored in place (quality is a per-row
    //    projection; `keep` carries text/_tgt through), so the gate is
    //    a filter, not an id re-join of the corpus (guide §2.4)
    val afterQual = Materialize(
      TextAnalysis
        .quality(afterBoiler, "text", "doc_id", keep = Seq("text", "_tgt"))
        .filter(col("quality") >= minQuality)
        .select(col("doc_id"), col("text"), col("_tgt"))
    )

    // 3+5 share ONE explode+hash pass: the position table (per-token
    // unigram bucket + right-bigram bucket) is pinned once over the
    // post-quality corpus; the perplexity gate reads its pair view and
    // the DSIR stage reads its gram-multiset view (semi-joined to the
    // dedup survivors). Halves the md5 work vs two independent passes
    // and — at 100 TB — removes a full corpus re-tokenization.
    val posQ = Materialize(
      Dsir.positionBuckets(afterQual, "text", "doc_id", 4096, Seq("_tgt" -> col("_tgt")))
    )

    // 3. perplexity gate, model fitted on the post-quality corpus
    val pplIds = Dsir
      .bigramSurprisalFromPairs(Dsir.pairsFromPositions(posQ))
      .filter(col("avg_nll") <= maxAvgNll)
      .select(col("doc_id"))
    val afterPpl = Materialize(afterQual.join(pplIds, Seq("doc_id")))

    // 4. exact dedup: keep each fingerprint's min-id doc — ranked in
    //    place over the fingerprint partition (ONE shuffle) instead of
    //    Dedup.exact's aggregate + keeper re-join (two); row_number
    //    orderBy doc_id picks exactly the aggregate's min(doc_id)
    val wDedup = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
      .orderBy(col("doc_id"))
    val afterDedup = Materialize(
      afterPpl
        .withColumn("_rn", row_number().over(wDedup))
        .filter(col("_rn") === 1)
        .drop("_rn")
    )

    // 5. DSIR selection against the labeled target subset — gram
    // multiset from the shared position pin, restricted to survivors
    val gDedup = Materialize(
      Dsir
        .gramsFromPositions(posQ, Seq("_tgt"))
        .join(afterDedup.select(col("doc_id")), Seq("doc_id"), "left_semi")
    )
    val weighted = Dsir
      .importanceWeightsFromGramTable(gDedup)
      .select(col("doc_id"), col("logw_q"))
    val scored = afterDedup.join(weighted, Seq("doc_id"))
    val kept = Materialize(
      selectTop(scored, keepFraction, exactRank)
        .select(col("doc_id"), col("text"), col("logw_q"))
    )

    // Stage report in ONE job, DEFERRED: every stage frame above is
    // pinned, so flag-joining them onto the input ids and aggregating
    // reads the materialized blocks — no stage plan re-executes, no
    // per-stage count() actions (the r10 shape ran 6). The thunk means
    // a kept-only consumer never runs even that one job.
    def flagged(df: DataFrame, name: String) =
      df.select(col("doc_id"), lit(true).as(name))
    val report = () => {
      val r = base
        .select(col("doc_id"))
        .join(flagged(afterBoiler, "_s1"), Seq("doc_id"), "left")
        .join(flagged(afterQual, "_s2"), Seq("doc_id"), "left")
        .join(flagged(afterPpl, "_s3"), Seq("doc_id"), "left")
        .join(flagged(afterDedup, "_s4"), Seq("doc_id"), "left")
        .join(flagged(kept, "_s5"), Seq("doc_id"), "left")
        .agg(
          count(lit(1)).as("n0"),
          count(col("_s1")).as("n1"),
          count(col("_s2")).as("n2"),
          count(col("_s3")).as("n3"),
          count(col("_s4")).as("n4"),
          count(col("_s5")).as("n5")
        )
        .head()
      StageCounts(
        r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
    }
    (kept, report)
  }

  /** The pipeline driven entirely by AT-REST models — the catch-up /
    * reprocessing form, and the batch twin of
    * `CorpusIngest.ingestCuratedBatch`'s gate set: nothing is fitted on
    * `docs`; the boilerplate frequent set, the surprisal model, and the
    * DSIR raw/target models are persisted state (from the streaming
    * folds, or frozen snapshots of a previous batch fit), so a run is
    * reproducible against a pinned model version and scoring a new doc
    * batch never touches the corpora the models summarize. Every model
    * join is a broadcast of KB-scale counts — with no fit passes, the
    * whole pipeline shuffles `docs` only on doc_id hashes.
    *
    * Model schemas: `boilerModel` (seg, n) from
    * [[TextAnalysis.boilerFold]]; `surprisalModel` (kind ∈ ctx/big,
    * bucket, n) from [[Dsir.surprisalFold]]; `dsirRaw` / `dsirTgt`
    * (bucket, n) from [[Dsir.modelFold]]. Stage semantics, counts
    * report, and the selection trade match [[curate]].
    */
  def curateFromModels(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      boilerModel: DataFrame,
      surprisalModel: DataFrame,
      dsirRaw: DataFrame,
      dsirTgt: DataFrame,
      minQuality: Double = 0.5,
      maxAvgNll: Double = 9.0,
      segTokens: Int = 8,
      minDocsBoiler: Int = 50,
      keepFraction: Double = 0.5,
      exactRank: Boolean = false
  ): (DataFrame, StageCounts) = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0,1]")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    val afterBoiler = Materialize(
      TextAnalysis
        .stripBoilerplateFromModel(base, "text", "doc_id", segTokens, minDocsBoiler, boilerModel)
        .filter(col("clean_text").isNotNull)
        .select(col("doc_id"), col("clean_text").as("text"))
    )

    // quality gate filtered in place (per-row projection + keep
    // passthrough) — no id re-join of the corpus (guide §2.4)
    val afterQual = Materialize(
      TextAnalysis
        .quality(afterBoiler, "text", "doc_id", keep = Seq("text"))
        .filter(col("quality") >= minQuality)
        .select(col("doc_id"), col("text"))
    )

    // same shared explode+hash pass as curate(): one position pin
    // feeds the surprisal pair view and the DSIR gram view
    val posQ = Materialize(
      Dsir.positionBuckets(afterQual, "text", "doc_id", 4096)
    )

    val pplIds = Dsir
      .bigramSurprisalFromModelsOverPairs(
        Dsir.pairsFromPositions(posQ),
        surprisalModel.filter(col("kind") === "ctx").select(col("bucket"), col("n")),
        surprisalModel.filter(col("kind") === "big").select(col("bucket"), col("n"))
      )
      .filter(col("avg_nll") <= maxAvgNll)
      .select(col("doc_id"))
    val afterPpl = Materialize(afterQual.join(pplIds, Seq("doc_id")))

    // min-id-per-fingerprint ranked in place — see curateDeferred's
    // stage-4 note (one shuffle instead of aggregate + keeper re-join)
    val wDedup = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
      .orderBy(col("doc_id"))
    val afterDedup = Materialize(
      afterPpl
        .withColumn("_rn", row_number().over(wDedup))
        .filter(col("_rn") === 1)
        .drop("_rn")
    )

    val weighted = Dsir
      .importanceWeightsFromModelsOverGrams(
        Dsir
          .gramsFromPositions(posQ)
          .join(afterDedup.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        dsirRaw,
        dsirTgt
      )
      .select(col("doc_id"), col("logw_q"))
    val scored = afterDedup.join(weighted, Seq("doc_id"))
    val kept = Materialize(
      selectTop(scored, keepFraction, exactRank)
        .select(col("doc_id"), col("text"), col("logw_q"))
    )

    def flagged(df: DataFrame, name: String) =
      df.select(col("doc_id"), lit(true).as(name))
    val report = base
      .select(col("doc_id"))
      .join(flagged(afterBoiler, "_s1"), Seq("doc_id"), "left")
      .join(flagged(afterQual, "_s2"), Seq("doc_id"), "left")
      .join(flagged(afterPpl, "_s3"), Seq("doc_id"), "left")
      .join(flagged(afterDedup, "_s4"), Seq("doc_id"), "left")
      .join(flagged(kept, "_s5"), Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n0"),
        count(col("_s1")).as("n1"),
        count(col("_s2")).as("n2"),
        count(col("_s3")).as("n3"),
        count(col("_s4")).as("n4"),
        count(col("_s5")).as("n5")
      )
      .head()

    (
      kept,
      StageCounts(
        report.getLong(0), report.getLong(1), report.getLong(2),
        report.getLong(3), report.getLong(4), report.getLong(5))
    )
  }

  /** Top-`keepFraction` cut on `logw_q` (see the object scaladoc for
    * the trade): sketch-CDF threshold by default; exact global-sort
    * rank on opt-in, warned. The first action here is also what
    * materializes the lazily-pinned stage chain feeding `scored`.
    */
  private def selectTop(scored: DataFrame, keepFraction: Double, exactRank: Boolean): DataFrame =
    if (exactRank) {
      log.warn(
        "Curation exactRank = true: exact selection ranks via a global-sort " +
          "window (single task) — fine for oracle-grade small corpora, a bottleneck at " +
          "scale; the default sketch-CDF threshold (exactRank = false) is the scale path")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("logw_q").desc, col("doc_id"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      // keepN rides the same single-task pass as the rank window
      // (count over the unpartitioned frame) instead of a separate
      // count() job; ceil(long→double · frac) is the identical IEEE
      // expression the driver-side math.ceil computed
      scored
        .withColumn("_rk", row_number().over(w))
        .withColumn(
          "_keepN",
          greatest(lit(1L), ceil(count(lit(1)).over(wAll) * lit(keepFraction)))
        )
        .filter(col("_rk") <= col("_keepN"))
        .drop("_rk", "_keepN")
    } else {
      // scale path: no global sort — threshold on the sketch CDF of
      // the quantized weight (higher logw_q => higher cdf; keep top
      // keepFraction by mass)
      val Array(b) = scored
        .agg(min(col("logw_q")).as("mn"), max(col("logw_q")).as("mx"))
        .collect()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      if (mn == mx) scored
      else {
        val sk = Sketches.histogramSketch(
          scored, "logw_q", Nil, mn.toDouble, mx.toDouble + 1.0, 256)
        Sketches
          .cdfFromSketch(scored, "logw_q", Nil, sk, mn.toDouble, mx.toDouble + 1.0, 256)
          .filter(col("cdf") >= 1.0 - keepFraction)
          .drop("cdf")
      }
    }
}
