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
  *      by exact quantized weight, ties broken by doc_id)
  *
  * Returns the kept docs (doc_id + cleaned text + logw_q) plus a
  * per-stage survivor-count report for pipeline observability — the
  * numbers a curation run logs at every stage.
  *
  * Scale shape: every stage is one of the audited per-operator shapes
  * (explodes + bounded-model broadcasts + hash-shuffles on doc ids);
  * the composition adds NO new join pattern — stages hand off slim
  * (doc_id, text) frames, and each stage's corpus pass is pinned by
  * that operator's own plan discipline. The final top-fraction select
  * is a count + filter on the quantized weight rank via window over a
  * single ordered column — at true 100 TB scale swap it for the
  * sketch-CDF threshold ([[Sketches.cdfFromSketch]] on logw_q) to
  * avoid the global sort; both forms are provided.
  */
object Curation {

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
    * `exactRank = false` replaces the final global-sort selection with
    * the sketch-CDF threshold (scale path; keeps ≈ the same fraction,
    * boundary docs may differ by one bin's mass).
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
      exactRank: Boolean = true
  ): (DataFrame, StageCounts) = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0,1]")
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"), targetCond.as("_tgt"))
    val nInput = base.count()

    // 1. boilerplate: rebuild text from surviving segments; drop docs
    //    that were pure boilerplate (clean_text null)
    val stripped = TextAnalysis
      .stripBoilerplate(base, "text", "doc_id", segTokens, minDocsBoiler)
      .filter(col("clean_text").isNotNull)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(base.select(col("doc_id"), col("_tgt")), Seq("doc_id"))
    val afterBoiler = Materialize(stripped, eager = false)
    val nBoiler = afterBoiler.count()

    // 2. heuristic quality gate
    val qualIds = TextAnalysis
      .quality(afterBoiler, "text", "doc_id")
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"))
    val afterQual = Materialize(afterBoiler.join(qualIds, Seq("doc_id")), eager = false)
    val nQual = afterQual.count()

    // 3. perplexity gate, model fitted on the post-quality corpus
    val pplIds = Dsir
      .bigramSurprisal(afterQual, "text", "doc_id")
      .filter(col("avg_nll") <= maxAvgNll)
      .select(col("doc_id"))
    val afterPpl = Materialize(afterQual.join(pplIds, Seq("doc_id")), eager = false)
    val nPpl = afterPpl.count()

    // 4. exact dedup: keep each fingerprint's min-id doc
    val keepers = Dedup.exact(afterPpl, "text", "doc_id").select(col("keeper").as("doc_id"))
    val afterDedup = Materialize(afterPpl.join(keepers, Seq("doc_id")), eager = false)
    val nDedup = afterDedup.count()

    // 5. DSIR selection against the labeled target subset
    val weighted = Dsir
      .importanceWeightsWithin(afterDedup, col("_tgt"), "text", "doc_id")
      .select(col("doc_id"), col("logw_q"))
    val scored = afterDedup.join(weighted, Seq("doc_id"))
    val selected =
      if (exactRank) {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("logw_q").desc, col("doc_id"))
        val total = scored.count()
        val keepN = math.max(1L, math.ceil(total * keepFraction).toLong)
        scored.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= keepN).drop("_rk")
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
    val kept = selected.select(col("doc_id"), col("text"), col("logw_q"))
    val nKept = kept.count()

    (kept, StageCounts(nInput, nBoiler, nQual, nPpl, nDedup, nKept))
  }
}
