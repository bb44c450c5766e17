package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hashed-gram multinomial Naive Bayes — the fastText-style linear
  * text classifier every curation pipeline keeps around for language
  * ID and quality/domain routing (CCNet's fastText langid filter, the
  * GPT-3 WebText-vs-CommonCrawl quality classifier). Trains from
  * labeled docs in two aggregations, predicts with one explode + one
  * broadcast join — no iteration, no optimizer state.
  *
  * == Model ==
  *
  * Features are [[Dsir.gramBuckets]] hashed unigram+bigram buckets
  * (md5 → 24 bits → mod nBuckets, bit-identical everywhere). The
  * model is ONE addition-mergeable keyed-count table (the
  * [[TextAnalysis.boilerFold]] / [[graft.streaming.SketchIngest]]
  * convention), rows keyed (kind, label, bucket):
  *
  *  - `("pair", l, b) → c`  gram occurrences of bucket b under label l
  *  - `("docs", l, -1) → d` training docs under label l
  *
  * Label gram totals and the corpus doc count are exact sums over the
  * table, so the WHOLE model (counts + priors) merges by addition —
  * streamed maintenance == batch rebuild bit-identically via
  * `ingestCountBatch`. Bounded at labels × nBuckets rows (the label
  * set is assumed bounded — langs, domains, binary quality).
  *
  * == Scoring, exactly ==
  *
  * Laplace-smoothed log-likelihoods and the log-prior are quantized
  * ONCE per model cell to longs (scale 1e9), all logs via the
  * IEEE-exact integer-argument [[Dsir.glog]]:
  *
  *  - `llq(l,b)  = round((glog(c+1) − glog(tot_l + B)) · 1e9)`
  *  - `llq0(l)   = round((glog(1) − glog(tot_l + B)) · 1e9)` (unseen pair)
  *  - `prq(l)    = round((glog(d_l) − glog(N)) · 1e9)`
  *
  * A doc's score under label l is the EXACT long sum
  * `prq + Σ_found llq + (n_grams − n_found) · llq0` — associative and
  * order-independent, so the argmax (tie-broken by label asc) is
  * deterministic under any partitioning and bit-equal in any IEEE-754
  * engine (DuckDB oracle q88).
  *
  * == Shape at 100 TB ==
  *
  * Fit: one gram explode carrying the label (no re-join), one shuffle
  * to the (label, bucket) grid. Predict: gram explode, broadcast of
  * the ≤ labels×nBuckets model, one shuffle to (doc, label) partial
  * sums, argmax windowed per doc — the corpus never joins itself and
  * the model never shuffles.
  */
object Classify {

  /** Fit the keyed-count model table from labeled docs. */
  def nbFit(
      train: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: String,
      nBuckets: Int = 4096
  ): DataFrame =
    nbFold(textCol, idCol, labelCol, nBuckets)(train)

  /** The fold form ([[TextAnalysis.boilerFold]] convention): micro-batch
    * → its keyed counts, mergeable by exact addition under
    * `SketchIngest.ingestCountBatch(keyCols = Seq("kind","label","bucket"))`.
    */
  def nbFold(
      textCol: String,
      idCol: String,
      labelCol: String,
      nBuckets: Int = 4096
  ): DataFrame => DataFrame = { train =>
    val pairs = Dsir
      .gramBucketsWith(train, textCol, idCol, nBuckets, "label" -> col(labelCol))
      .groupBy("label", "bucket")
      .agg(count(lit(1)).as("n"))
      .select(lit("pair").as("kind"), col("label"), col("bucket"), col("n"))
    val docs = train
      .groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
      .select(lit("docs").as("kind"), col("label"), lit(-1L).as("bucket"), col("n"))
    pairs.unionByName(docs)
  }

  /** Classify docs against a fitted model: one row per doc —
    * (doc_id, pred, score_q, n_grams), pred = argmax label
    * (ties → label asc), score_q the exact quantized-long log-posterior
    * numerator of the winning label.
    */
  def nbClassify(
      df: DataFrame,
      model: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int = 4096
  ): DataFrame = {
    // the model plan feeds four subtrees (pair counts, label totals,
    // doc counts, corpus total) — pin it so an inline-fitted model's
    // gram explode doesn't re-run per subtree (measured 3.4 s -> well
    // under half on q88; an at-rest model is already a cheap scan)
    val m = Materialize(model)
    val pc = m.filter(col("kind") === "pair").select("label", "bucket", "n")
    val lt = pc.groupBy("label").agg(sum("n").as("tot"))
    val ld = m.filter(col("kind") === "docs").select(col("label"), col("n").as("docs_l"))
    val nd = ld.agg(sum("docs_l").as("n_docs"))

    val q = (c: Column) => round(c * lit(1e9)).cast("long")
    // per-(label,bucket) quantized log-likelihoods (≤ labels×B rows)
    val llq = pc
      .join(lt, "label")
      .select(
        col("label"),
        col("bucket"),
        q(Dsir.glog(col("n") + 1) - Dsir.glog(col("tot") + nBuckets)).as("llq")
      )
    // per-label stats: unseen-pair fallback + prior
    val l0 = lt
      .join(ld, "label")
      .crossJoin(nd)
      .select(
        col("label"),
        q(Dsir.glog(lit(1)) - Dsir.glog(col("tot") + nBuckets)).as("llq0"),
        q(Dsir.glog(col("docs_l")) - Dsir.glog(col("n_docs"))).as("prq")
      )

    // grams feed both the per-doc totals and the model join — one
    // tokenize+hash pass, not two (the q79 diamond-fix shape)
    val grams = Materialize(Dsir.gramBuckets(df, textCol, idCol, nBuckets))
    val ng = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val found = grams
      .join(broadcast(llq), "bucket")
      .groupBy("doc_id", "label")
      .agg(sum("llq").as("fsum"), count(lit(1)).as("fn"))

    val ids = df.select(col(idCol).as("doc_id"))
    val scored = ids
      .crossJoin(broadcast(l0))
      .join(ng, Seq("doc_id"), "left")
      .join(found, Seq("doc_id", "label"), "left")
      .select(
        col("doc_id"),
        col("label"),
        (col("prq") + coalesce(col("fsum"), lit(0L)) +
          (coalesce(col("n_grams"), lit(0L)) - coalesce(col("fn"), lit(0L))) * col("llq0"))
          .as("score_q"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams")
      )

    val w = Window.partitionBy("doc_id").orderBy(col("score_q").desc, col("label"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("score_q"), col("n_grams"))
  }

  /** Convenience: fit on `train`, classify `test`. */
  def nbTrainPredict(
      train: DataFrame,
      test: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: String,
      nBuckets: Int = 4096
  ): DataFrame =
    nbClassify(test, nbFit(train, textCol, idCol, labelCol, nBuckets), textCol, idCol, nBuckets)

  /** Classifier evaluation: the (actual, predicted) confusion grid with
    * exact counts and each cell's share of its actual-class row
    * (`frac` — the diagonal cells are per-class recall). One shuffle to
    * the label-pair grid; the row totals come from a window over that
    * tiny grid, never a second pass over the predictions.
    */
  def confusionMatrix(preds: DataFrame, actualCol: String, predCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = preds
      .groupBy(col(actualCol), col(predCol))
      .agg(count(lit(1)).as("n"))
    grid.withColumn(
      "frac",
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col(actualCol))).cast("double")
    )
  }
}
