package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** End-to-end pipeline pin for [[Curation.curate]]: a synthetic corpus
  * where every stage has designed-in casualties, so the per-stage
  * survivor counts are exactly predictable — and each doc class dies at
  * the stage built to catch it (boilerplate-only at 1, word-repeat spam
  * at the heuristic gate, token salad at the perplexity gate — AFTER
  * passing the heuristics, which is the point of running both — exact
  * copies at dedup).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // every doc carries the 2-token header; minDocsBoiler=70 < 72 docs
  // strips it, while body segments (shared by <= 60 docs) survive
  private val header = "begin legal "
  private def commonBody(i: Int) = s"the quick brown fox tok$i jumps over the lazy dog"

  private lazy val docs = {
    val commonUnique = (1 to 56).map(i => (i.toLong, header + commonBody(i)))
    val copies = (57 to 60).map(i => (i.toLong, header + commonBody(9999)))
    val spam = (61 to 65).map(i => (i.toLong, header + Seq.fill(10)("spam").mkString(" ")))
    val salad = (66 to 70).map(i =>
      (i.toLong, header + (1 to 10).map(j => s"zx${i}q$j").mkString(" ")))
    val pureHeader = (71 to 72).map(i => (i.toLong, "begin legal"))
    (commonUnique ++ copies ++ spam ++ salad ++ pureHeader).toDF("doc_id", "text")
  }

  test("five stages: each designed casualty dies at its stage, counts exact") {
    val (kept, counts) = Curation.curate(
      docs,
      "text",
      "doc_id",
      targetCond = col("doc_id") <= 28,
      minQuality = 0.5,
      maxAvgNll = 6.0,
      segTokens = 2,
      minDocsBoiler = 70,
      keepFraction = 0.5,
      exactRank = true // opt-in: exact rank keeps the count pin exact
    )
    assert(counts.input === 72L)
    assert(counts.afterBoilerplate === 70L) // -2 pure-header docs
    assert(counts.afterQuality === 65L) // -5 spam (quality 0.42 < 0.5)
    assert(counts.afterPerplexity === 60L) // -5 salad (avg_nll ~7.9 > 6)
    assert(counts.afterDedup === 57L) // 4 identical copies -> 1 keeper
    assert(counts.kept === 29L) // ceil(57 * 0.5)

    val rows = kept.collect()
    assert(rows.length === 29)
    // header stripped from every kept doc; bodies intact
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      assert(!t.contains("begin legal"), t)
      assert(t.startsWith("the quick brown fox"), t)
    }
    // dedup keeper is the min id of the copy group when it survives
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids.exists(i => i >= 58 && i <= 60))
  }

  test("stripRepeatedSegments composes BEFORE curate on the shared (doc_id, clean_text) shape") {
    // a crawl page that repeats its own spam phrase is polluted even
    // when no other doc shares it — corpus-frequency boilerplate can't
    // strip it. Run the within-doc pass first, then the pipeline: the
    // repeats vanish, and curate sees the de-repeated text.
    val looping = Seq((1001L,
      header + commonBody(1) + " " + Seq.fill(6)("buy now").mkString(" ")))
    val all = docs.unionByName(looping.toDF("doc_id", "text"))
    val deRepeated = TextAnalysis
      .stripRepeatedSegments(all, "text", "doc_id", segTokens = 2)
      .filter(col("clean_text").isNotNull)
      .select(col("doc_id"), col("clean_text").as("text"))
    val loopedClean = deRepeated.filter($"doc_id" === 1001L).head().getAs[String]("text")
    assert(loopedClean.endsWith("buy now"), loopedClean)
    assert(loopedClean.sliding(7).count(_ == "buy now") === 1, "repeats collapsed to one")
    val (kept, counts) = Curation.curate(
      deRepeated, "text", "doc_id",
      targetCond = col("doc_id") <= 28,
      minQuality = 0.5, maxAvgNll = 6.0, segTokens = 2,
      minDocsBoiler = 70, keepFraction = 0.5, exactRank = true)
    assert(counts.input === 73L)
    assert(kept.count() === counts.kept)
  }

  test("sketch-CDF selection path (the default) runs and keeps a top slice") {
    val (kept, counts) = Curation.curate(
      docs,
      "text",
      "doc_id",
      targetCond = col("doc_id") <= 28,
      maxAvgNll = 6.0,
      segTokens = 2,
      minDocsBoiler = 70,
      keepFraction = 0.5
    )
    assert(counts.afterDedup === 57L)
    val n = kept.count()
    assert(n > 0 && n <= counts.afterDedup)
    // the CDF threshold keeps a HIGH-weight slice: its min weight must
    // be >= the corpus median weight region (sanity, not exactness)
    assert(counts.kept === n)
  }

  test("stage counts come from one flags-join job, not per-stage count() actions") {
    // pin the r11 action shape: the default-path curate derives its
    // six stage counts from ONE flags-join aggregation over the pinned
    // stage frames — the r10 shape ran a dedicated Dataset.count()
    // action per stage, so ANY count() action firing during curate is
    // the regression this guards against.
    val actions = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { actions.add(funcName); () }
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val (_, counts) = Curation.curate(
        docs, "text", "doc_id",
        targetCond = col("doc_id") <= 28,
        maxAvgNll = 6.0, segTokens = 2, minDocsBoiler = 70, keepFraction = 0.5)
      assert(counts.afterDedup === 57L)
      Thread.sleep(1000) // QueryExecutionListener delivery is async
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    val names = actions.asScala.toList
    assert(!names.contains("count"), s"curate ran count() actions: $names")
  }

  test("curateFromModels: at-rest models drive every gate (batch catch-up form)") {
    // frozen models, nothing fitted on the scored batch: boiler
    // frequencies from the 72-doc reference corpus (header n=72 >= 70),
    // surprisal + DSIR gram models from the clean bodies
    val boilerModel = TextAnalysis.boilerFold("text", "doc_id", segTokens = 2)(docs)
    val bodies = (1 to 56).map(i => (i.toLong, commonBody(i))).toDF("doc_id", "text")
    val surprisalModel = Dsir.surprisalFold("text", "doc_id", 4096)(bodies)
    val dsirRaw = Dsir.modelFold("text", "doc_id", 4096)(bodies)
    val dsirTgt = Dsir.modelFold("text", "doc_id", 4096)(bodies.filter(col("doc_id") <= 28))

    // a NEW batch with one casualty per stage
    val batch = Seq(
      (101L, header + commonBody(101)), // passes everything
      (102L, header + commonBody(102)), // passes everything
      (103L, header + commonBody(102)), // post-strip duplicate of 102
      (104L, header + (1 to 10).map(j => s"zzq104w$j").mkString(" ")), // salad: dies at ppl
      (105L, header + Seq.fill(10)("spam").mkString(" ")), // dies at quality
      (106L, "begin legal") // pure boilerplate: dies at stage 0
    ).toDF("doc_id", "text")

    val (kept, counts) = Curation.curateFromModels(
      batch, "text", "doc_id",
      boilerModel, surprisalModel, dsirRaw, dsirTgt,
      minQuality = 0.5, maxAvgNll = 6.0, segTokens = 2, minDocsBoiler = 70,
      keepFraction = 1.0)
    assert(counts === Curation.StageCounts(6L, 5L, 4L, 3L, 2L, 2L))
    val rows = kept.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.keySet === Set(101L, 102L))
    // header stripped by the frozen model before the append
    assert(rows(101L) === commonBody(101))
  }
}
