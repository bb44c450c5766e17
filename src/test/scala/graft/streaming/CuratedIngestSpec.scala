package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Pins for the gated streaming corpus loop
  * ([[CorpusIngest.ingestCuratedBatch]]): cold-start warmup (quality
  * gate only), warmed perplexity gate dropping token salad, full
  * redelivery as a strict no-op (corpus AND model), the documented
  * stream-fit model semantic on resubmission, and quality-fail docs
  * never reaching the corpus.
  */
class CuratedIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def good(id: Long, tag: String) =
    (id, s"the quick brown fox jumps over the lazy dog $tag")

  test("gates, warmup, replay no-op, stream-fit model semantics") {
    val tmp = Files.createTempDirectory("curated").toString
    val (corpus, bloom, model) = (s"$tmp/corpus", s"$tmp/bloom", s"$tmp/model")
    def run(batch: org.apache.spark.sql.DataFrame, id: Long) =
      CorpusIngest.ingestCuratedBatch(
        batch, id, corpus, bloom, model,
        minQuality = 0.5, maxAvgNll = 6.0, nBuckets = 1024,
        warmupGrams = 50L, expectedItems = 10000L)

    // batch 0 (cold): 40 good docs + 1 spam doc. Perplexity gate is
    // skipped (model empty) — only the quality gate runs.
    val b0 = ((1L to 40L).map(i => good(i, s"tok$i")) :+
      (90L, Seq.fill(10)("spam").mkString(" "))).toDF("doc_id", "text")
    val s0 = run(b0, 0L)
    assert(s0 === CorpusIngest.CurateIngestStats(41L, 40L, 40L))
    assert(spark.read.parquet(corpus).count() === 40L)
    val model0 = spark.read.parquet(model)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // batch 1 (warm): a fresh good doc passes both gates; token salad
    // passes quality (distinct words) but dies at the perplexity gate
    val b1 = Seq(good(50L, "tokNEW"), (91L, "zxq1 wvy2 rrt3 pps4 kkm5 lln6 oop7 qqr8 sst9 uuv0"))
      .toDF("doc_id", "text")
    val s1 = run(b1, 1L)
    assert(s1 === CorpusIngest.CurateIngestStats(2L, 2L, 1L))
    assert(spark.read.parquet(corpus).count() === 41L)
    val model1 = spark.read.parquet(model)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(model1.values.sum > model0.values.sum)

    // full redelivery of batch 1: the model marker (which commits LAST)
    // proves the batch fully ran, so the redelivery is a whole-batch
    // no-op — gates are NOT re-evaluated (re-gating against the model
    // that now includes batch 1's own counts could derive a DIFFERENT
    // set and append docs a clean run never kept), corpus and model
    // stay untouched
    val s1r = run(b1, 1L)
    assert(s1r === CorpusIngest.CurateIngestStats(0L, 0L, 0L, replayed = true))
    assert(spark.read.parquet(corpus).count() === 41L)
    val model1r = spark.read.parquet(model)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(model1r === model1)

    // batch 2 resubmits an already-ingested doc: corpus keeps one copy,
    // but the stream-fit model counts it again (documented trade)
    val s2 = run(Seq(good(60L, "tok1")).toDF("doc_id", "text"), 2L)
    assert(s2.gated === 1L)
    assert(spark.read.parquet(corpus).count() === 41L) // same text as doc 1
    val model2 = spark.read.parquet(model)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(model2.values.sum > model1.values.sum)

    // late redelivery of batch 0 (the ADVICE r10 window: model committed
    // and long since warm, checkpoint lost): under gate re-evaluation
    // the perplexity gate — skipped cold — would now run; the marker
    // makes it a no-op instead
    val corpusBefore = spark.read.parquet(corpus).collect().toSet
    val s0r = run(b0, 0L)
    assert(s0r.replayed && s0r.gated === 0L)
    assert(spark.read.parquet(corpus).collect().toSet === corpusBefore)
    val model0r = spark.read.parquet(model)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(model0r === model2)

    // quality-fail text never reached the corpus at any point
    assert(spark.read.parquet(corpus).filter(col("text").contains("spam")).count() === 0L)
  }
}
