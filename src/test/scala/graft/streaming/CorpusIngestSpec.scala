package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Streaming corpus ingest: cross-batch dedup must hold across
  * micro-batches, full redeliveries (at-least-once -> exactly-once
  * corpus content), and the bloom-before-append crash window.
  */
class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("streamed ingest dedups within and across batches; full redelivery adds nothing") {
    val tmp = Files.createTempDirectory("corpus").toString
    val srcDir = s"$tmp/src"
    val corpus = s"$tmp/corpus"
    val bloom = s"$tmp/bloom.bin"
    Files.createDirectories(Paths.get(srcDir))

    val batch1 = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text")).toDF("doc_id", "text")
    val batch2 = Seq((4L, "beta text"), (5L, "gamma text")).toDF("doc_id", "text")

    batch1.coalesce(1).write.mode("append").parquet(srcDir)
    val q = CorpusIngest.dedupedIngest(
      CorpusIngest.fileDocStream(spark, srcDir), corpus, bloom, s"$tmp/ckpt", expectedItems = 1000L)
    q.processAllAvailable()
    batch2.coalesce(1).write.mode("append").parquet(srcDir)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(corpus)
    // in-batch dup (doc 3) and cross-batch dup (doc 4) dropped; keeper is min doc_id
    assert(got.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 5L))
    assert(got.select("fingerprint").distinct().count() === 3)
    assert(Files.exists(Paths.get(bloom)))

    // at-least-once: a fresh checkpoint redelivers EVERY file; corpus
    // content must not change (bloom + anti-join drop all of it)
    val q2 = CorpusIngest.dedupedIngest(
      CorpusIngest.fileDocStream(spark, srcDir), corpus, bloom, s"$tmp/ckpt2", expectedItems = 1000L)
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 5L))
  }

  test("bloom sizing is read from the state header, not the caller's params") {
    // batch 2 arrives with a wildly different expectedItems (e.g. a
    // config change between deploys): the delta must still merge with
    // the stored filter because sizing comes from the file header
    val tmp = Files.createTempDirectory("corpus3").toString
    val corpus = s"$tmp/corpus"
    val bloom = s"$tmp/bloom.bin"
    CorpusIngest.ingestBatch(
      Seq((1L, "one text")).toDF("doc_id", "text"), corpus, bloom, expectedItems = 100L)
    CorpusIngest.ingestBatch(
      Seq((1L, "one text"), (2L, "two text")).toDF("doc_id", "text"),
      corpus, bloom, expectedItems = 3999999L) // would size differently if honored
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("crash between bloom swap and corpus append replays losslessly") {
    val tmp = Files.createTempDirectory("corpus2").toString
    val corpus = s"$tmp/corpus"
    val bloom = s"$tmp/bloom.bin"
    val batch = Seq((10L, "delta text"), (11L, "epsilon text")).toDF("doc_id", "text")

    CorpusIngest.ingestBatch(batch, corpus, bloom, expectedItems = 1000L)
    // simulate the crash window: bloom persisted, corpus append lost
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete(): Unit
    }
    deleteRec(new java.io.File(corpus))
    assert(Files.exists(Paths.get(bloom)) && !Files.exists(Paths.get(corpus)))

    // replay: every row is bloom-positive but the corpus can't confirm
    // membership -> rows append (no silent loss)
    CorpusIngest.ingestBatch(batch, corpus, bloom, expectedItems = 1000L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet === Set(10L, 11L))

    // and a THIRD delivery with the corpus intact drops everything
    CorpusIngest.ingestBatch(batch, corpus, bloom, expectedItems = 1000L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet === Set(10L, 11L))
  }
}
