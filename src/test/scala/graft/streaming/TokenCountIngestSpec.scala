package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.ops.Bpe

/** Live token accounting through the frozen at-rest BPE model:
  * streamed table == batch recompute bit-identically, replay no-op,
  * and the ingest session never refits (model read only).
  */
class TokenCountIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val trainCorpus = Seq(
    (1L, ("low " * 5).trim, "s1"),
    (2L, ("lower " * 2).trim, "s1"),
    (3L, ("newest " * 6).trim, "s2"),
    (4L, ("widest " * 3).trim, "s2")
  ).toDF("doc_id", "text", "source")

  test("streamed (source -> n_docs, n_bpe) == batch recompute; replay no-op; no refit") {
    spark.sql("DROP TABLE IF EXISTS tok_ingest_model")
    val merges = Bpe.fitAndWriteModel(trainCorpus, "text", "tok_ingest_model", nMerges = 8)

    val tmp = Files.createTempDirectory("tokingest").toString
    val path = s"$tmp/counts"
    val b1 = Seq(
      (10L, "low lower lowest", "s1"),
      (11L, "newest low", "s2")
    ).toDF("doc_id", "text", "source")
    val b2 = Seq(
      (12L, "widest newest newest", "s2"),
      (13L, Option.empty[String].orNull: String, "s1") // null text counts 0 tokens, 1 doc
    ).toDF("doc_id", "text", "source")

    // a FRESH session ingests without refitting (shared catalog only)
    import scala.jdk.CollectionConverters._
    val fresh = spark.newSession()
    def inFresh(df: org.apache.spark.sql.DataFrame) =
      fresh.createDataFrame(df.collect().toSeq.asJava, df.schema)
    assert(TokenCountIngest.ingestTokenCountBatch(
      inFresh(b1), 0L, "text", "doc_id", "source", "tok_ingest_model", path))
    assert(TokenCountIngest.ingestTokenCountBatch(
      inFresh(b2), 1L, "text", "doc_id", "source", "tok_ingest_model", path))
    // redelivery of batch 1 must not double-count
    assert(!TokenCountIngest.ingestTokenCountBatch(
      inFresh(b1), 0L, "text", "doc_id", "source", "tok_ingest_model", path))

    val gotMap = spark.read.parquet(path)
      .select($"source", $"n_docs", $"n_bpe")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch recompute over the union, through the same model
    val all = b1.unionByName(b2)
    val want = Bpe.tokenCounts(all, "text", "doc_id", merges)
      .join(all.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bpe").as("n_bpe"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotMap === want)
    assert(gotMap("s1")._1 === 2L) // null-text doc still counts as a doc
    spark.sql("DROP TABLE tok_ingest_model")
  }

  test("a doc_id repeated WITHIN a batch counts once (at-least-once in-batch dedup)") {
    spark.sql("DROP TABLE IF EXISTS tok_ingest_model2")
    val merges = Bpe.fitAndWriteModel(trainCorpus, "text", "tok_ingest_model2", nMerges = 8)
    val tmp = Files.createTempDirectory("tokingest2").toString
    val path = s"$tmp/counts"
    val clean = Seq((20L, "low lower", "s1"), (21L, "newest", "s2"))
      .toDF("doc_id", "text", "source")
    // the same rows redelivered twice INSIDE one micro-batch
    val doubled = clean.unionByName(clean)
    assert(TokenCountIngest.ingestTokenCountBatch(
      doubled, 0L, "text", "doc_id", "source", "tok_ingest_model2", path))
    val got = spark.read.parquet(path)
      .select($"source", $"n_docs", $"n_bpe")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = Bpe.tokenCounts(clean, "text", "doc_id", merges)
      .join(clean.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bpe").as("n_bpe"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want, "duplicated in-batch rows must not inflate n_docs/n_bpe")
    spark.sql("DROP TABLE tok_ingest_model2")
  }
}
