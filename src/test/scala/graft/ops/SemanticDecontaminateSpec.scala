package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Embedding-level benchmark decontamination: the paraphrase case the
  * n-gram check can't see, plus the at-rest index probe form.
  */
class SemanticDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // An 8-dim corpus of three well-separated directions plus one doc
  // (id 4) whose PARAPHRASED copy sits in the eval set: same direction,
  // rescaled and nudged — no shared surface form, cosine ≈ 0.999.
  private lazy val corpus = Seq(
    (1L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (3L, Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)),
    (4L, Seq(0.5f, 0.5f, 0.5f, 0.5f, 0f, 0f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  private lazy val evalSet = Seq(
    // paraphrase of corpus doc 4: 1.3× rescale + tiny nudge
    (100L, Seq(0.66f, 0.64f, 0.65f, 0.65f, 0.01f, 0f, 0f, 0f)),
    // unrelated eval question
    (101L, Seq(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f))
  ).toDF("vec_id", "embedding")

  test("flags the planted paraphrase duplicate; clean docs keep (0, null, false)") {
    val got = TextAnalysis
      .semanticDecontaminate(corpus, evalSet, "embedding", "vec_id", dim = 8,
        threshold = 0.85)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3)))
    assert(got.length === 4, "one row per corpus doc, clean or not")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(4L)._2 === 1L && byId(4L)._4, "paraphrase must be flagged")
    assert(byId(4L)._3.exists(_.asInstanceOf[Double] >= 0.999))
    for (id <- Seq(1L, 2L, 3L)) {
      assert(byId(id)._2 === 0L && !byId(id)._4, s"doc $id is clean")
      assert(byId(id)._3.isEmpty, "no similarity is not similarity 0")
    }
  }

  test("at-rest index probe == the inline form's flagged subset; threshold honored") {
    spark.sql("DROP TABLE IF EXISTS decon_idx")
    Dedup.writeEmbeddingLshIndex(corpus, "embedding", "vec_id", "decon_idx",
      dim = 8, nBuckets = 16)
    val atRest = TextAnalysis
      .semanticDecontaminateAtRest(spark, evalSet, "decon_idx", "embedding", "vec_id",
        dim = 8, threshold = 0.85)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val inlineFlagged = TextAnalysis
      .semanticDecontaminate(corpus, evalSet, "embedding", "vec_id", dim = 8,
        threshold = 0.85)
      .filter($"contaminated")
      .select($"doc_id", $"n_matches", $"max_cs4")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(atRest === inlineFlagged)
    assert(atRest.map(_._1) === Set(4L))
    // a sky-high threshold flags nothing
    assert(TextAnalysis
      .semanticDecontaminateAtRest(spark, evalSet, "decon_idx", "embedding", "vec_id",
        dim = 8, threshold = 0.9999999)
      .count() === 0L)
    spark.sql("DROP TABLE decon_idx")
  }
}
