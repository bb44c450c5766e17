package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join merge join"),
    (2L, "spark filter scan"),
    (3L, "join merge sort merge"),
    (4L, "window filter window"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("invertedIndex: tf per (token, doc), dl = doc token count, empty docs index nothing") {
    val post = Retrieval.invertedIndex(corpus, "text", "doc_id")
    val m = post.collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    assert(m(("join", 1L)) === ((4, 2))) // dl=4, tf=2
    assert(m(("merge", 3L)) === ((4, 2)))
    assert(m(("spark", 2L)) === ((3, 1)))
    assert(!m.keys.exists(_._2 == 5L)) // empty doc absent
    // stats: 4 indexed docs, 4+3+4+3 = 14 tokens
    val st = Retrieval.indexStats(post).collect().head
    assert(st.getLong(0) === 4L && st.getLong(1) === 14L)
  }

  test("bm25TopK: term-frequency docs outrank, rare terms outweigh common, ties break by doc_id") {
    val post = Retrieval.invertedIndex(corpus, "text", "doc_id")
    val qs = Seq((10L, "join"), (20L, "window")).toDF("query_id", "qtext")
    val top = Retrieval.bm25TopK(post, qs, "query_id", "qtext", k = 3)
    val byQ = top.collect().groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(2))).toMap
    // 'join': docs 1 (tf=2) and 3 (tf=1, longer... same dl) — tf=2 wins
    assert(byQ(10L).map(_.getLong(1)).toSeq === Seq(1L, 3L))
    // 'window' appears only in doc 4
    assert(byQ(20L).map(_.getLong(1)).toSeq === Seq(4L))
    // scores strictly ordered by the exact quantized key, positive
    val s10 = byQ(10L).map(_.getLong(3))
    assert(s10.forall(_ > 0L) && s10.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("bm25TopK: a repeated query term scores once (distinct query terms)") {
    val post = Retrieval.invertedIndex(corpus, "text", "doc_id")
    val q1 = Seq((1L, "join")).toDF("query_id", "qtext")
    val q2 = Seq((1L, "join join join")).toDF("query_id", "qtext")
    val a = Retrieval.bm25TopK(post, q1, "query_id", "qtext", 5).orderBy("doc_id").collect()
    val b = Retrieval.bm25TopK(post, q2, "query_id", "qtext", 5).orderBy("doc_id").collect()
    assert(a.map(r => (r.getLong(1), r.getLong(3))).toSeq === b.map(r => (r.getLong(1), r.getLong(3))).toSeq)
  }

  test("bm25TopK: multi-term query sums per-term contributions exactly") {
    val post = Retrieval.invertedIndex(corpus, "text", "doc_id")
    val both = Seq((1L, "spark join")).toDF("query_id", "qtext")
    val spark1 = Seq((1L, "spark")).toDF("query_id", "qtext")
    val join1 = Seq((1L, "join")).toDF("query_id", "qtext")
    def scores(q: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Retrieval.bm25TopK(post, q, "query_id", "qtext", 10)
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val sb = scores(both); val ss = scores(spark1); val sj = scores(join1)
    for (d <- sb.keys)
      assert(sb(d) === ss.getOrElse(d, 0L) + sj.getOrElse(d, 0L))
  }

  test("at-rest index: append == rebuild bit-identically (postings, stats, and query results)") {
    val dir = Files.createTempDirectory("bm25idx").toString
    val half1 = corpus.filter($"doc_id" <= 3)
    val half2 = corpus.filter($"doc_id" > 3)
    Retrieval.buildIndex(half1, "text", "doc_id", dir)
    Retrieval.appendToIndex(half2, "text", "doc_id", dir)
    val (post, st) = Retrieval.loadIndex(spark, dir)
    val full = Retrieval.invertedIndex(corpus, "text", "doc_id")
    assert(post.orderBy("token", "doc_id").collect().toSeq ===
      full.orderBy("token", "doc_id").collect().toSeq)
    assert(st.collect().toSeq === Retrieval.indexStats(full).collect().toSeq)
    val qs = Seq((1L, "spark join window")).toDF("query_id", "qtext")
    val fromAtRest = Retrieval.bm25TopK(post, qs, "query_id", "qtext", 5, stats = Some(st))
    val fromScratch = Retrieval.bm25TopK(full, qs, "query_id", "qtext", 5)
    assert(fromAtRest.orderBy("rank").collect().toSeq === fromScratch.orderBy("rank").collect().toSeq)
  }

  test("bucketed index: probe bucket-prunes, append preserves bucketing, == inline scores") {
    spark.sql("DROP TABLE IF EXISTS bm25_bk_idx")
    spark.sql("DROP TABLE IF EXISTS bm25_bk_idx__stats")
    val half1 = corpus.filter($"doc_id" <= 3)
    val half2 = corpus.filter($"doc_id" > 3)
    Retrieval.writeBm25Index(half1, "text", "doc_id", "bm25_bk_idx", numBuckets = 16)
    Retrieval.appendToBm25Index(half2, "text", "doc_id", "bm25_bk_idx")
    // append == rebuild: postings set and stats identical
    val full = Retrieval.invertedIndex(corpus, "text", "doc_id")
    assert(spark.table("bm25_bk_idx").orderBy("token", "doc_id").collect().toSeq ===
      full.orderBy("token", "doc_id").collect().toSeq)
    assert(spark.table("bm25_bk_idx__stats").collect().toSeq ===
      Retrieval.indexStats(full).collect().toSeq)
    // probe == the inline full-postings scores (exact quantized longs)
    val qs = Seq((1L, "spark join window")).toDF("query_id", "qtext")
    val indexed = Retrieval.bm25TopKIndexed(spark, "bm25_bk_idx", qs, "query_id", "qtext", 5)
    val inline = Retrieval.bm25TopK(full, qs, "query_id", "qtext", 5)
    assert(indexed.orderBy("rank").collect().toSeq === inline.orderBy("rank").collect().toSeq)
    // plan-pinned bucket pruning: the postings scan reads only the
    // buckets of the query's 3 tokens (<= 3 of 16)
    indexed.collect() // finalize AQE so the executed plan is inspectable
    val plan = indexed.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in probe plan:\n$plan")
    assert(sel.get.group(1).toInt <= 3 && sel.get.group(2).toInt === 16,
      s"expected <=3 of 16 buckets, got ${sel.get.matched}")
    spark.sql("DROP TABLE IF EXISTS bm25_bk_idx")
    spark.sql("DROP TABLE IF EXISTS bm25_bk_idx__stats")
  }

  test("plan: candidate prune and model sides are broadcast; no cartesian on the postings side") {
    val post = Retrieval.invertedIndex(corpus, "text", "doc_id")
    val qs = Seq((1L, "spark join")).toDF("query_id", "qtext")
    val plan = Retrieval.bm25TopK(post, qs, "query_id", "qtext", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    // the only SortMergeJoin-free shape: postings never join postings
    assert(!plan.contains("SortMergeJoin"))
  }

  test("bm25TopKMulti == per-parameterization bm25TopK, column for column (r19: the " +
    "ensemble queries share one candidate pass; fusion must be invisible in results)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "spark join merge shuffle"),
      (2L, "join join merge vector data"),
      (3L, "customer vector data spark"),
      (4L, "window filter scan merge"),
      (5L, "spark spark spark")
    ).toDF("doc_id", "text")
    val post = Retrieval.invertedIndex(docs, "text", "doc_id")
    val st = Retrieval.indexStats(post)
    val qs = Seq((1L, "spark join merge"), (2L, "customer vector data")).toDF("qid", "qt")
    val params = Seq((1.2, 0.75), (0.5, 0.5))
    val fused = Retrieval.bm25TopKMulti(post, qs, "qid", "qt", k = 3, params, Some(st))
    val single = params.map { case (k1, b) =>
      Retrieval.bm25TopK(post, qs, "qid", "qt", k = 3, k1 = k1, b = b, stats = Some(st))
    }
    fused.zip(single).foreach { case (f, s) =>
      val fa = f.orderBy("query_id", "rank").collect().toSeq
      val sa = s.orderBy("query_id", "rank").collect().toSeq
      assert(fa === sa, "fused parameterization diverged from the single-param result")
    }
  }
}
