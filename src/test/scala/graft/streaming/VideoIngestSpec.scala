package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.ops.{Dedup, Multimodal}

/** Streaming video content-dedup ingest (round 16 — verdict r15 #3):
  * at-rest probe == inline pairs, the clip-granularity keeper/probe/
  * replay protocol, idempotence including unshingleable clips, the
  * cross-modality fail-closed contract, and the file-backed loop.
  *
  * synthVideoFrames classes: video_id % 23 — {0, 23, 46} are the same
  * class (identical frame sequences → Jaccard exactly 1), {1}, {2},
  * {24} etc. are their own classes (disjoint gram sets → Jaccard 0).
  */
class VideoIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def vid(ids: Seq[Long]) =
    Multimodal.synthVideoFrames(ids.toDF("doc_id"), "doc_id")

  private def corpusClips(path: String): Set[Long] =
    spark.read.parquet(path).select($"video_id").distinct().as[Long].collect().toSet

  test("at-rest probe == inline cross pairs on planted classes") {
    spark.sql("DROP TABLE IF EXISTS vid_parity_idx")
    val corpus = vid(Seq(0L, 1L, 2L, 3L, 4L))
    Dedup.writeVideoMinHashIndex(corpus, "vid_parity_idx")
    val batch = vid(Seq(23L, 24L, 100L)) // 23→class 0, 24→class 1, 100→class 8 (fresh)
    val probe = Dedup
      .incrementalVideoNearDups(spark, batch, "vid_parity_idx")
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    // inline over the union, restricted to (corpus, batch) cross pairs —
    // same-class clips sit at Jaccard exactly 1, so the signature
    // ESTIMATE the probe verifies with agrees with the exact verify
    val batchIds = Set(23L, 24L, 100L)
    val allInline: Set[(Long, Long)] = Dedup
      .videoNearDupPairs(corpus.unionByName(batch))
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    val inline = allInline.filter { case (i, j) =>
      !batchIds.contains(i) && batchIds.contains(j)
    }
    assert(probe === inline)
    assert(probe === Set((0L, 23L), (1L, 24L)))
    spark.sql("DROP TABLE vid_parity_idx")
  }

  test("ingest: in-batch keeper, index probe, replay + unshingleable idempotence") {
    val tmp = Files.createTempDirectory("vidingest").toString
    val corpus = s"$tmp/corpus"
    spark.sql("DROP TABLE IF EXISTS vid_ingest_idx")

    // batch 1: 0 and 23 are the same class (keep min id 0); 1 is fresh
    val s1 = VideoIngest.ingestVideoBatch(vid(Seq(0L, 23L, 1L)), corpus, "vid_ingest_idx")
    assert((s1.kept, s1.nearDups, s1.replays) === ((2L, 1L, 0L)))
    assert(corpusClips(corpus) === Set(0L, 1L))

    // batch 2: 46 is a near-dup of indexed 0; 0 is a replay; 2 is
    // fresh; 999 is a one-frame clip (no gram set — corpus-only, never
    // the index)
    val oneFrame = vid(Seq(999L)).filter($"frame_idx" === 0)
    val b2 = vid(Seq(46L, 0L, 2L)).unionByName(oneFrame)
    val s2 = VideoIngest.ingestVideoBatch(b2, corpus, "vid_ingest_idx")
    assert((s2.kept, s2.nearDups, s2.replays) === ((2L, 1L, 1L)))
    assert(corpusClips(corpus) === Set(0L, 1L, 2L, 999L))
    assert(spark.table("vid_ingest_idx").select($"doc_id").distinct()
      .as[Long].collect().toSet === Set(0L, 1L, 2L))

    // full redelivery of batch 2: corpus and index unchanged — the
    // unshingleable clip must NOT double (the corpus anti-join path)
    val frameCount = spark.read.parquet(corpus).count()
    val s3 = VideoIngest.ingestVideoBatch(b2, corpus, "vid_ingest_idx")
    assert(s3.replays === 2L, "0 and 2 both find their indexed copies")
    assert(corpusClips(corpus) === Set(0L, 1L, 2L, 999L))
    assert(spark.read.parquet(corpus).count() === frameCount, "no duplicate frames")
    spark.sql("DROP TABLE vid_ingest_idx")
  }

  test("cross-modality fails closed: text probe on a video index, video probe on a " +
    "text index, and video probe on a LEGACY (props-less) text index") {
    spark.sql("DROP TABLE IF EXISTS vid_cross_vidx")
    spark.sql("DROP TABLE IF EXISTS vid_cross_tidx")
    Dedup.writeVideoMinHashIndex(vid(Seq(0L, 1L)), "vid_cross_vidx")
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(spark, docs, "vid_cross_vidx", "text", "doc_id").count()
    }
    assert(e1.getMessage.contains("cross-modality"), e1.getMessage)

    Dedup.writeMinHashIndex(docs, "text", "doc_id", "vid_cross_tidx")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.incrementalVideoNearDups(spark, vid(Seq(2L)), "vid_cross_tidx").count()
    }
    assert(e2.getMessage.contains("cross-modality"), e2.getMessage)

    // a legacy index (pre-r16: no source property) is a TEXT index by
    // contract — text probes keep working, video probes fail
    spark.sql("ALTER TABLE vid_cross_tidx UNSET TBLPROPERTIES " +
      "('graft.minhash.source', 'graft.minhash.numHashes', 'graft.minhash.bands')")
    Dedup.incrementalNearDups(spark, docs, "vid_cross_tidx", "text", "doc_id").count()
    val e3 = intercept[IllegalArgumentException] {
      Dedup.incrementalVideoNearDups(spark, vid(Seq(2L)), "vid_cross_tidx").count()
    }
    assert(e3.getMessage.contains("cross-modality"), e3.getMessage)
    spark.sql("DROP TABLE vid_cross_vidx")
    spark.sql("DROP TABLE vid_cross_tidx")
  }

  test("streaming loop: micro-batches land deduped; probe sees them immediately") {
    val tmp = Files.createTempDirectory("vidstream").toString
    val (corpus, src) = (s"$tmp/corpus", s"$tmp/src")
    spark.sql("DROP TABLE IF EXISTS vid_stream_idx")
    val b1 = vid(Seq(0L, 23L, 1L))
    b1.write.parquet(src)
    val q = VideoIngest.videoDedupIngest(
      spark.readStream.schema(b1.schema).parquet(src),
      corpus, "vid_stream_idx", s"$tmp/ckpt")
    try {
      q.processAllAvailable()
      assert(corpusClips(corpus) === Set(0L, 1L))
      vid(Seq(46L, 2L)).write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(corpusClips(corpus) === Set(0L, 1L, 2L))
      // the freshly streamed index answers an incremental probe
      val hits = Dedup.incrementalVideoNearDups(spark, vid(Seq(23L * 3)), "vid_stream_idx")
      assert(hits.select($"i").as[Long].collect().toSet === Set(0L))
    } finally q.stop()
    spark.sql("DROP TABLE vid_stream_idx")
  }
}
