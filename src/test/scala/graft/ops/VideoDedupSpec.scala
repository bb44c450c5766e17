package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Sequence-level video dedup: frame-hash grams + MinHash banding +
  * exact Jaccard, with planted re-encoded / brightness-shifted /
  * trimmed clips.
  */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def synth(ids: Seq[Long]) =
    Multimodal.synthVideoFrames(ids.toDF("video_id"), "video_id")

  test("same-class clips pair at jaccard 1; cross-class clips never pair") {
    val ids = (0L until 46L) // two clips per class (23 classes)
    val got = Dedup.videoNearDupPairs(synth(ids))
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (i, j, _) => i % 23 == j % 23 }, "cross-class pair leaked")
    assert(got.forall(_._3 === 1.0), "same-class clips must share the whole gram set")
    val want = ids.groupBy(_ % 23).values.flatMap { g =>
      for (a <- g; b <- g if a < b) yield (a, b)
    }.toSet
    assert(got.map { case (i, j, _) => (i, j) }.toSet === want)
  }

  test("a re-encoded clip (full PNG decode + re-encode) pairs with its original at 1.0") {
    val orig = synth(Seq(7L))
    val reenc = orig.as[(Long, Int, Array[Byte])].map { case (_, f, bytes) =>
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      (1007L, f, bos.toByteArray)
    }.toDF("video_id", "frame_idx", "media")
    val got = Dedup.videoNearDupPairs(orig.unionByName(reenc))
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq((7L, 1007L, 1.0)))
  }

  test("a trimmed clip (last frame dropped) still pairs, at (g-1)/g") {
    val orig = synth(Seq(8L)) // class 8: 6 + 8%4 = 6 frames -> 5 grams
    val trimmed = orig.filter($"frame_idx" < 5)
      .select(lit(1008L).as("video_id"), $"frame_idx", $"media")
    val got = Dedup.videoNearDupPairs(orig.unionByName(trimmed))
      .as[(Long, Long, Double)].collect()
    assert(got.length === 1)
    val (i, j, jac) = got.head
    assert((i, j) === (8L, 1008L))
    assert(jac === 0.8) // 4 shared grams of 5
  }

  test("clips with fewer than 2 decodable frames are excluded, never paired") {
    val junk = Seq(
      (50L, 0, "not a png".getBytes("UTF-8")),
      (50L, 1, "also junk".getBytes("UTF-8")),
      (51L, 0, synth(Seq(3L)).as[(Long, Int, Array[Byte])].collect().head._3)
    ).toDF("video_id", "frame_idx", "media")
    assert(Dedup.videoShingles(junk).count() === 0L)
    assert(Dedup.videoNearDupPairs(synth(Seq(3L, 26L)).unionByName(junk))
      .as[(Long, Long, Double)].collect().toSeq === Seq((3L, 26L, 1.0)))
  }

  test("at-rest exact-verify option (round 17 — verdict r16 #8): borderline mixed clips " +
    "get the inline form's exact verdict where the estimate would mis-admit") {
    spark.sql("DROP TABLE IF EXISTS vdx_exact_idx")
    val corpus = synth(Seq(0L, 1L, 2L, 3L, 4L, 5L))
    Dedup.writeVideoMinHashIndex(corpus, "vdx_exact_idx")
    // planted borderline probe (searched deterministically in round 17):
    // head of clip 2 (idx < 5) + tail of clip 10 (idx >= 5, class 10)
    // sits at exact Jaccard 0.4 vs clip 2 — BELOW the 0.5 bar — but its
    // 32-slot MinHash estimate reads exactly 0.5, so the estimate-only
    // probe admits the pair
    val mixed = synth(Seq(2L)).filter($"frame_idx" < 5)
      .unionByName(synth(Seq(10L)).filter($"frame_idx" >= 5))
      .withColumn("video_id", lit(9002L))
    // a genuine near-dup rides along: class-0 clip 23 (Jaccard 1 vs 0)
    val probe = mixed.unionByName(
      synth(Seq(23L)).withColumn("video_id", lit(23L)))
    val est = Dedup.incrementalVideoNearDups(spark, probe, "vdx_exact_idx")
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(est === Set((0L, 23L), (2L, 9002L)),
      "estimate probe mis-admits the planted borderline pair")
    val exact = Dedup
      .incrementalVideoNearDupsExact(spark, probe, "vdx_exact_idx", corpus)
      .select($"i", $"j", $"jaccard").as[(Long, Long, Double)].collect()
    assert(exact.map(p => (p._1, p._2)).toSet === Set((0L, 23L)),
      "exact confirm rejects the borderline pair, keeps the true near-dup")
    assert(exact.head._3 === 1.0)
    // parity with the inline ground truth: exact probe == inline pairs
    // over (corpus ∪ probe) restricted to (corpus i, probe j)
    val probeIds = Set(9002L, 23L)
    val allInline: Set[(Long, Long)] = Dedup.videoNearDupPairs(corpus.unionByName(probe))
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    val inline = allInline.filter { case (i, j) =>
      !probeIds.contains(i) && probeIds.contains(j)
    }
    assert(exact.map(p => (p._1, p._2)).toSet === inline)
    // a corpus that can no longer gram a candidate clip (retention
    // purged its frames) must fail LOUD — the opt-in stronger
    // guarantee never silently returns weaker results than the
    // estimate probe would
    val purged = corpus.filter($"video_id" =!= 0L)
    val gap = intercept[IllegalArgumentException] {
      Dedup.incrementalVideoNearDupsExact(spark, probe, "vdx_exact_idx", purged).count()
    }
    assert(gap.getMessage.contains("missing from"), gap.getMessage)
    spark.sql("DROP TABLE vdx_exact_idx")
  }
}
