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
}
