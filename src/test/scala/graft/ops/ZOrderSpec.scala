package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Pins for z-order clustering ([[ZOrder]]): bit-interleave correctness
  * against a straight Scala reference, rank edge behavior, and the
  * LOCALITY claim that justifies the operator at 100 TB — a z-ordered
  * write yields files whose per-file min/max spans are narrow in BOTH
  * dimensions (so file stats prune predicates on either column), where
  * a linear sort leaves the non-leading dimension at full span in
  * every file.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def refInterleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave2 matches the bitwise reference on random 16-bit pairs") {
    val pairs = (1 to 500).map { i =>
      val x = (i * 48271L) % 65536L
      val y = (i * 69621L) % 65536L
      (x, y)
    } ++ Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = pairs
      .toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y")).as("z"), col("x"), col("y"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) === refInterleave(r.getLong(1), r.getLong(2)))
    }
  }

  test("interleaveN bit-fold == interleave2 mask-shift on 2 dims (layout unchanged)") {
    // bits=17 forces the generic fold path; bit 16 of a 16-bit rank is
    // zero, so equality here pins that Sinks.writeZOrdered's layouts
    // are unchanged by routing through the specialized spread.
    val pairs = (1 to 300).map { i => ((i * 40503L) % 65536L, (i * 25173L) % 65536L) }
    val got = pairs
      .toDF("x", "y")
      .select(
        ZOrder.interleave2(col("x"), col("y")).as("a"),
        ZOrder.interleaveN(Seq(col("x"), col("y")), 17).as("b")
      )
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("rankOf maps bounds to 0 and 2^bits-1, clamps out-of-range") {
    val df = Seq(-50L, 0L, 500L, 1000L, 4000L).toDF("v")
    val got = df.select(ZOrder.rankOf(col("v"), 0L, 1000L, 16).as("r")).as[Long].collect()
    assert(got(0) === 0L) // clamped
    assert(got(1) === 0L)
    assert(got(2) === 32767L) // 500*65535 div 1000
    assert(got(3) === 65535L)
    assert(got(4) === 65535L) // clamped
  }

  test("rankOf on a constant column (hi == lo) ranks every row 0") {
    val df = Seq(7L, 7L, 7L).toDF("v")
    val got = df.select(ZOrder.rankOf(col("v"), 7L, 7L, 16).as("r")).as[Long].collect()
    assert(got.forall(_ === 0L))
  }

  test("z-ordered files are narrow in BOTH dims; linear sort is not") {
    // 64x64 grid, one row per cell — uniform 2-D data
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
    val df = grid.toDF("x", "y").repartition(8)
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath

    graft.sinks.Sinks.writeZOrdered(df, s"$dir/z", Seq("x", "y"), nFiles = 16)
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    def spans(path: String): Seq[(Long, Long)] = spark.read
      .parquet(path)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
      .map(r => (r.getAs[Long]("sx"), r.getAs[Long]("sy")))
      .toSeq

    val zs = spans(s"$dir/z")
    val ls = spans(s"$dir/linear")
    // z-order: every file covers a compact square-ish region — both
    // spans well under the full 0..63 extent (16 files over a 64x64
    // grid -> ideal 16x16 tiles; allow sampling slack to 3x ideal).
    assert(zs.nonEmpty && zs.forall { case (sx, sy) => sx <= 48 && sy <= 48 }, zs.toString)
    val zAvg = zs.map { case (a, b) => a + b }.sum.toDouble / zs.size
    // linear sort: x is narrow but y spans the full extent in (nearly)
    // every file — the non-leading dimension cannot be pruned.
    assert(ls.count { case (_, sy) => sy >= 60 } >= ls.size / 2, ls.toString)
    val lAvg = ls.map { case (a, b) => a + b }.sum.toDouble / ls.size
    assert(zAvg < lAvg, s"z=$zAvg linear=$lAvg")
  }

  test("zbucket partitions z-range evenly: every bucket a contiguous z-interval") {
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
    val df = grid.toDF("x", "y")
    val z = ZOrder.zValue2(col("x"), 0L, 63L, col("y"), 0L, 63L)
    val rows = df
      .select(z.as("z"), shiftright(z, 26).as("b"))
      .groupBy("b")
      .agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .orderBy("b")
      .collect()
    val sorted = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    sorted.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
