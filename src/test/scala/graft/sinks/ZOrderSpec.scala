package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Proves the z-ordered layout actually enables multi-dimensional data
  * skipping: for a 2-D range predicate, the set of FILES whose
  * (min, max) stats overlap the predicate — exactly what parquet
  * footer-stats pruning evaluates — is strictly smaller than under a
  * single-column sorted layout of the same rows, on BOTH dimensions.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // files whose [min,max] of `c` overlaps [lo,hi] — the footer-stats
  // overlap test a parquet scan performs per row-group/file
  private def overlapping(path: String, c: String, lo: Double, hi: Double): Long =
    spark.read
      .parquet(path)
      .select(input_file_name().as("f"), col(c).cast("double").as("v"))
      .groupBy($"f")
      .agg(min($"v").as("mn"), max($"v").as("mx"))
      .filter($"mx" >= lo && $"mn" <= hi)
      .count()

  test("z-order prunes on both dimensions; single-column sort only on its leader") {
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select($"user_id", $"value", $"event_id")
    val base = Files.createTempDirectory("zorder").toString
    val zPath = s"$base/z"
    val sortedPath = s"$base/sorted"
    val nFiles = 16

    Sinks.writeZOrdered(events, zPath, Seq("user_id", "value"), nFiles)
    // the comparison layout: classic sort by the leading column only
    events
      .repartitionByRange(nFiles, $"user_id")
      .sortWithinPartitions($"user_id")
      .write.parquet(sortedPath)

    // same rows in both layouts
    assert(spark.read.parquet(zPath).count() === events.count())
    assert(
      spark.read.parquet(zPath).agg(sum($"event_id")).head().getLong(0) ===
        events.agg(sum($"event_id")).head().getLong(0)
    )

    // narrow range on each dimension (~10% of its span)
    val b = events.agg(
      min($"user_id").as("umn"), max($"user_id").as("umx"),
      min($"value").as("vmn"), max($"value").as("vmx")
    ).head()
    val (umn, umx) = (b.getAs[Long]("umn").toDouble, b.getAs[Long]("umx").toDouble)
    val (vmn, vmx) = (b.getAs[Double]("vmn"), b.getAs[Double]("vmx"))
    val (uLo, uHi) = (umn + (umx - umn) * 0.45, umn + (umx - umn) * 0.55)
    val (vLo, vHi) = (vmn + (vmx - vmn) * 0.45, vmn + (vmx - vmn) * 0.55)

    val zOnUser = overlapping(zPath, "user_id", uLo, uHi)
    val zOnValue = overlapping(zPath, "value", vLo, vHi)
    val sOnUser = overlapping(sortedPath, "user_id", uLo, uHi)
    val sOnValue = overlapping(sortedPath, "value", vLo, vHi)

    // the single-column sort skips on its leader but is blind on the
    // other dimension (every file spans ~the full value range)
    assert(sOnUser < nFiles)
    assert(sOnValue === nFiles.toLong, "leading-column sort should not prune on value")
    // z-order skips on BOTH dimensions
    assert(zOnUser < nFiles, s"z layout did not prune on user_id ($zOnUser of $nFiles)")
    assert(zOnValue < nFiles, s"z layout did not prune on value ($zOnValue of $nFiles)")
  }

  test("empty input writes an empty-but-readable table; all-null z-column fails with a clear error") {
    val base = Files.createTempDirectory("zorder3").toString
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    Sinks.writeZOrdered(empty, s"$base/empty", Seq("a", "b"), nFiles = 2)
    assert(spark.read.parquet(s"$base/empty").count() === 0)
    assert(spark.read.parquet(s"$base/empty").columns.toSeq === Seq("a", "b"))

    val allNull = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double])).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Sinks.writeZOrdered(allNull, s"$base/allnull", Seq("a", "b"), nFiles = 2)
    }
    assert(e.getMessage.contains("column b has no non-null values"))
  }

  test("explicit bounds skip the sampling agg and clamp out-of-range values") {
    val df = Seq((0L, 0.0), (100L, 1.0), (500L, 5.0)).toDF("a", "b")
    val path = Files.createTempDirectory("zorder2").toString + "/t"
    // bounds narrower than the data: out-of-range rows clamp, none drop
    Sinks.writeZOrdered(df, path, Seq("a", "b"), nFiles = 2,
      bounds = Map("a" -> (0.0, 100.0), "b" -> (0.0, 1.0)))
    assert(spark.read.parquet(path).count() === 3)
  }
}
