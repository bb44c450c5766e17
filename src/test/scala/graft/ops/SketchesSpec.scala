package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Pins for the mergeable-histogram-sketch family ([[Sketches]]):
  * merge exactness under arbitrary partitionings (the property that
  * makes per-shard sketches safe at 100 TB), the one-bin-width quantile
  * error bound, clamping at the grid edges, and at-rest round-trip.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val lo = 0.0
  private val hi = 100.0
  private val bins = 20 // width 5.0

  private lazy val rows = (1 to 997).map(i => ((i * 7919) % 1000, if (i % 3 == 0) "a" else "b"))
  private lazy val df = rows.toDF("v", "g").withColumn("v", col("v") / 10.0)

  test("merging per-partition sketches equals the sketch of the union, exactly") {
    val whole = Sketches
      .histogramSketch(df, "v", Seq("g"), lo, hi, bins)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val half1 = Sketches.histogramSketch(df.filter(col("v") < 37.7), "v", Seq("g"), lo, hi, bins)
    val half2 = Sketches.histogramSketch(df.filter(col("v") >= 37.7), "v", Seq("g"), lo, hi, bins)
    val merged = Sketches
      .mergeSketches(half1.unionByName(half2), Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged === whole)
  }

  test("quantile estimates are within one bin width of the exact percentile") {
    val sk = Sketches.histogramSketch(df, "v", Seq("g"), lo, hi, bins)
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Sketches
      .quantilesFromSketch(sk, Seq("g"), probs, lo, hi, bins)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val exact = df
      .groupBy("g")
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("qs"))
      .collect()
      .flatMap(r => probs.zip(r.getSeq[Double](1)).map { case (p, q) => (r.getString(0), p) -> q })
      .toMap
    val w = (hi - lo) / bins
    exact.foreach { case (k, q) =>
      assert(math.abs(est(k) - q) <= w, s"$k: est=${est(k)} exact=$q")
    }
  }

  test("cdfFromSketch: within the containing bin's mass of the exact CDF; broadcast join") {
    val sk = Sketches.histogramSketch(df, "v", Seq("g"), lo, hi, bins)
    val est = Sketches.cdfFromSketch(df, "v", Seq("g"), sk, lo, hi, bins)
    assert(est.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val got = est
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Double]("v")) -> r.getAs[Double]("cdf"))
      .toMap
    val totals = df.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df
      .groupBy("g", "v")
      .count()
      .withColumn("cum", sum("count").over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getAs[Long]("cum"))
      .toMap
    val w = (hi - lo) / bins
    val binMass = df
      .groupBy(col("g"), Sketches.binOf(col("v"), lo, hi, bins).as("b"))
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    exact.foreach { case ((g, v), cum) =>
      val b = math.min(math.max(math.floor((v - lo) / w), 0.0), (bins - 1).toDouble).toLong
      val bound = binMass((g, b)).toDouble / totals(g)
      val e = cum.toDouble / totals(g)
      assert(math.abs(got((g, v)) - e) <= bound + 1e-12, s"($g,$v): est=${got((g, v))} exact=$e")
    }
  }

  test("cdfFromSketch scores NEW data in bins the sketch corpus never populated") {
    // sketch over [40, 60) only; new data hits empty bins below/above
    val corpus = (1 to 200).map(i => (40.0 + (i % 20), "g")).toDF("v", "g")
    val sk = Sketches.histogramSketch(corpus, "v", Seq("g"), lo, hi, bins)
    val fresh = Seq((5.0, "g"), (50.0, "g"), (95.0, "g")).toDF("v", "g")
    val got = Sketches
      .cdfFromSketch(fresh, "v", Seq("g"), sk, lo, hi, bins)
      .collect()
      .map(r => r.getAs[Double]("v") -> r.getAs[Double]("cdf"))
      .toMap
    assert(got.size === 3) // nothing silently dropped
    assert(got(5.0) === 0.0) // below all corpus mass
    assert(got(95.0) === 1.0) // above all corpus mass
    assert(got(50.0) > 0.0 && got(50.0) < 1.0)
  }

  test("cdfFromSketch keeps rows of GROUPS the sketch never saw, with null cdf") {
    val corpus = (1 to 100).map(i => (40.0 + (i % 20), "seen")).toDF("v", "g")
    val sk = Sketches.histogramSketch(corpus, "v", Seq("g"), lo, hi, bins)
    val fresh = Seq((50.0, "seen"), (50.0, "unseen")).toDF("v", "g")
    val rows = Sketches
      .cdfFromSketch(fresh, "v", Seq("g"), sk, lo, hi, bins)
      .collect()
      .map(r => r.getAs[String]("g") -> Option(r.get(r.fieldIndex("cdf"))))
      .toMap
    assert(rows.size === 2) // the unseen group's row is NOT dropped
    assert(rows("seen").isDefined)
    assert(rows("unseen").isEmpty) // null = "no model mass for this group"
  }

  test("equiDepthPartition: balanced within largest-bin mass; contiguous value ranges") {
    val sk = Sketches.histogramSketch(df, "v", Nil, lo, hi, bins)
    val k = 7
    val pids = Sketches.equiDepthPartition(df, "v", sk, lo, hi, bins, k)
    val stats = pids
      .groupBy("pid")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("pid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = stats.map(_._2).sum
    val maxBinN = Sketches
      .histogramSketch(df, "v", Nil, lo, hi, bins)
      .agg(max("n")).collect()(0).getLong(0)
    stats.foreach { case (pid, n, _, _) =>
      assert(n <= total / k + maxBinN + 1, s"pid=$pid n=$n")
    }
    stats.sliding(2).foreach {
      case Array((_, _, _, mx1), (_, _, mn2, _)) => assert(mx1 <= mn2)
      case _ =>
    }
    assert(stats.map(_._1).toSeq == (0 until k).map(_.toLong))
  }

  test("out-of-range values clamp into the edge bins (no dropped rows)") {
    val oob = Seq(-5.0, -0.001, 0.0, 99.999, 100.0, 250.0).toDF("v").withColumn("g", lit("x"))
    val sk = Sketches
      .histogramSketch(oob, "v", Seq("g"), lo, hi, bins)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(2))
      .toMap
    assert(sk(0L) === 3L) // -5, -0.001, 0.0
    assert(sk(19L) === 3L) // 99.999, 100.0, 250.0
    assert(sk.values.sum === 6L)
  }

  test("p=0 resolves to the first populated bin, p=1 to the last") {
    val sk = Sketches.histogramSketch(df.filter(col("v") >= 20.0), "v", Seq("g"), lo, hi, bins)
    val est = Sketches
      .quantilesFromSketch(sk, Seq("g"), Seq(0.0, 1.0), lo, hi, bins)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    est.foreach { case ((_, p), q) =>
      if (p == 0.0) assert(q >= 20.0 && q <= 25.0) else assert(q <= hi)
    }
    assert(est.size === 4)
  }

  test("at-rest round trip: written sketch reads back and merges with a fresh one") {
    val dir = java.nio.file.Files.createTempDirectory("sketch").toString
    val day1 = Sketches.histogramSketch(df.filter(col("v") < 50), "v", Seq("g"), lo, hi, bins)
    Sketches.writeSketch(day1, s"$dir/day1")
    val day2 = Sketches.histogramSketch(df.filter(col("v") >= 50), "v", Seq("g"), lo, hi, bins)
    val merged = Sketches
      .mergeSketches(spark.read.parquet(s"$dir/day1").unionByName(day2), Seq("g"))
      .agg(sum("n"))
      .head()
      .getLong(0)
    assert(merged === df.count())
  }
}
