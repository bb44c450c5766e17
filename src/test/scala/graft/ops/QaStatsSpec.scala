package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.streaming.SketchIngest

/** Round-13 batch: exact ROC-AUC from score-grid counts, calibration
  * bins + ECE, Zipf profile, reciprocal-rank fusion.
  */
class QaStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // ---- rocAuc -----------------------------------------------------------

  test("rocAuc: perfect separation is 1, reversed is 0, all-ties is 0.5") {
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false)).toDF("s", "y")
    val r1 = Stats.rocAuc(perfect, "s", col("y")).collect().head
    assert(r1.getLong(0) === 2L && r1.getLong(1) === 2L)
    assert(r1.getDouble(3) === 1.0)

    val reversed = Seq((10L, false), (9L, false), (2L, true), (1L, true)).toDF("s", "y")
    assert(Stats.rocAuc(reversed, "s", col("y")).collect().head.getDouble(3) === 0.0)

    val ties = Seq((5L, true), (5L, false), (5L, true), (5L, false)).toDF("s", "y")
    assert(Stats.rocAuc(ties, "s", col("y")).collect().head.getDouble(3) === 0.5)
  }

  test("rocAuc matches the naive all-pairs count (half credit on ties)") {
    val rows = Seq(
      (3L, true), (1L, true), (2L, false), (2L, false), (2L, true), (7L, false)
    )
    val df = rows.toDF("s", "y")
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val naive2x = (for { p <- pos; n <- neg } yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val got = Stats.rocAuc(df, "s", col("y")).collect().head
    assert(got.getDecimal(2).longValueExact() === naive2x)
    assert(got.getDouble(3) ===
      naive2x.toDouble / (2.0 * pos.size * neg.size))
  }

  test("rocAuc: null scores/labels drop; an empty class yields null auc") {
    val df = Seq(
      (Some(3L), Some(true)),
      (None: Option[Long], Some(false)), // null score: dropped
      (Some(1L), None: Option[Boolean]), // null label: dropped
      (Some(1L), Some(false))
    ).toDF("s", "y")
    val r = Stats.rocAuc(df, "s", col("y")).collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
    assert(r.getDouble(3) === 1.0)

    val onlyPos = Seq((3L, true), (1L, true)).toDF("s", "y")
    assert(Stats.rocAuc(onlyPos, "s", col("y")).collect().head.isNullAt(3))
  }

  test("aucFromCounts over a SketchIngest-maintained grid == rocAuc over raw rows") {
    val b1 = Seq((3L, true), (2L, false), (2L, true))
    val b2 = Seq((1L, false), (7L, false), (3L, true), (2L, false))
    val all = (b1 ++ b2).toDF("s", "y")
    val direct = Stats.rocAuc(all, "s", col("y")).collect().head

    // from-counts == from-raw (pure refactor pin)
    val viaCounts =
      Stats.aucFromCounts(Stats.scoreCounts(all, "s", col("y"))).collect().head
    assert(viaCounts === direct)

    // grid maintained over two micro-batches; exact long addition
    val path = java.nio.file.Files.createTempDirectory("aucgrid").toString + "/grid"
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      SketchIngest.ingestAdditiveBatch(
        b.toDF("s", "y"), i.toLong,
        (d: org.apache.spark.sql.DataFrame) => Stats.scoreCounts(d, "s", col("y")),
        Seq("score"),
        Seq("pos", "neg"),
        path)
    }
    val streamed = Stats.aucFromCounts(spark.read.parquet(path)).collect().head
    assert(streamed === direct)
  }

  test("aucPerGroup equals rocAuc computed per slice") {
    val df = Seq(
      ("a", 3L, true), ("a", 1L, false), ("a", 2L, true), ("a", 2L, false),
      ("b", 5L, false), ("b", 9L, true), ("b", 9L, false)
    ).toDF("g", "s", "y")
    val grouped = Stats.aucPerGroup(df, "g", "s", col("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .sortBy(_._1)
    val slices = Seq("a", "b").map { g =>
      val r = Stats.rocAuc(df.filter(col("g") === g), "s", col("y")).collect().head
      (g, r.getLong(0), r.getLong(1), r.getDouble(3))
    }
    assert(grouped.toSeq === slices)
  }

  // ---- gini ---------------------------------------------------------------

  test("gini: all-equal is 0, full concentration approaches (n-1)/n, naive parity") {
    val equal = Seq(5L, 5L, 5L, 5L).toDF("v")
    assert(Stats.gini(equal, "v").collect().head.getDouble(2) === 0.0)

    // one holder of everything: G = (2*n*X - (n+1)X)/(nX) = (n-1)/n
    val conc = Seq(0L, 0L, 0L, 100L).toDF("v")
    assert(Stats.gini(conc, "v").collect().head.getDouble(2) === 0.75)

    // naive sorted-rank formula parity on an arbitrary multiset
    val vals = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val sorted = vals.sorted
    val n = vals.size
    val s = vals.sum
    val t = sorted.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val expected = (2.0 * t - (n + 1.0) * s) / (n.toDouble * s)
    val got = Stats.gini(vals.toDF("v"), "v", bucketWidth = 4L).collect().head
    assert(got.getLong(0) === n.toLong && got.getLong(1) === s)
    assert(got.getDouble(2) === expected)
  }

  test("giniFromCounts over a merged grid == gini over raw; null/empty handling") {
    val b1 = Seq(1L, 2L, 2L)
    val b2 = Seq(3L, 1L, 7L)
    val direct = Stats.gini((b1 ++ b2).toDF("v"), "v").collect().head
    val grid = (b1 ++ b2).groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
    val viaCounts = Stats.giniFromCounts(grid.toSeq.toDF("v", "c")).collect().head
    assert(viaCounts === direct)

    val empty = Stats.gini(Seq.empty[Long].toDF("v"), "v").collect().head
    assert(empty.getLong(0) === 0L && empty.isNullAt(2))
    // all-zero values: sum 0 -> undefined, null
    assert(Stats.gini(Seq(0L, 0L).toDF("v"), "v").collect().head.isNullAt(2))
  }

  // ---- jsd ----------------------------------------------------------------

  test("jsd: identical is 0, disjoint is ln 2, symmetric, bounded, empty side null") {
    val a = Seq("x", "x", "y", "z").toDF("k")
    val b = Seq("x", "x", "y", "z").toDF("k")
    assert(Stats.jsd(a, b, "k").collect().head.getDouble(3) === 0.0)

    val c = Seq("p", "q", "q").toDF("k")
    val dis = Stats.jsd(a, c, "k").collect().head.getDouble(3)
    assert(math.abs(dis - math.log(2.0)) < 1e-6, s"disjoint jsd $dis")

    val d = Seq("x", "y", "y", "y", "w").toDF("k")
    val ab = Stats.jsd(a, d, "k").collect().head.getDouble(3)
    val ba = Stats.jsd(d, a, "k").collect().head.getDouble(3)
    assert(ab === ba)
    assert(ab > 0.0 && ab < math.log(2.0))

    val empty = Seq.empty[String].toDF("k")
    assert(Stats.jsd(a, empty, "k").collect().head.isNullAt(3))
  }

  test("jsdFromCounts == jsd over raw rows and merges by addition") {
    val a1 = Seq("x", "y")
    val a2 = Seq("x", "z", "z")
    val b1 = Seq("y", "y")
    val b2 = Seq("x", "y")
    val direct = Stats.jsd((a1 ++ a2).toDF("k"), (b1 ++ b2).toDF("k"), "k").collect().head
    def grid(xs: Seq[String]) =
      xs.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }.toSeq.toDF("k", "n")
    // merged per-batch grids (the SketchIngest addition-merge shape)
    val refMerged = grid(a1).unionByName(grid(a2))
      .groupBy("k").agg(sum(col("n")).as("n"))
    val curMerged = grid(b1).unionByName(grid(b2))
      .groupBy("k").agg(sum(col("n")).as("n"))
    val viaCounts = Stats.jsdFromCounts(refMerged, curMerged, "k").collect().head
    assert(viaCounts === direct)
  }

  // ---- spearman -----------------------------------------------------------

  test("spearman: perfect monotone is 1, reversed is -1, constant column null") {
    // num == dx == dy on a perfect monotone, but sqrt(d)*sqrt(d) is d
    // only to within an ulp — the fixed expression's honest output is
    // 1.0 up to that one rounding (bit-identical cross-engine, just
    // not the literal 1.0)
    val mono = Seq((1L, 10L), (2L, 40L), (3L, 90L), (4L, 160L)).toDF("x", "y")
    val rMono = Stats.spearman(mono, "x", "y").collect().head.getDouble(1)
    assert(math.abs(rMono - 1.0) < 1e-14, s"mono rho $rMono")
    val anti = Seq((1L, 160L), (2L, 90L), (3L, 40L), (4L, 10L)).toDF("x", "y")
    val rAnti = Stats.spearman(anti, "x", "y").collect().head.getDouble(1)
    assert(math.abs(rAnti + 1.0) < 1e-14, s"anti rho $rAnti")
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(Stats.spearman(const, "x", "y").collect().head.isNullAt(1))
  }

  test("spearman matches the naive midrank formula with ties; partition-invariant") {
    val rows = Seq((3L, 7L), (1L, 7L), (3L, 2L), (5L, 9L), (1L, 2L), (3L, 9L), (8L, 1L))
    // naive doubled midranks: 2*rank(v) = 2*nBelow + c + 1 per value
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val byV = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = byV.keys.toSeq.sorted
      var below = 0L
      sorted.map { v =>
        val c = byV(v); val r = 2 * below + c + 1; below += c; v -> r
      }.toMap
    }
    val rx = ranks2(rows.map(_._1))
    val ry = ranks2(rows.map(_._2))
    val n = BigInt(rows.size)
    def s(f: ((Long, Long)) => BigInt) = rows.map(f).sum
    val sx = s(r => BigInt(rx(r._1)))
    val sy = s(r => BigInt(ry(r._2)))
    val sxx = s(r => BigInt(rx(r._1)) * BigInt(rx(r._1)))
    val syy = s(r => BigInt(ry(r._2)) * BigInt(ry(r._2)))
    val sxy = s(r => BigInt(rx(r._1)) * BigInt(ry(r._2)))
    val expected = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    val df = rows.toDF("x", "y")
    val got = Stats.spearman(df, "x", "y").collect().head
    assert(got.getLong(0) === rows.size.toLong)
    assert(got.getDouble(1) === expected)
    assert(Stats.spearman(df.repartition(16), "x", "y").collect().head === got)
  }

  // ---- novelty ------------------------------------------------------------

  test("novelty: unseen grams rate against a reference corpus, trunc4, null on short docs") {
    val ref = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps"), // all 3 shingles seen -> 0.0
      (2L, "a completely different sentence here"), // nothing seen -> 1.0
      (3L, "the quick brown cat sits still"), // 1 of 4 seen -> 0.75
      (4L, "too short") // no shingles -> (0, 0, null)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.novelty(docs, ref, "text", "doc_id", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 3L, 3L, 0.0),
      (2L, 3L, 0L, 1.0),
      (3L, 4L, 1L, 0.75),
      (4L, 0L, 0L, null)
    ))
  }

  // ---- calibration ------------------------------------------------------

  test("calibrationBins + eceFromBins match the hand case; bin clamps at scale") {
    val df = Seq((1L, false), (9L, true), (10L, true)).toDF("s", "y")
    val bins = Stats.calibrationBins(df, "s", col("y"), scale = 10L, nBins = 2)
    val got = bins.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    // score 1 -> bin 0; score 9 -> bin 1; score 10 (== scale) clamps to bin 1
    assert(got.toSeq === Seq(
      (0L, 1L, 0L, 1L, 0.0, 0.1),
      (1L, 2L, 2L, 19L, 1.0, 0.95)
    ))
    val ece = Stats.eceFromBins(bins, scale = 10L).collect().head
    // |0*10-1| + |2*10-19| = 2; ece = 2/(10*3)
    assert(ece.getLong(0) === 3L)
    assert(ece.getDecimal(1).longValueExact() === 2L)
    assert(ece.getDouble(2) === 2.0 / 30.0)
  }

  test("a perfectly calibrated score has ECE 0; a constant-score miscalibration doesn't") {
    // score/scale == empirical positive rate inside each bin exactly
    val rows = (0 until 10).flatMap { i =>
      Seq((2L, i < 2), (8L, i < 8)) // 20% positives at conf .2, 80% at conf .8
    }
    val bins = Stats.calibrationBins(rows.toDF("s", "y"), "s", col("y"), 10L, 10)
    assert(Stats.eceFromBins(bins, 10L).collect().head.getDouble(2) === 0.0)

    val off = (0 until 10).map(i => (5L, i < 9)) // says 50%, is 90%
    val bOff = Stats.calibrationBins(off.toDF("s", "y"), "s", col("y"), 10L, 10)
    assert(Stats.eceFromBins(bOff, 10L).collect().head.getDouble(2) === 0.4)
  }

  // ---- zipfProfile ------------------------------------------------------

  test("zipfProfile recovers slope ~ -1 on an exact power-law vocabulary") {
    // counts n_r = round(1e6 / r): ln n == ln 1e6 - ln r up to rounding
    val counts = (1 to 50).map(r => (f"t$r%03d", math.round(1e6 / r))).toDF("token", "n")
    val got = TextAnalysis.zipfFromCounts(counts).collect().head
    assert(got.getLong(0) === 50L)
    assert(math.abs(got.getDouble(1) + 1.0) < 0.001, s"slope ${got.getDouble(1)}")
    assert(math.abs(got.getDouble(2) - math.log(1e6)) < 0.01, s"intercept ${got.getDouble(2)}")
  }

  test("zipfProfile end-to-end equals the quantized formula on known counts") {
    val docs = Seq(
      (1L, "a a a a b b c"),
      (2L, "a a b c")
    ).toDF("doc_id", "text")
    // counts: a=6, b=3, c=2 -> ranks 1,2,3
    val expected = {
      val pts = Seq((1L, 6L), (2L, 3L), (3L, 2L)).map { case (r, n) =>
        (math.round(Dsir.glogD(r) * 10000.0), math.round(Dsir.glogD(n) * 10000.0))
      }
      val k = pts.size.toLong
      val sx = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble
      val intercept = sy.toDouble / 10000.0 / k.toDouble -
        slope * (sx.toDouble / 10000.0 / k.toDouble)
      (k, slope, intercept)
    }
    val got = TextAnalysis.zipfProfile(docs, "text", k = 3).collect().head
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2)) === expected)

    // partitioning invariance
    val got16 = TextAnalysis.zipfProfile(docs.repartition(16), "text", k = 3).collect().head
    assert(got16 === got)
  }

  test("zipfProfile rejects degenerate grids") {
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfProfile(Seq((1L, "a")).toDF("doc_id", "text"), "text", k = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfProfile(Seq((1L, "a")).toDF("doc_id", "text"), "text", k = 1001)
    }
    // a single-rank grid (all glog(rank) equal) has zero variance -> null slope
    val one = TextAnalysis.zipfFromCounts(Seq(("a", 5L)).toDF("token", "n")).collect().head
    assert(one.getLong(0) === 1L && one.isNullAt(1) && one.isNullAt(2))
  }

  // ---- rrfFuse ----------------------------------------------------------

  test("rrfFuse sums exact integer contributions and ranks by (score, doc)") {
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), kConst = 60L, topN = 10)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)
    val c61 = 1000000000L / 61L
    val c62 = 1000000000L / 62L
    // doc 20 in both lists (ranks 2, 1); doc 10 at rank 1 beats doc 30 at rank 2
    assert(got.toSeq === Seq(
      (20L, 1, 2L, c61 + c62),
      (10L, 2, 1L, c61),
      (30L, 3, 1L, c62)
    ))
  }

  // ---- mmrSelect --------------------------------------------------------

  test("mmrSelect picks by relevance first, then diversity over redundancy") {
    // A (id 1) and B (id 2) identical high-energy; C (id 3) orthogonal
    // lower-energy. λ=0.5: step 1 takes A (tie with B -> id asc), step 2
    // prefers the orthogonal C over the duplicate B, step 3 takes B at
    // mmr_q exactly 0 (keep·rel == λ·msim for a perfect duplicate).
    val vecs = Seq(
      (1L, Seq(2.0f, 0f, 0f, 0f)),
      (2L, Seq(2.0f, 0f, 0f, 0f)),
      (3L, Seq(0f, 1.5f, 0f, 0f))
    ).toDF("vec_id", "embedding")
      .withColumn("rel_q", Similarity.quantizedEnergy(col("embedding")))
    val relA = 2097152L * 2097152L // floor(2.0 * 2^20)^2
    val relC = 1572864L * 1572864L
    val got = Similarity
      .mmrSelect(vecs, "vec_id", "embedding", "rel_q", k = 3, dim = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, relA, 0L, 500L * relA),
      (2L, 3L, relC, 0L, 500L * relC),
      (3L, 2L, relA, relA, 0L)
    ))
  }

  test("mmrSelect drops unscorable rows, survives k > corpus, is partition-invariant") {
    val vecs = Seq(
      (1L, Some(Seq(1.0f, 0f))),
      (2L, Some(Seq(1.0f, 0f, 0f))), // wrong width: dropped
      (3L, None: Option[Seq[Float]]) // null vector: dropped
    ).toDF("vec_id", "embedding")
      .withColumn("rel_q", Similarity.quantizedEnergy(col("embedding")))
    val got = Similarity.mmrSelect(vecs, "vec_id", "embedding", "rel_q", k = 3, dim = 2)
    assert(got.collect().map(_.getLong(1)).toSeq === Seq(1L))

    val many = (1 to 20).map(i => (i.toLong, Seq(i.toFloat, (21 - i).toFloat)))
      .toDF("vec_id", "embedding")
      .withColumn("rel_q", Similarity.quantizedEnergy(col("embedding")))
    val a = Similarity.mmrSelect(many, "vec_id", "embedding", "rel_q", k = 5, dim = 2).collect()
    val b = Similarity
      .mmrSelect(many.repartition(16), "vec_id", "embedding", "rel_q", k = 5, dim = 2)
      .collect()
    assert(a.toSeq === b.toSeq)
  }

  test("rrfFuse keeps queries independent and honors topN") {
    val a = Seq((1L, 10L, 1), (2L, 11L, 1), (2L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a), kConst = 60L, topN = 1).collect()
    assert(fused.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((1L, 10L), (2L, 11L)))
  }

  test("rrfFuse rejects kConst 0 (silent null-drop hazard with 0-based ranks)") {
    val a = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val e = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), kConst = 0L)
    }
    assert(e.getMessage.contains("kConst"))
  }

  test("mmrSelect excludes right-width vectors with null ELEMENTS (driver NPE hazard)") {
    // Only null-element rows would remain after the first pick if they
    // were admitted — the limit(1) row would carry null msim/mmr_q and
    // getLong would NPE on the driver mid-loop.
    val vecs = Seq(
      (1L, Seq(Some(1.0f), Some(0f))),
      (2L, Seq(Some(1.0f), None: Option[Float])),
      (3L, Seq(None: Option[Float], Some(2.0f)))
    ).toDF("vec_id", "embedding")
      .withColumn(
        "rel_q",
        coalesce(Similarity.quantizedEnergy(col("embedding")), lit(1L))
      )
    val got = Similarity.mmrSelect(vecs, "vec_id", "embedding", "rel_q", k = 3, dim = 2)
    assert(got.collect().map(_.getLong(1)).toSeq === Seq(1L))
  }
}
