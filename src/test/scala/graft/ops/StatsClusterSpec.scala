package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Round-11 batch: event transitions, deterministic k-means, exact
  * Pearson, Misra–Gries heavy hitters.
  */
class StatsClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- eventTransitions -------------------------------------------------

  test("eventTransitions counts consecutive pairs per user and normalizes per from-type") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 09:30:00"), 5L, "c"),
      // u3 has a single event: no transition
      (3L, ts("2024-01-01 08:00:00"), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics
      .eventTransitions(e, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // from a: ->b (u1), ->c (u2); from b: ->a (u1)
    assert(out.toSeq === Seq(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("eventTransitions breaks same-timestamp ties by the id column") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics
      .eventTransitions(e, "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("a", "b"))) // id 1 before id 2
  }

  // ---- kmeans -----------------------------------------------------------

  test("kmeansAssign separates two obvious blobs and is deterministic") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 1L), (3L, 0L, 1L), (4L, 1L, 0L),
      (5L, 100L, 100L), (6L, 101L, 101L), (7L, 100L, 101L), (8L, 101L, 100L)
    ).toDF("id", "x", "y")
    val a = Cluster.kmeansAssign(pts, "id", "x", "y", k = 2, iters = 3)
    val byCluster = a.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(Set(1L, 2L, 3L, 4L).map(byCluster) !== Set(5L, 6L, 7L, 8L).map(byCluster))
    assert(Set(1L, 2L, 3L, 4L).map(byCluster).size === 1)
    assert(Set(5L, 6L, 7L, 8L).map(byCluster).size === 1)
    // re-run: identical assignment (no RNG anywhere)
    val b = Cluster.kmeansAssign(pts, "id", "x", "y", k = 2, iters = 3)
    assert(b.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap === byCluster)
  }

  test("kmeans keeps the previous centroid when a cluster goes empty") {
    // init takes the 3 smallest ids as centroids; centroid 1 (point 2)
    // immediately loses every point to its neighbors at distance 0/1 —
    // with ties broken to the lowest cid
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 2L, 0L)).toDF("id", "x", "y")
    // should not throw, and every row still gets a cluster in 0..2
    val out = Cluster.kmeansAssign(pts, "id", "x", "y", k = 3, iters = 4).collect()
    assert(out.length === 4)
    assert(out.map(_.getInt(3)).forall(c => c >= 0 && c <= 2))
  }

  test("kmeansProfile sums are exact and cover all rows") {
    val pts = (1L to 100L).map(i => (i, i % 10, i % 7)).toDF("id", "x", "y")
    val prof = Cluster.kmeansProfile(pts, "id", "x", "y", k = 3, iters = 2).collect()
    assert(prof.map(_.getLong(1)).sum === 100L)
    assert(prof.map(_.getLong(2)).sum === (1L to 100L).map(_ % 10).sum)
    assert(prof.map(_.getLong(3)).sum === (1L to 100L).map(_ % 7).sum)
  }

  test("N-D kmeans: 3-feature assignment separates blobs, matches 2-D on shared features, " +
    "ND at-rest model round-trips") {
    // two 3-D blobs
    val pts = ((1L to 20L).map(i => (i, i % 3, i % 5, i % 2)) ++
      (21L to 40L).map(i => (i, 500 + i % 3, 500 + i % 5, 500 + i % 2))).toDF("id", "x", "y", "z")
    val nd = Cluster.kmeansAssignND(pts, "id", Seq("x", "y", "z"), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert((1L to 20L).map(nd).toSet.size === 1)
    assert((21L to 40L).map(nd).toSet.size === 1)
    assert(nd(1L) !== nd(21L))
    // 2-D wrapper == ND core on the same two features
    val via2d = Cluster.kmeansAssign(pts, "id", "x", "y", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val viaNd = Cluster.kmeansAssignND(pts, "id", Seq("x", "y"), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(via2d === viaNd)
    // ND model write/read == inline, join-free plan
    val path = java.nio.file.Files.createTempDirectory("kmnd").toString + "/m"
    Cluster.writeModelND(pts, "id", Seq("x", "y", "z"), k = 2, iters = 3, path)
    val fromModel = Cluster.assignFromModelND(pts, "id", Seq("x", "y", "z"), path)
    assert(fromModel.collect().map(r => r.getLong(0) -> r.getInt(4)).toMap === nd)
    assert(!fromModel.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("assignFromModel == inline kmeansAssign bit-for-bit; model plan is map-side") {
    val pts = (1L to 80L).map(i => (i, (i % 13) * 3, (i % 7) * 5)).toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("kmmodel").toString + "/model"
    Cluster.writeModel(pts, "id", "x", "y", k = 3, iters = 2, path)
    val inline = Cluster.kmeansAssign(pts, "id", "x", "y", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val fromModel = Cluster.assignFromModel(pts, "id", "x", "y", path)
    assert(fromModel.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap === inline)
    // centroids are literals: no join anywhere in the scoring plan
    assert(!fromModel.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("clusterBalancedSample takes at most perCluster per cluster, deterministically") {
    val pts = ((1L to 50L).map(i => (i, i % 3, i % 5)) ++
      (51L to 60L).map(i => (i, 1000 + i % 2, 1000 + i % 2))).toDF("id", "x", "y")
    val s1 = Cluster
      .clusterBalancedSample(pts, "id", "x", "y", k = 2, iters = 3, perCluster = 5, seed = "t")
      .collect()
    val byCluster = s1.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byCluster.values.forall(_ <= 5))
    assert(byCluster.values.sum === s1.length && s1.length >= 6) // both blobs represented
    val s2 = Cluster
      .clusterBalancedSample(pts, "id", "x", "y", k = 2, iters = 3, perCluster = 5, seed = "t")
      .collect()
    assert(s1.map(_.getLong(1)).sorted.toSeq === s2.map(_.getLong(1)).sorted.toSeq)
    // a different seed picks a different subset (overwhelmingly likely
    // with 45 candidates choose 5)
    val s3 = Cluster
      .clusterBalancedSample(pts, "id", "x", "y", k = 2, iters = 3, perCluster = 5, seed = "u")
      .collect()
    assert(s3.map(_.getLong(1)).sorted.toSeq !== s1.map(_.getLong(1)).sorted.toSeq)
  }

  // ---- pearsonMatrix ----------------------------------------------------

  test("pearsonMatrix: perfectly linear columns give r = ±1, constant-free exact moments") {
    val df = (1L to 50L).map(i => (i, 3 * i + 7, -2 * i)).toDF("a", "b", "c")
    val out = Stats
      .pearsonMatrix(df, Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(math.abs(out(("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(out(("a", "c")) + 1.0) < 1e-12)
    assert(math.abs(out(("b", "c")) + 1.0) < 1e-12)
  }

  test("trendPerGroup recovers an exact linear law; single-x group yields nulls") {
    // y = 3x + 7 exactly -> slope 3, intercept 7 with zero residual
    val df = ((1L to 20L).map(x => ("lin", x, 3 * x + 7)) :+ (("point", 5L, 9L)))
      .toDF("g", "x", "y")
    val out = Stats
      .trendPerGroup(df, Seq("g"), "x", "y")
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(out("lin").getLong(1) === 20L)
    assert(out("lin").getDouble(2) === 3.0)
    assert(out("lin").getDouble(3) === 7.0)
    assert(out("point").isNullAt(2) && out("point").isNullAt(3))
  }

  test("pearsonMatrix: zero-variance column gives null corr, not NaN") {
    val df = (1L to 10L).map(i => (i, 4L)).toDF("a", "b")
    val r = Stats.pearsonMatrix(df, Seq("a", "b")).collect().head
    assert(r.isNullAt(3))
  }

  test("pearsonMatrix matches a hand-computed r on small data") {
    val rows = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 5L))
    val df = rows.toDF("a", "b")
    val n = rows.size.toDouble
    val sa = rows.map(_._1).sum.toDouble
    val sb = rows.map(_._2).sum.toDouble
    val saa = rows.map(r => r._1 * r._1).sum.toDouble
    val sbb = rows.map(r => r._2 * r._2).sum.toDouble
    val sab = rows.map(r => r._1 * r._2).sum.toDouble
    val want = (n * sab - sa * sb) /
      (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    val got = Stats.pearsonMatrix(df, Seq("a", "b")).collect().head.getDouble(3)
    assert(got === want) // bit-exact, same expression shape
  }

  test("pearsonMatrix properties on random integer data: |r| <= 1, matches naive, " +
    "invariant to positive rescaling of a column") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 4) {
      val rows = (1 to 60).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(2000).toLong))
      val df = rows.toDF("a", "b")
      val r = Stats.pearsonMatrix(df, Seq("a", "b")).collect().head.getDouble(3)
      assert(math.abs(r) <= 1.0 + 1e-12, s"round $round |r|>1: $r")
      val n = rows.size.toDouble
      val (sa, sb) = (rows.map(_._1).sum.toDouble, rows.map(_._2).sum.toDouble)
      val saa = rows.map(x => x._1 * x._1).sum.toDouble
      val sbb = rows.map(x => x._2 * x._2).sum.toDouble
      val sab = rows.map(x => x._1 * x._2).sum.toDouble
      val want = (n * sab - sa * sb) /
        (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
      assert(r === want, s"round $round")
      // r(3a, b) == r(a, b) up to FP in the rescaled moments
      val scaled = rows.map { case (a, b) => (3 * a, b) }.toDF("a", "b")
      val r3 = Stats.pearsonMatrix(scaled, Seq("a", "b")).collect().head.getDouble(3)
      assert(math.abs(r3 - r) < 1e-9, s"round $round rescale moved r: $r3 vs $r")
    }
  }

  test("tokenEntropy bounds on random corpora: 0 <= H <= ln(distinct tokens)") {
    val rnd = new scala.util.Random(13)
    val vocab = (1 to 12).map(i => s"w$i")
    val docs = (1 to 80)
      .map(_ => ("s" + rnd.nextInt(3),
        Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("source", "text")
    Stats.tokenEntropy(docs, "text", "source").collect().foreach { r =>
      val h = r.getDouble(2)
      assert(h >= -1e-9, s"negative entropy $h")
      assert(h <= math.log(vocab.size) + 1e-9, s"entropy $h above ln(|V|)")
    }
  }

  // ---- heavyHitters -----------------------------------------------------

  test("heavyHitters equals the exact answer on a skewed corpus (MG only prunes)") {
    // zipfian-ish: token t_i appears 1000/i times, i = 1..60; plus a
    // long tail of singletons that MUST be pruned by the MG pass
    val rows =
      (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"t_$i")) ++ (1 to 5000).map(i => s"tail_$i")
    val items = rows.toDF("item").repartition(8)
    val minFreq = 0.01
    val out = Sketches
      .heavyHitters(items, "item", capacity = 200, minFreq = minFreq)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exact = rows
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val total = rows.size.toLong
    val thresh = math.ceil(minFreq * total).toLong
    val want = exact.filter(_._2 >= thresh)
    assert(out === want)
    assert(out.nonEmpty)
  }

  test("winsorizeFromSketch clamps into the per-group quantile band") {
    // group g: values 1..100; p10/p90 on a 0..100 sketch with 100 bins
    // land near 10 and 90 — extremes must be pulled inside, mid-range
    // values untouched
    val df = (1L to 100L).map(i => ("g", i)).toDF("grp", "v")
    val sk = Sketches.histogramSketch(df, "v", Seq("grp"), 0.0, 100.0, 100)
    val out = Sketches
      .winsorizeFromSketch(df, "v", Seq("grp"), sk, 0.1, 0.9, 0.0, 100.0, 100)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(2))
      .toMap
    assert(out(1L) > 1.0 && out(1L) <= 12.0)
    assert(out(100L) < 100.0 && out(100L) >= 88.0)
    assert(out(50L) === 50.0)
    // clamped values are monotone in the input
    assert(out(1L) <= out(2L) && out(99L) <= out(100L))
  }

  test("heavyHitters rejects a minFreq below the MG completeness bound") {
    val items = Seq("a", "b").toDF("item")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(items, "item", capacity = 9, minFreq = 0.05)
    }
  }

  test("confusionMatrix: exact counts, diagonal frac is per-class recall") {
    val preds = Seq(
      ("en", "en"), ("en", "en"), ("en", "de"), ("de", "de"), ("zh", "zh")
    ).toDF("lang", "pred_lang")
    val m = Classify
      .confusionMatrix(preds, "lang", "pred_lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(m(("en", "en")) === ((2L, 2.0 / 3.0)))
    assert(m(("en", "de")) === ((1L, 1.0 / 3.0)))
    assert(m(("de", "de")) === ((1L, 1.0)))
    assert(m(("zh", "zh")) === ((1L, 1.0)))
  }

  // ---- tokenEntropy / pmiGrid ------------------------------------------

  test("tokenEntropy: uniform tokens give ln(k), single token gives 0") {
    val docs = Seq(
      ("uniform", "a b c d"), // 4 distinct tokens, once each -> ln 4
      ("point", "x x x x") // one token -> 0
    ).toDF("source", "text")
    val h = Stats
      .tokenEntropy(docs, "text", "source")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(h("uniform")._1 === 4L)
    assert(math.abs(h("uniform")._2 - math.log(4)) < 1e-9)
    assert(h("point")._1 === 4L)
    assert(math.abs(h("point")._2) < 1e-9)
  }

  test("tokenEntropy is deterministic across partitionings") {
    val docs = (1 to 200)
      .map(i => (s"s${i % 3}", s"tok${i % 17} tok${i % 5} tok${i % 11}"))
      .toDF("source", "text")
    val a = Stats.tokenEntropy(docs.repartition(1), "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Stats.tokenEntropy(docs.repartition(7), "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq) // bit-exact: quantized-long sums
  }

  test("pearson/trend from a SketchIngest-maintained moment table == batch, bit-for-bit") {
    import graft.streaming.SketchIngest
    val rows = (1 to 150).map(i => (s"g${i % 3}", i.toLong, (i * 3 % 17).toLong, (i * 7 % 13).toLong))
    val (b1, b2) = rows.splitAt(60)
    val all = rows.toDF("g", "x", "y", "z")
    val tmp = java.nio.file.Files.createTempDirectory("momentingest").toString
    val cols = Seq("x", "y", "z")

    // from-moments == from-raw on the same frame (pure refactor pin)
    val viaMoments = Stats
      .pearsonFromMoments(Stats.pearsonMoments(all, cols), cols)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val direct = Stats.pearsonMatrix(all, cols)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(viaMoments.sortBy(t => (t._1, t._2)).toSeq === direct.sortBy(t => (t._1, t._2)).toSeq)

    // pearson moments maintained over two micro-batches (keyless 1-row
    // additive table: count + decimal sums merge exactly)
    val pPath = s"$tmp/pearson"
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      SketchIngest.ingestAdditiveBatch(
        b.toDF("g", "x", "y", "z"), i.toLong,
        (d: org.apache.spark.sql.DataFrame) => Stats.pearsonMoments(d, cols),
        Seq.empty,
        Seq("n", "s_x", "ss_x", "s_y", "ss_y", "s_z", "ss_z", "sp_x_y", "sp_x_z", "sp_y_z"),
        pPath)
    }
    val streamedP = Stats
      .pearsonFromMoments(spark.read.parquet(pPath), cols)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamedP.sortBy(t => (t._1, t._2)).toSeq === direct.sortBy(t => (t._1, t._2)).toSeq)
    // replay of an applied batch is recognized and skipped
    assert(!SketchIngest.ingestAdditiveBatch(
      b2.toDF("g", "x", "y", "z"), 1L,
      (d: org.apache.spark.sql.DataFrame) => Stats.pearsonMoments(d, cols),
      Seq.empty,
      Seq("n", "s_x", "ss_x", "s_y", "ss_y", "s_z", "ss_z", "sp_x_y", "sp_x_z", "sp_y_z"),
      pPath))

    // per-group OLS moments likewise
    val tPath = s"$tmp/trend"
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      SketchIngest.ingestAdditiveBatch(
        b.toDF("g", "x", "y", "z"), i.toLong,
        (d: org.apache.spark.sql.DataFrame) => Stats.trendMoments(d, Seq("g"), "x", "y"),
        Seq("g"),
        Seq("n", "sx", "sy", "sxx", "sxy"),
        tPath)
    }
    def fitRow(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))
    val streamedT = Stats.trendFromMoments(spark.read.parquet(tPath), Seq("g"))
      .collect().map(fitRow).sortBy(_._1)
    val batchT = Stats.trendPerGroup(all, Seq("g"), "x", "y")
      .collect().map(fitRow).sortBy(_._1)
    assert(streamedT.toSeq === batchT.toSeq)
  }

  test("entropy/PMI from a SketchIngest-maintained count table == batch, bit-for-bit") {
    import graft.streaming.SketchIngest
    val docs = (1 to 120).map(i => (s"s${i % 3}", s"l${i % 2}", s"tok${i % 7} tok${i % 4}"))
    val (b1, b2) = docs.splitAt(50)
    val tmp = java.nio.file.Files.createTempDirectory("statsingest").toString

    // (source, token) counts maintained over two micro-batches
    val tokPath = s"$tmp/tok"
    val tokFold = (b: org.apache.spark.sql.DataFrame) =>
      b.select(col("source"), explode(graft.functions.Fns.tokens(col("text"))).as("token"))
        .groupBy("source", "token")
        .agg(count(lit(1)).as("n"))
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      SketchIngest.ingestCountBatch(
        b.toDF("source", "lang", "text"), i.toLong, tokFold, Seq("source", "token"), tokPath)
    }
    val streamedH = Stats
      .tokenEntropyFromCounts(spark.read.parquet(tokPath), "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val batchH = Stats
      .tokenEntropy(docs.toDF("source", "lang", "text"), "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(streamedH.toSeq === batchH.toSeq)

    // (lang, source) joint counts likewise
    val gridPath = s"$tmp/grid"
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      SketchIngest.ingestCountBatch(
        b.toDF("source", "lang", "text"), i.toLong,
        (x: org.apache.spark.sql.DataFrame) =>
          x.groupBy("lang", "source").agg(count(lit(1)).as("n")),
        Seq("lang", "source"), gridPath)
    }
    val streamedP = Stats
      .pmiFromCounts(spark.read.parquet(gridPath), "lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val batchP = Stats
      .pmiGrid(docs.toDF("source", "lang", "text"), "lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamedP.toSeq === batchP.toSeq)

    // PSI read off the SAME streamed (source, token) table: reference =
    // the s0 slice, current = s1 — bit-identical to raw-row PSI over
    // the full docs set (the drift monitor reads two tiny at-rest
    // tables, never a corpus)
    val counts = spark.read.parquet(tokPath)
    def slice(src: String) =
      counts.filter(col("source") === src).select(col("token"), col("n"))
    val streamedPsi = Stats.psiFromCounts(slice("s0"), slice("s1"), "token").head()
    def rawToks(src: String) = docs.toDF("source", "lang", "text")
      .filter(col("source") === src)
      .select(explode(graft.functions.Fns.tokens(col("text"))).as("token"))
    val rawPsi = Stats.psi(rawToks("s0"), rawToks("s1"), "token").head()
    assert(streamedPsi === rawPsi)
  }

  test("pmiGrid: independent columns give pmi 0, perfectly dependent give ln(k)") {
    // x uniform over 2, y == x: joint = marginal -> pmi = ln 2 on the
    // diagonal; an independent grid gives pmi = 0 everywhere
    val dep = (1 to 40).map(i => (s"x${i % 2}", s"y${i % 2}")).toDF("a", "b")
    val depOut = Stats.pmiGrid(dep, "a", "b").collect()
    assert(depOut.length === 2)
    depOut.foreach(r => assert(math.abs(r.getDouble(3) - math.log(2)) < 1e-9))
    val ind = (0 until 40).map(i => (s"x${i % 2}", s"y${(i / 2) % 2}")).toDF("a", "b")
    Stats.pmiGrid(ind, "a", "b").collect().foreach { r =>
      assert(math.abs(r.getDouble(3)) < 1e-9)
      assert(r.getLong(2) === 10L)
    }
  }

  test("psi: identical distributions give EXACTLY 0; divergence is symmetric and monotone") {
    def dist(counts: (String, Int)*) =
      counts.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    val base = dist("a" -> 40, "b" -> 30, "c" -> 30)
    val same = Stats.psi(base, dist("a" -> 40, "b" -> 30, "c" -> 30), "k").head()
    // p == q per key -> every quantized term is round(0 * lr) = 0: exact
    assert(same.getAs[Double]("psi") === 0.0)
    assert(same.getAs[Long]("n_keys") === 3L)
    assert(same.getAs[Long]("ref_n") === 100L && same.getAs[Long]("cur_n") === 100L)
    val mild = Stats.psi(base, dist("a" -> 30, "b" -> 35, "c" -> 35), "k")
      .head().getAs[Double]("psi")
    val wild = Stats.psi(base, dist("a" -> 5, "b" -> 5, "c" -> 90), "k")
      .head().getAs[Double]("psi")
    assert(mild > 0.0 && wild > mild, s"monotone drift: $mild vs $wild")
    assert(wild > 0.25, "a 30/30/40 -> 5/5/90 shift must trip the standard 0.25 act gate")
    // (p-q)ln(p/q) is symmetric in (p,q): swapping sides moves only the totals' labels
    val ab = Stats.psi(base, dist("a" -> 5, "b" -> 5, "c" -> 90), "k").head()
    val ba = Stats.psi(dist("a" -> 5, "b" -> 5, "c" -> 90), base, "k").head()
    assert(ab.getAs[Double]("psi") === ba.getAs[Double]("psi"))
    // keys seen on only ONE side stay finite (the Laplace smoothing)
    val oneSided = Stats.psi(base, dist("d" -> 100), "k").head().getAs[Double]("psi")
    assert(!oneSided.isInfinite && !oneSided.isNaN && oneSided > 1.0)
  }

  test("psiFromCounts == psi from raw rows; count tables are addition-mergeable") {
    def dist(counts: (String, Int)*) =
      counts.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    val ref = dist("a" -> 12, "b" -> 7)
    val cur = dist("a" -> 3, "b" -> 9, "c" -> 2)
    val fromRaw = Stats.psi(ref, cur, "k").head()
    def cnt(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(count(lit(1)).as("n"))
    val fromCounts = Stats.psiFromCounts(cnt(ref), cnt(cur), "k").head()
    assert(fromRaw === fromCounts)
    // merged halves == whole (the SketchIngest additive contract)
    val h1 = dist("a" -> 6, "b" -> 3)
    val h2 = dist("a" -> 6, "b" -> 4)
    val merged = cnt(h1).unionByName(cnt(h2)).groupBy($"k").agg(sum($"n").as("n"))
    assert(Stats.psiFromCounts(merged, cnt(cur), "k").head() === fromCounts)
  }

  test("psiPerGroup: each group's row == the ungrouped psi of that group's slice") {
    val ref = Seq(("g1", "a", 10L), ("g1", "b", 5L), ("g2", "a", 7L), ("g2", "c", 3L))
      .toDF("g", "k", "n")
    val cur = Seq(("g1", "a", 2L), ("g1", "b", 9L), ("g2", "a", 7L), ("g2", "c", 3L),
      ("g3", "z", 4L)).toDF("g", "k", "n")
    val grouped = Stats.psiPerGroup(ref, cur, "g", "k")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(grouped.keySet === Set("g1", "g2", "g3"), "groups on either side all report")
    Seq("g1", "g2", "g3").foreach { g =>
      def slice(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("g") === g).select(col("k"), col("n"))
      val single = Stats.psiFromCounts(slice(ref), slice(cur), "k").head()
      val got = grouped(g)
      assert(got.getAs[Long]("n_keys") === single.getAs[Long]("n_keys"), g)
      assert(got.getAs[Double]("psi") === single.getAs[Double]("psi"), g)
    }
    // identical group drifts 0, shifted group doesn't, one-sided stays finite
    assert(grouped("g2").getAs[Double]("psi") === 0.0)
    assert(grouped("g1").getAs[Double]("psi") > 0.0)
    assert(!grouped("g3").getAs[Double]("psi").isNaN)
  }

  test("psi null-safety and empty-input contracts") {
    // a null KEY is one category, not two unmatched rows: n_keys counts
    // it once and both sides' counts meet in one smoothed term
    val ref = Seq((Some("a"), 10L), (Option.empty[String], 5L)).toDF("k", "n")
    val cur = Seq((Some("a"), 10L), (Option.empty[String], 5L)).toDF("k", "n")
    val same = Stats.psiFromCounts(ref, cur, "k").head()
    assert(same.getAs[Long]("n_keys") === 2L, "null key counted once per side, matched")
    assert(same.getAs[Double]("psi") === 0.0)
    // a null GROUP reports a row, not a silent disappearance
    val gref = Seq((Option.empty[String], "a", 4L), (Some("g1"), "a", 4L)).toDF("g", "k", "n")
    val gcur = Seq((Option.empty[String], "a", 7L), (Some("g1"), "a", 4L)).toDF("g", "k", "n")
    val rows = Stats.psiPerGroup(gref, gcur, "g", "k")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Long]("n_keys")).toMap
    assert(rows.keySet === Set(None, Some("g1")))
    assert(rows(None) === 1L)
    // both inputs empty: ONE row (n_keys 0, psi null) — the SQL
    // oracle's global-agg shape, so q151 stays row-count-stable
    val empty = Seq.empty[(String, Long)].toDF("k", "n")
    val e = Stats.psiFromCounts(empty, empty, "k").head()
    assert(e.getAs[Long]("n_keys") === 0L)
    assert(e.isNullAt(e.fieldIndex("psi")))
  }

  test("cohenKappa: perfect agreement 1, independence ~0, textbook grid exact") {
    val perfect = (1 to 30).map(i => (s"l${i % 3}", s"l${i % 3}")).toDF("a", "b")
    assert(Stats.cohenKappa(perfect, "a", "b").head().getAs[Double]("kappa") === 1.0)
    // independent marginals over a SHARED label space: po == pe by
    // construction -> kappa 0 exactly
    val ind = (0 until 40).map(i => (s"l${i % 2}", s"l${(i / 2) % 2}")).toDF("a", "b")
    assert(Stats.cohenKappa(ind, "a", "b").head().getAs[Double]("kappa") === 0.0)
    // the standard worked example: grid [[20,5],[10,15]] -> N=50, A=35,
    // E = 30*25 + 20*25 = 1250; kappa = (35*50-1250)/(2500-1250) = 0.4
    val grid = Seq(("y", "y", 20L), ("y", "n", 5L), ("n", "y", 10L), ("n", "n", 15L))
      .toDF("a", "b", "n")
    val k = Stats.kappaFromCounts(grid, "a", "b").head()
    assert(k.getAs[Long]("n_total") === 50L && k.getAs[Long]("agree") === 35L)
    assert(k.getAs[Double]("kappa") === 0.4)
    // degenerate single-label chance: N^2 == E -> null, not an artifact
    val mono = Seq(("y", "y", 10L)).toDF("a", "b", "n")
    assert(Stats.kappaFromCounts(mono, "a", "b").head().isNullAt(2))
    // label present on only one side contributes 0 to E, not a crash
    val skew = Seq(("y", "z", 4L), ("y", "y", 6L)).toDF("a", "b", "n")
    val ks = Stats.kappaFromCounts(skew, "a", "b").head()
    assert(ks.getAs[Long]("agree") === 6L && !ks.isNullAt(2))
    // null-label rows are DROPPED, not silently counted into N only
    // (they'd bias kappa toward 0: never agree, excluded from E)
    val withNulls = Seq(
      (Some("y"), Some("y"), 20L), (Some("y"), Some("n"), 5L),
      (Some("n"), Some("y"), 10L), (Some("n"), Some("n"), 15L),
      (Option.empty[String], Some("y"), 50L), (Some("y"), Option.empty[String], 50L)
    ).toDF("a", "b", "n")
    val kn = Stats.kappaFromCounts(withNulls, "a", "b").head()
    assert(kn.getAs[Long]("n_total") === 50L, "null-label rows excluded from N")
    assert(kn.getAs[Double]("kappa") === 0.4, "kappa unchanged by dropped null labels")
  }
}
