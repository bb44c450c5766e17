package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Property-style tests pinning the distributed operators against naive
  * in-memory reference implementations over seeded randomized inputs
  * (fixed-seed Random — same no-scalatestplus constraint as
  * DiffPropertySpec).
  */
class OperatorPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("incrementalExact matches the naive set difference on random corpora") {
    for (round <- 1 to 6) {
      val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff")
      def doc(): String = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val history = (1 to 20).map(i => (i.toLong, doc()))
      val batch = (100 to 130).map(i => (i.toLong, doc()))
      // empty-history every third round exercises the null-bloom guard
      val hist = if (round % 3 == 0) Seq.empty[(Long, String)] else history
      val got = Dedup
        .incrementalExact(batch.toDF("doc_id", "text"), hist.toDF("doc_id", "text"),
          "text", "doc_id", expectedHistoryItems = 100L)
        .select("doc_id").as[Long].collect().toSet
      val histTexts = hist.map(_._2).toSet
      val want = batch.filter { case (_, t) => !histTexts(t) }.map(_._1).toSet
      assert(got === want, s"round $round")
    }
  }

  test("decontaminate matches the naive shared-shingle count on random corpora") {
    for (round <- 1 to 4) {
      val vocab = Seq("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8")
      def doc(): String = Seq.fill(3 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val train = (1 to 25).map(i => (i.toLong, doc()))
      val evalS = (100 to 104).map(i => (i.toLong, doc()))
      val got = TextAnalysis
        .decontaminate(train.toDF("doc_id", "text"), evalS.toDF("doc_id", "text"),
          "text", "doc_id", n = 2)
        .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
      def grams(t: String): Set[String] =
        t.split(" ").toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
      val evalVocab = evalS.flatMap(d => grams(d._2)).toSet
      val want = train.map { case (id, t) => id -> grams(t).count(evalVocab).toLong }.toMap
      assert(got === want, s"round $round")
    }
  }

  test("asOf matches the naive per-row max(rightTs <= leftTs) lookup") {
    for (_ <- 1 to 8) {
      val keys = Seq("a", "b", "c")
      val left = (1 to 30).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, s"l$i")
      )
      val right = (1 to 30).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, i.toLong)
      )
      val got = AsOfJoin
        .asOf(
          left.toDF("k", "t", "lv"),
          right.toDF("k", "t", "rid"),
          Seq("k"), "t", "t"
        )
        .select("lv", "right_rid")
        .as[(String, Option[Long])]
        .collect()
        .toMap
      // naive: latest right ts <= left ts; ties -> greatest (t, rid)
      // tuple, the operator's documented orderable-payload tiebreak
      val want = left.map { case (k, lt, lv) =>
        lv -> right
          .filter { case (rk, rt, _) => rk == k && rt <= lt }
          .sortBy { case (_, rt, rid) => (rt, rid) }
          .lastOption
          .map(_._3)
      }.toMap
      assert(got === want)
    }
  }

  test("sessionize matches the naive gap-scan per key") {
    for (_ <- 1 to 8) {
      val evs = (1 to 40).map { i =>
        (rnd.nextInt(3).toLong, new java.sql.Timestamp(rnd.nextInt(10000) * 1000L), i.toLong)
      }
      val gap = 600L
      val got = Analytics
        .sessionize(evs.toDF("user_id", "ts", "event_id"), Seq("user_id"), "ts", "event_id", gap)
        .select("user_id", "event_id", "session_id")
        .as[(Long, Long, Long)]
        .collect()
        .map { case (u, e, s) => (u, e) -> s }
        .toMap
      val want = evs
        .groupBy(_._1)
        .flatMap { case (u, rows) =>
          val ordered = rows.sortBy(r => (r._2.getTime, r._3))
          var sid = -1L
          var lastTs = Long.MinValue
          ordered.map { case (_, ts, eid) =>
            if (lastTs == Long.MinValue || ts.getTime - lastTs > gap * 1000) sid += 1
            lastTs = ts.getTime
            (u, eid) -> sid
          }
        }
        .toMap
      assert(got === want)
    }
  }

  test("pointInInterval matches the naive inequality join, without a nested loop") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    for (trial <- 1 to 5) {
      val points = (1 to 60).map(i =>
        (rnd.nextInt(3).toString, ts(rnd.nextInt(500000).toLong), i.toLong)
      ).toDF("k", "t", "pid")
      val intervals = (1 to 20).map(i =>
        {
          val lo = rnd.nextInt(500000).toLong
          (rnd.nextInt(3).toString, ts(lo), ts(lo + rnd.nextInt(200000).toLong), i.toLong)
        }
      ).toDF("k", "lo", "hi", "iid")
      val chunk = 40000L
      val got = RangeJoin
        .pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", chunk)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = points
        .join(intervals, Seq("k"))
        .filter($"t" >= $"lo" && $"t" < $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got === want, s"trial $trial")
    }
    // the chunked plan must be a hash/merge equi-join, not a nested loop
    val plan = RangeJoin
      .pointInInterval(
        Seq(("a", ts(1), 1L)).toDF("k", "t", "pid"),
        Seq(("a", ts(0), ts(2), 1L)).toDF("k", "lo", "hi", "iid"),
        Seq("k"), "t", "lo", "hi", 10L
      )
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlap matches the naive overlap join with no duplicate pairs") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    for (trial <- 1 to 5) {
      def gen(n: Int) = (1 to n).map { i =>
        val lo = rnd.nextInt(500000).toLong
        (rnd.nextInt(3).toString, ts(lo), ts(lo + rnd.nextInt(300000).toLong + 1), i.toLong)
      }
      val l = gen(25).toDF("k", "lo", "hi", "lid")
      val r = gen(25).toDF("k", "lo", "hi", "rid")
      val got = RangeJoin
        .intervalOverlap(l, r, Seq("k"), "lo", "hi", "lo", "hi", chunkSeconds = 50000L)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"trial $trial emitted duplicate pairs")
      val want = l.join(r.withColumnRenamed("lo", "rlo").withColumnRenamed("hi", "rhi"), Seq("k"))
        .filter($"lo" < $"rhi" && $"rlo" < $"hi")
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got.toSet === want, s"trial $trial")
    }
  }

  test("checks: duplicates, null profile, orphans") {
    val df = Seq(
      (1L, Some("a"), "x"), (1L, None, "x"), (2L, Some("b"), "y"), (3L, None, "z")
    ).toDF("id", "v", "w")
    val dups = Checks.duplicateKeys(df, Seq("id")).as[(Long, Long)].collect().toSeq
    assert(dups === Seq((1L, 2L)))
    val nulls = Checks.nullCounts(df, Seq("v", "w")).as[(String, Long)].collect().toMap
    assert(nulls === Map("v" -> 2L, "w" -> 0L))
    val parent = Seq(1L, 2L).toDF("pid")
    val orphans = Checks.orphans(df, parent, Seq("id"), Seq("pid"))
      .select("id").as[Long].collect().toSeq
    assert(orphans === Seq(3L))
  }

  test("skewProfile: hand-computed shares and hot/mean ratios, deterministic ties") {
    // a x6, b x3, c x1 -> total 10, 3 keys; mean per key = 10/3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = Checks.skewProfile(df, "k", topK = 2).collect()
      .map(r => (r.getAs[String]("key_value"), r.getAs[Long]("n"),
        r.getAs[Double]("share"), r.getAs[Double]("x_mean")))
    assert(got.toSeq === Seq(("a", 6L, 0.6, 1.8), ("b", 3L, 0.3, 0.9)))
  }

  test("sourceDivergence matches a naive in-memory reference on random corpora") {
    for (round <- 1 to 4) {
      val vocab = Seq("tok1", "tok2", "tok3", "tok4", "tok5")
      def doc(): String = Seq.fill(2 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val rows = (1 to 40).map(i => (i.toLong, doc(), s"s${i % 3}"))
      val topK = 4
      val got = TextAnalysis
        .sourceDivergence(rows.toDF("doc_id", "text", "source"), "text", "source", topK)
        .collect()
        .map(r => r.getAs[String]("source") -> (r.getAs[Double]("tv_div"), r.getAs[Double]("chi2_div")))
        .toMap
      // naive reference with the same determinism contract (BigDecimal
      // sums of IEEE terms at scale 12, half-up)
      val toks = rows.flatMap { case (_, t, s) => t.split(" ").map(s -> _) }
      val cq = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val top = cq.toSeq.sortBy { case (w, c) => (-c, w) }.take(topK)
      val tq = top.map(_._2).sum
      val want = rows.map(_._3).distinct.map { s =>
        val cs = top.map { case (w, _) => w -> toks.count(p => p._1 == s && p._2 == w).toLong }
        val ts = cs.map(_._2).sum
        def dec(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        val terms = top.zip(cs).map { case ((w, cqw), (_, csw)) =>
          val p = csw.toDouble / ts.toDouble
          val q = cqw.toDouble / tq.toDouble
          (dec(math.abs(p - q) / 2.0), dec((p - q) * (p - q) / q))
        }
        s -> (terms.map(_._1).sum.toDouble, terms.map(_._2).sum.toDouble)
      }.toMap
      assert(got === want, s"round $round")
    }
  }

  test("temperatureSample: sqrt-flattened quotas, capped at group size, deterministic") {
    // n = (900, 100): sqrt shares (30, 10)/40 -> quotas (75, 25) of 100.
    // The small source's share rises 10% -> 25% — the whole point of
    // temperature flattening.
    val df = ((1 to 900).map(i => (i.toLong, "a")) ++ (1001 to 1100).map(i => (i.toLong, "b")))
      .toDF("doc_id", "source")
    val got = Sampling.temperatureSample(df, "source", "doc_id", 100L)
    val bySrc = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc === Map("a" -> 75L, "b" -> 25L))
    // deterministic under repartitioning
    val again = Sampling.temperatureSample(df.repartition(7), "source", "doc_id", 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(got.select("doc_id").as[Long].collect().toSet === again)
    // a source smaller than its quota is taken whole, never padded
    val small = Seq((1L, "x"), (2L, "x"), (10L, "y")).toDF("doc_id", "source")
    assert(Sampling.temperatureSample(small, "source", "doc_id", 100L).count() === 3L)
  }

  test("sampling is deterministic across partitionings; budget cap is a soft cap") {
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 3}", (i % 7 + 1).toLong))
      .toDF("id", "g", "w")
    val a = Sampling.perGroupSample(df, Seq("g"), "id", 10)
      .select("id").as[Long].collect().toSet
    val b = Sampling.perGroupSample(df.repartition(7), Seq("g"), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(a === b && a.size === 30)
    val kept = Sampling.budgetPerGroup(df, Seq("g"), "id", "w", 50L)
      .groupBy("g").agg(sum("w").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    kept.foreach { case (g, s, n) =>
      assert(s >= 50L, s"$g under-filled: $s") // crossed the cap (soft)
      assert(s - 7 < 50L + 7, s"$g over-filled: $s") // by at most one row's weight
      assert(n > 0)
    }
    // determinism under repartitioning for the budget walk too
    val k1 = Sampling.budgetPerGroup(df, Seq("g"), "id", "w", 50L)
      .select("id").as[Long].collect().toSet
    val k2 = Sampling.budgetPerGroup(df.repartition(5), Seq("g"), "id", "w", 50L)
      .select("id").as[Long].collect().toSet
    assert(k1 === k2)
    // sequence packing: every row assigned, sequences hold ~budget
    // (overflow bounded by one row's weight), ids contiguous from 0
    val packed = Sampling.packSequences(df, Seq("g"), "id", "w", 40L)
    assert(packed.count() === 200)
    val perSeq = packed.groupBy("g", "seq_id").agg(sum("w").as("s"))
      .as[(String, Long, Long)].collect()
    perSeq.foreach { case (g, sid, s) =>
      assert(s < 40L + 7L, s"($g,$sid) over-packed: $s")
    }
    val seqIds = packed.filter($"g" === "g1").select("seq_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(seqIds === (0L until seqIds.length).toSeq)
  }

  test("assignSplit: partition of the data, stable under append, near target fractions") {
    val df = (1 to 4000).map(_.toLong).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.assignSplit(df, "id", splits)
    val bySplit = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit.values.sum === 4000L)
    assert(math.abs(bySplit("train") - 3200L) < 200, bySplit.toString)
    // a row's split depends only on its id: appending data changes nothing
    val bigger = (1 to 8000).map(_.toLong).toDF("id")
    val stable = Sampling.assignSplit(bigger, "id", splits)
      .filter($"id" <= 4000).as[(Long, String)].collect().toMap
    val orig = assigned.as[(Long, String)].collect().toMap
    assert(stable === orig)
    // null id -> null split (never silently dumped into one split)
    val withNull = Seq(Some(1L), None).toDF("id")
    val ns = Sampling.assignSplit(withNull, "id", splits)
      .as[(Option[Long], Option[String])].collect().toMap
    assert(ns(None) === None && ns(Some(1L)).isDefined)
    // invalid fractions rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "id", Seq("a" -> 1.2, "b" -> -0.2))
    }
  }

  test("topKPerGroup matches naive sort-take per group") {
    for (_ <- 1 to 8) {
      val rows = (1 to 50).map(i => (rnd.nextInt(4).toString, rnd.nextInt(100).toDouble, i.toLong))
      val got = Analytics
        .topKPerGroup(rows.toDF("g", "v", "id"), Seq("g"), "v", "id", 3)
        .select("g", "id")
        .as[(String, Long)]
        .collect()
        .toSet
      val want = rows
        .groupBy(_._1)
        .toSeq
        .flatMap { case (g, rs) =>
          rs.sortBy { case (_, v, id) => (-v, id) }.take(3).map(r => (g, r._3))
        }
        .toSet
      assert(got === want)
    }
  }

  test("psi invariants on random count tables: >= 0, 0 on identical, matches naive") {
    def glog(x: Long): Double = {
      // the engine's IEEE-exact ln (Dsir.glog) replayed in plain Scala:
      // same bin-exponent / two-sqrt / 8-term Horner shape
      val e = (63 - java.lang.Long.numberOfLeadingZeros(x)).toDouble
      val m = x.toDouble / math.pow(2.0, e)
      val r = math.sqrt(math.sqrt(m))
      val z = (r - 1.0) / (r + 1.0)
      val w = z * z
      val horner = 1.0 + w * (1.0 / 3.0 + w * (1.0 / 5.0 + w * (1.0 / 7.0 + w * (1.0 / 9.0 +
        w * (1.0 / 11.0 + w * (1.0 / 13.0 + w * (1.0 / 15.0)))))))
      e * 0.6931471805599453 + 8.0 * (z * horner)
    }
    for (round <- 1 to 8) {
      val keys = ('a' to ('a' + 2 + rnd.nextInt(4)).toChar).map(_.toString)
      val ref = keys.map(k => k -> (rnd.nextInt(40) + 1).toLong)
      val cur =
        if (round % 4 == 0) ref // identical counts -> every term exactly 0
        else keys.map(k => k -> (rnd.nextInt(40) + 1).toLong)
      def cnts(xs: Seq[(String, Long)]) = xs.toDF("k", "n")
      val got = Stats.psiFromCounts(cnts(ref), cnts(cur), "k").head().getAs[Double]("psi")
      assert(got >= 0.0, s"psi must be non-negative, got $got")
      // NOTE: only IDENTICAL tables give exact 0 — PROPORTIONAL ones
      // (cur = 3x ref) sit slightly above it because Laplace smoothing
      // (+1 on different totals) perturbs the shares asymmetrically
      if (round % 4 == 0) assert(got === 0.0, "identical distributions -> exactly 0")
      // naive replay with the same smoothing/quantization discipline
      val (bigR, bigC, kk) = (ref.map(_._2).sum, cur.map(_._2).sum, keys.size.toLong)
      val want = keys.map { k =>
        val (r, c) = (ref.toMap.apply(k), cur.toMap.apply(k))
        val p = (c + 1).toDouble / (bigC + kk).toDouble
        val q = (r + 1).toDouble / (bigR + kk).toDouble
        val lr = glog(c + 1) - glog(bigC + kk) - glog(r + 1) + glog(bigR + kk)
        math.round((p - q) * lr * 1e9)
      }.sum / 1e9
      assert(got === want, s"psi $got != naive $want")
    }
  }

  test("kappa invariants on random grids: <= 1, == 1 iff all diagonal, matches naive") {
    for (_ <- 1 to 8) {
      val labels = Seq("x", "y", "z")
      val grid = for {
        a <- labels; b <- labels
        n = rnd.nextInt(20).toLong if n > 0
      } yield (a, b, n)
      if (grid.nonEmpty) {
        val got = Stats.kappaFromCounts(grid.toDF("a", "b", "n"), "a", "b").head()
        val n = grid.map(_._3).sum
        val agree = grid.collect { case (a, b, c) if a == b => c }.sum
        val e = labels.map { k =>
          grid.collect { case (`k`, _, c) => c }.sum * grid.collect { case (_, `k`, c) => c }.sum
        }.sum
        assert(got.getAs[Long]("n_total") === n && got.getAs[Long]("agree") === agree)
        if (n * n != e) {
          val kappa = got.getAs[Double]("kappa")
          assert(kappa <= 1.0)
          assert(kappa === (agree * n - e).toDouble / (n * n - e).toDouble)
          if (agree == n) assert(kappa === 1.0)
        } else assert(got.isNullAt(2))
      }
    }
  }
}
