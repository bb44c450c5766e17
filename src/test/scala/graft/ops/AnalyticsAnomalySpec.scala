package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class AnalyticsAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("gapFill fills missing days with zero over the full calendar") {
    val daily = Seq(("2024-01-01", 5.0), ("2024-01-04", 2.0))
      .toDF("d", "value")
      .select(to_date($"d").as("date"), $"value")
    val filled = Analytics.gapFill(daily, "2024-01-01", "2024-01-05").orderBy("date")
    assert(filled.count() === 5)
    assert(filled.select("value").as[Double].collect().toSeq === Seq(5.0, 0.0, 0.0, 2.0, 0.0))
  }

  test("gapFillPerKey gives every key its own full zero-filled calendar") {
    val daily = Seq(
      ("c1", "t1", "2024-01-01", 5.0),
      ("c1", "t1", "2024-01-04", 2.0),
      ("c2", "t2", "2024-01-02", 7.0)
    ).toDF("company_id", "table_name", "d", "value")
      .select($"company_id", $"table_name", to_date($"d").as("date"), $"value")
    val filled = Analytics
      .gapFillPerKey(daily, Seq("company_id", "table_name"), "2024-01-01", "2024-01-05")
    assert(filled.count() === 10) // 2 keys x 5 days
    val c1 = filled.filter($"company_id" === "c1").orderBy("date")
      .select("value").as[Double].collect().toSeq
    assert(c1 === Seq(5.0, 0.0, 0.0, 2.0, 0.0))
    val c2 = filled.filter($"company_id" === "c2").orderBy("date")
      .select("value").as[Double].collect().toSeq
    assert(c2 === Seq(0.0, 7.0, 0.0, 0.0, 0.0))
  }

  test("eventHistogram rollup total equals sum of groups") {
    val df = Seq("a", "a", "b").toDF("event_type")
    val h = Analytics.eventHistogram(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h("a") === 2 && h("b") === 1 && h("TOTAL") === 3)
  }

  test("approx_count_distinct (HLL++ scale path for exact distinct) stays within 5%") {
    // the sketch-based path a 100 TB deployment uses where q38's exact
    // expand+two-phase distinct would shuffle too much
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val got = li
      .agg(
        countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey", 0.02).as("approx")
      )
      .as[(Long, Long)]
      .head()
    val (exact, approx) = got
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("topK is deterministic under value ties") {
    val df = Seq((1L, 10.0), (2L, 10.0), (3L, 5.0)).toDF("id", "v")
    val got = Analytics.topK(df, "v", "id", 2).select("id").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L))
  }

  test("latestPerKey picks max (ts, tiebreak) row") {
    val df = Seq(("k", 1L, 1L, "old"), ("k", 2L, 1L, "mid"), ("k", 2L, 2L, "new"))
      .toDF("k", "ts", "id", "v")
    val got = Analytics.latestPerKey(df, Seq("k"), "ts", "id").select("v").as[String].head()
    assert(got === "new")
  }

  test("topKPerGroup keeps k best rows per group, deterministic on ties") {
    val df = Seq(("g1", 1L, 9.0), ("g1", 2L, 9.0), ("g1", 3L, 1.0), ("g2", 4L, 5.0))
      .toDF("g", "id", "v")
    val got = Analytics.topKPerGroup(df, Seq("g"), "v", "id", 2)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(got === Set(("g1", 1L), ("g1", 2L), ("g2", 4L)))
  }

  test("sessionize: gap > threshold starts a new session per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("u1", 1L, ts("2024-01-01 10:00:00")),
      ("u1", 2L, ts("2024-01-01 10:10:00")), // same session (10 min)
      ("u1", 3L, ts("2024-01-01 11:30:00")), // gap 80 min -> new session
      ("u2", 4L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val got = Analytics.sessionize(df, Seq("user_id"), "ts", "event_id", 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("anomaly: planted spike is flagged, flat series is not") {
    val flat = (1 to 30).map(i => (f"2024-01-$i%02d", 5.0 + (i % 3))) // mild noise
    val spiked = flat.updated(20, ("2024-01-21", 50.0))
    val score = Anomaly.score(
      spiked.toDF("date", "value"),
      partitionKeys = Seq.empty,
      lookback = 7,
      threshold = 2.0
    )
    val flagged = score.filter($"is_anomaly").select("date").as[String].collect()
    assert(flagged.contains("2024-01-21"))
    // the spike dominates; at most the ratio cap can flag
    assert(flagged.length <= (30 * 0.25).toInt)
  }

  test("anomaly: series below minPoints never flags") {
    val tiny = (1 to 5).map(i => (s"2024-01-0$i", if (i == 3) 100.0 else 1.0))
    val score =
      Anomaly.score(tiny.toDF("date", "value"), Seq.empty, lookback = 2, minPoints = 12)
    assert(score.filter($"is_anomaly").count() === 0)
  }

  test("robustScore: exact median/MAD arithmetic; outliers can't mask each other; MAD=0 -> null") {
    // group g: values 1..7 plus two huge outliers. median = 5 of
    // {1..7,100,200} -> sorted {1,2,3,4,5,6,7,100,200}, med 5;
    // deviations {4,3,2,1,0,1,2,95,195}, MAD = med = 2
    val rows = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0, 200.0).zipWithIndex.map {
      case (v, i) => (i.toLong, "g", v)
    } ++ Seq((100L, "flat", 9.0), (101L, "flat", 9.0), (102L, "flat", 9.0)))
      .toDF("event_id", "event_type", "value")
    val got = Anomaly
      .robustScore(rows, Seq("event_type"), "value")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Any]("robust_z")), Option(r.getAs[Any]("is_anomaly"))))
      .toMap
    val mad = 2.0
    // BOTH outliers flag (a classical z-score lets 200 inflate the std
    // enough to shade 100; the 50% breakdown point does not)
    assert(got(7L)._1.get.asInstanceOf[Double] === 95.0 / (1.4826 * mad))
    assert(got(8L)._1.get.asInstanceOf[Double] === 195.0 / (1.4826 * mad))
    assert(got(7L)._2.get.asInstanceOf[Boolean] && got(8L)._2.get.asInstanceOf[Boolean])
    // the bulk of the group stays unflagged
    assert((0L to 6L).forall(i => !got(i)._2.get.asInstanceOf[Boolean]))
    // constant group: MAD = 0, scale undefined -> null score and flag
    assert((100L to 102L).forall(i => got(i)._1.isEmpty && got(i)._2.isEmpty))
  }

  test("robustScore exact=false: sketched medians track exact within tolerance on a skewed corpus") {
    // skewed, high-distinct-count group — the shape that blows the exact
    // percentile's per-group buffer at scale and motivates the knob: a
    // log-ish long tail (i*i spreads distinct values) plus a hot spike
    val rows = ((1 to 2000).map(i => (i.toLong, "tail", (i.toDouble * i) / 1000.0)) ++
      (1 to 50).map(i => (10000L + i, "tail", 4000.0 + i)))
      .toDF("event_id", "event_type", "value")
    val exact = Anomaly
      .robustScore(rows, Seq("event_type"), "value")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("robust_z")).toMap
    val approx = Anomaly
      .robustScore(rows, Seq("event_type"), "value", exact = false, accuracy = 10000)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("robust_z")).toMap
    assert(approx.size === exact.size)
    // GK at accuracy 10000 bounds rank error to ~n/10000 ranks here, so
    // the median/MAD (and every score derived from them) stay within a
    // tight relative band of the exact run
    exact.foreach { case (id, z) =>
      val za = approx(id)
      assert(math.abs(za - z) <= math.max(0.05, 0.05 * math.abs(z)),
        s"event $id: exact z=$z vs approx z=$za")
    }
    // and the flag set is identical on a clearly-separated corpus: the
    // 50 spike rows flag, the tail does not flip under sketch error
    val flagsE = Anomaly.robustScore(rows, Seq("event_type"), "value")
      .filter($"is_anomaly").select("event_id").as[Long].collect().toSet
    val flagsA = Anomaly.robustScore(rows, Seq("event_type"), "value", exact = false)
      .filter($"is_anomaly").select("event_id").as[Long].collect().toSet
    assert(flagsA === flagsE)
  }
}
