package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.ops.{Analytics, Anomaly}

class ZScoreAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("typed aggregator agrees with the window implementation on a real series") {
    // q08's series: daily error counts at sf0.001, gap-filled
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val daily = Analytics.dailyCounts(events, filterExpr = col("event_type") === "error")
    val series = Analytics
      .gapFill(daily, "2023-12-28", "2024-02-03")
      .select(date_format(col("date"), "yyyy-MM-dd").as("date"), col("value"))

    val fromWindow = Anomaly
      .score(series, Seq.empty, lookback = 7, threshold = 2.0)
      .select("date", "value", "expected_value", "score", "is_anomaly")
      .as[(String, Double, Double, Double, Boolean)]
      .collect()
      .map(t => t._1 -> t)
      .toMap

    val agg = new ZScoreAggregator(lookback = 7, threshold = 2.0)
    val fromAggregator = series
      .as[(String, Double)]
      .groupByKey(_ => 0)
      .agg(agg.toColumn)
      .collect()
      .head._2

    assert(fromAggregator.length === fromWindow.size)
    fromAggregator.foreach { p =>
      val (_, v, e, s, flag) = fromWindow(p.ts)
      assert(p.value === v, p.ts)
      assert(math.abs(p.expected_value - e) < 1e-9, s"expected@${p.ts}")
      assert(math.abs(p.score - s) < 1e-9, s"score@${p.ts}")
      assert(p.is_anomaly === flag, s"flag@${p.ts}")
    }
  }

  test("partial-buffer merge is order-insensitive") {
    val pts = (1 to 20).map(i => (f"2024-01-$i%02d", if (i == 15) 50.0 else 2.0))
    val agg = new ZScoreAggregator(lookback = 5, threshold = 2.0, minPoints = 10)
    val whole = agg.finish(pts)
    val (a, b) = pts.splitAt(7)
    val merged = agg.finish(agg.merge(b.toSeq, a.toSeq)) // reversed order
    assert(whole === merged)
    assert(whole.exists(p => p.ts == "2024-01-15" && p.is_anomaly))
  }
}
