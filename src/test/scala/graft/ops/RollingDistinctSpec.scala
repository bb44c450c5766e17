package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class RollingDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rollingActiveUsers: exact trailing-window distinct counts, capped at the last day") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")), // same (user, day): dedup'd
      (2L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-04 10:00:00"))
    ).toDF("user_id", "ts")
    val r = Analytics.rollingActiveUsers(e, "user_id", "ts", windowDays = 3)
      .orderBy("day").collect().map(x => (x.getString(0), x.getLong(1)))
    // windows (trailing 3d): 01: {1}; 02: {1,2}; 03: {1,2}; 04: {1,2}
    // (u2 on 02 covers 02-04; u1 on 01 covers 01-03, and again on 04)
    assert(r.toSeq === Seq(
      ("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 2L), ("2024-01-04", 2L)
    ))
    // no window-end days past the data's max day
    assert(r.forall(_._1 <= "2024-01-04"))
  }

  test("approx (per-day HLL sketches) tracks exact within small relative error") {
    // 400 users across 10 days with churn
    val rows = for {
      d <- 1 to 10
      u <- 1 to 400
      if (u + d) % 3 != 0
    } yield (u.toLong, ts(f"2024-01-$d%02d 08:00:00"))
    val e = rows.toDF("user_id", "ts")
    val exact = Analytics.rollingActiveUsers(e, "user_id", "ts", 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Analytics.rollingActiveUsersApprox(e, "user_id", "ts", 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((day, est) <- approx) {
      val ex = exact(day).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"$day: est=$est exact=$ex")
    }
  }

  test("mergeable at-rest path: persisted daily sketches reproduce the inline approx exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("dailysk").toString
    val rows = for (d <- 1 to 6; u <- 1 to 50) yield (u.toLong + d, ts(f"2024-01-$d%02d 09:00:00"))
    val e = rows.toDF("user_id", "ts")
    val daily = e
      .select(col("user_id").as("_u"), to_date(col("ts")).as("_d"))
      .groupBy("_d")
      .agg(hll_sketch_agg(col("_u").cast("string"), lit(12)).as("_sk"))
    daily.write.parquet(s"$tmp/daily")
    val fromAtRest = Analytics
      .rollingFromDailySketches(spark.read.parquet(s"$tmp/daily"), 7)
      .orderBy("day").collect().toSeq
    val inline = Analytics.rollingActiveUsersApprox(e, "user_id", "ts", 7)
      .orderBy("day").collect().toSeq
    assert(fromAtRest === inline)
  }
}
