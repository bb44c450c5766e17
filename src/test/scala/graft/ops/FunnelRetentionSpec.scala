package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class FunnelRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    // u1 completes the whole funnel, in order
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    // u2 views then clicks; purchase BEFORE the click doesn't count
    (2L, ts("2024-01-02 09:00:00"), "view"),
    (2L, ts("2024-01-02 09:01:00"), "purchase"),
    (2L, ts("2024-01-02 09:02:00"), "click"),
    // u3 clicks without ever viewing: no funnel entry
    (3L, ts("2024-01-03 12:00:00"), "click"),
    // u4 views only
    (4L, ts("2024-01-04 08:00:00"), "view")
  ).toDF("user_id", "ts", "event_type")

  test("funnel counts ordered completions only; out-of-order steps don't advance") {
    val f = Analytics
      .funnel(events, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy("step")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // view: u1,u2,u4; click after view: u1,u2; purchase after that click: u1
    assert(f.toSeq === Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel: same-timestamp events do not advance (strictly-after semantics)") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val f = Analytics.funnel(e, "user_id", "ts", "event_type", Seq("view", "click"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(f.toSeq === Seq(1L, 0L))
  }

  test("funnel withinSeconds: late completions fall out of the window") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:30:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val f = Analytics
      .funnel(e, "user_id", "ts", "event_type", Seq("view", "click"), withinSeconds = Some(3600L))
      .orderBy("step").collect().map(_.getLong(2))
    assert(f.toSeq === Seq(2L, 1L)) // u2's click at +90min is outside the hour
  }

  test("retentionCohorts: triangle counts distinct users per (cohort week, offset week)") {
    val e = Seq(
      // u1 first active week 0, returns week 1 (twice -> still 1 user)
      (1L, ts("2024-01-02 10:00:00"), "view"),
      (1L, ts("2024-01-09 10:00:00"), "view"),
      (1L, ts("2024-01-10 10:00:00"), "view"),
      // u2 same cohort week, never returns
      (2L, ts("2024-01-03 10:00:00"), "view"),
      // u3 cohort week 1
      (3L, ts("2024-01-08 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val r = Analytics.retentionCohorts(e, "user_id", "ts", "2024-01-01")
      .orderBy("cohort_week", "week_offset")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("funnel is partitioning-invariant (exact counts under any layout)") {
    val a = Analytics.funnel(events, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy("step").collect().toSeq
    val b = Analytics.funnel(events.repartition(13), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("step").collect().toSeq
    assert(a === b)
  }
}
