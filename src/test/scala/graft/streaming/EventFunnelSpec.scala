package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.ops.Analytics
import EventFunnel.{FunnelAdvance, UserEvent}

class EventFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val steps = Seq("view", "click", "purchase")

  private val batch1 = Seq(
    UserEvent(1L, ts("2024-01-01 10:00:00"), "view"),
    UserEvent(1L, ts("2024-01-01 10:05:00"), "click"),
    UserEvent(2L, ts("2024-01-02 09:00:00"), "view"),
    UserEvent(2L, ts("2024-01-02 09:01:00"), "purchase"), // before click: ignored
    UserEvent(3L, ts("2024-01-03 12:00:00"), "click") // never viewed
  )
  private val batch2 = Seq(
    UserEvent(1L, ts("2024-01-01 10:10:00"), "purchase"), // completes across batches
    UserEvent(2L, ts("2024-01-02 09:02:00"), "click"),
    UserEvent(4L, ts("2024-01-04 08:00:00"), "view")
  )

  private def runStream(tmp: String, batches: Seq[Seq[UserEvent]]): Set[FunnelAdvance] = {
    val srcDir = s"$tmp/events"
    val name = "funnel_" + tmp.replaceAll("[^a-zA-Z0-9]", "")
    batches.head.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema("user_id long, ts timestamp, event_type string")
      .parquet(srcDir)
      .as[UserEvent]
    val q = EventFunnel
      .funnelStream(stream, steps)
      .writeStream
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append)
      .start()
    q.processAllAvailable()
    batches.tail.foreach { b =>
      b.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name).as[FunnelAdvance].collect().toSet
  }

  test("streamed advances across micro-batches == batch funnel counts") {
    val tmp = Files.createTempDirectory("funnelstream").toString
    val got = runStream(tmp, Seq(batch1, batch2))
    assert(got === Set(
      FunnelAdvance(1L, 1, "view", ts("2024-01-01 10:00:00")),
      FunnelAdvance(1L, 2, "click", ts("2024-01-01 10:05:00")),
      FunnelAdvance(1L, 3, "purchase", ts("2024-01-01 10:10:00")),
      FunnelAdvance(2L, 1, "view", ts("2024-01-02 09:00:00")),
      FunnelAdvance(2L, 2, "click", ts("2024-01-02 09:02:00")),
      FunnelAdvance(4L, 1, "view", ts("2024-01-04 08:00:00"))
    ))
    // per-step distinct-user counts match the batch operator on the union
    val all = (batch1 ++ batch2).toDF()
    val batchCounts = Analytics
      .funnel(all, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streamCounts = got.groupBy(_.step).view.mapValues(_.size.toLong).toMap
    assert(batchCounts === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    assert(streamCounts === Map(1 -> 3L, 2 -> 2L, 3 -> 1L).map { case (k, v) => (k.toLong, v) })
  }

  test("one micro-batch vs many: same advances (cross-boundary state carries t0/tLast)") {
    val t1 = Files.createTempDirectory("funnelone").toString
    val t2 = Files.createTempDirectory("funnelmany").toString
    val one = runStream(t1, Seq(batch1 ++ batch2))
    val many = runStream(t2, Seq(batch1, batch2))
    assert(one === many)
  }

  test("advance fold: strictly-after and within-window rules match the batch operator") {
    // same-ts click does not advance
    val (st, out) = EventFunnel.advance(
      1L, steps, None,
      Seq(
        UserEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        UserEvent(1L, ts("2024-01-01 10:00:00"), "click")
      ),
      EventFunnel.FunnelState(0, null, null)
    )
    assert(st.reached === 1 && out.map(_.step) === Seq(1))
    // within-window: late click rejected, funnel stays at step 1
    val (st2, _) = EventFunnel.advance(
      2L, steps, Some(3600L),
      Seq(
        UserEvent(2L, ts("2024-01-01 10:00:00"), "view"),
        UserEvent(2L, ts("2024-01-01 11:30:00"), "click")
      ),
      EventFunnel.FunnelState(0, null, null)
    )
    assert(st2.reached === 1)
  }
}
