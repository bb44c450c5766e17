package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.ops.Analytics
import TransitionStream.{Transition, UserEvent}

class TransitionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // u1's (b,c) pair straddles the batch boundary; u2 appears only in
  // batch 2; u3 has one event total (no transitions ever)
  private val batch1 = Seq(
    UserEvent(1L, ts("2024-01-01 10:00:00"), 1L, "a"),
    UserEvent(1L, ts("2024-01-01 10:01:00"), 2L, "b"),
    UserEvent(3L, ts("2024-01-01 08:00:00"), 3L, "z")
  )
  private val batch2 = Seq(
    UserEvent(1L, ts("2024-01-01 10:02:00"), 4L, "c"),
    UserEvent(2L, ts("2024-01-01 09:00:00"), 5L, "a"),
    UserEvent(2L, ts("2024-01-01 09:00:00"), 6L, "b") // same ts: id order
  )

  private def runStream(tmp: String, batches: Seq[Seq[UserEvent]]): Seq[Transition] = {
    val srcDir = s"$tmp/events"
    val name = "trans_" + tmp.replaceAll("[^a-zA-Z0-9]", "")
    batches.head.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema("user_id long, ts timestamp, event_id long, event_type string")
      .parquet(srcDir)
      .as[UserEvent]
    val q = TransitionStream
      .transitionStream(stream)
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
    spark.table(name).as[Transition].collect().toSeq
  }

  test("streamed transitions across micro-batches == batch eventTransitions") {
    val tmp = Files.createTempDirectory("transstream").toString
    val got = runStream(tmp, Seq(batch1, batch2))
    assert(got.sortBy(t => (t.user_id, t.from_type, t.to_type)) === Seq(
      Transition(1L, "a", "b"),
      Transition(1L, "b", "c"), // the cross-batch pair
      Transition(2L, "a", "b")
    ))
    val batchCounts = Analytics
      .eventTransitions((batch1 ++ batch2).toDF(), "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val streamCounts =
      got.groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.size.toLong).toMap
    assert(streamCounts === batchCounts)
  }

  test("restart from checkpoint does not re-emit or drop cross-batch pairs") {
    val tmp = Files.createTempDirectory("transrestart").toString
    val srcDir = s"$tmp/events"
    val outDir = s"$tmp/out"
    def start() = {
      val stream = spark.readStream
        .schema("user_id long, ts timestamp, event_id long, event_type string")
        .parquet(srcDir)
        .as[UserEvent]
      TransitionStream
        .transitionStream(stream)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode(OutputMode.Append)
        .start()
    }
    batch1.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // "crash": the query goes away, checkpoint + state stay

    // new query instance resumes the per-user state from the checkpoint
    batch2.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // full output across the restart: u1's carried (b -> c) appears
    // exactly once, nothing is re-emitted
    val all = spark.read.parquet(outDir).as[Transition].collect().toSeq
    assert(all.sortBy(t => (t.user_id, t.from_type, t.to_type)) === Seq(
      Transition(1L, "a", "b"),
      Transition(1L, "b", "c"),
      Transition(2L, "a", "b")
    ))
  }
}
