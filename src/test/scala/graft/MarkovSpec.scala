package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Markov

class MarkovSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def countsDf(rows: Seq[(String, String, Long)]) = {
    val schema = StructType(
      Seq(
        StructField("from_type", StringType),
        StructField("to_type", StringType),
        StructField("n", LongType)
      )
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 1),
      schema
    )
  }

  test("two-state swap chain converges to uniform") {
    val st = Markov
      .stationary(spark, countsDf(Seq(("a", "b", 7L), ("b", "a", 3L))), Seq("a", "b"), iters = 50)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(math.abs(st("a") - 0.5) < 1e-12)
    assert(math.abs(st("b") - 0.5) < 1e-12)
  }

  test("absorbing state takes all mass; zero-outgoing state self-loops") {
    // a -> b always; b -> b always (absorbing); c has NO outgoing rows
    // so it self-loops and keeps exactly its initial 1/3
    val st = Markov
      .stationary(
        spark,
        countsDf(Seq(("a", "b", 5L), ("b", "b", 2L))),
        Seq("a", "b", "c"),
        iters = 60
      )
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(st("a") < 1e-15)
    assert(math.abs(st("b") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(st("c") - 1.0 / 3.0) < 1e-12)
  }

  test("probability mass is conserved on the real events table") {
    val events = sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val counts = Markov.transitionCounts(events, "user_id", "ts", "event_id", "event_type")
    val st = Markov.stationary(
      spark,
      counts,
      Seq("click", "error", "purchase", "signup", "view"),
      iters = 12
    )
    val rows = st.collect()
    assert(rows.length == 5)
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass not conserved: $total")
    assert(rows.forall(_.getDouble(1) >= 0.0))
    // every event type transitions somewhere in this data
    assert(rows.forall(_.getLong(2) > 0L))
  }

  test("states outside the declared list are excluded by contract") {
    val st = Markov
      .stationary(
        spark,
        countsDf(Seq(("a", "b", 1L), ("b", "a", 1L), ("zz", "a", 100L), ("a", "zz", 100L))),
        Seq("a", "b"),
        iters = 40
      )
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(math.abs(st("a") - 0.5) < 1e-12)
    assert(math.abs(st("b") - 0.5) < 1e-12)
  }
}
