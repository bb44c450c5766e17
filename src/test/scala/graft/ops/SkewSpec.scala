package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.sources.SnapshotSource

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private lazy val skewed =
    ((1 to 1000).map(i => ("hot", i.toDouble)) ++ (1 to 10).map(i => ("cold", i.toDouble)))
      .toDF("k", "v")

  test("salted count equals plain count") {
    val plain = skewed.groupBy("k").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, Seq("k")).as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted sum equals plain sum") {
    val plain = skewed.groupBy("k").agg(sum("v")).as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v").as[(String, Double)].collect().toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }

  test("combined salted count+sum equals plain aggregate in one pass") {
    val ints = skewed.withColumn("v", col("v").cast("long"))
    val plain = ints.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedCountSum(ints, Seq("k"), "v")
      .as[(String, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("cold", "C"), ("unused", "U")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("label").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(skewed, dim, "k").groupBy("label").count()
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("hot-key event corpus: AQE splits the skewed join partition (skew=true)") {
    // one user_id owns 50% of the events (the CDC-path skew case: a
    // runaway producer). The enrichment join (events x per-key state)
    // must complete with AQE's skew-split engaged rather than one
    // straggler task carrying half the corpus.
    val nUsers = 500
    // incompressible payload (hashes) so the hot shuffle partition's
    // on-the-wire size actually crosses the test's skew threshold
    val events = spark.range(40000).select(
      when($"id" % 2 === 0, lit("hot")).otherwise(concat(lit("u"), $"id" % nUsers)).as("user_id"),
      $"id".as("event_seq"),
      concat(sha2(concat(lit("a"), $"id"), 256), sha2(concat(lit("b"), $"id"), 256),
        sha2(concat(lit("c"), $"id"), 256)).as("payload")
    )
    val state = spark.range(nUsers).select(concat(lit("u"), $"id").as("user_id"), ($"id" * 10).as("score"))
      .unionByName(Seq(("hot", 999L)).toDF("user_id", "score"))

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffled join
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

      val joined = events.join(state, Seq("user_id"))
      // execute THIS dataset (not a derived one) so its own AQE plan finalizes
      val rows = joined.collect()
      assert(rows.length === 40000) // every event matched its state row
      val gotScore = rows.map(_.getAs[Long]("score")).sum
      val hotScoreSum = 20000L * 999L
      val coldScoreSum = (0 until nUsers).map { u => // events for u{id%500} on odd ids
        val n = (1 until 40000 by 2).count(_ % nUsers == u)
        n.toLong * u * 10
      }.sum
      assert(gotScore === hotScoreSum + coldScoreSum)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew-split did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("operational projection picks id/code/key/date columns + company lit") {
    val df = Seq(("2024", "c1", "v", "k9")).toDF("Date", "CompanyCode", "Value", "RecordKey")
    val got = SnapshotSource.operationalProjection(df, "ACME")
    assert(got.columns.toSeq === Seq("Date", "CompanyCode", "RecordKey", "company_id"))
    assert(got.select("company_id").as[String].head() === "ACME")
    // fallback: no name matches -> first 3 columns
    val none = Seq((1, 2, 3, 4)).toDF("a", "b", "c", "d")
    assert(SnapshotSource.operationalProjection(none, "X").columns.toSeq === Seq("a", "b", "c", "company_id"))
  }

  test("date column inference") {
    assert(SnapshotSource.inferDateColumn(Seq("Company", "Date", "x")) === Some("Date"))
    assert(SnapshotSource.inferDateColumn(Seq("a", "b")) === None)
  }
}
