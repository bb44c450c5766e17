package graft.sinks

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Round-trips a CDC event batch through a real JDBC database (embedded
  * Derby, shipped with Spark) with the reference's ON CONFLICT DO
  * NOTHING semantics: duplicate event_ids — both inside one batch and
  * across replayed batches — are dropped, everything else lands.
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def freshDb(): String = {
    val dir = Files.createTempDirectory("derby").toString
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("event batch round-trips through JDBC; duplicate event_ids dropped") {
    val url = freshDb()
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE cdc_events (
        |  event_id VARCHAR(64) PRIMARY KEY,
        |  event_type VARCHAR(16),
        |  company_id VARCHAR(64),
        |  key_value VARCHAR(64),
        |  ts TIMESTAMP,
        |  new_values VARCHAR(4096))""".stripMargin)
    conn.close()

    val batch = Seq(
      ("e1", "insert", "c1", "k1", ts("2024-01-01 00:00:00"), Map("v" -> "1")),
      ("e2", "update", "c1", "k1", ts("2024-01-02 00:00:00"), Map("v" -> "2")),
      ("e2", "update", "c1", "k1", ts("2024-01-02 00:00:00"), Map("v" -> "2")), // in-batch dup
      ("e3", "delete", "c1", "k2", ts("2024-01-03 00:00:00"), Map.empty[String, String])
    ).toDF("event_id", "event_type", "company_id", "key_value", "ts", "new_values")
      .withColumn("new_values", to_json($"new_values")) // maps -> JSONB-style text

    JdbcSink.appendDedup(batch, url, "cdc_events")
    // replayed micro-batch: at-least-once delivery -> effectively-once rows
    JdbcSink.appendDedup(batch, url, "cdc_events")

    val raw = JdbcSink.read(spark, url, "cdc_events")
    val back = raw.toDF(raw.columns.map(_.toLowerCase).toIndexedSeq: _*) // Derby uppercases identifiers
    assert(back.count() === 3)
    assert(back.select("event_id").as[String].collect().sorted.toSeq === Seq("e1", "e2", "e3"))
    // values survive the trip intact
    val e2 = back.filter($"event_id" === "e2").head()
    assert(e2.getAs[String]("event_type") === "update")
    assert(e2.getAs[Timestamp]("ts") === ts("2024-01-02 00:00:00"))
    assert(e2.getAs[String]("new_values") === """{"v":"2"}""")
  }

  test("chatbot A1 histogram over the JDBC read-back == the parquet path (r13 verdict gap)") {
    // the reference's chatbot runs its event-type histogram against
    // Postgres (chatbot.py:150-163); the engine had the idempotent sink
    // and the A1 shape over parquet (q05), but never the jdbc-source
    // round-trip of the SAME query. Write a slice of the real event
    // log through the sink, read it back via the jdbc source, and the
    // histogram must match the parquet-path result row for row.
    val url = freshDb()
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE cdc_events (
        |  event_id VARCHAR(64) PRIMARY KEY,
        |  event_type VARCHAR(32),
        |  user_id VARCHAR(64),
        |  ts TIMESTAMP)""".stripMargin)
    conn.close()

    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(
        $"event_id".cast("string").as("event_id"),
        $"event_type",
        $"user_id".cast("string").as("user_id"),
        $"ts"
      )
    JdbcSink.appendDedup(events, url, "cdc_events")
    // replay the whole upload: at-least-once -> histogram unchanged
    JdbcSink.appendDedup(events, url, "cdc_events")

    val raw = JdbcSink.read(spark, url, "cdc_events")
    val back = raw.toDF(raw.columns.map(_.toLowerCase).toIndexedSeq: _*)
    val viaJdbc = graft.ops.Analytics.eventHistogram(back)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val viaParquet = graft.ops.Analytics.eventHistogram(events)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(viaJdbc === viaParquet)
    assert(viaJdbc.nonEmpty && viaJdbc.exists(_._1 == "TOTAL"))
  }

  test("composite columns are rejected with a serialize-first message") {
    val url = freshDb()
    val df = Seq(("e1", Map("a" -> "b"))).toDF("event_id", "payload")
    val err = intercept[IllegalArgumentException] {
      JdbcSink.appendDedup(df, url, "whatever")
    }
    assert(err.getMessage.contains("to_json"))
  }

  test("clean batches take the fast batched path (no dups, two partitions)") {
    val url = freshDb()
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE metrics (id BIGINT PRIMARY KEY, value DOUBLE, label VARCHAR(32))")
    conn.close()
    val df = spark.range(200).select(
      $"id", ($"id" * 1.5).as("value"), concat(lit("m"), $"id").as("label")
    ).repartition(2)
    JdbcSink.appendDedup(df, url, "metrics", batchSize = 50)
    val back = JdbcSink.read(spark, url, "metrics")
    assert(back.count() === 200)
    assert(back.agg(sum($"value")).as[Double].head() === (0 until 200).map(_ * 1.5).sum)
  }
}
