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
