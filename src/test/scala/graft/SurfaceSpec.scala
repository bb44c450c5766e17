package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.CosineSimilarity
import graft.sinks.Sinks
import graft.sources.{Converters, SnapshotStore}

class SurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("snapshot store: versioning, latest/previous, time travel, max version") {
    val root = Files.createTempDirectory("store").toString + "/snaps"
    assert(SnapshotStore.maxVersion(root) === -1L)
    val v0 = Seq(("k1", "a")).toDF("k", "v")
    val v1 = Seq(("k1", "b")).toDF("k", "v")
    assert(SnapshotStore.write(v0, root) === 0L)
    assert(SnapshotStore.write(v1, root) === 1L)
    assert(SnapshotStore.maxVersion(root) === 1L)
    assert(SnapshotStore.readLatest(spark, root).get.select("v").as[String].head() === "b")
    assert(SnapshotStore.readPrevious(spark, root).get.select("v").as[String].head() === "a")
    assert(SnapshotStore.readVersion(spark, root, 0).select("v").as[String].head() === "a")
    // a crashed writer's staging dir is invisible to readers and does
    // not block the next writer from claiming the same version number
    Files.createDirectories(java.nio.file.Paths.get(s"$root/_tmp_v=2"))
    assert(SnapshotStore.maxVersion(root) === 1L)
    val v2 = Seq(("k1", "c")).toDF("k", "v")
    assert(SnapshotStore.write(v2, root) === 2L)
    assert(SnapshotStore.readLatest(spark, root).get.select("v").as[String].head() === "c")
    // retention drops all but the newest `keep`, never the latest
    assert(SnapshotStore.vacuum(root, keep = 2) === Seq(0L))
    assert(SnapshotStore.maxVersion(root) === 2L)
    assert(SnapshotStore.readPrevious(spark, root).get.select("v").as[String].head() === "b")
    assert(SnapshotStore.vacuum(root, keep = 0) === Seq(1L)) // floor at 1
    assert(SnapshotStore.readLatest(spark, root).get.select("v").as[String].head() === "c")
  }

  test("event-log sink: partitioned append + pruned readback") {
    val path = Files.createTempDirectory("evlog").toString + "/events"
    val events = Seq(
      ("e1", "c1", "t1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("e2", "c2", "t1", java.sql.Timestamp.valueOf("2024-01-02 10:00:00"))
    ).toDF("event_id", "company_id", "table_name", "ts")
    Sinks.appendEventLog(events, path)
    Sinks.appendEventLog(events.filter($"event_id" === "e1"), path) // append again
    val all = Sinks.readEventLog(spark, path)
    assert(all.count() === 3)
    val c1 = Sinks.readEventLog(spark, path, companyId = Some("c1"))
    assert(c1.count() === 2)
    // partition pruning visible in the plan
    val plan = c1.queryExecution.executedPlan.toString
    assert(plan.contains("company_id") )
  }

  test("compactEventLog collapses per-batch small files, preserving data") {
    val path = Files.createTempDirectory("compact").toString + "/events"
    val mk = (ids: Seq[Int]) =>
      ids.map(i => (s"e$i", "c1", "t1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
        .toDF("event_id", "company_id", "table_name", "ts")
    // 5 appends -> at least 5 files in the single partition
    (1 to 5).foreach(b => Sinks.appendEventLog(mk(Seq(b)), path))
    import scala.jdk.CollectionConverters._
    def parquetCount = Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    val before = parquetCount
    assert(before >= 5)
    val want = Sinks.readEventLog(spark, path).select("event_id").as[String].collect().sorted.toSeq
    Sinks.compactEventLog(spark, path)
    assert(parquetCount < before)
    val got = Sinks.readEventLog(spark, path).select("event_id").as[String].collect().sorted.toSeq
    assert(got === want)
  }

  test("bucketed tables: equi-join and agg on the bucket key run shuffle-free") {
    val orders = (1 to 1000).map(i => ((i - 1).toLong % 100 + 1, i.toLong)).toDF("custkey", "okey")
    val cust = (1 to 100).map(i => (i.toLong, s"c$i")).toDF("custkey", "name")
    Sinks.writeBucketed(orders, "b_orders", Seq("custkey"), numBuckets = 8)
    Sinks.writeBucketed(cust, "b_cust", Seq("custkey"), numBuckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so only bucket co-location can avoid the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_cust"), "custkey")
      assert(joined.count() === 1000)
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"), s"bucketed join shuffled:\n$joinPlan")
      val agg = spark.table("b_orders").groupBy("custkey").count()
      assert(agg.count() === 100)
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed agg shuffled:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("zip fan-in: extracts csvs (skipping __MACOSX), unions by name") {
    val dir = Files.createTempDirectory("zip")
    val zipPath = dir.resolve("bundle.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipPath))
    def add(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes); zos.closeEntry()
    }
    add("a.csv", "Company,Date,2024\nacme,Cash,1")
    add("sub/b.csv", "Company,Date,2023\nduk,Debt,2")
    add("__MACOSX/junk.csv", "x,y\n1,2")
    add("readme.txt", "not a csv")
    zos.close()
    val got = Converters.zipCsvFanIn(spark, zipPath.toString, dir.resolve("work")).get
    assert(got.count() === 2)
    assert(got.columns.toSet === Set("Company", "Date", "2024", "2023"))
  }

  test("chatbot intent routing: all three routes run real queries") {
    assert(Chatbot.classify("how many changes last week") === Chatbot.Historical)
    assert(Chatbot.classify("any anomalies today?") === Chatbot.AnomalyIntent)
    assert(Chatbot.classify("predict next quarter") === Chatbot.Prediction)

    // a 40-day log: constant 2 error events/day, one 12-event spike day,
    // plus a linearly growing insert stream for the forecast to fit
    val rows = (0 until 40).flatMap { d =>
      val ts = java.sql.Timestamp.valueOf(s"2024-0${1 + d / 28}-${f"${1 + d % 28}%02d"} 10:00:00")
      val errs = if (d == 30) 12 else 2
      (0 until errs).map(i => (s"err$d-$i", "error", ts)) ++
        (0 until (d + 1)).map(i => (s"ins$d-$i", "insert", ts))
    }
    val log = rows.toDF("event_id", "event_type", "ts")

    // anomaly route: the spike day surfaces, top-k shape. The log's
    // date arithmetic leaves Jan 29-31 event-free, and the calendar
    // gap-fill (correctly) scores those 2-errors/day -> 0 drops as
    // anomalies too — against a zero-variance baseline they ride the
    // 1e-3 std floor above the spike's ~10σ, so the spike is IN the
    // result, not necessarily at its head
    val anom = Chatbot.route(spark, log, "any unusual activity?")
    val got = anom.collect()
    assert(got.nonEmpty, "spike day not detected")
    assert(got.exists(_.getAs[Double]("value") === 12.0), "spike day must be flagged")
    assert(got.exists(_.getAs[Double]("value") === 0.0),
      "errors stopping cold is an anomaly as well (the gap-filled days)")
    assert(anom.columns.toSeq === Seq("date", "value", "expected_value", "score"))

    // prediction route: positive slope on the growing stream, horizon
    // extrapolation strictly above the fitted intercept end
    val fc = Chatbot.route(spark, log, "forecast next month").collect().head
    assert(fc.getAs[Double]("slope") > 0.0, "growing stream must fit a positive slope")
    assert(fc.getAs[Int]("horizon_days") === 30)
    assert(fc.getAs[Double]("predicted_daily_value") > fc.getAs[Double]("intercept"))

    // historical route still the A1 histogram shape (rollup total rides)
    val hist = Chatbot.historicalAsOf(log, days = 365)
    assert(hist.columns.contains("event_type"))
    assert(hist.count() > 0)
  }

  test("chatbot anomaly route gap-fills the log calendar: sparse-error logs still detect spikes") {
    // errors on only 4 of 40 days (one a 12-event spike) while other
    // event types run daily. Without the calendar gap-fill, dailyCounts
    // yields 4 rows — under Anomaly.score's minPoints (12) — and the
    // route answers "no anomalies" unconditionally, the reference's
    // canned behavior this route exists to replace; the rolling window
    // would also span the last N days WITH errors, not N calendar days
    val rows = (0 until 40).flatMap { d =>
      val ts = java.sql.Timestamp.valueOf(s"2024-0${1 + d / 28}-${f"${1 + d % 28}%02d"} 10:00:00")
      val errs = if (d == 30) 12 else if (d % 10 == 3) 1 else 0
      (0 until errs).map(i => (s"err$d-$i", "error", ts)) ++
        Seq((s"ins$d", "insert", ts))
    }
    val log = rows.toDF("event_id", "event_type", "ts")
    val got = Chatbot.anomalies(log).collect()
    assert(got.nonEmpty, "sparse-error spike must be detected, not swallowed by minPoints")
    assert(got.head.getAs[Double]("value") === 12.0)
    // zero-error days enter the series as 0s: the spike's expected value
    // is a near-zero baseline, so the score clears the threshold widely
    assert(got.head.getAs[Double]("expected_value") < 1.0)
  }

  test("native cosine expression is bit-identical to the fold-based column") {
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(200)
    val pairs = emb.select($"vec_id".as("i"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("j"), $"embedding".as("b")).limit(50))
    // fold-based reference formulation, built inline (Fns.cosine now
    // delegates to the native expression)
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val fold = dot($"a", $"b") / (sqrt(dot($"a", $"a")) * sqrt(dot($"b", $"b")))
    val diff = pairs
      .select(fold.as("builtin"), CosineSimilarity.cosineSim($"a", $"b").as("native"))
      .filter(not($"builtin" <=> $"native"))
    assert(diff.count() === 0)
  }

  test("native cosine: null in, null out; length mismatch raises") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f)))
    ).toDF("a", "b")
    val got = df.select(CosineSimilarity.cosineSim($"a", $"b").as("c")).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(got(1).isNullAt(0))
  }
}
