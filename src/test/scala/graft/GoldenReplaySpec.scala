package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotSource

/** Golden replay over the reference's OWN wide financial CSVs
  * (SURVEY.md §5: the in-tree data is the de-facto golden set). Guarded
  * with `assume` so the suite stays standalone when the reference corpus
  * is absent.
  */
class GoldenReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val refCsv = "/root/reference/data/Balance-Sheet-TTM.csv"

  test("reference wide CSV: shape, key promotion, self-diff is empty") {
    assume(Files.exists(Paths.get(refCsv)), "reference corpus not present; skipping")
    val snap = SnapshotSource.read(spark, refCsv)
    assert(snap.keyColumn === "Company")
    assert(snap.df.columns.length > 100) // ~121 wide quarter columns
    val n = snap.df.count()
    assert(n >= 100 && n <= 200) // 165 rows in the shipped file
    // diff(x, x) over the real 121-column snapshot = no events
    assert(ops.SnapshotDiff.diff(snap.df, Some(snap.df), snap.keyColumn).count() === 0)
  }

  test("reference upload replay: edit one cell -> exactly the expected update event") {
    assume(Files.exists(Paths.get(refCsv)), "reference corpus not present; skipping")
    val v0 = SnapshotSource.read(spark, refCsv)
    // v1 = v0 with one company's one metric cell changed; key collapses
    // last-row-wins to 5 companies (reference logs: "Sent 5 events")
    val dateCol = v0.df.columns(2)
    val v1df = v0.df.withColumn(
      dateCol,
      when(col("Company") === "aep-financials" && col("Date") === "Cash & Equivalents", lit("999999.0"))
        .otherwise(col(dateCol))
    )
    val events = ops.SnapshotDiff.diff(v1df, Some(v0.df), "Company", orderCol = None)
    val got = events.select("event_type", "key_value").as[(String, String)].collect()
    // last-row-wins: the edited row is only visible if it is the LAST row
    // for its company — mirroring the reference's dict-comprehension
    // collapse (app/app.py:206-207). Either zero or one update, never
    // inserts/deletes.
    assert(got.forall(_._1 === "update"))
    assert(got.length <= 1)
  }

  test("reference unpivot export parity: one series per metric row, numeric-coerced") {
    assume(Files.exists(Paths.get(refCsv)), "reference corpus not present; skipping")
    val snap = SnapshotSource.read(spark, refCsv)
    val long = Pipeline.unpivotExport(snap, "Date")
    val metricCount = snap.df.select("Date").distinct().count()
    assert(long.select("metric").distinct().count() === metricCount)
    // numeric coercion: values parse to double or null, never throw (F7)
    val parsed = long.agg(
      count(lit(1)).as("n"),
      count(col("value")).as("n_parsed")
    ).head()
    assert(parsed.getLong(0) > 10000) // 165 rows x ~119 date cols
    assert(parsed.getLong(1) > 0)
  }

  test("R3 flatten round-trips a REAL reference output event file value-exact") {
    // the reference's own produced artifact: a flattened update event
    // with old_/new_ prefixed columns (SURVEY.md §2.10 R3, schema read
    // from data/parquet/...). Reconstruct the map-form event from it,
    // run OUR flatten, and compare every payload cell against the file.
    val refOut =
      "/root/reference/data/parquet/Balance-Sheet-TTM/temp_Balance-Sheet-TTM_b24993c4"
    assume(Files.exists(Paths.get(refOut)), "reference corpus not present; skipping")
    val golden = spark.read
      .parquet(refOut + "/update_20250309023936_aep-financials.parquet")
    val payloadCols = golden.columns.filter(_.startsWith("old_")).map(_.stripPrefix("old_")).toSeq
    assert(payloadCols.nonEmpty && golden.columns.count(_.startsWith("new_")) === payloadCols.size)
    val metaCols = golden.columns.filterNot(c => c.startsWith("old_") || c.startsWith("new_")).toSeq
    // file row -> map-form CdcEvent (our internal payload shape)
    def mapOf(prefix: String) =
      map(payloadCols.flatMap(c => Seq(lit(c), golden(prefix + c).cast("string"))): _*)
    val mapForm = golden.select(
      metaCols.map(golden(_)) ++ Seq(mapOf("old_").as("old_values"), mapOf("new_").as("new_values")): _*
    )
    // OUR R2/R3 flatten back out, with the reference's column order
    val ours = ops.Reshape.flattenMap(
      ops.Reshape.flattenMap(mapForm, "old_values", Some(payloadCols), prefix = "old_"),
      "new_values", Some(payloadCols), prefix = "new_"
    )
    assert(ours.columns.sorted.toSeq === golden.columns.sorted.toSeq)
    // value-exact per payload cell (string-compared, null-safe)
    val g = golden.head()
    val o = ours.head()
    val diffs = golden.columns.filter { c =>
      val gv = Option(g.get(g.fieldIndex(c))).map(_.toString)
      val ov = Option(o.get(o.fieldIndex(c))).map(_.toString)
      gv != ov
    }
    assert(diffs.isEmpty, s"cells diverge: ${diffs.take(5).mkString(", ")}")
  }

  test("scd2 end-state after replaying a 3-upload sequence matches the last snapshot") {
    assume(Files.exists(Paths.get(refCsv)), "reference corpus not present; skipping")
    val v0 = SnapshotSource.read(spark, refCsv)
    // build a deterministic 3-version history from the real file: v1
    // drops a company (deletes), v2 restores it (inserts)
    val someCompany = v0.df.select("Company").orderBy("Company").limit(1).as[String].head()
    val v1 = v0.df.filter(col("Company") =!= someCompany)
    val v2 = v0.df
    def ev(n: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame, ts: String) =
      ops.SnapshotDiff.diff(n, Some(p), "Company")
        .withColumn("ts", lit(java.sql.Timestamp.valueOf(ts)))
        .withColumn("event_id", expr("uuid()"))
    val log = ev(v1, v0.df, "2024-01-02 00:00:00")
      .unionByName(ev(v2, v1, "2024-01-03 00:00:00"))
    val scd = ops.Scd2.apply(log, Seq("key_value"))
    val current = ops.Scd2.currentState(scd)
    // the only touched key is someCompany; its current version must be the restore
    assert(current.select("key_value").as[String].collect().toSet === Set(someCompany))
    assert(current.select("event_type").as[String].head() === "insert")
  }
}
