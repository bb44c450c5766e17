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
