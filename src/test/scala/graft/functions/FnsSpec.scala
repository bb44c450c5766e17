package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Unit coverage of the scalar surface (SURVEY.md §2.8 F1-F13). */
class FnsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).as[String].head()

  test("F1 sanitizeName: alnum runs kept, rest collapsed to _, edges stripped") {
    assert(one(Fns.sanitizeName(lit("Balance Sheet (TTM)!"))) === "Balance_Sheet_TTM")
    assert(one(Fns.sanitizeName(lit("  _x_  "))) === "x")
  }

  test("F2 metricSafeName: reference replace chain") {
    assert(one(Fns.metricSafeName(lit("Cash & Equivalents"))) === "Cash_and_Equivalents")
    assert(one(Fns.metricSafeName(lit("Debt/Equity %"))) === "Debt_Equity_pct")
    assert(one(Fns.metricSafeName(lit("EBIT (Margin)"))) === "EBIT_Margin")
  }

  test("F4 contentId: name + md5 prefix") {
    val got = one(Fns.contentId(lit("report.csv"), lit("payload")))
    assert(got.startsWith("report.csv_") && got.length === "report.csv_".length + 8)
  }

  test("F5 companyIdFromFilename") {
    assert(one(Fns.companyIdFromFilename(lit("aep-financials.xlsx"))) === "AEP")
    assert(one(Fns.companyIdFromFilename(lit("duk-q1-2024.csv"))) === "DUK")
  }

  test("F6 statement/frequency from sheet name") {
    assert(one(Fns.statementOf(lit("Balance-Sheet-TTM"))) === "Balance")
    assert(one(Fns.frequencyOf(lit("Balance-Sheet-TTM"))) === "TTM")
  }

  test("F7 numeric coercion: invalid -> null (pandas errors='coerce' parity)") {
    val got = Seq("12.5", "n/a", "").toDF("v").select(Fns.toNumeric($"v")).as[Option[Double]].collect()
    assert(got.toSeq === Seq(Some(12.5), None, None))
  }

  test("F8 NaN -> null, scalar and map") {
    val got = Seq(Double.NaN, 1.0).toDF("v").select(Fns.nanToNull($"v")).as[Option[Double]].collect()
    assert(got.toSeq === Seq(None, Some(1.0)))
    val m = Seq(Map("a" -> "NaN", "b" -> "2")).toDF("m")
      .select(Fns.mapNanToNull($"m")).as[Map[String, String]].head()
    assert(m === Map("a" -> null, "b" -> "2"))
  }

  test("tokens: lowercase, punctuation-split, no empties") {
    val got = Seq("Hello,  World! a-b").toDF("t").select(Fns.tokens($"t")).as[Seq[String]].head()
    assert(got === Seq("hello", "world", "a", "b"))
  }

  test("shingles: n-grams with spaces, short inputs empty") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("a", "b")).toDF("toks")
    val got = df.select(Fns.shingles($"toks", 3)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("hashFamily: deterministic, distinct per index") {
    val h = (0 to 2).map(i => one(Fns.hashFamily(lit("x"), i)))
    assert(h.distinct.length === 3)
    assert(h === (0 to 2).map(i => one(Fns.hashFamily(lit("x"), i)))) // stable
  }

  test("l2normalize: unit norm") {
    val got = Seq(Seq(3.0, 4.0)).toDF("v").select(Fns.l2normalize($"v")).as[Seq[Double]].head()
    assert(math.abs(got(0) - 0.6) < 1e-12 && math.abs(got(1) - 0.8) < 1e-12)
  }
}
