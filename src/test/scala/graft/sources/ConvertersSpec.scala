package graft.sources

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Builds real OOXML containers in-test (zip + XML) and round-trips them
  * through the converters — no binary fixtures, no external libs.
  */
class ConvertersSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def zipOf(dir: Path, name: String)(entries: (String, String)*): Path = {
    val p = dir.resolve(name)
    val zos = new ZipOutputStream(Files.newOutputStream(p))
    entries.foreach { case (n, content) =>
      zos.putNextEntry(new ZipEntry(n)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    p
  }

  private def mkXlsx(dir: Path, fileName: String, sheets: Seq[(String, Seq[Seq[String]])]): Path = {
    val sharedStrings = sheets.flatMap(_._2.flatten).distinct
    val sstIdx = sharedStrings.zipWithIndex.toMap
    def colRef(i: Int): String = { // 0 -> A, 1 -> B ...
      var n = i + 1; var s = ""
      while (n > 0) { val r = (n - 1) % 26; s = (('A' + r).toChar.toString) + s; n = (n - 1) / 26 }
      s
    }
    val sheetXmls = sheets.zipWithIndex.map { case ((_, rows), si) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        val cellsXml = cells.zipWithIndex.map { case (v, ci) =>
          if (v.forall(c => c.isDigit || c == '.') && v.nonEmpty)
            s"""<c r="${colRef(ci)}${ri + 1}"><v>$v</v></c>"""
          else s"""<c r="${colRef(ci)}${ri + 1}" t="s"><v>${sstIdx(v)}</v></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cellsXml</row>"""
      }.mkString
      s"xl/worksheets/sheet${si + 1}.xml" ->
        s"""<?xml version="1.0"?><worksheet><sheetData>$rowsXml</sheetData></worksheet>"""
    }
    val wbSheets = sheets.zipWithIndex
      .map { case ((name, _), i) => s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }
      .mkString
    val rels = sheets.indices
      .map(i => s"""<Relationship Id="rId${i + 1}" Type="t" Target="worksheets/sheet${i + 1}.xml"/>""")
      .mkString
    val sst = sharedStrings.map(s => s"<si><t>$s</t></si>").mkString
    zipOf(dir, fileName)(
      Seq(
        "xl/workbook.xml" ->
          s"""<?xml version="1.0"?><workbook xmlns:r="http://r"><sheets>$wbSheets</sheets></workbook>""",
        "xl/_rels/workbook.xml.rels" ->
          s"""<?xml version="1.0"?><Relationships>$rels</Relationships>""",
        "xl/sharedStrings.xml" -> s"""<?xml version="1.0"?><sst>$sst</sst>"""
      ) ++ sheetXmls: _*
    )
  }

  test("xlsx: shared strings, numbers, multiple sheets round-trip") {
    val dir = Files.createTempDirectory("xlsx")
    val wb = mkXlsx(
      dir,
      "aep-financials.xlsx",
      Seq(
        "Balance-Sheet-TTM" -> Seq(
          Seq("Company", "Date", "2024-12-31"),
          Seq("aep", "Cash", "100.5")
        ),
        "Income-Annual" -> Seq(
          Seq("Company", "Date", "2023-12-31"),
          Seq("aep", "Revenue", "7")
        )
      )
    )
    val sheets = Converters.xlsxToCsv(wb.toString, dir.resolve("out"))
    assert(sheets.map(_._1) === Seq("Balance-Sheet-TTM", "Income-Annual"))
    val bs = SnapshotSource.read(spark, sheets.head._2.toString)
    assert(bs.keyColumn === "Company")
    assert(bs.df.select("2024-12-31").as[String].head() === "100.5")
  }

  test("docx: first table extracted to csv") {
    val dir = Files.createTempDirectory("docx")
    val doc = zipOf(dir, "report.docx")(
      "word/document.xml" ->
        """<?xml version="1.0"?><w:document xmlns:w="http://w"><w:body>
          |<w:tbl>
          | <w:tr><w:tc><w:p><w:r><w:t>Company</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>Date</w:t></w:r></w:p></w:tc></w:tr>
          | <w:tr><w:tc><w:p><w:r><w:t>acme</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>Cash, net</w:t></w:r></w:p></w:tc></w:tr>
          |</w:tbl></w:body></w:document>""".stripMargin
    )
    val csv = Converters.docxToCsv(doc.toString, dir.resolve("out")).get
    val snap = SnapshotSource.read(spark, csv.toString)
    assert(snap.df.columns.toSeq === Seq("Company", "Date"))
    assert(snap.df.select("Date").as[String].head() === "Cash, net") // quoted comma survives
  }

  test("docx without a table falls back to tab-split paragraphs (reference app.py:318-321)") {
    val dir = Files.createTempDirectory("docxp")
    val doc = zipOf(dir, "memo.docx")(
      "word/document.xml" ->
        """<?xml version="1.0"?><w:document xmlns:w="http://w"><w:body>
          |<w:p><w:r><w:t>Company</w:t></w:r><w:r><w:t>&#9;Date</w:t></w:r></w:p>
          |<w:p><w:r><w:t> </w:t></w:r></w:p>
          |<w:p><w:r><w:t>acme&#9;2024-12-31</w:t></w:r></w:p>
          |</w:body></w:document>""".stripMargin
    )
    val csv = Converters.docxToCsv(doc.toString, dir.resolve("out")).get
    val snap = SnapshotSource.read(spark, csv.toString)
    assert(snap.df.columns.toSeq === Seq("Company", "Date"))
    assert(snap.df.select("Company").as[String].head() === "acme")
    // a docx with neither tables nor text yields no CSV
    val empty = zipOf(dir, "empty.docx")(
      "word/document.xml" -> """<?xml version="1.0"?><w:document xmlns:w="http://w"><w:body/></w:document>"""
    )
    assert(Converters.docxToCsv(empty.toString, dir.resolve("out2")).isEmpty)
  }

  test("consolidateZip: workbooks -> sheets -> metadata -> union (reference §3.2)") {
    val dir = Files.createTempDirectory("consol")
    val wb1 = mkXlsx(dir, "aep-financials.xlsx", Seq(
      "Balance-Sheet-TTM" -> Seq(Seq("Metric", "Date", "2024"), Seq("Cash", "d", "1"))
    ))
    val wb2 = mkXlsx(dir, "duk-financials.xlsx", Seq(
      "Ratios" -> Seq(Seq("Metric", "Date", "2023"), Seq("EBIT", "d", "2"))
    ))
    val bundle = zipOf(dir, "bundle.zip")(
      "aep-financials.xlsx" -> "", // placeholder replaced below
    )
    // rebuild bundle zip with real workbook bytes
    val zos = new ZipOutputStream(Files.newOutputStream(bundle, java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
    Seq(wb1, wb2).foreach { p =>
      zos.putNextEntry(new ZipEntry(p.getFileName.toString))
      zos.write(Files.readAllBytes(p)); zos.closeEntry()
    }
    zos.close()

    val got = graft.Pipeline.consolidateZip(spark, bundle.toString, dir.resolve("work")).get
    assert(got.count() === 2)
    assert(got.columns.toSet === Set("METRIC", "Date", "2024", "2023", "SECTOR", "COMPANY", "STATEMENT", "FREQUENCY"))
    val byCompany = got.select("COMPANY", "STATEMENT", "FREQUENCY")
      .as[(String, String, String)].collect().toSet
    assert(byCompany === Set(("AEP", "Balance", "TTM"), ("DUK", "Ratios", "ANNUAL")))
  }

  test("real-world compat: reads the reference's actual workbook (when present)") {
    val ref = java.nio.file.Paths.get("/root/reference/financials-data/aep-financials.xlsx")
    assume(Files.exists(ref), "reference corpus not present; skipping")
    val dir = Files.createTempDirectory("refxlsx")
    val sheets = Converters.xlsxToCsv(ref.toString, dir)
    assert(sheets.length === 12) // {Income,Balance-Sheet,Cash-Flow,Ratios} x {Annual,Quarterly,TTM}
    val names = sheets.map(_._1)
    assert(names.exists(_.contains("Balance")))
    val snap = SnapshotSource.read(spark, sheets.head._2.toString)
    assert(snap.df.count() > 10)
    assert(snap.df.columns.length > 20) // wide quarter-end columns
  }
}
