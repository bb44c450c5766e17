package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side format converters feeding the CSV snapshot path
  * (SURVEY.md §2.1 S2-S5). Container formats are not analytics
  * operators: the reference converts xlsx/docx/zip to tabular form in
  * its API layer (`app/app.py:290-333,425-465,574-646`); we do the same
  * ahead of `SnapshotSource`. XLSX and DOCX are real readers built on
  * the JDK's zip + scala-xml over the OOXML part structure (no external
  * codec library); ZIP fan-in (S5) is fully implemented for CSV
  * payloads. DOCX reads the first `w:tbl` table, falling back to
  * tab-split paragraphs for table-less documents (reference
  * `app/app.py:316-333`).
  *
  * Scale note: at 100 TB inputs arrive as parquet/CSV on object storage,
  * not zipped workbooks; this surface exists for reference parity. A
  * cluster-scale zip path would use `spark.read.format("binaryFile")` +
  * a flatMap decompressor.
  */
object Converters {

  /** S5: extract every `*.csv` from a zip (skipping `__MACOSX` and
    * hidden entries, like the reference at `app/app.py:578-586`), read
    * each as a snapshot, and union by name with null-fill (U1).
    */
  def zipCsvFanIn(spark: SparkSession, zipPath: String, workDir: Path): Option[DataFrame] = {
    val extracted = extractEntries(zipPath, workDir, _.endsWith(".csv"))
    val dfs = extracted.map(p => SnapshotSource.read(spark, p.toString).df)
    if (dfs.isEmpty) None else Some(SnapshotSource.unionSnapshots(dfs.toSeq))
  }

  /** Extract matching entries to workDir, returning their paths. */
  def extractEntries(zipPath: String, workDir: Path, keep: String => Boolean): Seq[Path] = {
    val out = ArrayBuffer.empty[Path]
    val zis = new ZipInputStream(Files.newInputStream(Paths.get(zipPath)))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val name = e.getName
        val base = name.split('/').last
        if (!e.isDirectory && keep(name) && !name.contains("__MACOSX") && !base.startsWith(".")) {
          val target = workDir.resolve(base)
          Files.createDirectories(target.getParent)
          Files.copy(zis, target)
          out += target
        }
        zis.closeEntry()
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toSeq
  }

  /** S2/S3: minimal OOXML spreadsheet reader (xlsx = zip of XML; parsed
    * with JDK zip + scala-xml, both on Spark's classpath). Handles the
    * subset the reference's workbooks use: shared strings, inline
    * strings, numbers, sparse cells addressed by A1-style refs. Each
    * sheet becomes one CSV `<base>-<sheet>.csv` fed to
    * [[SnapshotSource.read]] (reference `app/app.py:597-619`).
    */
  def xlsxToCsv(xlsxPath: String, workDir: Path): Seq[(String, Path)] = {
    val entries = readZipBytes(xlsxPath)
    def xml(name: String): Option[scala.xml.Elem] =
      entries.get(name).map(b => scala.xml.XML.loadString(new String(b, "UTF-8")))

    val shared: IndexedSeq[String] = xml("xl/sharedStrings.xml") match {
      case Some(sst) => (sst \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      case None => IndexedSeq.empty
    }
    val rels: Map[String, String] = xml("xl/_rels/workbook.xml.rels") match {
      case Some(r) =>
        (r \ "Relationship").map { rel =>
          val target = (rel \@ "Target").stripPrefix("/xl/").stripPrefix("./")
          (rel \@ "Id") -> s"xl/${target.stripPrefix("xl/")}"
        }.toMap
      case None => Map.empty
    }
    val wb = xml("xl/workbook.xml").getOrElse(return Seq.empty)
    val base = Paths.get(xlsxPath).getFileName.toString.stripSuffix(".xlsx")

    (wb \\ "sheet").flatMap { s =>
      val name = s \@ "name"
      val rid = s.attributes.asAttrMap.collectFirst {
        case (k, v) if k == "r:id" || k.endsWith(":id") => v
      }
      val sheetEntry = rid.flatMap(rels.get).orElse(Some("xl/worksheets/sheet1.xml"))
      sheetEntry.flatMap(e => xml(e)).map { sheet =>
        val rows = (sheet \\ "row").map { row =>
          val cells = (row \ "c").map { c =>
            val ref = c \@ "r" // e.g. "B3"
            val colIdx = ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
            val v = (c \ "v").text
            val text = (c \@ "t") match {
              case "s" => if (v.nonEmpty) shared(v.toInt) else ""
              case "inlineStr" => (c \\ "t").map(_.text).mkString
              case _ => v
            }
            colIdx -> text
          }
          val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
          val arr = Array.fill(width)("")
          cells.foreach { case (i, t) => if (i >= 0) arr(i) = t }
          arr.toSeq
        }
        val out = workDir.resolve(s"$base-${sanitizeFileName(name)}.csv")
        Files.createDirectories(out.getParent)
        Files.writeString(out, rows.map(_.map(csvQuote).mkString(",")).mkString("\n"))
        name -> out
      }
    }.toSeq
  }

  /** S4: docx extraction (docx = zip of XML; reference
    * `app/app.py:290-333` did mammoth->HTML->BeautifulSoup — here read
    * straight from `word/document.xml`): first w:tbl table (rows w:tr,
    * cells w:tc, text = concatenated w:t runs); when the document has no
    * table, fall back to the reference's paragraph path
    * (`app/app.py:318-321`): each non-blank paragraph is one row, split
    * into cells on tabs. Ragged rows are fine — the CSV reader
    * null-pads short rows.
    */
  def docxToCsv(docxPath: String, workDir: Path): Option[Path] = {
    val entries = readZipBytes(docxPath)
    entries.get("word/document.xml").flatMap { bytes =>
      val doc = scala.xml.XML.loadString(new String(bytes, "UTF-8"))
      val rows: Seq[Seq[String]] = (doc \\ "tbl").headOption match {
        case Some(tbl) =>
          (tbl \ "tr").map { tr =>
            (tr \ "tc").map(tc => (tc \\ "t").map(_.text).mkString.trim)
          }
        case None =>
          (doc \\ "p")
            .map(p => (p \\ "t").map(_.text).mkString)
            .filter(_.trim.nonEmpty)
            .map(_.split('\t').toSeq.map(_.trim))
      }
      if (rows.isEmpty) None
      else {
        val base = Paths.get(docxPath).getFileName.toString.stripSuffix(".docx")
        val out = workDir.resolve(s"$base.csv")
        Files.createDirectories(out.getParent)
        Files.writeString(out, rows.map(_.map(csvQuote).mkString(",")).mkString("\n"))
        Some(out)
      }
    }
  }

  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def sanitizeFileName(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]+", "_")

  private def readZipBytes(path: String): Map[String, Array[Byte]] = {
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zis = new ZipInputStream(Files.newInputStream(Paths.get(path)))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out(e.getName) = zis.readAllBytes()
        zis.closeEntry()
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toMap
  }
}
