package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side format converters feeding the CSV snapshot path
  * (SURVEY.md §2.1 S2-S5). Container formats are not analytics
  * operators: the reference converts xlsx/docx/zip to tabular form in
  * its API layer (`app/app.py:290-333,425-465,574-646`); we do the same
  * ahead of `SnapshotSource`. XLSX/DOCX decoding needs codec libraries
  * not present in this environment — those entry points are explicit
  * stubs; ZIP fan-in (S5) is fully implemented for CSV payloads.
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

  /** S2/S3 stub: xlsx decoding requires a spreadsheet codec (e.g. POI)
    * not present here. The conversion contract: each sheet becomes one
    * CSV fed to [[SnapshotSource.read]], sheets union via
    * [[SnapshotSource.unionSnapshots]] (reference `app/app.py:597-619`).
    */
  def xlsxToCsv(xlsxPath: String, workDir: Path): Seq[Path] =
    throw new UnsupportedOperationException(
      "xlsx decoding needs a spreadsheet codec library (unavailable in this environment); " +
        "pre-convert workbooks to CSV and use SnapshotSource/zipCsvFanIn"
    )

  /** S4 stub: docx table extraction (reference `app/app.py:290-333`
    * via mammoth+BeautifulSoup) — same contract: first table -> CSV.
    */
  def docxToCsv(docxPath: String, workDir: Path): Path =
    throw new UnsupportedOperationException(
      "docx decoding needs a document codec library (unavailable in this environment); " +
        "pre-convert to CSV and use SnapshotSource.read"
    )
}
