package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wide-snapshot CSV reader (reference S1/F13/F8: `app/app.py:129,
  * 609-614, 144-146`): header auto-detection, first-column key
  * promotion, blank/NaN -> null normalization, all values kept as
  * strings (the reference's degradation, diffed as strings — SURVEY.md
  * §1.2).
  */
object SnapshotSource {

  final case class Snapshot(df: DataFrame, keyColumn: String)

  /** Header auto-detect (reference `app/app.py:609-614`): among the
    * first 3 rows, the header is the first containing a cell with
    * "date" (case-insensitive); defaults to row 0. Driver-side over a
    * 3-row sample — never a full scan.
    */
  def detectHeaderRow(spark: SparkSession, path: String): Int = {
    val head3 = spark.read
      .option("header", "false")
      .csv(path)
      .limit(3)
      .collect()
    val idx = head3.indexWhere(r =>
      (0 until r.length).exists(i =>
        Option(r.getString(i)).exists(_.toLowerCase.contains("date"))
      )
    )
    math.max(idx, 0)
  }

  /** Read a snapshot: skip pre-header junk rows, promote the first
    * column to key, normalize empty/NaN strings to null.
    */
  def read(spark: SparkSession, path: String, headerRow: Option[Int] = None): Snapshot = {
    val skip = headerRow.getOrElse(detectHeaderRow(spark, path))
    val raw =
      if (skip == 0)
        spark.read.option("header", "true").csv(path)
      else {
        // re-read with the detected header: drop the first `skip` rows by
        // reading headerless and re-labeling from the detected header row
        val noHeader = spark.read.option("header", "false").csv(path)
        val headerVals = noHeader.limit(skip + 1).collect().last.toSeq.map(String.valueOf)
        val named = noHeader.toDF(headerVals.map(_.trim): _*)
        // POSITIONAL prefix drop (not a value-based exceptAll, which
        // would remove a matching data row from anywhere in the file):
        // per-file row position = row_number over (input_file_name,
        // monotonically_increasing_id). mII is strictly increasing in
        // physical row order within a partition and files are read
        // sequentially inside a packed partition, so ordering by it
        // within each file recovers the exact file position even when
        // Spark packs several small CSVs into one partition (a
        // first-block/ordinal heuristic would silently keep later files'
        // junk rows). Costs one shuffle on the rare skip>0 path only —
        // junk-prefixed uploads are small by construction.
        val w = Window.partitionBy(input_file_name()).orderBy(monotonically_increasing_id())
        named
          .withColumn("_pos", row_number().over(w))
          .filter(col("_pos") > skip + 1)
          .drop("_pos")
      }
    // P3 (reference `azuredatalake.py:175`): drop junk columns
    // (Unnamed/dotted artifacts of spreadsheet exports) — a driver-side
    // name filter, never a data scan
    val junkFree = raw.columns.filterNot(c => c.startsWith("Unnamed") || c.contains("."))
    val keep = if (junkFree.isEmpty) raw.columns.toSeq else junkFree.toSeq
    val cleaned = raw.select(keep.map { c =>
      val v = trim(raw(c))
      when(v === "" || upper(v) === "NAN" || upper(v) === "NULL", lit(null))
        .otherwise(v)
        .as(c)
    }.toIndexedSeq: _*)
    Snapshot(cleaned, keep.head)
  }

  /** Union heterogeneous sheets/files by name (reference U1,
    * `app/app.py:646`): missing columns null-filled.
    */
  def unionSnapshots(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** F11 date-column inference (reference `consumer.py:276-300`): first
    * column whose lowercase name is a known date word, else None.
    */
  def inferDateColumn(columns: Seq[String]): Option[String] = {
    val dateWords = Set("date", "time", "period", "month", "day")
    columns.find(c => dateWords.contains(c.toLowerCase))
  }

  /** P1 operational projection (reference `azuredatalake.py:236-254`):
    * `Date` + any column whose name contains id/code/key
    * (case-insensitive); fallback first 3 columns; append a literal
    * company_id. The name predicate is driver-side over `df.columns` —
    * never a data scan.
    */
  def operationalProjection(df: DataFrame, companyId: String): DataFrame = {
    val cols = df.columns
    val picked = cols.filter { c =>
      val lc = c.toLowerCase
      lc == "date" || lc.contains("id") || lc.contains("code") || lc.contains("key")
    }
    val keep = if (picked.nonEmpty) picked.toSeq else cols.take(3).toSeq
    df.select(keep.map(df(_)): _*)
      .withColumn("company_id", org.apache.spark.sql.functions.lit(companyId))
  }
}
