package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY.md §2.1 S8-S12): partitioned append tables
  * replacing the reference's per-event files and row-at-a-time inserts.
  *
  * Layout principle for 100 TB: the reference's logical layout
  * (company/table/metric as directories, one file per event/metric —
  * `azuredatalake.py:181-214`) becomes partition COLUMNS of append-only
  * tables. Same prunability, none of the small-file explosion; writers
  * append whole micro-batches.
  */
object Sinks {

  /** S8: append-only CDC event log, partitioned for pruning by tenant
    * and day (the two predicates every readback query carries).
    */
  def appendEventLog(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write
      .mode(SaveMode.Append)
      .partitionBy("company_id", "table_name", "event_date")
      .parquet(path)

  /** S10/R1: per-metric long table — `partitionBy(metric)` instead of the
    * reference's file-per-metric (`azuredatalake.py:181-214`).
    */
  def writeMetricPartitioned(long: DataFrame, path: String): Unit =
    long.write.mode(SaveMode.Overwrite).partitionBy("metric").parquet(path)

  /** S12: JSON results (anomaly payloads, metadata). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Bucketed table at rest: pre-hash-partition (and sort) the data by
    * its join/agg keys so downstream equi-joins and aggregations on
    * `keys` read co-located buckets and skip the shuffle entirely —
    * THE layout lever for repeated 100 TB fact-to-fact joins (broadcast
    * covers small dims; bucketing covers big-big). `saveAsTable` is
    * required: bucket metadata lives in the catalog, not the files.
    * SinksSpec proves the join and agg plans over two bucketed tables
    * contain no Exchange.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int = 64
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Compact the event log's accumulated micro-batch files: rewrite each
    * (company_id, table_name, event_date) partition into
    * ceil(rows / rowsPerFile) files. Streaming appends produce one file
    * per micro-batch per partition — at 100 TB that's the classic
    * small-file problem (open/seek overhead dominates scans; the
    * NameNode/objectstore LIST gets slow). Rewrite goes through a
    * staging dir + rename so readers never see a half-compacted log;
    * a crash between the two renames is recovered from `.old` at the
    * start of the next run (same protocol as the scd2 sink swap).
    */
  def compactEventLog(
      spark: SparkSession,
      path: String,
      rowsPerFile: Long = 4000000L
  ): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val staging = path + ".compact"
    val oldP = Paths.get(path + ".old")
    // crash recovery mirrors scd2Sink: a crash between the two moves
    // below leaves the log only at .old — restore it before reading; a
    // leftover .old NEXT TO a live log is a post-swap crash — clear it
    // so the swap can run again
    if (!Files.exists(Paths.get(path)) && Files.exists(oldP))
      Files.move(oldP, Paths.get(path))
    if (Files.exists(oldP)) rmTree(oldP.toFile)
    spark.read.parquet(path)
      // one shuffle co-locating each partition's rows so the writer emits
      // ceil(rows/rowsPerFile) files per partition instead of one per
      // original input file (AQE coalesces the tiny reducers)
      .repartition(col("company_id"), col("table_name"), col("event_date"))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy("company_id", "table_name", "event_date")
      .parquet(staging)
    Files.move(Paths.get(path), oldP)
    Files.move(Paths.get(staging), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    rmTree(oldP.toFile)
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Readback with partition pruning (P7 path-predicate equivalent). */
  def readEventLog(
      spark: SparkSession,
      path: String,
      companyId: Option[String] = None,
      tableName: Option[String] = None
  ): DataFrame = {
    val base = spark.read.parquet(path)
    val f1 = companyId.map(c => base.filter(col("company_id") === c)).getOrElse(base)
    tableName.map(t => f1.filter(col("table_name") === t)).getOrElse(f1)
  }
}
