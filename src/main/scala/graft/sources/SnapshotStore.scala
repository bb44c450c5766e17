package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot versioning (SURVEY.md S14/O4): the reference rotates
  * `current/` + timestamped `archive/` copies (`app/app.py:365-386`) and
  * derives versions from `_delta_log` filenames
  * (`azuredatalake.py:266-274`). Here: monotonically versioned parquet
  * directories `v=NNNNNN` under one root — append-only, time-travelable,
  * concurrency-safe enough for a single writer (a real deployment puts a
  * transaction log in front; the read path is identical).
  */
object SnapshotStore {

  private def versionsOf(root: String): Seq[Long] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else
      Files.list(p).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
        .toSeq
        .sorted
  }

  /** O4: current max version (-1 when empty). */
  def maxVersion(root: String): Long = versionsOf(root).lastOption.getOrElse(-1L)

  /** S14: write the next version (the "archive + replace current"
    * rotation collapses to an append of version N+1).
    *
    * Publication is ATOMIC: data is written to a `_tmp_v=N` staging dir
    * (invisible to [[versionsOf]]) and renamed into place — readers can
    * never observe a partially-written version, and a crashed writer
    * leaves only staging junk that the next write overwrites.
    */
  def write(df: DataFrame, root: String): Long = {
    val next = maxVersion(root) + 1
    val staging = s"${root}/_tmp_v=$next"
    df.write.mode("overwrite").parquet(staging) // overwrite clears a crashed writer's leftovers
    Files.move(Paths.get(staging), Paths.get(s"$root/v=$next"))
    next
  }

  /** Retention: delete all but the newest `keep` versions (always
    * keeping at least the latest). Returns the versions actually and
    * FULLY removed — a version whose directory could not be deleted
    * completely (open handle, permissions) is excluded, still listed by
    * [[maxVersion]]/readers, and retried by the next vacuum, rather than
    * being reported gone while a partial directory lingers.
    */
  def vacuum(root: String, keep: Int): Seq[Long] = {
    versionsOf(root)
      .dropRight(math.max(keep, 1))
      .filter(v => rmTree(new java.io.File(s"$root/v=$v")))
  }

  /** Recursive delete; true only if everything (incl. `f`) is gone. */
  private def rmTree(f: java.io.File): Boolean = {
    val childrenOk =
      if (f.isDirectory) Option(f.listFiles).forall(_.forall(rmTree))
      else true
    childrenOk && (f.delete() || !f.exists())
  }

  /** W1/O1: latest snapshot (the reference's sort-by-mtime-take-newest,
    * `app/app.py:176-178`, made deterministic by explicit versions).
    */
  def readLatest(spark: SparkSession, root: String): Option[DataFrame] =
    versionsOf(root).lastOption.map(v => spark.read.parquet(s"$root/v=$v"))

  /** Time travel: read an explicit version. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(s"$root/v=$version")

  /** The previous version relative to latest — the diff input pair. */
  def readPrevious(spark: SparkSession, root: String): Option[DataFrame] = {
    val vs = versionsOf(root)
    if (vs.length < 2) None else Some(spark.read.parquet(s"$root/v=${vs(vs.length - 2)}"))
  }
}
