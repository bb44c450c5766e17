package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Thin wrappers over the Hadoop `FileSystem` API for the swap/heal
  * protocols (SCD2 state buckets, bucketed-index compaction, event-log
  * compaction, ingest bloom state). Everything here resolves the
  * filesystem FROM the path, so `file:`, `hdfs:`, `s3a:` and friends all
  * work — the `java.nio.Files` versions these replaced were silently
  * local-only, which made the 100 TB story an asterisk.
  *
  * Atomicity note, stated once for all callers: `FileSystem.rename` is
  * atomic on `file:` and `hdfs:` but a COPY+DELETE on S3A. The swap
  * protocols already tolerate a crash inside any window via their heal
  * hooks (`recoverBucketedSwap`, `recoverState`, `recoverRootSwap`), so
  * a non-atomic rename widens a recoverable window rather than adding an
  * unrecoverable one; installations wanting a truly atomic flip on an
  * object store should use the metastore-atomic `ALTER TABLE ... SET
  * LOCATION` variant called out in [[Sinks.compactBucketed]]'s doc.
  */
object Dfs {

  def conf(spark: SparkSession): Configuration = spark.sessionState.newHadoopConf()

  /** FileSystem owning `path` (scheme-aware; defaults to the local FS
    * for bare paths, matching how Spark itself resolves them).
    */
  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(conf(spark))

  def exists(fs: FileSystem, p: Path): Boolean = fs.exists(p)

  def mkdirs(fs: FileSystem, p: Path): Unit = { fs.mkdirs(p); () }

  /** Move `src` over to a NOT-YET-EXISTING `dst`. The existence guard is
    * load-bearing: the local `FileSystem` implements POSIX rename, which
    * would nest `src` INSIDE an existing `dst` directory instead of
    * failing like HDFS does — every swap protocol clears the target
    * first, and this turns a protocol violation into a loud error.
    */
  def move(fs: FileSystem, src: Path, dst: Path): Unit = {
    require(!fs.exists(dst), s"move target $dst already exists")
    require(fs.rename(src, dst), s"rename $src -> $dst failed")
  }

  def rmTree(fs: FileSystem, p: Path): Unit = {
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Write a small control file (bucket markers) crash-safely: write to
    * a `.tmp` sibling, retire the live file to `.old`, promote the
    * `.tmp`, then drop the `.old`. A crash in ANY window leaves a
    * recoverable state — either the live file is intact, or `.old`
    * holds the previous acknowledged value and [[heal]] restores it on
    * the next read. The earlier delete-then-rename version had a window
    * with NO file at all, which for CdcStream's bucket marker meant a
    * restarted sink could silently re-adopt a different bucket modulus.
    */
  def writeSmall(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val old = new Path(p.getParent, p.getName + ".old")
    val out = fs.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    if (fs.exists(p)) {
      if (fs.exists(old)) fs.delete(old, false)
      require(fs.rename(p, old), s"rename $p -> $old failed")
    }
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
    if (fs.exists(old)) fs.delete(old, false) // best-effort; healed lazily otherwise
  }

  def writeSmall(fs: FileSystem, p: Path, content: String): Unit =
    writeSmall(fs, p, content.getBytes(UTF_8))

  /** Recover a [[writeSmall]] target from a crash mid-swap: when the
    * live file is absent but its `.old` sibling exists, the crash hit
    * between retire and promote — restore the previous acknowledged
    * value. (A stray `.tmp` is never promoted: its write was never
    * acknowledged to the caller.) No-op when the live file exists.
    */
  def heal(fs: FileSystem, p: Path): Unit = {
    val old = new Path(p.getParent, p.getName + ".old")
    if (!fs.exists(p) && fs.exists(old)) {
      // Heal is invoked from READ paths, so two concurrent readers can
      // both observe the crashed-swap state; the loser's rename fails
      // AFTER the winner already restored the live file. A failed rename
      // with the live file now present IS a successful heal — only fail
      // when the target is still absent (a genuine FS error).
      if (!fs.rename(old, p)) {
        require(fs.exists(p), s"heal rename $old -> $p failed and $p is still absent")
      }
    }
  }

  /** Existence check for a [[writeSmall]] target that heals first — use
    * this (not bare `exists`) to gate reads of swap-protocol files.
    */
  def existsSmall(fs: FileSystem, p: Path): Boolean = {
    heal(fs, p)
    fs.exists(p)
  }

  def readSmall(fs: FileSystem, p: Path): Array[Byte] = {
    heal(fs, p)
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  def readSmallString(fs: FileSystem, p: Path): String = new String(readSmall(fs, p), UTF_8)

  /** Child directories of `root` (empty when root is absent). */
  def listDirs(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath).toIndexedSeq
}
