package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-parallel.
  *
  * The Spark-side shape is real and tested (schema, partitioning, batch
  * iteration); the codec itself is STUBBED with a deterministic fake
  * because no image/audio libraries exist in this environment — the
  * `decodeStub` marks exactly where a JNI/javacpp codec call would go.
  *
  * Scale notes: binaries stay in executor memory one partition at a
  * time (`mapPartitions` streams the iterator — no collect, no
  * driver-side bytes); metadata-only queries never deserialize the blob
  * because parquet column pruning drops `media` at scan time.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      content_md5: String,
      width: Int,
      height: Int,
      n_frames: Int,
      // per-frame summary the real decoder would emit (fake: rolling byte sums)
      frame_means: Array[Double]
  )

  /** Attach a binary media column (here synthesized from text — in a real
    * pipeline this is the raw image/audio bytes read from
    * `spark.read.format("binaryFile")` or a parquet blob column).
    */
  def attachBinary(df: DataFrame, srcCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"), col(srcCol).cast("binary").as("media"))

  /** STUB decode: a real implementation would call an image/audio codec
    * here (e.g. javacpp-ffmpeg) per element. The fake derives
    * deterministic pseudo-metadata from the bytes so tests are stable.
    */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val len = bytes.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val nFrames = (len % 16 + 1).toInt
    // fake per-frame means: mean byte value of each of nFrames slices
    val frameMeans = Array.tabulate(nFrames) { f =>
      val lo = (len * f / nFrames).toInt
      val hi = (len * (f + 1) / nFrames).toInt
      if (hi > lo) bytes.slice(lo, hi).map(b => (b & 0xff).toDouble).sum / (hi - lo)
      else 0.0
    }
    MediaFeatures(id, len, hex, (len % 640).toInt, (len % 480).toInt, nFrames, frameMeans)
  }

  /** Feature extraction over the binary column: partition-parallel
    * iterator transform (the Scala analogue of a batched pandas UDF —
    * rows stream through, one partition in memory at a time).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Metadata-only projection, pure column expressions (no decode): what
    * a catalog/stats query runs. Column pruning keeps the blob unread
    * when `media` metadata is materialized separately at rest.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      octet_length(col("media")).cast("long").as("byte_len"),
      md5(col("media")).as("content_md5"),
      (octet_length(col("media")) % 640).cast("long").as("fake_width"),
      (octet_length(col("media")) % 480).cast("long").as("fake_height"),
      (octet_length(col("media")) % 16 + 1).cast("long").as("n_frames")
    )

  /** Frame sampling: keep every `stride`-th frame index per media row —
    * the plumbing for video frame extraction (explode of a generated
    * index sequence; the decode of each sampled frame is the stub above).
    */
  def sampleFrameIndexes(media: DataFrame, stride: Int): DataFrame =
    metadata(media)
      .select(
        col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx")
      )
}
