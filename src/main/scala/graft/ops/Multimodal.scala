package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-parallel.
  *
  * The decode path is REAL for every format the JDK ships ImageIO
  * readers for (PNG, BMP, GIF incl. multi-frame, JPEG, WBMP, TIFF on
  * Java 17) — true width/height/frame count and per-frame mean
  * luminance, zero extra dependencies. Bytes no reader claims (text
  * corpora, audio, video) fall back to a deterministic byte-derived
  * surrogate so any corpus flows end-to-end; that fallback marks
  * exactly where a JNI/javacpp codec (ffmpeg et al.) would widen
  * coverage.
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

  /** Decode one media value. Real ImageIO decode when a JDK reader
    * recognizes the bytes (TextMultimodalReshapeSpec asserts true
    * dimensions of synthesized PNG/BMP/GIF images); deterministic
    * byte-derived surrogate otherwise — the marked extension point for
    * a native codec dependency (audio/video).
    */
  private def decodeMedia(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val len = bytes.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    decodeImage(bytes) match {
      case Some((w, h, means)) =>
        MediaFeatures(id, len, hex, w, h, means.length, means)
      case None =>
        // surrogate: pseudo-metadata derived from the raw bytes
        val nFrames = (len % 16 + 1).toInt
        val frameMeans = Array.tabulate(nFrames) { f =>
          val lo = (len * f / nFrames).toInt
          val hi = (len * (f + 1) / nFrames).toInt
          if (hi > lo) bytes.slice(lo, hi).map(b => (b & 0xff).toDouble).sum / (hi - lo)
          else 0.0
        }
        MediaFeatures(id, len, hex, (len % 640).toInt, (len % 480).toInt, nFrames, frameMeans)
    }
  }

  /** JDK ImageIO decode: (width, height, per-frame mean luminance), or
    * None when no installed reader claims the bytes. Multi-frame
    * formats (GIF) yield one mean per frame.
    */
  private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        reader.setInput(iis, false, true)
        try {
          val n = math.max(reader.getNumImages(true), 1)
          val means = Array.tabulate(n) { f =>
            val im = reader.read(f)
            var sum = 0.0
            var y = 0
            while (y < im.getHeight) {
              var x = 0
              while (x < im.getWidth) {
                val rgb = im.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                x += 1
              }
              y += 1
            }
            val px = im.getWidth.toLong * im.getHeight
            if (px > 0) sum / px else 0.0
          }
          Some((reader.getWidth(0), reader.getHeight(0), means))
        } finally reader.dispose()
      }
    } catch {
      case scala.util.control.NonFatal(_) => None // corrupt header etc. -> surrogate
    } finally if (iis != null) iis.close()
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
      .mapPartitions(_.map { case (id, bytes) => decodeMedia(id, bytes) })
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

  /** Resize the binary image column to fit inside `maxW` x `maxH`
    * (aspect-preserving downscale, bilinear, re-encoded as PNG) —
    * the normalize-before-training step of an image pipeline. Real for
    * every ImageIO-readable format; bytes no reader claims pass through
    * unchanged with `resized=false` (the same codec extension point as
    * [[extractFeatures]]). Never upscales.
    *
    * Same scale shape as the decoder: partition-streaming iterator
    * transform, one image in memory at a time, blobs never on the
    * driver.
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = try {
          val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (im == null) None
          else {
            val scale = math.min(
              1.0,
              math.min(maxW.toDouble / im.getWidth, maxH.toDouble / im.getHeight)
            )
            val (w, h) =
              (math.max(1, (im.getWidth * scale).round.toInt),
                math.max(1, (im.getHeight * scale).round.toInt))
            val scaled =
              new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
            )
            g.drawImage(im, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            Some((bos.toByteArray, w, h))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        out match {
          case Some((b, w, h)) => (id, b, w, h, true)
          case None => (id, bytes, -1, -1, false)
        }
      })
      .toDF("doc_id", "media", "width", "height", "resized")
  }

  /** Header-only frame count: asks the ImageIO reader for the image
    * count WITHOUT decoding pixel data — the cheap path when only the
    * count is needed ([[sampleFrameIndexes]] would otherwise pay the
    * full per-pixel luminance decode of every frame). Non-image bytes
    * fall back to the same deterministic surrogate as [[decodeMedia]].
    */
  private def countFrames(bytes: Array[Byte]): Int = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) (bytes.length % 16 + 1)
      else {
        val reader = readers.next()
        reader.setInput(iis, false, true)
        try math.max(reader.getNumImages(true), 1)
        finally reader.dispose()
      }
    } catch {
      case scala.util.control.NonFatal(_) => (bytes.length % 16 + 1)
    } finally if (iis != null) iis.close()
  }

  /** Frame sampling: keep every `stride`-th frame index per media row —
    * the plumbing for video frame extraction. Frame counts come from the
    * REAL header ([[countFrames]] — no pixel decode) so every emitted
    * index is decodable; the metadata() surrogate would invent indexes
    * for frames that don't exist on actual images (and hide frames on
    * multi-frame ones).
    */
  def sampleFrameIndexes(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, countFrames(bytes)) })
      .toDF("doc_id", "n_frames")
      .select(
        col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx")
      )
  }
}
