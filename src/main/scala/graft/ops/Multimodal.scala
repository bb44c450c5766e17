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

  /** Per-JVM ImageIO tuning, invoked at the head of every codec
    * partition: route ImageIO's image input/output streams through the
    * MEMORY cache instead of the default temp-FILE cache — with the
    * default, EVERY `ImageIO.read`/`write` call creates and deletes a
    * temp file, which is pure overhead for the byte-array blobs this
    * engine decodes and, under a cores-wide decode stage, contends on
    * one tmp directory (measured here: the parallel dHash pass ran
    * SLOWER than serial until this was set). Pixel/byte results are
    * unaffected — the cache is an I/O buffering strategy only.
    * Idempotent; the `getUseCache` guard keeps repeat calls free.
    */
  @inline private[ops] def fastImageIO(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

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
      .mapPartitions { it => fastImageIO(); it.map { case (id, bytes) => decodeMedia(id, bytes) } }
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
      .mapPartitions { it => fastImageIO(); it.map { case (id, bytes) =>
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
      } }
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

  // ------------------------------------------------------------------
  // Perceptual image hashing (round 14): dHash-64 — the content-level
  // image dedup the multimodal family was missing (exact byte dedup
  // falls to any re-encode; dHash survives brightness shifts and
  // re-encodes because it keeps only the SIGN of adjacent-cell
  // luminance gradients). Integer-only by construction: grayscale
  // values are ints, the 9×8 downscale is exact block sums with floor
  // division, bits compare ints — so a DuckDB oracle can replay the
  // whole hash from the same pixel function (q169), the q21/q123
  // generated-oracle discipline.
  // ------------------------------------------------------------------

  /** dHash-64 of one decoded image: area-downscale the luminance to a
    * 9×8 grid (cell (i,j) = floor(mean) over the pixel box
    * [⌊i·w/9⌋, ⌊(i+1)·w/9⌋) × [⌊j·h/8⌋, ⌊(j+1)·h/8⌋) — exact integer
    * sums), then bit (j·8+i) = cell(i,j) > cell(i+1,j): 8 horizontal
    * gradient signs per row × 8 rows. Luminance is the raster's own
    * gray sample for single-band images (NO ColorModel conversion —
    * getRGB on TYPE_BYTE_GRAY round-trips through sRGB and distorts
    * values; the raw sample is what the PNG stores, which is what
    * makes the synth → encode → decode → hash pipeline exactly
    * replayable), floor((r+g+b)/3) via getRGB otherwise.
    */
  private[ops] def dHashOf(im: java.awt.image.BufferedImage): Long = {
    val (w, h) = (im.getWidth, im.getHeight)
    val gray = im.getRaster.getNumBands == 1
    def lum(x: Int, y: Int): Long =
      if (gray) im.getRaster.getSample(x, y, 0).toLong
      else {
        val rgb = im.getRGB(x, y)
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong / 3L
      }
    val cells = Array.tabulate(9, 8) { (i, j) =>
      val (x0, x1) = (i * w / 9, (i + 1) * w / 9)
      val (y0, y1) = (j * h / 8, (j + 1) * h / 8)
      var s = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { s += lum(x, y); x += 1 }
        y += 1
      }
      s / ((x1 - x0).toLong * (y1 - y0))
    }
    var bits = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (cells(i)(j) > cells(i + 1)(j)) bits |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    bits
  }

  /** Per-image dHash-64 over a binary media column: (doc_id, dhash).
    * Undecodable bytes and images narrower than the 9×8 grid hash to
    * NULL — a perceptual hash of bytes no reader understands would be
    * noise, and downstream pair generation must exclude them, not
    * bucket them together (the mmrSelect unscorable-row contract).
    * Partition-streaming like every decode path here: one image in
    * memory at a time, blobs never on the driver.
    */
  /** Decode + dHash one blob; None for undecodable or sub-grid bytes. */
  private[ops] def dHashOfBytes(bytes: Array[Byte]): Option[Long] =
    try {
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (im == null || im.getWidth < 9 || im.getHeight < 8) None
      else Some(dHashOf(im))
    } catch { case scala.util.control.NonFatal(_) => None }

  def dHash64(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => fastImageIO(); it.map { case (id, bytes) => (id, dHashOfBytes(bytes)) } }
      .toDF("doc_id", "dhash")
      .select(col("doc_id"), col("dhash").as("dhash"))
  }

  /** [[dHash64]] carrying the media blob through the SAME pass:
    * (doc_id, media, dhash) from one decode, where the hash is derived
    * from exactly the bytes in the output row. Ingest paths use this
    * instead of joining `dHash64(df)` back onto `df` — with a
    * nondeterministic upstream (e.g. a dropDuplicates keeper), the
    * join re-evaluates the input on both sides and can pair one copy's
    * media with another copy's hash (ADVICE r15); a single pass cannot
    * diverge by construction.
    */
  def dHash64WithMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => fastImageIO(); it.map { case (id, bytes) => (id, bytes, dHashOfBytes(bytes)) } }
      .toDF("doc_id", "media", "dhash")
  }

  /** Per-FRAME dHash-64 over a (video_id, frame_idx, media) frame
    * table — the video analogue of [[dHash64]]: one decode per frame,
    * partition-streaming, undecodable frames hash to null. Frame rows
    * are what the video plumbing already produces
    * ([[sampleFrameIndexes]] picks which indexes to extract; a real
    * codec extension materializes the frame blobs).
    */
  def frameDHash64(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .select(col("video_id"), col("frame_idx"), col("media"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it => fastImageIO(); it.map { case (vid, f, bytes) => (vid, f, dHashOfBytes(bytes)) } }
      .toDF("video_id", "frame_idx", "fh")
  }

  /** pHash-256 of one decoded image (round 15 — verdict r14 #3): the
    * dHash construction on a 17×16 block-mean grid — 16 horizontal
    * gradient signs per row × 16 rows = 256 bits, packed into 4 longs
    * (bit p of the hash = bit p%64 of word p/64, p = j·16+i).
    *
    * NAMING CAVEAT (ADVICE r15): despite the name, this is a WIDENED
    * dHash (block-mean gradient signs), not the conventional DCT-based
    * pHash — it inherits dHash's robustness profile (re-encodes,
    * uniform brightness shifts, mild resampling), NOT pHash's
    * crop/heavy-rescale robustness. The name is kept because the q174
    * oracle, index props (`graft.phash.bands`), and query ids already
    * carry it; pick this family for BAND-SPACE reasons (> ~10⁴ image
    * classes saturate dHash-64's 16-bit bands), not for DCT-grade
    * geometric invariance. Same
    * exact-integer math as [[dHashOf]] (floor block means over
    * ⌊i·w/17⌋ boxes, raw gray sample for single-band rasters), so a
    * SQL oracle replays it bit for bit.
    *
    * Why wider: near-dup banding splits the hash into bands, and band
    * keys must be wide enough that UNRELATED images rarely collide —
    * dHash-64's 4×16-bit bands saturate past ~10⁴ distinct image
    * classes (soak r14 measured the collision tail's exponent 1.28 at
    * 500k images/9.7k classes; pairs grow as nClasses²/2¹⁶ per band).
    * 256 bits band as 8×32 — the same pigeonhole guarantee out to
    * hamming 7 with a 2³² key space, pushing the collision knee past
    * 10⁸ classes.
    */
  private[ops] def pHash256Of(im: java.awt.image.BufferedImage): Array[Long] = {
    val (w, h) = (im.getWidth, im.getHeight)
    val gray = im.getRaster.getNumBands == 1
    def lum(x: Int, y: Int): Long =
      if (gray) im.getRaster.getSample(x, y, 0).toLong
      else {
        val rgb = im.getRGB(x, y)
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong / 3L
      }
    val cells = Array.tabulate(17, 16) { (i, j) =>
      val (x0, x1) = (i * w / 17, (i + 1) * w / 17)
      val (y0, y1) = (j * h / 16, (j + 1) * h / 16)
      var s = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { s += lum(x, y); x += 1 }
        y += 1
      }
      s / ((x1 - x0).toLong * (y1 - y0))
    }
    val words = new Array[Long](4)
    var j = 0
    while (j < 16) {
      var i = 0
      while (i < 16) {
        if (cells(i)(j) > cells(i + 1)(j)) {
          val p = j * 16 + i
          words(p / 64) |= 1L << (p % 64)
        }
        i += 1
      }
      j += 1
    }
    words
  }

  /** Per-image pHash-256 over a binary media column: (doc_id, phash
    * array<long>[4]). Undecodable bytes and images narrower than the
    * 17×16 grid hash to NULL (the [[dHash64]] contract). One decode per
    * image, partition-streaming.
    */
  def pHash256(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => fastImageIO(); it.map { case (id, bytes) => (id, pHash256OfBytes(bytes)) } }
      .toDF("doc_id", "phash")
  }

  /** Decode + pHash-256 one blob; None for undecodable/sub-grid bytes. */
  private[ops] def pHash256OfBytes(bytes: Array[Byte]): Option[Array[Long]] =
    try {
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (im == null || im.getWidth < 17 || im.getHeight < 16) None
      else Some(pHash256Of(im))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** [[pHash256]] carrying the media blob through the same pass —
    * (doc_id, media, phash) from one decode; the [[dHash64WithMedia]]
    * determinism contract.
    */
  def pHash256WithMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => fastImageIO(); it.map { case (id, bytes) => (id, bytes, pHash256OfBytes(bytes)) } }
      .toDF("doc_id", "media", "phash")
  }

  /** Deterministic synthetic grayscale image corpus — the container
    * ships no real image data, so the image-dedup pipeline is pinned
    * against images SYNTHESIZED from doc_id by an integer pixel
    * function both engines can compute (the md5TokenHash trade: the
    * corpus is contrived, the DATAFLOW it pins — PNG encode → ImageIO
    * decode → grayscale → area downscale → gradient bits → banding →
    * hamming — is the production path; PNG is lossless and the gray
    * raster sample round-trips exactly).
    *
    * Pixel value at (x, y) for doc d, W=36 × H=32 (4×4 pixel blocks per
    * dHash cell, so the downscale's floor-mean is an exact 16-pixel
    * block sum the oracle replays):
    *   cls  = d mod nClasses                 (default 97 base images;
    *       the soak scales nClasses with the corpus to hold class size
    *       — and so the per-doc duplicate rate — constant)
    *   a = 3 + (cls·7) mod 13; b = 5 + (cls·11) mod 17;
    *   c = 1 + (cls·13) mod 7; e = cls·37
    *   g = (a·x + b·y + c·x·y + e) mod 200   (class-chaotic gradients;
    *       200 keeps the max value 199+4+40 = 243 inside the byte —
    *       a spot pixel past 255 would wrap in the raster and break
    *       the exact formula replay)
    *     + d mod 5                           (brightness shift — dHash-invariant)
    *     + (40 if (d div nClasses) mod 7 = 0 and x<4 and y<4)  (spot: hamming 1)
    * Same-class docs are near-dups (hamming ≤ 1); cross-class hammings
    * are effectively random (simulated: zero cross-class pairs ≤ 10 at
    * 5000 docs).
    */
  def synthGrayImages(df: DataFrame, idCol: String, nClasses: Int = 97): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // spread the id list before the per-row PNG encode: the generator is
    // the SOURCE here, and a single-row-group id scan would render every
    // image in one task (guide §2.5; Spread gates itself off at scale)
    Spread
      .byKey(df.select(col(idCol).cast("long").as("doc_id")), col("doc_id"))
      .as[Long]
      .mapPartitions { it => fastImageIO(); it.map { d =>
        val im = new java.awt.image.BufferedImage(
          36, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val cls = d % nClasses
        val (a, b, c, e) =
          (3 + (cls * 7) % 13, 5 + (cls * 11) % 17, 1 + (cls * 13) % 7, cls * 37)
        val spot = (d / nClasses) % 7 == 0
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 36) {
            var v = (a * x + b * y + c * x * y + e) % 200 + d % 5
            if (spot && x < 4 && y < 4) v += 40
            im.getRaster.setSample(x, y, 0, v.toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        (d, bos.toByteArray)
      } }
      .toDF("doc_id", "media")
  }

  /** [[synthGrayImages]] at 68×64 — 4×4 pixel blocks per pHash-256
    * cell (17×16 grid), so the wide hash's floor block means are exact
    * 16-pixel sums the oracle replays, the same uniform-block trade the
    * 36×32 corpus makes for dHash's 9×8 grid. Identical pixel
    * polynomial, brightness shift, and spot semantics (the spot sits in
    * block (0,0) of EITHER grid: same-class pairs land at hamming ≤ 1
    * under both hashes).
    */
  def synthGrayImagesWide(df: DataFrame, idCol: String, nClasses: Int = 97): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // same input spread as [[synthGrayImages]] — see the note there
    Spread
      .byKey(df.select(col(idCol).cast("long").as("doc_id")), col("doc_id"))
      .as[Long]
      .mapPartitions { it => fastImageIO(); it.map { d =>
        val im = new java.awt.image.BufferedImage(
          68, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val cls = d % nClasses
        val (a, b, c, e) =
          (3 + (cls * 7) % 13, 5 + (cls * 11) % 17, 1 + (cls * 13) % 7, cls * 37)
        val spot = (d / nClasses) % 7 == 0
        var y = 0
        while (y < 64) {
          var x = 0
          while (x < 68) {
            var v = (a * x + b * y + c * x * y + e) % 200 + d % 5
            if (spot && x < 4 && y < 4) v += 40
            im.getRaster.setSample(x, y, 0, v.toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        (d, bos.toByteArray)
      } }
      .toDF("doc_id", "media")
  }

  /** Deterministic synthetic VIDEO corpus: one clip per input id as a
    * (video_id, frame_idx, media) long table of 36×32 grayscale PNG
    * frames — the frame-table shape a real decoder emits (the
    * [[synthGrayImages]] trade at sequence level: frames are contrived,
    * the dataflow — per-frame decode → dHash → ordered frame-gram
    * shingles → MinHash banding → exact-Jaccard verify — is the
    * production path).
    *
    * Content model: vcls = id mod `nVidClasses` picks the clip class;
    * frame count = `framesBase` + vcls mod 4 (class-determined, so
    * same-class clips align frame for frame); frame f renders the
    * [[synthGrayImages]] pixel polynomial under the class id
    * cid = vcls·16 + f — UNIQUE per (class, frame), so clips of
    * different classes share NO frame content (their gram sets are
    * disjoint; Jaccard is bimodal {0, 1}) — plus the dHash-invariant
    * per-video brightness shift id mod 5. Same-class clips therefore
    * hash to IDENTICAL frame sequences, which is what makes the LSH
    * recall of the q175 oracle exact (identical signatures always
    * collide).
    */
  def synthVideoFrames(
      df: DataFrame,
      idCol: String,
      nVidClasses: Int = 23,
      framesBase: Int = 6
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // same input spread as [[synthGrayImages]] — a clip's frames all
    // render in its id's task, so spreading ids spreads the PNG work
    Spread
      .byKey(df.select(col(idCol).cast("long").as("video_id")), col("video_id"))
      .as[Long]
      .mapPartitions { it => fastImageIO(); it.flatMap { d =>
        val vcls = d % nVidClasses
        val nf = framesBase + (vcls % 4).toInt
        (0 until nf).map { f =>
          val cid = vcls * 16 + f
          val (a, b, c, e) =
            (3 + (cid * 7) % 13, 5 + (cid * 11) % 17, 1 + (cid * 13) % 7, cid * 37)
          val im = new java.awt.image.BufferedImage(
            36, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 36) {
              val v = (a * x + b * y + c * x * y + e) % 200 + d % 5
              im.getRaster.setSample(x, y, 0, v.toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(im, "png", bos)
          (d, f, bos.toByteArray)
        }
      } }
      .toDF("video_id", "frame_idx", "media")
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
      .mapPartitions { it => fastImageIO(); it.map { case (id, bytes) => (id, countFrames(bytes)) } }
      .toDF("doc_id", "n_frames")
      .select(
        col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx")
      )
  }
}
