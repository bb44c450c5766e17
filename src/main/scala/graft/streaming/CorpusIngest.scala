package graft.streaming

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

import graft.ops.Dedup

/** Streaming corpus ingest with cross-batch exact dedup: each
  * micro-batch of documents is deduped against everything already kept
  * and the survivors are appended — a continuously-growing training
  * corpus where replayed deliveries and recrawled documents never land
  * twice.
  *
  * The cross-batch check is the [[Dedup.incrementalExact]] design at
  * streaming cadence WITHOUT the O(history)-per-batch trap: the Bloom
  * filter over history is maintained INCREMENTALLY (each batch
  * aggregates a same-sized filter over its survivors and ORs it into the
  * stored one — O(batch) work), so only bloom-positive rows (true dupes
  * + fpp false positives) ever touch the corpus-side anti-join.
  *
  * Crash safety: the bloom is updated and atomically swapped BEFORE the
  * corpus append. A crash between the two replays the batch with a
  * filter that over-claims membership — those rows are bloom-positive,
  * the anti-join against the corpus proves them absent, and they append
  * exactly once. The reverse order would lose them silently (a
  * bloom-negative replay of an already-appended row would re-append).
  * False positives are always confirmed; false negatives cannot occur.
  */
object CorpusIngest {

  /** File-based document stream (locally testable source: parquet files
    * of (doc_id, text) dropped into a directory).
    */
  def fileDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema("doc_id BIGINT, text STRING").parquet(dir)

  /** Start the deduped-ingest sink. Corpus rows: (doc_id, fingerprint,
    * text), fingerprint-unique across the whole stream history.
    */
  def dedupedIngest(
      docs: DataFrame,
      corpusPath: String,
      bloomPath: String,
      checkpoint: String,
      expectedItems: Long = 10000000L
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, corpusPath, bloomPath, expectedItems)
      }
      .start()

  /** One micro-batch: in-batch dedup, bloom prefilter, corpus anti-join
    * confirm, bloom swap, corpus append. Exposed for batch-mode reuse
    * and the spec's streamed==batch comparison.
    */
  def ingestBatch(
      batch: DataFrame,
      corpusPath: String,
      bloomPath: String,
      expectedItems: Long
  ): Unit = {
    val spark = batch.sparkSession
    // in-batch dedup, deterministic keeper (smallest doc_id)
    val wFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fingerprint"))
      .orderBy(col("doc_id"))
    val withFp = batch
      .select(col("doc_id"), md5(col("text")).as("fingerprint"), col("text"))
      .withColumn("__rn", row_number().over(wFp))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val stored = readBloom(bloomPath)
    val corpusExists = Files.exists(Paths.get(corpusPath))
    val candidates = stored match {
      case None => withFp // first batch: no history at all
      case Some(_) if !corpusExists =>
        withFp // bloom swapped but append crashed before creating the corpus
      case Some(StoredBloom(_, _, bytes)) =>
        val tagged = withFp.withColumn("maybe", Dedup.bloomProbe(bytes, xxhash64(col("text"))))
        val definite = tagged.filter(!col("maybe")).drop("maybe")
        val confirmed = tagged
          .filter(col("maybe"))
          .drop("maybe")
          .join(
            spark.read.parquet(corpusPath).select(col("fingerprint")),
            Seq("fingerprint"),
            "left_anti"
          )
        definite.unionByName(confirmed).select(col("doc_id"), col("fingerprint"), col("text"))
    }
    // survivors feed two jobs (bloom delta + append); pin the plan result
    val survivors = candidates.localCheckpoint(true)
    // the delta MUST match the stored filter's sizing or mergeInPlace
    // throws (IncompatibleMergeException): the bloom file records its
    // own (items, bits) header, so deltas are always built to the
    // sizing the state was CREATED with — even across builds whose
    // default sizing formula changed
    val (items, bits) = stored match {
      case Some(StoredBloom(i, b, _)) => (i, b)
      case None => Dedup.bloomSizing(expectedItems, fpp = 0.01)
    }
    val delta = survivors
      .agg(Dedup.bloomAggWithBits(xxhash64(col("text")), items, bits).as("bf"))
      .head()
      .getAs[Array[Byte]](0)
    if (delta != null) {
      val merged = stored match {
        case None => delta
        case Some(StoredBloom(_, _, cur)) =>
          val f = BloomFilter.readFrom(new ByteArrayInputStream(cur))
          f.mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(delta)))
          val out = new java.io.ByteArrayOutputStream()
          f.writeTo(out)
          out.toByteArray
      }
      // bloom BEFORE corpus append (see scaladoc), atomically
      writeBloom(bloomPath, items, bits, merged)
      survivors.write.mode(SaveMode.Append).parquet(corpusPath)
    }
  }

  private val BloomMagic = 0x47424631 // "GBF1": graft bloom file v1

  private final case class StoredBloom(items: Long, bits: Long, filter: Array[Byte])

  /** Self-describing bloom file: [magic, items, bits, serialized filter].
    * Recording the sizing is what keeps every future delta
    * merge-compatible with the state (see ingestBatch).
    */
  private def writeBloom(path: String, items: Long, bits: Long, filter: Array[Byte]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(BloomMagic)
    out.writeLong(items)
    out.writeLong(bits)
    out.write(filter)
    out.flush()
    val tmp = Paths.get(path + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, bos.toByteArray)
    Files.move(tmp, Paths.get(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def readBloom(path: String): Option[StoredBloom] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(Files.readAllBytes(p)))
      require(in.readInt() == BloomMagic, s"$path is not a graft bloom file (bad magic)")
      val items = in.readLong()
      val bits = in.readLong()
      Some(StoredBloom(items, bits, in.readAllBytes()))
    }
  }
}
