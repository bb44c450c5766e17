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
    val stored = readBloomBytes(bloomPath)
    val corpusExists = Files.exists(Paths.get(corpusPath))
    val candidates = stored match {
      case None => withFp // first batch: no history at all
      case Some(_) if !corpusExists =>
        withFp // bloom swapped but append crashed before creating the corpus
      case Some(bytes) =>
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
    val delta = survivors
      .agg(Dedup.bloomAgg(xxhash64(col("text")), expectedItems, fpp = 0.01).as("bf"))
      .head()
      .getAs[Array[Byte]](0)
    if (delta != null) {
      val merged = stored match {
        case None => delta
        case Some(cur) =>
          val f = BloomFilter.readFrom(new ByteArrayInputStream(cur))
          f.mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(delta)))
          val out = new java.io.ByteArrayOutputStream()
          f.writeTo(out)
          out.toByteArray
      }
      // bloom BEFORE corpus append (see scaladoc), atomically
      val tmp = Paths.get(bloomPath + ".tmp")
      Files.createDirectories(tmp.getParent)
      Files.write(tmp, merged)
      Files.move(tmp, Paths.get(bloomPath), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      survivors.write.mode(SaveMode.Append).parquet(corpusPath)
    }
  }

  private def readBloomBytes(path: String): Option[Array[Byte]] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }
}
