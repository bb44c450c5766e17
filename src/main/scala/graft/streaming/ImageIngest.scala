package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Dedup, Materialize}
import graft.streaming.CorpusIngest.NearDupIngestStats

/** Streaming perceptual-image dedup ingest (round 14) — the image
  * analogue of [[CorpusIngest.semanticDedupIngest]], completing the
  * at-rest/streaming matrix for the dHash modality: each micro-batch of
  * (doc_id, media) rows is (1) near-deduped within itself (dHash band
  * pairs + greedy min-id keeper — exact re-encodes land at hamming 0),
  * (2) probed against the at-rest dHash index
  * ([[Dedup.incrementalDHashDups]] — reads only the band buckets the
  * batch hashes into; verification is the exact hamming of the stored
  * hashes), and (3) survivors are appended to BOTH the index
  * ([[Dedup.appendToDHashIndex]], O(batch)) and the image corpus.
  *
  * Replay safety is the [[CorpusIngest.nearDupIngest]] protocol
  * verbatim: index-before-corpus ordering makes the index over-claim, a
  * replayed image finds its own indexed copy as a same-id hit
  * (`dropSameId = false`) and is confirmed against the corpus —
  * present → dropped, absent (crash window) → corpus-only append,
  * never re-indexed. Undecodable images hash to null, never index, and
  * pass straight to the corpus append (dropping them silently would
  * lose rows; flagging is quality scoring's job, not dedup's).
  */
object ImageIngest {

  /** Start the ingest loop over a (doc_id, media) stream. */
  def imageDedupIngest(
      media: DataFrame,
      corpusPath: String,
      indexTable: String,
      checkpoint: String,
      maxHamming: Int = 10,
      nBuckets: Int = 64,
      compactFanout: Int = 16
  ): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestImageBatch(batch, corpusPath, indexTable, maxHamming, nBuckets, compactFanout)
        ()
      }
      .start()

  /** One image-ingest micro-batch (see [[imageDedupIngest]]). Exposed
    * for batch-mode reuse and the spec's streamed==batch comparison.
    */
  def ingestImageBatch(
      batch: DataFrame,
      corpusPath: String,
      indexTable: String,
      maxHamming: Int = 10,
      nBuckets: Int = 64,
      compactFanout: Int = 16
  ): NearDupIngestStats = {
    val spark = batch.sparkSession
    // (1a) in-batch id dedup — deterministic keeper per doc_id
    val idKept = batch.select(col("doc_id"), col("media")).dropDuplicates("doc_id")
    // ONE ImageIO decode per kept image per batch: the (doc_id, media,
    // dhash) frame is materialized here and every later stage —
    // in-batch pairing, the index probe, the undecodable split, and the
    // index append — reads the HASH column instead of re-decoding the
    // blob (before this, each of those stages ran its own decode pass:
    // ~4× the per-batch codec cost).
    val hashed = Materialize(
      idKept.join(graft.ops.Multimodal.dHash64(idKept), Seq("doc_id"))
    )
    // (1b) in-batch near-dup: greedy min-id keeper over dHash pairs
    val inBatchPairs =
      Dedup.dHashPairsFromHashes(hashed.select(col("doc_id"), col("dhash")), maxHamming)
    val inBatchDrops = inBatchPairs.select(col("j").as("doc_id")).distinct()
    val batchKept = Materialize(hashed.join(inBatchDrops, Seq("doc_id"), "left_anti"))
    // (2) probe the at-rest index; same-id hits are replays
    val (nearDupIds, replayIds) =
      if (spark.catalog.tableExists(indexTable)) {
        val hits = Materialize(
          Dedup.incrementalDHashDupsFromHashes(
            spark, batchKept.select(col("doc_id"), col("dhash")), indexTable,
            maxHamming, dropSameId = false)
        )
        (
          hits.filter(col("i") =!= col("j")).select(col("j").as("doc_id")).distinct(),
          hits.filter(col("i") === col("j")).select(col("j").as("doc_id")).distinct()
        )
      } else {
        val none = batchKept.select(col("doc_id")).limit(0)
        (none, none)
      }
    val fresh = Materialize(
      batchKept
        .join(nearDupIds, Seq("doc_id"), "left_anti")
        .join(replayIds, Seq("doc_id"), "left_anti")
    )
    // Undecodable images never enter the index, so the same-id replay
    // protocol cannot see their redelivery — without a direct corpus
    // membership check a replayed undecodable row would APPEND TWICE.
    // Split them out: decodable fresh rows are replay-safe through the
    // index; undecodable ones idempote via the corpus anti-join (the
    // orphan path's mechanism).
    val undecodable = Materialize(fresh.filter(col("dhash").isNull))
    val freshDecodable = Materialize(fresh.filter(col("dhash").isNotNull))
    val freshCnt = freshDecodable.count()
    // (3) index append FIRST (the over-claiming membership structure)
    if (freshCnt > 0)
      Dedup.appendToDHashIndexFromHashes(
        freshDecodable.select(col("doc_id"), col("dhash")), indexTable, nBuckets)
    // (4) corpus append: fresh images + crash-window orphans +
    //     corpus-absent undecodables
    def corpusAnti(df: DataFrame): DataFrame =
      if (CorpusIngest.pathExists(spark, corpusPath))
        df.join(
          spark.read.parquet(corpusPath).select(col("doc_id")),
          Seq("doc_id"),
          "left_anti"
        )
      else df
    val orphans = Materialize(
      corpusAnti(batchKept.join(replayIds, Seq("doc_id"), "left_semi"))
        .unionByName(corpusAnti(undecodable))
    )
    val toCorpus = freshDecodable.unionByName(orphans)
    if (freshCnt + orphans.count() > 0)
      toCorpus
        .select(col("doc_id"), col("media"))
        .write.mode(SaveMode.Append).parquet(corpusPath)
    // (5) cadence-guarded index compaction
    if (compactFanout > 0 && spark.catalog.tableExists(indexTable) &&
      graft.sinks.Sinks.bucketFileFanout(spark, indexTable) > compactFanout)
      graft.sinks.Sinks.compactBucketed(spark, indexTable)
    val replayCnt = replayIds.count()
    // kept counts decodable appends plus undecodable pass-throughs
    // (observability, not a ledger: a replayed undecodable row recounts
    // as kept even though the corpus anti-join makes its append a no-op)
    NearDupIngestStats(
      kept = freshCnt + undecodable.count(),
      nearDups = batch.count() - freshCnt - undecodable.count() - replayCnt,
      replays = replayCnt
    )
  }
}
