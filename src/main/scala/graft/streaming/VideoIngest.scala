package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Dedup, Materialize}
import graft.streaming.CorpusIngest.NearDupIngestStats

/** Streaming VIDEO content-dedup ingest (round 16 — verdict r15 #3),
  * completing the at-rest/streaming matrix for the last dedup
  * modality: each micro-batch of (video_id, frame_idx, media) FRAME
  * rows is (1) near-deduped clip-against-clip within itself
  * (frame-gram MinHash banding + EXACT Jaccard verify + greedy min-id
  * keeper — re-encoded copies hash frame-identical and land at
  * Jaccard 1), (2) probed against the at-rest video index
  * ([[Dedup.incrementalVideoNearDupsFromShingles]] — reads only the
  * band buckets the batch hashes into; verification is the MinHash
  * estimate from the stored signatures, the text-index contract), and
  * (3) surviving clips are appended to BOTH the index
  * ([[Dedup.appendToVideoIndexFromShingles]], O(batch)) and the frame
  * corpus.
  *
  * Replay safety is the [[CorpusIngest.nearDupIngest]] protocol
  * verbatim at CLIP granularity: index-before-corpus ordering makes
  * the index over-claim, a replayed clip finds its own indexed copy as
  * a same-id hit (`dropSameId = false`) and is confirmed against the
  * corpus — present → dropped, absent (crash window) → corpus-only
  * append, never re-indexed. Clips with fewer than two DECODABLE
  * frames have no gram set ([[Dedup.videoShingles]] excludes them), so
  * like undecodable images they never enter the index and idempote via
  * the corpus anti-join instead.
  *
  * DETERMINISM (the ImageIngest ADVICE-r15 contract): the kept frame
  * rows are MATERIALIZED before shingling, so the grams — and the
  * index signatures derived from them — come from exactly the frame
  * bytes the corpus append stores; a batch carrying duplicate
  * (video_id, frame_idx) rows with different bytes cannot index one
  * copy's grams under another copy's frames. Rows without a video_id
  * are rejected up-front (an id-keyed, replay-idempotent ingest cannot
  * represent identity-less rows).
  */
object VideoIngest {

  /** Start the ingest loop over a (video_id, frame_idx, media) frame
    * stream. Micro-batch boundaries must not split clips (the source
    * delivers whole clips per batch — the natural unit of a video
    * crawl); a clip split across batches would index a partial gram
    * set under the full clip's id.
    */
  def videoDedupIngest(
      frames: DataFrame,
      corpusPath: String,
      indexTable: String,
      checkpoint: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      nBuckets: Int = 64,
      compactFanout: Int = 16
  ): StreamingQuery =
    frames.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestVideoBatch(
          batch, corpusPath, indexTable, numHashes, bands, threshold, nBuckets, compactFanout)
        ()
      }
      .start()

  /** One video-ingest micro-batch (see [[videoDedupIngest]]). Exposed
    * for batch-mode reuse and the spec's streamed==batch comparison.
    * Stats are in CLIP units (kept/nearDups/replays count videos, not
    * frames).
    */
  def ingestVideoBatch(
      batch: DataFrame,
      corpusPath: String,
      indexTable: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      nBuckets: Int = 64,
      compactFanout: Int = 16
  ): NearDupIngestStats = {
    val spark = batch.sparkSession
    // (1a) identity + in-batch frame dedup, materialized so every
    // later stage (shingles, index, corpus append) reads the SAME rows
    val keptFrames = Materialize(
      batch
        .select(col("video_id"), col("frame_idx"), col("media"))
        .filter(col("video_id").isNotNull)
        .dropDuplicates("video_id", "frame_idx")
    )
    val batchClips = keptFrames.select(col("video_id").as("doc_id")).distinct()
    // ONE decode+gram pass per batch; everything downstream reads grams
    val shingled = Materialize(Dedup.videoShingles(keptFrames))
    // clips too short/undecodable to gram: corpus-only, never indexed
    val unshingleable = Materialize(
      batchClips.join(shingled.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    // (1b) in-batch near-dup: greedy min-id keeper over EXACT-verified
    // pairs (the inline form — both gram sets are in the batch)
    val inBatchPairs =
      Dedup.videoNearDupPairsFromShingles(shingled, threshold, numHashes, bands)
    val inBatchDrops = inBatchPairs.select(col("j").as("doc_id")).distinct()
    val batchKept = Materialize(shingled.join(inBatchDrops, Seq("doc_id"), "left_anti"))
    // (2) probe the at-rest index; same-id hits are replays
    val (nearDupIds, replayIds) =
      if (spark.catalog.tableExists(indexTable)) {
        val hits = Materialize(
          Dedup.incrementalVideoNearDupsFromShingles(
            spark, batchKept, indexTable, numHashes, bands, threshold, dropSameId = false)
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
    val freshCnt = fresh.count()
    // (3) index append FIRST (the over-claiming membership structure)
    if (freshCnt > 0)
      Dedup.appendToVideoIndexFromShingles(fresh, indexTable, numHashes, bands, nBuckets)
    // (4) corpus append (frame rows of kept clips): fresh clips +
    //     crash-window orphans + corpus-absent unshingleable clips
    def corpusAnti(clips: DataFrame): DataFrame =
      if (CorpusIngest.pathExists(spark, corpusPath))
        clips.join(
          spark.read.parquet(corpusPath).select(col("video_id").as("doc_id")).distinct(),
          Seq("doc_id"),
          "left_anti"
        )
      else clips
    val orphanClips = Materialize(
      corpusAnti(batchKept.join(replayIds, Seq("doc_id"), "left_semi").select(col("doc_id")))
        .unionByName(corpusAnti(unshingleable))
    )
    val toCorpusClips =
      fresh.select(col("doc_id")).unionByName(orphanClips)
    if (freshCnt + orphanClips.count() > 0)
      keptFrames
        .join(toCorpusClips.withColumnRenamed("doc_id", "video_id"), Seq("video_id"),
          "left_semi")
        .write.mode(SaveMode.Append).parquet(corpusPath)
    // (5) cadence-guarded index compaction
    if (compactFanout > 0 && spark.catalog.tableExists(indexTable) &&
      graft.sinks.Sinks.bucketFileFanout(spark, indexTable) > compactFanout)
      graft.sinks.Sinks.compactBucketed(spark, indexTable)
    val replayCnt = replayIds.count()
    val unshCnt = unshingleable.count()
    NearDupIngestStats(
      kept = freshCnt + unshCnt,
      nearDups = batchClips.count() - freshCnt - unshCnt - replayCnt,
      replays = replayCnt
    )
  }
}
