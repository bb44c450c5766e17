package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{ImageHash, Materialize}
import graft.streaming.CorpusIngest.NearDupIngestStats

/** Streaming perceptual-image dedup ingest (round 14; hash-family
  * parameterized in round 16 — verdict r15 #4) — the image analogue of
  * [[CorpusIngest.semanticDedupIngest]], completing the
  * at-rest/streaming matrix for BOTH perceptual-hash modalities: each
  * micro-batch of (doc_id, media) rows is (1) near-deduped within
  * itself (band pairs + greedy min-id keeper — exact re-encodes land
  * at hamming 0), (2) probed against the at-rest index (reads only the
  * band buckets the batch hashes into; verification is the exact
  * hamming of the stored hashes), and (3) survivors are appended to
  * BOTH the index (O(batch)) and the image corpus.
  *
  * The hash family ([[ImageHash.DHash64]] default, [[ImageHash.PHash256]]
  * for corpora past dHash's band space) supplies hashing, pairing,
  * probe, and append; the protocol here is family-agnostic. Pointing a
  * family at the OTHER family's index fails closed at the index layer
  * (distinct props keys + max(band) data pins).
  *
  * Replay safety is the [[CorpusIngest.nearDupIngest]] protocol
  * verbatim: index-before-corpus ordering makes the index over-claim, a
  * replayed image finds its own indexed copy as a same-id hit
  * (`dropSameId = false`) and is confirmed against the corpus —
  * present → dropped, absent (crash window) → corpus-only append,
  * never re-indexed. Undecodable images hash to null, never index, and
  * pass straight to the corpus append (dropping them silently would
  * lose rows; flagging is quality scoring's job, not dedup's).
  *
  * DETERMINISM (ADVICE r15): the (doc_id, media, hash) frame comes
  * from ONE `mapPartitions` pass over the deduped batch
  * ([[graft.ops.Multimodal.dHash64WithMedia]]), materialized before
  * any join — the hash in every later stage is derived from exactly
  * the media bytes that get stored, so a batch carrying duplicate
  * doc_ids with DIFFERENT bytes can no longer store one copy's media
  * under another copy's hash. Rows without a doc_id — and the losers
  * of the in-batch id dedup — are rejected up-front and surface in the
  * stats as `rejected` (round 17, ADVICE r16: previously they were
  * silently folded into `nearDups`), not errored: an id-keyed,
  * replay-idempotent ingest cannot represent identity-less rows —
  * same-id replay detection and the corpus anti-join both key on
  * doc_id. The returned ledger sums to the raw batch size:
  * `kept + nearDups + replays + rejected == batch.count()`.
  */
object ImageIngest {

  /** Start the ingest loop over a (doc_id, media) stream. */
  def imageDedupIngest(
      media: DataFrame,
      corpusPath: String,
      indexTable: String,
      checkpoint: String,
      family: ImageHash.Family = ImageHash.DHash64,
      maxHamming: Option[Int] = None,
      nBuckets: Int = 64,
      compactFanout: Int = 16,
      onStats: CorpusIngest.NearDupIngestStats => Unit = _ => (),
      idBloomPath: Option[String] = None,
      idBloomItems: Long = 1000000L
  ): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onStats(ingestImageBatch(batch, corpusPath, indexTable, family, maxHamming, nBuckets,
          compactFanout, idBloomPath, idBloomItems))
        ()
      }
      .start()

  /** One image-ingest micro-batch (see [[imageDedupIngest]]). Exposed
    * for batch-mode reuse and the spec's streamed==batch comparison.
    * `maxHamming` None → the family's default bar (dHash 10, pHash 24
    * — the same ~9%-of-bits tolerance).
    */
  def ingestImageBatch(
      batch: DataFrame,
      corpusPath: String,
      indexTable: String,
      family: ImageHash.Family = ImageHash.DHash64,
      maxHamming: Option[Int] = None,
      nBuckets: Int = 64,
      compactFanout: Int = 16,
      idBloomPath: Option[String] = None,
      idBloomItems: Long = 1000000L
  ): NearDupIngestStats = {
    val spark = batch.sparkSession
    // bloom-fronted corpus-id gate (r19 — see [[CorpusIngest.CorpusIdGate]]):
    // with a path configured, the orphan/undecodable membership checks
    // stop scanning the corpus id column in the steady no-replay state
    val gate =
      new CorpusIngest.CorpusIdGate(spark, corpusPath, "doc_id", idBloomPath, idBloomItems)
    val bar = maxHamming.getOrElse(family.defaultMaxHamming)
    val hc = family.hashCol
    // (1a) identity + in-batch id dedup. doc_id is the replay key — a
    // row without one cannot be idempotent and is excluded here, by
    // contract (see scaladoc), not dropped by a join's null semantics.
    val idKept = batch
      .select(col("doc_id"), col("media"))
      .filter(col("doc_id").isNotNull)
      .dropDuplicates("doc_id")
    // ONE decode per kept image per batch, hash derived from the row
    // being stored (single mapPartitions pass — no join back onto a
    // nondeterministic keeper); every later stage — in-batch pairing,
    // the index probe, the undecodable split, and the index append —
    // reads the HASH column instead of re-decoding the blob.
    val hashed = Materialize(family.hashWithMedia(idKept))
    // (1b) in-batch near-dup: greedy min-id keeper over band pairs
    val inBatchPairs = family.pairsFromHashes(hashed.select(col("doc_id"), col(hc)), bar)
    val inBatchDrops = inBatchPairs.select(col("j").as("doc_id")).distinct()
    val batchKept = Materialize(hashed.join(inBatchDrops, Seq("doc_id"), "left_anti"))
    // (2) probe the at-rest index; same-id hits are replays
    val (nearDupIds, replayIds) =
      if (spark.catalog.tableExists(indexTable)) {
        val hits = Materialize(
          family.probeFromHashes(
            spark, batchKept.select(col("doc_id"), col(hc)), indexTable, bar,
            dropSameId = false)
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
    val undecodable = Materialize(fresh.filter(col(hc).isNull))
    val freshDecodable = Materialize(fresh.filter(col(hc).isNotNull))
    val freshCnt = freshDecodable.count()
    // (3) index append FIRST (the over-claiming membership structure)
    if (freshCnt > 0)
      family.appendFromHashes(
        freshDecodable.select(col("doc_id"), col(hc)), indexTable, nBuckets)
    // (4) corpus append: fresh images + crash-window orphans +
    //     corpus-absent undecodables
    val orphans = Materialize(
      gate.absent(batchKept.join(replayIds, Seq("doc_id"), "left_semi"))
        .unionByName(gate.absent(undecodable))
    )
    val toCorpus = freshDecodable.unionByName(orphans)
    if (freshCnt + orphans.count() > 0) {
      // bloom BEFORE the corpus append (the over-claiming direction —
      // see [[CorpusIngest.CorpusIdGate]])
      gate.update(toCorpus.select(col("doc_id")))
      toCorpus
        .select(col("doc_id"), col("media"))
        .write.mode(SaveMode.Append).parquet(corpusPath)
    }
    // (5) cadence-guarded index compaction
    if (compactFanout > 0 && spark.catalog.tableExists(indexTable) &&
      graft.sinks.Sinks.bucketFileFanout(spark, indexTable) > compactFanout)
      graft.sinks.Sinks.compactBucketed(spark, indexTable)
    val replayCnt = replayIds.count()
    // LEDGER (round 17 — ADVICE r16 / verdict #2): the dedup arithmetic
    // is based on the POST-contract-filter count (hashed == idKept, one
    // row per non-null doc_id), so contract-rejected rows surface as
    // `rejected`, never as phantom near-dups. kept counts decodable
    // appends plus undecodable pass-throughs (observability on the
    // replay edge: a replayed undecodable row recounts as kept even
    // though the corpus anti-join makes its append a no-op).
    // kept + nearDups + replays + rejected == batch.count().
    val idKeptCnt = hashed.count()
    NearDupIngestStats(
      kept = freshCnt + undecodable.count(),
      nearDups = idKeptCnt - freshCnt - undecodable.count() - replayCnt,
      replays = replayCnt,
      rejected = batch.count() - idKeptCnt
    )
  }
}
