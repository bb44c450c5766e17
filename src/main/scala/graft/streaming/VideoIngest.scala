package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * CLIP ATOMICITY (round 17 — verdict r16 #1): a clip split across
  * micro-batches would otherwise index a PARTIAL gram set under the
  * full clip id, and the replay protocol would then hide the clip's
  * true near-dups forever. The contract is enforced through an
  * optional `expected_frames` column on the stream:
  *  - with a `pendingPath`, clips whose delivered (distinct-frame)
  *    count is below `expected_frames` are PARKED in a versioned
  *    pending store and complete in a later batch — a clip delivered
  *    across two batches dedups identically to single-batch delivery
  *    (VideoIngestSpec pins this);
  *  - without a `pendingPath`, an incomplete clip is a LOUD error;
  *  - a delivered count ABOVE `expected_frames` — or rows of one clip
  *    DECLARING contradictory expected counts — is always a loud
  *    error (the source is violating its own declared contract);
  *  - a PARTIAL redelivery of a clip the corpus already holds is a
  *    stale fragment, not a split clip (its missing frames completed
  *    long ago): it is dropped at the gate and counted as
  *    `staleDropped` (round 18, verdict r17 #5 — its own counter, not
  *    `replays`: fragment redelivery of COMPLETED clips is a
  *    misbehaving-source signal an operator must be able to alert on,
  *    distinct from benign whole-clip redelivery);
  *  - clips with a null `expected_frames` (or a stream without the
  *    column at all) keep the round-16 contract: the source delivers
  *    whole clips per batch, trusted.
  * The pending store is replay-safe by VERSIONING on the micro-batch
  * id: batch N reads the newest `v=<k>` with k < N, unions it with
  * its own frames, and overwrites `v=N` with the still-incomplete
  * clips — a replay of batch N re-reads the same k and reproduces the
  * same complete/pending split bit-for-bit; completed clips that
  * reappear on replay are absorbed by the index's same-id protocol.
  * Versions other than {k, N} are garbage-collected after the write
  * (batch N−1's checkpoint has committed by the time batch N runs).
  * Batch-mode callers passing `pendingPath` must supply a strictly
  * increasing `batchId` themselves.
  *
  * PENDING-STORE BOUND (round 18 — verdict r17 #1): every batch
  * rewrites the FULL still-pending frame set to a new version, so a
  * source that parks clips it never completes makes each subsequent
  * batch pay O(total-pending) write cost with no alarm beyond the
  * growing `deferred` count. `pendingMaxAgeBatches = Some(k)` bounds
  * that: each frame carries the batch id it FIRST arrived in
  * (`parked_batch` — redelivered copies keep the original stamp, see
  * the keeper rule below), and a clip still incomplete more than `k`
  * batches after its first frame arrived is EVICTED from the store
  * and surfaced as `agedOut` — the alert counter an operator pages
  * on. Eviction is replay-deterministic (age is a pure function of
  * the pending version read and `batchId`) and is not data loss
  * beyond what the source already caused: the clip was never going
  * to complete from the store alone, and a later WHOLE redelivery
  * still ingests it normally. `None` (the default) keeps the
  * unbounded round-17 contract.
  *
  * KEEPER (ADVICE r17): when a parked frame is redelivered while
  * still pending, the PENDING copy's bytes win, via an anti-join of
  * batch rows against pending keys — first-arrival-wins is
  * deterministic across a crash-replay of the same batch, where the
  * previous union+dropDuplicates kept an arbitrary copy (and with it
  * a nondeterministic gram set) if the redelivered bytes differed.
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
  * copy's grams under another copy's frames.
  *
  * LEDGER (round 17 — verdict r16 #2; counters split round 18 —
  * verdict r17 #5): rows without a video_id and in-batch duplicate
  * (video_id, frame_idx) rows are contract REJECTIONS, surfaced as
  * `rejected` (FRAME units, this batch's raw rows only — a frame
  * redelivered across batches is absorbed by the pending union, not a
  * rejection). The clip-unit stats partition the clips the gate saw:
  * `kept + nearDups + replays == <complete clips processed this
  * batch>` (a redelivered corpus-present UNSHINGLEABLE clip counts as
  * a replay, not a keep — round 18, ledger parity with the text
  * surface), `staleDropped == <stale fragments dropped at the gate>`,
  * `agedOut == <clips evicted for out-waiting pendingMaxAgeBatches>`,
  * and `rejected == batch.count() − <post-contract frames>`;
  * `deferred` counts clips sitting in the pending store after this
  * batch (a still-incomplete clip recounts each batch until it
  * completes, ages out, or its source dies).
  */
object VideoIngest {

  /** Start the ingest loop over a (video_id, frame_idx, media[,
    * expected_frames]) frame stream. See the object scaladoc for the
    * clip-atomicity contract `expected_frames` + `pendingPath` enable.
    *
    * `onStats` receives each micro-batch's ledger (round 18): the
    * batch-mode API returns the stats, but a foreachBatch loop would
    * otherwise swallow them — and the new alert counters (`agedOut`,
    * `staleDropped`) exist precisely so a STREAMING operator can page
    * on them. Runs inside the batch (after all writes commit for that
    * batch); a throwing callback fails the batch, so alert emission
    * shares the loop's at-least-once semantics.
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
      compactFanout: Int = 16,
      pendingPath: Option[String] = None,
      pendingMaxAgeBatches: Option[Long] = None,
      onStats: NearDupIngestStats => Unit = _ => (),
      idBloomPath: Option[String] = None,
      idBloomItems: Long = 1000000L
  ): StreamingQuery =
    frames.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onStats(ingestVideoBatch(
          batch, corpusPath, indexTable, numHashes, bands, threshold, nBuckets,
          compactFanout, pendingPath, id, pendingMaxAgeBatches, idBloomPath, idBloomItems))
        ()
      }
      .start()

  /** One video-ingest micro-batch (see [[videoDedupIngest]]). Exposed
    * for batch-mode reuse and the spec's streamed==batch comparison.
    * Stats are in CLIP units (kept/nearDups/replays/deferred count
    * videos; `rejected` counts frames) — the object scaladoc's LEDGER.
    */
  def ingestVideoBatch(
      batch: DataFrame,
      corpusPath: String,
      indexTable: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      nBuckets: Int = 64,
      compactFanout: Int = 16,
      pendingPath: Option[String] = None,
      batchId: Long = 0L,
      pendingMaxAgeBatches: Option[Long] = None,
      idBloomPath: Option[String] = None,
      idBloomItems: Long = 1000000L
  ): NearDupIngestStats = {
    val spark = batch.sparkSession
    // bloom-fronted corpus-CLIP-id gate (r19 — see
    // [[CorpusIngest.CorpusIdGate]]): the corpus stores frame rows, so
    // the membership checks probe clip ids against the video_id column;
    // with a path configured, the unshingleable/orphan checks (and the
    // completeness gate's stale check, via its own view below) stop
    // scanning the corpus in the steady no-replay state
    val gate = new CorpusIngest.CorpusIdGate(
      spark, corpusPath, "doc_id", idBloomPath, idBloomItems,
      corpusIdCol = "video_id", distinctCorpusIds = true)
    pendingMaxAgeBatches.foreach(k =>
      require(k >= 1, s"pendingMaxAgeBatches must be >= 1 (a clip always gets at least " +
        s"its arrival batch plus one to complete), got $k"))
    val hasExpected = batch.columns.contains("expected_frames")
    // the bound only has meaning inside the completeness gate, and the
    // gate only runs when the stream declares expected_frames — a
    // configured bound on a contract-less stream would otherwise be a
    // SILENT no-op: no eviction, no agedOut signal (ADVICE r18)
    require(
      pendingMaxAgeBatches.isEmpty || hasExpected,
      "pendingMaxAgeBatches is set but the stream has no expected_frames column — " +
        "the completeness gate (and therefore the age bound) only runs on streams that " +
        "declare it; drop the bound or add the column")
    val rawCnt = batch.count()
    // (1a) identity + in-batch frame dedup, materialized so every
    // later stage (shingles, index, corpus append) reads the SAME rows
    val contractCols = Seq(col("video_id"), col("frame_idx"), col("media")) ++
      (if (hasExpected) Seq(col("expected_frames").cast("long").as("expected_frames"))
       else Nil)
    val batchFrames = Materialize(
      batch
        .select(contractCols: _*)
        .filter(col("video_id").isNotNull)
        .dropDuplicates("video_id", "frame_idx")
    )
    val rejectedFrames = rawCnt - batchFrames.count()
    // a pre-r17 crash-window video index has no modality prop; the
    // cross-modality check in step (2)'s probe would brick the loop on
    // it before any maintenance pass could stamp it — adopt it here,
    // owner-declared (verdict r16 #6)
    if (spark.catalog.tableExists(indexTable))
      Dedup.stampVideoMinHashIndexIfLegacy(spark, indexTable, numHashes, bands)
    // (1b) clip-completeness gate (round 17 — see scaladoc); stale
    // fragments of already-completed clips and aged-out parked clips
    // are withheld there, each on its own counter
    val (workFrames, deferredClips, staleClips, agedOutClips) =
      if (!hasExpected) (batchFrames, 0L, 0L, 0L)
      else
        completenessGate(spark, batchFrames, corpusPath, pendingPath, batchId,
          pendingMaxAgeBatches, idBloomPath, idBloomItems)
    val keptFrames =
      if (hasExpected)
        Materialize(workFrames.select(col("video_id"), col("frame_idx"), col("media")))
      else workFrames
    val batchClips = keptFrames.select(col("video_id").as("doc_id")).distinct()
    // ONE decode+gram pass per batch; everything downstream reads grams
    val shingled = Materialize(Dedup.videoShingles(keptFrames))
    // clips too short/undecodable to gram: corpus-only, never indexed
    val unshingleable = Materialize(
      batchClips.join(shingled.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    // (1c) in-batch near-dup: greedy min-id keeper over EXACT-verified
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
    def corpusAnti(clips: DataFrame): DataFrame = gate.absent(clips)
    // unshingleable clips idempote via the corpus anti-join; a
    // corpus-PRESENT one is a redelivery and counts as a REPLAY, not a
    // keep (round 18 — ledger parity with the text surface: pre-fix a
    // source stuck re-sending a short clip read as steady-state
    // kept=1/replays=0, the opposite of the redelivery signal the
    // counters exist to expose)
    val unshCnt = unshingleable.count()
    val unshAppend =
      if (unshCnt == 0L) unshingleable else Materialize(corpusAnti(unshingleable))
    val unshReplays = unshCnt - unshAppend.count()
    val orphanClips = Materialize(
      corpusAnti(batchKept.join(replayIds, Seq("doc_id"), "left_semi").select(col("doc_id")))
        .unionByName(unshAppend)
    )
    val toCorpusClips =
      fresh.select(col("doc_id")).unionByName(orphanClips)
    if (freshCnt + orphanClips.count() > 0) {
      // bloom BEFORE the corpus append (the over-claiming direction —
      // see [[CorpusIngest.CorpusIdGate]]); the filter holds CLIP ids
      gate.update(toCorpusClips)
      keptFrames
        .join(toCorpusClips.withColumnRenamed("doc_id", "video_id"), Seq("video_id"),
          "left_semi")
        .write.mode(SaveMode.Append).parquet(corpusPath)
    }
    // (5) cadence-guarded index compaction; the MinHash-aware entry
    // point stamps the modality prop on a legacy index (verdict r16 #6)
    if (compactFanout > 0 && spark.catalog.tableExists(indexTable) &&
      graft.sinks.Sinks.bucketFileFanout(spark, indexTable) > compactFanout)
      Dedup.compactVideoMinHashIndex(spark, indexTable, numHashes, bands)
    val replayCnt = replayIds.count()
    NearDupIngestStats(
      kept = freshCnt + unshCnt - unshReplays,
      nearDups = batchClips.count() - freshCnt - unshCnt - replayCnt,
      replays = replayCnt + unshReplays,
      rejected = rejectedFrames,
      deferred = deferredClips,
      staleDropped = staleClips,
      agedOut = agedOutClips
    )
  }

  /** Split this batch's (already contract-filtered) frames into the
    * COMPLETE clips to process now and the pending frames to carry —
    * see the object scaladoc's CLIP ATOMICITY section. Returns
    * (complete frames incl. `expected_frames`, clips left pending,
    * stale fragments dropped — redeliveries of corpus-present clips —
    * and clips evicted for out-waiting `maxAgeBatches`).
    */
  private def completenessGate(
      spark: SparkSession,
      batchFrames: DataFrame,
      corpusPath: String,
      pendingPath: Option[String],
      batchId: Long,
      maxAgeBatches: Option[Long],
      idBloomPath: Option[String] = None,
      idBloomItems: Long = 1000000L
  ): (DataFrame, Long, Long, Long) = {
    // every frame carries the batch it FIRST arrived in (the age-bound
    // clock); when a still-parked frame is redelivered, the PENDING
    // copy wins — bytes AND stamp — via the anti-join, so the keeper is
    // first-arrival-deterministic across crash-replays (ADVICE r17; the
    // previous union+dropDuplicates kept an arbitrary copy, and with it
    // a nondeterministic gram set, if the redelivered bytes differed)
    val stamped = batchFrames.withColumn("parked_batch", lit(batchId))
    val unioned = pendingPath.flatMap(p => readPending(spark, p, batchId)) match {
      case Some(prior) =>
        Materialize(
          stamped
            .join(
              prior.select(col("video_id"), col("frame_idx")),
              Seq("video_id", "frame_idx"),
              "left_anti")
            .unionByName(prior))
      case None => stamped
    }
    val perClip = unioned
      .groupBy(col("video_id"))
      .agg(
        count(lit(1)).as("delivered"),
        max(col("expected_frames")).as("expected"),
        min(col("expected_frames")).as("expected_mn")
      )
    // a clip whose rows DECLARE different expected counts is a
    // self-contradictory contract — resolve it loud, never by max
    // (the over-delivery discipline); min/max ignore nulls, so a clip
    // mixing nulls with ONE declared value keeps that value
    val contra = perClip
      .filter(col("expected_mn") =!= col("expected"))
      .select(col("video_id"), col("expected_mn"), col("expected"))
      .limit(5)
      .collect()
    if (contra.nonEmpty)
      throw new IllegalStateException(
        "video ingest: clips declare CONTRADICTORY expected_frames across their rows: " +
          contra.map(r => s"${r.get(0)} (${r.get(1)} vs ${r.get(2)})").mkString(", "))
    val over = perClip
      .filter(col("expected").isNotNull && col("delivered") > col("expected"))
      .select(col("video_id"), col("delivered"), col("expected"))
      .limit(5)
      .collect()
    if (over.nonEmpty)
      throw new IllegalStateException(
        "video ingest: clips delivered MORE distinct frames than their declared " +
          s"expected_frames — the source is violating its own contract: " +
          over.map(r => s"${r.get(0)} (${r.get(1)}/${r.get(2)})").mkString(", "))
    val incompleteAll = Materialize(
      perClip.filter(col("expected").isNotNull && col("delivered") < col("expected"))
        .select(col("video_id")))
    val incompleteCnt = incompleteAll.count()
    // a PARTIAL redelivery of a clip the corpus already holds is a
    // stale fragment, not a split clip — its missing frames will never
    // arrive (the clip completed long ago), so parking it would leave
    // `deferred` permanently nonzero. It must be DROPPED here, at the
    // gate: flowing it on would NOT be absorbed downstream — a partial
    // gram set sits below the Jaccard threshold against the clip's own
    // indexed full-gram signature, so the same-id replay path never
    // fires and the fragment would be indexed as a FRESH (corrupt,
    // partial) entry under the completed clip's id. Dropped fragments
    // surface as `staleDropped` (round 18 — their own counter, not
    // `replays`: fragment redelivery of completed clips is a
    // misbehaving-source signal). Residual (documented, spec-pinned):
    // a partial redelivery of a clip caught in the index-but-not-corpus
    // crash window still parks — that needs BOTH a crash and a partial
    // redelivery of the same clip, resolves if the source ever
    // redelivers it whole, and surfaces through the age bound below.
    // The corpus scan is SKIPPED when nothing is incomplete — the
    // steady-state whole-clips path pays no O(corpus) read (ADVICE r17).
    val (incompleteIds, staleClips) =
      if (incompleteCnt == 0L) (incompleteAll, 0L)
      else {
        // same stored filter as the step-4 gate, probed on video_id
        // (r19: bloom-negative incompletes park without a corpus scan)
        val staleGate = new CorpusIngest.CorpusIdGate(
          spark, corpusPath, "video_id", idBloomPath, idBloomItems,
          corpusIdCol = "video_id", distinctCorpusIds = true)
        val park = Materialize(staleGate.absent(incompleteAll))
        (park, incompleteCnt - park.count())
      }
    // age bound (round 18 — verdict r17 #1): a clip still incomplete
    // more than maxAgeBatches after its FIRST frame arrived is evicted
    // instead of parked again — the O(pending) per-batch rewrite stops
    // paying for clips their source never completes, and `agedOut` is
    // the loud signal. Age is a pure function of (pending version read,
    // batchId), so a crash-replay evicts identically.
    val (parkIds, agedOut) = maxAgeBatches match {
      case Some(maxAge) if incompleteCnt > 0L =>
        val aged = Materialize(
          unioned
            .join(incompleteIds, Seq("video_id"), "left_semi")
            .groupBy(col("video_id"))
            .agg(min(col("parked_batch")).as("first_seen"))
            .filter(lit(batchId) - col("first_seen") > maxAge)
            .select(col("video_id")))
        val agedCnt = aged.count()
        if (agedCnt == 0L) (incompleteIds, 0L)
        else
          (Materialize(incompleteIds.join(aged, Seq("video_id"), "left_anti")), agedCnt)
      case _ => (incompleteIds, 0L)
    }
    pendingPath match {
      case Some(p) =>
        val pendingFrames = Materialize(
          unioned.join(parkIds, Seq("video_id"), "left_semi"))
        val deferred = pendingFrames.select(col("video_id")).distinct().count()
        writePending(spark, p, batchId, pendingFrames)
        // complete clips leave the gate; parked, stale, AND aged-out
        // clips are withheld (stale/aged = dropped for good, each on
        // its own counter)
        (Materialize(unioned.join(incompleteAll, Seq("video_id"), "left_anti")),
          deferred, staleClips, agedOut)
      case None =>
        val short = incompleteIds.limit(5).collect()
        if (short.nonEmpty)
          throw new IllegalStateException(
            "video ingest: micro-batch split these clips (delivered < expected_frames) " +
              "and no pendingPath is configured to carry them: " +
              short.map(_.get(0)).mkString(", ") +
              " — pass pendingPath to park split clips across batches")
        (Materialize(unioned.join(incompleteAll, Seq("video_id"), "left_anti")),
          0L, staleClips, agedOut)
    }
  }

  /** The newest pending version strictly below `batchId`, if any —
    * versions ≥ batchId belong to a crashed attempt of THIS batch and
    * must be ignored for the replay to reproduce the same split. A
    * pre-r18 store (no `parked_batch` column) is adopted by stamping
    * its frames with the version they were read from — the earliest
    * arrival the store can still prove, so the age clock starts
    * conservatively rather than resetting.
    */
  private def readPending(
      spark: SparkSession,
      path: String,
      batchId: Long
  ): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val versions = fs
        .listStatus(p)
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
        .filter(_ < batchId)
      if (versions.isEmpty) None
      else {
        val df = spark.read.parquet(s"$path/v=${versions.max}")
        Some(
          if (df.columns.contains("parked_batch")) df
          else df.withColumn("parked_batch", lit(versions.max)))
      }
    }
  }

  /** Overwrite `path/v=<batchId>` with the still-pending frames (an
    * EMPTY write is deliberate: it versions "nothing pending" so the
    * next batch reads fresh state instead of a stale predecessor),
    * then garbage-collect every other version except the one this
    * batch read from — the replay anchor until the checkpoint commits.
    */
  private def writePending(
      spark: SparkSession,
      path: String,
      batchId: Long,
      frames: DataFrame
  ): Unit = {
    frames.write.mode(SaveMode.Overwrite).parquet(s"$path/v=$batchId")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val readVersion = fs
      .listStatus(p)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .filter(_ < batchId)
      .maxOption
    fs.listStatus(p)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { q =>
        val n = q.getName
        n.startsWith("v=") && {
          val v = n.drop(2).toLong
          v != batchId && !readVersion.contains(v)
        }
      }
      .foreach(fs.delete(_, true))
  }
}
