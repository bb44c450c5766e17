package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Perceptual-hash FAMILY abstraction (round 16 — verdict r15 #4): the
  * pluggable surface [[graft.streaming.ImageIngest]] parameterizes
  * over, so the streaming dedup loop works against either at-rest
  * index without duplicating the ingest protocol. A family bundles the
  * four operations the loop needs — one-decode hashing that carries
  * the media blob ([[Multimodal.dHash64WithMedia]] determinism
  * contract), in-batch pairing, the pruned incremental index probe,
  * and the O(batch) index append. Cross-family probes fail closed at
  * the index layer (distinct props keys + max(band) data pins — see
  * `validateDHashIndexParams` / `validatePHashIndexParams`), so
  * pointing a PHash256 ingest at a dHash index errors rather than
  * silently missing near-dups.
  */
object ImageHash {

  sealed trait Family {
    /** Short family id, used in messages and table-prop docs. */
    def name: String

    /** The hash column [[hashWithMedia]] emits (null = undecodable). */
    def hashCol: String

    /** The family's standard near-dup bar — the same ~9%-of-bits
      * tolerance across families (dHash-64: 10; pHash-256: 24).
      */
    def defaultMaxHamming: Int

    /** (doc_id, media, hashCol) from ONE decode per image. */
    def hashWithMedia(media: DataFrame): DataFrame

    /** Verified in-batch near-dup pairs (i, j, hamming) from hashes. */
    def pairsFromHashes(hashed: DataFrame, maxHamming: Int): DataFrame

    /** Bucket-pruned probe of an at-rest index from hashes; returns
      * (i = indexed, j = batch, hamming).
      */
    def probeFromHashes(
        spark: SparkSession,
        hashed: DataFrame,
        table: String,
        maxHamming: Int,
        dropSameId: Boolean
    ): DataFrame

    /** O(batch) append of the batch's band rows to the index. */
    def appendFromHashes(hashed: DataFrame, table: String, nBuckets: Int): Unit
  }

  /** dHash-64: 4×16-bit bands — the default for corpora under ~10⁴
    * distinct image classes (beyond that the 16-bit band space's
    * collision term grows quadratically; see the image_dhash soak).
    */
  case object DHash64 extends Family {
    val name = "dhash64"
    val hashCol = "dhash"
    val defaultMaxHamming = 10
    def hashWithMedia(media: DataFrame): DataFrame = Multimodal.dHash64WithMedia(media)
    def pairsFromHashes(hashed: DataFrame, maxHamming: Int): DataFrame =
      Dedup.dHashPairsFromHashes(hashed, maxHamming)
    def probeFromHashes(
        spark: SparkSession,
        hashed: DataFrame,
        table: String,
        maxHamming: Int,
        dropSameId: Boolean
    ): DataFrame =
      Dedup.incrementalDHashDupsFromHashes(
        spark, hashed, table, maxHamming, dropSameId = dropSameId)
    def appendFromHashes(hashed: DataFrame, table: String, nBuckets: Int): Unit =
      Dedup.appendToDHashIndexFromHashes(hashed, table, nBuckets)
  }

  /** pHash-256 (widened-dHash construction — see the
    * [[Multimodal.pHash256Of]] naming caveat): 8×32-bit bands, the
    * scale path past dHash-64's band space (> ~10⁴ image classes).
    */
  case object PHash256 extends Family {
    val name = "phash256"
    val hashCol = "phash"
    val defaultMaxHamming = 24
    def hashWithMedia(media: DataFrame): DataFrame = Multimodal.pHash256WithMedia(media)
    def pairsFromHashes(hashed: DataFrame, maxHamming: Int): DataFrame =
      Dedup.pHashPairsFromHashes(hashed, maxHamming)
    def probeFromHashes(
        spark: SparkSession,
        hashed: DataFrame,
        table: String,
        maxHamming: Int,
        dropSameId: Boolean
    ): DataFrame =
      Dedup.incrementalPHashDupsFromHashes(
        spark, hashed, table, maxHamming, dropSameId = dropSameId)
    def appendFromHashes(hashed: DataFrame, table: String, nBuckets: Int): Unit =
      Dedup.appendToPHashIndexFromHashes(hashed, table, nBuckets)
  }
}
