package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.ops.{Dedup, Multimodal}

/** The shared staged-publish protocol (round 17 — ADVICE r16 items 2
  * and 3, verdict r16 #6): props land before data is visible, the
  * retry loop survives an ambiguous rename success and a failing
  * demotion, crashed windows heal restore-only, and a legacy
  * props-less MinHash index gains its contract props on compaction
  * without changing probe results.
  */
class StagedPublishSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  private def props(table: String): Map[String, String] =
    spark.sessionState.catalog
      .getTableMetadata(Sinks.parseIdent(spark, table))
      .properties

  test("writeBucketedWithProps: props visible with the data, bucketed, overwrite clean") {
    val t = "sp_wbwp"
    drop(t, s"${t}__stage", s"${t}__retire")
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.writeBucketedWithProps(df1, t, Seq("k"), 4, Map("graft.test.marker" -> "one"))
    assert(props(t).get("graft.test.marker").contains("one"))
    val spec = spark.sessionState.catalog
      .getTableMetadata(Sinks.parseIdent(spark, t)).bucketSpec
    assert(spec.map(_.numBuckets).contains(4))
    assert(spark.table(t).count() === 2L)
    assert(!spark.catalog.tableExists(s"${t}__stage"))
    assert(!spark.catalog.tableExists(s"${t}__retire"))
    // overwrite replaces rows AND props, leaves no staging debris
    val df2 = Seq((3L, "c")).toDF("k", "v")
    Sinks.writeBucketedWithProps(df2, t, Seq("k"), 4, Map("graft.test.marker" -> "two"))
    assert(props(t).get("graft.test.marker").contains("two"))
    assert(spark.table(t).select($"v").as[String].collect().toSeq === Seq("c"))
    assert(!spark.catalog.tableExists(s"${t}__stage"))
    drop(t)
  }

  test("publishStaged: ambiguous rename success (lost ack on a retry) is NOT demoted") {
    val t = "sp_ambig"
    drop(t, s"${t}__stage", s"${t}__retire")
    Seq((1L, "old")).toDF("k", "v").write.saveAsTable(t)
    Seq((2L, "new")).toDF("k", "v").write.saveAsTable(s"${t}__stage")
    // simulate the lost-acknowledgement window via the test seam: the
    // stage->live rename APPLIES but the client sees an error — the
    // retry must read "stage absent" as our own success, not demote the
    // just-published table (a blind retry would retire `t` and throw)
    var failures = 0
    Sinks.publishStaged(spark, t, afterRename = () => {
      failures += 1
      if (failures == 1) throw new RuntimeException("ack lost")
    })
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).select($"v").as[String].head() === "new")
    assert(!spark.catalog.tableExists(s"${t}__stage"))
    assert(!spark.catalog.tableExists(s"${t}__retire"))
    drop(t)
  }

  test("publishStaged: a missing stage at ENTRY is a loud caller bug, and the __retire " +
    "copy of a crashed swap survives it (ADVICE r17)") {
    val t = "sp_nostage"
    drop(t, s"${t}__stage", s"${t}__retire")
    // the state ADVICE r17 warned about: a crashed swap's only
    // surviving copy parked at __retire, and a buggy caller invoking
    // publishStaged without ever staging anything — the old
    // interpretation reported success and dropped __retire
    Seq((1L, "only-copy")).toDF("k", "v").write.saveAsTable(s"${t}__retire")
    val e = intercept[IllegalStateException] { Sinks.publishStaged(spark, t) }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    assert(spark.catalog.tableExists(s"${t}__retire"), "the only copy must survive")
    assert(spark.table(s"${t}__retire").select($"v").as[String].head() === "only-copy")
    // the sanctioned path out of that state is the restore-only heal
    Sinks.recoverStagedPublish(spark, t)
    assert(spark.table(t).select($"v").as[String].head() === "only-copy")
    drop(t)
  }

  test("publishStaged: a persistently failing demotion is bounded, not uncaught") {
    val t = "sp_block"
    drop(t, s"${t}__stage", s"${t}__retire")
    Seq((1L, "live")).toDF("k", "v").write.saveAsTable(t)
    Seq((2L, "stage")).toDF("k", "v").write.saveAsTable(s"${t}__stage")
    // occupying the retire name makes every live->retire demotion fail;
    // pre-fix this escaped the loop uncaught on the FIRST attempt —
    // now it retries bounded and surfaces the last error
    Seq((3L, "old")).toDF("k", "v").write.saveAsTable(s"${t}__retire")
    intercept[Exception] { Sinks.publishStaged(spark, t) }
    // nothing was lost: live unchanged, stage intact for the next writer
    assert(spark.table(t).select($"v").as[String].head() === "live")
    assert(spark.table(s"${t}__stage").select($"v").as[String].head() === "stage")
    drop(t, s"${t}__stage", s"${t}__retire")
  }

  test("recoverStagedPublish restores a crashed swap; probes heal it inline") {
    val t = "sp_heal_vidx"
    drop(t, s"${t}__retire")
    def vid(ids: Seq[Long]) =
      Multimodal.synthVideoFrames(ids.toDF("doc_id"), "doc_id")
    Dedup.writeVideoMinHashIndex(vid(Seq(0L, 1L)), t)
    val before = Dedup.incrementalVideoNearDups(spark, vid(Seq(23L)), t)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    // simulate the crash window between the swap's two renames
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}__retire")
    assert(!spark.catalog.tableExists(t))
    // the probe heals restore-only and answers identically — and the
    // restored table still carries its video modality prop, so a TEXT
    // probe fails closed instead of adopting the index
    val after = Dedup.incrementalVideoNearDups(spark, vid(Seq(23L)), t)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(after === before && after === Set((0L, 23L)))
    assert(props(t).get("graft.minhash.source").contains("video_framegram2"))
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(spark, docs, t, "text", "doc_id").count()
    }
    assert(e.getMessage.contains("cross-modality"))
    drop(t)
  }

  test("pre-publish crash (stage written, live never appeared) fails loud, then rebuilds") {
    val t = "sp_crash_vidx"
    drop(t, s"${t}__stage", s"${t}__retire")
    def vid(ids: Seq[Long]) =
      Multimodal.synthVideoFrames(ids.toDF("doc_id"), "doc_id")
    Dedup.writeVideoMinHashIndex(vid(Seq(0L)), t)
    // simulate: the build crashed after writing the stage, before any
    // rename — live absent, fully-propped stage left behind
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}__stage")
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    // the old write-then-ALTER window would leave a props-less LIVE
    // table here that a text probe could backfill as text; now there is
    // simply no live table — fail loud, never mislabel
    intercept[Exception] {
      Dedup.incrementalNearDups(spark, docs, t, "text", "doc_id").count()
    }
    // the next build clears the leftover stage and publishes cleanly
    Dedup.writeVideoMinHashIndex(vid(Seq(0L, 1L)), t)
    assert(props(t).get("graft.minhash.source").contains("video_framegram2"))
    assert(!spark.catalog.tableExists(s"${t}__stage"))
    drop(t)
  }

  test("ANN sibling epochs: torn codes/codebooks pairs fail loud; grandfather for pre-epoch") {
    import graft.ops.Similarity
    val t = "sp_pq_epoch"
    drop(t, s"${t}__codebooks", s"${t}__stage", s"${t}__retire",
      s"${t}__codebooks__stage", s"${t}__codebooks__retire")
    val emb = spark.range(64).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => (pmod(xxhash64($"id", d.cast("long")), lit(1000L)).cast("double") / 500.0 - 1.0)
          .cast("float")).as("embedding"))
    Similarity.writePqIndex(emb, "embedding", "vec_id", t, dim = 16, m = 4, kCodes = 8,
      lloydIters = 1)
    // a fresh write stamps ONE epoch on both tables and reads clean
    val e1 = props(t).get("graft.pq.epoch")
    val e2 = props(s"${t}__codebooks").get("graft.pq.epoch")
    assert(e1.nonEmpty && e1 === e2)
    val cbs = Similarity.readPqCodebooks(spark, t)
    assert(cbs.size === 4)
    // torn state (a same-geometry refit crashed between the sibling
    // publishes): new-generation codebooks beside old codes — the shape
    // checks cannot see it, the epoch does
    spark.sql(s"ALTER TABLE ${t}__codebooks SET TBLPROPERTIES ('graft.pq.epoch'='999')")
    val torn = intercept[IllegalArgumentException] {
      Similarity.readPqCodebooks(spark, t)
    }
    assert(torn.getMessage.contains("DIFFERENT quantizer trainings"), torn.getMessage)
    // ASYMMETRIC epoch presence is itself a torn state — the only one a
    // crash can reach on a pre-epoch index (the writer stamps the
    // sibling before the codes), so it fails loud too
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.pq.epoch')")
    val asym = intercept[IllegalArgumentException] {
      Similarity.readPqCodebooks(spark, t)
    }
    assert(asym.getMessage.contains("disagree on HAVING an epoch"), asym.getMessage)
    // grandfather is BOTH sides missing: a genuinely pre-epoch index
    spark.sql(s"ALTER TABLE ${t}__codebooks UNSET TBLPROPERTIES ('graft.pq.epoch')")
    assert(Similarity.readPqCodebooks(spark, t) === cbs)
    // restore the codes-side epoch for the rebuild-agreement check
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.pq.epoch'='${e1.get}')")
    spark.sql(s"ALTER TABLE ${t}__codebooks SET TBLPROPERTIES ('graft.pq.epoch'='${e1.get}')")
    // identical-training agreement: a full rebuild on the same corpus
    // re-stamps matching epochs (content-derived, not random)
    Similarity.writePqIndex(emb, "embedding", "vec_id", t, dim = 16, m = 4, kCodes = 8,
      lloydIters = 1)
    assert(props(t).get("graft.pq.epoch") === e1)
    assert(props(s"${t}__codebooks").get("graft.pq.epoch") === e1)
    drop(t, s"${t}__codebooks")
  }

  test("legacy props-less index gains contract props on compaction, probes identical") {
    // video: the modality the grandfather clause would otherwise
    // misclassify as text
    val vt = "sp_compact_vidx"
    drop(vt, s"${vt}__stage", s"${vt}__retire")
    def vid(ids: Seq[Long]) =
      Multimodal.synthVideoFrames(ids.toDF("doc_id"), "doc_id")
    Dedup.writeVideoMinHashIndex(vid(Seq(0L, 1L, 2L)), vt)
    spark.sql(s"ALTER TABLE $vt UNSET TBLPROPERTIES " +
      "('graft.minhash.source', 'graft.minhash.numHashes', 'graft.minhash.bands')")
    // NOTE: probing would also backfill (validateIndexParams) — the
    // compaction path matters for indexes whose next touch is
    // maintenance, and for VIDEO indexes whose own loop knows the
    // right modality where a foreign text probe would not
    Dedup.compactVideoMinHashIndex(spark, vt)
    val p = props(vt)
    assert(p.get("graft.minhash.source").contains("video_framegram2"))
    assert(p.get("graft.minhash.numHashes").contains("32"))
    assert(p.get("graft.minhash.bands").contains("8"))
    val hits = Dedup.incrementalVideoNearDups(spark, vid(Seq(23L)), vt)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(hits === Set((0L, 23L)))
    drop(vt)

    // text: same pass through the text entry point
    val tt = "sp_compact_tidx"
    drop(tt, s"${tt}__stage", s"${tt}__retire")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the long night")
    ).toDF("doc_id", "text")
    Dedup.writeMinHashIndex(docs, "text", "doc_id", tt)
    val before = Dedup
      .incrementalNearDups(spark, docs, tt, "text", "doc_id", dropSameId = false)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    spark.sql(s"ALTER TABLE $tt UNSET TBLPROPERTIES " +
      "('graft.minhash.source', 'graft.minhash.numHashes', 'graft.minhash.bands')")
    Dedup.compactTextMinHashIndex(spark, tt)
    assert(props(tt).get("graft.minhash.source").contains("text"))
    val after = Dedup
      .incrementalNearDups(spark, docs, tt, "text", "doc_id", dropSameId = false)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(after === before)
    drop(tt)
  }

  test("epoch backfill (verdict r17 #6): a consistent pre-epoch pair gains matching " +
    "epochs and probes identically; torn/contradictory states fail loud") {
    import graft.ops.Similarity
    def emb(seed: Long, n: Int) = spark.range(n).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => (pmod(xxhash64($"id", d.cast("long"), lit(seed)), lit(1000L)).cast("double")
          / 500.0 - 1.0).cast("float")).as("embedding"))
    val corpusA = emb(1L, 64)
    val corpusB = emb(2L, 64)
    val t = "sp_bf_pq"
    drop(t, s"${t}__codebooks", s"${t}__stage", s"${t}__retire",
      s"${t}__codebooks__stage", s"${t}__codebooks__retire")
    Similarity.writePqIndex(corpusA, "embedding", "vec_id", t, dim = 16, m = 4,
      kCodes = 8, lloydIters = 1)
    val writerEpoch = props(t)("graft.pq.epoch")
    val queries = corpusA.limit(3)
    def probe(): Set[(Long, Long, Int)] = Similarity
      .pqTopKIndexed(spark, t, queries, "embedding", "vec_id", k = 3)
      .select($"qid", $"cid", $"rank").as[(Long, Long, Int)].collect().toSet
    val before = probe()

    // no-op on a fully-stamped index: same epoch back, nothing restamped
    assert(Similarity.backfillPqEpoch(spark, t, corpusA, "embedding", "vec_id")
      === writerEpoch)

    // a consistent PRE-epoch pair (both stamps stripped): the
    // grandfather probe works, the backfill verifies by content,
    // recomputes the WRITER's epoch, stamps both, and probes identically
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.pq.epoch')")
    spark.sql(s"ALTER TABLE ${t}__codebooks UNSET TBLPROPERTIES ('graft.pq.epoch')")
    assert(probe() === before, "grandfathered pre-epoch probe")
    assert(Similarity.backfillPqEpoch(spark, t, corpusA, "embedding", "vec_id")
      === writerEpoch, "content-derived: the backfilled epoch IS the writer's")
    assert(props(t).get("graft.pq.epoch").contains(writerEpoch))
    assert(props(s"${t}__codebooks").get("graft.pq.epoch").contains(writerEpoch))
    assert(probe() === before, "stamped index probes identically")

    // crashed-backfill window: sibling stamped, codes not — readers
    // fail loud (asymmetric), a backfill RE-RUN heals without a rebuild
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.pq.epoch')")
    intercept[IllegalArgumentException] { Similarity.readPqCodebooks(spark, t) }
    assert(Similarity.backfillPqEpoch(spark, t, corpusA, "embedding", "vec_id")
      === writerEpoch)
    assert(probe() === before)

    // codes stamped with a DIFFERENT training's epoch: unrepairable, loud
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.pq.epoch'='999')")
    spark.sql(s"ALTER TABLE ${t}__codebooks UNSET TBLPROPERTIES ('graft.pq.epoch')")
    val torn = intercept[IllegalArgumentException] {
      Similarity.backfillPqEpoch(spark, t, corpusA, "embedding", "vec_id")
    }
    assert(torn.getMessage.contains("DIFFERENT quantizer training"), torn.getMessage)
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.pq.epoch')")

    // an INCONSISTENT pre-epoch pair — same-geometry codebooks from a
    // different training beside these codes (the exact hole the epoch
    // closes) — fails loud at backfill time instead of being stamped
    val t2 = "sp_bf_pq_other"
    drop(t2, s"${t2}__codebooks")
    Similarity.writePqIndex(corpusB, "embedding", "vec_id", t2, dim = 16, m = 4,
      kCodes = 8, lloydIters = 1)
    val foreignCbs = spark.table(s"${t2}__codebooks")
    drop(s"${t}__codebooks")
    foreignCbs.write.saveAsTable(s"${t}__codebooks") // props-less, wrong generation
    val e = intercept[IllegalStateException] {
      Similarity.backfillPqEpoch(spark, t, corpusA, "embedding", "vec_id")
    }
    assert(e.getMessage.contains("NOT the encode"), e.getMessage)
    drop(t, s"${t}__codebooks", t2, s"${t2}__codebooks")

    // IVF-PQ (residual mode, three tables): strip all three stamps,
    // backfill recomputes the writer's epoch, probes identically
    val ti = "sp_bf_ivfpq"
    drop(ti, s"${ti}__codebooks", s"${ti}__centroids")
    Similarity.writeIvfPqIndex(corpusA, "embedding", "vec_id", ti, dim = 16,
      nCells = 4, m = 4, kCodes = 8, lloydIters = 1, residual = true)
    val ivfEpoch = props(ti)("graft.pq.epoch")
    def probeIvf(): Set[(Long, Long, Int)] = Similarity
      .ivfPqTopKIndexed(spark, ti, queries, "embedding", "vec_id", k = 3, nProbe = 2)
      .select($"qid", $"cid", $"rank").as[(Long, Long, Int)].collect().toSet
    val beforeIvf = probeIvf()
    Seq(ti, s"${ti}__codebooks", s"${ti}__centroids").foreach(x =>
      spark.sql(s"ALTER TABLE $x UNSET TBLPROPERTIES ('graft.pq.epoch')"))
    assert(Similarity.backfillPqEpoch(spark, ti, corpusA, "embedding", "vec_id")
      === ivfEpoch)
    Seq(ti, s"${ti}__codebooks", s"${ti}__centroids").foreach(x =>
      assert(props(x).get("graft.pq.epoch").contains(ivfEpoch), x))
    assert(probeIvf() === beforeIvf)

    // a centroids sibling parked at __retire by a crashed swap is
    // HEALED by the backfill (restore precedes the shape probe), never
    // misdiagnosed as a missing table (review r18)
    spark.sql(s"ALTER TABLE ${ti}__centroids RENAME TO ${ti}__centroids__retire")
    assert(Similarity.backfillPqEpoch(spark, ti, corpusA, "embedding", "vec_id")
      === ivfEpoch)
    assert(spark.catalog.tableExists(s"${ti}__centroids"))
    assert(probeIvf() === beforeIvf)

    // an IVF-PQ index missing its __centroids sibling is NAMED, not
    // misdiagnosed as corruption or treated as plain PQ
    drop(s"${ti}__centroids")
    val miss = intercept[IllegalArgumentException] {
      Similarity.backfillPqEpoch(spark, ti, corpusA, "embedding", "vec_id")
    }
    assert(miss.getMessage.contains("__centroids"), miss.getMessage)
    drop(ti, s"${ti}__codebooks")
  }
}
