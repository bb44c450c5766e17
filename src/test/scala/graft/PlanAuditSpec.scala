package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide plan net: builds every driver query's physical plan and
  * rejects the one shape that silently kills a 100 TB run — a
  * non-broadcast cartesian product (every pair of partitions shipped).
  * Broadcast nested-loop joins are NOT banned: a handful of queries
  * intentionally cross-join a one-row aggregate or a bounded query set
  * (q20's brute-force baseline, skewProfile's totals row), which is a
  * broadcast of bytes, not a shuffle of everything. The audit runs at
  * sf0.001 — planning only, but some operators legitimately run small
  * driver jobs at build time (bloom sizing, k-means seeding).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("no driver query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("no driver query plans a GLOBAL window (empty partitionSpec)") {
    // the single-task-sort class the r10 verdict flagged on
    // Curation.exactRank: a Window with no PARTITION BY funnels the
    // whole input through one task. Bounded-table global windows exist
    // in non-query code paths (HeavyHitterIngest.mgPrune, the exactRank
    // opt-in) — driver queries must never plan one over corpus data.
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val globals = fn(spark, dir).queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
      }
      if (globals.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"global windows in: ${offenders.mkString(", ")}")
  }

  test("r10 query plan pins: broadcast models, shuffle-free z-order projection") {
    val dir = "/root/testdata/sf0.001"
    // model/sketch tables must reach the data via broadcast — a shuffled
    // join here would re-shuffle the corpus for a KB-sized build side
    Seq("q79_dsir_weights", "q81_cdf_normalize", "q83_perplexity").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast join:\n${plan.take(1500)}")
    }
    // the z-value projection is map-side only: no Exchange in the main
    // plan (the bounds min/max agg is a separate bounded driver job)
    val zPlan = SparkEntry.queries("q80_zorder")(spark, dir).queryExecution.executedPlan.toString
    assert(!zPlan.contains("Exchange"), s"q80 gained a shuffle:\n${zPlan.take(1500)}")
  }

  test("r11 pin: q85 flags segments via a broadcast of the model's frequent set") {
    // the at-rest-model strip must broadcast the n >= minDocs
    // survivors onto the segment stream — a shuffled flag join would
    // re-shuffle the exploded corpus against a KB-sized set
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q85_boiler_from_model")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"q85 lost its broadcast flag join:\n${plan.take(1500)}")
  }

  test("r11 pins: q87 BM25 prunes candidates via broadcasts and never self-joins postings; " +
    "q88 NB model rides broadcasts") {
    val dir = "/root/testdata/sf0.001"
    // BM25: query tokens, df table, stats and query ids all reach the
    // postings as broadcasts — the postings table must never shuffle
    // into a SortMergeJoin (its only shuffle is the per-(query,doc)
    // score aggregation)
    val bm = SparkEntry.queries("q87_bm25_topk")(spark, dir).queryExecution.executedPlan.toString
    assert(bm.contains("BroadcastHashJoin"), s"q87 lost its broadcast prune:\n${bm.take(1500)}")
    assert(!bm.contains("SortMergeJoin"), s"q87 shuffles postings into a join:\n${bm.take(1500)}")
    // NB: the labels x nBuckets model must broadcast onto the gram stream
    val nb = SparkEntry.queries("q88_nb_classify")(spark, dir).queryExecution.executedPlan.toString
    assert(nb.contains("BroadcastHashJoin"), s"q88 lost its broadcast model join:\n${nb.take(1500)}")
    // Q5-shape: the fixed dims (region->nation) must reach the fact
    // side as a broadcast, whatever AQE does with supplier/customer
    val q5 = SparkEntry.queries("q91_local_supplier_volume")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q5.contains("BroadcastHashJoin"), s"q91 lost its dim broadcasts:\n${q5.take(1500)}")
  }

  test("r11 pins: q95 pre-aggregates revenue before the customer join and broadcasts nation; " +
    "q96 assigns map-side; q98 is one scan-agg with no join") {
    val dir = "/root/testdata/sf0.001"
    // Q10-shape: nation is a broadcast; the lineitem->orders revenue is
    // collapsed to one row per customer BEFORE customer attributes join
    // (HashAggregate must sit below the customer join in the plan)
    val q10 = SparkEntry.queries("q95_returned_items")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q10.contains("BroadcastHashJoin"), s"q95 lost its nation broadcast:\n${q10.take(1500)}")
    // k-means: the FINAL assignment plan is scan -> project -> k-row
    // aggregate; the centroids are expression literals, so the plan may
    // contain exactly the one k-row aggregation exchange and no join
    val km = SparkEntry.queries("q96_kmeans")(spark, dir).queryExecution.executedPlan.toString
    assert(!km.contains("Join"), s"q96 gained a join (centroids must be literals):\n${km.take(1500)}")
    // exact-moment Pearson: single full-scan aggregate, no join, no
    // window; the pair grid is a union over the pinned 1-row moments
    val pr = SparkEntry.queries("q98_correlation")(spark, dir).queryExecution.executedPlan.toString
    assert(!pr.contains("Join") && !pr.contains("Window"),
      s"q98 must stay a scan-agg + tiny union:\n${pr.take(1500)}")
    // Q15-shape: the tied-max set and the 1-row max ride broadcasts;
    // nothing shuffles into a sort-merge join
    val ts = SparkEntry.queries("q107_top_supplier")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(ts.contains("BroadcastHashJoin") && !ts.contains("SortMergeJoin"),
      s"q107 lost its broadcast argmax shape:\n${ts.take(1500)}")
    // langid confusion: the label rides the projection — no join at all
    val cf = SparkEntry.queries("q108_langid_confusion")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!cf.contains("Join"), s"q108 gained a join (label must ride the projection):\n${cf.take(1500)}")
  }

  test("r12 pins: TPC-H shapes keep dims on broadcasts; argmin join-back has no window; " +
    "the Markov corpus pass is one partitioned window + grid") {
    val dir = "/root/testdata/sf0.001"
    // Q7/Q9: nation/supplier/customer/part dims must reach the fact
    // stream as broadcasts, never shuffling lineitem against a dim
    Seq("q113_nation_pair_volume", "q115_profit_by_nation", "q118_disjunctive_revenue").foreach {
      q =>
        val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"), s"$q lost its dim broadcasts:\n${plan.take(1500)}")
    }
    // Q2-shape argmin: grouped min + join back — never a window over parts
    val q2 = SparkEntry.queries("q124_min_cost_supplier")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q2.contains("Window"), s"q124 must use join-back-to-min, not a window:\n${q2.take(1500)}")
    // Q11-shape: the global total is a 1-row broadcast (nested-loop on
    // bytes), and the per-part rollup never shuffles into a sort-merge
    val q11 = SparkEntry.queries("q125_important_parts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q11.contains("SortMergeJoin"), s"q125 shuffled against the 1-row total:\n${q11.take(1500)}")
    // Markov: the distributed side is ONE per-user window + the k² grid
    // aggregate — the stationary solve itself is a bounded driver step,
    // so the query's own plan is just the local relation it returns
    val mk = SparkEntry.queries("q123_markov_stationary")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!mk.contains("Exchange"), s"q123 result must be a bounded local relation:\n${mk.take(800)}")
  }

  test("r13 pins: AUC/gini prefix-sum offsets ride broadcasts; RRF fuses grids " +
    "without a sort-merge join; spearman marginals broadcast onto the joint grid") {
    val dir = "/root/testdata/sf0.001"
    // the two-phase prefix sum's bucket offsets are a bounded driver
    // vector — they must reach the grid as a broadcast, never a shuffle
    Seq("q156_roc_auc", "q163_gini_activity").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its offset broadcast:\n${plan.take(1500)}")
      assert(!plan.contains("SortMergeJoin"), s"$q shuffled a bounded side:\n${plan.take(1500)}")
    }
    // RRF: both retriever rankings are top-k-bounded grids; the fusion
    // aggregate and per-query window must never plan a sort-merge join
    val rrf = SparkEntry.queries("q160_rrf_fusion")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!rrf.contains("SortMergeJoin"), s"q160 shuffled a bounded side:\n${rrf.take(1500)}")
    // spearman: both marginal rank tables are bounded grids riding
    // broadcasts onto the joint grid
    val sp = SparkEntry.queries("q166_spearman")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(sp.contains("BroadcastHashJoin"), s"q166 lost its marginal broadcasts:\n${sp.take(1500)}")
    assert(!sp.contains("SortMergeJoin"), s"q166 shuffled a bounded marginal:\n${sp.take(1500)}")
  }

  test("r14 pins: q169 pairs via posting lists (one band-key shuffle, no hash-plan " +
    "self-join); q170 probes with broadcast band rows, never shuffling the corpus side") {
    val dir = "/root/testdata/sf0.001"
    // dHash pairs: candidates come from per-bucket posting lists — ONE
    // shuffle on the band key; a bucket self-join would scan and decode
    // the image plan twice (two ImageIO passes over every blob)
    val dh = SparkEntry.queries("q169_image_dhash_pairs")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!dh.contains("SortMergeJoin"), s"q169 self-joined the hash plan:\n${dh.take(1500)}")
    assert(!dh.contains("BroadcastHashJoin"), s"q169 grew a join stage:\n${dh.take(1500)}")
    // semantic decontamination: the eval side is benchmark-sized — its
    // band rows and the flagged aggregate must ride broadcasts; the
    // corpus side must never EXECUTE a sort-merge join. The flag
    // join-back is statically unsized (an aggregate of matched pairs),
    // so the broadcast decision is AQE's at runtime — pin the
    // FINALIZED plan (collect first), like the index-probe specs.
    val sdq = SparkEntry.queries("q170_semantic_decontaminate")(spark, dir)
    sdq.collect()
    // the AdaptiveSparkPlan string appends the pre-AQE "Initial Plan"
    // (which legitimately names SortMergeJoin) — judge the Final Plan
    val sd = sdq.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(sd.contains("BroadcastHashJoin"), s"q170 lost its eval-side broadcast:\n${sd.take(1500)}")
    assert(!sd.contains("SortMergeJoin"), s"q170 shuffled the corpus side:\n${sd.take(1500)}")
  }

  test("r15 pins: q174 pHash pairs via posting lists (no hash-plan self-join); " +
    "q175 video pairs band on posting lists and verify rides broadcasts") {
    val dir = "/root/testdata/sf0.001"
    // pHash pairs: the q169 assertions on the 256-bit family —
    // candidates come from per-bucket posting lists (one band-key
    // shuffle); a bucket self-join would decode every blob twice
    val ph = SparkEntry.queries("q174_image_phash_pairs")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!ph.contains("SortMergeJoin"), s"q174 self-joined the hash plan:\n${ph.take(1500)}")
    assert(!ph.contains("BroadcastHashJoin"), s"q174 grew a join stage:\n${ph.take(1500)}")
    // video pairs: candidate generation is the same posting-list shape
    // (band-key shuffle, pairCombos explode — never a signature-plan
    // self-join); the exact-verify join-back onto the per-clip gram
    // sets is candidate-sized and must ride broadcasts in the
    // FINALIZED plan (AQE decision — collect first, the q170 pattern),
    // never a sort-merge shuffle of the shingle corpus
    val vq = SparkEntry.queries("q175_video_neardup_pairs")(spark, dir)
    vq.collect()
    val vp = vq.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!vp.contains("CartesianProduct"), s"q175 went all-pairs:\n${vp.take(1500)}")
    assert(!vp.contains("SortMergeJoin"), s"q175 shuffled the gram corpus:\n${vp.take(1500)}")
  }

  test("r17 pin: the video at-rest EXACT-verify probe stays candidate-pruned — " +
    "no cartesian, no gram-corpus shuffle, corpus decode behind a semi-join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS audit_vexact_idx")
    def vid(ids: Seq[Long]) =
      graft.ops.Multimodal.synthVideoFrames(ids.toDF("doc_id"), "doc_id")
    val corpus = vid(Seq(0L, 1L, 2L, 3L, 4L))
    graft.ops.Dedup.writeVideoMinHashIndex(corpus, "audit_vexact_idx")
    val q = graft.ops.Dedup.incrementalVideoNearDupsExact(
      spark, vid(Seq(23L, 100L)), "audit_vexact_idx", corpus)
    q.collect() // finalize AQE before judging (the q170/q175 pattern)
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), s"exact-verify went all-pairs:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"exact-verify shuffled the corpus/gram side:\n${p.take(1500)}")
    spark.sql("DROP TABLE audit_vexact_idx")
  }
}
