package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** BM25 keyword retrieval over an at-rest inverted index.
  *
  * The missing retrieval mode next to the embedding-ANN family
  * ([[Similarity]]): exact lexical top-k, the standard first stage of
  * corpus search / RAG candidate generation and the workhorse behind
  * "find the documents containing these terms" QA sweeps that a
  * training-data pipeline runs constantly (reference analogy: the CDC
  * pipeline's key-lookup queries, `queryprocessing.py`, generalized to
  * free text).
  *
  * == Shape at 100 TB ==
  *
  * The index is posting lists — one row per (token, doc): the classic
  * layout every search engine shards. Everything query-time touches is
  * either broadcast-sized (the query's tokens, their document
  * frequencies, the 1-row corpus stats) or pruned to postings of the
  * query's tokens BEFORE any shuffle, so per-query cost is
  * O(candidate postings), never O(corpus). The only shuffle is the
  * per-(query, doc) score aggregation over candidates; the final rank
  * window partitions by query id — no global sort. Persist the
  * postings bucketed by `token` ([[graft.sinks.Sinks.writeBucketed]])
  * and the candidate prune becomes a bucket-pruned scan.
  *
  * == Cross-engine determinism ==
  *
  * BM25 needs ln; libm ln is not bit-identical across engines, so the
  * Lucene idf `ln(1 + (N - df + 0.5)/(df + 0.5))` is rewritten as the
  * integer-argument difference `glog(2N+2) - glog(2df+1)` (same value:
  * `1 + (N-df+0.5)/(df+0.5) = (N+1)/(df+0.5) = (2N+2)/(2df+1)`) using
  * [[Dsir.glog]], which is bit-identical in any IEEE-754 engine. The
  * per-(token, doc) term score is quantized ONCE to a long
  * (`round(term * 1e9)`, always positive — idf > 0 for df ≤ N), and
  * per-(query, doc) scores are exact long sums — associative,
  * commutative, deterministic under any partitioning. Ranking compares
  * the quantized longs (exact), tie-broken by doc_id.
  */
object Retrieval {

  /** Posting lists: one row per (token, doc) with the in-doc term
    * frequency `tf` and the doc's token count `dl` (denormalized onto
    * every posting so query-time length normalization needs no second
    * join against a doc-stats table). Docs with zero tokens index
    * nothing — they can never match a term query.
    *
    * One explode + one shuffle on (token, doc_id); this is the
    * index-build pass, O(total tokens).
    */
  def invertedIndex(corpus: DataFrame, textCol: String, idCol: String): DataFrame =
    // spread before tokenize+explode so the build pass isn't bound to
    // the scan's split count (guide §2.5; no-op on partitioned input)
    Spread
      .byKey(
        corpus.select(col(idCol).as("doc_id"), col(textCol).as("_i_text")),
        col("doc_id")
      )
      .select(col("doc_id"), Fns.tokens(col("_i_text")).as("words"))
      .select(col("doc_id"), size(col("words")).as("dl"), explode(col("words")).as("token"))
      .groupBy("token", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))

  /** Corpus stats the BM25 formula needs: indexed-doc count and total
    * token mass (avgdl = sum_dl / n_docs is derived at query time as
    * one shared IEEE division). One row; computed from the postings
    * with a distinct over (doc_id, dl) — at index-build time, persist
    * it next to the postings instead of recomputing.
    */
  def indexStats(postings: DataFrame): DataFrame =
    postings
      .select("doc_id", "dl")
      .distinct()
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

  /** The same one-row stats computed from the CORPUS instead of the
    * postings: docs with at least one token, total token mass. Exactly
    * [[indexStats]]∘[[invertedIndex]] under the index family's
    * documented doc_id-uniqueness contract, but it never touches the
    * corpus×vocabulary-sized posting rows — the build-time form. (The
    * round-12 soak measured the difference: stats-via-pinned-postings
    * made `writeBm25Index` super-linear at 100× — localCheckpointing
    * 70M posting rows to share one scan — exponent 1.36; corpus-direct
    * stats restored ≤1.3 with a second NARROW corpus scan.)
    */
  def corpusStats(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(size(Fns.tokens(col(textCol))).as("dl"))
      .filter(col("dl") > 0)
      .agg(count(lit(1)).as("n_docs"), sum(col("dl").cast("long")).as("sum_dl"))

  /** BM25 top-k per query. `queries` is small (id + text); the corpus
    * side is `postings`. Scores use distinct query terms (qtf = 1 —
    * the common web-query case; a repeated term scores once).
    *
    * Output: (query_id, doc_id, rank, score_q, score) where `score_q`
    * is the exact quantized-long sum (the ranking key) and
    * `score = score_q / 1e9` its human-readable double form.
    *
    * Plan: postings ⋈ broadcast(query tokens) prunes to candidate
    * postings first; df is counted on the pruned set (identical to the
    * full-corpus df for surviving tokens — the prune keeps ALL docs of
    * a kept token); stats and per-token idf ride as broadcasts. One
    * shuffle: the (query_id, doc_id) score aggregation.
    */
  def bm25TopK(
      postings: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      stats: Option[DataFrame] = None
  ): DataFrame =
    bm25TopKMulti(postings, queries, queryIdCol, queryTextCol, k, Seq((k1, b)), stats).head

  /** [[bm25TopK]] for SEVERAL (k1, b) parameterizations over one shared
    * candidate pass (r19, guide §1.2 "fewer passes"): the multi-retriever
    * ensembles (RRF fusion, retriever-agreement QA) score the same
    * queries under 2+ parameterizations, and every per-parameterization
    * call re-ran the candidate prune, df count and score shuffle on
    * identical inputs. Here the candidate join computes every
    * parameterization's quantized term score in ONE projection and ONE
    * (query_id, doc_id) aggregation; each returned frame is
    * column-for-column the single-parameter result (same glog idf, same
    * per-term quantization, same exact long sums, same rank window).
    */
  def bm25TopKMulti(
      postings: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      params: Seq[(Double, Double)],
      stats: Option[DataFrame] = None
  ): Seq[DataFrame] = {
    require(params.nonEmpty, "bm25TopKMulti: need at least one (k1, b) parameterization")
    val qt = queries.select(
      col(queryIdCol).as("query_id"),
      explode(array_distinct(Fns.tokens(col(queryTextCol)))).as("token")
    )
    val qtok = qt.select("token").distinct()
    // with no precomputed stats the postings plan feeds both the stats
    // agg and the candidate prune — pin an inline-built index so its
    // corpus explode runs once (an at-rest index is already a scan)
    val post = if (stats.isEmpty) Materialize(postings) else postings
    val st = stats.getOrElse(indexStats(post))

    // Candidate postings: only the query's tokens survive. df on this
    // set equals the full-index df for those tokens.
    val cand = post.join(broadcast(qtok), Seq("token"))
    val dfT = cand.groupBy("token").agg(count(lit(1)).as("df"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = Dsir.glog(lit(2) * col("n_docs") + lit(2)) -
      Dsir.glog(lit(2) * col("df") + lit(1))
    def termQ(k1: Double, b: Double): Column = {
      val tfNorm = (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl)))
      round(idf * tfNorm * lit(1e9)).cast("long")
    }

    val termCols = params.zipWithIndex.map { case ((k1, b), i) => termQ(k1, b).as(s"_tq$i") }
    val scoredAll = cand
      .join(broadcast(dfT), Seq("token"))
      .crossJoin(broadcast(st))
      .select(col("token") +: col("doc_id") +: termCols: _*)
      .join(broadcast(qt), Seq("token"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        sum(s"_tq0").as("_sq0"),
        params.indices.tail.map(i => sum(s"_tq$i").as(s"_sq$i")): _*
      )
    // several consumers re-read the aggregated grid — pin it (bounded:
    // queries × candidate docs); the single-parameterization path keeps
    // the original no-pin plan
    val grid = if (params.size > 1) Materialize(scoredAll) else scoredAll

    val w = Window.partitionBy("query_id").orderBy(col("score_q").desc, col("doc_id"))
    params.indices.map { i =>
      grid
        .select(col("query_id"), col("doc_id"), col(s"_sq$i").as("score_q"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(
          col("query_id"),
          col("doc_id"),
          col("rank"),
          col("score_q"),
          (col("score_q").cast("double") / lit(1e9)).as("score")
        )
    }
  }

  /** Build and persist the index at `path`: postings under
    * `path/postings` (parquet), stats under `path/stats` — the
    * catalog-free self-contained variant. At real scale use
    * [[writeBm25Index]]: postings bucketed by `token`, so query-time
    * candidate pruning is a bucket-pruned scan.
    */
  def buildIndex(corpus: DataFrame, textCol: String, idCol: String, path: String): Unit = {
    val postings = invertedIndex(corpus, textCol, idCol)
    postings.write.mode("overwrite").parquet(s"$path/postings")
    corpusStats(corpus, textCol).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append NEW documents to an at-rest index. Postings of distinct
    * doc_ids never collide, so the index grows by pure parquet append
    * — no read-modify-write of existing posting lists — and only the
    * 1-row stats table is rebuilt by exact addition. Appended ==
    * rebuilt bit-identically (spec-pinned); the caller owns doc_id
    * uniqueness (same contract as [[Similarity]]'s incremental ANN
    * appends). NOT crash-atomic across the two writes — a crash
    * between the postings append and the stats overwrite leaves stale
    * stats (scores shift slightly; no row is lost); wrap the calls in
    * [[graft.streaming.SketchIngest]]'s marker protocol for
    * exactly-once streaming maintenance.
    */
  def appendToIndex(newDocs: DataFrame, textCol: String, idCol: String, path: String): Unit = {
    val spark = newDocs.sparkSession
    val newPost = invertedIndex(newDocs, textCol, idCol)
    val delta = corpusStats(newDocs, textCol)
    // merge stats BEFORE appending postings so the old stats read can't
    // see the new postings rows (1-row collect; exact long addition)
    val merged = spark.read
      .parquet(s"$path/stats")
      .unionByName(delta)
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      .collect()
    newPost.write.mode("append").parquet(s"$path/postings")
    import spark.implicits._
    merged
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
      .toDF("n_docs", "sum_dl")
      .write
      .mode("overwrite")
      .parquet(s"$path/stats")
  }

  /** Load an at-rest index: (postings, stats). */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/postings"), spark.read.parquet(s"$path/stats"))

  // ---------------------------------------------------------------
  // Bucketed at-rest index — the 100 TB layout the class doc promises:
  // postings bucketed (and sorted) by `token`, so a probe's candidate
  // prune is a BUCKET-PRUNED scan (the IVF `SelectedBucketsCount`
  // discipline) instead of a full postings read, and the only data a
  // query touches is ~numTokens/numBuckets of the index. The path-based
  // [[buildIndex]] family stays as the catalog-free self-contained
  // variant (and the streaming `IndexIngest` store).
  // ---------------------------------------------------------------

  private def statsTable(table: String): String = s"${table}__stats"

  /** Build the bucketed index: postings via
    * [[graft.sinks.Sinks.writeBucketed]] on `token` in `table`, the
    * 1-row stats in a sibling `table__stats`. Stats come from a second
    * NARROW corpus scan ([[corpusStats]]) — cheaper at every scale than
    * pinning the corpus×vocabulary posting rows to share one scan (the
    * soak-measured super-linear term; see [[corpusStats]]).
    */
  def writeBm25Index(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      table: String,
      numBuckets: Int = 64
  ): Unit = {
    graft.sinks.Sinks.writeBucketed(
      invertedIndex(corpus, textCol, idCol), table, Seq("token"), numBuckets)
    corpusStats(corpus, textCol).write.mode("overwrite").saveAsTable(statsTable(table))
  }

  /** Append NEW documents to a bucketed index: same pure-append
    * contract as [[appendToIndex]] (distinct doc_ids never collide;
    * caller owns id uniqueness), but the postings land in their token's
    * bucket ([[graft.sinks.Sinks.appendBucketed]] — bucket count read
    * from the catalog, so a mismatch cannot happen) and probe pruning
    * keeps working across appends. Stats merge by exact addition
    * BEFORE the postings append (same stale-read ordering as
    * [[appendToIndex]]); appended == rebuilt bit-identically
    * (spec-pinned). Compact per-append file sets on the usual
    * [[graft.sinks.Sinks.compactBucketed]] cadence.
    */
  def appendToBm25Index(
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      table: String
  ): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val numBuckets = spark.sessionState.catalog
      .getTableMetadata(graft.sinks.Sinks.parseIdent(spark, table))
      .bucketSpec
      .map(_.numBuckets)
      .getOrElse(
        throw new IllegalArgumentException(s"$table is not a bucketed graft BM25 index")
      )
    val newPost = invertedIndex(newDocs, textCol, idCol)
    val merged = spark
      .table(statsTable(table))
      .unionByName(corpusStats(newDocs, textCol))
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      .collect()
    graft.sinks.Sinks.appendBucketed(newPost, table, Seq("token"), numBuckets)
    merged
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
      .toDF("n_docs", "sum_dl")
      .write
      .mode("overwrite")
      .saveAsTable(statsTable(table))
  }

  /** BM25 top-k over the bucketed index. The query's distinct tokens
    * are collected (bounded by the query text itself — the same
    * driver-safe collect as the IVF probe's cell set) and become an
    * `IN` filter on the bucket column, so the postings scan reads ONLY
    * the buckets holding the query's tokens (`SelectedBucketsCount` in
    * the plan; spec-pinned). Scores are identical to [[bm25TopK]] over
    * the full postings: the prune keeps every posting of a kept token,
    * so tf/df/dl and the exact quantized sums are unchanged.
    */
  def bm25TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    import spark.implicits._
    // heal a compaction crash before the scan (bucketed-index contract)
    graft.sinks.Sinks.recoverBucketedSwap(spark, table)
    val tokens = queries
      .select(explode(array_distinct(Fns.tokens(col(queryTextCol)))).as("token"))
      .distinct()
      .as[String]
      .collect()
      .sorted
    val pruned = spark.table(table).filter(col("token").isin(tokens.toIndexedSeq: _*))
    bm25TopK(pruned, queries, queryIdCol, queryTextCol, k, k1, b,
      stats = Some(spark.table(statsTable(table))))
  }

  /** Reciprocal-rank fusion of multiple retriever rankings — the
    * standard score-free way to combine BM25 with a vector retriever
    * (or several parameterizations of either): each list contributes
    * 1/(kConst + rank) per (query, doc), summed across lists. Rank
    * positions are the only signal, so incomparable score scales fuse
    * without calibration.
    *
    * Inputs are (query_id, doc_id, rank) frames with 1-BASED ranks —
    * [[bm25TopK]] /
    * [[bm25TopKIndexed]] output directly, or any ANN top-k projected to
    * that shape. Each input is already top-k-bounded per query, so the
    * union is k·|lists| rows per query: the fusion aggregate and the
    * per-query rank window are grid-sized, never corpus-sized.
    *
    * Determinism: each contribution is the exact integer
    * `10⁹ div (kConst + rank)` (integral division — no FP anywhere in
    * the accumulation); fused scores are exact long sums; final ranks
    * compare the longs, tie-broken by doc_id. `rrf` is the one
    * readback division.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      kConst: Long = 60L,
      topN: Int = 10
  ): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    // kConst = 0 with a 0-based ranking (common ANN output) makes the
    // first contribution `10^9 div 0` — NULL under non-ANSI semantics,
    // which sum() silently DROPS instead of failing: a quietly wrong
    // fused score. Ranks are documented 1-based; requiring kConst >= 1
    // keeps the divisor positive even if a caller slips in rank 0.
    require(kConst >= 1, s"kConst must be >= 1 (got $kConst); ranks are 1-based")
    val contrib = rankings
      .map(
        _.select(
          col("query_id"),
          col("doc_id"),
          expr(s"1000000000L div (${kConst}L + rank)").as("c_q")
        )
      )
      .reduce(_ unionAll _)
    val fused = contrib
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_lists"), sum(col("c_q")).as("rrf_q"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_q").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(
        col("query_id"),
        col("doc_id"),
        col("rank"),
        col("n_lists"),
        col("rrf_q"),
        (col("rrf_q").cast("double") / lit(1e9)).as("rrf")
      )
  }
}
