package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once — embarrassingly parallel, zero shuffles besides the
  * final per-query top-k, which TakeOrdered handles with only k rows per
  * partition crossing the wire).
  *
  * Scale path: random-hyperplane LSH bucketing (see
  * [[Dedup.embeddingNearDupPairs]] for the near-dup variant) or IVF:
  * assign each vector to its nearest of C coarse centroids, search only
  * the probed cells. Centroid assignment is a broadcast join; cell lists
  * are bucketed tables at rest.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query vector.
    * Ranking is by (round(cosine,6) desc, id asc) so results are stable
    * and engine-independent at equal similarity.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q
      .crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), Fns.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(round(col("cosine"), 6).desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: cluster the corpus to `nCells` centroids (one pass of
    * deterministic seeded k-means-like assignment: centroids are the
    * first distinct vectors by id — cheap and reproducible; real
    * pipelines would run k-means), then answer queries by searching only
    * the `nProbe` nearest cells.
    *
    * At 100 TB the corpus is written bucketed by cell id; a query touches
    * nProbe/nCells of the data.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val cents = corpus
      .orderBy(col(idCol))
      .limit(nCells)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    // assign: nearest centroid per corpus vector (broadcast centroids)
    val wAssign = Window.partitionBy(col("cid")).orderBy(round(col("cs"), 6).desc, col("cent_id"))
    val assigned = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .crossJoin(broadcast(cents))
      .select(col("cid"), col("cv"), col("cent_id"), Fns.cosine(col("cv"), col("cent_v")).as("cs"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("cid"), col("cv"), col("cent_id"))
    // probe: nProbe nearest cells per query
    val wProbe = Window.partitionBy(col("qid")).orderBy(round(col("cs"), 6).desc, col("cent_id"))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cent_id"), Fns.cosine(col("qv"), col("cent_v")).as("cs"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cent_id"))
    // search only probed cells
    val wTop = Window.partitionBy(col("qid")).orderBy(round(col("cosine"), 6).desc, col("cid"))
    probes
      .join(assigned, "cent_id")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), Fns.cosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }
}
