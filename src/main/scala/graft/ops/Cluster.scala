package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over integer feature columns — the
  * clustering step of a cluster-balanced curation pipeline (group the
  * corpus, then sample per cluster; see `Curation`/`Sampling` for the
  * consumers). No reference-repo counterpart: this extends the engine's
  * LLM-pipeline surface (SemDeDup-style curation needs a clusterer).
  *
  * Why it is bit-exact cross-engine (the property the driver's
  * hash-compare demands, and which stock `ml.KMeans` cannot give):
  *   - features are exact LONGs; every centroid is
  *     CAST(sum AS DOUBLE) / CAST(count AS DOUBLE) of exact long sums —
  *     order-independent, so shuffle/merge order cannot change it;
  *   - distances are evaluated in one fixed IEEE expression shape
  *     ((x−cx)² + (y−cy)²) with no libm calls;
  *   - assignment ties break to the lowest cluster id via a struct
  *     (dist, cid) min;
  *   - init is the k rows with the smallest id (no RNG).
  *
  * Scale shape (100 TB): each iteration is one map-side assignment
  * against k BROADCAST-LITERAL centroids (no join — the centroids are
  * folded into the expression tree) plus one groupBy producing k rows;
  * partial aggregation makes the shuffle k×cols longs per map task.
  * Driver state is k (cid, cx, cy) triples per iteration — bounded.
  */
object Cluster {

  /** One Lloyd assignment as a pure expression: argmin over the k
    * centroid distances, ties to the lowest cid.
    */
  private def assignExpr(cents: Seq[(Int, Double, Double)], x: Column, y: Column): Column = {
    val scored = cents.map { case (cid, cx, cy) =>
      val dx = x.cast("double") - lit(cx)
      val dy = y.cast("double") - lit(cy)
      struct((dx * dx + dy * dy).as("d"), lit(cid).as("cid"))
    }
    array_min(array(scored: _*)).getField("cid")
  }

  /** Runs `iters` Lloyd iterations of k-means on (`xCol`, `yCol`)
    * (both integral) and returns the FINAL assignment, one row per
    * input row: (idCol, xCol, yCol, cluster).
    *
    * A cluster that goes empty keeps its previous centroid (both this
    * and the SQL oracle coalesce to the prior round's value).
    */
  /** Trains the centroids alone (init + `iters` Lloyd updates) — the
    * bounded driver-side model behind [[kmeansAssign]] and the at-rest
    * [[writeModel]]/[[assignFromModel]] pair.
    */
  def kmeansCentroids(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int
  ): Seq[(Int, Double, Double)] = {
    require(k >= 1 && iters >= 0, s"need k>=1, iters>=0; got k=$k iters=$iters")
    // Pinned: init + every iteration re-reads this projection — without
    // the pin each of the iters+1 jobs re-scans the source.
    val p = Materialize(
      points.select(col(idCol), col(xCol).cast("long").as(xCol), col(yCol).cast("long").as(yCol)),
      eager = false
    )
    // Init: the k smallest ids, cid by id order. Bounded collect (k rows).
    val init: Seq[(Int, Double, Double)] = p
      .orderBy(col(idCol))
      .limit(k)
      .select(col(xCol).cast("double"), col(yCol).cast("double"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getDouble(0), r.getDouble(1)) }
      .toSeq
    (1 to iters).foldLeft(init) { (cents, _) =>
      // One job per iteration: assign (map-side) + k-row groupBy.
      val sums = p
        .select(assignExpr(cents, col(xCol), col(yCol)).as("cid"), col(xCol), col(yCol))
        .groupBy("cid")
        .agg(sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      cents.map { case (cid, cx, cy) =>
        sums.get(cid) match {
          case Some((sx, sy, n)) => (cid, sx.toDouble / n.toDouble, sy.toDouble / n.toDouble)
          case None              => (cid, cx, cy) // empty cluster: keep centroid
        }
      }
    }
  }

  def kmeansAssign(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int
  ): DataFrame = {
    val finalCents = kmeansCentroids(points, idCol, xCol, yCol, k, iters)
    val p = points.select(col(idCol), col(xCol).cast("long").as(xCol), col(yCol).cast("long").as(yCol))
    p.withColumn("cluster", assignExpr(finalCents, col(xCol), col(yCol)))
  }

  /** Persists trained centroids as a k-row parquet model — train once
    * on a sample/snapshot, then [[assignFromModel]] scores any later
    * corpus (or stream micro-batch) map-side without re-training: the
    * same at-rest-model discipline as `Dsir`'s surprisal models and
    * `Sketches.writeSketch`.
    */
  def writeModel(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int,
      path: String
  ): Unit = {
    val spark = points.sparkSession
    import spark.implicits._
    kmeansCentroids(points, idCol, xCol, yCol, k, iters)
      .toDF("cid", "cx", "cy")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Assignment against an at-rest model: reads the k-row centroid
    * table (bounded collect), folds it into the same literal argmin
    * expression as the inline path — the plan is a pure map-side
    * projection, no join, no shuffle. Bit-identical to
    * [[kmeansAssign]] when the model was written from the same
    * training run (spec-pinned).
    */
  def assignFromModel(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      path: String
  ): DataFrame = {
    val cents = points.sparkSession.read
      .parquet(path)
      .select(col("cid"), col("cx"), col("cy"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
      .sortBy(_._1)
    require(cents.nonEmpty, s"empty k-means model at $path")
    val p = points.select(col(idCol), col(xCol).cast("long").as(xCol), col(yCol).cast("long").as(yCol))
    p.withColumn("cluster", assignExpr(cents, col(xCol), col(yCol)))
  }

  /** Cluster-balanced corpus sample: run [[kmeansAssign]], then keep
    * the `perCluster` rows with the smallest seeded-md5 key inside each
    * cluster — the "sample evenly across content clusters" step a
    * curation pipeline uses so one dominant mode can't crowd out the
    * mixture (the same motivation as SemDeDup's cluster pruning, but
    * for selection rather than dedup). Fully deterministic: md5 keys,
    * ties broken by id.
    *
    * Shape: one row_number window partitioned by cluster. With small k
    * that is k reducers; for huge corpora push `perCluster` selection
    * through a two-phase top-N (per-partition local top-N first — the
    * same trick `Analytics.topKPerGroup` documents) before the final
    * per-cluster merge.
    */
  def clusterBalancedSample(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int,
      perCluster: Int,
      seed: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = kmeansAssign(points, idCol, xCol, yCol, k, iters)
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col("cluster")).orderBy(key, col(idCol))
    assigned
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perCluster)
      .select(col("cluster").cast("long").as("cluster"), col(idCol), col(xCol), col(yCol))
  }

  /** Cluster profile after `iters` iterations: (cluster, n, sum_x,
    * sum_y) — all exact longs, the hash-exact oracle surface.
    */
  def kmeansProfile(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int
  ): DataFrame =
    kmeansAssign(points, idCol, xCol, yCol, k, iters)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(xCol)).as("sum_x"),
        sum(col(yCol)).as("sum_y")
      )
}
