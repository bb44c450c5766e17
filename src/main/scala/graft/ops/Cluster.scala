package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over integer feature columns — the
  * clustering step of a cluster-balanced curation pipeline (group the
  * corpus, then sample per cluster; see `Curation`/`Sampling` for the
  * consumers). No reference-repo counterpart: this extends the engine's
  * LLM-pipeline surface (SemDeDup-style curation needs a clusterer).
  *
  * The core is N-dimensional (`featureCols: Seq[String]`); the 2-D
  * (x, y) overloads the driver queries use delegate to it.
  *
  * Why it is bit-exact cross-engine (the property the driver's
  * hash-compare demands, and which stock `ml.KMeans` cannot give):
  *   - features are exact LONGs; every centroid coordinate is
  *     CAST(sum AS DOUBLE) / CAST(count AS DOUBLE) of exact long sums —
  *     order-independent, so shuffle/merge order cannot change it;
  *   - distances are evaluated in one fixed IEEE expression shape
  *     (Σ_d (v_d − c_d)², summed left-to-right in feature order) with
  *     no libm calls;
  *   - assignment ties break to the lowest cluster id via a struct
  *     (dist, cid) min;
  *   - init is the k rows with the smallest id (no RNG).
  *
  * Scale shape (100 TB): each iteration is one map-side assignment
  * against k BROADCAST-LITERAL centroids (no join — the centroids are
  * folded into the expression tree) plus one groupBy producing k rows;
  * partial aggregation makes the shuffle k×dims longs per map task.
  * Driver state is k×(dims+1) doubles per iteration — bounded. The
  * point projection is pinned once, so the iters+1 jobs read
  * materialized blocks instead of re-scanning the source.
  */
object Cluster {

  /** One Lloyd assignment as a pure expression: argmin over the k
    * centroid distances, ties to the lowest cid.
    */
  private def assignExprND(cents: Seq[(Int, Seq[Double])], features: Seq[Column]): Column = {
    val scored = cents.map { case (cid, cs) =>
      val d = features
        .zip(cs)
        .map { case (f, c) =>
          val df = f.cast("double") - lit(c)
          df * df
        }
        .reduce(_ + _) // left-to-right in feature order: fixed IEEE shape
      struct(d.as("d"), lit(cid).as("cid"))
    }
    array_min(array(scored: _*)).getField("cid")
  }

  private def longProjection(points: DataFrame, idCol: String, featureCols: Seq[String]) =
    points.select(col(idCol) +: featureCols.map(c => col(c).cast("long").as(c)): _*)

  /** Trains the centroids alone (init + `iters` Lloyd updates) — the
    * bounded driver-side model behind the assignment entry points and
    * the at-rest [[writeModel]]/[[assignFromModel]] pair.
    */
  def kmeansCentroidsND(
      points: DataFrame,
      idCol: String,
      featureCols: Seq[String],
      k: Int,
      iters: Int
  ): Seq[(Int, Seq[Double])] = {
    require(k >= 1 && iters >= 0, s"need k>=1, iters>=0; got k=$k iters=$iters")
    require(featureCols.nonEmpty, "need at least one feature column")
    // Pinned: init + every iteration re-reads this projection — without
    // the pin each of the iters+1 jobs re-scans the source.
    val p = Materialize(longProjection(points, idCol, featureCols))
    val fCols = featureCols.map(col)
    // Init: the k smallest ids, cid by id order. Bounded collect (k rows).
    val init: Seq[(Int, Seq[Double])] = p
      .orderBy(col(idCol))
      .limit(k)
      .select(fCols.map(_.cast("double")): _*)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, featureCols.indices.map(r.getDouble)) }
      .toSeq
    (1 to iters).foldLeft(init) { (cents, _) =>
      // One job per iteration: assign (map-side) + k-row groupBy.
      val aggs = featureCols.map(c => sum(col(c)).as(s"s_$c")) :+ count(lit(1)).as("cnt")
      val sums = p
        .select(assignExprND(cents, fCols).as("cid") +: fCols: _*)
        .groupBy("cid")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          r.getInt(0) -> ((featureCols.indices.map(i => r.getLong(i + 1)),
            r.getLong(featureCols.size + 1)))
        }
        .toMap
      cents.map { case (cid, cs) =>
        sums.get(cid) match {
          case Some((ss, n)) => (cid, ss.map(_.toDouble / n.toDouble))
          case None          => (cid, cs) // empty cluster: keep centroid
        }
      }
    }
  }

  /** Runs `iters` Lloyd iterations over `featureCols` (all integral)
    * and returns the FINAL assignment, one row per input row:
    * (idCol, features..., cluster). A cluster that goes empty keeps its
    * previous centroid (the SQL oracle coalesces identically).
    */
  def kmeansAssignND(
      points: DataFrame,
      idCol: String,
      featureCols: Seq[String],
      k: Int,
      iters: Int
  ): DataFrame = {
    val finalCents = kmeansCentroidsND(points, idCol, featureCols, k, iters)
    val p = longProjection(points, idCol, featureCols)
    p.withColumn("cluster", assignExprND(finalCents, featureCols.map(col)))
  }

  def kmeansCentroids(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int
  ): Seq[(Int, Double, Double)] =
    kmeansCentroidsND(points, idCol, Seq(xCol, yCol), k, iters)
      .map { case (cid, cs) => (cid, cs(0), cs(1)) }

  def kmeansAssign(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int
  ): DataFrame =
    kmeansAssignND(points, idCol, Seq(xCol, yCol), k, iters)

  /** Persists trained centroids as a k-row parquet model (cid +
    * `c_<feature>` columns) — train once on a sample/snapshot, then
    * [[assignFromModel]] scores any later corpus (or stream
    * micro-batch) map-side without re-training: the same at-rest-model
    * discipline as `Dsir`'s surprisal models and
    * `Sketches.writeSketch`.
    */
  def writeModelND(
      points: DataFrame,
      idCol: String,
      featureCols: Seq[String],
      k: Int,
      iters: Int,
      path: String
  ): Unit = {
    val spark = points.sparkSession
    val cents = kmeansCentroidsND(points, idCol, featureCols, k, iters)
    val rows = cents.map { case (cid, cs) => org.apache.spark.sql.Row.fromSeq(cid +: cs) }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.IntegerType) +:
        featureCols.map(c =>
          org.apache.spark.sql.types.StructField(s"c_$c", org.apache.spark.sql.types.DoubleType))
    )
    spark
      .createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(path)
  }

  def writeModel(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      k: Int,
      iters: Int,
      path: String
  ): Unit = {
    // 2-D legacy layout (cid, cx, cy) — kept stable for existing models
    val spark = points.sparkSession
    import spark.implicits._
    kmeansCentroids(points, idCol, xCol, yCol, k, iters)
      .toDF("cid", "cx", "cy")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Assignment against an at-rest [[writeModelND]] model: reads the
    * k-row centroid table (bounded collect), folds it into the same
    * literal argmin expression as the inline path — the plan is a pure
    * map-side projection, no join, no shuffle. Bit-identical to
    * [[kmeansAssignND]] when the model was written from the same
    * training run (spec-pinned).
    */
  def assignFromModelND(
      points: DataFrame,
      idCol: String,
      featureCols: Seq[String],
      path: String
  ): DataFrame = {
    val cents = points.sparkSession.read
      .parquet(path)
      .select(col("cid") +: featureCols.map(c => col(s"c_$c")): _*)
      .collect()
      .map(r => (r.getInt(0), featureCols.indices.map(i => r.getDouble(i + 1)).toSeq))
      .toSeq
      .sortBy(_._1)
    require(cents.nonEmpty, s"empty k-means model at $path")
    val p = longProjection(points, idCol, featureCols)
    p.withColumn("cluster", assignExprND(cents, featureCols.map(col)))
  }

  /** 2-D form over the legacy (cid, cx, cy) model layout. */
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
      .map(r => (r.getInt(0), Seq(r.getDouble(1), r.getDouble(2))))
      .toSeq
      .sortBy(_._1)
    require(cents.nonEmpty, s"empty k-means model at $path")
    val p = longProjection(points, idCol, Seq(xCol, yCol))
    p.withColumn("cluster", assignExprND(cents, Seq(col(xCol), col(yCol))))
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
