package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** First-order Markov-chain model of an event stream: transition counts
  * from consecutive same-user events, and the stationary distribution
  * by a fixed-iteration power method.
  *
  * Scale shape: the ONLY corpus-sized work is the one pass deriving
  * transition pairs (a per-user window — partitioned, never global —
  * then a k² grid aggregate). The k×k count matrix (k = |states|, a
  * handful) collects to the driver and the iteration runs there in
  * microseconds — the same bounded-model discipline as the k-means
  * centroid loop (Cluster) and the DSIR model collect (Dsir).
  *
  * Determinism (bit-identical vs a mirrored SQL oracle): every FP op is
  * pinned. p(i)(j) = n.toDouble / rowSum.toDouble (exact longs in, one
  * IEEE division); x'(j) folds x(i)·p(i)(j) over i in `states` order
  * with left-associated adds (SQL `((a + b) + c)`); x0 = 1.0/k. A state
  * with no outgoing transitions self-loops (p(i)(i) = 1) so mass is
  * conserved without renormalization.
  *
  * Reference behavior: the reference's analytics surface computes event
  * histograms and per-table change rates (see SURVEY.md §2.4); the
  * chain model is the scale-path extension of its consumer-transition
  * reporting.
  */
object Markov {

  /** Consecutive-event transition counts per (from, to) state pair.
    * One partitioned window (user), one grid aggregate.
    */
  def transitionCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String
  ): DataFrame = {
    val seq = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("_next", lead(col(typeCol), 1).over(seq))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Stationary distribution of the chain over an EXPLICIT state list
    * (states absent from the counts get a self-loop row of zero mass).
    * Returns (state, prob, out_transitions) — `prob` after `iters`
    * power-method steps from the uniform vector.
    */
  def stationary(
      spark: SparkSession,
      counts: DataFrame,
      states: Seq[String],
      iters: Int
  ): DataFrame = {
    require(states.nonEmpty && states.distinct == states, "states must be distinct and non-empty")
    val idx = states.zipWithIndex.toMap
    val k = states.size
    // bounded collect: at most k² rows (the grid aggregate upstream)
    val n = Array.fill(k, k)(0L)
    counts
      .select(col("from_type"), col("to_type"), col("n").cast("long"))
      .collect()
      .foreach { r =>
        (idx.get(r.getString(0)), idx.get(r.getString(1))) match {
          case (Some(i), Some(j)) => n(i)(j) = r.getLong(2)
          case _                  => // state outside the declared list: excluded by contract
        }
      }
    val rowSum = n.map(_.sum)
    val p = Array.tabulate(k, k) { (i, j) =>
      if (rowSum(i) == 0L) { if (i == j) 1.0 else 0.0 }
      else n(i)(j).toDouble / rowSum(i).toDouble
    }
    var x = Array.fill(k)(1.0 / k)
    var it = 0
    while (it < iters) {
      // left-associated fold in state order — mirrored by the oracle's
      // ((x0*p0j + x1*p1j) + ...) expression chain
      x = Array.tabulate(k)(j => (0 until k).foldLeft(0.0)((acc, i) => acc + x(i) * p(i)(j)))
      it += 1
    }
    val rows = states.indices.map(i => Row(states(i), x(i), rowSum(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(
        Seq(
          StructField("state", StringType, nullable = false),
          StructField("prob", DoubleType, nullable = false),
          StructField("out_transitions", LongType, nullable = false)
        )
      )
    )
  }
}
