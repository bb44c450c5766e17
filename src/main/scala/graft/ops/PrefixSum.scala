package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums over a GLOBAL order without a global
  * window — the two-phase scan: bucket the order key by a fixed width,
  * cumsum INSIDE each bucket (a partitioned window, many parallel
  * tasks), collect the per-bucket totals (bounded: (max−min)/width
  * rows), prefix-scan them on the driver, and broadcast the offsets
  * back. `cum(x) = within_bucket_cum(x) + offset(bucket(x))`.
  *
  * This is the pattern the engine's global-window audit points at:
  * `sum(x) OVER (ORDER BY k)` with no PARTITION BY funnels everything
  * through one task; the two-phase form keeps every corpus-sized step
  * parallel and moves only the bucket-total vector (KBs) through the
  * driver — same bounded-model discipline as Markov/Pca/k-means.
  *
  * Exactness: all sums are long additions — associative in any
  * partitioning — so the result is bit-identical to the single-window
  * form the oracle runs.
  */
object PrefixSum {

  /** Append `cum_<v>` columns: the running sum of each of `valueCols`
    * over rows ordered by `orderCol` (must be a unique long per row —
    * a grid key, not a raw event key). `bucketWidth` controls the
    * driver-collected vector: buckets = (max−min)/width.
    */
  def cumsum(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(valueCols.nonEmpty, "need at least one value column")
    val b = floor(col(orderCol).cast("double") / bucketWidth.toDouble).cast("long")
    val withB = df.withColumn("_psb", b)
    val w = Window.partitionBy(col("_psb")).orderBy(col(orderCol))
    val partial = valueCols.foldLeft(withB) { (d, v) =>
      d.withColumn(s"_pc_$v", sum(col(v)).over(w))
    }
    // bounded: one row per bucket; driver prefix-scan in bucket order
    val totals = withB
      .groupBy(col("_psb"))
      .agg(
        sum(col(valueCols.head)).cast("long").as(valueCols.head),
        valueCols.tail.map(v => sum(col(v)).cast("long").as(v)): _*
      )
      .collect()
      .map(r => r.getLong(0) -> valueCols.indices.map(i => r.getLong(i + 1)).toArray)
      .sortBy(_._1)
    val offsets = {
      val acc = Array.fill(valueCols.size)(0L)
      totals.map { case (bucket, t) =>
        val row = bucket +: acc.toIndexedSeq
        valueCols.indices.foreach(i => acc(i) += t(i))
        row
      }
    }
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toIndexedSeq.map(Row.fromSeq), 1),
      StructType(
        StructField("_psb_o", LongType, nullable = false) +:
          valueCols.map(v => StructField(s"_po_$v", LongType, nullable = false))
      )
    )
    val joined = partial.join(broadcast(offDf), col("_psb") === col("_psb_o"))
    val withCums = valueCols.foldLeft(joined) { (d, v) =>
      d.withColumn(s"cum_$v", col(s"_pc_$v") + col(s"_po_$v"))
    }
    withCums.drop(
      ("_psb" +: "_psb_o" +:
        valueCols.map(v => s"_pc_$v")) ++ valueCols.map(v => s"_po_$v"): _*
    )
  }

  /** Two-sample Kolmogorov–Smirnov distance between the distributions
    * of `valueCol` under two row predicates, computed EXACTLY: at each
    * support point, D·n₁·n₂ = |cum₁·n₂ − cum₂·n₁| is an integer; the
    * max over the support is taken before any division. Returns a
    * 1-row frame (ks_num, n1, n2, ks).
    */
  def ksTest(
      df: DataFrame,
      valueCol: String,
      groupA: Column,
      groupB: Column,
      bucketWidth: Long
  ): DataFrame = {
    val grid = df
      .filter(groupA || groupB)
      .groupBy(col(valueCol).cast("long").as("_v"))
      .agg(
        sum(when(groupA, 1L).otherwise(0L)).as("_c1"),
        sum(when(groupB, 1L).otherwise(0L)).as("_c2")
      )
    val cum = cumsum(grid, "_v", Seq("_c1", "_c2"), bucketWidth)
    val totals = grid.agg(sum(col("_c1")).as("n1t"), sum(col("_c2")).as("n2t"))
    cum
      .crossJoin(broadcast(totals))
      .agg(
        max(abs(col("cum__c1") * col("n2t") - col("cum__c2") * col("n1t"))).as("ks_num"),
        max(col("n1t")).as("n1"),
        max(col("n2t")).as("n2")
      )
      .withColumn("ks", col("ks_num").cast("double") / (col("n1") * col("n2")).cast("double"))
  }
}
