package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive input spreading for compute-heavy map stages (guide
  * §2.5 "input skew": one huge unsplittable file — or, the local-bench
  * twin, ONE tiny parquet file whose single row group cannot be split —
  * leaves a scan at a handful of tasks, so per-row-expensive projections
  * (PNG encode/decode, per-gram md5, tokenize+shingle folds) run nearly
  * serial while the rest of the machine idles).
  *
  * `byKey(df, key)` hash-repartitions to `defaultParallelism` ONLY when
  * the physical scan is under half the executor slots — the gate, not a
  * constant: at 100 TB a scan has orders of magnitude more partitions
  * than cores and this is a no-op (no shuffle is ever added to a
  * well-partitioned input), while a small corpus on a big machine pays
  * one tiny shuffle of its (pre-explode, pre-decode) rows to unlock a
  * cores-wide map stage. The key keeps the routing DETERMINISTIC
  * (hash-of-column, not round-robin — guide §2.5's retry-safety note);
  * results of every caller are row-order-independent aggregations, so
  * placement cannot change any output.
  */
object Spread {

  /** Hash-spread `df` by `key` to the default parallelism when its scan
    * has fewer than half that many partitions; identity otherwise.
    */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical partition count of the frame as planned (cheap at this
    // size; the caller sites sit directly over a scan or tiny projection)
    val have = df.rdd.getNumPartitions
    if (have * 2 > target) df else df.repartition(target, key)
  }
}
