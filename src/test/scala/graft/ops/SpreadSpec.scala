package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** [[Spread.byKey]] — the r19 scale-adaptive input spread behind the
  * heavy map stages: fires (to defaultParallelism, deterministic hash
  * routing) only when the input's physical partition count is under
  * half the executor slots; identity otherwise. Row multiset is always
  * preserved — the helper may only change placement.
  */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("byKey spreads an under-partitioned frame to default parallelism") {
    val one = spark.range(0, 1000).coalesce(1).select($"id")
    assert(one.rdd.getNumPartitions === 1)
    val spread = Spread.byKey(one, col("id"))
    assert(spread.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(spread.as[Long].collect().sorted.toSeq === (0L until 1000L))
  }

  test("byKey is the identity on a well-partitioned frame (no added exchange)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).repartition(target, $"id").toDF()
    val out = Spread.byKey(wide, col("id"))
    assert(out eq wide, "at >= half the slots the input must pass through untouched")
  }

  test("byKey routing is deterministic: two spreads of the same frame co-partition") {
    val df = spark.range(0, 500).coalesce(1).select($"id")
    val a = Spread.byKey(df, col("id")).withColumn("p", spark_partition_id())
    val b = Spread.byKey(df, col("id")).withColumn("p", spark_partition_id())
    val pa = a.select("id", "p").as[(Long, Int)].collect().toMap
    val pb = b.select("id", "p").as[(Long, Int)].collect().toMap
    assert(pa === pb, "hash-of-key routing must not vary run to run")
  }
}
