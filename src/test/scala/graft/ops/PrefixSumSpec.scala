package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("two-phase cumsum == single global window, with gaps, negatives and many buckets") {
    // sparse keys spanning negative and positive ranges; values vary
    val rows = (-57 to 211 by 3).map(k => (k.toLong, (k * 7919 % 23 + 30).toLong))
    val df = rows.toDF("k", "v").repartition(7)
    val got = PrefixSum
      .cumsum(df, "k", Seq("v"), bucketWidth = 16L)
      .select("k", "cum_v")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val want = df
      .withColumn("cum_v", sum(col("v")).over(Window.orderBy(col("k"))))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    assert(got === want)
  }

  test("multi-measure cumsum carries each column independently") {
    val df = Seq((1L, 10L, 1L), (2L, 20L, 2L), (5L, 5L, 3L), (9L, 1L, 4L))
      .toDF("k", "a", "b")
    val out = PrefixSum
      .cumsum(df, "k", Seq("a", "b"), bucketWidth = 4L)
      .orderBy("k")
      .select("cum_a", "cum_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((10L, 1L), (30L, 3L), (35L, 6L), (36L, 10L)))
  }

  test("KS: identical distributions -> 0; disjoint supports -> 1") {
    val same = (1 to 100).flatMap(i => Seq(("a", (i % 10).toLong), ("b", (i % 10).toLong)))
    val ks0 = PrefixSum
      .ksTest(same.toDF("g", "v"), "v", col("g") === "a", col("g") === "b", 4L)
      .head()
    assert(ks0.getAs[Long]("ks_num") === 0L)
    assert(ks0.getAs[Double]("ks") === 0.0)
    val disjoint = (1 to 50).map(i => ("a", i.toLong)) ++ (1 to 50).map(i => ("b", 1000L + i))
    val ks1 = PrefixSum
      .ksTest(disjoint.toDF("g", "v"), "v", col("g") === "a", col("g") === "b", 64L)
      .head()
    assert(ks1.getAs[Double]("ks") === 1.0)
  }
}
