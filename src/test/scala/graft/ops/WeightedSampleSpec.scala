package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("weighted sample is deterministic per seed and partitioning-invariant") {
    val df = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "w", "id", 20, "s1").collect().toSeq
    val b = Sampling.weightedSample(df.repartition(11), "w", "id", 20, "s1").collect().toSeq
    assert(a === b)
    val c = Sampling.weightedSample(df, "w", "id", 20, "s2").select("id").as[Long].collect().toSet
    assert(a.map(_.getLong(0)).toSet !== c) // different seed, different draw
  }

  test("no replacement; k caps at the population; keys are positive and sorted") {
    val df = (1L to 30L).map(i => (i, 1.0)).toDF("id", "w")
    val s = Sampling.weightedSample(df, "w", "id", 50, "s")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(s.length === 30)
    assert(s.map(_._1).distinct.length === 30)
    assert(s.forall(_._2 > 0.0))
    assert(s.map(_._2).toSeq === s.map(_._2).sorted.toSeq)
  }

  test("inclusion tracks weight: 10x-weighted rows are sampled far more often across seeds") {
    // 40 rows: 20 light (w=1), 20 heavy (w=10); draw k=8 across 60 seeds
    val df = (1L to 40L).map(i => (i, if (i <= 20) 1.0 else 10.0)).toDF("id", "w")
    var light = 0; var heavy = 0
    for (seed <- 1 to 60) {
      val ids = Sampling.weightedSample(df, "w", "id", 8, s"seed$seed")
        .select("id").as[Long].collect()
      light += ids.count(_ <= 20)
      heavy += ids.count(_ > 20)
    }
    // E-S with 10:1 weights at k=8 of 40: heavy dominates strongly
    assert(heavy > light * 3, s"heavy=$heavy light=$light")
    assert(light > 0) // but light rows are not excluded outright
  }
}
