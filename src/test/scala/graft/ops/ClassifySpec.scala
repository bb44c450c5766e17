package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // two separable vocabularies: "db" docs vs "ml" docs
  private def train = Seq(
    (1L, "query table index join scan table", "db"),
    (2L, "join index table query scan query", "db"),
    (3L, "table scan join index query table", "db"),
    (4L, "model train loss gradient epoch batch", "ml"),
    (5L, "gradient epoch model loss train batch", "ml"),
    (6L, "loss batch gradient train model epoch", "ml")
  ).toDF("doc_id", "text", "label")

  test("nb learns separable vocabularies and classifies held-out docs correctly") {
    val test = Seq(
      (10L, "table join query"),
      (11L, "gradient loss epoch"),
      (12L, "index scan table query join"),
      (13L, "train model batch")
    ).toDF("doc_id", "text")
    val pred = Classify
      .nbTrainPredict(train, test, "text", "doc_id", "label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) === "db" && pred(12L) === "db")
    assert(pred(11L) === "ml" && pred(13L) === "ml")
  }

  test("empty/unseen-vocabulary docs fall back to the prior; ties break by label asc") {
    // priors equal (3 docs each) -> empty doc ties -> "db" (label asc)
    val test = Seq((20L, ""), (21L, "zzz qqq")).toDF("doc_id", "text")
    val out = Classify.nbTrainPredict(train, test, "text", "doc_id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toList.sortBy(_._1)
    // empty doc: zero grams -> equal priors tie -> label asc
    assert(out.head === ((20L, "db", 0L)))
    // out-of-vocabulary doc still classifies (grams counted, all via llq0 fallback)
    assert(out(1)._3 === 3L)
    // skewed priors flip the empty-doc prediction
    val skew = train.unionByName(
      Seq((7L, "model train loss", "ml"), (8L, "epoch batch loss", "ml")).toDF("doc_id", "text", "label"))
    val p = Classify.nbTrainPredict(skew, test.filter($"doc_id" === 20L), "text", "doc_id", "label")
      .collect().head.getString(1)
    assert(p === "ml")
  }

  test("model is ONE addition-mergeable keyed table: two-half fold merge == single fit") {
    val fold = Classify.nbFold("text", "doc_id", "label")
    val h1 = fold(train.filter($"doc_id" <= 3))
    val h2 = fold(train.filter($"doc_id" > 3))
    val merged = h1.unionByName(h2)
      .groupBy("kind", "label", "bucket").agg(sum("n").as("n"))
    val direct = Classify.nbFit(train, "text", "doc_id", "label")
    assert(merged.orderBy("kind", "label", "bucket").collect().toSeq ===
      direct.orderBy("kind", "label", "bucket").collect().toSeq)
    // and the merged model classifies identically
    val test = Seq((10L, "table join query"), (11L, "gradient loss")).toDF("doc_id", "text")
    assert(Classify.nbClassify(test, merged, "text", "doc_id").orderBy("doc_id").collect().toSeq ===
      Classify.nbClassify(test, direct, "text", "doc_id").orderBy("doc_id").collect().toSeq)
  }

  test("scores are exact longs: repartitioned input yields bit-identical scores") {
    val test = Seq((10L, "table join query gradient"), (11L, "loss epoch scan")).toDF("doc_id", "text")
    val a = Classify.nbTrainPredict(train, test, "text", "doc_id", "label")
      .orderBy("doc_id").collect().toSeq
    val b = Classify.nbTrainPredict(train.repartition(7), test.repartition(5), "text", "doc_id", "label")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("streamed model maintenance: ingestCountBatch over nbFold == batch fit; redelivery no-ops") {
    val tmp = java.nio.file.Files.createTempDirectory("nbmodel").toString + "/model"
    val fold = Classify.nbFold("text", "doc_id", "label")
    val keys = Seq("kind", "label", "bucket")
    import graft.streaming.SketchIngest
    assert(SketchIngest.ingestCountBatch(train.filter($"doc_id" <= 3), 0L, fold, keys, tmp))
    assert(SketchIngest.ingestCountBatch(train.filter($"doc_id" > 3), 1L, fold, keys, tmp))
    // redelivered batch is a whole-batch no-op (marker proves it ran)
    assert(!SketchIngest.ingestCountBatch(train.filter($"doc_id" > 3), 1L, fold, keys, tmp))
    val atRest = spark.read.parquet(tmp)
    val direct = Classify.nbFit(train, "text", "doc_id", "label")
    assert(atRest.orderBy("kind", "label", "bucket").collect().toSeq ===
      direct.orderBy("kind", "label", "bucket").collect().toSeq)
    val test = Seq((10L, "table join query"), (11L, "gradient loss")).toDF("doc_id", "text")
    assert(Classify.nbClassify(test, atRest, "text", "doc_id").orderBy("doc_id").collect().toSeq ===
      Classify.nbClassify(test, direct, "text", "doc_id").orderBy("doc_id").collect().toSeq)
  }

  test("plan: the model rides broadcasts; the corpus never joins itself") {
    val test = Seq((10L, "table join query")).toDF("doc_id", "text")
    val model = Classify.nbFit(train, "text", "doc_id", "label")
    val plan = Classify.nbClassify(test, model, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
