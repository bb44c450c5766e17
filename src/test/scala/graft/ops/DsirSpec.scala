package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Pins for DSIR importance resampling ([[Dsir]]): the deterministic
  * glog's accuracy envelope (the cross-engine BIT-equality half is
  * enforced by the q79 DuckDB oracle), weight directionality (target-
  * like docs outscore off-target docs), exact-sum determinism under
  * repartitioning, and the model-table boundedness that makes the
  * operator a broadcast join at 100 TB.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("glog matches Math.log within 2e-15 over a wide integer range") {
    val xs = (Seq(1L, 2L, 3L, 7L, 100L, 4095L, 4096L, 65537L, 999983L, 3000000L) ++
      (1 to 2000).map(i => (i * 104729L) % 2999999L + 1L)).distinct
    val got = xs
      .toDF("x")
      .select(col("x"), Dsir.glog(col("x")).as("g"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    got.foreach { case (x, g) =>
      assert(math.abs(g - math.log(x.toDouble)) <= 2e-15, s"glog($x)=$g")
    }
  }

  test("target-like documents get higher weights than off-target ones") {
    val target = (1 to 40).map(i => (100L + i, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val raw = ((1 to 10).map(i => (i.toLong, "the quick brown fox jumps high")) ++
      (11 to 20).map(i => (i.toLong, "der schnelle braune fuchs springt hoch"))).toDF("doc_id", "text")
    val w = Dsir
      .importanceWeights(raw, target, "text", "doc_id", nBuckets = 1024)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_q"))
      .toMap
    val enScore = w(1L)
    val deScore = w(11L)
    assert(enScore > deScore, s"en=$enScore de=$deScore")
    // identical docs score identically (exact long arithmetic)
    assert((1 to 10).map(i => w(i.toLong)).distinct.size === 1)
  }

  test("weights are invariant to partitioning (exact long sums)") {
    val docs = (1 to 200)
      .map(i => (i.toLong, s"alpha beta gamma delta token$i epsilon zeta"))
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 50)
    val a = Dsir
      .importanceWeights(docs.repartition(1), target, "text", "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_q"))
      .toMap
    val b = Dsir
      .importanceWeights(docs.repartition(17, col("doc_id")), target.repartition(5), "text", "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_q"))
      .toMap
    assert(a === b)
  }

  test("importanceWeightsWithin == importanceWeights on the filtered subset") {
    val docs = ((1 to 60).map(i => (i.toLong, s"alpha beta doc$i gamma", i <= 20)) ++
      Seq((61L, "", false))).toDF("doc_id", "text", "good")
    val a = Dsir
      .importanceWeightsWithin(docs, col("good"), "text", "doc_id", nBuckets = 512)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"), r.getAs[Long]("logw_q"))))
      .toMap
    val b = Dsir
      .importanceWeights(docs, docs.filter(col("good")), "text", "doc_id", nBuckets = 512)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"), r.getAs[Long]("logw_q"))))
      .toMap
    assert(a === b)
    assert(!a.contains(61L)) // empty doc produces no grams, no row
  }

  test("bigramSurprisal: formulaic docs score lower than token salad; exact-sum determinism") {
    val common = (1 to 50).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val salad = Seq((99L, "zxqv wfjp klmn qrtb yhgd xcvb"))
    val one = Seq((100L, "single")) // 1 token -> no bigrams -> no row
    val docs = (common ++ salad ++ one).toDF("doc_id", "text")
    val got = Dsir
      .bigramSurprisal(docs, "text", "doc_id", nBuckets = 2048)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_q"), r.getAs[Double]("avg_nll"))))
      .toMap
    assert(!got.contains(100L))
    assert(got(1L)._1 === 8L) // 9 tokens -> 8 bigrams
    assert(got(99L)._3 > got(1L)._3, s"salad=${got(99L)._3} common=${got(1L)._3}")
    // identical docs identical scores; repartitioned input identical too
    assert(got(2L) === got(1L))
    val re = Dsir
      .bigramSurprisal(docs.repartition(13, col("doc_id")), "text", "doc_id", nBuckets = 2048)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nll_q"))
      .toMap
    assert(re === got.view.mapValues(_._2).toMap)
  }

  test("at-rest models: streamed count ingest == batch model; scoring from models == direct") {
    val tmpDir = java.nio.file.Files.createTempDirectory("dsirmodel").toString
    val raw = (1 to 80).map(i => (i.toLong, s"common words here plus token$i")).toDF("doc_id", "text")
    val tgt = (1 to 25).map(i => (i.toLong, "common words here quality")).toDF("doc_id", "text")
    val nB = 512
    val fold = Dsir.modelFold("text", "doc_id", nB)

    // stream the raw model in two batches through the generic count ingest
    val rawPath = s"$tmpDir/raw_model"
    import graft.streaming.SketchIngest
    assert(SketchIngest.ingestCountBatch(raw.filter(col("doc_id") <= 40), 0L, fold, Seq("bucket"), rawPath))
    assert(SketchIngest.ingestCountBatch(raw.filter(col("doc_id") > 40), 1L, fold, Seq("bucket"), rawPath))
    val streamedModel = spark.read.parquet(rawPath)
    val batchModel = fold(raw)
    assert(
      streamedModel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
        batchModel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    )

    val direct = Dsir
      .importanceWeights(raw, tgt, "text", "doc_id", nBuckets = nB)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"), r.getAs[Long]("logw_q"))))
      .toMap
    val fromModels = Dsir
      .importanceWeightsFromModels(raw, streamedModel, fold(tgt), "text", "doc_id", nBuckets = nB)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"), r.getAs[Long]("logw_q"))))
      .toMap
    assert(fromModels === direct)

    // scoring OUT-OF-CORPUS docs with unseen vocabulary: every gram
    // still counts (prior fallback), no silently dropped rows
    val newDocs = Seq((900L, "zzqx wvnm entirely unseen tokens")).toDF("doc_id", "text")
    val scored = Dsir
      .importanceWeightsFromModels(newDocs, streamedModel, fold(tgt), "text", "doc_id", nBuckets = nB)
      .collect()
    assert(scored.length === 1)
    assert(scored(0).getAs[Long]("n_grams") === 9L) // 5 unigrams + 4 bigrams
  }

  test("surprisal-from-models == self-fit bigramSurprisal; streaming folds; unseen prior") {
    val docs = ((1 to 40).map(i => (i.toLong, "the quick brown fox jumps high today")) ++
      (41 to 50).map(i => (i.toLong, s"variant doc number v$i with extra words"))).toDF("doc_id", "text")
    val nB = 1024
    val ctx = Dsir.surprisalCtxFold("text", "doc_id", nB)(docs)
    val big = Dsir.surprisalBigFold("text", "doc_id", nB)(docs)

    val self = Dsir
      .bigramSurprisal(docs, "text", "doc_id", nBuckets = nB)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_q"))))
      .toMap
    val fromModels = Dsir
      .bigramSurprisalFromModels(docs, ctx, big, "text", "doc_id", nBuckets = nB)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_q"))))
      .toMap
    assert(fromModels === self)

    // streamed two-batch model == batch fold (generic count ingest)
    val tmp = java.nio.file.Files.createTempDirectory("surpmodel").toString
    import graft.streaming.SketchIngest
    val fold = Dsir.surprisalCtxFold("text", "doc_id", nB)
    assert(SketchIngest.ingestCountBatch(docs.filter(col("doc_id") <= 25), 0L, fold, Seq("bucket"), s"$tmp/ctx"))
    assert(SketchIngest.ingestCountBatch(docs.filter(col("doc_id") > 25), 1L, fold, Seq("bucket"), s"$tmp/ctx"))
    val streamed = spark.read.parquet(s"$tmp/ctx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === ctx.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

    // a doc with vocabulary entirely unseen by the model: every bigram
    // takes the smoothed prior -ln p = ln(B) (ctx prior) - 0
    val alien = Seq((900L, "qqxz wwvy rrtu ppos")).toDF("doc_id", "text")
    val scored = Dsir
      .bigramSurprisalFromModels(alien, ctx, big, "text", "doc_id", nBuckets = nB)
      .collect()
    assert(scored.length === 1)
    assert(scored(0).getAs[Long]("n_bigrams") === 3L)
    assert(math.abs(scored(0).getAs[Double]("avg_nll") - math.log(nB.toDouble)) < 1e-6)
  }

  test("glogD driver twin is bit-identical to the glog column") {
    val xs = Seq(1L, 2L, 1024L, 4096L, 65537L, 999983L, 2999999L)
    val colVals = xs.toDF("x").select(Dsir.glog(col("x"))).as[Double].collect()
    xs.zip(colVals).foreach { case (x, g) =>
      assert(java.lang.Double.doubleToRawLongBits(Dsir.glogD(x)) ===
        java.lang.Double.doubleToRawLongBits(g), s"x=$x")
    }
  }

  test("model table is bounded by nBuckets and joined via broadcast") {
    val docs = (1 to 300).map(i => (i.toLong, s"word$i filler common tokens here")).toDF("doc_id", "text")
    val lr = Dsir.bucketLogRatios(docs, docs.limit(30), "text", "doc_id", nBuckets = 64, scale = 1000000000L)
    assert(lr.count() <= 64)
    val plan = Dsir
      .importanceWeights(docs, docs.limit(30), "text", "doc_id", nBuckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("positionBuckets views reproduce gramBuckets and bigramPairBuckets exactly") {
    // includes the edge shapes: empty text, single token, two tokens
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""),
      (3L, "one"),
      (4L, "two tokens"),
      (5L, "a b a b a repeated structure a b a")
    ).toDF("doc_id", "text")
    val pos = Dsir.positionBuckets(docs, "text", "doc_id", 512)

    def multiset(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("doc_id", "bucket").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(
      multiset(Dsir.gramsFromPositions(pos)) ===
        multiset(Dsir.gramBuckets(docs, "text", "doc_id", 512))
    )

    def pairset(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("doc_id", "cb", "bb").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(
      pairset(Dsir.pairsFromPositions(pos)) ===
        pairset(Dsir.bigramPairBuckets(docs, "text", "doc_id", 512))
    )
    // and the composed scorers agree bit-for-bit with the text forms
    val viaPairs = Dsir.bigramSurprisalFromPairs(Dsir.pairsFromPositions(pos), 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Dsir.bigramSurprisal(docs, "text", "doc_id", 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaPairs === direct)
  }
}
