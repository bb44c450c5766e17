package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Substring-level exact dedup ([[Dedup.duplicateSpans]] /
  * [[Dedup.removeDuplicateSpans]]): planted-duplicate pins, merge-logic
  * boundaries, a seeded randomized check against an independent
  * in-memory reference, and the linearity plan audit (no pairing stage
  * anywhere — the property that lets the design scale where a global
  * suffix array cannot).
  */
class DuplicateSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val K = 4 // small gram for hand-checkable offsets

  private def spans(docs: Seq[(Long, String)], minCount: Int = 2): Set[(Long, Long, Long)] =
    Dedup
      .duplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id", gramTokens = K, minCount)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)]
      .collect()
      .toSet

  test("a run shared by two docs yields exactly that run's offsets in both") {
    // the shared run is 6 tokens => duplicated grams at positions 0..2
    // of doc 1 (span [0,6)) and positions 2..4 of doc 2 (span [2,8))
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      1L -> s"$shared unique1 unique2 unique3",
      2L -> s"lead1 lead2 $shared tail9"
    )
    assert(spans(docs) === Set((1L, 0L, 6L), (2L, 2L, 8L)))
  }

  test("within-doc repetition alone reaches minCount") {
    val docs = Seq(1L -> "p q r s x1 x2 x3 p q r s", 2L -> "totally different words here now")
    // the 4-token phrase occurs twice in doc 1 => spans [0,4) and [7,11)
    assert(spans(docs) === Set((1L, 0L, 4L), (1L, 7L, 11L)))
  }

  test("merge boundary: gap == gramTokens merges, gap > gramTokens splits") {
    val run = "a1 a2 a3 a4" // duplicated gram at one position per site
    // doc 1: sites at pos 0 and pos K (back-to-back runs) -> one span [0, 2K)
    // doc 2: sites at pos 0 and pos K+1 (one stray token between) -> two spans
    val docs = Seq(
      1L -> s"$run $run",
      2L -> s"$run gapword $run",
      3L -> run // third occurrence so every site clears minCount
    )
    assert(
      spans(docs) === Set(
        (1L, 0L, 8L),
        (2L, 0L, 4L),
        (2L, 5L, 9L),
        (3L, 0L, 4L)
      )
    )
  }

  test("a corpus with no repeated gram yields nothing; short docs are ignored") {
    val docs = Seq(1L -> "one two three four five", 2L -> "six seven eight nine ten", 3L -> "tiny")
    assert(spans(docs).isEmpty)
  }

  test("removeDuplicateSpans cuts exactly the duplicated runs, passes uniques through") {
    val docs = Seq(
      1L -> "alpha beta gamma delta keep1 keep2",
      2L -> "pre alpha beta gamma delta post",
      3L -> "untouched words stay put here"
    )
    val df = docs.toDF("doc_id", "text")
    val sp = Dedup.duplicateSpans(df, "text", "doc_id", gramTokens = K)
    val got = Dedup
      .removeDuplicateSpans(df, sp, "text", "doc_id")
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
    assert(got(1L) === "keep1 keep2")
    assert(got(2L) === "pre post")
    assert(got(3L) === "untouched words stay put here")
  }

  /** Independent reference: same contract, computed with plain Scala
    * collections (map of gram counts -> per-doc position islands).
    */
  private def referenceSpans(
      docs: Seq[(Long, String)],
      k: Int,
      minCount: Int
  ): Set[(Long, Long, Long)] = {
    def toks(s: String): Vector[String] =
      s.toLowerCase.replaceAll("[^a-z0-9]+", " ").split(" ").filter(_.nonEmpty).toVector
    val grams: Seq[(Long, Int, String)] = docs.flatMap { case (id, text) =>
      val w = toks(text)
      if (w.size < k) Seq.empty
      else (0 to w.size - k).map(i => (id, i, w.slice(i, i + k).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    grams
      .filter(g => counts(g._3) >= minCount)
      .groupBy(_._1)
      .flatMap { case (id, gs) =>
        val ps = gs.map(_._2).sorted
        val islands = ps.tail.foldLeft(Vector(Vector(ps.head))) { (acc, p) =>
          if (p - acc.last.last <= k) acc.init :+ (acc.last :+ p) else acc :+ Vector(p)
        }
        islands.map(isl => (id, isl.head.toLong, (isl.last + k).toLong))
      }
      .toSet
  }

  test("seeded randomized corpus matches the in-memory reference exactly") {
    val rnd = new scala.util.Random(65537)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff") // tiny: forces real collisions
    val docs = (1L to 60L).map { id =>
      id -> Vector.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(spans(docs) === referenceSpans(docs, K, 2))
    // and at a higher duplication bar
    val df = docs.toDF("doc_id", "text")
    val got3 = Dedup
      .duplicateSpans(df, "text", "doc_id", gramTokens = K, minCount = 5)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    assert(got3 === referenceSpans(docs, K, 5))
  }

  test("duplicateSpanFraction: every doc reported, disjoint-span coverage, trunc4 fraction") {
    val docs = Seq(
      1L -> "alpha beta gamma delta keep1 keep2", // 6 tokens, span [0,4) -> 4 dup
      2L -> "pre alpha beta gamma delta post", // 6 tokens, span [1,5) -> 4 dup
      3L -> "untouched words stay put here" // no spans
    )
    val got = Dedup
      .duplicateSpanFraction(docs.toDF("doc_id", "text"), "text", "doc_id", gramTokens = K)
      .select("doc_id", "n_tokens", "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((1L, 6L, 4L, 0.6666)))
    assert(got(2L) === ((2L, 6L, 4L, 0.6666)))
    assert(got(3L) === ((3L, 5L, 0L, 0.0)))
    // on the real corpus: one row per doc, fractions in [0,1], sum of
    // span tokens never exceeds the doc's tokens (spans are disjoint)
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val frac = Dedup.duplicateSpanFraction(df, "text", "doc_id", gramTokens = 8)
    assert(frac.count() === df.count())
    import org.apache.spark.sql.functions.{col, max, min}
    val Row(lo: Double, hi: Double, worst: Long) = frac
      .agg(min("dup_frac"), max("dup_frac"),
        max(col("dup_tokens") - col("n_tokens")).as("worst"))
      .head()
    assert(lo >= 0.0 && hi <= 1.0 && worst <= 0L)
  }

  test("hashGrams=true (production) == hashGrams=false (oracle mode) on the real corpus") {
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(h: Boolean) = Dedup
      .duplicateSpans(df, "text", "doc_id", gramTokens = 8, hashGrams = h)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    val hashed = run(true)
    assert(hashed === run(false) && hashed.nonEmpty)
  }

  test("incremental spans against the gram index == offline spans over the union corpus") {
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val b1 = df.filter($"doc_id" % 3 =!= 0) // "history" corpus
    val b2 = df.filter($"doc_id" % 3 === 0) // new batch
    def key(d: org.apache.spark.sql.DataFrame) = d
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet

    Dedup.writeGramIndex(b1, "text", "doc_id", "gram_idx", gramTokens = 8)
    val inc = Dedup.incrementalDuplicateSpans(spark, b2, "gram_idx", "text", "doc_id")
    val offline = Dedup.duplicateSpans(df, "text", "doc_id", gramTokens = 8)
      .join(b2.select($"doc_id"), Seq("doc_id"), "left_semi")
    val got = key(inc)
    assert(got === key(offline) && got.nonEmpty)

    // probe side never shuffles the index: any Exchange in the plan
    // must sit above the batch (gram-position) subtree, not the scan of
    // the bucketed table — assert no exchange consumes the table scan
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount") || !plan.contains("Exchange hashpartitioning(gram"))

    // append the batch (the order contract: probe first, append after),
    // then a THIRD batch must see (b1 ∪ b2) as history — equal to
    // offline over everything, restricted to b3
    Dedup.appendToGramIndex(b2, "text", "doc_id", "gram_idx", gramTokens = 8)
    val b3 = df.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 700000L).as("doc_id"), $"text")
    val inc3 = Dedup.incrementalDuplicateSpans(spark, b3, "gram_idx", "text", "doc_id")
    val offline3 = Dedup.duplicateSpans(
      df.select($"doc_id", $"text").unionByName(b3), "text", "doc_id", gramTokens = 8)
      .join(b3.select($"doc_id"), Seq("doc_id"), "left_semi")
    assert(key(inc3) === key(offline3) && key(inc3).nonEmpty)

    // contract violations fail fast, not silently corrupt
    intercept[IllegalArgumentException] {
      Dedup.appendToGramIndex(b3, "text", "doc_id", "gram_idx", gramTokens = 5)
    }

    // aggregating compaction: folds per-append partial rows to one row
    // per gram and shrinks file fanout, with probes unchanged
    val rowsBefore = spark.table("gram_idx").count()
    val distinctGrams = spark.table("gram_idx").select("gram").distinct().count()
    assert(rowsBefore > distinctGrams, "two appends must leave partial rows to fold")
    val fanoutBefore = graft.sinks.Sinks.bucketFileFanout(spark, "gram_idx")
    Dedup.compactGramIndex(spark, "gram_idx")
    assert(spark.table("gram_idx").count() === distinctGrams)
    assert(graft.sinks.Sinks.bucketFileFanout(spark, "gram_idx") < fanoutBefore)
    val incAfter = Dedup.incrementalDuplicateSpans(spark, b3, "gram_idx", "text", "doc_id")
    assert(key(incAfter) === key(offline3), "compaction changed probe results")
    spark.sql("DROP TABLE gram_idx")
  }

  test("linearity: no pairing stage — the plan joins positions to grams, never docs to docs") {
    val df = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Dedup
      .duplicateSpans(df, "text", "doc_id", gramTokens = 8)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"), "all-pairs stage in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "unkeyed join in plan")
    // output volume is bounded by gram-position volume (each position
    // lands in at most one island row) — spans <= token count
    val nSpans = Dedup.duplicateSpans(df, "text", "doc_id", gramTokens = 8).count()
    val nTokens = df
      .select(org.apache.spark.sql.functions.size(graft.functions.Fns.tokens(
        org.apache.spark.sql.functions.col("text"))).as("n"))
      .agg(org.apache.spark.sql.functions.sum("n"))
      .as[Long]
      .head()
    assert(nSpans <= nTokens)
  }
}
