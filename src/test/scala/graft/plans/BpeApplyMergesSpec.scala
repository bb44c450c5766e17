package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.ops.Bpe

/** The native merge-apply expression: bit-parity with the composed
  * per-merge fold (the executable spec), production merge counts the
  * fold cannot reach, the non-well-formed fallback, degenerate inputs,
  * and codegen fusion.
  */
class BpeApplyMergesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** Independent plain-Scala sequential reference: one left-to-right
    * non-overlapping pass per merge, in rank order — no shared code
    * with either Spark form.
    */
  private def refApply(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def charSyms(c: org.apache.spark.sql.Column) =
    filter(split(c, ""), s => s =!= "")

  private def nativeOn(words: Seq[String], merges: Seq[(String, String)]): Map[String, Seq[String]] =
    words.toDF("w")
      .select($"w", Bpe.applyMergesNative(charSyms($"w"), merges).as("bpe"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  private def composedOn(words: Seq[String], merges: Seq[(String, String)]): Map[String, Seq[String]] =
    words.toDF("w")
      .select($"w", Bpe.applyMerges(charSyms($"w"), merges).as("bpe"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  private val corpus = Seq(
    (1L, ("low " * 5).trim + " " + ("lower " * 2).trim),
    (2L, ("newest " * 6).trim),
    (3L, ("widest " * 3).trim),
    (4L, "the quick brown fox jumps over the lazy dog 42 times"),
    (5L, "aaa aaaa abab ababab banana bandana")
  ).toDF("doc_id", "text")

  test("bit-parity with the composed fold on fit-produced merges") {
    val words = Seq("lowest", "newest", "widest", "low", "lower", "banana",
      "aaa", "ababab", "zzz", "a", "")
    // n caps at 12: each nested mergeAdjacent embeds its child column
    // TWICE (seed + fold input), so the composed tree is ~2^n nodes —
    // the very scaling wall the native expression removes
    for (n <- Seq(0, 1, 8, 12)) {
      val merges = Bpe.fitMerges(corpus, "text", n)
      assert(nativeOn(words, merges) === composedOn(words, merges), s"nMerges=$n")
    }
  }

  test("256 and 1024 merges: parity with the sequential reference (fold can't go there)") {
    // well-formed synthetic lists at scale: (a) a long derivation chain
    // aa, aaa, aaaa... (each output feeds the next), (b) all 2-char
    // bigrams of a small alphabet ranked lexicographically
    val chain = (1 until 300).map(i => ("a" * i, "a")) // rank k merges a^k + a
    val alpha = "abcdefgh"
    val bigrams = (for (x <- alpha; y <- alpha) yield (x.toString, y.toString)).toSeq
    val big = (chain ++ bigrams).take(1024)
    val words = Seq("a" * 50, "a" * 7 + "b", "abcdefgh" * 4, "hgfedcba" * 3,
      "aabbccdd", "banana")
    for (n <- Seq(256, 1024)) {
      val merges = big.take(n)
      val got = nativeOn(words, merges)
      for (w <- words)
        assert(got(w) === refApply(w, merges), s"word=$w nMerges=$n")
    }
  }

  test("non-well-formed lists fall back to exact sequential semantics") {
    // rank 0 references a symbol only rank 1 creates: sequential applies
    // rank 0 as a no-op (no "xy" exists yet) then rank 1 — the min-rank
    // shortcut would WRONGLY merge c+xy afterwards
    val tricky = Seq(("c", "xy"), ("x", "y"))
    assert(nativeOn(Seq("cxy"), tricky)("cxy") === Seq("c", "xy"))
    assert(nativeOn(Seq("cxy"), tricky) === composedOn(Seq("cxy"), tricky))
    // duplicate pair whose output is an earlier merge's component
    // (invariant 3): parity must hold through the fallback
    val dup = Seq(("a", "b"), ("ab", "y"), ("a", "b"))
    val words = Seq("abab", "ababy", "aabby", "abyab")
    assert(nativeOn(words, dup) === composedOn(words, dup))
  }

  test("degenerate inputs match the fold: aaa, nulls, empty array, null input") {
    val merges = Seq(("a", "a"))
    // left-to-right non-overlapping
    assert(nativeOn(Seq("aaa"), merges)("aaa") === Seq("aa", "a"))
    // null ELEMENTS pass through unmerged; null INPUT null-propagates;
    // empty arrays stay empty
    val df = Seq(
      (1L, Some(Seq(Some("a"), None, Some("a")))),
      (2L, Some(Seq.empty[Option[String]])),
      (3L, None: Option[Seq[Option[String]]])
    ).toDF("id", "syms")
    val got = df
      .select($"id", Bpe.applyMergesNative($"syms", merges).as("bpe"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).get.asInstanceOf[scala.collection.Seq[_]] === Seq("a", null, "a"))
    assert(got(2L).get.asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(got(3L).isEmpty)
    // composed form agrees on the null-element row
    val comp = df.filter($"id" === 1L)
      .select(Bpe.applyMerges($"syms", merges).as("bpe"))
      .collect().head.getSeq[String](0)
    assert(comp === Seq("a", null, "a"))
  }

  test("empty merge symbols are rejected at construction") {
    val e = intercept[IllegalArgumentException] {
      Bpe.applyMergesNative(charSyms(lit("ab")), Seq(("a", "")))
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("native codegen: the apply project stays inside WholeStageCodegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val merges = (for (x <- "abcde"; y <- "abcde") yield (x.toString, y.toString)).toSeq
    // the child must not be a HOF (transform/filter are themselves
    // CodegenFallback): split() alone is codegen-able
    val df = docs.select(Bpe.applyMergesNative(split(col("text"), ""), merges).as("bpe"))
    val fused = df.queryExecution.executedPlan
      .collect { case w: WholeStageCodegenExec => w }
      .exists(_.toString.contains("Project"))
    assert(fused, "bpe_apply_merges project fell out of WholeStageCodegen")
    assert(df.count() > 0)
  }
}
