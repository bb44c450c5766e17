package graft.ops

import org.apache.spark.sql.functions.size
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** Independent sequential BPE reference (textbook algorithm) with the
    * same tie-break (count desc, left asc, right asc).
    */
  private def referenceFit(
      wordFreq: Map[String, Long],
      nMerges: Int,
      minCount: Long = 2L
  ): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => w.toVector.map(_.toString) -> f }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val (pair, cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minCount) done = true
        else {
          merges += pair
          vocab = vocab.groupMapReduce { case (syms, _) => mergeSeq(syms, pair) }(_._2)(_ + _)
        }
      }
      i += 1
    }
    merges.result()
  }

  private def mergeSeq(syms: Vector[String], p: (String, String)): Vector[String] = {
    var acc = Vector.empty[String]
    syms.foreach { e =>
      if (acc.nonEmpty && acc.last == p._1 && e == p._2)
        acc = acc.init :+ (p._1 + p._2)
      else acc = acc :+ e
    }
    acc
  }

  // the Sennrich textbook corpus: es/est merges come first
  private def corpus = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)
  ).toDF("doc_id", "text")

  test("fitMerges matches the sequential reference and the textbook first merges") {
    val got = Bpe.fitMerges(corpus, "text", nMerges = 8)
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(got === referenceFit(wf, 8))
    // es (9) ties st (9) -> lex; then (es, t) at 9
    assert(got.take(2) === Seq(("e", "s"), ("es", "t")))
  }

  test("tokenize: BPE tokens concatenate back to the original words; merges actually apply") {
    // 3 merges: (e,s), (es,t), (l,o) — "est" survives as a token
    // (deeper fits absorb it: by merge 6 "newest" segments [n, ewest])
    val merges = Bpe.fitMerges(corpus, "text", nMerges = 3)
    val toks = Bpe.tokenize(corpus, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // reconstruction: concatenated tokens == concatenated words
    for ((id, t) <- toks) {
      val words = corpus.filter($"doc_id" === id).collect().head.getString(1).split(" ")
      assert(t.mkString("") === words.mkString(""))
    }
    // "newest" must contain the merged "est" (es+t) as one token
    assert(toks(3L).contains("est"))
  }

  test("tokenCounts (vocab-joined) == size of tokenize per doc, zero-word and null docs keep 0") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
      .unionByName(Seq(
        (999999L, Some("!!! ???")),        // no [a-z0-9] tokens
        (999998L, Option.empty[String])    // NULL text — must count 0, not null/-1
      ).toDF("doc_id", "text"))
    val merges = Bpe.fitMerges(docs, "text", nMerges = 4)
    val direct = Bpe.tokenize(docs, "text", "doc_id", merges)
      .select($"doc_id", size($"bpe_tokens").cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val joined = Bpe.tokenCounts(docs, "text", "doc_id", merges)
      .as[(Long, Long)].collect().toMap
    assert(joined === direct)
    assert(joined(999999L) === 0L)
    assert(joined(999998L) === 0L)
  }

  test("mergeAdjacent is left-to-right non-overlapping (aaa + (a,a) -> [aa, a])") {
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
    val out = df.select(Bpe.mergeAdjacent(org.apache.spark.sql.functions.col("syms"), "a", "a"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("aa", "a"))
  }

  test("fit is partitioning-invariant and stops below minCount") {
    val a = Bpe.fitMerges(corpus, "text", 5)
    val b = Bpe.fitMerges(corpus.repartition(7), "text", 5)
    assert(a === b)
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    assert(Bpe.fitMerges(tiny, "text", 5, minCount = 2L).isEmpty)
  }

  test("at-rest model: from-model tokenization == inline, bit-identical, without refit") {
    spark.sql("DROP TABLE IF EXISTS bpe_spec_model")
    val merges = Bpe.fitAndWriteModel(corpus, "text", "bpe_spec_model", nMerges = 8)
    // round-trip: the table IS the merge list, in rank order
    assert(Bpe.readModel(spark, "bpe_spec_model") === merges)
    // a FRESH session (shared catalog, none of this session's in-memory
    // state) tokenizes from the table alone — fit once, apply anywhere
    val fresh = spark.newSession()
    val docs2 = {
      import fresh.implicits._
      Seq((10L, "lowest newest low"), (11L, "widest")).toDF("doc_id", "text")
    }
    val fromModel = Bpe.tokenCountsFromModel(docs2, "text", "doc_id", "bpe_spec_model")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val inline = Bpe.tokenCounts(docs2, "text", "doc_id", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(fromModel === inline)
    val toksFromModel = Bpe.tokenizeFromModel(docs2, "text", "doc_id", "bpe_spec_model")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    val toksInline = Bpe.tokenize(docs2, "text", "doc_id", merges)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    assert(toksFromModel === toksInline)
    spark.sql("DROP TABLE bpe_spec_model")
  }

  test("readModel fails fast on a bare table, a foreign norm, and a shape mismatch") {
    spark.sql("DROP TABLE IF EXISTS bpe_spec_bad")
    // bare table (no props) is NOT a model
    Seq((0L, "a", "b")).toDF("rank", "left_sym", "right_sym")
      .write.mode("overwrite").saveAsTable("bpe_spec_bad")
    val e1 = intercept[IllegalArgumentException] { Bpe.readModel(spark, "bpe_spec_bad") }
    assert(e1.getMessage.contains("graft.bpe.nMerges"))
    // recorded shape must match the rows actually present
    spark.sql("DROP TABLE IF EXISTS bpe_spec_bad2")
    Bpe.writeModel(spark, "bpe_spec_bad2", Seq(("a", "b"), ("ab", "c")))
    spark.sql(
      "ALTER TABLE bpe_spec_bad2 SET TBLPROPERTIES ('graft.bpe.nMerges'='3')"
    )
    val e2 = intercept[IllegalArgumentException] { Bpe.readModel(spark, "bpe_spec_bad2") }
    assert(e2.getMessage.contains("shape says 3"))
    // normalization contract change must refuse to apply
    spark.sql(
      "ALTER TABLE bpe_spec_bad2 SET TBLPROPERTIES " +
        "('graft.bpe.nMerges'='2', 'graft.bpe.norm'='other/v9')"
    )
    val e3 = intercept[IllegalArgumentException] { Bpe.readModel(spark, "bpe_spec_bad2") }
    assert(e3.getMessage.contains("normalization"))
    spark.sql("DROP TABLE bpe_spec_bad")
    spark.sql("DROP TABLE bpe_spec_bad2")
  }

  test("model publication is swap-atomic: every crash window yields old model or heals") {
    val t = "bpe_swap_model"
    Seq(t, s"${t}__stage", s"${t}__retire").foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    val v1 = Seq(("l", "o"), ("lo", "w"))
    val v2 = Seq(("n", "e"), ("ne", "w"), ("new", "s"))
    Bpe.writeModel(spark, t, v1)
    assert(Bpe.readModel(spark, t) === v1)

    // window A — crash after the stage write, before any rename:
    // stage exists, live model untouched; readers see v1
    Bpe.writeModel(spark, s"${t}__stage", v2) // simulate a completed stage write...
    // (writeModel on the stage name leaves a plain table there — good
    // enough to occupy the name the next writer must clear)
    assert(Bpe.readModel(spark, t) === v1)
    Bpe.writeModel(spark, t, v2) // next writer clears the leftover stage and swaps
    assert(Bpe.readModel(spark, t) === v2)
    assert(!spark.catalog.tableExists(s"${t}__stage"))
    assert(!spark.catalog.tableExists(s"${t}__retire"))

    // window B — crash BETWEEN the two renames: live name missing, old
    // model intact at __retire. Simulate by doing the first rename only.
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}__retire")
    assert(!spark.catalog.tableExists(t))
    // a reader heals restore-only and reads the OLD model — never a partial
    assert(Bpe.readModel(spark, t) === v2)
    assert(spark.catalog.tableExists(t) && !spark.catalog.tableExists(s"${t}__retire"))

    // window C — crash after both renames, before the retire drop:
    // live = new, __retire = old; readers see the NEW model, the next
    // writer clears the leftover
    Bpe.writeModel(spark, s"${t}__retire", v1) // occupy the retire name
    assert(Bpe.readModel(spark, t) === v2)
    Bpe.writeModel(spark, t, v1)
    assert(Bpe.readModel(spark, t) === v1)
    assert(!spark.catalog.tableExists(s"${t}__retire"))

    // the props travel with the swap: a freshly swapped-in model passes
    // the full shape validation in a FRESH session
    val fresh = spark.newSession()
    assert(Bpe.readModel(fresh, t) === v1)

    // read-only deployments (ADVICE r15): heal=false must not touch
    // the metastore — a crashed swap surfaces as not-found, and the
    // retired copy stays exactly where the crash left it
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}__retire")
    intercept[Exception] { Bpe.readModel(spark, t, heal = false) }
    assert(spark.catalog.tableExists(s"${t}__retire"), "heal=false must not rename")
    assert(!spark.catalog.tableExists(t))
    // the default heal restores restore-only, as before
    assert(Bpe.readModel(spark, t) === v1)
    spark.sql(s"DROP TABLE $t")
  }

  test("orphan warehouse dirs: cleared when Spark-table-shaped, refused otherwise") {
    val t = "bpe_orphan_model"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // leave a Spark-shaped orphan dir behind (simulates a dead PROCESS
    // whose catalog entry died with it): write then drop the catalog
    // entry via an external-location trick — simplest is to write the
    // table, snapshot its dir, drop, and restore the dir
    Bpe.writeModel(spark, t, Seq(("a", "b")))
    val loc = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
      .location.getPath
    val save = java.nio.file.Files.createTempDirectory("orphan").resolve("copy")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(loc), save.toFile)
    spark.sql(s"DROP TABLE $t")
    org.apache.commons.io.FileUtils.copyDirectory(save.toFile, new java.io.File(loc))
    // Spark-shaped orphan: writeModel clears it and succeeds
    Bpe.writeModel(spark, t, Seq(("x", "y")))
    assert(Bpe.readModel(spark, t) === Seq(("x", "y")))
    spark.sql(s"DROP TABLE $t")
    // foreign content: refused loudly, nothing deleted
    val dir = new java.io.File(loc)
    dir.mkdirs()
    val foreign = new java.io.File(dir, "precious.txt")
    java.nio.file.Files.write(foreign.toPath, "not spark output".getBytes)
    val e = intercept[IllegalArgumentException] {
      Bpe.writeModel(spark, t, Seq(("x", "y")))
    }
    assert(e.getMessage.contains("refusing"))
    assert(foreign.exists, "guard must not delete foreign data")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
