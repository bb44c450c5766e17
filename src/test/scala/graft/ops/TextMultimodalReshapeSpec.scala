package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class TextMultimodalReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("tokenCounts: whitespace tokens and bpe estimate") {
    val df = Seq((1L, "Hello, world! foo")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, "text", "doc_id").head()
    assert(r.getAs[Long]("ws_tokens") === 3L)
    assert(r.getAs[Long]("bpe_est") === (17L + 3) / 4)
  }

  test("oovRate: exact per-doc counts; token-less and null docs keep zero rows") {
    val docs = Seq(
      (1L, Some("the cat sat on the mat")), // 6 tokens; OOV: cat, sat
      (2L, Some("zzz qqq")),                // fully OOV
      (3L, Some("!!! ???")),                // tokenizes to nothing
      (4L, Option.empty[String])            // null text
    ).toDF("doc_id", "text")
    val vocab = Seq("the", "on", "mat").toDF("token")
    val got = TextAnalysis.oovRate(docs, "text", "doc_id", vocab)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.size === 4, "every doc keeps a row")
    assert(got(1L) === ((6L, 2L, 0.3333)))
    assert(got(2L) === ((2L, 2L, 1.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
    assert(got(4L) === ((0L, 0L, 0.0)))
    // the truncation discipline: floor(n_oov*1e4/n_tokens)/1e4
    val seven = Seq((9L, "a b c d e f g")).toDF("doc_id", "text")
    val r7 = TextAnalysis.oovRate(seven, "text", "doc_id", Seq("a").toDF("token")).head()
    assert(r7.getDouble(3) === math.floor(6.0 * 10000.0 / 7.0) / 10000.0)
  }

  test("stripRepeatedSegments: keep-first within-doc dedup, order preserved, cross-doc untouched") {
    val docs = Seq(
      // "buy now" repeats 3x within the doc (2-token segments) — keep the first
      (1L, "buy now great offer buy now limited buy now"),
      // the SAME segment in another doc is NOT corpus-boilerplate here: kept
      (2L, "buy now once only"),
      (3L, "all unique tokens here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripRepeatedSegments(docs, "text", "doc_id", segTokens = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_repeated"),
        r.getAs[String]("clean_text"))))
      .toMap
    // doc 1 segments: [buy now][great offer][buy now][limited buy][now]
    // -> only the pos-2 "buy now" is a repeat; order survives the rebuild
    assert(got(1L) === ((5L, 1L, "buy now great offer limited buy now")))
    assert(got(2L) === ((2L, 0L, "buy now once only")))
    assert(got(3L) === ((2L, 0L, "all unique tokens here")))
    // composes with the corpus-level strip: same (doc_id, pos) discipline
    val frac = TextAnalysis.stripRepeatedSegments(docs, "text", "doc_id", 2)
      .filter($"doc_id" === 1L).head().getAs[Double]("frac_repeated")
    assert(frac === math.floor(1.0 / 5.0 * 10000) / 10000)
  }

  test("corpusFrequencyScore: exact df arithmetic, <= rare boundary, tokenless docs absent") {
    // dfs: a=2 (d1,d2), b=c=x=1; n_docs=4 (the empty doc counts toward
    // the corpus size but emits no occurrence rows)
    val df = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "x"), (4L, "")
    ).toDF("doc_id", "text")
    // rarePermille=500: rare iff df*1000 <= 4*500 = 2000 — df=2 sits ON
    // the boundary and must count as rare (<=, not <)
    val got = TextAnalysis
      .corpusFrequencyScore(df, "text", "doc_id", rarePermille = 500)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("mean_df"), r.getAs[Double]("rare_frac")))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L), "tokenless doc emits no row")
    assert(got(1L) === ((2L, 1.5, 1.0))) // (2+1)/2; both a (boundary) and b rare
    assert(got(2L) === ((2L, 1.5, 1.0)))
    assert(got(3L) === ((1L, 1.0, 1.0)))
    // tighter rule: permille=250 -> threshold 1000: df=2 no longer rare
    val tight = TextAnalysis
      .corpusFrequencyScore(df, "text", "doc_id", rarePermille = 250)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rare_frac"))
      .toMap
    assert(tight(1L) === 0.5 && tight(2L) === 0.5 && tight(3L) === 1.0)
  }

  test("langId picks the marker-dominant language; CJK short-circuits") {
    val df = Seq(
      (1L, "the cat and the dog is a pet of the house"),
      (2L, "der hund und die katze und das ist gut"),
      (3L, "le chat et la maison les arbres est grand"),
      (4L, "你好世界")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "zh"))
  }

  test("quality: repeated-word doc scores below diverse doc") {
    val df = Seq(
      (1L, Seq.fill(50)("spam").mkString(" ")),
      (2L, (1 to 50).map(i => s"word$i").mkString(" "))
    ).toDF("doc_id", "text")
    val q = TextAnalysis.quality(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    assert(q(1L) < q(2L))
  }

  test("gopherQuality: duplicate-line fractions and word stats") {
    val df = Seq(
      (1L, "alpha beta\nrepeat me\nrepeat me\n\ngamma"),
      (2L, "one line only")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = got(1L)
    assert(d1.getAs[Long]("n_lines") === 4L) // blank line dropped
    assert(d1.getAs[Long]("n_dup_lines") === 1L)
    assert(d1.getAs[Double]("frac_dup_lines") === 0.25)
    // dup mass: both "repeat me" occurrences (18 chars) over 33 total
    assert(d1.getAs[Double]("frac_chars_dup_lines") === math.floor(18.0 / 33 * 10000) / 10000)
    assert(got(2L).getAs[Long]("n_dup_lines") === 0L)
    assert(got(2L).getAs[Double]("frac_alpha_words") === 1.0)
  }

  test("gopherQuality: 20k-line document is linear-ish, not quadratic") {
    // 20k lines, half duplicated: the old per-line multiplicity scan is
    // O(n²) = 4e8 comparisons in ONE row (a straggler at corpus scale);
    // the sorted-runs fold is O(n log n). Assert exact dup-mass math on
    // the big doc AND that it completes in the same ballpark as a tiny
    // one rather than minutes.
    val nUnique = 10000
    val unique = (0 until nUnique).map(i => s"unique line number $i")
    val dups = (0 until nUnique).map(i => s"duplicated payload ${i % 100}")
    val bigText = scala.util.Random.shuffle(unique ++ dups).mkString("\n")
    val df = Seq((1L, bigText), (2L, "small\ndoc")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = TextAnalysis.gopherQuality(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    val big = got(1L)
    assert(big.getAs[Long]("n_lines") === 20000L)
    // 100 distinct duplicated lines, 100 copies each -> 10000 - 100 net dups
    assert(big.getAs[Long]("n_dup_lines") === (10000L - 100L))
    val dupMass = dups.map(_.length.toLong).sum
    val totalMass = (unique ++ dups).map(_.length.toLong).sum
    assert(
      big.getAs[Double]("frac_chars_dup_lines") ===
        math.floor(dupMass.toDouble / totalMass * 10000) / 10000
    )
    assert(secs < 15.0, s"20k-line gopherQuality took $secs s — smells quadratic")
  }

  test("sourceDivergence: identical sources diverge zero, disjoint vocab hits the TV bound") {
    // both sources emit the same distribution -> TV and chi2 exactly 0
    val same = Seq((1L, "a b c", "s1"), (2L, "a b c", "s2")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceDivergence(same, "text", "source", topK = 10).collect()
    assert(got.length === 2)
    assert(got.forall(r => r.getAs[Double]("tv_div") === 0.0 && r.getAs[Double]("chi2_div") === 0.0))
    // disjoint vocab: each source holds half the corpus mass ->
    // TV = 0.5*(|1-0.5| + |0-0.5|) = 0.5 per source, exactly
    val disjoint = Seq((1L, "a", "s1"), (2L, "b", "s2")).toDF("doc_id", "text", "source")
    val tv = TextAnalysis.sourceDivergence(disjoint, "text", "source", topK = 10)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("tv_div")).toMap
    assert(tv === Map("s1" -> 0.5, "s2" -> 0.5))
  }

  test("ngramRepetition: hand-computed fractions, overlap mass capped at 1.0") {
    // doc 1 "a b a b c": tc=5; top 2-gram "a b" x2, mass 2x2=4 -> 0.8;
    // 3-grams all unique, best mass 3 -> 0.6; no 5-gram dups.
    // doc 2 "x x x x": tc=4; top 2-gram "x x" x3 has mass 6 > tc and
    // top 3-gram "x x x" x2 mass 6 > tc -> both capped at 1.0 (overlap
    // over-count is expected; the cap is the Gopher convention).
    // doc 4 "x x x a b c d e": tc=8; "x x" x2 mass 4 -> 0.5 (uncapped).
    val df = Seq((1L, "a b a b c"), (2L, "x x x x"), (3L, ""), (4L, "x x x a b c d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramRepetition(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("top2_frac"), r.getAs[Double]("top3_frac"), r.getAs[Double]("dup5_frac"))))
      .toMap
    assert(got(1L) === ((0.8, 0.6, 0.0)))
    assert(got(2L) === ((1.0, 1.0, 0.0)))
    assert(got(3L) === ((0.0, 0.0, 0.0)))
    assert(got(4L) === ((0.5, 0.375, 0.0)))
  }

  test("chunkDocuments: stride windows with overlap; tail emitted only when it adds tokens") {
    // 10 tokens, chunk=4, overlap=1 (stride 3): windows at 0/3/6; a 4th
    // window at 9 would hold only already-covered tokens -> not emitted.
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b"), // shorter than one chunk: kept whole as chunk 0
      (3L, "")     // empty: no chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "text", "doc_id", chunkTokens = 4, overlap = 1)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("chunk_text"), r.getAs[Long]("n_tokens")))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq === Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.map(_._4).toSeq === Seq(4L, 4L, 4L))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b", 2L)))
    assert(!got.exists(_._1 == 3L))
  }

  test("redactPii replaces emails/urls with tags and counts them") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org or see https://ex.org/a?b=1 now"),
      (2L, "clean text")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[String]("redacted") === "mail <EMAIL> or see <URL> now")
    assert(got(1L).getAs[Long]("n_emails") === 1L && got(1L).getAs[Long]("n_urls") === 1L)
    assert(got(2L).getAs[String]("redacted") === "clean text")
    assert(got(2L).getAs[Long]("n_emails") === 0L && got(2L).getAs[Long]("n_urls") === 0L)
  }

  test("stripBoilerplate: shared segments stripped, text rebuilt in order, all-boiler doc nulls") {
    // 4 docs share the same 2-token header segment (segTokens = 2);
    // bodies are unique. minDocs = 3 -> header is boilerplate, bodies
    // survive. Doc 5 is ONLY the header: its clean_text must be null.
    val df = Seq(
      (1L, "legal header alpha beta gamma"),
      (2L, "legal header delta epsilon"),
      (3L, "legal header zeta eta theta iota"),
      (4L, "legal header kappa"),
      (5L, "legal header")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .stripBoilerplate(df, "text", "doc_id", segTokens = 2, minDocs = 3)
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_boiler"), r.getAs[String]("clean_text")))
      )
      .toMap
    // doc 3: segs = [legal header][zeta eta][theta iota] -> header stripped
    assert(got(3L) === ((3L, 1L, "zeta eta theta iota")))
    // doc 1: tail segment [gamma] is a partial window and survives
    assert(got(1L) === ((3L, 1L, "alpha beta gamma")))
    assert(got(4L) === ((2L, 1L, "kappa")))
    // all-boilerplate doc: nothing survives -> null (not empty string)
    assert(got(5L)._2 === 1L && got(5L)._3 === null)
    // no body segment was ever flagged
    assert(got.values.map(_._2).sum === 5L)
  }

  test("stripBoilerplate: below-threshold repeats are kept") {
    val df = Seq(
      (1L, "shared pair one"),
      (2L, "shared pair two"),
      (3L, "other words three")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .stripBoilerplate(df, "text", "doc_id", segTokens = 2, minDocs = 3)
      .collect()
    assert(got.forall(_.getAs[Long]("n_boiler") === 0L))
  }

  test("stripBoilerplateFromModel over the addition-merged boilerFold == stripBoilerplate") {
    // the streamed-model equivalence behind curatedIngest's stage 0:
    // fold two DISJOINT halves, merge by long addition (what
    // SketchIngest.ingestCountBatch does at rest), and strip from the
    // merged model — must equal the one-pass batch strip over the union
    val docs = Seq(
      (1L, "legal header alpha beta gamma"),
      (2L, "legal header delta epsilon"),
      (3L, "legal header zeta eta theta iota"),
      (4L, "legal header kappa"),
      (5L, "legal header"),
      (6L, "free body words only")
    ).toDF("doc_id", "text")
    val fold = TextAnalysis.boilerFold("text", "doc_id", segTokens = 2)
    val model = fold(docs.filter(col("doc_id") <= 3))
      .unionByName(fold(docs.filter(col("doc_id") > 3)))
      .groupBy(col("seg"))
      .agg(sum(col("n")).as("n"))
    val fromModel = TextAnalysis
      .stripBoilerplateFromModel(docs, "text", "doc_id", 2, 3, model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    val batch = TextAnalysis
      .stripBoilerplate(docs, "text", "doc_id", 2, 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    assert(fromModel === batch)
    assert(fromModel(3L)(4) === "zeta eta theta iota") // header really stripped

    // the BOUNDED count-min form: same two-half fold-and-merge, wide
    // enough that no cells collide -> exact parity with the batch strip
    val cfold = TextAnalysis.boilerFoldCms("text", "doc_id", segTokens = 2, depth = 4, width = 4096)
    val cms = cfold(docs.filter(col("doc_id") <= 3))
      .unionByName(cfold(docs.filter(col("doc_id") > 3)))
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n"))
    val fromCms = TextAnalysis
      .stripBoilerplateFromCms(docs, "text", "doc_id", 2, 3, cms, depth = 4, width = 4096)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    assert(fromCms === batch)
  }

  test("boilerFoldCms over-strip is one-sided: width-1 collisions strip MORE, never less") {
    // width = 1: every segment maps to the same cell per depth row, so
    // the CMS estimate for ANY segment is the total distinct-doc mass —
    // everything over minDocs gets stripped (the documented collision
    // direction). No frequent segment can ever escape (min >= truth).
    val docs = Seq(
      (1L, "legal header alpha beta"),
      (2L, "legal header gamma delta"),
      (3L, "legal header epsilon zeta")
    ).toDF("doc_id", "text")
    val cms = TextAnalysis.boilerFoldCms("text", "doc_id", 2, depth = 2, width = 1)(docs)
    val got = TextAnalysis
      .stripBoilerplateFromCms(docs, "text", "doc_id", 2, 3, cms, depth = 2, width = 1)
      .collect()
    // all mass collides into one cell (3 docs x 2 segments = n 6 >= 3):
    // every segment flags as boiler, every doc strips to null
    got.foreach { r =>
      assert(r.getAs[Long]("n_boiler") === r.getAs[Long]("n_segs"))
      assert(r.getAs[String]("clean_text") === null)
    }
  }

  test("splitLeakage: planted cross-split shingle counted once per doc; clean corpus zero") {
    // discover the deterministic split labels first, then craft texts
    val ids = (1L to 120L).toDF("doc_id")
    val labels = Sampling
      .assignSplit(ids, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val trainId = labels.collectFirst { case (id, "train") => id }.get
    val valIds = labels.collect { case (id, "val") => id }.toSeq.sorted
    val testIds = labels.collect { case (id, "test") => id }.toSeq.sorted
    assert(valIds.nonEmpty && testIds.nonEmpty)
    // one val doc copies a train phrase (>= 3 shared tokens); everything
    // else is unique vocabulary per doc
    val leakVal = valIds.head
    val docs = (1L to 120L).map { id =>
      val text =
        if (id == trainId) "shared secret phrase alpha beta"
        else if (id == leakVal) "prefix shared secret phrase suffix"
        else s"unique${id}a unique${id}b unique${id}c unique${id}d"
      (id, text)
    }.toDF("doc_id", "text")
    val got = TextAnalysis
      .splitLeakage(docs, "text", "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"), r.getAs[Double]("frac_contaminated"))))
      .toMap
    assert(got.keySet === Set("val", "test"))
    assert(got("val")._1 === valIds.size.toLong)
    assert(got("val")._2 === 1L) // the planted doc, counted once despite 2 shared shingles? (1 shared 3-gram: "shared secret phrase")
    assert(got("test") === ((testIds.size.toLong, 0L, 0.0)))
    assert(got("val")._3 === math.floor(1.0 / valIds.size * 10000) / 10000)
  }

  test("fingerprints: formatting-only variants collide") {
    val df = Seq((1L, "Hello,  World!"), (2L, "hello world"), (3L, "different")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("fingerprint"), r.getAs[Long]("n_same"))).toMap
    assert(fp(1L)._1 === fp(2L)._1)
    assert(fp(1L)._2 === 2L && fp(3L)._2 === 1L)
  }

  test("approxTopTokens: CMS heavy hitters match exact top-k, estimates bounded") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = TextAnalysis.topTokens(docs, "text", 20)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("n")).toMap
    val approx = TextAnalysis.approxTopTokens(docs, "text", 20)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
    assert(approx.keySet === exact.keySet, "approx top-20 set must equal exact on this corpus")
    val totalTokens = docs
      .agg(sum(size(graft.functions.Fns.tokens(col("text"))))).head().getLong(0)
    approx.foreach { case (t, est) =>
      assert(est >= exact(t), s"CMS must never underestimate ($t)")
      assert(est <= exact(t) + (1e-4 * totalTokens).ceil.toLong, s"overestimate beyond eps*N ($t)")
    }
    // empty input yields an empty, well-typed frame
    val empty = TextAnalysis.approxTopTokens(docs.filter(lit(false)), "text", 5)
    assert(empty.count() === 0)
  }

  test("multimodal: metadata projection agrees with the decode stub") {
    val docs = Seq((1L, "some media payload bytes"), (2L, "x")).toDF("doc_id", "text")
    val media = Multimodal.attachBinary(docs, "text", "doc_id").cache()
    val meta = Multimodal.metadata(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(1L, 2L)) {
      assert(meta(id).getAs[Long]("byte_len") === feats(id).byte_len)
      assert(meta(id).getAs[String]("content_md5") === feats(id).content_md5)
      assert(meta(id).getAs[Long]("n_frames").toInt === feats(id).n_frames)
      assert(feats(id).frame_means.length === feats(id).n_frames)
    }
  }

  test("multimodal: real image decode via JDK ImageIO (true dims, means, frames)") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def img(w: Int, h: Int, rgb: Int): BufferedImage = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
      im
    }
    def encode(im: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      bos.toByteArray
    }
    val rows = Seq(
      (1L, encode(img(7, 5, 0x808080), "png")),  // gray PNG
      (2L, encode(img(3, 9, 0xffffff), "bmp")),  // white BMP
      (3L, animatedGif(Seq(img(4, 4, 0x000000), img(4, 4, 0xffffff)))), // 2-frame GIF
      (4L, "not an image at all".getBytes("UTF-8")), // surrogate path
      (5L, encode(img(11, 6, 0x404040), "jpeg")) // JPEG (JDK-native reader)
    ).toDF("doc_id", "media")
    val feats = Multimodal.extractFeatures(rows).collect().map(f => f.doc_id -> f).toMap

    assert(feats(1L).width === 7 && feats(1L).height === 5 && feats(1L).n_frames === 1)
    assert(feats(1L).frame_means.toSeq === Seq(128.0)) // 0x80 per channel, lossless
    assert(feats(2L).width === 3 && feats(2L).height === 9)
    assert(feats(2L).frame_means.toSeq === Seq(255.0))
    assert(feats(3L).width === 4 && feats(3L).height === 4 && feats(3L).n_frames === 2)
    // JPEG decodes for real: true dimensions, one frame, and a mean
    // near the encoded gray (lossy codec -> tolerance, not equality)
    assert(feats(5L).width === 11 && feats(5L).height === 6 && feats(5L).n_frames === 1)
    assert(math.abs(feats(5L).frame_means.head - 64.0) < 8.0)
    // non-image bytes flow through the deterministic surrogate
    val len = "not an image at all".getBytes("UTF-8").length
    assert(feats(4L).byte_len === len && feats(4L).width === len % 640)

    // resize: aspect-preserving downscale to fit 4x4, PNG re-encode;
    // decoding the output proves the new true dimensions
    val resized = Multimodal.resizeImages(rows, 4, 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(resized(1L).getAs[Boolean]("resized"))
    assert(resized(1L).getAs[Int]("width") === 4 && resized(1L).getAs[Int]("height") === 3) // 7x5 -> fit
    val back = ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1L).getAs[Array[Byte]]("media")))
    assert(back.getWidth === 4 && back.getHeight === 3)
    assert(resized(2L).getAs[Int]("width") === 1 && resized(2L).getAs[Int]("height") === 4) // 3x9 tall
    // already-small images never upscale
    assert(resized(3L).getAs[Int]("width") === 4 && resized(3L).getAs[Int]("height") === 4)
    // non-image bytes pass through untouched
    assert(!resized(4L).getAs[Boolean]("resized"))
    assert(resized(4L).getAs[Array[Byte]]("media").toSeq ===
      "not an image at all".getBytes("UTF-8").toSeq)
    // JPEG input resizes through the same path (11x6 -> fit 4x4 => 4x2)
    assert(resized(5L).getAs[Boolean]("resized"))
    assert(resized(5L).getAs[Int]("width") === 4 && resized(5L).getAs[Int]("height") === 2)
    val backJpeg = ImageIO.read(
      new java.io.ByteArrayInputStream(resized(5L).getAs[Array[Byte]]("media")))
    assert(backJpeg.getWidth === 4 && backJpeg.getHeight === 2)
  }

  test("multimodal: frame sampling strides over REAL n_frames") {
    val docs = Seq((1L, "0123456789abcdef0123456789abcdef0")).toDF("doc_id", "text") // 33 bytes -> 2 frames
    val media = Multimodal.attachBinary(docs, "text", "doc_id")
    val idx = Multimodal.sampleFrameIndexes(media, stride = 1).select("frame_idx").as[Long].collect().toSeq
    assert(idx === Seq(0L, 1L))

    // a real 2-frame GIF must sample exactly frames 0 and 1 regardless
    // of what its byte length mod 16 happens to be (the old surrogate
    // count would invent/hide frames on real images)
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def frame(rgb: Int): BufferedImage = {
      val im = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) im.setRGB(x, y, rgb)
      im
    }
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(frame(0x000000), frame(0xffffff)).foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    val gifBytes = bos.toByteArray
    assume(gifBytes.length % 16 != 1, "pick a gif whose surrogate count differs from 2")
    val gifIdx = Multimodal
      .sampleFrameIndexes(Seq((9L, gifBytes)).toDF("doc_id", "media"), stride = 1)
      .select("frame_idx").as[Long].collect().toSeq
    assert(gifIdx === Seq(0L, 1L))
  }

  test("multimodal features feed ANN end-to-end (frame-mean vectors -> top-k)") {
    // the full curation chain: binary column -> partition-streamed
    // feature extraction -> fixed-dim vector -> similarity search
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    val feats = Multimodal
      .extractFeatures(Multimodal.attachBinary(docs, "text", "doc_id"))
      .toDF()
    val dim = 8
    val vecs = feats.select(
      col("doc_id").as("vec_id"),
      slice(
        concat(col("frame_means"), array_repeat(lit(0.0), dim)),
        1, dim
      ).as("v")
    )
    val topk = Similarity
      .bruteForceTopK(vecs, vecs.filter(col("vec_id") < 3), "v", "vec_id", 3)
    val rows = topk.collect()
    assert(rows.length === 9) // 3 queries x top-3
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cosine"); c >= -1.0001 && c <= 1.0001
    })
  }

  test("unpivot -> pivot round trip preserves values") {
    val wide = Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("id", "m1", "m2")
    val long = Reshape.unpivot(wide, Seq("id"), Seq("m1", "m2"))
    assert(long.count() === 4)
    val m = long.filter($"id" === 1L && $"metric" === "m2").select("value").as[Double].head()
    assert(m === 20.0)
  }

  test("flattenMap expands map payload to columns") {
    val df = Seq((1L, Map("a" -> "x", "b" -> "y"))).toDF("id", "payload")
    val flat = Reshape.flattenMap(df, "payload", Some(Seq("a", "b")), prefix = "new_")
    assert(flat.columns.toSeq === Seq("id", "new_a", "new_b"))
    assert(flat.select("new_b").as[String].head() === "y")
  }

  test("flattenMap inference is bounded: under maxKeys infers sorted keys, over fails fast") {
    val df = Seq(
      (1L, Map("b" -> "y", "a" -> "x")),
      (2L, Map("c" -> "z"))
    ).toDF("id", "payload")
    // dynamic mode: keys inferred from data, sorted, bound not hit
    val flat = Reshape.flattenMap(df, "payload", maxKeys = 3)
    assert(flat.columns.toSeq === Seq("id", "a", "b", "c"))
    assert(flat.filter($"id" === 2L).select("c").as[String].head() === "z")
    // a map column wider than the bound must fail fast, not plan a
    // pathologically wide schema
    val wide = Seq((1L, (1 to 10).map(i => s"k$i" -> s"v$i").toMap)).toDF("id", "payload")
    val e = intercept[IllegalArgumentException] {
      Reshape.flattenMap(wide, "payload", maxKeys = 4)
    }
    assert(e.getMessage.contains("more than 4 distinct keys"))
  }

  test("pivotCounts with explicit values, missing combos filled 0") {
    val df = Seq(("u1", "x"), ("u1", "x"), ("u2", "y")).toDF("user", "t")
    val p = Reshape.pivotCounts(df, "user", "t", Seq("x", "y"))
    val m = p.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("u1") === ((2L, 0L)) && m("u2") === ((0L, 1L)))
  }
}
