package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions over the shared [[Fns.tokens]] normalization —
  * per-row, map-side, no shuffles (fingerprint grouping aside).
  */
object TextAnalysis {

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y")
  )

  /** N-gram/stopword-heuristic language ID: count language-marker tokens,
    * pick the argmax (fixed priority order on ties); CJK-range characters
    * short-circuit to zh.
    */
  def langId(df: DataFrame, textCol: String, idCol: String, keep: Seq[String] = Nil): DataFrame = {
    val toks = Fns.tokens(col(textCol))
    val scores = markers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isInCollection(ms)))
    }
    val best = scores.tail.foldLeft(scores.head._2)((acc, s) => greatest(acc, s._2))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
    // \x{...} escapes parse in both Java regex and RE2 (\uXXXX is Java-only)
    // `keep` carries extra per-doc columns (e.g. the labeled lang for a
    // confusion matrix) through the projection — free, vs re-joining the
    // prediction back to the corpus on the id
    df.select(
      col(idCol).as("doc_id") +:
        when(col(textCol).rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh")).otherwise(pick).as("pred_lang") +:
        keep.map(col): _*
    )
  }

  /** Quality scoring from surface statistics (length, lexical diversity,
    * stopword ratio) — the classic cheap pre-filter before model-based
    * scoring.
    */
  def quality(df: DataFrame, textCol: String, idCol: String): DataFrame =
    quality(df, textCol, idCol, Nil)

  /** [[quality]] carrying extra per-doc columns through the projection
    * (the [[langId]] `keep` convention) — a caller gating on the score
    * filters in place instead of re-joining the corpus on the id (one
    * corpus shuffle saved per gate; guide §2.4).
    */
  def quality(df: DataFrame, textCol: String, idCol: String, keep: Seq[String]): DataFrame = {
    val toks = Fns.tokens(col(textCol))
    val words = size(toks)
    val distinctWords = size(array_distinct(toks))
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val stopHits = size(filter(toks, t => t.isInCollection(markers.head._2)))
    val ttr = distinctWords.cast("double") / words.cast("double")
    val stopRatio = stopHits.cast("double") / words.cast("double")
    val lengthScore = least(words.cast("double") / lit(100.0), lit(1.0))
    // integer outputs widened to long (DuckDB len()/length() are BIGINT).
    // Ratios are TRUNCATED to 4 decimals (floor), not rounded: these
    // rationals have small denominators (multiples of word counts) so
    // values landing exactly on x.xxxx5 occur in practice, and engines
    // disagree on the half-rule there; floor of the same double is
    // tie-free and engine-independent.
    def trunc4(c: Column): Column = floor(c * 10000) / 10000
    df.select(
      col(idCol).as("doc_id") +:
        length(col(textCol)).cast("long").as("n_chars") +:
        words.cast("long").as("n_words") +:
        distinctWords.cast("long").as("n_distinct") +:
        trunc4(charSum.cast("double") / words.cast("double")).as("avg_word_len") +:
        trunc4(ttr).as("ttr") +:
        trunc4(stopRatio).as("stopword_ratio") +:
        trunc4(lit(0.4) * lengthScore + lit(0.3) * ttr + lit(0.3) * (lit(1.0) - stopRatio))
          .as("quality") +:
        keep.map(col): _*
    )
  }

  /** Token counting: exact whitespace tokens + a BPE-ish estimate
    * (chars/4, the standard rule of thumb) — both integer-exact.
    */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(Fns.tokens(col(textCol))).cast("long").as("ws_tokens"),
      expr(s"(length($textCol) + 3) div 4").cast("long").as("bpe_est")
    )

  /** Vocabulary: token frequencies across the corpus, deterministic
    * top-k by (count desc, token asc). One explode + one shuffle.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(Fns.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Zipf profile of the corpus token distribution: the least-squares
    * slope of glog(freq) against glog(rank) over the top-`k` tokens —
    * the "is this a natural-language corpus?" fingerprint (prose sits
    * near −1; templated/generated text flattens, OCR noise steepens
    * then collapses into a singleton tail).
    *
    * Shape: one corpus explode collapses to token counts (map-side
    * partial agg); [[topTokens]] is a TakeOrdered over the bounded
    * vocabulary (never a global window); ranks come from ONE
    * sort_array/posexplode over the collected ≤ k-row grid (the q142
    * bounded-collect discipline). The regression runs on the k-row
    * grid alone.
    *
    * Determinism: glog values are quantized to longs at 10⁴ (NOT the
    * usual 10⁹ — the OLS cross-moments square the scale, and 10⁴ keeps
    * `k·Σxy − Σx·Σy` under 2⁵³ for any k ≤ 1000 with counts up to
    * 10¹², so the one decimal→double cast per coefficient is exact
    * cross-engine); sums accumulate in decimal(38,0) with decimal
    * factors; slope and intercept are each one fixed IEEE expression.
    */
  def zipfProfile(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, "zipfProfile needs 2 <= k <= 1000 (bounded rank grid)")
    zipfFromCounts(topTokens(df, textCol, k))
  }

  /** [[zipfProfile]] from an already-built (token, n) frequency table
    * (e.g. a `SketchIngest`-maintained vocabulary) — ranks are assigned
    * (n desc, token asc) over the WHOLE input, so pre-limit it to the
    * intended grid.
    */
  def zipfFromCounts(counts: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val ranked = counts
      .agg(
        sort_array(collect_list(struct((-col("n")).as("negn"), col("token").as("token"))))
          .as("g")
      )
      .select(posexplode(col("g")).as(Seq("i", "s")))
      .select(
        (col("i") + 1).cast("long").as("rank"),
        (-col("s.negn")).cast("long").as("n")
      )
      .select(
        round(Dsir.glog(col("rank")) * 10000.0).cast("long").as("xq"),
        round(Dsir.glog(col("n")) * 10000.0).cast("long").as("yq")
      )
    val m = ranked.agg(
      count(lit(1)).as("k"),
      sum(dec(col("xq"))).as("sx"),
      sum(dec(col("yq"))).as("sy"),
      sum(dec(col("xq")) * dec(col("xq"))).as("sxx"),
      sum(dec(col("xq")) * dec(col("yq"))).as("sxy")
    )
    val den = dec(col("k")) * col("sxx") - col("sx") * col("sx")
    val slope = (dec(col("k")) * col("sxy") - col("sx") * col("sy")).cast("double") /
      den.cast("double")
    m.select(
      col("k").as("n_ranks"),
      when(den =!= lit(0).cast("decimal(38,0)"), slope).as("slope"),
      when(
        den =!= lit(0).cast("decimal(38,0)"),
        col("sy").cast("double") / 10000.0 / col("k").cast("double") -
          slope * (col("sx").cast("double") / 10000.0 / col("k").cast("double"))
      ).as("intercept")
    )
  }

  /** Per-doc out-of-vocabulary rate against an explicit vocabulary
    * table — the "how much of this document will a fixed tokenizer /
    * embedding vocab actually cover?" gate run before spending training
    * compute on it (high OOV ⇒ wrong language, OCR garbage, code in a
    * prose corpus). The vocabulary is an at-rest (`tokenCol`) table —
    * [[topTokens]] output, a shipped tokenizer vocab, or a
    * `SketchIngest`-maintained count table — so swapping tokenizers
    * never rescans the corpus.
    *
    * Shape: the corpus explode is the scan; the vocab (bytes-scale for
    * any real token alphabet) BROADCASTS into a left join, count + agg
    * partial-aggregate map-side. Token-less docs (null/empty/no-token
    * text) keep a (0, 0, 0.0) row — the left join back to `df`, the
    * [[graft.ops.Bpe.tokenCounts]] convention. `oov_rate` is
    * `floor(n_oov·10⁴/n_tokens)/10⁴` (the trunc4 discipline — one
    * exact integer·10⁴ division, no accumulated doubles).
    */
  def oovRate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocab: DataFrame,
      tokenCol: String = "token"
  ): DataFrame = {
    val counts = df
      .select(col(idCol).as("doc_id"), explode(Fns.tokens(col(textCol))).as("token"))
      .join(
        broadcast(vocab.select(col(tokenCol).as("token"), lit(true).as("__in_vocab"))),
        Seq("token"),
        "left"
      )
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("__in_vocab").isNull, 1L)), lit(0L)).as("n_oov")
      )
    df.select(col(idCol).as("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(
          col("n_tokens").isNotNull && col("n_tokens") > 0,
          floor(col("n_oov").cast("double") * lit(10000.0) / col("n_tokens").cast("double")) /
            lit(10000.0)
        ).otherwise(lit(0.0)).as("oov_rate")
      )
  }

  /** Data-mix drift monitoring: how far each source's token
    * distribution sits from the whole corpus's, over the corpus's
    * top-`topK` tokens — total-variation distance (0.5 * L1) and
    * chi-square, the two standard mixture-drift alarms for a training
    * pipeline ("did the crawler's source composition shift?").
    *
    * Determinism contract (what makes the driver check hash-exact):
    * every per-cell term uses only IEEE-exact double ops (integer-count
    * divisions, subtract, multiply, abs — NO libm like ln/pow, whose
    * last-ulp behavior differs across engines), and terms are cast to
    * DECIMAL(30,12) BEFORE the per-source sum, so the aggregation is
    * exact and order-independent — a plain double sum would hash
    * differently run to run with partition order. Top-K ties break on
    * (count desc, token asc).
    *
    * Scale: ONE wordcount-shaped shuffle over the corpus — the
    * (source, token) counts — from which corpus totals, the top-K, and
    * the per-source restriction are all tiny re-aggregations (a naive
    * formulation explodes and scans the text twice); the
    * (sources x topK) grid materializes absent cells so tokens a
    * source never emits still contribute |0 - q|.
    */
  def sourceDivergence(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      topK: Int = 200
  ): DataFrame = {
    val toks = df.select(col(sourceCol).as("source"), explode(Fns.tokens(col(textCol))).as("w"))
    val sw = toks.groupBy("source", "w").agg(count(lit(1)).as("cs"))
    val top = sw
      .groupBy("w")
      .agg(sum(col("cs")).as("cq"))
      .orderBy(col("cq").desc, col("w").asc)
      .limit(topK)
    val totQ = top.agg(sum(col("cq")).as("tq"))
    val srcCnt = sw.join(broadcast(top.select("w")), Seq("w"))
    val grid = sw
      .select("source")
      .distinct()
      .crossJoin(broadcast(top))
      .join(srcCnt.select("source", "w", "cs"), Seq("source", "w"), "left")
      .na
      .fill(0L, Seq("cs"))
    val totS = grid.groupBy("source").agg(sum(col("cs")).as("ts"))
    val p = col("cs").cast("double") / col("ts").cast("double")
    val q = col("cq").cast("double") / col("tq").cast("double")
    grid
      .join(totS, "source")
      .filter(col("ts") > 0)
      .crossJoin(broadcast(totQ))
      .withColumn("tv_term", (abs(p - q) / lit(2.0)).cast("decimal(30,12)"))
      .withColumn("chi2_term", ((p - q) * (p - q) / q).cast("decimal(30,12)"))
      .groupBy("source")
      .agg(
        sum(col("tv_term")).cast("double").as("tv_div"),
        sum(col("chi2_term")).cast("double").as("chi2_div"),
        sum(col("cs")).as("top_tokens")
      )
  }

  /** Corpus-relative frequency scoring — the libm-free stand-in for a
    * CCNet-style LM quality filter (Wenzek et al. '20 score docs by LM
    * perplexity; the cheap first approximation is "how common are this
    * doc's tokens in the corpus itself"): per doc, the mean corpus
    * document-frequency of its token OCCURRENCES and the fraction of
    * occurrences whose token is rare. Gibberish / OCR noise scores a
    * high rare fraction and low mean df; boilerplate scores the
    * opposite — both tails are what a curation pass cuts.
    *
    * Determinism contract: NO logs (libm last-ulp differs across
    * engines — the same reason [[sourceDivergence]] uses TV distance,
    * not KL). The rare rule is pure integer math
    * (`df * 1000 <= n_docs * rarePermille`, no float threshold), sums
    * are BIGINT-exact, and each output double is ONE IEEE division of
    * two exact longs — hash-identical in any engine.
    *
    * Scale: a wordcount-shaped distinct + agg for document frequencies,
    * one equi-join of occurrences with the df table on token (small
    * vocabularies broadcast automatically; web-scale vocabularies
    * shuffle on token, which AQE handles), one per-doc agg. The corpus
    * row count rides along as a broadcast scalar.
    */
  def corpusFrequencyScore(
      df: DataFrame,
      textCol: String,
      idCol: String,
      rarePermille: Int = 100
  ): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), explode(Fns.tokens(col(textCol))).as("token"))
    val docFreq = toks.distinct().groupBy("token").agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    toks
      .join(docFreq, "token")
      .crossJoin(broadcast(n))
      .withColumn(
        "rare",
        when(col("df") * 1000 <= col("n_docs") * rarePermille, 1L).otherwise(0L)
      )
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("df")).as("sum_df"),
        sum(col("rare")).as("rare_tokens")
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("sum_df").cast("double") / col("n_tokens").cast("double")).as("mean_df"),
        (col("rare_tokens").cast("double") / col("n_tokens").cast("double")).as("rare_frac")
      )
  }

  /** TF-IDF per (doc, token): tf = in-doc occurrences, idf =
    * ln((N+1)/(df+1)) with N = corpus size. Two aggregations + one
    * broadcast-joined scalar; weights truncated to 4 decimals (ln is
    * irrational — truncation only guards the engine half-rule).
    */
  def tfIdf(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), explode(Fns.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(docFreq, "token")
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"),
        col("token"),
        col("tf"),
        (floor(
          col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")) * 10000
        ) / 10000).as("tfidf")
      )
  }

  /** Repetition/format quality signals in the style of the Gopher rules
    * (Rae et al. '21 §A1.1): duplicate-line fraction (by count and by
    * character mass), mean word length, fraction of alphabetic words —
    * the cheap structural filters a curation pipeline runs before any
    * model-based scorer. Pure per-row array expressions; the line array
    * is materialized in its own projection so the nested per-line scans
    * read a computed value instead of re-splitting the text.
    */
  def gopherQuality(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    def trunc4(c: Column): Column = floor(c * 10000) / 10000
    val withLines = df.select(
      col(idCol).as("doc_id"),
      col(textCol).as("_text"),
      filter(split(col(textCol), "\n"), l => trim(l) =!= "").as("_lines"),
      Fns.tokens(col(textCol)).as("_toks")
    )
    val nLines = size(col("_lines"))
    val nDupLines = nLines - size(array_distinct(col("_lines")))
    // character mass of lines occurring more than once (each occurrence
    // counts). O(n log n) per row: sort the line array and fold over
    // adjacent runs — a run of k>1 copies of a length-L line contributes
    // k*L (the first copy is credited retroactively when the second one
    // is seen). The naive per-line multiplicity scan is O(n²) and makes
    // a single 50k-line crawled document a multi-minute straggler task.
    // `prev` starts as NULL (never equal to a real line — blank lines
    // were filtered out above, and `===` is null-safe false here).
    val dupChars = aggregate(
      array_sort(col("_lines")),
      struct(
        lit(null).cast("string").as("prev"),
        lit(0).as("run"),
        lit(0L).as("tot")
      ),
      (acc, l) =>
        struct(
          l.as("prev"),
          when(l === acc("prev"), acc("run") + 1).otherwise(lit(1)).as("run"),
          (acc("tot") + coalesce(
            when(
              l === acc("prev"),
              when(acc("run") === 1, length(l).cast("long") * 2L)
                .otherwise(length(l).cast("long"))
            ),
            lit(0L)
          )).as("tot")
        ),
      acc => acc("tot")
    )
    val totalChars = aggregate(col("_lines"), lit(0L), (acc, l) => acc + length(l))
    val nWords = size(col("_toks"))
    val charSum = aggregate(col("_toks"), lit(0L), (acc, t) => acc + length(t))
    val alphaWords = size(filter(col("_toks"), t => t.rlike("[a-z]")))
    withLines.select(
      col("doc_id"),
      nLines.cast("long").as("n_lines"),
      nDupLines.cast("long").as("n_dup_lines"),
      trunc4(nDupLines.cast("double") / nLines.cast("double")).as("frac_dup_lines"),
      trunc4(dupChars.cast("double") / totalChars.cast("double")).as("frac_chars_dup_lines"),
      trunc4(charSum.cast("double") / nWords.cast("double")).as("mean_word_len"),
      trunc4(alphaWords.cast("double") / nWords.cast("double")).as("frac_alpha_words")
    )
  }

  /** Per-gram repetition mass inside ONE document: fold the sorted
    * n-gram array tracking adjacent runs — `best` is the char mass of
    * the most frequent n-gram (count x gram chars), `dup` the total
    * mass of n-grams occurring more than once (every occurrence
    * counts, the standard Gopher approximation; overlaps are not
    * de-overlapped). Same O(g log g) sort+fold shape as
    * [[gopherQuality]]'s dup-line scan. Gram char length is
    * `length(gram) - (n-1)` — the single-space joins subtracted.
    */
  private def gramMassStats(toks: Column, n: Int): Column = {
    val grams = when(
      size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    ).otherwise(array().cast("array<string>"))
    aggregate(
      array_sort(grams),
      struct(
        lit(null).cast("string").as("prev"),
        lit(0).as("run"),
        lit(0L).as("best"),
        lit(0L).as("dup")
      ),
      (acc, g) => {
        val len = (length(g) - lit(n - 1)).cast("long")
        val newRun = when(g === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(
          g.as("prev"),
          newRun.as("run"),
          greatest(acc("best"), newRun.cast("long") * len).as("best"),
          (acc("dup") + coalesce(
            when(g === acc("prev"), when(acc("run") === 1, len * 2L).otherwise(len)),
            lit(0L)
          )).as("dup")
        )
      },
      acc => struct(acc("best").as("best"), acc("dup").as("dup"))
    )
  }

  /** The n-gram half of the Gopher repetition suite (the line half
    * lives in [[gopherQuality]]): per doc, the char fraction held by
    * the single most frequent 2-/3-gram (boilerplate phrasing) and the
    * char mass fraction of duplicated 5-grams (long-span repetition).
    * Fractions are capped at 1.0 (occurrence mass over-counts
    * overlapping spans) and truncated to 4 decimals, denominated in
    * token chars.
    *
    * Scale: entirely map-side — each doc folds its own sorted n-gram
    * arrays ([[gramMassStats]]); NO explode, NO shuffle at any corpus
    * size. The oracle replays the same math relationally
    * (unnest + GROUP BY + max/sum), so the driver check also guards
    * the fold against an independent formulation.
    */
  def ngramRepetition(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    def trunc4(c: Column): Column = floor(c * 10000) / 10000
    // the op is otherwise entirely map-side, so with a one-split scan
    // the three sort+fold passes per doc run on ONE core; spreading
    // first costs a tiny shuffle of the raw rows and runs the folds
    // cores-wide (guide §2.5; no-op on well-partitioned input)
    val base = Spread
      .byKey(df.select(col(idCol).as("doc_id"), col(textCol).as("_n_text")), col("doc_id"))
      .select(col("doc_id"), Fns.tokens(col("_n_text")).as("_toks"))
    val charSum = aggregate(col("_toks"), lit(0L), (acc, t) => acc + length(t))
    def frac(mass: Column): Column =
      when(
        col("_tc") > 0,
        trunc4(least(lit(1.0), mass.cast("double") / col("_tc").cast("double")))
      ).otherwise(lit(0.0))
    base
      .select(
        col("doc_id"),
        charSum.as("_tc"),
        gramMassStats(col("_toks"), 2).as("_g2"),
        gramMassStats(col("_toks"), 3).as("_g3"),
        gramMassStats(col("_toks"), 5).as("_g5")
      )
      .select(
        col("doc_id"),
        frac(col("_g2.best")).as("top2_frac"),
        frac(col("_g3.best")).as("top3_frac"),
        frac(col("_g5.dup")).as("dup5_frac")
      )
  }

  /** Context-window chunking: split each document into fixed-size token
    * chunks with `overlap` tokens of left context — the standard prep
    * step that turns variable-length documents into training sequences
    * (chunk i covers tokens [i*stride, i*stride + chunkTokens), stride
    * = chunkTokens - overlap). A trailing window that would contain no
    * NEW tokens is not emitted; any non-empty doc yields at least its
    * one (possibly short) chunk. Output: (doc_id, chunk_id, chunk_text,
    * n_tokens).
    *
    * Scale: map-side only — one `posexplode` per doc over locally
    * computed slices, no shuffle; output row count is
    * ~corpus_tokens/stride regardless of document skew. The chunk-count
    * formula uses floor division on a possibly-negative numerator, so
    * it is written as floor(/) + greatest(0, .) — identical semantics
    * in Spark and DuckDB (plain integer `div` truncates toward zero in
    * Spark but floors in DuckDB; the clamp makes the difference moot).
    */
  def chunkDocuments(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens > overlap >= 0")
    val stride = chunkTokens - overlap
    val base = df
      .select(col(idCol).as("doc_id"), Fns.tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) > 0)
    val maxIdx = greatest(
      lit(0),
      floor((size(col("_toks")) - lit(overlap + 1)).cast("double") / lit(stride))
    ).cast("int")
    base
      .select(
        col("doc_id"),
        posexplode(
          transform(sequence(lit(0), maxIdx), i => slice(col("_toks"), i * stride + 1, lit(chunkTokens)))
        )
      )
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens")
      )
  }

  /** PII redaction: replace emails and URLs with placeholder tags and
    * count the replacements — the standard scrub pass before training.
    * Regexes stay in the RE2-compatible subset so the same pattern text
    * runs identically under Java regex (Spark) and RE2 (the oracle).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"

  def redactPii(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      regexp_replace(regexp_replace(col(textCol), emailRe, "<EMAIL>"), urlRe, "<URL>")
        .as("redacted"),
      size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(urlRe), lit(0))).cast("long").as("n_urls")
    )

  /** Document fingerprint: md5 of the normalized token stream, plus the
    * size of each fingerprint's duplicate group. Normalization = lower,
    * strip non-alnum, collapse whitespace — robust to formatting-only
    * variation.
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = md5(concat_ws(" ", Fns.tokens(col(textCol))))
    val w = Window.partitionBy(col("fingerprint"))
    df.select(col(idCol).as("doc_id"), fp.as("fingerprint"))
      .withColumn("n_same", count(lit(1)).over(w))
  }

  /** Approximate top-k tokens (heavy hitters) in ONE pass with ZERO
    * shuffles — the scale path beside the exact [[topTokens]] (whose
    * explode + groupBy shuffles every distinct token per partition).
    * Each partition counts its tokens locally and emits (a) its local
    * top-`candidatesPerPartition` tokens and (b) a Count-Min sketch of
    * ALL its token occurrences; the driver merges the sketches (an
    * O(partitions) reduce of KB-sized arrays — bounded by sketch sizing,
    * not data) and ranks the candidate union by sketch estimate.
    *
    * Guarantees: CMS never underestimates, and overestimates by at most
    * eps*N with probability `confidence` — so a reported count is within
    * [true, true + eps*N]. Candidate recall is heuristic (a global heavy
    * hitter could in principle hide below every local top-m) but exact
    * on Zipfian text for m >> k; the spec pins approx top-k == exact
    * top-k on the real corpus.
    */
  def approxTopTokens(
      df: DataFrame,
      textCol: String,
      k: Int,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      candidatesPerPartition: Int = 200
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perPartition = df
      .select(Fns.tokens(col(textCol)).as("toks"))
      .as[Seq[String]]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        val cms = org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, 42)
        it.foreach(_.foreach { t =>
          counts.update(t, counts.getOrElse(t, 0L) + 1L)
          cms.addString(t)
        })
        if (counts.isEmpty) Iterator.empty
        else {
          val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }
            .take(candidatesPerPartition).map(_._1)
          val bos = new java.io.ByteArrayOutputStream()
          cms.writeTo(bos)
          Iterator.single((top, bos.toByteArray))
        }
      }
      .collect() // one row per non-empty partition, KBs each
    if (perPartition.isEmpty) {
      return spark.emptyDataFrame
        .select(lit("").as("token"), lit(0L).as("est_count")).limit(0)
    }
    val merged = perPartition
      .map { case (_, bytes) =>
        org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bytes))
      }
      .reduce((a, b) => { a.mergeInPlace(b); a })
    val ranked = perPartition
      .iterator.flatMap(_._1).toSeq.distinct
      .map(t => (t, merged.estimateCount(t)))
      .sortBy { case (t, c) => (-c, t) }
      .take(k)
    ranked.toDF("token", "est_count")
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * n-gram with an evaluation set (the standard n-gram-overlap test-set
    * contamination check, e.g. GPT-3 appendix C / PaLM §8 style, at
    * configurable n). Returns one row per training doc:
    * `(doc_id, n_shared, contaminated)` where `n_shared` counts DISTINCT
    * shared n-grams.
    *
    * Scale shape: the eval side is a benchmark — tiny relative to the
    * corpus — so its distinct-shingle vocabulary is broadcast and the
    * corpus side never shuffles for the match (map-side broadcast
    * semi-join of exploded shingles). Only MATCHED shingle rows (rare)
    * reach the per-doc count shuffle, and the final flag join sees one
    * row per contaminated doc — AQE broadcasts it back onto the corpus.
    * Shingling itself is the native one-pass tokenize/shingle pair
    * ([[graft.plans.TextExpressions]]).
    */
  def decontaminate(
      docs: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13
  ): DataFrame = {
    val evalShingles = Dedup
      .shingleSets(evalSet, textCol, idCol, n)
      .select(explode(col("shingles")).as("sh"))
      .distinct()
    val matched = Dedup
      .shingleSets(docs, textCol, idCol, n)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc
    docs
      .select(col(idCol).as("doc_id"))
      .join(matched, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated")
      )
  }

  /** EMBEDDING-level benchmark decontamination (round 14):
    * [[decontaminate]]'s n-gram overlap misses PARAPHRASED eval
    * contamination — a reworded test question shares no 13-gram with
    * its source but sits at cosine ≈ 1 in embedding space. Probe the
    * corpus against the eval set via hyperplane-LSH banding + exact-
    * cosine confirm ([[Dedup.semanticNearDupsAgainst]] — the same
    * seeded planes, band equi-join, and raw-vector verify the q148
    * oracle replays bit-exactly), then flag per corpus doc.
    *
    * Scale shape: the eval side is benchmark-sized, so its band rows
    * broadcast and the corpus never shuffles for the match; only
    * band-collided pairs pay the exact cosine. Returns one row per
    * corpus doc — (doc_id, n_matches, max_cs4, contaminated) — the
    * [[decontaminate]] contract, with max_cs4 = max round(cosine, 4)
    * over matched eval docs (null when clean: "no similarity" is not
    * similarity 0).
    */
  def semanticDecontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      threshold: Double = 0.85,
      bands: Int = 4,
      bitsPerBand: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val hits = Dedup.semanticNearDupsAgainst(
      corpus, evalSet, vecCol, idCol, dim,
      bands = bands, bitsPerBand = bitsPerBand, seed = seed, threshold = threshold)
    flagCorpus(corpus, idCol, hits)
  }

  /** [[semanticDecontaminate]] against an at-rest embedding-LSH index
    * of the CORPUS ([[Dedup.writeEmbeddingLshIndex]]) — decontaminate
    * 100 TB without rescanning it: the eval probe prunes to matching
    * buckets only. Returns ONLY flagged docs (doc_id, n_matches,
    * max_cs4) — emitting a clean-flag row per corpus doc would be a
    * full index scan, exactly what the at-rest form exists to avoid;
    * anti-join the result against the corpus to drop contaminated docs.
    * Spec-pinned equal to the inline form's flagged subset
    * (SemanticDecontaminateSpec).
    */
  def semanticDecontaminateAtRest(
      spark: org.apache.spark.sql.SparkSession,
      evalSet: DataFrame,
      table: String,
      vecCol: String,
      idCol: String,
      dim: Int,
      threshold: Double = 0.85,
      bands: Int = 4,
      bitsPerBand: Int = 4,
      seed: Long = 42L
  ): DataFrame =
    aggHits(
      Dedup.incrementalSemanticNearDups(
        spark, evalSet, table, vecCol, idCol, dim,
        bands = bands, bitsPerBand = bitsPerBand, seed = seed, threshold = threshold)
    ).select(col("doc_id"), col("n_matches"), col("max_cs4"))

  private def aggHits(hits: DataFrame): DataFrame =
    hits
      .groupBy(col("i").as("doc_id"))
      .agg(
        count(lit(1)).as("n_matches"),
        max(round(col("cosine"), 4)).as("max_cs4")
      )

  private def flagCorpus(corpus: DataFrame, idCol: String, hits: DataFrame): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"))
      .join(aggHits(hits), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("max_cs4"),
        col("n_matches").isNotNull.as("contaminated")
      )

  /** Per-doc n-gram novelty against a REFERENCE corpus — the
    * memorization/freshness QA stat: what fraction of a document's
    * distinct n-token shingles has the reference corpus never seen?
    * (novelty ≈ 0 ⇒ the doc is recombined reference text — dedup/
    * decontaminate territory; novelty ≈ 1 ⇒ genuinely new content or
    * noise — route to quality scoring.) [[decontaminate]] answers
    * "does this doc overlap a SMALL eval set" with a broadcast;
    * here the reference is corpus-sized, so the gram join is a
    * shuffle equi-join on the shingle — the [[splitLeakage]] shape.
    *
    * Output: one row per input doc — (doc_id, n_shingles, n_seen,
    * novelty). Docs with fewer than n tokens have no shingles:
    * n_shingles = 0 and novelty null (undefined, not 0 or 1).
    * `novelty` is the trunc4 rate floor((n_shingles−n_seen)·10⁴ /
    * n_shingles)/10⁴.
    */
  def novelty(
      docs: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3
  ): DataFrame = {
    val refSh = Dedup
      .shingleSets(reference, textCol, idCol, n)
      .select(explode(col("shingles")).as("sh"))
      .distinct()
      .withColumn("_seen", lit(true))
    val perDoc = Dedup
      .shingleSets(docs, textCol, idCol, n)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .join(refSh, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"), // shingles are distinct per doc
        coalesce(sum(when(col("_seen"), 1L).otherwise(0L)), lit(0L)).as("n_seen")
      )
    docs
      .select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        when(
          col("n_shingles") > 0,
          floor(
            (col("n_shingles") - col("n_seen")).cast("double") * 10000.0 /
              col("n_shingles").cast("double")
          ) / 10000.0
        ).as("novelty")
      )
  }

  /** Split-leakage report — the QA artifact a train/val/test carve
    * ships with: after [[Sampling.assignSplit]]'s deterministic
    * md5-bucket assignment, how many documents of each held-out split
    * share at least one n-token shingle with the TRAIN split (the
    * split-level complement of [[decontaminate]], which checks one doc
    * set against a small eval vocabulary — here the reference side is
    * the train corpus itself, so the gram join is a shuffle equi-join
    * on the shingle, never a broadcast). One row per held-out split:
    * doc count, contaminated count, truncated fraction.
    *
    * Scale shape: shingle explode (linear), one distinct over train
    * grams, one semi-join on the gram string, two tiny aggregations —
    * the same corpus-gram-join shape as the duplicate-substring family.
    */
  def splitLeakage(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      splits: Seq[(String, Double)],
      trainSplit: String = "train",
      n: Int = 3
  ): DataFrame = {
    require(splits.exists(_._1 == trainSplit), s"splits must include '$trainSplit'")
    val labeled = Sampling.assignSplit(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("_text")),
      "doc_id",
      splits
    )
    // shingle with the split label carried THROUGH the projection (r19)
    // — the former shingleSets + re-join on doc_id shuffled the gram
    // table once more just to restore one small column (guide §2.4);
    // same distinct-shingle expression, same gram multiset per doc
    val grams = Spread
      .byKey(labeled.select(col("doc_id"), col("split"), col("_text")), col("doc_id"))
      .select(
        col("doc_id"),
        col("split"),
        graft.plans.TextExpressions
          .distinctShingles(graft.functions.Fns.tokens(col("_text")), n)
          .as("shingles")
      )
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("split"), explode(col("shingles")).as("sh"))
    val trainSh = grams.filter(col("split") === trainSplit).select(col("sh")).distinct()
    val contaminated = grams
      .filter(col("split") =!= trainSplit)
      .join(trainSh, Seq("sh"), "left_semi")
      .select(col("split"), col("doc_id"))
      .distinct()
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_contaminated"))
    labeled
      .filter(col("split") =!= trainSplit)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .join(contaminated, Seq("split"), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .select(
        col("split"),
        col("n_docs"),
        col("n_contaminated"),
        (floor(col("n_contaminated").cast("double") / col("n_docs") * 10000) / 10000)
          .as("frac_contaminated")
      )
  }

  /** Corpus-level boilerplate removal (the CCNet/MassiveText pass that
    * strips headers, footers, cookie banners and license stubs): cut
    * each document into non-overlapping `segTokens`-token segments, call
    * a segment boilerplate when its normalized text occurs in at least
    * `minDocs` DISTINCT documents, and rebuild each document from its
    * surviving segments (in order). Returns one row per input doc:
    * segment counts, the boilerplate fraction, and the cleaned text
    * (null when every segment was boilerplate — nothing survives).
    *
    * Reference semantics: the reference has no corpus-frequency pass
    * (its cleaning is per-cell, `processing.py:text_clean`-family); this
    * is part of the LLM-curation superset, after CCNet §3 / Rae et al.
    * (Gopher) App. A — implemented from the papers' descriptions.
    *
    * Scale shape: one explode (linear in corpus tokens), one
    * aggregation shuffled on segment text to find the frequent set, and
    * a BROADCAST join back — the boilerplate set is small by
    * construction (only segments clearing `minDocs` survive the
    * HAVING), so the per-segment flagging never shuffles the corpus a
    * second time. Reconstruction is one groupBy on doc_id with an
    * array_sort over (pos, seg) structs — deterministic under Spark's
    * nondeterministic collect order.
    */
  def stripBoilerplate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int,
      minDocs: Int
  ): DataFrame = stripBoilerplate(df, textCol, idCol, segTokens, minDocs, Nil)

  /** [[stripBoilerplate]] carrying extra per-doc columns of `df`
    * through to the output (the positionBuckets `extra` convention) —
    * a composed pipeline keeps its flags without re-joining the
    * stripped corpus on the id (one corpus shuffle saved; guide §2.4).
    */
  def stripBoilerplate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int,
      minDocs: Int,
      extra: Seq[String]
  ): DataFrame = {
    require(segTokens > 0 && minDocs > 1, "need segTokens > 0, minDocs > 1")
    val segs = segmentsOf(df, textCol, idCol, segTokens, extra)
    val boiler = segs
      .groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("seg"), lit(true).as("_boiler"))
    rebuildDocs(flagAgainst(segs, boiler), extra)
  }

  /** Addition-mergeable segment-count fold: one (seg, n) row per
    * distinct segment of the batch, n = the number of batch docs
    * containing it — the keyed-count shape
    * `SketchIngest.ingestCountBatch` maintains at rest, so a corpus's
    * boilerplate frequencies can be kept live by a stream. Folding
    * disjoint doc sets and merging by addition equals folding their
    * union in one pass (countDistinct per batch + docs appearing once
    * across batches), which is what makes
    * [[stripBoilerplateFromModel]] over the streamed model equal
    * [[stripBoilerplate]] over the batch corpus (spec-pinned). A doc
    * resubmitted in a LATER batch reinforces its segments' counts —
    * the same documented stream-fit trade as the surprisal model.
    * NOTE the state is vocabulary-sized (one row per distinct
    * segment); [[boilerFoldCms]] is the bounded-state form for
    * corpora whose segment universe outgrows a rewrite-per-batch
    * table.
    */
  def boilerFold(textCol: String, idCol: String, segTokens: Int): DataFrame => DataFrame = {
    require(segTokens > 0, "need segTokens > 0")
    b =>
      segmentsOf(b, textCol, idCol, segTokens)
        .groupBy(col("seg"))
        .agg(countDistinct(col("doc_id")).as("n"))
  }

  /** [[stripBoilerplate]] with the frequent-segment set taken from an
    * AT-REST (seg, n) model ([[boilerFold]] counts, merged by
    * addition) instead of being recomputed from `df` — the streaming
    * stage-0 form: the corpus pass that found the frequencies already
    * happened, so this is ONE explode plus a broadcast of the
    * `n >= minDocs` survivors; `df` is never shuffled. Identical
    * output to [[stripBoilerplate]] when the model is the fold of the
    * same docs.
    */
  def stripBoilerplateFromModel(
      df: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int,
      minDocs: Int,
      model: DataFrame
  ): DataFrame = {
    require(segTokens > 0 && minDocs > 1, "need segTokens > 0, minDocs > 1")
    val boiler = model
      .filter(col("n") >= minDocs)
      .select(col("seg"), lit(true).as("_boiler"))
    rebuildDocs(flagAgainst(segmentsOf(df, textCol, idCol, segTokens), boiler))
  }

  /** [[boilerFold]]'s BOUNDED-state alternative: a count-min sketch of
    * the distinct-doc segment frequencies. The exact (seg, n) model is
    * vocabulary-sized — one row per distinct segment, so the at-rest
    * table (and each streaming merge, which rewrites it) grows with
    * the corpus; fine to ~10^7 segments, a trap at 100 TB. The CMS is
    * `depth × width` long cells regardless of corpus size: each batch
    * segment increments `depth` hashed cells once per containing doc
    * (per-batch distinct first, same distinct-doc semantic as the
    * exact fold), cells merge by addition, and a segment's estimated
    * frequency is the MIN over its cells — never an underestimate, so
    * the error is ONE-SIDED: every truly-frequent segment is flagged,
    * and a rare segment is over-stripped only when all `depth` of its
    * cells collide with frequent mass (probability ≈ (collisions/width)^depth).
    * Output rows: (bucket, n) with bucket = d·width + h_d(seg).
    */
  def boilerFoldCms(
      textCol: String,
      idCol: String,
      segTokens: Int,
      depth: Int = 4,
      width: Int = 1 << 16
  ): DataFrame => DataFrame = {
    require(segTokens > 0 && depth > 0 && width > 0, "need segTokens/depth/width > 0")
    b =>
      segmentsOf(b, textCol, idCol, segTokens)
        .select(col("doc_id"), col("seg"))
        .distinct()
        .select(col("seg"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
        .select(
          (col("d").cast("long") * width +
            pmod(xxhash64(col("seg"), col("d")), lit(width.toLong))).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
  }

  /** [[stripBoilerplateFromModel]] against a count-min sketch from
    * [[boilerFoldCms]] (addition-merged cells): the CMS is BOUNDED, so
    * it collects to the driver and rides the plan as ONE array
    * literal — flagging is a pure projection (`depth` element_at
    * lookups + a min), no join at all; `df` is never shuffled and
    * nothing is broadcast per-row. Over-strip is one-sided (object
    * note on [[boilerFoldCms]]); an exact-match spec pins parity with
    * the exact model when no cell collides.
    */
  def stripBoilerplateFromCms(
      df: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int,
      minDocs: Int,
      cms: DataFrame,
      depth: Int = 4,
      width: Int = 1 << 16
  ): DataFrame = {
    require(segTokens > 0 && minDocs > 1, "need segTokens > 0, minDocs > 1")
    require(depth > 0 && width > 0 && depth.toLong * width <= (1L << 24),
      "CMS must stay bounded (depth * width <= 16M cells)")
    val cells = new Array[Long](depth * width)
    cms.select(col("bucket"), col("n")).collect().foreach { r =>
      val b = r.getLong(0)
      require(b >= 0 && b < cells.length, s"CMS bucket $b outside depth*width")
      cells(b.toInt) = r.getLong(1)
    }
    val arr = typedLit(cells.toSeq)
    val est = (0 until depth)
      .map(d =>
        element_at(
          arr,
          (lit(d.toLong * width) + pmod(xxhash64(col("seg"), lit(d)), lit(width.toLong)))
            .cast("int") + 1))
      .reduce(least(_, _))
    rebuildDocs(
      segmentsOf(df, textCol, idCol, segTokens).withColumn("boiler", est >= minDocs))
  }

  /** WITHIN-document repeated-segment removal — the crawl artifact
    * [[stripBoilerplate]] cannot catch: a page that repeats its own
    * navigation block / footer / spam phrase dozens of times is
    * polluted even when no OTHER document shares the segment (Rae et
    * al. (Gopher) App. A's repetition filters MEASURE this; q62
    * profiles it — this op REMOVES it). A segment is repeated when the
    * same normalized text already occurred EARLIER in the same doc;
    * the first occurrence is kept, so a document always survives with
    * its content in order. Returns the [[stripBoilerplate]] row shape
    * with `n_repeated`/`frac_repeated` (trunc4) and `clean_text`.
    *
    * Scale shape: one segment explode + ONE window partitioned by
    * (doc_id, seg) — per-key executor state, no corpus-frequency pass,
    * no broadcast, no model; composes before/after the corpus-level
    * strip since both preserve (doc_id, pos) order.
    */
  def stripRepeatedSegments(
      df: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int
  ): DataFrame = {
    require(segTokens > 0, "need segTokens > 0")
    val w = Window.partitionBy(col("doc_id"), col("seg")).orderBy(col("pos"))
    rebuildDocs(
      segmentsOf(df, textCol, idCol, segTokens)
        .withColumn("boiler", row_number().over(w) > 1)
    )
      .withColumnRenamed("n_boiler", "n_repeated")
      .withColumnRenamed("frac_boiler", "frac_repeated")
  }

  /** Non-overlapping `segTokens`-token segments: (doc_id, pos, seg).
    * Zero-token docs produce no rows, so they vanish from every strip
    * output (the documented empty-doc behavior).
    */
  private def segmentsOf(
      df: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int,
      extra: Seq[String] = Nil
  ): DataFrame = {
    // spread the raw rows before tokenize + segment explode (guide
    // §2.5 — the scan's task count otherwise serializes the map pass;
    // Spread gates itself off on well-partitioned input). `extra`
    // names df columns carried through the explode (the positionBuckets
    // convention) so callers need no re-join on the id afterwards.
    val keep = col("doc_id") +: extra.map(col)
    val base = Spread
      .byKey(
        df.select(col(idCol).as("doc_id") +: extra.map(col) :+ col(textCol).as("_s_text"): _*),
        col("doc_id")
      )
      .select(keep :+ Fns.tokens(col("_s_text")).as("_toks"): _*)
      .filter(size(col("_toks")) > 0)
    val nSeg = ceil(size(col("_toks")).cast("double") / segTokens).cast("int")
    base
      .select(
        keep :+
          posexplode(
            transform(
              sequence(lit(0), nSeg - 1),
              i => concat_ws(" ", slice(col("_toks"), i * segTokens + 1, lit(segTokens)))
            )
          ): _*
      )
      .select(keep :+ col("pos") :+ col("col").as("seg"): _*)
  }

  private def flagAgainst(segs: DataFrame, boiler: DataFrame): DataFrame =
    segs
      .join(broadcast(boiler), Seq("seg"), "left")
      .withColumn("boiler", coalesce(col("_boiler"), lit(false)))

  private def rebuildDocs(flagged: DataFrame, extra: Seq[String] = Nil): DataFrame =
    flagged
      // extras are per-doc constants — grouping by them changes no
      // group and carries them through without a first()/re-join
      .groupBy(col("doc_id") +: extra.map(col): _*)
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
        sort_array(collect_list(when(!col("boiler"), struct(col("pos"), col("seg")))))
          .as("_kept")
      )
      .select(
        col("doc_id") +:
          col("n_segs") +:
          col("n_boiler") +:
          (floor(col("n_boiler") / col("n_segs") * 10000) / 10000).as("frac_boiler") +:
          when(size(col("_kept")) > 0,
            concat_ws(" ", transform(col("_kept"), s => s.getField("seg")))).as("clean_text") +:
          extra.map(col): _*
      )
}
