package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.8 F1-F13) as codegen'd Column
  * combinators — no UDFs anywhere; every helper composes built-in
  * `org.apache.spark.sql.functions`.
  */
object Fns {

  /** F1 `_sanitize_name` (reference `azuredatalake.py:35-40`):
    * keep alnum else `_`, collapse runs, strip leading/trailing `_`.
    */
  def sanitizeName(c: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(trim(c), "[^A-Za-z0-9]+", "_"), "^_+", ""),
      "_+$",
      ""
    )

  /** F2 metric safe_name (reference `azuredatalake.py:190-198`):
    * space->_, &->and, /->_, %->pct, strip parens.
    */
  def metricSafeName(c: Column): Column = {
    val noParens = regexp_replace(c, "[()]", "")
    val amp = regexp_replace(noParens, "&", "and")
    val pct = regexp_replace(amp, "%", "pct")
    regexp_replace(pct, "[ /]+", "_")
  }

  /** F4 file-id content hash (reference `app/app.py:109-112`). */
  def contentId(name: Column, content: Column): Column =
    concat(name, lit("_"), substring(md5(content), 1, 8))

  /** F5 company-id from filename (reference `app/app.py:537`). */
  def companyIdFromFilename(c: Column): Column =
    upper(element_at(split(regexp_replace(c, "\\.[^.]*$", ""), "-"), 1))

  /** F6 sheet-name parse (reference `app/app.py:623-624`):
    * "Balance-Sheet-TTM" -> (STATEMENT=Balance, FREQUENCY=TTM).
    */
  def statementOf(sheet: Column): Column =
    coalesce(element_at(split(sheet, "-"), 1), lit("GENERAL"))
  def frequencyOf(sheet: Column): Column =
    coalesce(element_at(split(sheet, "-"), -1), lit("ANNUAL"))

  /** F7 numeric coercion: invalid -> null (reference
    * `pd.to_numeric(errors='coerce')`, azuredatalake.py:208-211).
    * try_cast, not cast: under Spark 4's default ANSI mode a plain cast
    * THROWS on malformed strings instead of producing null.
    */
  def toNumeric(c: Column): Column = c.try_cast("double")

  /** F8 NaN -> null normalization, scalar and map forms
    * (reference `consumer.py:93-102`).
    */
  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)
  def mapNanToNull(m: Column): Column =
    transform_values(m, (_, v) => when(v === lit("NaN"), lit(null)).otherwise(v))

  /** Whitespace tokenization after punctuation strip — shared by the text
    * analysis / dedup operators. Lowercased, non-alnum -> space.
    * Delegates to the native [[graft.plans.Tokenize]] expression (one
    * byte scan per row); bit-identical to the composed
    * regexp_replace/split/filter form — pinned in TextExpressionsSpec.
    */
  def tokens(text: Column): Column = graft.plans.TextExpressions.tokenize(text)

  /** Word n-gram shingles from a token array: sliding windows of size n
    * joined by single spaces.
    *
    * Built by zipping n shifted copies of the array (`zip_with` +
    * `slice`), NOT by `transform(indices, i => slice(toks, i, n))`: a
    * lambda body re-evaluates every outer expression it references once
    * PER ELEMENT, which turns an upstream tokenization into O(len^2)
    * work per row (observed 11s for 5k docs before the rewrite, ~1s
    * after). Here each shifted copy is evaluated once per row; the tail
    * windows shorter than n zip with null and are filtered out (concat
    * propagates null, unlike concat_ws which would silently emit
    * shorter grams).
    */
  def shingles(toks: Column, n: Int): Column = {
    val grams = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), size(toks)), (a, b) => concat(a, lit(" "), b))
    }
    filter(grams, g => g.isNotNull)
  }

  /** Deterministic 64-bit hash family: h_i(x) = xxhash64(i, x) — the
    * family index is hashed together with the value (multi-arg xxhash64
    * chains the seed), giving independent functions without multiply-add
    * arithmetic that would trip ANSI overflow checks. Used by MinHash /
    * SimHash / LSH; reproducible run-to-run.
    */
  def hashFamily(c: Column, i: Int): Column = xxhash64(lit(i), c)

  /** Cosine similarity between two array<float/double> columns, in
    * double precision. Delegates to the native
    * [[graft.plans.CosineSimilarity]] expression (one primitive loop per
    * row, no intermediate arrays); bit-identical to the
    * `aggregate(zip_with(...))` fold formulation — asserted in
    * SurfaceSpec — because both sum left-to-right from 0.0.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity.cosineSim(a, b)

  /** L2-normalize an array<float/double> column (double precision). */
  def l2normalize(a: Column): Column = {
    val nrm = sqrt(
      aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    )
    transform(a, v => v.cast("double") / nrm)
  }
}
