package graft.ops

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve arithmetic — the shared math behind the
  * engine's multi-dimensional data-skipping layout
  * (`Sinks.writeZOrdered` is the write path that range-partitions and
  * sorts by these values; `sinks/ZOrderSpec` proves the file-pruning
  * win, `ops/ZOrderSpec` the both-dims-narrow locality property).
  * Rows close in EVERY clustering dimension land in the same files, so
  * min/max file statistics prune selective predicates on ANY of the
  * dimensions — not just the leading sort key. At 100 TB this is the
  * difference between a point-ish query reading ~√N of the files
  * (linear sort: all files for the non-leading dim) and it holding for
  * every clustered column at once.
  *
  * Reference semantics: the reference writes its lake unclustered
  * (`deltaprocessing.py:96-101` appends as-arrived); this is part of
  * the at-scale superset, after Morton 1966 and the Delta Lake
  * OPTIMIZE ZORDER design.
  *
  * Two rank flavors: [[rankOf]] is EXACT integer scaling (subtract,
  * multiply, integer-div — bit-identical in any engine, which is what
  * makes the q80 oracle hash-exact with no floating point anywhere);
  * `writeZOrdered`'s double-based scaling tolerates arbitrary numeric
  * columns where exactness doesn't matter (file assignment only).
  *
  * The 2-D bit-spread uses the classic mask-shift doubling (5
  * shift/or/and steps per column, all codegen'd `long` ops — no loops,
  * no UDFs): x = (x | x<<8) & 0x00FF00FF, then 4, 2, 1 with masks
  * 0x0F0F0F0F, 0x33333333, 0x55555555. N-dim falls back to the
  * bit-by-bit fold ([[interleaveN]]).
  */
object ZOrder {

  /** Max bits per dimension with the 2-D mask-shift spread. */
  val MaxBits = 16

  /** Spread a `bits`-wide non-negative integer so its bits occupy the
    * even positions: b_i moves to position 2i.
    */
  def spreadBits(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Rank a value into [0, 2^bits): `(v − lo) · (2^bits − 1) div (hi − lo)`
    * — exact integer scaling against known column bounds (take them
    * from one bounded min/max aggregation, a metastore, or domain
    * knowledge). Values are clamped into [lo, hi] first, mirroring
    * [[Sketches.binOf]]'s documented edge-bin trade. A degenerate
    * `hi == lo` (a constant clustering column — observed-bounds callers
    * hit this on single-valued data) ranks every row 0 instead of
    * requiring a non-empty range, mirroring `Sinks.writeZOrdered`'s
    * range guard: the dimension simply carries no ordering information.
    */
  def rankOf(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits > 0 && bits <= MaxBits, s"bits in 1..$MaxBits")
    require(hi >= lo, "need hi >= lo")
    if (hi == lo) return lit(0L)
    val clamped = least(greatest(v.cast("long"), lit(lo)), lit(hi))
    val scaled = (clamped - lit(lo)) * lit((1L << bits) - 1)
    GraftColumnBridge.column(
      IntegralDivide(
        GraftColumnBridge.expression(scaled),
        GraftColumnBridge.expression(lit(hi - lo))
      )
    )
  }

  /** Two-dimensional Morton value from two ranks in [0, 2^bits). */
  def interleave2(xRank: Column, yRank: Column): Column =
    spreadBits(xRank).bitwiseOR(shiftleft(spreadBits(yRank), 1))

  /** N-dimensional Morton value: output bit `b·ndims + d` = bit `b` of
    * dimension `d` (dimension 0 at the LSB — the same layout
    * [[interleave2]] produces, which specializes the 2-D case from
    * `bits × ndims` fold steps down to 5 shift/mask ops per column).
    * Used by `Sinks.writeZOrdered` for its 1–4-dim layouts.
    */
  def interleaveN(ranks: Seq[Column], bits: Int): Column = {
    require(ranks.nonEmpty, "need at least one rank column")
    if (ranks.size == 2 && bits <= MaxBits) interleave2(ranks(0), ranks(1))
    else
      (0 until bits)
        .flatMap(b => ranks.zipWithIndex.map { case (s, d) => (b, d, s) })
        .foldLeft(lit(0L)) { case (acc, (b, d, s)) =>
          acc.bitwiseOR(shiftleft(shiftright(s, b).bitwiseAND(1L), b * ranks.size + d))
        }
  }

  /** Z-value for two columns against explicit bounds. */
  def zValue2(
      x: Column, xLo: Long, xHi: Long,
      y: Column, yLo: Long, yHi: Long,
      bits: Int = MaxBits
  ): Column =
    interleave2(rankOf(x, xLo, xHi, bits), rankOf(y, yLo, yHi, bits))

}
