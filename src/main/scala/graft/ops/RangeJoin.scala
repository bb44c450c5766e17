package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — absent from the reference
  * (SURVEY.md §2.3 lists theta/range/interval joins as absent) and not
  * an equi-join Spark can shuffle natively: `p.t BETWEEN i.lo AND i.hi`
  * alone plans as a broadcast-nested-loop, O(|P|x|I|) — a scale killer.
  *
  * Strategy (the standard chunked-interval-join): quantize time into
  * fixed `chunkSeconds` cells; a point lives in exactly one cell, an
  * interval covers ceil(len/chunk)+1 cells (exploded map-side via
  * `sequence`). Equi-join on (key, cell) co-locates every point with
  * every interval that could contain it, then the exact predicate
  * refines. ONE hash shuffle, no nested loop; each (point, interval)
  * pair meets in exactly one cell (the point's), so no dedup pass is
  * needed.
  *
  * Pick `chunkSeconds` near the typical interval length: much smaller
  * explodes long intervals over many cells; much larger packs unrelated
  * intervals into hot cells. Degenerate months-long intervals belong on
  * the broadcast path instead (they're rare by construction in
  * event-time data).
  */
object RangeJoin {

  /** @param points    one row per point; all columns pass through
    * @param intervals one row per interval; non-key columns whose name
    *                  collides with a point column return `prefix`ed
    * @param keys      equi-key columns present on BOTH sides
    * @param tCol      point timestamp column
    * @param loCol     interval start column (inclusive)
    * @param hiCol     interval end column (exclusive)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tCol: String,
      loCol: String,
      hiCol: String,
      chunkSeconds: Long = 86400L,
      prefix: String = "iv_"
  ): DataFrame = {
    val ivRenamed = intervals.columns.foldLeft(intervals) { (df, c) =>
      if (!keys.contains(c) && points.columns.contains(c)) df.withColumnRenamed(c, prefix + c)
      else df
    }
    def icol(c: String) =
      if (points.columns.contains(c) && !keys.contains(c)) prefix + c else c
    val cellOfT = floor(unix_micros(col(tCol).cast("timestamp")) / (chunkSeconds * 1000000L))
    val p = points.withColumn("_cell", cellOfT)
    val loCell = floor(unix_micros(col(icol(loCol)).cast("timestamp")) / (chunkSeconds * 1000000L))
    val hiCell = floor(unix_micros(col(icol(hiCol)).cast("timestamp")) / (chunkSeconds * 1000000L))
    val iv = ivRenamed.withColumn("_cell", explode(sequence(loCell, hiCell)))
    p.join(iv, keys :+ "_cell")
      .filter(col(tCol) >= col(icol(loCol)) && col(tCol) < col(icol(hiCol)))
      .drop("_cell")
  }

  /** Interval-overlap join: all (left, right) interval pairs per key
    * with `[lLo, lHi) ∩ [rLo, rHi) ≠ ∅`, by the same cell quantization.
    * An overlapping pair shares every cell of the intersection, so the
    * join would duplicate it — instead each pair is emitted ONLY from
    * the first cell of the intersection (`cell == floor(max(lLo, rLo))`)
    * — the standard dedup-free trick: one shuffle, no distinct pass.
    * Right columns return `prefix`ed where names collide.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lLoCol: String,
      lHiCol: String,
      rLoCol: String,
      rHiCol: String,
      chunkSeconds: Long = 86400L,
      prefix: String = "r_"
  ): DataFrame = {
    def cellOf(c: String) =
      floor(unix_micros(col(c).cast("timestamp")) / (chunkSeconds * 1000000L))
    val rightRenamed = right.columns.foldLeft(right) { (df, c) =>
      if (!keys.contains(c) && left.columns.contains(c)) df.withColumnRenamed(c, prefix + c)
      else df
    }
    def rcol(c: String) = if (left.columns.contains(c) && !keys.contains(c)) prefix + c else c
    val l = left.withColumn("_cell", explode(sequence(cellOf(lLoCol), cellOf(lHiCol))))
    val r = rightRenamed.withColumn("_cell", explode(sequence(cellOf(rcol(rLoCol)), cellOf(rcol(rHiCol)))))
    l.join(r, keys :+ "_cell")
      .filter(
        col(lLoCol) < col(rcol(rHiCol)) && col(rcol(rLoCol)) < col(lHiCol) &&
          // emit from the intersection's first cell only (dedup-free)
          col("_cell") === floor(
            unix_micros(greatest(col(lLoCol), col(rcol(rLoCol))).cast("timestamp")) /
              (chunkSeconds * 1000000L)
          )
      )
      .drop("_cell")
  }
}
