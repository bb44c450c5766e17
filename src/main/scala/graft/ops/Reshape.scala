package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reshaping operators — the signature ops of the reference pipeline
  * (SURVEY.md §2.10).
  */
object Reshape {

  /** R1 unpivot wide->long (reference `azuredatalake.py:170-221`: one
    * 2-column parquet per metric). Spark-native: ONE `unpivot` producing a
    * long table; the file-per-metric anti-pattern becomes
    * `partitionBy(metricCol)` at write time — same logical layout,
    * partition-pruned reads, no per-row files.
    */
  def unpivot(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      metricName: String = "metric",
      valueName: String = "value"
  ): DataFrame =
    df.unpivot(
      idCols.map(col).toArray,
      valueCols.map(col).toArray,
      metricName,
      valueName
    )

  /** R2 event->wide flatten (reference `consumer.py:259-319`): expand a
    * map payload into columns. The column set must be known at plan time
    * (collected from data only when `columns` is None — a driver-side
    * schema inference step, same as the reference's dynamic frames, to be
    * avoided on the hot path at scale).
    */
  def flattenMap(
      df: DataFrame,
      mapCol: String,
      columns: Option[Seq[String]] = None,
      prefix: String = ""
  ): DataFrame = {
    val cols = columns.getOrElse(
      df.select(explode(map_keys(col(mapCol)))).distinct().collect().map(_.getString(0)).toSeq.sorted
    )
    val flat = cols.map(c => element_at(col(mapCol), c).as(prefix + c))
    df.select(df.columns.filter(_ != mapCol).map(col).toIndexedSeq ++ flat: _*)
  }

  /** Pivot long->wide with an explicit value list (plan-time known column
    * set — two-pass pivot is a scale hazard; reference R2/R3 always knows
    * its columns).
    */
  def pivotCounts(
      df: DataFrame,
      groupCol: String,
      pivotCol: String,
      values: Seq[String]
  ): DataFrame =
    df.groupBy(col(groupCol)).pivot(pivotCol, values).count().na.fill(0L)
}
