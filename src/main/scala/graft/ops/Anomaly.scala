package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native anomaly scoring replacing the reference's external Azure
  * Anomaly Detector call (reference `automl_anomaly_detection.py:120-141`:
  * granularity=daily, sensitivity=95, max_anomaly_ratio=0.25, minimum 12
  * points at `:112`).
  *
  * Model: rolling z-score. expected = trailing mean of the previous
  * `lookback` points (excluding current); score = |value - expected| /
  * trailing stddev; anomaly when score > threshold, capped so at most
  * `maxAnomalyRatio` of the series flags (the reference's knob) by
  * keeping only the top-scoring points when over the cap.
  *
  * Pure window expressions — scales as a single shuffle on the series
  * key; per-series state never leaves the executors.
  */
object Anomaly {

  /** Robust (median/MAD) outlier scoring — the outlier-resistant
    * complement of [[score]]'s rolling mean/stddev model: location =
    * per-group exact median, spread = median absolute deviation scaled
    * by the normal-consistency constant 1.4826, score = |x - med| /
    * (1.4826 * MAD). Extreme points inflate a stddev and mask each
    * other; median/MAD has a 50% breakdown point, so a contaminated
    * group still scores its outliers honestly — the standard DQ pass
    * over metric streams before alerting thresholds are trusted.
    *
    * Determinism: the interpolated exact `percentile` is the same
    * order statistic DuckDB's `quantile_cont` computes (parity pinned
    * by q51); deviations and the final division are single IEEE ops;
    * the consistency constant is one shared literal. MAD = 0 (more
    * than half the group identical) leaves the scale undefined —
    * score and flag are null rather than infinite.
    *
    * Scale: two grouped exact-percentile aggregations (one shuffle
    * each on the group key) + broadcast-sized joins of the per-group
    * stats back onto the rows. Exact percentile holds a per-group
    * value buffer — the one aggregation in the engine whose memory
    * grows with per-group distinct values, fine for low-cardinality
    * event types, not for billion-row high-cardinality groups. For
    * those, `exact = false` routes BOTH percentiles through
    * `approx_percentile` (GK sketch, bounded memory at `accuracy`
    * inverse-epsilon) — the medians shift within the sketch's rank
    * error and the robust-z scores with them (spec-pinned tolerance on
    * a skewed corpus); the flag is the same opt-in trade as the dedup
    * family's `maxBucket`, with exact as the oracle-grade default.
    */
  def robustScore(
      df: DataFrame,
      groupKeys: Seq[String],
      valueCol: String = "value",
      threshold: Double = 3.5,
      exact: Boolean = true,
      accuracy: Int = 10000
  ): DataFrame = {
    val keys = groupKeys.map(col)
    def p50(c: String): Column =
      if (exact) expr(s"percentile($c, 0.5)")
      else expr(s"approx_percentile($c, 0.5, $accuracy)")
    val med = df
      .groupBy(keys: _*)
      .agg(p50(valueCol).as("_med"))
    val dev = df
      .join(med, groupKeys)
      .withColumn("_dev", abs(col(valueCol) - col("_med")))
    val mad = dev
      .groupBy(keys: _*)
      .agg(p50("_dev").as("_mad"))
    val z = col("_dev") / (lit(1.4826) * col("_mad"))
    dev
      .join(mad, groupKeys)
      .withColumn("robust_z", when(col("_mad") > 0, z))
      .withColumn("is_anomaly", when(col("_mad") > 0, z > threshold))
      .drop("_med", "_dev", "_mad")
  }

  def score(
      series: DataFrame,
      partitionKeys: Seq[String],
      dateCol: String = "date",
      valueCol: String = "value",
      lookback: Int = 7,
      threshold: Double = 2.0,
      maxAnomalyRatio: Double = 0.25,
      minPoints: Int = 12
  ): DataFrame = {
    val pk = partitionKeys.map(col)
    val wOrd = Window.partitionBy(pk: _*).orderBy(col(dateCol))
    val wTrail = wOrd.rowsBetween(-lookback, -1)
    val wAll = Window
      .partitionBy(pk: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val scored = series
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("expected_value", avg(col(valueCol)).over(wTrail))
      .withColumn("_std", stddev_samp(col(valueCol)).over(wTrail))
      .withColumn(
        "score",
        // stddev floored at 1e-3: a constant baseline (std = 0) must not
        // hide a spike — |v - mean| / 0 would otherwise be score 0
        when(col("expected_value").isNull || col("_std").isNull, lit(0.0))
          .otherwise(
            abs(col(valueCol) - col("expected_value")) / greatest(col("_std"), lit(1e-3))
          )
      )
      .withColumn("expected_value", coalesce(col("expected_value"), col(valueCol)))

    // cap: rank anomaly candidates by score desc; only the top
    // floor(n * maxAnomalyRatio) may flag (reference max_anomaly_ratio)
    val wRank = Window.partitionBy(pk: _*).orderBy(col("score").desc, col(dateCol))
    scored
      .withColumn("_rank", row_number().over(wRank))
      .withColumn(
        "is_anomaly",
        col("_n") >= minPoints &&
          col("score") > threshold &&
          // floor, not cast: DuckDB CAST(double AS INT) rounds while Spark
          // truncates — floor() agrees everywhere
          col("_rank") <= floor(col("_n") * maxAnomalyRatio).cast("long")
      )
      .drop("_n", "_std", "_rank")
  }
}
