package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the 100 TB reality: one
  * company/table pair can dominate the event log; one boilerplate
  * shingle can dominate an inverted index).
  *
  * AQE's skew-join splitting handles join-side skew at runtime; these
  * helpers handle AGGREGATION skew, which AQE does not rebalance: a
  * two-phase salted aggregate spreads each hot group over `salts`
  * partial groups, then merges. Works for any algebraic aggregate
  * (count/sum/min/max — anything with a partial+final decomposition).
  */
object Skew {

  /** Two-phase salted count: groupBy(keys + salt) -> partial counts ->
    * groupBy(keys) -> sum. The first shuffle spreads hot keys over
    * `salts` reducers; the second touches only (groups x salts) rows.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("n"))

  /** Two-phase salted sum over `valueCol`. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("sum"))

  /** Combined two-phase salted count + sum — ONE scan and one salted
    * shuffle for both measures (running [[saltedCount]] and [[saltedSum]]
    * separately scans the fact twice).
    */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int = 16
  ): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_pn"), sum(col(valueCol)).as("_ps"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_pn")).as("n"), sum(col("_ps")).as("sum"))

  /** Salted broadcast-side replication for joining a skewed fact against
    * a small dimension when broadcast is impossible: fact rows get a
    * random salt in [0, salts), the dimension is exploded `salts` times,
    * and the join key becomes (key, salt). Equivalent rows, `salts`-way
    * parallelism on the hot key.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int = 8,
      joinType: String = "inner"
  ): DataFrame = {
    val saltedFact =
      fact.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val saltedDim = dim.withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(saltedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
