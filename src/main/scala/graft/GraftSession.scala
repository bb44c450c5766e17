package graft

import org.apache.spark.sql.SparkSession

/** The engine's session factory — one place for the configuration a
  * deployment needs at scale, so every entry point (and a user
  * embedding the library) starts from the same tuned base:
  *
  *  - UTC session time zone: the engine's cross-engine parity rule
  *    (timestamps are compared as epoch micros / formatted strings);
  *  - AQE on, with partition coalescing and skew-join splitting — the
  *    runtime re-planner that resizes shuffles and splits hot keys at
  *    100 TB without manual tuning;
  *  - explicit shuffle parallelism (callers size it to the cluster;
  *    local runs pass the core count — Spark's 200 default is wrong in
  *    both directions);
  *  - 128 MiB scan splits (`files.maxPartitionBytes`) so a scan task's
  *    working set fits executor memory alongside shuffle buffers.
  *
  * Everything is overridable by chaining further `.config` calls.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
}
