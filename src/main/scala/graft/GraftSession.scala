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
  *    working set fits executor memory alongside shuffle buffers;
  *  - a 5-minute periodic-GC floor for the ContextCleaner: cleanup of
  *    dead shuffle files / broadcasts is reference-triggered, so on a
  *    large, mostly-idle driver heap it can lag by hours while dead
  *    state pins memory and disk — a long-running session (streaming
  *    ingest, a bench loop, a multi-query job) then pays for earlier
  *    queries' garbage with spills inside later ones (measured in
  *    BENCH_NOTES.md round 6: a mid-suite 68 s spike on a 2.7 s query).
  *    Spark's default interval is 30 min; 5 min bounds the lag at a
  *    full-GC cost that is negligible against any real query.
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
      .config("spark.cleaner.periodicGC.interval", "5min")
}
