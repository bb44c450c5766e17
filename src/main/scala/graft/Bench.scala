package graft


/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized with a noop-format write — unlike
  * `count()`, that executes the full projection (a count would let
  * Catalyst prune every computed column).
  *
  * Variance control: per query, `SPARK_GRAFT_BENCH_WARMUPS` (default 1)
  * runs are EXCLUDED (first-touch JIT/codegen/page-cache — observed to
  * be the slowest run for nearly every query), then
  * `SPARK_GRAFT_BENCH_ITERS` (default 5) runs are measured; the
  * reported per-query number is the MEDIAN. The per-run numbers plus
  * the MIN land in `bench_detail.json` so a regression can be told
  * apart from machine noise (the r4 bench proved the need: three
  * queries "regressed" 2–4.6× under host load and reverted to baseline
  * on identical code — see BENCH_NOTES.md).
  *
  * Stall guard (round 7 — BENCH_r06 proved median-of-5 does NOT
  * survive a sustained host IO stall: a multi-minute episode put 2–3
  * polluted runs into q17/q34/q59's blocks and the recorded medians
  * landed at 10–12× the same code's clean repro): a measured run
  * exceeding `max(10 s, 5 × block-min-so-far)` is treated as a stall
  * artifact, DISCARDED, and re-run, up to
  * `SPARK_GRAFT_BENCH_MAX_RERUNS` (default 3) re-runs per query — a
  * genuinely slow query is protected by the 5× min-relative bound (its
  * min rises with it), and a stall outlasting the re-run budget still
  * lands in the medians rather than hiding. Nothing is silently
  * dropped: discarded runs ship in `bench_detail.json` under
  * `"discarded"`.
  *
  * The FINAL stdout line stays MINIMAL (metric/value/unit/sf — no
  * per-query map) on purpose: the driver parses it from a bounded tail
  * window of the captured output (~2000 chars — the r4 line with
  * embedded per-run arrays overflowed it, and by r7 even the per-query
  * MEDIAN map at 72 queries was ~2.4 KB and front-truncated; both
  * rounds recorded `parsed: null`). The full per-query line and per-run
  * detail ship in `bench_out.json` / `bench_detail.json`, never as the
  * contract line.
  */
object Bench {

  /** The measured-iteration loop with the stall guard (see the object
    * scaladoc), factored out so the guard's edge cases are spec-pinned
    * (BenchGuardSpec) instead of only runtime-evidenced: a run over
    * `max(10 s, 5 × min-so-far)` is discarded and re-run, at most
    * `maxReruns` times per block; min-so-far spans warmups + every
    * measured AND discarded run. Acceptance is RETROACTIVE (round 11 —
    * BENCH_r10's q79 kept a 19.2 s first measured run because the
    * block's 3.48 s floor only surfaced from run 2 on): whenever a new
    * run lowers the floor, earlier ACCEPTED runs that now exceed the
    * limit are evicted to `discarded` and replaced, spending the same
    * re-run budget. A stalled warmup+first-run pair therefore only
    * stands until any later run reveals the true floor; a stall
    * outlasting the budget still lands in the medians rather than
    * hiding. Returns (measured, discarded) — measured always has
    * `iters` entries; nothing is silently dropped.
    */
  private[graft] def measureBlock(
      iters: Int,
      maxReruns: Int,
      warm: Seq[Double],
      runOnce: () => Double
  ): (Vector[Double], Vector[Double]) = {
    var measured = Vector.empty[Double]
    var discarded = Vector.empty[Double]
    var minSoFar = if (warm.nonEmpty) warm.min else Double.MaxValue
    var reruns = 0
    while (measured.size < iters) {
      val t = runOnce()
      minSoFar = math.min(minSoFar, t)
      // The floor scales with the block: for fast blocks (min < 2 s) a
      // fixed 10 s floor defeats the 5x rule entirely — BENCH_r07
      // recorded a 9.02 s q59 run against a 1.32 s block min (6.8x)
      // because it slipped under the 10 s floor. 3 s still protects
      // sub-second queries' GC/compile jitter from churn; slow blocks
      // keep the original 10 s floor.
      val floor = if (minSoFar < 2.0) 3.0 else 10.0
      val limit = math.max(floor, 5.0 * minSoFar)
      if (t > limit && reruns < maxReruns) {
        discarded :+= t
        reruns += 1
      } else {
        measured :+= t
        // retroactive eviction: this run may have lowered the floor
        // enough to reveal earlier accepted runs as stalls — evict and
        // replace them within the same re-run budget (a discarded run
        // can't lower the floor further, so only this branch rescans)
        var idx = measured.indexWhere(_ > limit)
        while (idx >= 0 && reruns < maxReruns) {
          discarded :+= measured(idx)
          measured = measured.patch(idx, Vector.empty, 1)
          reruns += 1
          idx = measured.indexWhere(_ > limit)
        }
      }
    }
    (measured, discarded)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt)
    val warmups = math.max(0, sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "1").toInt)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The bench artifact must END at the JSON line, but DAGScheduler
    // logs an ERROR + stack trace ("Failed to update accumulator ...
    // non-existent accumulator") when tasks of an early-cancelled job
    // (limit/convergence-check `limit(1).count()` patterns) deliver
    // accumulator updates after the job's accumulators were
    // unregistered — a benign, well-known task-completion race that
    // says nothing about results. Drop EXACTLY that message with a
    // RegexFilter on the DAGScheduler logger (a dedicated LoggerConfig,
    // additive, no appenders of its own) so real scheduler errors —
    // lost executors, fetch failures, job aborts — still reach the log.
    // If the filter API ever changes shape, fall back to silencing the
    // logger outright: a clean machine-parsed tail outranks scheduler
    // diagnostics in this one JVM.
    try {
      import org.apache.logging.log4j.core.Filter.Result
      val filter = org.apache.logging.log4j.core.filter.RegexFilter.createFilter(
        ".*Failed to update accumulator.*", null, java.lang.Boolean.FALSE,
        Result.DENY, Result.NEUTRAL)
      val ctx = org.apache.logging.log4j.LogManager
        .getContext(false).asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      val cfg = ctx.getConfiguration
      val name = "org.apache.spark.scheduler.DAGScheduler"
      val lc = new org.apache.logging.log4j.core.config.LoggerConfig(
        name, org.apache.logging.log4j.Level.ERROR, true)
      lc.addFilter(filter)
      cfg.addLogger(name, lc)
      ctx.updateLoggers()
    } catch {
      // Throwable, not NonFatal: the advertised failure mode (log4j's
      // filter API changing shape) surfaces as NoSuchMethodError — a
      // LinkageError NonFatal lets through — and this startup block must
      // degrade to silencing the logger, never kill the bench JVM.
      case _: Throwable =>
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          "org.apache.spark.scheduler.DAGScheduler",
          org.apache.logging.log4j.Level.FATAL
        )
    }

    // Host-speed calibration (round 11 — two rounds of cross-round bench
    // analysis burned on separating host drift from regressions): a
    // fixed pure-CPU workload — no IO, no shuffle, deterministic plan —
    // timed before the suite. Its MIN of 3 runs (min is the capacity
    // statistic for pure CPU; medians absorb co-tenant noise we want
    // EXCLUDED here) lands in bench_detail.json as `calibration_sec`,
    // so BENCH_NOTES can normalize cross-round per-query ratios
    // mechanically instead of re-deriving "the host was ~1.6x slower"
    // from untouched-query forensics each round.
    def calibrateOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, cpus.toInt)
        .select(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("id") % 97L))
        .head()
      (System.nanoTime() - t0) / 1e9
    }
    calibrateOnce() // codegen + JIT warm
    val calibration = (1 to 3).map(_ => calibrateOnce()).min

    // session warmup: touch every table at the target SF (page cache +
    // reader init), then run every query once at the smallest SF — this
    // compiles each query's whole-stage codegen and JITs the hot loops
    // so even the per-query warmup run measures execution, not
    // first-touch compilation
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach { t =>
        try graft.sources.Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }

    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    val maxReruns = math.max(0, sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RERUNS", "3").toInt)
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=q87_bm25_topk,q88_nb_classify
    // times just those queries (the driver never sets it — full suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    // Per-BLOCK calibration (round 13): one pre-suite reading cannot see
    // INTRA-suite host drift — a 25-minute run on a multi-tenant host
    // measured alphabetically-late queries 2–6x inflated while the
    // pre-suite calibration read FAST (0.189) and a subset re-run minutes
    // later read 0.461: the host degraded mid-suite and every late block
    // paid. One calibrateOnce() per block (~0.2 s wall each, outside the
    // timers) stamps each query with the host speed IT ran under, so
    // cross-round per-query normalization divides by the right number.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Between query blocks: force a full GC so the ContextCleaner
      // reclaims the previous block's now-unreferenced broadcasts and
      // shuffle state NOW rather than whenever the 8 GiB driver heap
      // next fills on its own. Without this, dozens of queries' dead
      // blocks stay pinned in the unified memory region and the
      // VICTIM query late in the suite pays for them with spills and
      // GC pauses inside its timed runs — observed as r5's
      // q31 0.285->1.29 s monotonic "drift" and an r6 repro where q34
      // spiked to 68 s mid-suite while being stable solo (BENCH_NOTES).
      // Outside the per-run timer, so it costs wall clock, not medians.
      System.gc()
      // MIN of 2 readings, same rationale as the suite-level min-of-3:
      // a single noisy reading (scheduler preemption inside the ~0.2 s
      // probe) would scale this block's cross-round normalization in
      // bench_compare.py by the full noise factor. Two readings' min
      // bounds that at the cost of ~0.2 s wall per block.
      val blockCal = math.min(calibrateOnce(), calibrateOnce())
      def timed(): Double = {
        val t = runOnce(name, fn)
        // several operators pin intermediates (localCheckpoint blocks);
        // whatever survives the operator's own cleanup stays in
        // storage memory for the life of the context, so without this
        // each query would run under
        // ever-growing memory pressure from every EARLIER query/
        // iteration — the iterations would not be comparable (observed
        // as q19 medians inflating 2x late in the bench). Dropping them
        // between iterations makes run i and run i+1 see the same heap.
        // BLOCKING: with async removal the next run starts while the
        // previous run's blocks are still being freed and measures that
        // overlap as within-block growth.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        t
      }
      val warm = (1 to warmups).map(_ => timed())
      val (measured, discarded) = measureBlock(iters, maxReruns, warm, () => timed())
      (name, median(measured), measured.min, warm ++ measured, discarded, blockCal)
    }
    val calibrationEnd = (1 to 3).map(_ => calibrateOnce()).min
    val qs = results
      .map { case (k, med, _, _, _, _) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Full line (with per-query medians) goes to bench_out.json; the
    // stdout contract line is total-only. BENCH_r07 proved the full line
    // no longer fits the driver's bounded tail-capture window (~2.4 KB at
    // 72 queries → front-truncated → `parsed: null` in the round record),
    // so the machine-parsed line must stay short no matter how many
    // queries the suite grows to.
    // calibration_sec rides on BOTH machine-parsed lines (round 12 —
    // VERDICT r11 #5): the driver's BENCH_rNN.json records the short
    // line, and without the field there, cross-round host-drift
    // normalization needed manual forensics in bench_detail.json.
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","calibration_sec":$calibration%.3f,"calibration_end_sec":$calibrationEnd%.3f,"queries":$qs,"sf":"$sfDir"}"""
    val shortLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","calibration_sec":$calibration%.3f,"calibration_end_sec":$calibrationEnd%.3f,"sf":"$sfDir"}"""
    val detail = results
      .map { case (k, med, mn, all, disc, cal) =>
        val runsJson = all.map(r => f"$r%.3f").mkString("[", ",", "]")
        val discJson = disc.map(r => f"$r%.3f").mkString("[", ",", "]")
        f""""$k":{"median":$med%.3f,"min":$mn%.3f,"cal":$cal%.3f,"all_runs_incl_warmup":$runsJson,"discarded":$discJson}"""
      }
      .mkString(
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","iterations":$iters,"warmups":$warmups,"max_reruns":$maxReruns,"calibration_sec":$calibration%.3f,"calibration_end_sec":$calibrationEnd%.3f,"sf":"$sfDir","queries":{""",
        ",",
        "}}"
      )
    // Stop Spark BEFORE printing the JSON so the artifact's tail begins
    // at the JSON line: shutdown-time logging (cancelled-stage /
    // event-loop teardown stacks land on stderr, and the driver captures
    // stdout+stderr merged) must come before the machine-parsed line,
    // not after. Logging is switched off for the teardown — the bench
    // numbers are already in hand and shutdown chatter carries no signal.
    try {
      spark.sparkContext.setLogLevel("OFF")
      spark.stop()
    } catch { case _: Throwable => () }
    System.err.flush()
    // detail first (tail-truncatable), then the full line, then the SHORT
    // contract line LAST and closest to the end of the captured output —
    // small enough that the driver's tail window can never truncate it
    println(detail)
    println(line)
    println(shortLine)
    System.out.flush()
    // Belt-and-braces for log-noise-proof parsing: the contract line and
    // the full per-run detail also land in files next to the build.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
  }
}
