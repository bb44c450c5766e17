package graft


/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized with a noop-format write — unlike
  * `count()`, that executes the full projection (a count would let
  * Catalyst prune every computed column). A warmup job amortizes JVM/
  * codegen/session startup out of the per-query numbers.
  *
  * Variance control: every query runs `SPARK_GRAFT_BENCH_ITERS` times
  * (default 3) and the reported per-query number is the MEDIAN; the
  * raw per-iteration numbers ship in a sibling `"runs"` object so a
  * regression can be told apart from single-run machine noise (a
  * single-iteration bench cannot falsify either hypothesis). The
  * driver-facing contract is unchanged: `"queries"` maps name → one
  * number and `"value"` is their sum.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The bench artifact must END at the JSON line, but DAGScheduler
    // logs an ERROR + stack trace ("Failed to update accumulator ...
    // non-existent accumulator") when tasks of an early-cancelled job
    // (limit/convergence-check `limit(1).count()` patterns) deliver
    // accumulator updates after the job's accumulators were
    // unregistered — a benign, well-known task-completion race that
    // says nothing about results. Silence that one logger to FATAL in
    // this bench JVM only; correctness runs (Verify) keep it at ERROR.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.FATAL
    )

    // warmup: touch every table at the target SF (page cache + reader
    // init), then run every query once at the smallest SF — this
    // compiles each query's whole-stage codegen and JITs the hot loops
    // so the timed pass measures execution, not first-touch compilation
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to iters).map { _ =>
        val t = runOnce(name, fn)
        // several operators localCheckpoint intermediates; those RDDs
        // stay pinned in storage memory for the life of the context, so
        // without this each query would run under ever-growing memory
        // pressure from every EARLIER query/iteration — the iterations
        // would not be comparable (observed as q19 medians inflating 2x
        // late in the bench). Dropping them between iterations makes
        // run i and run i+1 see the same heap.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        t
      }
      (name, median(runs), runs)
    }
    val qs = results
      .map { case (k, med, _) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val runsJson = results
      .map { case (k, _, runs) =>
        "\"" + k + "\":" + runs.map(r => f"$r%.3f").mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"iterations":$iters,"runs":$runsJson,"sf":"$sfDir"}"""
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
    println(line)
    System.out.flush()
    // Belt-and-braces for log-noise-proof parsing: also drop the same
    // line in a file next to the build.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
  }
}
