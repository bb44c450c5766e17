package graft

/** Scratch diagnostic for the r5 verdict's q31 drift (NOT a spec):
  * runs q31_anomaly_aggregator alone for N iterations with heap/GC
  * accounting, mirroring Bench's harness, to separate query-local
  * accumulation from cross-query session state.
  */
object Q31Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("Q31_ITERS", "10").toInt
    val qname = sys.env.getOrElse("Q31_QUERY", "q31_anomaly_aggregator")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(qname)
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcStats(): (Long, Long) = {
      var c = 0L; var t = 0L
      gcBeans.forEach { b => c += b.getCollectionCount; t += b.getCollectionTime }
      (c, t)
    }
    if (sys.env.contains("Q31_COUNT")) {
      println(s"Q31PROBE count=${fn(spark, sfDir).count()}")
      spark.stop()
      return
    }
    // pollution phase: run the whole suite N times first, mimicking the
    // bench's session state by the time it reaches the probed query
    val pollute = sys.env.getOrElse("Q31_POLLUTE", "0").toInt
    (1 to pollute).foreach { p =>
      SparkEntry.queries.toSeq.sortBy(_._1).takeWhile(_._1 < qname).foreach { case (_, f) =>
        try f(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      println(s"Q31PROBE pollution pass $p done")
    }
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    def codeCacheMb: Long = {
      var used = 0L
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.forEach { pool =>
        if (pool.getName.startsWith("CodeHeap")) used += pool.getUsage.getUsed
      }
      used / 1024 / 1024
    }
    val sleepMs = sys.env.getOrElse("Q31_SLEEP_MS", "0").toLong
    (1 to iters).foreach { i =>
      if (sleepMs > 0) Thread.sleep(sleepMs)
      val (gc0, gt0) = gcStats()
      val jit0 = comp.getTotalCompilationTime
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val (gc1, gt1) = gcStats()
      val rt = Runtime.getRuntime
      val usedMb = (rt.totalMemory() - rt.freeMemory()) / 1024 / 1024
      println(
        f"Q31PROBE iter=$i%2d sec=$sec%.3f heapUsedMb=$usedMb gcCount=${gc1 - gc0} " +
          f"gcMs=${gt1 - gt0} jitMsDelta=${comp.getTotalCompilationTime - jit0} " +
          f"codeCacheMb=$codeCacheMb")
    }
    spark.stop()
  }
}
