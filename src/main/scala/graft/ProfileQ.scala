package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Ad-hoc per-query job/stage profiler (not part of the driver
  * contract; a measurement aid for the optimization rounds — guide §1
  * "measure first"). Runs each named query `iters` times after one
  * warmup and prints, per run, every Spark job with its wall time,
  * stage count and task count, so the fixed-overhead structure (job
  * count × per-job cost) of a multi-job operator is visible instead of
  * guessed. `runMain graft.ProfileQ q75_ivfpq_residual_recall [more...]`;
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROFILE_ITERS.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ITERS", "2").toInt
    val builder = GraftSession.builder(s"local[$cpus]", cpus.toInt)
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(
        id: Int,
        var desc: String,
        var start: Long,
        var end: Long,
        var stages: Int,
        var tasks: Int,
        var taskMs: Long,
        var cpuMs: Long
    )
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageTasks = mutable.Map.empty[Int, Int] // stageId -> numTasks
    val stageJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(j.jobId) = JobRec(j.jobId, desc, j.time, 0L, j.stageInfos.size, 0, 0L, 0L)
        j.stageIds.foreach(s => stageJob(s) = j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(j.jobId).foreach(_.end = j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val n = s.stageInfo.numTasks
        stageJob.get(s.stageInfo.stageId).flatMap(jobs.get).foreach(_.tasks += n)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = jobs.synchronized {
        stageJob.get(t.stageId).flatMap(jobs.get).foreach { j =>
          j.taskMs += t.taskInfo.duration
          Option(t.taskMetrics).foreach(m => j.cpuMs += m.executorCpuTime / 1000000L)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = args.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup (codegen/JIT)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[profile] warmup $name: $e") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      (1 to iters).foreach { it =>
        jobs.synchronized { jobs.clear(); stageJob.clear(); stageTasks.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        Thread.sleep(200) // let listener events drain
        jobs.synchronized {
          println(f"\n=== $name run $it: wall $wall%.3f s, ${jobs.size} jobs ===")
          var acct = 0.0
          jobs.values.foreach { j =>
            val d = math.max(0L, j.end - j.start) / 1e3
            acct += d
            println(f"  job ${j.id}%4d  ${d}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d taskSum=${j.taskMs / 1e3}%7.3f cpuSum=${j.cpuMs / 1e3}%7.3f  ${j.desc.take(60)}")
          }
          println(f"  [sum of job walls: $acct%.3f s — gaps to $wall%.3f are driver-side planning/collect]")
        }
      }
    }
    spark.stop()
  }
}
