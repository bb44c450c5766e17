package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). Round 7:
  * probe the clusters() persist-vs-localCheckpoint cost split on q34's
  * real pair frame, with per-variant shuffle/spill byte counts.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = sources.Tables.load(spark, dir, "documents")

    @volatile var shuffleW = 0L
    @volatile var spill = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleW += m.shuffleWriteMetrics.bytesWritten
          spill += m.diskBytesSpilled
        }
      }
    })

    def time(label: String)(f: => Unit): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val (s0, p0) = (shuffleW, spill)
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      // metrics post asynchronously; settle
      Thread.sleep(300)
      println(f"$label: $dt%.2f s  shuffleWrite=${(shuffleW - s0) / 1000000}%d MB spill=${(spill - p0) / 1000000}%d MB")
    }

    def pairs(): DataFrame =
      ops.Dedup.minHashLshPairs(docs, "text", "doc_id", threshold = 0.5, maxBucket = None)

    // r6-style clusters: localCheckpoint(true) per round + limit-count convergence
    def clustersCkpt(p: DataFrame, maxIter: Int = 10): DataFrame = {
      val edges = p
        .select(col("i").as("id"), col("j").as("nb"))
        .unionByName(p.select(col("j").as("id"), col("i").as("nb")))
        .distinct()
        .localCheckpoint(false)
      var labels = edges.select(col("id")).distinct().withColumn("cluster", col("id"))
      var iter = 0
      var changed = true
      while (changed && iter < maxIter) {
        val nb = edges
          .join(labels.select(col("id").as("nb"), col("cluster").as("nb_cluster")), "nb")
          .groupBy("id")
          .agg(min(col("nb_cluster")).as("min_nb"))
        val next = labels
          .join(nb, Seq("id"), "left")
          .select(col("id"), least(col("cluster"), coalesce(col("min_nb"), col("cluster"))).as("cluster"))
          .localCheckpoint(true)
        changed = next
          .join(labels.withColumnRenamed("cluster", "old"), "id")
          .filter(col("cluster") =!= col("old"))
          .limit(1)
          .count() > 0
        labels = next
        iter += 1
      }
      labels
    }

    def runQ34(cl: DataFrame => DataFrame): Unit = {
      val p = pairs()
      val c = cl(p)
      docs
        .join(c.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
        .select(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }

    // hybrid: localCheckpoint(true) per round (lineage cut, O(1) plans)
    // with convergence folded into the SAME materializing job via observe
    def clustersHybrid(p: DataFrame, maxIter: Int = 10): DataFrame = {
      val edges = p
        .select(col("i").as("id"), col("j").as("nb"))
        .unionByName(p.select(col("j").as("id"), col("i").as("nb")))
        .distinct()
        .localCheckpoint(false)
      var labels = edges.select(col("id")).distinct().withColumn("cluster", col("id"))
      var iter = 0
      var changed = true
      while (changed && iter < maxIter) {
        val nb = edges
          .join(labels.select(col("id").as("nb"), col("cluster").as("nb_cluster")), "nb")
          .groupBy("id")
          .agg(min(col("nb_cluster")).as("min_nb"))
        val obs = org.apache.spark.sql.Observation()
        val next = labels
          .join(nb, Seq("id"), "left")
          .select(
            col("id"),
            least(col("cluster"), coalesce(col("min_nb"), col("cluster"))).as("cluster"),
            (col("min_nb") < col("cluster")).as("chg")
          )
          .observe(obs, count_if(col("chg")).as("n_changed"))
          .localCheckpoint(true)
        changed = obs.get.get("n_changed").collect { case n: Long => n }.getOrElse(0L) > 0L
        labels = next.drop("chg")
        iter += 1
      }
      labels
    }

    // warm all paths once
    runQ34(p => ops.Dedup.clusters(p))
    runQ34(p => clustersCkpt(p))
    runQ34(p => clustersHybrid(p))
    (1 to 3).foreach { i =>
      time(s"q34 persist-rounds   #$i")(runQ34(p => ops.Dedup.clusters(p)))
      time(s"q34 ckpt-rounds (r6) #$i")(runQ34(p => clustersCkpt(p)))
      time(s"q34 hybrid-observe   #$i")(runQ34(p => clustersHybrid(p)))
    }
    spark.stop()
  }
}
