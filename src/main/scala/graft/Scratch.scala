package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). Round 7:
  * q60 run-shape probe — r6's bench recorded a 4x bimodal split
  * ([2.04, 2.47, 2.04, 2.41, 0.65, 0.53]); time it solo, then
  * interleaved after a heavy query (q34) to see whether the slow mode
  * follows memory/broadcast state left by earlier blocks.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      dt
    }

    // table + codegen warm
    sources.Tables.load(spark, dir, "documents").write.format("noop").mode("overwrite").save()
    run("q60_source_divergence")

    println("--- solo x8, GC barrier each (bench conditions) ---")
    (1 to 8).foreach { i =>
      System.gc()
      println(f"q60 solo #$i: ${run("q60_source_divergence")}%.3f s")
    }
    println("--- alternating with q34 (heap pressure), NO GC barrier ---")
    (1 to 4).foreach { i =>
      run("q34_dedup_corpus")
      println(f"q60 after-q34 #$i: ${run("q60_source_divergence")}%.3f s")
    }
    spark.stop()
  }
}
