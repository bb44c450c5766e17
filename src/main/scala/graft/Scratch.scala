package graft

/** Ad-hoc profiling main (not part of the driver contract). Round 7:
  * fast local oracle loop for newly added queries — dump a named subset
  * of SparkEntry.queries to parquet for a DuckDB spot-compare without
  * running the full Verify suite.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/scratch_out"
    val names = args.drop(2).toSeq
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry
        .queries(name)(spark, sfDir)
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(s"$outDir/$name")
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
      }
    }
    spark.stop()
  }
}
