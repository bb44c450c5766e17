package graft


/** Local smoke runner mirroring the driver's t1 check: `entry()` must
  * return >0 rows on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
