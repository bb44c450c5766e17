package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). Round 7:
  * native GramHashes vs the composed slice/concat_ws/xxhash64 form on
  * the production (hashed) duplicate-spans path at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = sources.Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Unit): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val k = 8
    // the pre-native hashed path, reproduced
    def composedSpans(): DataFrame = {
      val grams = ops.Materialize(
        docs
          .select(col("doc_id").cast("long").as("doc_id"), functions.Fns.tokens(col("text")).as("words"))
          .filter(size(col("words")) >= k)
          .select(
            col("doc_id"),
            posexplode(
              transform(
                sequence(lit(0), size(col("words")) - k),
                i => xxhash64(concat_ws(" ", slice(col("words"), i + 1, lit(k))))
              )
            ).as(Seq("pos", "gram"))
          ),
        eager = false
      )
      val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("gram")
      grams.join(dup, Seq("gram"), "left_semi").groupBy("doc_id").count()
    }
    def nativeSpans(): DataFrame =
      ops.Dedup.duplicateSpans(docs, "text", "doc_id", k) // hashGrams default ON

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    noop(composedSpans()); noop(nativeSpans())
    (1 to 3).foreach { i =>
      time(s"hashed spans composed #$i")(noop(composedSpans()))
      time(s"hashed spans native   #$i")(noop(nativeSpans()))
    }
    spark.stop()
  }
}
