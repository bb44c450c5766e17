package graft

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). Round 7:
  * q65 cost split — does materializing the exploded gram frame beat
  * recomputing the (map-side) explode for both consumers?
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

    // variant: no Materialize — the gram explode is recomputed for the
    // count side and the probe side (map-side work twice, zero blocks)
    def spansNoMat(k: Int): DataFrame = {
      val grams = docs
        .select(col("doc_id").cast("long").as("doc_id"), functions.Fns.tokens(col("text")).as("words"))
        .filter(size(col("words")) >= k)
        .select(
          col("doc_id"),
          posexplode(
            transform(
              sequence(lit(0), size(col("words")) - k),
              i => concat_ws(" ", slice(col("words"), i + 1, lit(k)))
            )
          ).as(Seq("pos", "gram"))
        )
      val dupGrams = grams
        .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select(col("gram"))
      val dupPos = grams.join(dupGrams, Seq("gram"), "left_semi")
      val order = Window.partitionBy("doc_id").orderBy("pos")
      val acc = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dupPos
        .withColumn("brk", when(col("pos") - lag("pos", 1).over(order) <= k, 0L).otherwise(1L))
        .withColumn("island", sum(col("brk")).over(acc))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).cast("long").as("span_start"), (max(col("pos")) + k).cast("long").as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start")).as("span_tokens"))
    }

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    noop(ops.Dedup.duplicateSpans(docs, "text", "doc_id", 8))
    noop(spansNoMat(8))
    (1 to 3).foreach { i =>
      time(s"q65 materialized #$i")(noop(ops.Dedup.duplicateSpans(docs, "text", "doc_id", 8)))
      time(s"q65 recompute    #$i")(noop(spansNoMat(8)))
    }
    spark.stop()
  }
}
