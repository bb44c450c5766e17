package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = sources.Tables.load(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("warm")(docs.write.format("noop").mode("overwrite").save())
    val shingled = ops.Dedup.shingleSets(docs, "text", "doc_id", 3)
    time("shingleSets")(shingled.write.format("noop").mode("overwrite").save())
    val inv = shingled.select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("inv explode")(inv.write.format("noop").mode("overwrite").save())
    val inter = inv.as("a")
      .join(inv.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
    time("self-join+agg")(inter.write.format("noop").mode("overwrite").save())
    time("full q17")(
      SparkEntry.queries("q17_ngram_jaccard")(spark, dir).write.format("noop").mode("overwrite").save()
    )
    spark.stop()
  }
}
