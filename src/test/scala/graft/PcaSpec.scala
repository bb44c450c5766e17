package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pca

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def vecDf(rows: Seq[Array[Float]]) = {
    val schema = StructType(Seq(StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.toSeq)), 2),
      schema
    )
  }

  test("recovers a planted principal direction (sign-agnostic)") {
    // points spread along dir with small orthogonal jitter
    val dir = Array(0.6f, -0.2f, 0.75f, 0.15f)
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 100.0f // -1 .. 1
      val j = ((i * 2654435761L % 97) - 48) / 4850.0f // deterministic jitter ~[-0.01, 0.01]
      Array(dir(0) * t + j, dir(1) * t - j, dir(2) * t + j, dir(3) * t - j)
    }
    val p = Pca.fitTopComponent(vecDf(rows), "embedding", d = 4, iters = 40)
    val pn = math.sqrt(p.map(v => v.toDouble * v).sum)
    val dn = math.sqrt(dir.map(v => v.toDouble * v).sum)
    val cos = p.zip(dir).map { case (a, b) => a.toDouble * b }.sum / (pn * dn)
    assert(math.abs(cos) > 0.999, s"cosine to planted direction: $cos")
  }

  test("fit is deterministic and the projection maximizes spread vs a coordinate axis") {
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val p1 = Pca.fitTopComponent(emb, "embedding", d = 64, iters = 30)
    val p2 = Pca.fitTopComponent(emb, "embedding", d = 64, iters = 30)
    assert(p1.sameElements(p2))
    // variance of the quantized projection along the component must beat
    // the first coordinate axis (scaled to the same |p|₂ footing)
    val scores = emb
      .select(Pca.projectionScore(col("embedding"), p1, 16384.0).cast("double").as("s"))
      .agg(variance(col("s"))).head().getDouble(0)
    val axis = Array.tabulate(64)(i => if (i == 0) 1048576L else 0L)
    val axisNorm2 = axis.map(v => v.toDouble * v).sum
    val pNorm2 = p1.map(v => v.toDouble * v).sum
    val axisVar = emb
      .select(Pca.projectionScore(col("embedding"), axis, 16384.0).cast("double").as("s"))
      .agg(variance(col("s"))).head().getDouble(0)
    assert(scores / pNorm2 > axisVar / axisNorm2,
      s"component variance ${scores / pNorm2} not above axis-0 ${axisVar / axisNorm2}")
  }

  test("second component is near-orthogonal to the first and the first is unchanged") {
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (p1, p2) = Pca.fitTopTwoComponents(emb, "embedding", d = 64, iters = 30)
    assert(p1.sameElements(Pca.fitTopComponent(emb, "embedding", d = 64, iters = 30)))
    val n1 = math.sqrt(p1.map(v => v.toDouble * v).sum)
    val n2 = math.sqrt(p2.map(v => v.toDouble * v).sum)
    val cos = p1.zip(p2).map { case (a, b) => a.toDouble * b }.sum / (n1 * n2)
    assert(math.abs(cos) < 0.05, s"components not near-orthogonal: cos=$cos")
  }

  test("streamed at-rest gram table: chunked countIngest == batch fit, bit-identically") {
    val tmp = java.nio.file.Files.createTempDirectory("pcagram").toString
    val path = s"$tmp/gram"
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val chunks = Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)
    )
    chunks.zipWithIndex.foreach { case (c, i) =>
      assert(graft.streaming.SketchIngest.ingestCountBatch(
        c, i.toLong, b => Pca.gramTable(b, "embedding", d = 64), Seq("i", "j"), path))
    }
    // replay of the last chunk: exact no-op
    assert(!graft.streaming.SketchIngest.ingestCountBatch(
      chunks.last, 2L, b => Pca.gramTable(b, "embedding", d = 64), Seq("i", "j"), path))
    val streamed = Pca.fitTopComponentFromTable(spark.read.parquet(path), d = 64, iters = 30)
    val batch = Pca.fitTopComponent(emb, "embedding", d = 64, iters = 30)
    assert(streamed.sameElements(batch))
  }

  test("degenerate zero-variance input is rejected") {
    val rows = Seq.fill(5)(Array(0.25f, 0.25f, 0.25f))
    assertThrows[IllegalArgumentException] {
      Pca.fitTopComponent(vecDf(rows), "embedding", d = 3, iters = 5)
    }
  }
}
