package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Sketches
import graft.sinks.Dfs

/** Continuous maintenance of an at-rest histogram sketch
  * ([[graft.ops.Sketches]]) over a stream — the telemetry shape behind
  * "p99 document length, updated live, queryable without rescanning":
  * each micro-batch folds its rows into a batch histogram (map-side,
  * O(batch)), exact-long-merges it with the at-rest sketch (O(groups ×
  * bins) rows — KB-sized regardless of history), and swap-writes the
  * result. Readers ([[graft.ops.Sketches.quantilesFromSketch]],
  * [[graft.ops.Sketches.cdfFromSketch]]) always see a COMPLETE sketch:
  * the live dir is replaced by the two-rename `.new`/`.old` protocol
  * shared with the engine's other at-rest state.
  *
  * Exactly-once under foreachBatch's at-least-once redelivery: the
  * committed batch id rides INSIDE the versioned dir (`_batch` control
  * file — underscore-prefixed, invisible to parquet readers), so the
  * sketch and its progress marker swap atomically. A replayed batch id
  * ≤ the stored one is a no-op. Because merge is exact long addition,
  * the streamed sketch is bit-identical to a batch rebuild over the
  * same rows (spec-pinned), and a crash in ANY rename window leaves
  * either the previous complete version (healed from `.old`) or the
  * next one (promoted from `.new` — complete by protocol order: it is
  * fully written and closed before the live dir is retired).
  *
  * Single-writer contract (as everywhere in this engine): one ingest
  * loop owns a sketch path.
  */
object SketchIngest {

  /** Start the ingest loop: `rows` must contain `valueCol` and
    * `groupCols`. The sketch lands at `sketchPath` (live parquet dir +
    * `_batch` marker inside).
    */
  def sketchIngest(
      rows: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      lo: Double,
      hi: Double,
      nBins: Int,
      sketchPath: String,
      checkpoint: String
  ): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestSketchBatch(batch, batchId, valueCol, groupCols, lo, hi, nBins, sketchPath)
        ()
      }
      .start()

  /** One micro-batch; exposed for batch-mode reuse and the spec's
    * streamed==rebuild and crash-window tests. Returns true when the
    * batch was applied, false when it was recognized as a replay.
    */
  def ingestSketchBatch(
      batch: DataFrame,
      batchId: Long,
      valueCol: String,
      groupCols: Seq[String],
      lo: Double,
      hi: Double,
      nBins: Int,
      sketchPath: String
  ): Boolean =
    ingestCountBatch(
      batch,
      batchId,
      b => Sketches.histogramSketch(b, valueCol, groupCols, lo, hi, nBins),
      groupCols :+ "bin",
      sketchPath
    )

  /** The general form behind [[ingestSketchBatch]]: maintain ANY
    * at-rest keyed-count table (`keyCols` + a long `n`) whose merge is
    * exact addition — histogram sketches, DSIR gram-bucket models,
    * vocabulary counts. `fold` turns a micro-batch into its keyed
    * counts; the rest is the shared swap/marker protocol (object
    * scaladoc). Addition-mergeable state is the entire trick: streamed
    * == batch rebuild bit-identically, in any delivery order.
    *
    * Designed for BOUNDED tables (sketch grids, hashed-bucket models,
    * CMS cells): the merge reads and rewrites the whole table each
    * batch, so per-batch cost is O(table). Keep unbounded keyed counts
    * (e.g. a raw vocabulary) out of this loop — fold them into a
    * bounded sketch first (`TextAnalysis.boilerFoldCms` is the worked
    * example replacing the vocabulary-sized exact segment table).
    */
  def ingestCountBatch(
      batch: DataFrame,
      batchId: Long,
      fold: DataFrame => DataFrame,
      keyCols: Seq[String],
      path: String,
      finish: DataFrame => DataFrame = identity
  ): Boolean =
    ingestAdditiveBatch(batch, batchId, fold, keyCols, Seq("n"), path, finish)

  /** Multi-measure generalization of [[ingestCountBatch]]: maintain an
    * at-rest keyed table of ANY set of long measures whose merge is
    * exact addition — an incrementally-maintained materialized
    * aggregate (e.g. revenue + line counts per (nation, nation, year),
    * the q113 trade view, kept live as fact rows stream in). Same
    * bounded-table contract and swap/marker protocol as the count
    * form; because every measure merges by exact long addition, the
    * streamed view equals a batch rebuild bit-identically in any
    * delivery order (spec-pinned in SketchIngestSpec).
    */
  def ingestAdditiveBatch(
      batch: DataFrame,
      batchId: Long,
      fold: DataFrame => DataFrame,
      keyCols: Seq[String],
      measureCols: Seq[String],
      path: String,
      finish: DataFrame => DataFrame = identity
  ): Boolean = {
    import org.apache.spark.sql.functions.{col, sum}
    val spark = batch.sparkSession
    val fs = Dfs.fs(spark, path)
    val live = new HPath(path)
    heal(fs, live)
    val stored = committedBatch(fs, live)
    if (stored.exists(_ >= batchId)) return false

    val batchCounts = fold(batch)
    // `finish` post-processes the MERGED table before it is committed —
    // e.g. HeavyHitterIngest's deterministic Misra-Gries prune keeping
    // the at-rest state bounded. Identity for plain additive state.
    val merged = finish(
      if (fs.exists(live)) {
        val current = spark.read.parquet(path)
        current
          .unionByName(batchCounts)
          .groupBy(keyCols.map(col): _*)
          .agg(
            sum(col(measureCols.head)).as(measureCols.head),
            measureCols.tail.map(m => sum(col(m)).as(m)): _*
          )
      } else batchCounts
    )

    val fresh = new HPath(path + ".new")
    Dfs.rmTree(fs, fresh) // stray .new from a pre-swap crash: never acknowledged, rebuild
    merged.coalesce(1).write.parquet(fresh.toString)
    Dfs.writeSmall(fs, new HPath(fresh, "_batch"), batchId.toString)

    val old = new HPath(path + ".old")
    Dfs.rmTree(fs, old)
    if (fs.exists(live)) Dfs.move(fs, live, old)
    Dfs.move(fs, fresh, live)
    Dfs.rmTree(fs, old)
    true
  }

  /** Streaming loop over [[ingestCountBatch]] — the generic
    * keyed-count companion to [[sketchIngest]].
    */
  def countIngest(
      rows: DataFrame,
      fold: DataFrame => DataFrame,
      keyCols: Seq[String],
      path: String,
      checkpoint: String
  ): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestCountBatch(batch, batchId, fold, keyCols, path)
        ()
      }
      .start()

  /** Streaming loop over [[ingestAdditiveBatch]] — continuous
    * maintenance of a multi-measure materialized aggregate.
    */
  def additiveIngest(
      rows: DataFrame,
      fold: DataFrame => DataFrame,
      keyCols: Seq[String],
      measureCols: Seq[String],
      path: String,
      checkpoint: String
  ): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestAdditiveBatch(batch, batchId, fold, keyCols, measureCols, path)
        ()
      }
      .start()

  /** Restore a complete live dir after a crash mid-swap: a missing live
    * dir with `.new` beside it promotes `.new` (complete by protocol
    * order); missing live with only `.old` restores the previous
    * version. No-op when the live dir exists.
    */
  def heal(fs: FileSystem, live: HPath): Unit = {
    val fresh = new HPath(live.toString + ".new")
    val old = new HPath(live.toString + ".old")
    if (!fs.exists(live)) {
      if (fs.exists(fresh)) {
        Dfs.move(fs, fresh, live)
        Dfs.rmTree(fs, old)
      } else if (fs.exists(old)) {
        Dfs.move(fs, old, live)
      }
    }
  }

  /** The batch id the live sketch was committed at, if any. */
  def committedBatch(fs: FileSystem, live: HPath): Option[Long] = {
    val marker = new HPath(live, "_batch")
    if (fs.exists(live) && Dfs.existsSmall(fs, marker))
      Some(Dfs.readSmallString(fs, marker).trim.toLong)
    else None
  }
}
