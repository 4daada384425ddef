package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.ops.{Dedup, Sketch}

/** Streaming HyperLogLog — the summary-carry `foreachBatch` twin of
  * [[graft.ops.Sketch.hllDistinct]]: a running distinct-count sketch
  * of a value column per string group over the whole stream, emitted
  * as a snapshot each batch (the sink replaces its table wholesale).
  *
  * The carry is the sketch's own merge algebra: per-bucket max is
  * associative, commutative and idempotent, so batch N's state =
  * max(prior state, batch N's [[Sketch.perBucketMax]]) per (group,
  * bucket) — and idempotence means a checkpoint-REPLAYED batch merges
  * to the identical state (re-maxing the same rows changes nothing),
  * the strongest replay guarantee in the streaming family (packing
  * needs the offsets protocol for this; HLL gets it from algebra).
  * Snapshot ≡ the batch sketch over the concatenated prefix, exactly.
  *
  * State is ≤ groups·m (group, bucket, rho) integers — driver-sized
  * model state (5 groups × 2^9 = 2,560 rows) in the
  * [[StreamingPacking]] O(1) file carry: `sketch/batch-N` holds the
  * merged registers, the predecessor stays for replay, older files
  * prune. Format: `bucket TAB rho TAB base64(group)` per line.
  */
object StreamingSketch {

  private def dir(stateDir: String) =
    new org.apache.hadoop.fs.Path(s"$stateDir/sketch")

  private def batchFile(stateDir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(dir(stateDir), s"batch-$batchId")

  private def fsFor(spark: SparkSession, stateDir: String) =
    dir(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[(String, Long, Int)] = {
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, r, g64) = line.split("\t", 3)
      (new String(java.util.Base64.getDecoder.decode(g64),
        StandardCharsets.UTF_8), b.toLong, r.toInt)
    }.toSeq
  }

  private def batchIdOf(p: org.apache.hadoop.fs.Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("batch-")) n.stripPrefix("batch-").toLongOption
    else None
  }

  private[streaming] def priorSketch(spark: SparkSession, stateDir: String,
      batchId: Long): Seq[(String, Long, Int)] = {
    val fs = fsFor(spark, stateDir)
    val direct = batchFile(stateDir, batchId - 1)
    if (fs.exists(direct)) readFile(fs, direct)
    else if (!fs.exists(dir(stateDir))) Seq.empty
    else {
      val ids = fs.listStatus(dir(stateDir)).toSeq
        .flatMap(s => batchIdOf(s.getPath).map(_ -> s.getPath))
      val prior = ids.filter(_._1 < batchId)
      if (prior.nonEmpty) readFile(fs, prior.maxBy(_._1)._2)
      else if (ids.exists(_._1 > batchId)) throw new IllegalStateException(
        s"sketch state for batches before $batchId was pruned " +
          s"(oldest retained: ${ids.map(_._1).min}); only the last " +
          "uncommitted batch is replayable")
      else Seq.empty
    }
  }

  private def writeSketch(spark: SparkSession, stateDir: String,
      batchId: Long, rows: Seq[(String, Long, Int)]): Unit = {
    val fs = fsFor(spark, stateDir)
    val out = fs.create(batchFile(stateDir, batchId), true)
    try rows.foreach { case (g, b, r) =>
      val g64 = java.util.Base64.getEncoder
        .encodeToString(g.getBytes(StandardCharsets.UTF_8))
      out.write(s"$b\t$r\t$g64\n".getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    fs.listStatus(dir(stateDir)).foreach { s =>
      batchIdOf(s.getPath).foreach { id =>
        if (id < batchId - 1) { fs.delete(s.getPath, false); () }
      }
    }
  }

  /** Streaming Count-Min — [[graft.ops.Sketch.Cms]] under
    * `foreachBatch`. Counters merge by SUM, which is associative but
    * NOT idempotent (unlike the HLL max above), so replay safety
    * comes from the [[StreamingState]] contribution protocol instead
    * of algebra: each batch's ≤ d·w counter rows overwrite their own
    * `batch_id=` partition, the snapshot is the rollup over
    * contributions ≤ batchId, and a replayed batch rewrites its
    * partition byte-for-byte. `sink` receives the point estimates for
    * `probes(probeCol)` against the running counters each batch. */
  def foreachBatchCms(valueCol: String, w: Int, d: Int, stateDir: String,
      probes: DataFrame, probeCol: String,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val contrib = Sketch.Cms.counters(batch, valueCol, w, d)
      StreamingState.writePartition(contrib, s"$stateDir/cms", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/cms",
        contrib.schema, batchId)
      val merged = all.groupBy("_i", "_p")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("cnt")).as("cnt"))
      sink(Sketch.Cms.estimate(merged, probes, probeCol, w, d))
      Dedup.releaseCaches()
  }

  /** Streaming robust stats — the carried-histogram twin of
    * [[graft.ops.Robust.madOutlierStats]]: a running (key, value)
    * count histogram over the whole stream, with exact median / MAD /
    * 3-MAD outlier counts emitted as a snapshot each batch.
    *
    * Histogram counts merge by SUM — associative but not idempotent
    * (the CMS case, not the HLL case), so replay safety is the
    * `batch_id=` contribution-partition protocol: each batch's
    * grain-bounded histogram overwrites its own partition and the
    * snapshot rolls up contributions ≤ batchId. The quantile core is
    * the SAME [[graft.ops.Robust.madStatsFromHistogram]] the batch op
    * runs, so snapshot ≡ batch stats on the concatenated prefix by
    * construction. */
  def foreachBatchMadStats(keyCol: String, valueCol: String,
      stateDir: String, sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import org.apache.spark.sql.functions._
      val spark = batch.sparkSession
      val contrib = batch
        .groupBy(col(keyCol), col(valueCol).cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
      StreamingState.writePartition(contrib, s"$stateDir/hist", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/hist",
        contrib.schema, batchId)
      val hist = all.groupBy(col(keyCol), col("v")).agg(sum("c").as("c"))
      sink(graft.ops.Robust.madStatsFromHistogram(hist, keyCol))
      Dedup.releaseCaches()
  }

  /** Streaming hour-level anomaly detection — the carried-histogram
    * twin of the ev_anomalous_hours composition: the same per-batch
    * 2 dp value histograms ride the contribution protocol keyed by
    * (group, hour), and the snapshot runs BOTH robust levels (hourly
    * p50, then median/MAD across each group's hourly medians) through
    * the shared [[graft.ops.Robust]] cores. An hour flagged anomalous
    * can un-flag as its late data arrives — snapshot-replace, not
    * append. */
  def foreachBatchAnomalousHours(groupCol: String, hourCol: String,
      valueCol: String, stateDir: String,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import org.apache.spark.sql.functions._
      val spark = batch.sparkSession
      val contrib = batch
        .groupBy(col(groupCol), col(hourCol),
          round(col(valueCol), 2).as("v"))
        .agg(count(lit(1)).as("c"))
      StreamingState.writePartition(contrib, s"$stateDir/hourhist", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/hourhist",
        contrib.schema, batchId)
      val hist = all.groupBy(col(groupCol), col(hourCol), col("v"))
        .agg(sum("c").as("c"))
      val p50 = graft.ops.Robust.quantileFromHistogram(hist, 0.5,
        Seq(groupCol, hourCol), "p50")
      sink(graft.ops.Robust.madStatsFromHistogram(
        p50.groupBy(col(groupCol), col("p50").as("v"))
          .agg(count(lit(1)).as("c")),
        groupCol))
      Dedup.releaseCaches()
  }

  /** The `foreachBatch` body. `groupCol`/`valueCol` must be STRING
    * columns; `sink` receives the running estimate frame (group,
    * n_buckets, est_distinct) each batch and must replace its table
    * with it. */
  def foreachBatchHllDistinct(groupCol: String, valueCol: String, p: Int,
      stateDir: String, sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val batchRows = Sketch.perBucketMax(batch, Seq(groupCol), valueCol, p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSeq
      val prior = priorSketch(spark, stateDir, batchId)
      val merged = (prior ++ batchRows)
        .groupBy(t => (t._1, t._2))
        .map { case ((g, b), ts) => (g, b, ts.map(_._3).max) }
        .toSeq.sortBy(t => (t._1, t._2))
      sink(Sketch.estimateFromBuckets(
        merged.toDF(groupCol, "_b", "_m"), Seq(groupCol), p))
      writeSketch(spark, stateDir, batchId, merged)
      Dedup.releaseCaches()
  }
}
