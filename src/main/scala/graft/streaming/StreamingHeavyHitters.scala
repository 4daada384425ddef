package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.ops.{Dedup, Frequency}

/** Streaming heavy hitters — the summary-carry `foreachBatch` twin of
  * [[graft.ops.Frequency.heavyHitters]]: a running SpaceSaving summary
  * of a STRING key column over the whole stream, emitted as a snapshot
  * each batch (the sink replaces its table wholesale).
  *
  * Shape: WITHIN a micro-batch the batch aggregate runs unchanged —
  * bounded buffers, map-side partials. ACROSS batches the only state
  * is the merged summary itself: ≤ capacity `(key, cnt, err)` rows —
  * driver-sized model state, merged via the SAME mergeable-summaries
  * rule the aggregate's distributed merge uses
  * ([[graft.ops.Frequency.mergeSummaryRows]]), so batch and streaming
  * semantics cannot fork. The SpaceSaving bounds survive the carry:
  * `cnt − err ≤ true ≤ cnt` over everything streamed so far, and any
  * key with true count > N/capacity is guaranteed monitored.
  *
  * State layout is the [[StreamingPacking]] O(1) carry: batch N's
  * merged summary lives in the driver-written file
  * `summary/batch-N`; the prior summary is a DIRECT read of
  * `batch-(N-1)` (no listing, no Spark job), and a batch prunes
  * everything older than its predecessor after writing — ~3 files for
  * a 100k-batch stream. Keeping the predecessor makes replay safe: a
  * checkpoint-replayed batch N re-reads `batch-(N-1)` and rewrites
  * `batch-N` with identical content (the within-batch summary is
  * deterministic whenever the batch's distinct keys fit the capacity;
  * beyond that, summary TAILS are merge-order-dependent — inherent to
  * the sketch family — while certified `err == 0` rows are not).
  *
  * File format: one `cnt TAB err TAB base64(key)` line per entry
  * (keys are arbitrary token text — base64 survives tabs/newlines).
  */
object StreamingHeavyHitters {

  private def sumDir(stateDir: String) =
    new org.apache.hadoop.fs.Path(s"$stateDir/summary")

  private def batchFile(stateDir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(sumDir(stateDir), s"batch-$batchId")

  // Hadoop FS, not java.io.File — production state dirs live on
  // HDFS/S3 where the local-file API silently sees nothing
  private def fsFor(spark: SparkSession, stateDir: String) =
    sumDir(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSummaryFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] = {
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(c, e, k64) = line.split("\t", 3)
      (new String(java.util.Base64.getDecoder.decode(k64),
        StandardCharsets.UTF_8), c.toLong, e.toLong)
    }.toSeq
  }

  private def batchIdOf(p: org.apache.hadoop.fs.Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("batch-")) n.stripPrefix("batch-").toLongOption
    else None
  }

  /** The summary persisted by the newest batch BEFORE `batchId` (empty
    * when none) — same replay contract as
    * [[StreamingPacking.priorOffset]]: direct predecessor read, bounded
    * listing fallback for non-contiguous ids, throw instead of a
    * silent restart when the requested horizon was pruned. */
  private[streaming] def priorSummary(spark: SparkSession, stateDir: String,
      batchId: Long): Seq[(String, Long, Long)] = {
    val fs = fsFor(spark, stateDir)
    val direct = batchFile(stateDir, batchId - 1)
    if (fs.exists(direct)) readSummaryFile(fs, direct)
    else if (!fs.exists(sumDir(stateDir))) Seq.empty
    else {
      val ids = fs.listStatus(sumDir(stateDir)).toSeq
        .flatMap(s => batchIdOf(s.getPath).map(_ -> s.getPath))
      val prior = ids.filter(_._1 < batchId)
      if (prior.nonEmpty) readSummaryFile(fs, prior.maxBy(_._1)._2)
      else if (ids.exists(_._1 > batchId)) throw new IllegalStateException(
        s"heavy-hitters state for batches before $batchId was pruned " +
          s"(oldest retained: ${ids.map(_._1).min}); only the last " +
          "uncommitted batch is replayable")
      else Seq.empty
    }
  }

  private def writeSummary(spark: SparkSession, stateDir: String,
      batchId: Long, rows: Seq[(String, Long, Long)]): Unit = {
    val fs = fsFor(spark, stateDir)
    val out = fs.create(batchFile(stateDir, batchId), true)
    try rows.foreach { case (k, c, e) =>
      val k64 = java.util.Base64.getEncoder
        .encodeToString(k.getBytes(StandardCharsets.UTF_8))
      out.write(s"$c\t$e\t$k64\n".getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    fs.listStatus(sumDir(stateDir)).foreach { s =>
      batchIdOf(s.getPath).foreach { id =>
        if (id < batchId - 1) { fs.delete(s.getPath, false); () }
      }
    }
  }

  /** The `foreachBatch` body. `keyCol` must be a STRING column; `sink`
    * receives the full running summary `(key, cnt, err)` each batch
    * and must replace its table with it. */
  def foreachBatchHeavyHitters(keyCol: Column, capacity: Int,
      stateDir: String, sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    require(capacity > 0, "capacity must be positive")
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val batchRows = Frequency.heavyHitters(batch, keyCol, capacity)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      val prior = priorSummary(spark, stateDir, batchId)
      val merged = Frequency.mergeSummaryRows(prior, batchRows, capacity)
      sink(merged.toDF("key", "cnt", "err"))
      writeSummary(spark, stateDir, batchId, merged)
      Dedup.releaseCaches()
  }
}
