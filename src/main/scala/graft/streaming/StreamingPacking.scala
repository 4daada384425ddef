package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Packing

/** Streaming token-budget shard packing — the offsets-carry
  * `foreachBatch` twin of [[graft.ops.Packing.packByTokenBudget]] (the
  * one curation-pipeline stage that had no streaming counterpart).
  *
  * Shape: WITHIN a micro-batch the batch operator's two-level prefix
  * sum runs unchanged — fully distributed, the global-window
  * single-partition trap avoided exactly as in batch. ACROSS
  * micro-batches the only state is the cumulative token total: one
  * long per batch id under `stateDir`, so a replayed batch (restart
  * from checkpoint re-runs the last uncommitted batch) reads the SAME
  * prior offset and emits identical shard ids — deterministic input →
  * idempotent output. A `flatMapGroupsWithState` formulation would
  * funnel every doc through one state key (the serial trap the batch
  * op exists to avoid); carrying one scalar through `foreachBatch`
  * keeps the per-batch plan parallel and the state O(1).
  *
  * State layout (O(1) reads AND O(1) files, for 100k-batch streams):
  * batch N's cumulative total lives in the driver-written text file
  * `offsets/batch-N`; the prior offset is a DIRECT read of
  * `batch-(N-1)` — no directory listing, no Spark job — and after
  * writing its own file a batch prunes everything older than its
  * predecessor, so the directory never holds more than ~3 files (the
  * earlier parquet-append layout re-listed and re-read every
  * batch-appended file per batch: the listing would dominate a
  * long-lived stream). Keeping the predecessor is what makes replay
  * safe: Structured Streaming re-runs only the last uncommitted
  * batch, which re-reads `batch-(N-1)` and overwrites `batch-N` with
  * the same value. The rare non-contiguous-id path (a first batch
  * that isn't 0, ids skipping) falls back to one bounded listing of
  * the pruned directory.
  *
  * Ordering contract: docs pack in arrival order (within a batch:
  * `idCol` order) — the streaming analogue of the batch contract's
  * global id order. A stream fed id-ordered batches produces
  * byte-identical assignments to one batch run over the concatenation
  * (StreamingSpec).
  */
object StreamingPacking {

  private def offsetDir(stateDir: String) =
    new org.apache.hadoop.fs.Path(s"$stateDir/offsets")

  private def batchFile(stateDir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(offsetDir(stateDir), s"batch-$batchId")

  // Hadoop FS, not java.io.File: the state dir of a production stream
  // lives on HDFS/S3, where the local-file API silently sees nothing
  // and every batch would restart the count at zero
  private def fsFor(spark: SparkSession, stateDir: String) =
    offsetDir(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readOffsetFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
    finally in.close()
  }

  private def batchIdOf(p: org.apache.hadoop.fs.Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("batch-")) n.stripPrefix("batch-").toLongOption
    else None
  }

  /** Cumulative token total persisted by the newest batch BEFORE
    * `batchId` (0 when none): replays of batch N read only state
    * written by batches < N, never their own possibly-rewritten file.
    * Fast path is ONE file read (`batch-(N-1)`); the listing fallback
    * only fires for non-contiguous ids, over a directory pruning keeps
    * ~3 files small. Re-running a batch OLDER than the pruning horizon
    * (files exist, but all for batches >= `batchId`) throws instead of
    * silently restarting the count at zero — Structured Streaming only
    * ever replays the LAST uncommitted batch, so that state is
    * unreachable in a live stream and means an off-contract manual
    * invocation. */
  private[streaming] def priorOffset(spark: SparkSession, stateDir: String,
      batchId: Long): Long = {
    val fs = fsFor(spark, stateDir)
    val direct = batchFile(stateDir, batchId - 1)
    if (fs.exists(direct)) readOffsetFile(fs, direct)
    else if (!fs.exists(offsetDir(stateDir))) 0L
    else {
      val ids = fs.listStatus(offsetDir(stateDir)).toSeq
        .flatMap(s => batchIdOf(s.getPath).map(_ -> s.getPath))
      val prior = ids.filter(_._1 < batchId)
      if (prior.nonEmpty) readOffsetFile(fs, prior.maxBy(_._1)._2)
      // a file with id > batchId proves later batches ran and pruning
      // discarded this batch's predecessor; a file with id == batchId
      // is only this replay's own partial write (first batch, crashed
      // before commit) and legitimately means offset 0
      else if (ids.exists(_._1 > batchId)) throw new IllegalStateException(
        s"packing offset state for batches before $batchId was pruned " +
          s"(oldest retained: ${ids.map(_._1).min}); only the last " +
          "uncommitted batch is replayable")
      else 0L
    }
  }

  /** Persist batch `batchId`'s cumulative total and prune state older
    * than its predecessor. The create-overwrite is safe without a
    * rename dance: a torn `batch-N` can only exist if batch N never
    * committed, in which case the replay of N rewrites it (same prior
    * offset + deterministic input → same bytes) before any batch N+1
    * reads it. */
  private[streaming] def writeOffset(spark: SparkSession, stateDir: String,
      batchId: Long, totalAfter: Long): Unit = {
    val fs = fsFor(spark, stateDir)
    val out = fs.create(batchFile(stateDir, batchId), true)
    try out.write(totalAfter.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.listStatus(offsetDir(stateDir)).foreach { s =>
      batchIdOf(s.getPath).foreach { id =>
        if (id < batchId - 1) { fs.delete(s.getPath, false); () }
      }
    }
  }

  /** The offsets-carry protocol as a shared wrapper: packs the batch
    * against the carried offset, runs `body(batch, packed, batchId)`,
    * then persists the new cumulative total and drops operator
    * caches. Every carry subtlety lives HERE once — the packer and
    * the release manifester ([[StreamingRelease]]) both wear it, so
    * the carry semantics cannot fork between twins. The batch total
    * re-reads the operator's persisted narrow (id, count) frame, not
    * the input — a second tiny job, and it must not depend on whether
    * `body` materialized its frame. */
  private[streaming] def withOffsetsCarry(budget: Long, stateDir: String,
      idCol: String, textCol: String, bucketWidth: Long)(
      body: (DataFrame, DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val prior = priorOffset(spark, stateDir, batchId)
      val packed = Packing.packByTokenBudget(batch, budget, idCol, textCol,
        bucketWidth, startOffset = prior)
      body(batch, packed, batchId)
      val batchTokens = packed.agg(coalesce(sum(col("n_tokens")), lit(0L)))
        .as[Long].head()
      writeOffset(spark, stateDir, batchId, prior + batchTokens)
      // the packing op's internal persist must not outlive its batch
      graft.ops.Dedup.releaseCaches()
  }

  /** The `foreachBatch` body: packs each micro-batch against the
    * carried offset, hands the (idCol, n_tokens, shard) frame to
    * `sink`, then persists the new cumulative total. Wire as
    * {{{ stream.writeStream.foreachBatch(
    *       StreamingPacking.foreachBatchPacker(budget, stateDir, sink)) }}}
    */
  def foreachBatchPacker(budget: Long, stateDir: String,
      sink: DataFrame => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      bucketWidth: Long = 100000L): (DataFrame, Long) => Unit =
    withOffsetsCarry(budget, stateDir, idCol, textCol, bucketWidth) {
      (_, packed, _) => sink(packed)
    }
}
