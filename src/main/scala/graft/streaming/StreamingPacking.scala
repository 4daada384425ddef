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
  * long, persisted per batch id under `stateDir`, so a replayed batch
  * (restart from checkpoint re-runs the last uncommitted batch) reads
  * the SAME prior offset and emits identical shard ids —
  * deterministic input → idempotent output. A
  * `flatMapGroupsWithState` formulation would funnel every doc
  * through one state key (the serial trap the batch op exists to
  * avoid); carrying one scalar through `foreachBatch` keeps the
  * per-batch plan parallel and the state O(1).
  *
  * Ordering contract: docs pack in arrival order (within a batch:
  * `idCol` order) — the streaming analogue of the batch contract's
  * global id order. A stream fed id-ordered batches produces
  * byte-identical assignments to one batch run over the concatenation
  * (StreamingSpec).
  */
object StreamingPacking {

  private def offsetPath(stateDir: String) = s"$stateDir/offsets"

  /** Cumulative token total persisted after the newest batch BEFORE
    * `batchId` (0 when none): replays of batch N read only rows with
    * batch_id < N, never their own possibly-duplicated row. */
  private[streaming] def priorOffset(spark: SparkSession, stateDir: String,
      batchId: Long): Long = {
    // Hadoop FS, not java.io.File: the state dir of a production
    // stream lives on HDFS/S3, where the local-file API silently sees
    // nothing and every batch would restart the count at zero
    val p = new org.apache.hadoop.fs.Path(offsetPath(stateDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      import spark.implicits._
      spark.read.parquet(offsetPath(stateDir))
        .filter(col("batch_id") < batchId)
        .orderBy(col("batch_id").desc).limit(1)
        .select("total_after").as[Long].collect()
        .headOption.getOrElse(0L)
    }
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
      bucketWidth: Long = 100000L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val prior = priorOffset(spark, stateDir, batchId)
      val packed = Packing.packByTokenBudget(batch, budget, idCol, textCol,
        bucketWidth, startOffset = prior)
      sink(packed)
      // the batch total re-reads the operator's persisted narrow
      // (id, count) frame, not the input — a second tiny job, and it
      // must not depend on whether the sink materialized its frame
      val batchTokens = packed.agg(coalesce(sum(col("n_tokens")), lit(0L)))
        .as[Long].head()
      Seq((batchId, prior + batchTokens)).toDF("batch_id", "total_after")
        .coalesce(1).write.mode("append").parquet(offsetPath(stateDir))
      // the packing op's internal persist must not outlive its batch
      graft.ops.Dedup.releaseCaches()
  }
}
