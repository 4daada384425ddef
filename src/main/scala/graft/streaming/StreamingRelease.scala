package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Release

/** Streaming release-manifest maintenance — the `foreachBatch` twin of
  * [[graft.ops.Release.manifest]], built on two existing contracts:
  * [[StreamingPacking]]'s O(1) offsets-carry makes shard assignment
  * STABLE across batches (a doc's shard never changes once assigned —
  * the next batch continues from the carried token total), and the
  * manifest's rollup algebra (count/sum/XOR) is associative, so
  * merging per-batch CONTRIBUTIONS equals the batch manifest over the
  * concatenation — including the boundary shard that straddles two
  * batches, whose two partial rows combine into exactly the batch
  * row.
  *
  * Exactly-once: each batch's per-shard contribution lands in its own
  * `batch_id=` partition ([[StreamingState]] — replay rewrites,
  * `<= batchId` reads blind later state), and the emitted snapshot is
  * the rollup over contributions up to this batch. State is the
  * contribution partitions plus [[StreamingPacking]]'s one-long
  * offset file.
  */
object StreamingRelease {

  /** Wire as
    * {{{ stream.writeStream.foreachBatch(
    *       StreamingRelease.foreachBatchManifester(
    *         budget, stateDir, sink)) }}}
    * `sink` receives the full manifest snapshot
    * `(shard, n_docs, n_tokens, content_hash)` each batch. */
  def foreachBatchManifester(budget: Long, stateDir: String,
      sink: DataFrame => Unit, idCol: String = "doc_id",
      textCol: String = "text", bucketWidth: Long = 100000L)
      : (DataFrame, Long) => Unit =
    // the carry protocol and the per-shard rollup definition both come
    // from their single sources of truth (withOffsetsCarry,
    // manifestFromAssigned) — neither can fork from its batch twin
    StreamingPacking.withOffsetsCarry(budget, stateDir, idCol, textCol,
        bucketWidth) { (batch, assigned, batchId) =>
      val spark = batch.sparkSession
      val contrib = Release.manifestFromAssigned(batch, assigned,
        idCol, textCol)
      StreamingState.writePartition(contrib, s"$stateDir/contrib", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/contrib",
        contrib.schema, batchId)
      sink(all.groupBy("shard")
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          expr("bit_xor(content_hash)").as("content_hash")))
    }
}
