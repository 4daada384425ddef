package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.Bpe

/** Streaming BPE id-encoding — the ingest half of the tokenizer
  * train-once / encode-forever lifecycle: merge learning stays a batch
  * job ([[graft.ops.Bpe.learnMerges]] is a corpus-wide fixed sequence,
  * exactly like classifier training and ANN centroids), and the stream
  * only ever runs the stateless encode body
  * ([[graft.ops.Bpe.encodeIds]]) under a FROZEN merge sequence —
  * typically reloaded from [[graft.ops.Bpe.MergesArtifact]], whose
  * load validates rank completeness so a truncated artifact cannot
  * silently encode with a different tokenizer.
  *
  * Each micro-batch of documents becomes its (doc_id, widx, sidx,
  * token_id) id rows — the artifact a trainer consumes — in the ids
  * store. Exactly-once layout is the [[StreamingClf]] /
  * [[StreamingAnn]] contract verbatim: every batch overwrites its own
  * `batch_id=<id>` partition, and deterministic encoding under a
  * frozen merge sequence means a checkpoint replay rewrites the same
  * bytes instead of duplicating rows. Readers just
  * `spark.read.parquet(idsPath)`.
  *
  * Scale shape is inherited from [[graft.ops.Bpe.encodeIds]]: the
  * micro-batch word stream equi-joins the merged-word table built FROM
  * THE BATCH (batch-sized), and the model-sized id table broadcasts —
  * no state store, no corpus-wide shuffle, so the stream sustains any
  * batch size the batch encoder would.
  */
object StreamingBpe {

  /** `foreachBatch` body id-encoding each micro-batch under a frozen
    * merge sequence. */
  def encodingAppender(merges: Seq[Bpe.Merge],
      idsPath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      Bpe.encodeIds(batch.sparkSession, batch, merges)
        .write.mode("overwrite").parquet(s"$idsPath/batch_id=$batchId")
}
