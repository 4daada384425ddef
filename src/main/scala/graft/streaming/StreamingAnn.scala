package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.ops.{Dedup, Ivf, Pq}

/** Streaming ANN index ingest — the streaming half of the
  * train-once / append-forever lifecycle: each micro-batch of new
  * vectors is encoded against the FROZEN model(s) and lands in the
  * stored index, so searches ([[graft.ops.Ivf.knnEncoded]] /
  * [[graft.ops.Pq.knnEncoded]] / [[graft.ops.Pq.ivfPqKnnEncoded]])
  * see it on their next load.
  *
  * Exactly-once layout: a checkpoint-replayed micro-batch re-runs its
  * `foreachBatch`, and a blind parquet append would DUPLICATE its
  * rows in the index. Each batch therefore writes its own
  * `batch_id=<id>` partition directory with overwrite semantics —
  * deterministic encode + deterministic target ⇒ a replay rewrites
  * the same files byte-for-byte instead of doubling them
  * (StreamingSpec asserts both the stream-equals-batch index and the
  * replay-no-duplicates property). Readers just
  * `spark.read.parquet(indexPath)`; the discovered `batch_id`
  * partition column rides along and the search ops ignore it.
  */
object StreamingAnn {

  private def appender(encode: DataFrame => DataFrame, indexPath: String)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      encode(batch).write.mode("overwrite")
        .parquet(s"$indexPath/batch_id=$batchId")
      // operator-internal persists (IVF-PQ residual frame) must not
      // outlive the micro-batch that created them
      Dedup.releaseCaches()
    }

  /** `foreachBatch` body appending each micro-batch to an IVF index
    * (the [[graft.ops.Ivf.encodeCorpus]] layout). */
  def ivfAppender(centroids: Array[Array[Double]], indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Long) => Unit =
    appender(b => Ivf.encodeCorpus(b, centroids, idCol, vecCol), indexPath)

  /** `foreachBatch` body appending each micro-batch to a PQ index
    * (the [[graft.ops.Pq.encode]] layout). */
  def pqAppender(codebooks: Array[Array[Array[Double]]], indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Long) => Unit =
    appender(b => Pq.encode(
      b.select(col(idCol), col(vecCol)), codebooks, idCol, vecCol), indexPath)

  /** `foreachBatch` body appending each micro-batch to a full IVF-PQ
    * index (the [[graft.ops.Pq.ivfPqEncodeCorpus]] layout). */
  def ivfPqAppender(centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Long) => Unit =
    appender(b => Pq.ivfPqEncodeCorpus(b, centroids, codebooks, idCol, vecCol),
      indexPath)
}
