package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, SuffixArray}

/** Streaming suffix-array maintenance — the prefix-recompute twin of
  * [[graft.ops.SuffixArray.suffixRanks]]: suffix ranks are a GLOBAL
  * property of the corpus (one new document shifts the ranks of every
  * suffix it outranks), so the snapshot-replace contract applies —
  * each batch carries its documents under the `batch_id=` protocol
  * and the snapshot recomputes the construction over everything seen
  * so far, equal to the batch operator on the concatenated prefix by
  * construction (the token-budget/UniMax twins' shape; a truly
  * incremental distributed suffix array is a research problem, and
  * recompute is the honest published contract — Lee et al. rebuild
  * per release too).
  *
  * State is corpus-sized like the substr-dedup twin's (a global index
  * costs the corpus); a replayed batch rewrites its own partition
  * byte-for-byte. */
object StreamingSuffix {

  /** `foreachBatch` body: carry this batch's docs, recompute the
    * suffix ranks of the prefix, hand the full rank table to `sink`
    * (which replaces, not appends). */
  def foreachBatchSuffixRanks(stateDir: String,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val contrib = batch.select(col("doc_id"), col("text"))
      StreamingState.writePartition(contrib, s"$stateDir/docs", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/docs",
        contrib.schema, batchId)
      sink(SuffixArray.suffixRanks(all.select("doc_id", "text")))
      Dedup.releaseCaches()
    }
}
