package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.{Bpe, Wordpiece}

/** Streaming WordPiece/BPE fertility scoring — the streaming half of
  * the tokenizer's train-once / score-forever lifecycle: merges are
  * learned in a batch job and persisted ([[graft.ops.Bpe.MergesArtifact]]);
  * each micro-batch of documents is scored under the FROZEN merge
  * sequence ([[graft.ops.Wordpiece.scoreDocs]] — per-doc greedy-
  * WordPiece vs merge-order-BPE token totals). Scoring is per-doc-
  * local (a word's segmentation under a frozen vocabulary does not
  * depend on which batch carried it), so batch boundaries cannot
  * change a single row — the stateless twin pattern.
  *
  * Exactly-once layout is the [[StreamingLid]]/[[StreamingClf]]
  * contract: each batch overwrites its own `batch_id=<id>` partition;
  * deterministic scoring + deterministic target ⇒ checkpoint replay
  * rewrites identical bytes instead of duplicating rows.
  */
object StreamingWordpiece {

  /** `foreachBatch` body scoring each micro-batch under frozen
    * merges (load via [[graft.ops.Bpe.MergesArtifact.load]], which
    * rejects truncated/duplicated artifacts loudly). */
  def scoringAppender(merges: Seq[Bpe.Merge],
      outPath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      Wordpiece.scoreDocs(batch, merges)
        .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
}
