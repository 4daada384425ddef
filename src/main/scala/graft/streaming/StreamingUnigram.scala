package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.UnigramLm

/** Streaming unigram-LM scoring — the tokenizer triad's third
  * train-once / score-forever twin (after [[StreamingBpe]] and
  * [[StreamingWordpiece]]): the model (piece counts) is learned in a
  * batch job and persisted ([[graft.ops.UnigramLm.ModelArtifact]]);
  * each micro-batch of documents is scored under the FROZEN counts
  * ([[graft.ops.UnigramLm.scoreWithModel]] — the batch's own word
  * table is Viterbi-segmented under the frozen probabilities, so
  * unseen words score correctly and batch boundaries cannot change a
  * row: the stateless twin pattern).
  *
  * Exactly-once layout is the [[StreamingLid]]/[[StreamingClf]]
  * contract: each batch overwrites its own `batch_id=<id>` partition;
  * deterministic scoring + deterministic target ⇒ checkpoint replay
  * rewrites identical bytes instead of duplicating rows.
  */
object StreamingUnigram {

  /** `foreachBatch` body scoring each micro-batch under a frozen
    * unigram model (load via [[graft.ops.UnigramLm.ModelArtifact.load]],
    * which rejects incomplete-alphabet/duplicate artifacts loudly). */
  def scoringAppender(model: Seq[UnigramLm.Piece],
      outPath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      UnigramLm.scoreWithModel(batch, model)
        .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
}
