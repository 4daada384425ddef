package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.TextAnalysis

/** Streaming language-ID inference — the streaming half of the
  * train-once / score-forever lifecycle for the trained LID
  * ([[graft.ops.TextAnalysis.trainLid]]): each micro-batch of
  * documents is scored under the FROZEN multi-head model (per-class
  * sigmoid scores + argmax prediction) and lands in the predictions
  * store. Training stays a batch job (full-batch GD over the labeled
  * corpus, the [[StreamingClf]] rationale verbatim); scoring is a
  * featurize pass plus a pure projection with the K weight maps as
  * broadcast literals — per-doc-local, so batch boundaries cannot
  * change a single score.
  *
  * Exactly-once layout is the [[StreamingAnn]]/[[StreamingClf]]
  * contract: each batch overwrites its own `batch_id=<id>` partition —
  * deterministic scoring + deterministic target ⇒ a checkpoint replay
  * rewrites the same bytes instead of duplicating rows. Readers just
  * `spark.read.parquet(predsPath)`.
  */
object StreamingLid {

  /** `foreachBatch` body scoring each micro-batch under a frozen
    * [[graft.ops.TextAnalysis.LidModel]] (train with
    * [[graft.ops.TextAnalysis.trainLid]], persist / reload via
    * `saveLidModel` / `loadLidModel` — hash width and char-gram size
    * travel inside the model, so a featurizer mismatch cannot reach
    * the scorer). */
  def scoringAppender(model: TextAnalysis.LidModel, predsPath: String,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      // persist the featurize pass for the K-class scorer (the r15
      // scoreWithLidModel lesson: unpersisted, the char-gram
      // featurization re-expands into every per-class expression
      // site), with a batch-local lifecycle — the frame dies with
      // the batch write instead of riding the global tracked pool
      val feat = TextAnalysis.lidFeaturize(batch, model, idCol, textCol)
        .persist()
      try TextAnalysis.lidScoredFrom(feat, model)
        .write.mode("overwrite").parquet(s"$predsPath/batch_id=$batchId")
      finally { feat.unpersist(); () }
    }
}
