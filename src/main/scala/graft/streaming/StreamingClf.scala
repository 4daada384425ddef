package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.TextAnalysis

/** Streaming classifier inference — the streaming half of the
  * train-once / score-forever lifecycle for the logistic quality
  * model ([[graft.ops.TextAnalysis.trainLogistic]]): each micro-batch
  * of documents is scored under the FROZEN weight map and lands in
  * the scores store. Training stays a batch job (full-batch GD is a
  * corpus-wide fixed point, exactly like ANN model training); the
  * stream only ever runs the stateless inference body, so scores are
  * reproducible against the model artifact regardless of arrival
  * order or batch boundaries.
  *
  * Exactly-once layout is the [[StreamingAnn]] contract verbatim:
  * each batch overwrites its own `batch_id=<id>` partition —
  * deterministic scoring + deterministic target ⇒ a checkpoint replay
  * rewrites the same bytes instead of duplicating rows. Readers just
  * `spark.read.parquet(scoresPath)`.
  */
object StreamingClf {

  /** `foreachBatch` body scoring each micro-batch under a frozen
    * [[graft.ops.TextAnalysis.ClfModel]] (train with
    * [[graft.ops.TextAnalysis.trainLogistic]], persist / reload via
    * `saveClfModel` / `loadClfModel` — the hash width travels inside
    * the model, so a width mismatch cannot reach the scorer). */
  def scoringAppender(model: TextAnalysis.ClfModel, scoresPath: String,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      TextAnalysis.scoreWithClfModel(batch, model, idCol, textCol)
        .write.mode("overwrite").parquet(s"$scoresPath/batch_id=$batchId")
}
