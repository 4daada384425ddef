package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.TextAnalysis

/** Streaming LM-perplexity scoring — the quality gate's ingest half:
  * the Kneser–Ney bigram model trains once on a reference corpus
  * ([[graft.ops.TextAnalysis.knBigramModel]], a corpus-wide count
  * fixed point like classifier weights and ANN centroids), and the
  * stream only ever runs the stateless scoring body
  * ([[graft.ops.TextAnalysis.scoreWithKnModel]]) under the FROZEN
  * count frames — each micro-batch joins against the static model
  * tables (stream-static equi-joins; the 1-row total broadcasts) and
  * lands per-doc `kn_log10p` scores in the store. Out-of-model text
  * follows the defined backoff ladder, so scores on unseen docs are
  * reproducible against the model artifact regardless of arrival
  * order or batch boundaries.
  *
  * Exactly-once layout is the [[StreamingClf]]/[[StreamingBpe]]
  * contract verbatim: each batch overwrites its own `batch_id=<id>`
  * partition, and deterministic scoring under a frozen model means a
  * checkpoint replay rewrites identical rows.
  */
object StreamingLm {

  /** `foreachBatch` body scoring each micro-batch under a frozen
    * [[graft.ops.TextAnalysis.KnModel]]. */
  def knScoringAppender(model: TextAnalysis.KnModel,
      scoresPath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      TextAnalysis.scoreWithKnModel(batch, model)
        .write.mode("overwrite").parquet(s"$scoresPath/batch_id=$batchId")
}
