package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** The crawl FRONT HALF under `readStream`: conditional HTML
  * extraction and the encoding gate are STATELESS (scan-fused column
  * expressions — they run per micro-batch unchanged), and the one
  * corpus-stateful stage, line-level dedup, delegates to
  * [[StreamingLineDedup]]'s upsert-contract body. Composition result
  * (asserted in StreamingSpec): after batch N the sink's latest row
  * per doc equals the BATCH front half — extract → encoding gate →
  * [[graft.ops.Dedup.lineDedup]] — over the concatenation of batches
  * 0..N. The back half (decon → gates → keeper → mix) stays batch:
  * its stages are corpus-global decisions a training run makes on a
  * frozen snapshot, not per-arrival ones. */
object StreamingCuration {

  /** Stateless front gates shared by the streaming body and the batch
    * reference — delegates to the canonical
    * [[TextAnalysis.crawlFrontGates]] (also what `tx_curation6`'s
    * batch pipeline uses, so the two surfaces cannot fork). */
  def frontGates(docs: DataFrame, textCol: String = "text"): DataFrame =
    TextAnalysis.crawlFrontGates(docs, textCol)

  /** The `foreachBatch` body: stateless gates, then the line-dedup
    * upsert body against `stateDir` (same replay-idempotence and
    * upsert contracts as [[StreamingLineDedup.foreachBatchLineDeduper]]). */
  def frontHalfBody(maxOccurrences: Long, stateDir: String,
      sink: DataFrame => Unit, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Long) => Unit = {
    val lineBody = StreamingLineDedup.foreachBatchLineDeduper(
      maxOccurrences, stateDir, sink, idCol, textCol)
    (batch: DataFrame, batchId: Long) =>
      lineBody(frontGates(batch, textCol), batchId)
  }
}
