package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** Streaming token-budget mixing — the carried-stats `foreachBatch`
  * twin of [[graft.ops.Sampling.tokenBudgetMix]]: each batch's docs
  * reduce to their NARROW admission stats (doc_id, source, q,
  * n_tokens — never the text) and ride the `batch_id=` contribution
  * protocol; the snapshot re-runs the SAME
  * [[graft.ops.Sampling.admitFromStats]] core over all stats so far,
  * so snapshot ≡ batch admission on the concatenated prefix by
  * construction.
  *
  * Admission is RETRO-CORRECTING by design: a boundary doc admitted in
  * batch 0 is evicted when a later batch delivers higher-quality
  * grains for its source (the budget is a property of the corpus, not
  * of arrival order) — the retention/funnel twins' snapshot-replace
  * contract, not an append-only sink. State grows with the corpus but
  * holds 4 scalars per doc; a replayed batch rewrites its own
  * partition byte-for-byte (sum-free, so double-writes are harmless
  * too). */
object StreamingMixing {

  def foreachBatchTokenBudget(budget: Long, stateDir: String,
      bucketWidth: Long, sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val contrib = batch.select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      StreamingState.writePartition(contrib, s"$stateDir/docstats", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/docstats",
        contrib.schema, batchId)
      sink(Sampling.admitFromStats(all, budget, bucketWidth = bucketWidth))
      Dedup.releaseCaches()
  }

  /** Streaming UniMax — the same carried-stats protocol feeding
    * [[graft.ops.Sampling.unimaxFromStats]]: every snapshot recomputes
    * the waterfill over ALL languages' token totals so far, so the
    * ALLOCATIONS retro-correct too (a language capped while small can
    * become the uncapped budget-setter as its corpus grows — the
    * whole budget table is a property of the corpus, not of arrival
    * order), and admission under the fresh allocations follows. The
    * budget is a fraction `budgetNum`/`budgetDen` of the total tokens
    * SEEN SO FAR — pinned against the batch operator on the
    * concatenated prefix by the stream-equals-batch spec. */
  def foreachBatchUnimax(budgetNum: Long, budgetDen: Long,
      epochCap: Long, stateDir: String, bucketWidth: Long,
      sink: DataFrame => Unit,
      langCol: String = "lang"): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val contrib = batch.select(col("doc_id"), col(langCol).as("source"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      StreamingState.writePartition(contrib, s"$stateDir/docstats", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/docstats",
        contrib.schema, batchId)
      sink(Sampling.unimaxFromStats(all, budgetNum, budgetDen, epochCap,
        bucketWidth = bucketWidth))
      Dedup.releaseCaches()
  }
}
