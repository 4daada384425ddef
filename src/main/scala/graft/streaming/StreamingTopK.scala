package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling}

/** Streaming per-group bounded top-k — the `foreachBatch` twin of
  * [[graft.ops.Sampling.topKPerGroup]] (the C4/RefinedWeb "cap docs
  * per registrable domain, keep the best" quota rule), so the curation
  * stage that ranks inside a group composes under `readStream` like
  * the rest of the crawl pipeline.
  *
  * The quota is retroactive: a later batch's better candidate EVICTS a
  * row the quota admitted earlier, so the sink keys on the GROUP and
  * each emitted group's kept rows REPLACE wholesale (newest wins) —
  * the [[StreamingTransitions]] per-user contract, per group here.
  *
  * The merge exploits top-k's self-merge property:
  * `topK(∪ᵢ topK(batchᵢ)) = topK(∪ᵢ batchᵢ)` — every row of the
  * global top-k is necessarily in its own batch's top-k. So state
  * holds each batch's top-k CONTRIBUTION only (≤ k rows per group per
  * batch — never the corpus), each batch overwriting its own
  * `batch_id=N` partition (checkpoint replays rewrite, not
  * duplicate), and the recompute is ONE [[Sampling.topKPerGroup]]
  * aggregation (bounded-buffer partial agg, no hot-group window) over
  * the affected groups' contributions.
  *
  * Emission is batch-bounded: ≤ k rows for each group present in the
  * batch (an affected group whose kept set did not change re-emits
  * identical rows — wholesale replace is idempotent), never
  * history-sized.
  */
object StreamingTopK {

  private def contribDir(stateDir: String) = s"$stateDir/contrib"

  /** The `foreachBatch` body. `rankKey` must be a TOTAL order over the
    * input columns (see [[Sampling.topKPerGroup]] — e.g.
    * `struct(negate(col("quality")), col("doc_id"))`); `sink` receives
    * the current kept rows of every group present in the batch and
    * must replace those groups' rows wholesale. */
  def foreachBatchTopK(groupCol: String, rankKey: Column, k: Int,
      stateDir: String, sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    require(k > 0, "k must be positive")
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val contrib = Sampling.topKPerGroup(batch, groupCol, rankKey, k)
      StreamingState.writePartition(contrib, contribDir(stateDir), batchId)
      val affected = contrib.select(col(groupCol).as("_ag")).distinct()
      // cross-batch duplicates (an upstream retry landing the same row
      // in a LATER batch) compact in the distinct; the NULL-SAFE join
      // keeps the null group — a legal quota pool in the batch op's
      // groupBy — recomputable by the twin
      val mine = Dedup.persistTracked(
        StreamingState.readUpTo(spark, contribDir(stateDir),
            contrib.schema, batchId)
          .drop("batch_id").distinct()
          .join(affected, col(groupCol) <=> col("_ag"), "left_semi"))
      sink(Sampling.topKPerGroup(mine, groupCol, rankKey, k))
      Dedup.releaseCaches()
  }
}
