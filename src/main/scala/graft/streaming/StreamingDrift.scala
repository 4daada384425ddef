package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis, Versioning}

/** Streaming release-drift monitor — the summary-carry twin of
  * [[graft.ops.Versioning.distributionDrift]]: the v1 (released)
  * histogram is a FROZEN artifact (`bins` rows, collected once from
  * the released corpus); each micro-batch of candidate-release docs
  * reduces to its own bounded `(bin, n)` histogram contribution under
  * the `batch_id=` protocol, and the snapshot sums all contributions
  * so far into the v2 histogram and re-runs the SAME
  * [[graft.ops.Versioning.distributionDriftFromHists]] core — so the
  * snapshot equals the batch drift of the concatenated prefix by
  * construction, and state is bounded at `bins` rows PER BATCH
  * regardless of corpus size (the cheapest state shape of the three
  * twin patterns: a histogram is summable, so nothing per-doc is
  * carried).
  *
  * Replay: a re-run batch rewrites its own partition with identical
  * bytes (the contribution is a pure function of the batch), so
  * drift never double-counts. */
object StreamingDrift {

  /** `foreachBatch` body: carry this batch's histogram, sum the
    * prefix, emit the drift table vs the frozen v1 histogram. */
  def foreachBatchDrift(v1Hist: Seq[(Long, Long)], bins: Int,
      stateDir: String,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      import spark.implicits._
      val contrib = Versioning.scoreHistogram(
        batch.select(TextAnalysis.qualityScore(col("text")).as("score")),
        bins)
      StreamingState.writePartition(contrib, s"$stateDir/hist", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/hist",
        contrib.schema, batchId)
      val h2 = all.groupBy("bin").agg(sum("n").as("n"))
      sink(Versioning.distributionDriftFromHists(
        v1Hist.toDF("bin", "n"), h2, bins))
      Dedup.releaseCaches()
    }
}
