package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming Kaplan–Meier — the summary-carry twin of
  * [[graft.ops.TimeSeries.kaplanMeier]]: the whole survival state per
  * user is the triple (first event, last event, first conversion),
  * and triples merge across micro-batches by min / max / min — an
  * algebra that is associative AND idempotent, so a checkpoint-replayed
  * batch merges to the identical state by algebra (the HLL-class
  * guarantee; the contribution protocol underneath makes the on-disk
  * carry replay-safe too). The snapshot runs the SAME curve core as
  * the batch op over the merged triples, so snapshot ≡ batch KM on the
  * concatenated prefix by construction — including retro-corrections
  * (a user censored in batch 0 who converts in batch 2 moves from the
  * censored mass to an event row). */
object StreamingSurvival {

  def foreachBatchKaplanMeier(eventType: String, stateDir: String,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val contrib = batch.select(col("user_id").as("_u"),
          unix_micros(col("ts").cast("timestamp")).as("_us"),
          col("event_type").as("_ty"))
        .groupBy("_u")
        .agg(min(col("_us")).as("_first"), max(col("_us")).as("_last"),
          min(when(col("_ty") === eventType, col("_us"))).as("_ev"))
      StreamingState.writePartition(contrib, s"$stateDir/km", batchId)
      val all = StreamingState.readUpTo(spark, s"$stateDir/km",
        contrib.schema, batchId)
      val merged = all.groupBy("_u")
        .agg(min("_first").as("_first"), max("_last").as("_last"),
          min("_ev").as("_ev"))
      sink(graft.ops.TimeSeries.kaplanMeierFromUserStats(merged))
      Dedup.releaseCaches()
  }
}
