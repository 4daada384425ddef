package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TimeSeries}

/** Streaming event-type transition matrix — the `foreachBatch` twin of
  * [[graft.ops.TimeSeries.transitions]], completing the twin set for
  * the event-analytics family (funnel, retention, transitions).
  *
  * Transition counts are NOT append-only under out-of-order arrival: a
  * late event landing in the MIDDLE of a user's sequence splits an
  * already-counted adjacency (a→c becomes a→b plus b→c), so per-pair
  * counters cannot be folded forward. Like [[StreamingFunnel]], the
  * twin recomputes AFFECTED users (those with events in the batch)
  * from their full event history and emits a SNAPSHOT — the complete
  * `(from_type, to_type, n, p)` matrix (types², small) the sink
  * replaces each batch.
  *
  * State layout (each batch overwrites its own `batch_id=N` partition
  * — a checkpoint-replayed batch rewrites instead of duplicating):
  *   - `events/batch_id=N`: the batch's distinct normalized events
  *     (exact retro-ordering needs the events themselves; duplicates
  *     compact per batch, and cross-batch duplicates compact in the
  *     recompute's distinct).
  *   - `upairs/batch_id=N`: the recomputed users' per-user pair
  *     vectors `(_u, from_type, to_type, n)` — newest batch wins
  *     WHOLESALE per user (a mid-sequence insert can delete a pair
  *     from a user's vector, so per-pair max/merge would be wrong).
  *
  * Per-batch work scales with the affected users (user-key semi-join
  * into event state; per-user lag windows are bounded domains); the
  * snapshot aggregates the user-pair state, which is bounded by
  * users × types² — compact, not event-sized.
  */
object StreamingTransitions {

  private def eventsDir(stateDir: String) = s"$stateDir/events"
  private def upairsDir(stateDir: String) = s"$stateDir/upairs"

  /** The `foreachBatch` body. `sink` receives the full
    * `(from_type, to_type, n, p)` snapshot each batch and must REPLACE
    * its table with it. */
  def foreachBatchTransitions(stateDir: String, sink: DataFrame => Unit,
      userCol: String = "user_id", tsCol: String = "ts",
      orderCol: String = "event_id",
      typeCol: String = "event_type"): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val batchEv = batch.select(col(userCol).as("_u"),
          unix_micros(col(tsCol)).as("_us"), col(orderCol).as("_oid"),
          col(typeCol).as("_ty"))
        .distinct()
      StreamingState.writePartition(batchEv, eventsDir(stateDir), batchId)
      val allEv = StreamingState.readUpTo(spark, eventsDir(stateDir),
        batchEv.schema, batchId)
      val affected = batchEv.select(col("_u").as("_au")).distinct()
      // NULL-SAFE semi join: the batch op's user window keeps a
      // null-user partition, so the twin must recompute it too
      val affectedEv = Dedup.persistTracked(
        allEv.select("_u", "_us", "_oid", "_ty").distinct()
          .join(affected, col("_u") <=> col("_au"), "left_semi"))
      val uvec = TimeSeries.adjacentPairs(affectedEv,
          userCol = "_u", tsCol = "_us", orderCol = "_oid", typeCol = "_ty")
        .groupBy("_u", "from_type", "to_type")
        .agg(count(lit(1)).as("n"))
      StreamingState.writePartition(uvec, upairsDir(stateDir), batchId)
      val upSchema = new org.apache.spark.sql.types.StructType()
        .add("_u", batchEv.schema("_u").dataType)
        .add("from_type", org.apache.spark.sql.types.StringType)
        .add("to_type", org.apache.spark.sql.types.StringType)
        .add("n", org.apache.spark.sql.types.LongType)
      val upairs = Dedup.persistTracked(
        StreamingState.readUpTo(spark, upairsDir(stateDir), upSchema, batchId))
      // newest-wins wholesale per user: only the rows from each user's
      // LAST recompute are live (null-safe on the user key for the
      // same reason as the semi join above)
      val lastBatch = upairs.groupBy("_u")
        .agg(max(col("batch_id")).as("_mb"))
        .select(col("_u").as("_lu"), col("_mb"))
      val latest = upairs
        .join(lastBatch, upairs("_u") <=> col("_lu"))
        .filter(col("batch_id") === col("_mb"))
      sink(TimeSeries.transitionProbabilities(
        latest.groupBy("from_type", "to_type").agg(sum(col("n")).as("n"))))
      Dedup.releaseCaches()
  }
}
