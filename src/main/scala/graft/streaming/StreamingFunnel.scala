package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TimeSeries}

/** Streaming conversion funnel — the `foreachBatch` twin of
  * [[graft.ops.TimeSeries.funnel]].
  *
  * The earliest-completion chain is RETROACTIVE in both directions: a
  * late step-1 event EARLIER than the user's known first completion
  * shifts the whole chain's windows, which can both grant later steps
  * (events previously before the window now qualify) and revoke them
  * (events previously inside the window now fall outside). So per-user
  * funnel state cannot be folded forward event-by-event; affected
  * users are RECOMPUTED from their full step-event history, and the
  * output is a SNAPSHOT contract — each batch emits the complete
  * `(step_idx, step, n_users)` table (steps.length rows) and the sink
  * replaces it.
  *
  * State layout (the [[StreamingAnn]] exactly-once pattern — each
  * batch overwrites its own `batch_id=N` partition, so a
  * checkpoint-replayed batch rewrites instead of duplicating):
  *   - `events/batch_id=N`: the batch's distinct `(_u, _us, _ty)`
  *     rows, FILTERED to the step types — exact chain recomputation
  *     needs the events themselves (disclosed: that is the fundamental
  *     cost of exact funnel semantics under retro-shifts; non-step
  *     events never persist, and duplicates compact away per batch).
  *   - `reach/batch_id=N`: `(_u, max_step)` for the users this batch
  *     RECOMPUTED — the chain is monotone (step i+1 requires step i),
  *     so one small int per user is the entire funnel result for that
  *     user. The current reach table is the latest row per user.
  *
  * Per-batch work scales with the AFFECTED users (those with step
  * events in the batch): chain recomputation reads only their history
  * (user-key semi-join, AQE-splittable); the snapshot counts aggregate
  * the user-sized reach table, never the event state.
  */
object StreamingFunnel {

  private def eventsDir(stateDir: String) = s"$stateDir/events"
  private def reachDir(stateDir: String) = s"$stateDir/reach"

  /** The `foreachBatch` body. `sink` receives the full
    * `(step_idx, step, n_users)` snapshot each batch and must REPLACE
    * its table with it. */
  def foreachBatchFunnel(steps: Seq[String], withinSeconds: Long,
      stateDir: String, sink: DataFrame => Unit,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): (DataFrame, Long) => Unit = {
    // fail at wiring time, not hours later on the first trigger
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinSeconds > 0, "withinSeconds must be positive")
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val batchEv = batch
        .filter(col(typeCol).isin(steps: _*))
        .select(col(userCol).as("_u"), unix_micros(col(tsCol)).as("_us"),
          col(typeCol).as("_ty"))
        .distinct()
      StreamingState.writePartition(batchEv, eventsDir(stateDir), batchId)
      val allEv = StreamingState.readUpTo(spark, eventsDir(stateDir),
        batchEv.schema, batchId)
      val affected = batchEv.select(col("_u").as("_au")).distinct()
      // recompute ONLY the affected users, from their full history —
      // distinct across batches (the same event replayed into a later
      // batch must not double-count as two step completions). The semi
      // join is NULL-SAFE: the batch op's groupBy keeps a null-user
      // group, so the twin must recompute it too, or its snapshot
      // diverges from the batch op on null-user events
      val affectedEv = Dedup.persistTracked(
        allEv.select("_u", "_us", "_ty").distinct()
          .join(affected, col("_u") <=> col("_au"), "left_semi"))
      val reach = TimeSeries.funnelReach(affectedEv, steps, withinSeconds)
      StreamingState.writePartition(reach, reachDir(stateDir), batchId)
      // current reach table = latest row per user (a user recomputed
      // by several batches keeps the newest verdict; reaches can DROP
      // under retro-shifts, so newest wins, not max)
      val reachSchema = new org.apache.spark.sql.types.StructType()
        .add("_u", batchEv.schema("_u").dataType)
        .add("max_step", org.apache.spark.sql.types.IntegerType)
      val latest = StreamingState.readUpTo(spark, reachDir(stateDir),
          reachSchema, batchId)
        .groupBy("_u")
        .agg(max_by(col("max_step"), col("batch_id")).as("max_step"))
      val counts = Dedup.persistTracked(
        latest.groupBy("max_step").agg(count(lit(1)).as("n")))
      sink(steps.zipWithIndex.map { case (step, i) =>
        counts.filter(col("max_step") >= i + 1)
          .agg(coalesce(sum(col("n")), lit(0L)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(step).as("step"),
            col("n_users"))
      }.reduce(_.unionByName(_)))
      Dedup.releaseCaches()
  }
}
