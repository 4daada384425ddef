package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TimeSeries}

/** Streaming cohort retention — the `foreachBatch` twin of
  * [[graft.ops.TimeSeries.retention]].
  *
  * Retention is RETROACTIVE in a stronger way than a count: a late
  * event carrying an EARLIER week than anything a user has shown moves
  * that user's whole cohort, changing rows the sink already holds for
  * several (cohort, offset) keys at once. The output is therefore a
  * SNAPSHOT contract: each batch emits the complete current retention
  * matrix and the sink replaces its table (the matrix is cohorts ×
  * offsets — weeks², small at any corpus size — so a full replace is
  * cheaper than diffing it).
  *
  * State layout: each batch overwrites its own partition
  * `weeks/batch_id=N` with the batch's distinct `(_u, _w)` pairs
  * (dynamic partition overwrite — a checkpoint-replayed batch rewrites
  * its files instead of duplicating, the [[StreamingAnn]] exactly-once
  * pattern). The cumulative state is the distinct user-week table:
  * bounded by users × active weeks, NOT by event count — the stream
  * compacts events to at most one row per user per week before
  * anything persists. Per-batch work is one distinct over that compact
  * state plus the [[TimeSeries.retentionFromWeeks]] rollup (all
  * map-side-combined aggregations and one user-key join).
  */
object StreamingRetention {

  private def weeksDir(stateDir: String) = s"$stateDir/weeks"

  /** The `foreachBatch` body. `sink` receives the full
    * `(cohort_week, week_offset, n_users)` snapshot each batch and
    * must REPLACE its table with it. */
  def foreachBatchRetention(stateDir: String, sink: DataFrame => Unit,
      userCol: String = "user_id", tsCol: String = "ts"): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val batchWeeks = batch.select(col(userCol).as("_u"),
          date_trunc("week", col(tsCol)).as("_w"))
        .distinct()
      StreamingState.writePartition(batchWeeks, weeksDir(stateDir), batchId)
      val weeks = Dedup.persistTracked(
        StreamingState.readUpTo(spark, weeksDir(stateDir),
            batchWeeks.schema, batchId)
          .select("_u", "_w").distinct())
      sink(TimeSeries.retentionFromWeeks(weeks))
      Dedup.releaseCaches()
  }
}
