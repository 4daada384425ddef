package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time operators over an `events`-like table — the analytics the
  * reference's log model invites but never had (SURVEY §7.4): tumbling
  * windows, sessionization, top-k. Batch forms here; the same
  * expressions run under Structured Streaming with `window()` /
  * watermarks (see graft.streaming).
  */
object TimeSeries {

  /** Micro-second epoch, portable across engines (both Spark's parquet
    * read and DuckDB's `CAST(ts AS TIMESTAMP)` truncate ns → µs). */
  def epochUs(ts: Column): Column = unix_micros(ts.cast("timestamp"))

  /** Tumbling-window counts/sums by a key. `unit`: any `date_trunc`
    * unit ("second"/"minute"/"hour"/"day"/...). The label format must
    * keep every truncated component — a fixed "HH:00" label silently
    * MERGED all sub-hour windows of an hour into one mislabeled row. */
  def tumbling(events: DataFrame, unit: String, keyCol: String,
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val fmt = unit.toLowerCase match {
      case "second" => "yyyy-MM-dd HH:mm:ss"
      case "minute" => "yyyy-MM-dd HH:mm"
      case "hour" => "yyyy-MM-dd HH:00"
      case _ => "yyyy-MM-dd" // day and coarser
    }
    events.groupBy(
        date_format(date_trunc(unit, col(tsCol)), fmt).as("window_start"),
        col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("sum_value"))
  }

  /** Gap-based sessionization: a new session starts after `gapSeconds`
    * of inactivity. Pure window functions — one shuffle on the user key,
    * then a linear scan per user (scales to arbitrarily many users;
    * within-user history must fit a partition, the standard contract).
    */
  def sessionize(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val us = epochUs(col(tsCol))
    val newSession = when(
      lag(us, 1).over(w).isNull ||
        us - lag(us, 1).over(w) > gapSeconds * 1000000L, 1).otherwise(0)
    events.withColumn("new_session", newSession)
      .withColumn("session_idx",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-user session stats from [[sessionize]]. */
  def sessionStats(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame =
    sessionize(events, gapSeconds, userCol, tsCol, idCol)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("session_idx")).as("n_sessions"))
}
