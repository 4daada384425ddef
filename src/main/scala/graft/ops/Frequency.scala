package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency analysis under bounded memory — "the most common tokens /
  * n-grams / domains in the corpus" without shuffling the corpus-sized
  * vocabulary an exact `groupBy(key).count().orderBy().limit(n)`
  * materializes. The summary is
  * [[graft.etl.expressions.SpaceSavingTopK]] (SpaceSaving, Metwally et
  * al. 2005): O(capacity) per task in every aggregation mode, merged
  * like any partial aggregate, `cnt − err ≤ true ≤ cnt` per monitored
  * key with `err == 0` certifying an exact count.
  */
object Frequency {

  /** The full summary as rows: `(key, cnt, err)`, one summary over the
    * whole frame. Capacity rules the memory/accuracy trade: any key
    * with true count > N/capacity is guaranteed monitored. */
  def heavyHitters(df: DataFrame, keyCol: Column, capacity: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val agg = Bridge.column(
      graft.etl.expressions.SpaceSavingTopK(
        Bridge.expression(keyCol), capacity).toAggregateExpression())
    df.agg(agg.as("_ss"))
      .select(explode(col("_ss")).as("_e"))
      .select(col("_e.key").as("key"), col("_e.cnt").as("cnt"),
        col("_e.err").as("err"))
  }

  /** The top `n` keys by count, CERTIFIED exact: only `err == 0` rows
    * (their counts are exact and independent of partition merge order)
    * whose count strictly exceeds every uncertain row's overestimate —
    * so no unmonitored or uncertain key can truly outrank an emitted
    * one, and the emitted (key, cnt) set equals the exact top-n
    * whenever the data's heavy keys clear the sketch (verified against
    * the exact oracle in `tx_heavy_hitters`). A corpus whose top-n is
    * NOT resolvable at this capacity emits fewer than n rows rather
    * than unstable ones. */
  def certifiedTopK(df: DataFrame, keyCol: Column, n: Int,
      capacity: Int): DataFrame = {
    val hh = Dedup.persistTracked(heavyHitters(df, keyCol, capacity))
    val maxUncertain = hh.agg(
      coalesce(max(when(col("err") > 0, col("cnt"))), lit(0L)).as("_mu"))
    hh.filter(col("err") === 0)
      .crossJoin(broadcast(maxUncertain))
      .filter(col("cnt") > col("_mu"))
      .select(col("key"), col("cnt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(n)
  }

  /** EXACT top `n` by the classic two-pass scheme: the sketch pass
    * finds a candidate superset (any key with true count > N/capacity
    * is guaranteed monitored — size the capacity so the n-th true
    * count clears that bar), then the exact pass re-counts ONLY the ≤
    * `capacity` candidates behind a broadcast semi-join — the
    * corpus-sized vocabulary never shuffles; the count shuffle carries
    * at most `capacity` distinct keys. Two scans of the input, both
    * bounded-memory — the standard trade for exact heavy hitters at
    * scale. */
  /** Driver-side merge of two STRING-keyed summary row sets (each the
    * complete `(key, cnt, err)` entry list of a summary, ≤ capacity
    * rows — driver-sized model state, like the IVF centroid matrix):
    * rebuilds both summaries and applies the SAME
    * [[graft.etl.expressions.SpaceSavingSummary.mergeWith]] rule the
    * aggregate's distributed merge uses — the cross-batch carry of
    * [[graft.streaming.StreamingHeavyHitters]] cannot fork from the
    * in-query semantics. */
  private[graft] def mergeSummaryRows(a: Seq[(String, Long, Long)],
      b: Seq[(String, Long, Long)], capacity: Int): Seq[(String, Long, Long)] = {
    val ord = Ordering.by[Any, String](_.asInstanceOf[String])
    def mk(rows: Seq[(String, Long, Long)]) = {
      val s = new graft.etl.expressions.SpaceSavingSummary(capacity, ord)
      rows.foreach { case (k, c, e) => s.add(k, c, e) }
      s
    }
    mk(a).mergeWith(mk(b)).sorted.toSeq
      .map(e => (e.key.asInstanceOf[String], e.count, e.err))
  }

  def topKExact(df: DataFrame, keyCol: Column, n: Int,
      capacity: Int): DataFrame = {
    val hh = Dedup.persistTracked(heavyHitters(df, keyCol, capacity))
    // certification floor: any UNMONITORED key's true count is at most
    // the summary's min monitored count (exactly the SpaceSaving
    // eviction floor; 0 while the summary never filled). Emitting only
    // exact counts ABOVE it guarantees no unmonitored key could truly
    // outrank an emitted one — an under-sized capacity yields fewer
    // than n rows (a loud row-count miss), never a silently wrong
    // top-k.
    val floor = hh.agg(coalesce(
      when(count(lit(1)) >= capacity, min(col("cnt"))), lit(0L)).as("_floor"))
    df.select(keyCol.as("key"))
      .join(broadcast(hh.select(col("key"))), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(floor))
      .filter(col("cnt") > col("_floor"))
      .drop("_floor")
      .orderBy(col("cnt").desc, col("key"))
      .limit(n)
  }
}
