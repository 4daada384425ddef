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

  /** Session transcripts — the chat-to-training-doc assembly step of
    * an interaction-data pipeline: each gap-session becomes ONE
    * document, its events rendered `role: content` and joined in
    * event-time order with newlines (the flattening a conversation
    * corpus runs before packing/dedup/quality gates). One shuffle on
    * the user key for [[sessionize]]'s window, then a per-session
    * collect_list — bounded by the session, never the user's full
    * history in one buffer beyond what sessionize already requires.
    * Ordering inside a session is total ((ts, idCol) with a unique
    * id), so the assembled bytes are deterministic and an oracle can
    * hash them. */
  def conversations(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", roleCol: String = "event_type",
      contentCol: String = "props"): DataFrame = {
    val line = concat(col(roleCol), lit(": "),
      coalesce(col(contentCol).cast("string"), lit("")))
    sessionize(events, gapSeconds, userCol, tsCol, idCol)
      .withColumn("_line", line)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_turns"),
        array_join(
          transform(
            sort_array(collect_list(
              struct(col(tsCol), col(idCol), col("_line")))),
            x => x.getField("_line")),
          "\n").as("doc"))
  }

  /** Broadcast as-of join — the small-dimension twin of [[asofJoin]]:
    * when the right side is dimension-sized (price history, config
    * rollouts, slowly-changing attributes), collapsing it to ONE row
    * per key holding the ascending (ts, payload) history and
    * broadcasting lets every left row resolve its as-of match with a
    * codegen'd O(log h) binary search
    * ([[graft.etl.expressions.SortedAsofIndex]]) — ZERO shuffle of
    * the big side (vs [[asofJoin]]'s one key shuffle of both sides,
    * which remains the right tool when both sides are big). Because
    * the probe is stateless against a static frame, the SAME call
    * works with a STREAMING left side (stream-static join), which the
    * union+window merge formulation cannot.
    *
    * Same contract as [[asofJoin]]: inclusive backward match, right
    * unique per (key, ts), nulls when no match; `asofTsName` is
    * µs-truncated (the search runs on epoch-µs). */
  def asofJoinBroadcast(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payload: Seq[String],
      asofTsName: String = "asof_ts"): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val hist = right
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        epochUs(col(tsCol)).as("_t"),
        struct(payload.map(col): _*).as("_p")))).as("_h"))
      .select(col(keyCol),
        transform(col("_h"), x => x.getField("_t")).as("_hts"),
        transform(col("_h"), x => x.getField("_p")).as("_hp"))
    val idx = Bridge.column(graft.etl.expressions.SortedAsofIndex(
      Bridge.expression(epochUs(col(tsCol))),
      Bridge.expression(col("_hts"))))
    val leftCols = left.columns.map(col)
    left.join(broadcast(hist), Seq(keyCol), "left")
      .withColumn("_i", idx)
      .select(leftCols ++
        (timestamp_micros(element_at(col("_hts"), col("_i") + 1))
          .as(asofTsName) +:
          payload.map(p =>
            element_at(col("_hp"), col("_i") + 1).getField(p).as(p))): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair with
    * the same key and `start <= point.ts < end` (half-open). Spark
    * plans a raw inequality predicate as BroadcastNestedLoopJoin —
    * quadratic per key, dead at scale. Bucketizing makes it an
    * EQUI-join: each interval explodes into the `grainUs`-sized time
    * buckets it overlaps, each point lives in exactly one bucket, and
    * the join runs on (key, bucket) with the exact range predicate as
    * a post-filter. Each qualifying pair is produced exactly once (a
    * point has ONE bucket — no dedup pass). Pick `grainUs` near the
    * typical interval length: fanout per interval is
    * ceil(len/grain)+1 rows, and a too-fine grain multiplies the
    * shuffled interval side. Cost: shuffle of |P| + fanout·|I| on
    * high-cardinality (key, bucket) keys — 100 TB-shaped; skewed
    * buckets are ordinary equi-join skew (AQE handles).
    *
    * Both ts columns must be timestamps; intervals with end <= start
    * are dropped (match nothing under half-open semantics). Non-key
    * column names must be disjoint across the two frames.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
      pointTsCol: String, startCol: String, endCol: String,
      grainUs: Long): DataFrame = {
    require(grainUs > 0, "grainUs must be positive")
    val p = points
      .withColumn("_pus", epochUs(col(pointTsCol)))
      .withColumn("_b", floor(col("_pus") / grainUs))
    val i = intervals
      .withColumn("_sus", epochUs(col(startCol)))
      .withColumn("_eus", epochUs(col(endCol)))
      .filter(col("_eus") > col("_sus"))
      .withColumn("_b",
        explode(sequence(floor(col("_sus") / grainUs),
          floor((col("_eus") - 1) / grainUs))))
      .withColumnRenamed(keyCol, "_ikey")
    p.join(i,
        col("_ikey") === col(keyCol) && i("_b") === p("_b") &&
          col("_pus") >= col("_sus") && col("_pus") < col("_eus"))
      .drop("_pus", "_sus", "_eus", "_ikey").drop(p("_b")).drop(i("_b"))
  }

  /** Backward as-of join: each left row gains the `payload` columns of
    * the LATEST right row with the same key and right.ts <= left.ts
    * (inclusive — DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics),
    * or nulls if no such row (LEFT join). Spark has no asof operator;
    * the naive encoding (inequality join + row_number) plans a
    * per-key-pair range join that degenerates toward |L|×|R| on hot
    * keys. This is the merge formulation instead: union both sides
    * with a marker, ONE shuffle on the key, one ordered window pass
    * carrying the last-seen right payload forward — the same linear
    * merge DuckDB plans natively, and the shape that survives 10^9
    * rows per side (cost = sort of |L|+|R| within each key).
    *
    * Contract: `right` must be unique per (key, ts) — at equal sort
    * position the carried row would otherwise be partition-order
    * dependent; pre-aggregate (see `EventQueries.asof`). Payload
    * values ride in a struct, so a right row whose payload column is
    * legitimately NULL still overwrites an older match (the struct
    * itself is never null on right rows).
    *
    * Both frames must share `keyCol`/`tsCol` names; every other left
    * column passes through; the matched right timestamp surfaces as
    * `asofTsName`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String],
      asofTsName: String = "asof_ts"): DataFrame = {
    val leftOthers = left.columns.filterNot(c => c == keyCol || c == tsCol)
    require(!(leftOthers :+ tsCol).exists(c => payload.contains(c) || c == asofTsName),
      s"payload/asof column names collide with left columns")
    val rSel = right.select(col(keyCol), col(tsCol), lit(0).as("_side"),
      struct(col(tsCol).as(asofTsName) +: payload.map(col): _*).as("_p"))
    val pType = rSel.schema("_p").dataType
    val lSel = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_side"),
        lit(null).cast(pType).as("_p")) ++ leftOthers.map(col): _*)
    val rAligned = rSel.select(
      Seq(col(keyCol), col(tsCol), col("_side"), col("_p")) ++
        leftOthers.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right rows (_side = 0) sort BEFORE left rows at an equal ts, so a
    // same-instant right row is visible to the left row => inclusive.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSel.unionByName(rAligned)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((keyCol +: tsCol +: leftOthers).map(col) ++
        (asofTsName +: payload).map(f => col("_m").getField(f).as(f)): _*)
  }

  /** Forward (next-event) as-of join: for each left row, the EARLIEST
    * right row at or after its timestamp — "time until the next
    * purchase/deploy/error", the mirror of [[asofJoin]]'s "latest at
    * or before". Same join-free merge formulation: one union, one key
    * shuffle, a running `first(ignoreNulls)` over the
    * [currentRow, ∞) frame. Left rows (_side = 0) sort before right
    * rows at an equal timestamp and the frame opens at the current
    * row, so a same-instant right row is visible ⇒ inclusive. Left
    * rows with no following right row keep a null payload (left-join
    * semantics).
    *
    * Contract (same as [[asofJoin]]): `right` must be unique per
    * (key, ts) — at equal sort keys `first(ignoreNulls)` picks a
    * partition-order-dependent row, so duplicate right rows at one
    * (key, ts) make the carried payload NONDETERMINISTIC. Dedupe (or
    * pre-aggregate, as ev_asof_forward does) before calling. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String],
      asofTsName: String = "asof_ts"): DataFrame = {
    val leftOthers = left.columns.filterNot(c => c == keyCol || c == tsCol)
    require(!(leftOthers :+ tsCol).exists(c => payload.contains(c) || c == asofTsName),
      s"payload/asof column names collide with left columns")
    val rSel = right.select(col(keyCol), col(tsCol), lit(1).as("_side"),
      struct(col(tsCol).as(asofTsName) +: payload.map(col): _*).as("_p"))
    val pType = rSel.schema("_p").dataType
    val lSel = left.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side"),
        lit(null).cast(pType).as("_p")) ++ leftOthers.map(col): _*)
    val rAligned = rSel.select(
      Seq(col(keyCol), col(tsCol), col("_side"), col("_p")) ++
        leftOthers.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // REVERSED running frame (r18): the direct form —
    // first(ignoreNulls) over [currentRow, unboundedFollowing) under
    // (ts ASC, side ASC) — is a SHRINKING frame, which Spark
    // re-evaluates from the frame start for every row: O(n²) per key
    // partition, a real hazard once one key holds millions of events.
    // Sorting DESCENDING and taking the RUNNING last(ignoreNulls)
    // visits the same rows in reverse, so "last non-null at or above
    // me in descending order" ≡ "first non-null at or below me in
    // ascending order" — row-identical output, one O(n) pass.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSel.unionByName(rAligned)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select((keyCol +: tsCol +: leftOthers).map(col) ++
        (asofTsName +: payload).map(f => col("_m").getField(f).as(f)): _*)
  }

  /** Conversion funnel over an ordered step sequence: a user reaches
    * step i+1 by producing a step-(i+1) event STRICTLY AFTER their
    * earliest step-i completion, within `withinSeconds` of it. Output
    * is one row per step — `(step_idx, step, n_users)`.
    *
    * Scale shape: one narrow persisted `(user, us, type)` projection
    * feeds every pass; each step is a map-side-combined `min` per user
    * plus an AQE-splittable equi-join on the user key — `steps.length`
    * cheap passes, no windows, no per-event state. The earliest-
    * completion chain (not any-pair matching) is the standard greedy
    * funnel semantics and needs only one timestamp of state per
    * (user, step). */
  def funnel(events: DataFrame, steps: Seq[String],
      withinSeconds: Long = 86400L,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinSeconds > 0, "withinSeconds must be positive")
    // micros arithmetic rather than interval arithmetic: exactly
    // replayable by the DuckDB oracle (epoch_us), no calendar edge
    val ev = Dedup.persistTracked(events.select(
      col(userCol).as("_u"), unix_micros(col(tsCol)).as("_us"),
      col(typeCol).as("_ty")))
    funnelCounts(funnelReachedPerStep(ev, steps, withinSeconds), steps)
  }

  /** The chain core shared with [[graft.streaming.StreamingFunnel]]
    * (shared so the step semantics cannot fork): one frame per step of
    * the users reaching it, from a normalized `(_u, _us, _ty)` event
    * frame (callers persist it — each step plans two passes over it). */
  private[graft] def funnelReachedPerStep(ev: DataFrame, steps: Seq[String],
      withinSeconds: Long): Seq[DataFrame] =
    steps.zipWithIndex.scanLeft(
        Option.empty[DataFrame]) { case (prev, (step, _)) =>
      val stepEvents = ev.filter(col("_ty") === step)
      Some(prev match {
        case None => stepEvents.groupBy("_u").agg(min(col("_us")).as("_t"))
        case Some(p) => stepEvents
          .join(p.select(col("_u"), col("_t").as("_pt")), Seq("_u"))
          .filter(col("_us") > col("_pt") &&
            col("_us") <= col("_pt") + lit(withinSeconds * 1000000L))
          .groupBy("_u").agg(min(col("_us")).as("_t"))
      })
    }.flatten

  private[graft] def funnelCounts(reachedPerStep: Seq[DataFrame],
      steps: Seq[String]): DataFrame =
    steps.zip(reachedPerStep).zipWithIndex.map {
      case ((step, reached), i) =>
        reached.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(step).as("step"),
            col("n_users"))
    }.reduce(_.unionByName(_))

  /** Median seconds between consecutive funnel step completions, for
    * users who made each transition — the "where does the funnel
    * stall" number next to [[funnel]]'s "where does it leak". Reuses
    * the same per-step reach frames (shared semantics), pairs
    * consecutive steps on the user key, truncates latencies to whole
    * seconds (integral — both engines truncate identically) and takes
    * the median through the grain-bounded histogram core
    * ([[Robust.quantileFromHistogram]]) — no percentile() buffering on
    * a hot transition. Output: (step_idx, transition, n_users,
    * p50_sec). */
  def funnelStepLatency(events: DataFrame, steps: Seq[String],
      withinSeconds: Long = 86400L,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.length >= 2, "need at least two steps for a latency")
    val ev = Dedup.persistTracked(events.select(
      col(userCol).as("_u"), unix_micros(col(tsCol)).as("_us"),
      col(typeCol).as("_ty")))
    val reached = funnelReachedPerStep(ev, steps, withinSeconds)
    val lat = (1 until steps.length).map { i =>
      reached(i).select(col("_u"), col("_t").as("_t2"))
        .join(reached(i - 1).select(col("_u"), col("_t").as("_t1")),
          Seq("_u"))
        .select(lit(i + 1).as("step_idx"),
          lit(s"${steps(i - 1)}->${steps(i)}").as("transition"),
          expr("(_t2 - _t1) DIV 1000000").cast("double").as("v"))
    }.reduce(_.unionByName(_))
    val hist = Dedup.checkpointTracked(
      lat.groupBy("step_idx", "transition", "v").agg(count(lit(1)).as("c")))
    val p50 = Robust.quantileFromHistogram(hist, 0.5,
      Seq("step_idx", "transition"), "p50")
    hist.groupBy("step_idx", "transition").agg(sum("c").as("n_users"))
      .join(p50, Seq("step_idx", "transition"))
      .select(col("step_idx"), col("transition"), col("n_users"),
        round(col("p50"), 4).as("p50_sec"))
  }

  /** Kaplan–Meier survival: time from a user's first event to their
    * first `eventType` occurrence, right-censored at the user's last
    * event when it never happens — the churn/conversion-timing curve.
    * Durations truncate to whole MINUTES (integral, and the distinct-
    * duration domain stays ≤ observation-span minutes, so the ordered
    * window is grain-bounded); the survival product rides as
    * exp(Σ ln(1 − d/n)) over that fixed ascending order, identical
    * IEEE arithmetic in both engines. Emits one row per duration with
    * ≥ 1 event: (t_min, n_risk, n_events, survival 4 dp). */
  def kaplanMeier(events: DataFrame, eventType: String,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val ev = Dedup.persistTracked(events.select(
      col(userCol).as("_u"), unix_micros(col(tsCol)).as("_us"),
      col(typeCol).as("_ty")))
    kaplanMeierFromUserStats(ev.groupBy("_u").agg(
      min(col("_us")).as("_first"),
      max(col("_us")).as("_last"),
      min(when(col("_ty") === eventType, col("_us"))).as("_ev")))
  }

  /** [[kaplanMeier]]'s curve core over per-user observation triples
    * (`_u`, `_first`, `_last`, `_ev`) — shared with the streaming twin,
    * whose carried state is exactly these triples (they merge across
    * batches by min/max/min: associative AND idempotent, the HLL-class
    * replay guarantee). */
  /** Duration-bucket width for the curve's two-level prefix sums: the
    * per-bucket windows see ≤ 4096 rows and the offsets window sees
    * horizon/4096 rows (a decade at minute grain → ~1.3k buckets) —
    * no unpartitioned corpus-sized window anywhere (the r9 audit
    * item; the [[Packing]] prefix-sum shape). */
  private val KmBucketWidth = 4096L

  /** Inclusive two-level prefix sum of `valueCol` over the duration
    * histogram ordered by `t_min` (within-bucket window + broadcast
    * bucket offsets). Window sums are ORDER-DEFINED, so the double
    * `_lt` prefix is deterministic; vs the oracle's flat fold only
    * bucket-boundary reassociation differs (≲ #buckets · ε — invisible
    * at the 4 dp output rounding). */
  private def kmPrefix(hist: DataFrame, valueCol: String,
      out: String): DataFrame = {
    val within = hist.withColumn("_w", sum(col(valueCol)).over(
      Window.partitionBy("_bkt").orderBy("t_min")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val off = hist.groupBy("_bkt").agg(sum(col(valueCol)).as("_bt"))
      .withColumn("_off", coalesce(sum("_bt").over(Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L).cast(hist.schema(valueCol).dataType)))
      .select("_bkt", "_off")
    within.join(broadcast(off), Seq("_bkt"))
      .withColumn(out, col("_off") + col("_w")).drop("_w", "_off")
  }

  private[graft] def kaplanMeierFromUserStats(perUser: DataFrame): DataFrame = {
    val durations = perUser.select(
      expr("(coalesce(_ev, _last) - _first) DIV 60000000").as("t_min"),
      col("_ev").isNotNull.cast("long").as("_e"))
    val h = Dedup.checkpointTracked(durations.groupBy("t_min")
      .agg(sum("_e").as("_d"), count(lit(1)).as("_n"))
      .withColumn("_bkt", floor(col("t_min") / KmBucketWidth)))
    // total at-risk = user count — one agg over the checkpointed
    // histogram, a driver literal (the Graph-N precedent)
    val total = h.agg(sum("_n")).head.getLong(0)
    val risk = Dedup.persistTracked(kmPrefix(h, "_n", "_cn")
      .withColumn("n_risk", lit(total) - (col("_cn") - col("_n")))
      // ln(0) is null in Spark and -inf elsewhere — the d == n_risk
      // row (every remaining user events; only possible at the
      // MAXIMAL duration, so no later row exists to inherit it)
      // contributes 0 here and zeroes its own survival below
      .withColumn("_lt", when(col("_d") > 0 && col("_d") < col("n_risk"),
        log(lit(1.0) - col("_d").cast("double") / col("n_risk").cast("double")))
        .otherwise(lit(0.0))))
    kmPrefix(risk, "_lt", "_cl")
      .withColumn("survival", round(
        when(col("_d") === col("n_risk") && col("_d") > 0, lit(0.0))
          .otherwise(exp(col("_cl"))), 4))
      .filter(col("_d") > 0)
      .select(col("t_min"), col("n_risk"), col("_d").as("n_events"),
        col("survival"))
  }

  /** Per-user deepest step reached — `(_u, max_step)`, one row per
    * user that completed at least step 1. The reach is monotone (step
    * i+1 requires step i), so the single max is the whole funnel state
    * for a user; [[graft.streaming.StreamingFunnel]] upserts it. */
  private[graft] def funnelReach(ev: DataFrame, steps: Seq[String],
      withinSeconds: Long): DataFrame =
    funnelReachedPerStep(ev, steps, withinSeconds).zipWithIndex.map {
      case (reached, i) => reached.select(col("_u"), lit(i + 1).as("_step"))
    }.reduce(_.unionByName(_))
      .groupBy("_u").agg(max(col("_step")).as("max_step"))

  /** Weekly cohort retention: users bucket into the ISO week of their
    * FIRST event; `n_users` counts the cohort's distinct users active
    * in each later week, keyed by `(cohort_week, week_offset)`.
    *
    * Scale shape: distinct `(user, week)` and min-week-per-user are
    * both map-side-combined aggregations; the join back is on the user
    * key; the final rollup groups by (cohort, offset) — no windows,
    * nothing funnels through a single task. */
  def retention(events: DataFrame,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val weeks = Dedup.persistTracked(events
      .select(col(userCol).as("_u"),
        date_trunc("week", col(tsCol)).as("_w"))
      .distinct())
    retentionFromWeeks(weeks)
  }

  /** Event-type transition matrix (first-order Markov path analysis):
    * per-user event sequences ordered by `(ts, orderCol)` yield
    * `(from_type, to_type)` adjacent pairs, rolled up corpus-wide with
    * each from-type's transition probability.
    *
    * Scale shape: the lag window partitions by USER — a bounded domain
    * (one person's events), the audit-approved window class, never the
    * type key (event types are few and colossally hot). The rollup is
    * a map-side-combined groupBy on the pair key, and the probability
    * denominator joins from a types-sized frame (broadcast). */
  def transitions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", orderCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame =
    transitionProbabilities(
      adjacentPairs(events, userCol, tsCol, orderCol, typeCol)
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n")))

  /** Per-user adjacent `(_u, from_type, to_type)` pairs — shared with
    * [[graft.streaming.StreamingTransitions]] so the adjacency
    * semantics (ordering, tiebreak) cannot fork. */
  private[graft] def adjacentPairs(events: DataFrame, userCol: String,
      tsCol: String, orderCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    events.select(col(userCol), col(tsCol), col(orderCol), col(typeCol))
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col(userCol).as("_u"), col("_prev").as("from_type"),
        col(typeCol).as("to_type"))
  }

  /** Probability tail over a `(from_type, to_type, n)` counts frame —
    * shared with the streaming twin. */
  private[graft] def transitionProbabilities(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("_tot"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("_tot"), 4).as("p"))
  }

  /** The rollup core over a distinct `(_u, _w)` frame — shared with
    * [[graft.streaming.StreamingRetention]], whose state IS that frame
    * (shared so the cohort semantics cannot fork). Callers persist the
    * input (it is read twice: cohorts + join-back). */
  private[graft] def retentionFromWeeks(weeks: DataFrame): DataFrame = {
    val cohorts = weeks.groupBy("_u").agg(min(col("_w")).as("_cw"))
    weeks.join(cohorts, Seq("_u"))
      .groupBy(date_format(col("_cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("_w"), col("_cw")) / 7).cast("long").as("week_offset"))
      .agg(count_distinct(col("_u")).as("n_users"))
  }
}
