package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

/** Event-stream analytics over `events`: grouped stats, tumbling
  * windows, sessionization, JSON-props extraction. The same expressions
  * run under Structured Streaming (graft.streaming.StreamingPipeline).
  */
object EventQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  /** Grouped value stats by type (A3-style counts + numeric profile). */
  def byType(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg("value"), 2).as("avg_value"),
        round(min("value"), 2).as("min_value"),
        round(max("value"), 2).as("max_value"))
      .transform(QueryUtil.ordered("event_type"))

  val byTypeOracle: String =
    """SELECT event_type, count(*) AS n, round(avg(value), 2) AS avg_value,
      |  round(min(value), 2) AS min_value, round(max(value), 2) AS max_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Tumbling hourly counts by type (event-time windowing, batch form).
    */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.tumbling(events(spark, dir), "hour", "event_type")
      .transform(QueryUtil.ordered("window_start", "event_type"))

  val hourlyOracle: String =
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00') AS window_start,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Hourly robust value quantiles per event type (p50/p95) from a
    * 2 dp value-grain histogram — the latency-dashboard shape, with NO
    * percentile() value buffering on a hot (type, hour) key: one scan
    * builds the histogram, quantiles interpolate on grain-bounded
    * windows ([[graft.ops.Robust.quantileFromHistogram]], composite
    * key form). */
  def hourlyQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val hist = graft.ops.Dedup.checkpointTracked(events(spark, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
          .as("hour"),
        round(col("value"), 2).as("v"))
      .agg(count(lit(1)).as("c")))
    val keys = Seq("event_type", "hour")
    graft.ops.Robust.quantileFromHistogram(hist, 0.5, keys, "p50")
      .join(graft.ops.Robust.quantileFromHistogram(hist, 0.95, keys, "p95"),
        keys)
      .select(col("event_type"), col("hour"),
        round(col("p50"), 4).as("p50"), round(col("p95"), 4).as("p95"))
      .transform(QueryUtil.ordered("event_type", "hour"))
  }

  val hourlyQuantilesOracle: String =
    s"""WITH h AS MATERIALIZED (SELECT event_type,
       |    strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
       |      '%Y-%m-%d %H:00') AS hour,
       |    round(value, 2) AS v, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2, 3),
       |${QueryUtil.quantileCteSql("h", "event_type, hour", "0.5",
          "q50", "p50")},
       |${QueryUtil.quantileCteSql("h", "event_type, hour", "0.95",
          "q95", "p95")}
       |SELECT q50.event_type, q50.hour, round(q50.p50, 4) AS p50,
       |  round(q95.p95, 4) AS p95
       |FROM q50 JOIN q95 USING (event_type, hour)
       |ORDER BY event_type, hour""".stripMargin

  /** Hour-level anomaly detection, two robust levels deep: hourly p50
    * per event type (level 1, value-grain histogram), then median/MAD
    * over each type's hourly medians (level 2) — hours whose p50 sits
    * more than 3 MAD from the type's norm are flagged. The
    * monitoring-alert shape ("this hour's latency median is off"),
    * composed entirely from the grain-bounded histogram cores — no
    * percentile buffering at either level. */
  def anomalousHours(spark: SparkSession, dir: String): DataFrame = {
    val hist = graft.ops.Dedup.checkpointTracked(events(spark, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
          .as("hour"),
        round(col("value"), 2).as("v"))
      .agg(count(lit(1)).as("c")))
    val p50 = graft.ops.Robust.quantileFromHistogram(hist, 0.5,
      Seq("event_type", "hour"), "p50")
    graft.ops.Robust.madStatsFromHistogram(
        p50.groupBy(col("event_type"), col("p50").as("v"))
          .agg(count(lit(1)).as("c")),
        "event_type")
      .select(col("event_type"), col("med"), col("mad"),
        col("n_docs").as("n_hours"),
        col("n_outliers").as("n_anomalous_hours"))
      .transform(QueryUtil.ordered("event_type"))
  }

  val anomalousHoursOracle: String =
    s"""WITH h AS MATERIALIZED (SELECT event_type,
       |    strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
       |      '%Y-%m-%d %H:00') AS hour,
       |    round(value, 2) AS v, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2, 3),
       |${QueryUtil.quantileCteSql("h", "event_type, hour", "0.5",
          "q50", "p50")},
       |h2 AS MATERIALIZED (SELECT event_type, p50 AS v,
       |    CAST(count(*) AS BIGINT) AS c FROM q50 GROUP BY 1, 2),
       |${QueryUtil.quantileCteSql("h2", "event_type", "0.5",
          "medq", "med")},
       |d0 AS (SELECT h2.event_type, abs(h2.v - m.med) AS v, h2.c
       |       FROM h2 JOIN medq m USING (event_type)),
       |d2 AS MATERIALIZED (SELECT event_type, v, CAST(sum(c) AS BIGINT) AS c
       |  FROM d0 GROUP BY 1, 2),
       |${QueryUtil.quantileCteSql("d2", "event_type", "0.5",
          "madq", "mad")}
       |SELECT h2.event_type, round(max(m.med), 4) AS med,
       |  round(max(x.mad), 4) AS mad,
       |  CAST(sum(h2.c) AS BIGINT) AS n_hours,
       |  CAST(sum(CASE WHEN abs(h2.v - m.med) > 3 * x.mad THEN h2.c ELSE 0 END)
       |    AS BIGINT) AS n_anomalous_hours
       |FROM h2 JOIN medq m USING (event_type) JOIN madq x USING (event_type)
       |GROUP BY h2.event_type ORDER BY h2.event_type""".stripMargin

  /** Linear multi-touch attribution: every purchase splits one unit of
    * credit equally across the user's non-purchase events in the hour
    * before it. The window join is the bucketized
    * [[graft.ops.TimeSeries.rangeJoin]] (equi on (user, 10-min
    * bucket) — never an inequality nested loop), and per-purchase
    * credit shares ride as (c · 10^12) DIV n INTEGERS so the
    * cross-purchase summation order cannot move a bit — the float
    * 1/n sum would be partition-order noise. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("w_start"),
        col("ts").as("w_end"))
    val pts = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val tou = graft.ops.Dedup.checkpointTracked(
      TimeSeries.rangeJoin(pts, pur, "user_id", "ts", "w_start", "w_end",
          grainUs = 600L * 1000000L)
        .select("pid", "event_type"))
    val pn = tou.groupBy("pid").agg(count(lit(1)).as("n"))
    val pt = tou.groupBy("pid", "event_type").agg(count(lit(1)).as("c"))
    pt.join(pn, "pid")
      .groupBy("event_type")
      .agg(sum("c").as("touches"),
        round(sum(expr("(c * 1000000000000) DIV n")).cast("double") / 1e12, 4)
          .as("credit"))
      .transform(QueryUtil.ordered("event_type"))
  }

  val attributionOracle: String =
    """WITH pur AS (SELECT event_id AS pid, user_id,
      |               CAST(ts AS TIMESTAMP) AS pe
      |             FROM events WHERE event_type = 'purchase'),
      |ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_type
      |       FROM events WHERE event_type <> 'purchase'),
      |tou AS (SELECT pur.pid, ev.event_type
      |        FROM ev JOIN pur ON ev.user_id = pur.user_id
      |          AND ev.ets >= pur.pe - INTERVAL 1 HOUR AND ev.ets < pur.pe),
      |pn AS (SELECT pid, CAST(count(*) AS BIGINT) AS n FROM tou GROUP BY pid),
      |pt AS (SELECT pid, event_type, CAST(count(*) AS BIGINT) AS c
      |       FROM tou GROUP BY 1, 2)
      |SELECT pt.event_type, CAST(sum(pt.c) AS BIGINT) AS touches,
      |  round(sum((pt.c * 1000000000000) // pn.n) / 1000000000000.0, 4)
      |    AS credit
      |FROM pt JOIN pn USING (pid) GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gap-based sessionization (30 min), per-user session counts. */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.sessionStats(events(spark, dir), gapSeconds = 1800)
      .transform(QueryUtil.ordered("user_id"))

  val sessionsOracle: String =
    """WITH x AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
      |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
      |  FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  count(*) FILTER (WHERE prev IS NULL OR us - prev > 1800000000) AS n_sessions
      |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Session transcripts ([[TimeSeries.conversations]]): each 30-min
    * gap-session flattened into one `role: content` training document.
    * The assembled bytes are pinned by md5 (total event-time order),
    * so the oracle checks the exact text without hauling it. */
  def conversationsQ(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.conversations(events(spark, dir), gapSeconds = 1800)
      .select(col("user_id"), col("session_idx"), col("n_turns"),
        graft.ops.TextAnalysis.tokenCount(col("doc")).as("n_tokens"),
        md5(col("doc").cast("binary")).as("fp"))
      .transform(QueryUtil.ordered("user_id", "session_idx"))

  val conversationsOracle: String =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    event_type || ': ' || coalesce(props, '') AS line FROM events),
      |x AS (SELECT *, epoch_us(ts) AS us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM e),
      |s AS (SELECT *, sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
      |      THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM x),
      |d AS (SELECT user_id, session_idx, count(*) AS n_turns,
      |    string_agg(line, chr(10) ORDER BY ts, event_id) AS doc
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, n_turns,
      |  CAST(len(string_split(doc, ' ')) AS INTEGER) AS n_tokens,
      |  md5(doc) AS fp
      |FROM d ORDER BY user_id, session_idx""".stripMargin

  /** JSON-props field extraction + aggregation (regex form — portable,
    * and at scale a one-pass scan; `props` stays unparsed otherwise). */
  def propsStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k",
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), round(avg("k"), 2).as("avg_k"),
        max("k").as("max_k"))
      .transform(QueryUtil.ordered("event_type"))

  val propsStatsOracle: String =
    """SELECT event_type,
      |  CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)), 2) AS avg_k,
      |  max(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact percentiles by group (interpolating median/p90 — verified
    * bit-compatible with DuckDB's quantile_cont; rounded for margin). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .transform(QueryUtil.ordered("event_type"))

  val percentilesOracle: String =
    """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  round(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Skew-spread join: events ⋈ per-type averages on `event_type` — a
    * 5-value key, so a plain shuffle join lands ~20% of the table in
    * ONE task. [[graft.ops.Skew.saltedJoin]] shuffles on
    * (event_type, _salt) instead, spreading each hot key over 8 tasks.
    * Salting is semantics-preserving, so the oracle is the plain join.
    * The avg threshold is rounded to 2dp on both sides so the
    * engine-dependent double summation order can't flip a comparison.
    */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val stats = ev.groupBy("event_type")
      .agg(round(avg("value"), 2).as("avg_value"))
    graft.ops.Skew.saltedJoin(ev, stats, "event_type", saltFactor = 8,
        disableBroadcast = true)
      .filter(col("value") > col("avg_value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_above"))
      .transform(QueryUtil.ordered("event_type"))
  }

  val skewJoinOracle: String =
    """WITH s AS (SELECT event_type, round(avg(value), 2) AS avg_value
      |           FROM events GROUP BY event_type)
      |SELECT e.event_type AS event_type, count(*) AS n_above
      |FROM events e JOIN s ON e.event_type = s.event_type
      |WHERE e.value > s.avg_value
      |GROUP BY e.event_type ORDER BY 1""".stripMargin

  /** As-of join: each non-purchase event gains the latest preceding
    * purchase (same user, purchase.ts <= event.ts) — the classic
    * attribution query. Purchases are pre-aggregated to unique
    * (user, ts) — [[graft.ops.TimeSeries.asofJoin]]'s contract — with
    * `max(value)` (deterministic, no summation-order sensitivity).
    * Times surface as epoch-µs deltas (portable, no timestamp
    * rendering drift). Oracle: DuckDB's native ASOF LEFT JOIN. */
  def asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("last_purchase_value"))
    val rest = ev.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts")
    TimeSeries.asofJoin(rest, purchases, "user_id", "ts",
        payload = Seq("last_purchase_value"))
      .select(col("event_id"), col("user_id"),
        (TimeSeries.epochUs(col("ts")) - TimeSeries.epochUs(col("asof_ts")))
          .as("us_since_purchase"),
        col("last_purchase_value"))
      .transform(QueryUtil.ordered("event_id"))
  }

  val asofOracle: String =
    """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
      |             max(value) AS pval
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets
      |      FROM events WHERE event_type <> 'purchase')
      |SELECT e.event_id, e.user_id,
      |  epoch_us(e.ets) - epoch_us(p.pts) AS us_since_purchase,
      |  p.pval AS last_purchase_value
      |FROM e ASOF LEFT JOIN p
      |  ON e.user_id = p.user_id AND e.ets >= p.pts
      |ORDER BY e.event_id""".stripMargin

  /** Forward as-of: for every non-purchase event, time UNTIL the
    * user's next purchase (at or after it) — the conversion-latency
    * mirror of ev_asof. Events with no later purchase keep nulls
    * (left semantics); the oracle is DuckDB's native forward ASOF
    * LEFT JOIN (`ets <= pts`). */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("next_purchase_value"))
    val rest = ev.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts")
    TimeSeries.asofJoinForward(rest, purchases, "user_id", "ts",
        payload = Seq("next_purchase_value"))
      .select(col("event_id"), col("user_id"),
        (TimeSeries.epochUs(col("asof_ts")) - TimeSeries.epochUs(col("ts")))
          .as("us_until_purchase"),
        col("next_purchase_value"))
      .transform(QueryUtil.ordered("event_id"))
  }

  val asofForwardOracle: String =
    """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
      |             max(value) AS pval
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets
      |      FROM events WHERE event_type <> 'purchase')
      |SELECT e.event_id, e.user_id,
      |  epoch_us(p.pts) - epoch_us(e.ets) AS us_until_purchase,
      |  p.pval AS next_purchase_value
      |FROM e ASOF LEFT JOIN p
      |  ON e.user_id = p.user_id AND e.ets <= p.pts
      |ORDER BY e.event_id""".stripMargin

  /** Range join: for every error event, how many events the same user
    * produced inside the 10-minute window starting at it (incident
    * blast radius). [[graft.ops.TimeSeries.rangeJoin]] bucketizes the
    * windows to a 10-minute grain, so the plan is an equi-join on
    * (user, bucket) with the exact range as a post-filter — never the
    * nested-loop a raw inequality join plans. Count is always >= 1
    * (the incident contains itself), so a plain inner join suffices. */
  def rangeJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("user_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val points = ev.select("user_id", "ts")
    TimeSeries.rangeJoin(points, incidents, "user_id",
        "ts", "w_start", "w_end", grainUs = 600L * 1000000L)
      .groupBy("incident_id")
      .agg(count(lit(1)).as("n_in_window"))
      .transform(QueryUtil.ordered("incident_id"))
  }

  val rangeJoinOracle: String =
    """WITH i AS (SELECT event_id AS incident_id, user_id,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS s
      |           FROM events WHERE event_type = 'error'),
      |e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events)
      |SELECT i.incident_id, count(*) AS n_in_window
      |FROM i JOIN e ON i.user_id = e.user_id
      |  AND e.t >= i.s AND e.t < i.s + 600000000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sketch accuracy gate: HLL++ distinct counts and t-digest-style
    * approximate percentiles checked against their exact twins, per
    * event_type. At 100 TB the exact forms are the bottleneck —
    * `countDistinct` shuffles every (key, user) pair, exact
    * `percentile` buffers whole groups — while the sketches are
    * fixed-size, map-side-merged state; this query is the
    * verification harness that keeps the cheap path honest. Same
    * pattern as the ANN recall floors: the engine computes BOTH and
    * emits per-key booleans, and the oracle asserts `true`. Bounds
    * match what each sketch actually guarantees: 5% relative on
    * distincts at rsd = 2% (2.5σ); for percentiles the gate is on the
    * RANK of the returned value — `approx_percentile` promises a real
    * sample whose rank is within n/accuracy of the target, so the
    * check counts values <= the sketch's answer and allows
    * 2 + 2n/accuracy ranks of slack (discreteness + 2× the ε
    * guarantee). A value-space envelope is NOT sound here: on a
    * 200-row group, ±0.002 in q is under one rank, and interpolated
    * exact percentiles can exclude the (correct) sample answer.
    * Sketches are deterministic (hash-based, commutative merges), so
    * a pass at a given SF is stable, not a lucky draw. */
  def sketchAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val sk = ev.groupBy("event_type").agg(
      approx_count_distinct(col("user_id"), rsd = 0.02).as("ad"),
      countDistinct(col("user_id")).as("ed"),
      expr("approx_percentile(value, array(0.5, 0.9), 10000)").as("ap"))
    ev.join(broadcast(sk), "event_type")
      .groupBy("event_type")
      .agg(first(col("ad")).as("ad"), first(col("ed")).as("ed"),
        count(lit(1)).as("n"),
        sum(when(col("value") <= element_at(col("ap"), 1), 1L)
          .otherwise(0L)).as("r50"),
        sum(when(col("value") <= element_at(col("ap"), 2), 1L)
          .otherwise(0L)).as("r90"))
      .select(col("event_type"),
        (abs(col("ad") - col("ed")).cast("double") / col("ed") <= 0.05)
          .as("distinct_ok"),
        (abs(col("r50") - lit(0.5) * col("n")) <=
          lit(2.0) + col("n") * lit(2e-4)).as("p50_ok"),
        (abs(col("r90") - lit(0.9) * col("n")) <=
          lit(2.0) + col("n") * lit(2e-4)).as("p90_ok"))
      .transform(QueryUtil.ordered("event_type"))
  }

  val sketchAccuracyOracle: String =
    """SELECT event_type, true AS distinct_ok, true AS p50_ok,
      |  true AS p90_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The SAME attribution query through the broadcast binary-search
    * path ([[graft.ops.TimeSeries.asofJoinBroadcast]]) — registered
    * against the IDENTICAL DuckDB ASOF oracle, so the alternative
    * algorithm is cross-engine-verified, not just unit-tested
    * (the dd_clusters / dd_clusters_star precedent). */
  def asofBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("last_purchase_value"))
    val rest = ev.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts")
    TimeSeries.asofJoinBroadcast(rest, purchases, "user_id", "ts",
        payload = Seq("last_purchase_value"))
      .select(col("event_id"), col("user_id"),
        (TimeSeries.epochUs(col("ts")) - TimeSeries.epochUs(col("asof_ts")))
          .as("us_since_purchase"),
        col("last_purchase_value"))
      .transform(QueryUtil.ordered("event_id"))
  }

  /** Conversion funnel view → click → purchase, each step within one
    * day of the previous step's earliest completion. The window is
    * what makes the per-step decay non-vacuous on the sparse uniform
    * fixture (~2 events/type/user/day): measured 150 → 60 → 25 at
    * sf0.01 (15 → 6 → 3 and 1500 → 536 → 217 at sf0.001/0.1) — a
    * loose window converts nearly everyone, a 1-hour one reaches
    * zero. */
  def funnelQ(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.funnel(events(spark, dir),
        steps = Seq("view", "click", "purchase"), withinSeconds = 86400L)
      .transform(QueryUtil.ordered("step_idx"))

  val funnelOracle: String =
    """WITH e AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |            event_type AS ty FROM events),
      |s1 AS (SELECT u, min(us) AS t FROM e WHERE ty = 'view' GROUP BY 1),
      |s2 AS (SELECT e.u, min(e.us) AS t FROM e JOIN s1 USING (u)
      |       WHERE e.ty = 'click' AND e.us > s1.t
      |         AND e.us <= s1.t + 86400000000 GROUP BY 1),
      |s3 AS (SELECT e.u, min(e.us) AS t FROM e JOIN s2 USING (u)
      |       WHERE e.ty = 'purchase' AND e.us > s2.t
      |         AND e.us <= s2.t + 86400000000 GROUP BY 1)
      |SELECT step_idx, step, n_users FROM (
      |  SELECT 1 AS step_idx, 'view' AS step,
      |    (SELECT count(*) FROM s1) AS n_users
      |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
      |ORDER BY step_idx""".stripMargin

  /** Median seconds between funnel steps for converting users — the
    * stall chart next to ev_funnel's leak chart; see
    * [[graft.ops.TimeSeries.funnelStepLatency]]. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.funnelStepLatency(events(spark, dir),
        steps = Seq("view", "click", "purchase"), withinSeconds = 86400L)
      .transform(QueryUtil.ordered("step_idx"))

  val funnelLatencyOracle: String =
    s"""WITH e AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |            event_type AS ty FROM events),
      |s1 AS (SELECT u, min(us) AS t FROM e WHERE ty = 'view' GROUP BY 1),
      |s2 AS (SELECT e.u, min(e.us) AS t FROM e JOIN s1 USING (u)
      |       WHERE e.ty = 'click' AND e.us > s1.t
      |         AND e.us <= s1.t + 86400000000 GROUP BY 1),
      |s3 AS (SELECT e.u, min(e.us) AS t FROM e JOIN s2 USING (u)
      |       WHERE e.ty = 'purchase' AND e.us > s2.t
      |         AND e.us <= s2.t + 86400000000 GROUP BY 1),
      |lat AS (SELECT 2 AS step_idx, 'view->click' AS transition,
      |          CAST((s2.t - s1.t) // 1000000 AS DOUBLE) AS v
      |        FROM s2 JOIN s1 USING (u)
      |        UNION ALL
      |        SELECT 3, 'click->purchase',
      |          CAST((s3.t - s2.t) // 1000000 AS DOUBLE)
      |        FROM s3 JOIN s2 USING (u)),
      |h AS MATERIALIZED (SELECT step_idx, transition, v,
      |    CAST(count(*) AS BIGINT) AS c FROM lat GROUP BY 1, 2, 3),
      |${QueryUtil.quantileCteSql("h", "step_idx, transition", "0.5",
         "q50", "p50")}
      |SELECT q.step_idx, q.transition, n.n_users, round(q.p50, 4) AS p50_sec
      |FROM q50 q JOIN (SELECT step_idx, transition,
      |    CAST(sum(c) AS BIGINT) AS n_users FROM h GROUP BY 1, 2) n
      |  USING (step_idx, transition)
      |ORDER BY q.step_idx""".stripMargin

  /** Top 3-step user paths ("view>click>purchase") — the path-mining
    * view next to ev_transitions' pairwise matrix. Lead windows
    * partition by USER (bounded by one user's activity, the
    * ev_transitions rule, never the hot type key); the global top-10
    * plans as TakeOrderedAndProject. */
  def paths3(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_t2", lead("event_type", 1).over(w))
      .withColumn("_t3", lead("event_type", 2).over(w))
      .where(col("_t2").isNotNull && col("_t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("_t2"), col("_t3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path")).limit(10)
  }

  val paths3Oracle: String =
    """WITH s AS (SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS t2,
      |    lead(event_type, 2) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY CAST(ts AS TIMESTAMP), event_id))
      |SELECT event_type || '>' || t2 || '>' || t3 AS path,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** A/B lift analysis: users split deterministically by the md5 unit
    * hash (reproducible across runs/engines — no RNG assignment drift),
    * per-arm user counts, converters (≥ 1 purchase) and conversion
    * rate. Two distinct-aggregations plus an equi-join on the user
    * key; rates round at the boundary. */
  def abLift(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val users = ev.select("user_id").distinct()
      .withColumn("grp",
        when(graft.ops.Sampling.unitHash(col("user_id")) < 0.5, "A")
          .otherwise("B"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct().withColumn("converted", lit(1L))
    users.join(conv, Seq("user_id"), "left")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("converted"), lit(0L))).as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") /
          col("n_users").cast("double"), 4))
      .transform(QueryUtil.ordered("grp"))
  }

  val abLiftOracle: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |g AS (SELECT user_id,
      |        CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT
      |               / 4294967296.0 < 0.5 THEN 'A' ELSE 'B' END AS grp
      |      FROM u),
      |c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT g.grp, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(count(c.user_id) AS BIGINT) AS n_converted,
      |  round(count(c.user_id) * 1.0 / count(*), 4) AS conv_rate
      |FROM g LEFT JOIN c ON g.user_id = c.user_id
      |GROUP BY g.grp ORDER BY g.grp""".stripMargin

  /** Kaplan–Meier time-to-first-purchase survival curve (minute
    * grain, right-censored at a non-converter's last event). See
    * [[graft.ops.TimeSeries.kaplanMeier]]. */
  def survival(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.kaplanMeier(events(spark, dir), "purchase")
      .transform(QueryUtil.ordered("t_min"))

  val survivalOracle: String =
    """WITH e AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |            event_type AS ty FROM events),
      |pu AS (SELECT u, min(us) AS f, max(us) AS l,
      |         min(CASE WHEN ty = 'purchase' THEN us END) AS ev
      |       FROM e GROUP BY u),
      |dur AS (SELECT (coalesce(ev, l) - f) // 60000000 AS t_min,
      |          CASE WHEN ev IS NOT NULL THEN 1 ELSE 0 END AS ef
      |        FROM pu),
      |h AS MATERIALIZED (SELECT t_min, CAST(sum(ef) AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS n FROM dur GROUP BY t_min),
      |r AS (SELECT t_min, d, n,
      |    CAST((SELECT sum(n) FROM h) -
      |      coalesce(sum(n) OVER (ORDER BY t_min
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS n_risk
      |  FROM h),
      |s AS (SELECT t_min, d, n_risk,
      |    CASE WHEN d > 0 AND d < n_risk
      |         THEN ln(1.0 - d * 1.0 / n_risk) ELSE 0.0 END AS lt,
      |    CASE WHEN d > 0 AND d = n_risk THEN 1 ELSE 0 END AS z
      |  FROM r),
      |c AS (SELECT t_min, d, n_risk,
      |    sum(lt) OVER (ORDER BY t_min ROWS UNBOUNDED PRECEDING) AS cl,
      |    max(z) OVER (ORDER BY t_min ROWS UNBOUNDED PRECEDING) AS cz
      |  FROM s)
      |SELECT t_min, n_risk, d AS n_events,
      |  round(CASE WHEN cz = 1 THEN 0.0 ELSE exp(cl) END, 4) AS survival
      |FROM c WHERE d > 0 ORDER BY t_min""".stripMargin

  /** Weekly cohort retention matrix over the events table. */
  def retentionQ(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.retention(events(spark, dir))
      .transform(QueryUtil.ordered("cohort_week", "week_offset"))

  val retentionOracle: String =
    """WITH w AS (SELECT DISTINCT user_id AS u,
      |             date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
      |c AS (SELECT u, min(wk) AS cw FROM w GROUP BY 1)
      |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
      |  CAST(date_diff('day', c.cw, w.wk) // 7 AS BIGINT) AS week_offset,
      |  count(DISTINCT w.u) AS n_users
      |FROM w JOIN c USING (u)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Event-type transition matrix (path analysis) over the events
    * table — which event types follow which, per user, with
    * per-from-type probabilities. */
  def transitionsQ(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.transitions(events(spark, dir))
      .transform(QueryUtil.ordered("from_type", "to_type"))

  /** Ties at equal micros order by event_id on BOTH sides (the cast to
    * TIMESTAMP truncates DuckDB's nanos to the engine's micros grain —
    * ordering by raw nanos could break ties the engine can't see). */
  val transitionsOracle: String =
    """WITH s AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev
      |  FROM events),
      |c AS (SELECT prev AS from_type, event_type AS to_type, count(*) AS n
      |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
      |  round(c.n / t.tot, 4) AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY 1, 2""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "ev_funnel" -> ((funnelQ _, Some(funnelOracle))),
    "ev_transitions" -> ((transitionsQ _, Some(transitionsOracle))),
    "ev_retention" -> ((retentionQ _, Some(retentionOracle))),
    "ev_asof" -> ((asof _, Some(asofOracle))),
    "ev_asof_forward" -> ((asofForward _, Some(asofForwardOracle))),
    "ev_asof_bc" -> ((asofBroadcast _, Some(asofOracle))),
    "ev_range_join" -> ((rangeJoinQ _, Some(rangeJoinOracle))),
    "ev_sketch_accuracy" -> ((sketchAccuracy _, Some(sketchAccuracyOracle))),
    "ev_by_type" -> ((byType _, Some(byTypeOracle))),
    "ev_hourly" -> ((hourly _, Some(hourlyOracle))),
    "ev_sessions" -> ((sessions _, Some(sessionsOracle))),
    "ev_conversations" -> ((conversationsQ _, Some(conversationsOracle))),
    "ev_props_stats" -> ((propsStats _, Some(propsStatsOracle))),
    "ev_percentiles" -> ((percentiles _, Some(percentilesOracle))),
    "ev_hourly_quantiles" -> ((hourlyQuantiles _, Some(hourlyQuantilesOracle))),
    "ev_anomalous_hours" -> ((anomalousHours _, Some(anomalousHoursOracle))),
    "ev_attribution" -> ((attribution _, Some(attributionOracle))),
    "ev_step_latency" -> ((funnelLatency _, Some(funnelLatencyOracle))),
    "ev_paths3" -> ((paths3 _, Some(paths3Oracle))),
    "ev_ab_lift" -> ((abLift _, Some(abLiftOracle))),
    "ev_survival" -> ((survival _, Some(survivalOracle))),
    "ev_skew_join" -> ((skewJoin _, Some(skewJoinOracle))))
}
