package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing primitive of a
  * training-data pipeline ("keep 30% of crawl, 100% of wiki, 5% of
  * logs"): per-stratum keep fractions applied by a content-independent
  * hash of the row id, so
  *   - the sample is REPRODUCIBLE across runs, sessions and engines
  *     (no RNG, no `sample()` seed/partitioning sensitivity — Spark's
  *     `sample` draws per-partition and changes with repartitioning);
  *   - it is STABLE under corpus growth: a row's keep/drop never
  *     changes when other rows appear, so incremental re-runs agree
  *     with full runs (the property mixtures need for dataset
  *     versioning);
  *   - the oracle can recompute it exactly (md5, not xxhash64).
  *
  * The hash is the first 8 hex chars of md5(id-as-string) scaled to
  * [0, 1) — a scan-fused column expression, zero shuffle.
  */
object Sampling {

  /** Uniform-in-[0,1) deterministic hash of a column's string form. */
  def unitHash(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** [[unitHash]] shifted into (0, 1] — for formulas that cannot take
    * 0 (e.g. the Efraimidis–Spirakis u^(1/w) key, where u = 0 breaks
    * the power). ONE definition: the weighted-sampling query and its
    * oracle both restate exactly this. */
  def unitHashClosed(id: Column): Column =
    (conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") + 1) / lit(4294967296.0)

  /** Keep rows whose unit-hash falls below their stratum's fraction.
    * Strata absent from `fractions` get `defaultFraction` (0 = drop —
    * explicit allowlist semantics). */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1) &&
      defaultFraction >= 0 && defaultFraction <= 1,
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(unitHash(col(idCol)) < frac)
  }

  /** Temperature-based source mixing: per-source keep fractions from
    * the α-tempered source distribution — w_s ∝ n_s^α, per-source
    * quota = w_s · targetFraction · N, keep fraction = min(1, quota /
    * n_s). α < 1 flattens the mixture (rare sources keep MORE than
    * proportional, dominant sources less) — the standard multilingual
    * / multi-source rebalancing rule; α = 1 degenerates to plain
    * `targetFraction` sampling everywhere.
    *
    * The per-source fractions derive from one tiny counts agg
    * (broadcast back); row keep/drop is the same [[unitHash]] rule as
    * [[stratified]] — reproducible, growth-stable per source, and
    * exactly recomputable by the oracle. One corpus scan + the counts
    * agg; zero shuffle of the data itself. */
  def temperatureMix(df: DataFrame, alpha: Double,
      targetFraction: Double, strataCol: String, idCol: String): DataFrame = {
    require(alpha > 0 && targetFraction > 0 && targetFraction <= 1)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("_ns"))
    val denom = counts.agg(sum(pow(col("_ns"), alpha)).as("_den"),
      sum(col("_ns")).as("_n"))
    val fracs = counts.crossJoin(broadcast(denom))
      .select(col(strataCol),
        least(lit(1.0),
          pow(col("_ns"), alpha) / col("_den") *
            lit(targetFraction) * col("_n") / col("_ns")).as("_keep_frac"))
    df.join(broadcast(fracs), Seq(strataCol))
      .filter(unitHash(col(idCol)) < col("_keep_frac"))
      .drop("_keep_frac")
  }

  /** Per-group quota: keep the `k` rows of each `groupCol` group that
    * rank FIRST by ascending `rankKey` (rank descending by negating the
    * key; make it a total order — e.g. `struct(-quality, id)` — for a
    * deterministic result, exactly as with `ORDER BY`). The
    * crawl-curation "cap documents per registrable domain" rule
    * (C4/RefinedWeb-style host quotas) is this op with
    * `groupCol = domain, rankKey = struct(-quality, doc_id)`.
    *
    * Scale shape: ONE aggregation with [[graft.etl.expressions.BoundedTopK]]
    * — a typed imperative aggregate whose buffer is capped at k in
    * every mode, so map-side partial aggregation reduces a hot group
    * (some domain with 10⁸ docs) to ≤ k rows PER MAP TASK before the
    * shuffle. The window formulation
    * (`row_number().over(partitionBy(group))`) would funnel every row
    * of the hot group through one task; a `collect_list` + slice would
    * hold the whole group in one reduce buffer. Both rejected — see
    * the BoundedTopK scaladoc. Null FIELDS inside `rankKey` sort
    * first (Spark's ascending null ordering) and would win the quota —
    * callers coalesce or pre-filter, same as they would before an
    * `ORDER BY`. */
  def topKPerGroup(df: DataFrame, groupCol: String, rankKey: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val packed = struct(rankKey.as("_r"),
      struct(df.columns.map(col).toIndexedSeq: _*).as("_p"))
    val topk = Bridge.column(
      graft.etl.expressions.BoundedTopK(Bridge.expression(packed), k)
        .toAggregateExpression())
    df.groupBy(col(groupCol)).agg(topk.as("_top"))
      .select(explode(col("_top")).as("_e"))
      .select(col("_e._p.*"))
  }

  /** Exact per-source TOKEN-budget selection — data mixing at token
    * granularity ("at most B tokens from each source, best docs
    * first"), where a doc-count quota ([[topKPerGroup]]) can't hit a
    * token target.
    *
    * A BoundedTopK-style budgeted heap is out: a 10^9-token budget at
    * ~100 tokens/doc means 10^7 rows in one agg buffer. Instead the
    * threshold is found on a QUALITY-GRAIN histogram (the 4 dp quality
    * score → ≤ 10001 grains/source, so the cumulative window is
    * grain-bounded — the Eval.prCurve rule; the score is NOT
    * re-rounded coarser, because round(round(x,4),2) lands 4 dp values
    * on 2 dp half-boundaries where Spark's decimal HALF_UP and a
    * binary-double engine disagree): grains whose cumulative tokens
    * fit the budget admit wholly; the single boundary grain per source
    * admits docs in doc-id order through a two-level id-bucketed
    * prefix sum (the Packing core shape, per group) until the
    * remainder is spent. One corpus scan; everything downstream is
    * histogram- or boundary-slice-sized. Deterministic: integer token
    * counts, id tie-breaks, no RNG. Returns admitted docs
    * (idCol, source, q, n_tokens, admit ∈ {grain, boundary}). */
  def tokenBudgetMix(docs: DataFrame, budget: Long,
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text",
      bucketWidth: Long = 100000L): DataFrame =
    admitFromStats(docs.select(
      col(idCol), col(sourceCol).as("source"),
      TextAnalysis.qualityScore(col(textCol)).as("q"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      budget, idCol, bucketWidth)

  /** [[tokenBudgetMix]]'s admission core over a precomputed narrow
    * stats frame (`idCol`, source, q, n_tokens) — the streaming twin
    * feeds this with its carried per-doc stats, so batch and stream
    * admission semantics cannot fork. */
  def admitFromStats(stats: DataFrame, budget: Long,
      idCol: String = "doc_id", bucketWidth: Long = 100000L): DataFrame =
    admitPrepared(Dedup.checkpointTracked(stats),
      _.withColumn("_budget", lit(budget)), idCol, bucketWidth)

  /** [[admitFromStats]] with a PER-GROUP budget table `(source,
    * _budget)` instead of one uniform budget — the UniMax shape,
    * where each language's budget comes out of the waterfill. The
    * budget table is group-count-sized and broadcasts. */
  def admitWithBudgets(stats: DataFrame, budgets: DataFrame,
      idCol: String = "doc_id", bucketWidth: Long = 100000L): DataFrame =
    admitPrepared(Dedup.checkpointTracked(stats),
      _.join(broadcast(budgets), Seq("source")), idCol, bucketWidth)

  /** [[admitWithBudgets]] over an ALREADY-CHECKPOINTED stats frame —
    * for compositions that need the same frame for their own totals
    * pass (the [[unimaxFromStats]] single-checkpoint rule): the caller
    * owns the checkpoint, this admits against it without
    * re-materializing. */
  def admitWithBudgetsPrepared(preparedStats: DataFrame,
      budgets: DataFrame, idCol: String = "doc_id",
      bucketWidth: Long = 100000L): DataFrame =
    admitPrepared(preparedStats,
      _.join(broadcast(budgets), Seq("source")), idCol, bucketWidth)

  /** The shared admission core over an ALREADY-CHECKPOINTED stats
    * frame (callers own the checkpoint so a composition like
    * [[unimaxFromStats]] — which needs the same frame for its totals
    * pass — never materializes it twice): `attach` lands a `_budget`
    * column on the per-(source, quality-grain) cumulative histogram;
    * everything downstream of it is identical for the uniform- and
    * per-group-budget paths, so the two admission semantics cannot
    * fork. */
  private def admitPrepared(d: DataFrame,
      attach: DataFrame => DataFrame,
      idCol: String, bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = d.groupBy("source", "q").agg(sum("n_tokens").as("t"))
    val cum = attach(hist.withColumn("cum",
      sum("t").over(Window.partitionBy("source").orderBy(col("q").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val fullAdmit = d
      .join(broadcast(cum.filter(col("cum") <= col("_budget"))
        .select("source", "q")), Seq("source", "q"))
      .select(col(idCol), col("source"), col("q"), col("n_tokens"),
        lit("grain").as("admit"))
    val bnd = d.join(broadcast(cum
        .filter(col("cum") > col("_budget") &&
          col("cum") - col("t") < col("_budget"))
        .select(col("source"), col("q"),
          (col("_budget") - (col("cum") - col("t"))).as("rem"))),
      Seq("source", "q"))
    val base = bnd.withColumn("_bkt", floor(col(idCol) / bucketWidth))
    val within = base.withColumn("_wcum",
      sum("n_tokens").over(Window.partitionBy("source", "_bkt")
        .orderBy(idCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = base.groupBy("source", "_bkt").agg(sum("n_tokens").as("_btot"))
      .withColumn("_off", coalesce(sum("_btot").over(
        Window.partitionBy("source").orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "_bkt", "_off")
    val bndAdmit = within.join(broadcast(offs), Seq("source", "_bkt"))
      .filter(col("_off") + col("_wcum") <= col("rem"))
      .select(col(idCol), col("source"), col("q"), col("n_tokens"),
        lit("boundary").as("admit"))
    fullAdmit.unionByName(bndAdmit)
  }

  /** UniMax language-budget waterfill (Chung et al. 2023,
    * arXiv:2304.09151): given per-group token totals `(source, n)`, a
    * total training budget B and an epoch cap N, allocate B as evenly
    * as possible across groups while capping each group at N·n — the
    * published fairer alternative to temperature sampling for
    * multilingual pretraining mixes. Closed form instead of the
    * paper's sequential loop: processing groups by ascending n, the
    * capped set is a PREFIX of that order (once a group's N·n exceeds
    * the running equal share, every larger group's does too — shares
    * only grow as capped groups release budget), so one pass of
    * window functions over the GROUP-COUNT-sized totals frame decides
    * every group: group i (1-based, ordered by (n, source)) is capped
    * iff N·n_i·(L−i+1) ≤ B − Σ_{j<i} N·n_j, and every uncapped group
    * gets the same floor((B − capped mass) / #uncapped) share.
    * All-BIGINT arithmetic — partition order and engine cannot move a
    * token. Input frame is group-count-sized (languages, not docs);
    * the unpartitioned windows here never see corpus rows. */
  def unimaxAllocations(groupTotals: DataFrame, totalBudget: Long,
      epochCap: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epochCap >= 1, s"epoch cap must be >= 1, got $epochCap")
    val byN = Window.orderBy(col("n"), col("source"))
    val ord = groupTotals
      .withColumn("_i", row_number().over(byN))
      .withColumn("_l", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("_cap", col("n") * epochCap)
      .withColumn("_cumcap", coalesce(sum(col("_cap")).over(
        byN.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_capped",
        (col("_cap") * (col("_l") - col("_i") + 1) <=
          lit(totalBudget) - col("_cumcap")).cast("long"))
    val k = ord.agg(
      sum("_capped").as("_k"),
      coalesce(sum(when(col("_capped") === 1, col("_cap"))), lit(0L))
        .as("_capmass"))
    ord.crossJoin(broadcast(k))
      // integral share: `div`, not `/` (which would detour through a
      // double) — the oracle's `//` agrees for these nonnegative terms
      .withColumn("_rem", lit(totalBudget) - col("_capmass"))
      .withColumn("_nun", col("_l") - col("_k"))
      .withColumn("_budget",
        when(col("_capped") === 1, col("_cap"))
          .otherwise(expr("_rem div _nun")))
      .select(col("source"), col("n"), col("_budget"))
  }

  /** UniMax-budgeted admission over documents: per-language token
    * totals → [[unimaxAllocations]] waterfill (budget = `budgetNum`/
    * `budgetDen` of the corpus's total tokens, computed from the same
    * counts — one model-sized 1-row collect, the lidCore precedent) →
    * the [[admitFromStats]] machinery with each language's allocation
    * as its budget, best quality grains first, boundary grain cut in
    * doc-id order. With `epochCap` = 1 the published allocation and
    * the admission interpretation coincide exactly (a capped language
    * admits wholly — no document repetition); for N > 1 the
    * allocation is still the published one and admission naturally
    * saturates at one pass. Returns admitted docs
    * `(idCol, source=lang, q, n_tokens, admit, lang_budget)` — the
    * language's waterfill allocation rides every row, so a verifier
    * hash over the output pins the allocation itself, not just its
    * admission consequences. */
  def unimaxMix(docs: DataFrame, budgetNum: Long, budgetDen: Long,
      epochCap: Long = 1L, langCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text",
      bucketWidth: Long = 100000L): DataFrame =
    unimaxFromStats(docs.select(
      col(idCol), col(langCol).as("source"),
      TextAnalysis.qualityScore(col(textCol)).as("q"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      budgetNum, budgetDen, epochCap, idCol, bucketWidth)

  /** [[unimaxMix]]'s waterfill + admission over a precomputed stats
    * frame `(idCol, source, q, n_tokens)` — the streaming twin feeds
    * this with its carried per-doc stats (the [[admitFromStats]]
    * precedent), so batch and stream UniMax semantics cannot fork. */
  def unimaxFromStats(rawStats: DataFrame, budgetNum: Long,
      budgetDen: Long, epochCap: Long = 1L, idCol: String = "doc_id",
      bucketWidth: Long = 100000L): DataFrame = {
    require(budgetNum >= 1 && budgetDen >= 1,
      s"budget fraction must be positive, got $budgetNum/$budgetDen")
    val spark = rawStats.sparkSession
    import spark.implicits._
    // ONE checkpoint feeds both the totals pass and the admission
    // scan (admitPrepared takes it pre-materialized)
    val stats = Dedup.checkpointTracked(rawStats)
    val totalRow = stats.agg(sum("n_tokens")).collect().head
    // empty corpus (e.g. a zero-row first micro-batch in the
    // streaming twin): sum() is null — empty admission, not an NPE
    if (totalRow.isNullAt(0))
      return stats.select(col("source"), col(idCol), col("q"),
        col("n_tokens"), lit("").as("admit"), lit(0L).as("lang_budget"))
        .limit(0)
    val totalBudget = totalRow.getLong(0) * budgetNum / budgetDen
    val totals = stats.groupBy("source").agg(sum("n_tokens").as("n"))
    // the waterfill result is language-count-sized: collect it ONCE
    // (the model-artifact collect contract) so the allocation windows
    // run a single time, then both the admission filter and the
    // output lang_budget column ride the same local literal frame
    val alloc = unimaxAllocations(totals, totalBudget, epochCap)
      .select("source", "_budget").as[(String, Long)].collect().toSeq
    val budgets = alloc.toDF("source", "_budget")
    admitPrepared(stats, _.join(broadcast(budgets), Seq("source")),
      idCol, bucketWidth)
      .join(broadcast(alloc.toDF("source", "lang_budget")), Seq("source"))
  }
}
