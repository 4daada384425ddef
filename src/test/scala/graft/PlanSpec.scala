package graft

import graft.etl.SparkSpec

/** Physical-plan regression guard for the headline queries: the
  * scale-critical plan properties (broadcasts kept, filters pushed to
  * the parquet scan, no accidental cartesian products, top-k via
  * TakeOrderedAndProject, salted shuffle keys) are asserted as string
  * invariants over `queryExecution.sparkPlan`, so a future change that
  * silently loses one of them fails mechanically instead of just
  * getting slower. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // executedPlan (AQE initial plan): EnsureRequirements has inserted
  // the join/agg Exchanges by this point — sparkPlan predates them and
  // would under-count shuffles. Cache is cleared first: a table another
  // suite cached would otherwise replace the FileScan (and its
  // ReadSchema/PushedFilters) with an InMemoryTableScan.
  private def plan(name: String): String = {
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  private def countOf(s: String, marker: String): Int =
    s.sliding(marker.length).count(_ == marker)

  /** Queries whose REGISTERED form deliberately contains an exact/brute
    * computation: the *_lsh twins are the scale paths for the first
    * two; vec_knn_pq_recall contains (a) the brute-force TRUTH side of
    * the recall compare and (b) PQ's ADC pass, which by design is a
    * full-corpus-per-query scan over COMPRESSED codes (plain PQ trades
    * footprint, not row count — IVF-PQ is the pruned composition). */
  private val exactBaselines =
    Set("vec_knn_brute", "vec_near_dup", "vec_knn_pq_recall")

  /** Queries that deliberately cross-join a SINGLE-ROW broadcast
    * scalar frame (BM25's (N, avgdl) stats; the bigram LM's |V|
    * scalar; curation6's bigram-floor average and tempered-mix
    * denominator; DSIR's (T_target, T_raw) totals): the plan prints a
    * BroadcastNestedLoopJoin, but with |right| = 1 it is a constant
    * per-row lookup, not a quadratic pairing. CartesianProduct stays
    * forbidden even for these. */
  private val scalarCrossJoins =
    Set("tx_bm25", "tx_bigram_logprob", "tx_curation6", "tx_dsir",
      "tx_rank_deciles",  // N = one-row corpus count for the bucket formula
      "tx_heavy_hitters", // one-row certification floor scalar
      "tx_curation7",     // rank stage's one-row corpus count
      "tx_curation8",     // clf-floor scalar + rank stage's corpus count
      "tx_pmi",           // one-row (unigram, bigram) totals scalars
      "tx_kn_bigram",     // one-row continuation-total scalar
      "tx_curation13",    // KN total + one-row LM-floor scalar
      "tx_curation14",    // same KN total + one-row LM-floor scalars
      "tx_unimax",        // one-row (k, capmass) waterfill scalars
      "tx_curation15",    // unimax scalars + KN total + LM-floor scalar
      // isotonic's minimax needs the i<=k range-pair join over the
      // DISTINCT-SCORE bins — a grain-bounded frame (<= 10001 rows at
      // 4dp), never the corpus; CartesianProduct stays forbidden.
      // r15: tx_curation12 / tx_clf_gate_holdout no longer fit the
      // isotonic in-query (they consume the clf_pool / clf_holdout
      // artifacts); the pairing lives in the build thunks, pinned by
      // tx_clf_isotonic's plan below
      "tx_clf_isotonic",
      "tx_curation12")    // tokenBudgetMix one-row denominator scalars

  test("no headline query plans a cartesian product (baselines excepted)") {
    (SparkEntry.benchQueries.toSet ++ Set("ev_skew_join") -- exactBaselines)
      .foreach { name =>
        val p = plan(name)
        assert(!p.contains("CartesianProduct"),
          s"$name plans a cartesian product:\n$p")
        assert(scalarCrossJoins(name) ||
          !p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a cross join:\n$p")
      }
  }

  test("isotonic range-pair join stays a BROADCAST nested-loop, never " +
      "a shuffled cartesian") {
    // tx_clf_isotonic rides the scalarCrossJoins exception (BNLJ
    // allowed), so without this positive pin a regression that drops
    // Eval.isotonicFit's broadcast hint could only be caught by the
    // CartesianProduct ban — assert the pairing actually PLANS as
    // BroadcastNestedLoopJoin over the bins frame. (r15: curation12
    // consumes the clf_pool artifact, so the pairing shows only in
    // the build thunk — tx_clf_isotonic keeps the in-query pin.)
    Seq("tx_clf_isotonic").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$name lost the broadcast bins pairing:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$name plans a shuffled cartesian:\n$p")
    }
  }

  test("q5_nation_revenue: all dimensions broadcast, no sort-merge join") {
    val p = plan("q5_nation_revenue")
    assert(countOf(p, "BroadcastHashJoin") >= 4, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q6_revenue: every filter pushed into the parquet scan") {
    // the plan string truncates long filter lists — substring checks
    val p = plan("q6_revenue")
    assert(p.contains("PushedFilters: [IsNotNull"), s"no pushed filters:\n$p")
    assert(p.contains("GreaterThan"), p)
  }

  test("scan-shaped queries shuffle at most once (the output ordering)") {
    for (name <- Seq("etl_normalize", "tx_quality", "tx_repetition",
        "tx_encoding_gate", "tx_html_extract",
        "tx_gopher_rules", "tx_c4_rules")) {
      val p = plan(name)
      assert(countOf(p, "Exchange") <= 1,
        s"$name has an unexpected shuffle:\n$p")
    }
  }

  test("tx_line_dedup: line counts partial-aggregate — no Window on the line key") {
    // a count-over-window on `k` would funnel every copy of a hot
    // boilerplate line through ONE task (Window has no map-side partial
    // aggregation and AQE skew handling does not apply to it); the
    // groupBy form partial-aggregates, and the join-back is an AQE-
    // splittable equi-join
    val p = plan("tx_line_dedup")
    assert(!p.contains("Window"), s"line counts must not use a window:\n$p")
    assert(p.contains("HashAggregate"), s"expected partial aggregation:\n$p")
  }

  test("tx_substr_dedup: gram counts partial-aggregate; the only window is per-document and bounded") {
    // hot-gram occurrence counting must be a groupBy (partial agg — a
    // boilerplate gram at 10^8 copies shrinks to one row per map
    // task), never a window on the gram key; the span-merge window is
    // partitioned by DOCUMENT with a bounded (k-1 preceding) frame —
    // per-doc work that AQE/document-count parallelism scales
    val p = plan("tx_substr_dedup")
    assert(p.contains("HashAggregate"), s"expected partial aggregation:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty, s"span merge should be a window:\n$p")
    assert(windows.forall(_.contains("doc_id")),
      s"every window must partition by the document, not the gram:\n$windows")
  }

  test("tx_domain_cap: quota is a bounded top-k PARTIAL aggregation, never a domain window") {
    // the C4-style per-domain cap must map-side-combine: a hot domain
    // (10^8 pages of one site at crawl scale) shrinks to ≤ k rows per
    // map task before the shuffle. A row_number window on the domain
    // key — the lineDedup r6 failure class — funnels the whole domain
    // through one task.
    val p = plan("tx_domain_cap")
    assert(p.contains("partial_bounded_top_k"),
      s"expected map-side partial bounded_top_k:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"typed imperative agg should plan as ObjectHashAggregate:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window allowed anywhere in the quota plan:\n$p")
  }

  test("tx_dsir: bucket models broadcast — the corpus never sort-merge-joins") {
    // both bucket-model frames are ≤ numBuckets rows; scoring must be
    // a broadcast join against the persisted token frame plus one
    // per-doc aggregation, not a corpus-wide shuffle join
    val p = plan("tx_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"ratio frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side shuffle join defeats the broadcast design:\n$p")
  }

  test("tx_clf_quality: weights ride in the codegen margin; no join at all, no window") {
    // the trained weight vector is ≤ numBuckets+1 doubles — scoring
    // evaluates it through the compiled sparse_margin expression
    // (r14; the r13 form inlined a literal map into an interpreted
    // zip_with/aggregate — sparse_margin keeps the same
    // no-join/no-shuffle shape and moves the loop into codegen) over
    // the persisted feature frame, so the scoring pass is pure
    // map-side: NO join of any kind (the pre-r9 design broadcast a
    // 257-row weight frame), and never a corpus shuffle or window
    val p = plan("tx_clf_quality")
    assert(p.contains("sparse_margin("),
      s"weights must ride through the codegen sparse margin:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"scoring must be join-free (weights are a literal):\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window belongs in the scoring plan:\n$p")
  }

  test("tx_bloom_gate: scan-fused literal probes; exactly one join, fed only by bloom candidates") {
    // the negative mass decides at the scan (k element_at probes into
    // the literal word array) and never joins; the one equi-join in
    // the plan confirms the candidate sliver. A second join, a window
    // or a cartesian means the literal-bitset design regressed.
    val p = plan("tx_bloom_gate")
    assert(p.contains("element_at("),
      s"bitset probes must be inlined literal lookups:\n$p")
    val joins = countOf(p, "SortMergeJoin") + countOf(p, "BroadcastHashJoin")
    assert(joins == 1, s"expected exactly one confirming join, got $joins:\n$p")
    assert(!p.contains("windowspecdefinition") && !p.contains("CartesianProduct"),
      s"no window / cartesian in the gate plan:\n$p")
  }

  test("tx_distinct_hll: shingles reduce map-side (partial max per bucket); no join, no window") {
    // the sketch's whole point: values themselves never cross the wire
    // — the first Exchange carries (group, bucket, partial-max-rho)
    // rows only. A join or window would mean the sketch regressed to
    // an exact-distinct shape.
    val p = plan("tx_distinct_hll")
    assert(p.contains("partial_max"),
      s"per-bucket rho must partial-aggregate before the shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"),
      s"sketch plan must be join- and window-free:\n$p")
  }

  test("tx_weighted_sample: global top-k is TakeOrderedAndProject, never a full sort") {
    // per-partition partial top-k + one k-row merge; an Exchange-then-
    // Sort shape would sort the corpus for a 100-row sample
    val p = plan("tx_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n$p")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"),
      s"sampling plan must be join- and window-free:\n$p")
  }

  test("tx_freq_cms: counter build partial-aggregates; probes broadcast; no window") {
    // the counter key space is ≤ d·w regardless of corpus size — map
    // tasks must combine before the shuffle; the probe side is tiny
    // and broadcasts to the counters
    val p = plan("tx_freq_cms")
    assert(p.contains("partial_count"),
      s"counters must partial-aggregate map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"probe lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("windowspecdefinition"),
      s"no shuffle join or window in the sketch plan:\n$p")
  }

  test("tx_incremental: reuse is an anti join, recompute a semi join; no window, no shuffle of text") {
    // the incremental contract in plan form: v1 outputs survive via a
    // LEFT ANTI against the dirty-id frame, the delta flows in via a
    // LEFT SEMI — both equi-joins on the unique id (AQE-splittable),
    // never a window or cartesian form
    val p = plan("tx_incremental")
    assert(p.contains("LeftAnti"), s"reuse path must be an anti join:\n$p")
    assert(p.contains("LeftSemi"), s"delta path must be a semi join:\n$p")
    assert(!p.contains("windowspecdefinition"), s"no window:\n$p")
  }

  test("ev_transitions: the lag window partitions by USER, never the hot type key; totals broadcast") {
    // event types are few and colossally hot — a window or shuffle
    // join keyed on them is the lineDedup r6 failure class. The only
    // window must partition by user (bounded domain) and the
    // per-from-type totals frame must broadcast.
    val p = plan("ev_transitions")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty, s"adjacency should be a lag window:\n$p")
    assert(windows.forall(_.contains("user_id")),
      s"every window must partition by the user, not the type:\n$windows")
    assert(p.contains("BroadcastHashJoin"),
      s"totals frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the transitions plan:\n$p")
  }

  test("ev_asof: merge formulation — one key shuffle, no join operator at all") {
    // the union+window encoding must plan ZERO joins (the naive
    // inequality-join form would appear as a BroadcastNestedLoopJoin or
    // a range SortMergeJoin); exchanges are bounded by: purchase
    // (user, ts) pre-agg + the user_id window partition + the
    // output-ordering repartition(1)
    val p = plan("ev_asof")
    assert(!p.contains("Join"), s"asof should be join-free:\n$p")
    assert(countOf(p, "Exchange") <= 3,
      s"ev_asof shuffles more than pre-agg+key+ordering:\n$p")
    assert(p.contains("Window"), p)
  }

  test("ev_asof_bc: history broadcasts and the probe is the codegen binary search") {
    val p = plan("ev_asof_bc")
    assert(p.contains("BroadcastExchange"),
      s"per-key history should broadcast:\n$p")
    assert(p.contains("sorted_asof_idx"),
      s"probe should be the SortedAsofIndex expression:\n$p")
    assert(!p.contains("SortMergeJoin"), s"big side must not shuffle:\n$p")
  }

  test("ev_range_join: bucketized intervals make the range join an equi-join") {
    // a raw inequality join would plan BroadcastNestedLoopJoin; the
    // bucketized form must be a hash/sort-merge EQUI-join whose keys
    // include the grain bucket (_b), with the range as a post-filter
    val p = plan("ev_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"range join is not equi:\n$p")
    assert(p.contains("_b"), s"grain bucket not in the join keys:\n$p")
  }

  test("shared frames are persisted, not re-scanned (direct corpus scans bounded)") {
    // a cached frame prints its build recipe (incl. its FileScan)
    // under each InMemoryRelation, so the DIRECT scan count is
    // FileScan minus InMemoryRelation occurrences. Without the
    // tracked persists, pack_shards plans 2 direct corpus scans
    // (window + offsets re-tokenize the input) and bm25 3 (stats,
    // tf join side, dfreq)
    for ((name, maxDirect) <- Seq("tx_pack_shards" -> 0, "tx_bm25" -> 1)) {
      val p = plan(name)
      val direct = countOf(p, "FileScan") - countOf(p, "InMemoryRelation")
      assert(direct <= maxDirect,
        s"$name re-scans its input ($direct direct FileScans > $maxDirect):\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"$name lost its shared-frame persist:\n$p")
    }
  }

  test("tx_pack_shards: corpus-sized cumsum windows on the bucket key, never one partition") {
    // the two-level prefix sum must keep the per-row window PARTITIONED
    // (hashpartitioning on _bkt); only the per-bucket offsets frame —
    // one row per bucket — may pass through a single partition
    val p = plan("tx_pack_shards")
    assert(p.contains("hashpartitioning(_bkt"),
      s"per-row cumsum lost its bucket partitioning:\n$p")
  }

  test("tx_outliers: quantiles from the histogram — no percentile value buffering") {
    // Robust.madOutlierStats must never plan a percentile() aggregate
    // (it buffers every group value on one reducer); all quantile work
    // runs on the grain-bounded histogram windows
    // (the histogram build itself is behind the checkpoint — its
    // partial agg is pinned by the RobustSpec partitioning tests; the
    // visible plan carries the quantile windows and the final rollup)
    val p = plan("tx_outliers")
    assert(!p.toLowerCase.contains("percentile"),
      s"outlier stats regressed to a value-buffering percentile agg:\n$p")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toList
    assert(windows.nonEmpty && windows.forall(_.contains("lang")),
      s"quantile windows must partition by the stats key:\n$windows")
  }

  test("tx_token_budget: admission is equi-joins; boundary windows stay bucket-partitioned") {
    val p = plan("tx_token_budget")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"unexpected cross join:\n$p")
    // the boundary-slice per-row cumsum must keep its (source, _bkt)
    // partitioning — a window on source alone would funnel a hot
    // source's boundary grain through one task
    val rowWindows = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toList
    assert(rowWindows.exists(_.contains("_bkt")),
      s"boundary cumsum lost its bucket partitioning:\n$rowWindows")
  }

  test("tx_unimax: waterfill windows run on the language-totals frame; boundary cumsum stays bucket-partitioned") {
    val p = plan("tx_unimax")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // the admission inherits tx_token_budget's shape: the boundary
    // per-row cumsum must keep its (source, _bkt) partitioning
    val rowWindows = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toList
    assert(rowWindows.exists(_.contains("_bkt")),
      s"boundary cumsum lost its bucket partitioning:\n$rowWindows")
    // the waterfill's UNPARTITIONED windows are legal only because
    // they run over the per-language totals frame (L rows): any spec
    // that orders by doc_id is corpus-sized and must carry the _bkt
    // partitioning of the boundary slice
    val docWindows = rowWindows.filter(_.contains("doc_id"))
    assert(docWindows.forall(_.contains("_bkt")),
      s"a corpus-sized window leaked out of the bucketized boundary slice:\n$docWindows")
  }

  test("q_pagerank: iteration joins stay equi; edge dedup pays one shuffle") {
    val p = plan("q_pagerank")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"pagerank crossed:\n$p")
    // edges arrive via the checkpointed scan — the final plan must not
    // re-run the lineitem self-join per iteration
    assert(!p.contains("lineitem"),
      s"iterations replay the edge build instead of the checkpoint:\n$p")
  }

  test("ev_attribution: the lookback match is a bucketized equi join, never a nested loop") {
    val p = plan("ev_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"attribution regressed to an inequality nested loop:\n$p")
  }

  test("ev_survival: two-level prefix sums — every window bucketized, " +
      "offsets joins broadcast") {
    // the r9 audit item: the curve must never run an unpartitioned
    // window over the full duration histogram; both prefix passes ride
    // the _bkt bucketization (within-bucket windows + a bucket-count
    // offsets window) and the offsets frames join back by BROADCAST
    val p = plan("ev_survival")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty && windows.forall(_.contains("_bkt")),
      s"every KM window must be bucketized (_bkt), found:\n$windows")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"KM offsets must join by broadcast hash:\n$p")
  }

  test("tx_rank_deciles: distributed rank — range partition, windows only on the per-partition offsets frame") {
    // the naive global row_number window would sort the whole corpus
    // in ONE task; the distributed form must range-partition the data
    // and confine every window to the O(#partitions) offsets frame
    val p = plan("tx_rank_deciles")
    assert(p.contains("rangepartitioning"),
      s"rank lost its range repartition:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty && windows.forall(_.contains("_pid")),
      s"every window must run on the offsets frame (_pid), found:\n$windows")
  }

  test("tx_gate_sweep: distributed rank feeds the sweep — range partition, corpus windows confined") {
    // the sweep inherits rankDeciles' distributed rank; every window
    // must run on the O(#partitions) offsets frame (_pid) or the
    // 10-row decile frame (cumulative curve) — never the corpus
    val p = plan("tx_gate_sweep")
    assert(p.contains("rangepartitioning"),
      s"gate sweep lost its range repartition:\n$p")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty, s"expected offsets/curve windows:\n$p")
    assert(windows.forall(w => w.contains("_pid") || w.contains("decile")),
      s"every window must run on the offsets or decile frame:\n$windows")
  }

  test("tx_wordpiece_apply: vocab-sized segmentation joins, no cartesian, corpus aggregates partially") {
    // the greedy loop runs on the word table; the corpus only flows
    // through equi-joins against the vocab-sized per-word frame and a
    // per-doc partial aggregation — no cartesian/BNLJ anywhere, no
    // window at all
    val p = plan("tx_wordpiece_apply")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"wordpiece apply must stay equi-join only:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"wordpiece apply needs no window:\n$p")
    assert(p.contains("HashAggregate"),
      s"per-doc totals must partial-aggregate:\n$p")
  }

  test("tx_bpe_ids: vocab tables are ALWAYS the build side; the token stream never builds") {
    // r15 plan audit: left to its own stats Spark picked the
    // corpus-token-sized exploded stream as the build side (BuildLeft)
    // of the word-segmentation join at small SF — which inverts to a
    // full token-stream shuffle (or an impossible broadcast) at corpus
    // scale. r16: the hint is size-aware (Bpe.vocabJoinSide) —
    // broadcast under the 1M-row cap, vocab-built shuffled hash join
    // above it. Every bench SF sits far below the cap, so BOTH joins
    // (word → syms, sym → id) must still broadcast the vocab-sized
    // right side here; the above-cap shape is pinned separately below.
    val p = plan("tx_bpe_ids")
    assert(!p.contains("SortMergeJoin"),
      s"token stream must never sort-merge:\n$p")
    assert(!p.contains("BuildLeft"),
      s"the corpus side must never be the broadcast build side:\n$p")
    assert(countOf(p, "BroadcastHashJoin") == 2,
      s"expected exactly the two vocab-sized broadcast joins:\n$p")
  }

  test("vocabJoinSide above the cap: vocab-built shuffled hash join, never a stream-side build") {
    // the crawl-scale branch: a gated vocab past BroadcastVocabMaxRows
    // must NOT broadcast (unbounded-broadcast risk — ADVICE r15) and
    // must NOT let the stream become the build side; the shuffle_hash
    // hint pins a ShuffledHashJoin building the vocab side
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val stream = Seq.tabulate(64)(i => (i.toLong, s"w${i % 4}"))
      .toDF("doc_id", "word")
    val vocab = Seq.tabulate(4)(i => (s"w$i", i.toLong))
      .toDF("word", "syms")
    val joined = stream.join(graft.ops.Bpe.vocabJoinSide(vocab, cap = 0L),
      "word")
    val p = joined.queryExecution.executedPlan.toString
    graft.ops.Dedup.releaseCaches()
    assert(p.contains("ShuffledHashJoin"),
      s"above-cap vocab must plan a shuffled hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"above-cap vocab must not broadcast:\n$p")
    assert(p.contains("BuildRight"),
      s"the vocab (right) side must be the hash build side:\n$p")
    assert(!p.contains("BuildLeft"),
      s"the stream side must never build:\n$p")
  }

  test("suffix doubling round: the lead window partitions by (doc_id, chunk); wide steps fall back to the sharded join") {
    // r19 de-skew pin (verdict r18 #1): the r18 lead() windowed by
    // doc_id ALONE, so one giant document ran each round on a single
    // task. The round's window spec must carry BOTH keys — doc_id and
    // the _tc position chunk — and steps wider than a chunk must take
    // the (doc_id, widx)-keyed join, which shards any document.
    import spark.implicits._
    val ranks = Seq((1L, 0L, 1L), (1L, 1L, 2L), (2L, 0L, 1L))
      .toDF("doc_id", "widx", "r")
    val lead = graft.ops.SuffixArray.shiftRanks(ranks, step = 4L,
      cw = graft.ops.SuffixArray.DefaultChunkWidth)
      .queryExecution.executedPlan.toString
    assert(lead.contains("windowspecdefinition(doc_id"),
      s"round shift must stay a window over doc-ordered positions:\n$lead")
    assert(lead.replaceAll("#\\d+L?", "")
        .contains("windowspecdefinition(doc_id, _tc"),
      s"window spec must partition by (doc_id, _tc), never doc_id alone:\n$lead")
    val wide = graft.ops.SuffixArray.shiftRanks(ranks, step = 16L, cw = 8L)
      .queryExecution.executedPlan.toString
    assert(!wide.contains("windowspecdefinition"),
      s"a step wider than a chunk must not window:\n$wide")
    assert(wide.contains("Join") && !wide.contains("CartesianProduct"),
      s"wide-step fallback must be the sharded equi join:\n$wide")
  }

  test("mm_gop: payloads stay in their arrival partition — only the narrow audit rows shuffle") {
    // the fixture table broadcasts into the blob frame, the slice-
    // header walk runs per-partition (mapPartitions), and the only
    // hash shuffle is the media_id aggregation of the narrow frame-
    // type rows — the payload column must never cross an exchange
    val p = plan("mm_gop")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fixture join must broadcast:\n$p")
    // exactly one narrow hash exchange — the media_id aggregation of
    // the audit rows (r18 note: a pre-join doc spread was measured
    // here and REVERTED: the slice walk is cheap byte arithmetic, so
    // the extra exchange cost more than the parallelism bought —
    // 0.33 → 0.74 s; the spread stays only on the ImageIO/FFT decode
    // lines where it measured a win, see OPTIMIZATION_r18.md §F3)
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"exactly one narrow agg shuffle expected:\n$p")
    assert(!p.linesIterator.filter(_.contains("Exchange"))
        .exists(_.contains("payload")),
      s"payload bytes must never shuffle:\n$p")
  }

  test("mm_fragments: shard blobs stay in their arrival partition — only the narrow index rows shuffle") {
    // same contract as mm_gop: the fixture table broadcasts into the
    // blob frame, the tfhd/trun walk runs per-partition, and the
    // payload column never crosses an exchange (the only exchange is
    // the ordered-output single partition)
    val p = plan("mm_fragments")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fixture join must broadcast:\n$p")
    assert(!p.linesIterator.filter(_.contains("Exchange"))
        .exists(_.contains("payload")),
      s"payload bytes must never shuffle:\n$p")
  }

  test("mm_timeline: shard blobs stay in their arrival partition — only the narrow audit rows shuffle") {
    // same contract as mm_fragments: the fixture table broadcasts
    // into the blob frame, the sidx/tfdt walk runs per-partition, and
    // the payload column never crosses an exchange
    val p = plan("mm_timeline")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fixture join must broadcast:\n$p")
    assert(!p.linesIterator.filter(_.contains("Exchange"))
        .exists(_.contains("payload")),
      s"payload bytes must never shuffle:\n$p")
  }

  test("mm_timeline_tree: shard blobs stay in their arrival partition — only the narrow audit rows shuffle") {
    // same contract as mm_timeline: the hierarchical-sidx descent is
    // pure per-partition byte work — the tree adds zero plan nodes
    val p = plan("mm_timeline_tree")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fixture join must broadcast:\n$p")
    assert(!p.linesIterator.filter(_.contains("Exchange"))
        .exists(_.contains("payload")),
      s"payload bytes must never shuffle:\n$p")
  }

  test("mm_webm: shard blobs stay in their arrival partition — only the narrow audit rows shuffle") {
    // same contract as mm_fragments/mm_timeline: the fixture table
    // broadcasts into the blob frame, the EBML walk runs
    // per-partition, and the payload column never crosses an exchange
    val p = plan("mm_webm")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fixture join must broadcast:\n$p")
    assert(!p.linesIterator.filter(_.contains("Exchange"))
        .exists(_.contains("payload")),
      s"payload bytes must never shuffle:\n$p")
  }

  test("mm_timeline_tracks: shard blobs stay in their arrival partition — only the narrow audit rows shuffle") {
    // same contract as mm_timeline: per-track clock state lives
    // inside the per-partition walk — no extra plan nodes
    val p = plan("mm_timeline_tracks")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fixture join must broadcast:\n$p")
    assert(!p.linesIterator.filter(_.contains("Exchange"))
        .exists(_.contains("payload")),
      s"payload bytes must never shuffle:\n$p")
  }

  test("mm_webm_cues: shard blobs stay in their arrival partition — only the narrow audit rows shuffle") {
    // same contract as mm_webm: the seek-table audit is pure
    // per-partition byte work over the broadcast fixture join
    val p = plan("mm_webm_cues")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fixture join must broadcast:\n$p")
    assert(!p.linesIterator.filter(_.contains("Exchange"))
        .exists(_.contains("payload")),
      s"payload bytes must never shuffle:\n$p")
  }

  test("tx_unigram_apply: frozen-model scoring is a vocab-sized equi-join, corpus aggregates partially") {
    // the EM/Viterbi loops all run on the word-table side; the corpus
    // word stream reaches the per-word piece counts through an
    // equi-join (broadcast at this SF) and reduces straight to per-doc
    // sums — no cartesian/BNLJ, no window, no corpus-wide sort
    val p = plan("tx_unigram_apply")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"unigram apply must stay equi-join only:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"unigram apply needs no window:\n$p")
    assert(p.contains("HashAggregate"),
      s"per-doc totals must partial-aggregate:\n$p")
  }

  test("vec_balanced_sample: one aggregation, map-side BoundedTopK partials, no window over the corpus") {
    // the quota must cap per map task (partial_bounded_top_k), and the
    // bucket count computes in the SAME aggregate — a window
    // formulation would funnel hot buckets through single tasks
    val p = plan("vec_balanced_sample")
    assert(p.contains("partial_bounded_top_k"),
      s"expected map-side partial bounded_top_k:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window over the bucketed corpus:\n$p")
    assert(countOf(p, "Exchange") <= 2,
      s"one agg shuffle (+ result sort) only:\n$p")
  }

  test("tx_heavy_hitters: map-side sketch partials; exact pass counts broadcast candidates only") {
    // the sketch must partial-aggregate (bounded buffer per map task),
    // and the exact re-count must reach the corpus through a BROADCAST
    // semi-join on the candidate set — a sort-merge join or a plain
    // vocabulary-wide groupBy would shuffle corpus-sized key sets
    val p = plan("tx_heavy_hitters")
    assert(p.contains("partial_space_saving_top_k"),
      s"expected map-side partial space_saving_top_k:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidate filter must be a broadcast semi-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the heavy-hitters plan:\n$p")
  }

  // tx_curation7 has no plan pin of its own: its checkpointed stage
  // boundaries collapse every upstream plan to a leaf scan in the
  // funnel plan, so the quota/rank shapes are invisible there — they
  // are pinned on tx_domain_cap and tx_rank_deciles directly.

  test("vec_semdedup: cluster blocking is an equi-join on the cell id — never a cross join") {
    val p = plan("vec_semdedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"semdedup candidate generation must stay an equi-join:\n$p")
  }

  test("dd_decontaminate: benchmark shingles broadcast — the corpus never shuffles pre-join") {
    val p = plan("dd_decontaminate")
    assert(countOf(p, "BroadcastHashJoin") >= 1,
      s"benchmark side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dd_minhash_lsh: signatures come from the codegen expression, not the 65-column agg") {
    val p = plan("dd_minhash_lsh")
    assert(p.contains("minhash_sig"), s"minhash_sig not in plan:\n$p")
    // the old shape aggregated 64 separate min columns — its signature
    // was 64 partial-min aggregate expressions in one HashAggregate
    assert(!p.contains("min(m0"), p)
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    for (name <- Seq("q3_top_orders", "q_topk_orders"))
      assert(plan(name).contains("TakeOrderedAndProject"), plan(name))
  }

  test("ev_skew_join: the shuffle keys include the salt") {
    val p = plan("ev_skew_join")
    assert("hashpartitioning\\([^)]*_salt".r.findFirstIn(p).isDefined,
      s"salt not in shuffle keys:\n$p")
  }

  test("LSH scale paths stay equi-joins (bucket keys in the join)") {
    for (name <- Seq("vec_near_dup_lsh", "vec_knn_lsh", "dd_minhash_lsh")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
    // the IVF op directly (its registered query is the recall form,
    // which deliberately contains the brute-force reference crossJoin)
    spark.catalog.clearCache()
    val ivf = graft.ops.Ivf.knn(
      spark.read.parquet(s"$sf/embeddings.parquet"), 5,
      org.apache.spark.sql.functions.col("vec_id") % 50 === 0,
      numCentroids = 16, nprobe = 12)
      .queryExecution.executedPlan.toString
    assert(!ivf.contains("CartesianProduct") &&
      !ivf.contains("BroadcastNestedLoopJoin"), s"vec_knn_ivf:\n$ivf")
  }

  test("bucketed layout: co-located join plans with ZERO exchanges") {
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    try {
      graft.ops.Layout.writeBucketed(orders, "orders_b", "o_orderkey", 4,
        sortCol = Some("o_orderkey"))
      graft.ops.Layout.writeBucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 4, sortCol = Some("o_orderkey"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.ops.Layout.readTable(spark, "orders_b")
        .join(graft.ops.Layout.readTable(spark, "lineitem_b"), "o_orderkey")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join/agg must not shuffle:\n$p")
      // and it still computes the right thing
      assert(joined.agg(sum("n")).head().getLong(0) == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("column pruning: tx_quality reads only doc_id and text") {
    val p = plan("tx_quality")
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("source"), s"ReadSchema=$read")
  }

  test("tx_domain_stats: PSL lookup is pure expressions — no UDF in the plan") {
    // the registrable-domain rules compile to InSet probes inside the
    // scan projection; a regression to a UDF/ScalaUDF would fall out of
    // whole-stage codegen exactly where the per-row work is hottest
    val p = plan("tx_domain_stats")
    assert(!p.contains("ScalaUDF") && !p.toLowerCase.contains("batchevalpython"),
      s"PSL lookup left codegen:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("source"), s"ReadSchema=$read")
  }

  test("tokenizer probe stays scan-shaped: at most the ordering shuffle") {
    val p = plan("tx_tokenizer_probe")
    assert(countOf(p, "Exchange") <= 1, s"unexpected shuffle:\n$p")
  }

  test("tx_gopher_repetition: one scan, shuffle-free battery; no window anywhere") {
    // r13: all nine metrics come from the codegen GopherRepMetrics
    // expression — one compiled hash-count pass per document, so the
    // gram fan-out never becomes rows. The pin is the strongest shape
    // this battery can have: one scan, no join, no window, and NO
    // exchange except the single result-ordering one (the r12
    // explode+double-agg form shuffled the 9·T gram stream twice; the
    // r11 form re-scanned the source nine times)
    val p = plan("tx_gopher_repetition")
    assert(!p.contains("windowspecdefinition"),
      s"repetition battery must not plan a window:\n$p")
    assert(p.contains("gopher_rep_metrics"),
      s"expected the codegen GopherRepMetrics expression:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"crossed:\n$p")
    val direct = countOf(p, "FileScan") - countOf(p, "InMemoryRelation")
    assert(direct <= 1,
      s"repetition battery re-scans its input ($direct FileScans):\n$p")
    assert(!p.contains("Join"), s"repetition battery must be join-free:\n$p")
    assert(countOf(p, "Exchange") <= 1,
      s"battery must be shuffle-free up to the result ordering:\n$p")
  }

  test("tx_bpe_ids: corpus-sized id frame reduces below the single result exchange") {
    // the r10 scale fix: the registered output is the per-doc
    // (n_ids, xor digest, head slice) reduction — the corpus_tokens-
    // sized id frame must aggregate (map-side partial on doc_id)
    // BEFORE the one single-partition ordering exchange, never sort
    // through it
    val p = plan("tx_bpe_ids")
    val sp = p.indexOf("Exchange SinglePartition")
    assert(sp >= 0, s"missing result exchange:\n$p")
    assert(p.indexOf("Exchange SinglePartition", sp + 1) < 0,
      s"exactly one single-partition exchange expected:\n$p")
    // printed top-down: everything after `sp` is BELOW the exchange —
    // the digest aggregate (bit_xor) and its doc_id shuffle must both
    // live there, so only the per-doc reduction crosses into one task
    assert(p.indexOf("bit_xor") > sp,
      s"per-doc digest must aggregate below the result exchange:\n$p")
    assert(p.indexOf("hashpartitioning(doc_id") > sp,
      s"expected a doc_id hash exchange under the result exchange:\n$p")
    assert(!p.contains("CartesianProduct"), s"crossed:\n$p")
  }
}
