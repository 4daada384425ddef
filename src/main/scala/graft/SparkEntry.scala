package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: `etl_*` = reference-parity operators (SURVEY §2 P1–P5,
  * A1–A5) exercised through the real normalize/transform code path;
  * `q*` = relational surface; `ev_*` = event-time analytics; `tx_*` /
  * `dd_*` / `vec_*` / `mm_*` = LLM-data-pipeline operators (text
  * analysis, dedup, similarity search, multimodal). Sinks (K1–K7) and
  * streaming are exercised by the ScalaTest suites + CLI (not
  * SQL-expressible).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the full ETL report over synthesized JSONL (every parity
    * operator executes). */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.reportQuery(spark, "/root/testdata/sf0.001")

  // a DEF, not a val: the suffix oracles unroll to the depth the
  // engine MEASURED (SuffixArray.lastRounds), and Verify dumps
  // oracle_sql.json after running every query — a val would freeze
  // the fallback depth at class-init time, before any build ran (r15)
  private def registry:
      Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    EtlQueries.all ++ RelationalQueries.all ++ EventQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ BpeQueries.all ++
      UnigramQueries.all ++ SuffixQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every registered query has one (the LSH
    * ANN oracle replays the deterministic pipeline from literal plane
    * coefficients; the IVF check is a per-query recall floor).
    * Every oracle passes through [[graft.queries.QueryUtil
    * .materializeCtes]]: DuckDB re-inlines multi-referenced CTEs, and
    * the deep curation-chain replays (shared CTEs referenced up to
    * 10×) cost 100–220 s each at sf0.01 un-materialized — the r15
    * driver compare outgrew its budget over exactly this. Measured
    * r16: the full 200-row compare drops ~1080 s → ~100 s. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, (_, Some(sql))) =>
      k -> graft.queries.QueryUtil.materializeCtes(sql) }

  /** Headline queries benched per round (BENCH_r{N}.json): one per
    * operator family, heaviest representative. */
  def benchQueries: Seq[String] = Seq(
    "etl_report",        // full parse+normalize+filter pipeline
    "etl_normalize",     // per-record normalize output (wide)
    "q1_pricing",        // scan + agg
    "q5_nation_revenue", // multi-join
    "q_window_top3",     // window functions
    "ev_sessions",       // sessionization
    "ev_hourly",         // event-time windows
    "tx_quality",        // text scoring scan
    "dd_minhash_lsh",    // minhash + LSH + verify
    "dd_ngram_jaccard",  // exact similarity join
    "vec_knn_brute",     // dense similarity search
    "vec_near_dup",      // exact all-pairs crossJoin (the pruning reference)
    "vec_near_dup_lsh",  // banded sign-LSH near-dup at 0.9 (scale path)
    "vec_knn_lsh",       // ANN path
    // r5: previously-unbenched families — a regression here was invisible
    "vec_knn_pq_recall", // PQ train+encode+ADC scan+re-rank (codegen PqAdc)
    "dd_clusters_star",  // large-star/small-star contraction rounds
    "dd_cross_corpus",   // asymmetric new-vs-history band join
    "tx_hash_embed",     // feature-hashing embedder (text→vector)
    "mm_media_meta",     // real media decoders over binary columns
    // r5 (cont.): the new operator families
    "ev_asof",           // merge-formulation as-of join
    "ev_range_join",     // grain-bucketized interval join
    "dd_decontaminate",  // broadcast benchmark 8-gram gate
    "tx_pack_shards",    // two-level prefix-sum shard packing
    "tx_bm25",           // BM25 search with query-term prefilter
    // r6: the new heavy text families
    "tx_line_dedup",     // corpus-wide line window + reassembly
    "tx_bigram_logprob", // capped bigram model + broadcast scoring
    // r7: the whole pipeline front to back as one declarative plan
    "tx_curation6",      // extract -> enc -> line dedup -> decon -> gates -> keeper -> bigram -> mix
    "tx_substr_dedup",   // ExactSubstr-style repeated-span removal (bounded per-doc window)
    "ev_funnel",         // ordered-step conversion funnel (per-step min + user-key join)
    "ev_retention",      // weekly cohort retention (distinct user-week rollup)
    // r7 (cont.): bounded top-k quota + DSIR selection + path analysis
    "tx_domain_cap",     // per-domain quota via BoundedTopK partial agg
    "tx_dsir",           // hashed-unigram importance weights (broadcast models)
    "ev_transitions",    // per-user lag window + broadcast-totals rollup
    "tx_rank_deciles",   // distributed global rank (range partition + offsets)
    "vec_semdedup",      // k-means cluster-blocked semantic near-dup
    "tx_heavy_hitters",  // two-pass SpaceSaving exact top-k
    "tx_curation7",      // selection back half: gate -> quota -> rank -> cut
    // r8: in-engine model training + incremental release processing
    "tx_clf_quality",    // logistic-regression quality classifier (5 GD epochs)
    "tx_incremental",    // delta-only gate recompute via corpus diff
    "tx_curation8",      // model-driven selection: clf floor -> rank cut
    "tx_release_manifest", // shard rollup + XOR content checksums
    // r9: sketch-backed gates + training-order artifacts
    "tx_bloom_gate",     // literal-bitset blocklist gate + confirm join
    "tx_distinct_hll",   // HLL distinct shingles (values never shuffle)
    "tx_shuffle_pack",   // seeded permutation x2 epochs + prefix-sum pack
    "ev_conversations",  // session transcripts (ordered assembly)
    "tx_pref_pairs",     // stratified chosen/rejected pair mining
    "tx_freq_cms",       // count-min counters + probe estimates
    "tx_pmi",            // collocation mining (counts + scalar totals)
    "tx_bpe_merges",     // 8-round BPE merge learning over the vocab table
    "q_pagerank",        // co-purchase graph build + 3 exact PR iterations
    "tx_outliers",       // histogram median/MAD robust stats (no percentile agg)
    "tx_token_budget",   // quality-grain threshold + boundary prefix admission
    "ev_asof_forward",   // forward merge as-of (time to next purchase)
    "tx_clf_isotonic",   // training run + minimax PAV over score bins
    "tx_curation12",     // crawl -> pool-trained calibrated gate -> budget -> order
    // r10: fourth-phase families previously unbenched — a regression
    // there was invisible (the r5 lesson, again)
    "ev_attribution",    // linear multi-touch credit shares
    "ev_survival",       // Kaplan-Meier curve (bucketized prefix sums)
    "q_pagerank_weighted", // weighted-multigraph PR iterations
    "tx_curation11",     // v6 chain + token-budget admission
    "vec_hard_negatives_lsh", // ANN-path hard-negative mining
    // r10: the tokenizer-id loop
    "tx_bpe_ids",        // id-encoded corpus (apply merges + per-doc digest)
    "tx_pack_bpe",       // token-budget packing on real BPE counts
    "tx_clf_gate_holdout", // holdout-trained calibrated clf gate
    // r11: planted-truth multimodal decode rows
    "mm_exif_meta",      // EXIF APP1/TIFF walk over planted rotated JPEGs
    "mm_meta_oracle",    // MP4/MP3/WAV/PNG byte-walk decode, planted truth
    "mm_frames",         // MJPEG sample-table walk + per-frame decode
    "mm_gif_anim",       // animated-GIF block walk: frames/delays/loop
    "mm_resize",         // orientation-aware aspect-preserving resize
    "mm_dhash_pairs",    // perceptual-hash pigeonhole near-dup join
    "mm_audio_bands",    // WAV decode + hand-rolled FFT octave argmax
    "tx_kn_bigram",      // Kneser-Ney bigram perplexity filter
    "tx_curation13",     // CCNet-shaped: dedup -> KN model -> LM floor
    "tx_gopher_rules",   // published Gopher rule battery, per-rule columns
    "tx_c4_rules",       // published C4 line/page filter over planted lines
    "tx_gopher_repetition", // top/dup n-gram char fractions, n=2..10
    // r13: the LID-gated composition (trained-LID front door)
    "tx_curation14",     // LID gate -> exact dedup -> KN perplexity floor
    "tx_unimax",         // UniMax epoch-capped language waterfill + admission
    "tx_curation15",     // UniMax mix -> exact dedup -> KN perplexity floor
    // r13 (cont.): tokenizer-apply + data-mixing families
    "tx_wordpiece_apply", // BPE train + greedy/optimal segmentation + corpus join
    "tx_doremi",         // unigram losses + exact-decimal MW trajectory
    "tx_curation16",     // DoReMi weights -> per-source budget admission
    "tx_unigram",        // unigram-LM training (seed + 2 EM rounds + Viterbi)
    "tx_unigram_em",     // forward-backward E-step + pruning round (r14)
    "tx_unigram_apply",  // frozen unigram model corpus scoring
    "tx_curation17",     // v6 -> pool-trained unigram budget admission
    "tx_drift",          // PSI/KL release drift over quality deciles
    "vec_balanced_sample", // LSH-bucket diversity quota sample
    "mm_tar_members",    // ustar shard member walk over planted archives
    "mm_keyframes",      // MP4 stss/avcC keyframe seek index (r14)
    // r14: index-build vs index-consume split (the AnnModels pattern)
    "tx_suffix_build",   // suffix-array doubling rounds + LCP lift +
                         // artifact save — ALWAYS rebuilds (the build
                         // is the operator); the family's heavy line
    "tx_repeated_seqs",  // artifact-consumer: leaf-scan the saved pair
                         // table, filter + top-k (the per-query cost
                         // once the index exists)
    // r15 (verdict #2): the build/consume split applied to the
    // model-driven curation family — always-retrain build lines; the
    // curation consumers (tx_curation10/11/12/17, tx_clf_gate_holdout,
    // tx_bpe_ids) now measure the per-release APPLY cost
    "tx_pool_build",         // the full v6 chain + pool artifact save
    "tx_clf_pool_build",     // pool classifier + isotonic retrain
    "tx_clf_build",          // holdout classifier + calibration grid
    "tx_unigram_pool_build", // pool unigram-LM tokenizer retrain
    "tx_langid",         // LID train + save (the lid_docs build line)
    "mm_sps",            // SPS exp-Golomb bitstream parse (r15 #4)
    "mm_gop",            // slice-header frame types + GOP audit (r15)
    "mm_fragments",      // fMP4/CMAF trun walk + frame types (r15)
    "mm_timeline",       // sidx/tfdt segment-timeline audit (r16)
    "mm_timeline_tree",  // hierarchical sidx descent + tree audit (r18)
    "mm_timeline_tracks", // muxed multi-track per-track decode clocks (r18)
    "mm_webm",           // WebM/EBML container walk + VP9 key audit (r16)
    "mm_webm_laced",     // Xiph/fixed/EBML lacing walk (r17)
    "mm_webm_stream",    // unknown-size streaming-muxed walk (r17)
    "mm_webm_tracks",    // multi-track video+laced-audio walk (r17)
    "mm_webm_cues",      // Cues seek-table + DefaultDuration audit (r18)
    "mm_zip64_members",  // ZIP64 central-directory walk (r18)
    "mm_tar_longnames")  // ustar-prefix/GNU-L/pax long-path walk (r18)
  // (mm_tgz_longnames shares the walk behind the gzip envelope; gated
  // by the driver oracle, not separately benched)
}
