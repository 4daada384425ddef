package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix-array ranks by prefix doubling (Manber & Myers
  * 1990) over the corpus' per-document TOKEN streams — the index
  * behind suffix-array ExactSubstr dedup (Lee et al. 2022,
  * arXiv:2107.06499, which builds exactly this over the tokenized
  * corpus before scanning for long repeats).
  *
  * Formulation: each document contributes the suffixes of its token
  * stream terminated by a PER-DOCUMENT sentinel token
  * (`<doc_id>` — sorts below every real token, unique per doc),
  * so suffixes are well-defined within a document, comparable across
  * the whole corpus, and two byte-identical documents' suffixes are
  * still totally ordered (they first differ at their sentinels — the
  * classic `$` trick, per-doc-unique). After round k, ranks order
  * suffixes by their first 2^k tokens; sentinel uniqueness makes
  * ranks FULLY distinct (the complete suffix order) once
  * 2^Rounds ≥ the longest document's stream — enforced loudly.
  *
  * Scale shape (the published distributed construction): O(log
  * maxDocLen) rounds, each round = one equi-join of the rank frame
  * against itself shifted by 2^(k-1) (keyed (doc_id, widx) — no
  * global positions, no cross-doc keys), one DISTINCT over rank
  * pairs, and one [[Ranking.withGlobalRank]] over the distinct-pair
  * frame (range partition + per-partition offsets — dense rank
  * without a single-partition window; pairs are distinct rows, so
  * row-number equals dense rank and equal pairs cannot straddle a
  * boundary). Every round's frame is checkpoint-tracked (the
  * connected-components iteration rule: unbounded lineage otherwise).
  * Rounds past convergence are provable no-ops (dense ranks are
  * 1..N, so re-ranking distinct ranks returns them unchanged), which
  * is what makes a FIXED round count both safe and oracle-replayable.
  */
object SuffixArray {

  /** 2^Rounds must cover the longest token stream (sentinel
    * included): 9 ⇒ full suffix order for docs ≤ 511 tokens. At crawl
    * scale size this log2(max tokens per doc) — e.g. 13 for 8k-token
    * documents; the round cost is the same shape, just more of them. */
  val Rounds = 9

  /** (doc_id, widx, tok): the single-space token stream plus the
    * per-doc sentinel at position m (stream length). */
  private[graft] def stream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("widx", "tok")))
      .select(col("doc_id"), col("widx").cast("long").as("widx"), col("tok"))
      .unionByName(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("widx"),
        concat(lit("\u0001"), col("doc_id").cast("string")).as("tok")))

  /** Suffix rank per (doc_id, widx) — 1..N over all corpus positions
    * (sentinels included), N = total stream length. */
  def suffixRanks(docs: DataFrame): DataFrame = rankRounds(docs)._2

  /** All executed round frames rk_0..rk_c (frame k = dense rank of the
    * first-2^k-token equivalence class — the LCP lifting tables) plus
    * the final rank frame. Convergence at round c (all ranks distinct)
    * implies every 2^k prefix with k ≥ c is also unique, so the
    * missing tail frames could never fire a lift — the lifting caller
    * uses exactly the frames that exist. */
  private[graft] def rankRounds(docs: DataFrame)
      : (Seq[DataFrame], DataFrame) = {
    val st = Dedup.persistTracked(stream(docs))
    val maxLen = st.groupBy("doc_id").agg(count(lit(1)).as("_m"))
      .agg(max("_m")).collect()(0).getLong(0)
    require(maxLen <= (1L << Rounds),
      s"longest token stream $maxLen exceeds 2^$Rounds — raise Rounds " +
        "(log2 of the longest document) for this corpus")
    val tokRanks = Ranking.withGlobalRank(
      st.select(col("tok")).distinct(), Seq(col("tok")), "_r")
    var ranks = Dedup.checkpointTracked(
      st.join(tokRanks, Seq("tok"))
        .select(col("doc_id"), col("widx"), col("_r").as("r")))
    val frames = scala.collection.mutable.ArrayBuffer(ranks)
    val total = st.count()
    var step = 1L
    var converged = false
    for (_ <- 1 to Rounds if !converged) {
      val shifted = ranks.select(col("doc_id"),
        (col("widx") - step).as("widx"), col("r").as("_r2"))
      val paired = ranks.join(shifted, Seq("doc_id", "widx"), "left")
        .select(col("doc_id"), col("widx"), col("r").as("_r1"),
          coalesce(col("_r2"), lit(0L)).as("_r2"))
      val pairRanks = Ranking.withGlobalRank(
        paired.select("_r1", "_r2").distinct(),
        Seq(col("_r1"), col("_r2")), "_nr")
      ranks = Dedup.checkpointTracked(
        paired.join(pairRanks, Seq("_r1", "_r2"))
          .select(col("doc_id"), col("widx"), col("_nr").as("r")))
      frames += ranks
      // early stop: dense ranks are 1..max, so max == N ⇔ all ranks
      // distinct ⇔ the suffix order is fully resolved — every further
      // round is the provable no-op the fixed-Rounds contract relies
      // on, so skipping them cannot change a row (one cheap agg per
      // round on the checkpointed frame buys back the tail rounds)
      converged = ranks.agg(max("r")).collect()(0).getLong(0) == total
      step *= 2
    }
    (frames.toSeq, ranks)
  }

  /** ExactSubstr's payoff query (Lee et al. 2022 §4): repeated token
    * sequences surface as RANK-ADJACENT suffixes with a long common
    * prefix. Adjacency comes from the final ranks (pair r with r+1),
    * and each pair's LCP is computed by binary lifting over the kept
    * round frames — from the widest executed prefix class down, if
    * both positions (advanced by the LCP so far) sit in the same
    * 2^k-prefix class, the common prefix extends by 2^k. O(log) joins
    * per pair, all equi-keyed (doc_id, position) — pairs are
    * corpus-token-sized, never quadratic (the suffix array is exactly
    * the structure that makes all-pairs comparison unnecessary).
    * Returns (lcp, adoc, awidx, bdoc, bwidx) for pairs with
    * lcp ≥ minLcp. */
  def repeatedSeqPairs(docs: DataFrame, minLcp: Long = 3L): DataFrame = {
    val (frames, fin) = rankRounds(docs)
    val a = fin.select(col("doc_id").as("adoc"), col("widx").as("awidx"),
      col("r"))
    val b = fin.select(col("doc_id").as("bdoc"), col("widx").as("bwidx"),
      (col("r") - 1L).as("r"))
    var p = a.join(b, "r")
      .select(col("adoc"), col("awidx"), col("bdoc"), col("bwidx"))
      .withColumn("lcp", lit(0L))
    for (k <- (frames.size - 2) to 0 by -1) {
      val step = 1L << k
      val ra = frames(k).select(col("doc_id").as("_ad"),
        col("widx").as("_aw"), col("r").as("_ra"))
      val rb = frames(k).select(col("doc_id").as("_bd"),
        col("widx").as("_bw"), col("r").as("_rb"))
      p = Dedup.checkpointTracked(p
        .withColumn("_ak", col("awidx") + col("lcp"))
        .withColumn("_bk", col("bwidx") + col("lcp"))
        .join(ra, col("adoc") === col("_ad") && col("_ak") === col("_aw"),
          "left")
        .join(rb, col("bdoc") === col("_bd") && col("_bk") === col("_bw"),
          "left")
        .withColumn("lcp",
          when(col("_ra").isNotNull && col("_rb").isNotNull &&
            col("_ra") === col("_rb"), col("lcp") + step)
            .otherwise(col("lcp")))
        .select(col("adoc"), col("awidx"), col("bdoc"), col("bwidx"),
          col("lcp")))
    }
    p.where(col("lcp") >= minLcp)
  }
}
