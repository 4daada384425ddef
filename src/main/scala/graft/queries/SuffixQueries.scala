package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{SuffixArray, SuffixIndex, TextAnalysis}

/** Suffix-array queries, with the ENTIRE prefix-doubling construction
  * replayed inside the DuckDB oracle: the token+sentinel stream, the
  * initial token dense-rank, and [[graft.ops.SuffixArray.oracleDepth]]
  * doubling rounds (each an unrolled self-join + dense_rank stage) —
  * integer ranks end-to-end, so the replay is exact. r15: the oracle
  * depth is the round count the ENGINE measured for this corpus
  * (`SuffixArray.lastRounds`, recorded by the build that Verify runs
  * before dumping oracle SQL — every oracle here is a `def` evaluated
  * at dump time), with the old fixed 9 only as a cold-process
  * fallback; a >511-token testdata doc can no longer leave the
  * replay short. The engine's
  * distinct-pair + distributed-row-number rank equals dense_rank by
  * construction (distinct rows), pinned here by the driver hash.
  *
  * Cost model (r14): `tx_suffix_build` is the CONSTRUCTION line — it
  * always rebuilds the [[graft.ops.SuffixIndex]] artifact (doubling
  * rounds + LCP lift + save) and emits the convergence curve. The
  * other four rows CONSUME the saved index (leaf scans over the rank /
  * pair frames, fingerprint-revalidated per call, built on miss) —
  * the production shape at 100 TB, where the index is built once per
  * corpus release and queried many times. The oracle replay makes the
  * artifact path verifiable end-to-end: a wrong byte in the saved
  * index breaks the same driver hashes that pinned the in-memory
  * construction. */
object SuffixQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** tx_suffix_build: force-rebuild the suffix index artifact and
    * emit the convergence curve — (round, distinct prefix-class
    * count, corpus positions); `n_classes` hits `n_pos` exactly at
    * the convergence round, and the DuckDB replay derives the same
    * curve (rounds whose PREDECESSOR had already converged are
    * filtered — the engine never executes them). */
  def suffixBuild(spark: SparkSession, dir: String): DataFrame =
    SuffixIndex.rebuild(spark, dir)
      .transform(QueryUtil.ordered("round"))

  /** tx_suffix_ranks: the full rank table verified through the
    * tx_bpe_ids BOUNDED-digest contract (the rank frame is
    * corpus-token-sized; materializing it in total order would be the
    * single-partition result sort): per doc, position count, an
    * order-insensitive bit-XOR digest of md5-low64 over
    * (doc_id, widx, rank), and the first 8 ranks in stream order —
    * one flipped rank anywhere still breaks the hash. */
  def suffixRanks(spark: SparkSession, dir: String): DataFrame =
    SuffixIndex.loadOrBuild(spark, dir).ranks
      .withColumn("_fp", TextAnalysis.md5Low64(
        concat_ws("|", col("doc_id").cast("string"),
          col("widx").cast("string"), col("r").cast("string"))))
      .withColumn("_t", struct(col("widx"), col("r")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        expr("bit_xor(_fp)").as("ranks_hash"),
        concat_ws(",", transform(
          slice(array_sort(collect_list(col("_t"))), 1, 8),
          t => t.getField("r").cast("string"))).as("head_ranks"))
      .transform(QueryUtil.ordered("doc_id"))

  /** tx_suffix_top: the first 20 suffix-array entries over REAL token
    * positions (sentinels excluded) with their 3-token prefixes — the
    * human-readable head of the index. */
  def suffixTop(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val meta = d.select(col("doc_id"),
      split(col("text"), " ").as("_l"),
      size(split(col("text"), " ")).cast("long").as("_m"))
    SuffixIndex.loadOrBuild(spark, dir).ranks
      .join(meta, Seq("doc_id"))
      .where(col("widx") < col("_m"))
      .orderBy(col("r")).limit(20)
      .select(col("r").as("suffix_rank"), col("doc_id"), col("widx"),
        concat_ws(" ",
          slice(col("_l"), (col("widx") + 1).cast("int"), lit(3)))
          .as("prefix3"))
      .transform(QueryUtil.ordered("suffix_rank"))
  }

  /** tx_repeated_seqs: the ExactSubstr payoff — the 20 longest
    * repeated token sequences in the corpus (rank-adjacent suffix
    * pairs with LCP ≥ 3, LCP by binary lifting —
    * [[graft.ops.SuffixArray.repeatedSeqPairs]]), each with the first
    * six repeated tokens. The planted exact-duplicate documents make
    * the top of this list full-document repeats at every SF. */
  def repeatedSeqs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val meta = d.select(col("doc_id").as("adoc"),
      split(col("text"), " ").as("_l"))
    SuffixIndex.loadOrBuild(spark, dir).pairs
      .where(col("lcp") >= 3L)
      .orderBy(col("lcp").desc, col("adoc"), col("awidx"),
        col("bdoc"), col("bwidx"))
      .limit(20)
      .join(meta, Seq("adoc"))
      .select(col("lcp"), col("adoc"), col("awidx"), col("bdoc"),
        col("bwidx"),
        concat_ws(" ", slice(col("_l"), (col("awidx") + 1).cast("int"),
          least(col("lcp"), lit(6L)).cast("int"))).as("rep6"))
      .transform(QueryUtil.orderedBy(col("lcp").desc, col("adoc"),
        col("awidx"), col("bdoc"), col("bwidx")))
  }

  /** Repeat length (tokens) above which [[suffixCut]] removes a
    * covered span — Lee et al. use 50 BPE tokens at crawl scale; 8
    * keeps the planted duplicate structure observable at sf0.001. */
  val MinRepeat = 8L

  /** tx_suffix_cut: ExactSubstr REMOVAL over the saved index
    * ([[graft.ops.SuffixArray.repeatCut]]) — every token position
    * covered by a ≥ [[MinRepeat]]-token repeated sequence is dropped,
    * per-doc kept/cut counts + cleaned-text digest returned. The
    * artifact's payoff query: at 100 TB the index is built once and
    * THIS is the pass that writes the deduplicated corpus. */
  def suffixCut(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SuffixArray.repeatCut(docs(spark, dir),
        SuffixIndex.loadOrBuild(spark, dir).pairs, MinRepeat)
      .transform(QueryUtil.ordered("doc_id"))

  /** tx_lcp_profile: the duplication-depth histogram — how many
    * rank-adjacent suffix pairs share a prefix of each length (the
    * dataset-card view of "how much n-token duplication exists at
    * every n"; ExactSubstr thresholds are chosen off exactly this
    * curve). Bounded output: ≤ maxDocLen rows. */
  def lcpProfile(spark: SparkSession, dir: String): DataFrame =
    SuffixIndex.loadOrBuild(spark, dir).pairs
      .where(col("lcp") >= 1L)
      .groupBy("lcp").agg(count(lit(1)).as("n_pairs"))
      .transform(QueryUtil.ordered("lcp"))

  // ---------------------------------------------------------------- oracle

  /** The unrolled prefix-doubling chain ending in `rk{Rounds}`. */
  private def chain: String = {
    val sb = new StringBuilder(
      s"""toks AS MATERIALIZED (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS widx, l[i] AS tok
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l
         |        FROM documents) t,
         |       LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) g
         |  UNION ALL
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT),
         |    chr(1) || CAST(doc_id AS VARCHAR)
         |  FROM documents),
         |rk0 AS MATERIALIZED (SELECT doc_id, widx,
         |  CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS r
         |  FROM toks)""".stripMargin)
    for (k <- 1 to SuffixArray.oracleDepth) {
      val step = 1L << (k - 1)
      sb ++= s""",
         |p$k AS MATERIALIZED (SELECT a.doc_id, a.widx, a.r AS r1,
         |    coalesce(b.r, 0) AS r2
         |  FROM rk${k - 1} a LEFT JOIN rk${k - 1} b
         |    ON b.doc_id = a.doc_id AND b.widx = a.widx + $step),
         |rk$k AS MATERIALIZED (SELECT doc_id, widx,
         |  CAST(dense_rank() OVER (ORDER BY r1, r2) AS BIGINT) AS r
         |  FROM p$k)""".stripMargin
    }
    sb.toString
  }

  private def finalRk = s"rk${SuffixArray.oracleDepth}"

  /** Convergence-curve replay: per-round distinct-class counts (max of
    * a dense rank), keeping round 0 plus every round whose PREDECESSOR
    * had not yet converged — exactly the rounds the engine executes
    * (its early stop fires the first time max rank = N, and its
    * derived round cap ceil(log2 maxLen) guarantees convergence by the
    * last executed round). */
  def suffixBuildOracle: String = {
    val tot = "(SELECT CAST(count(*) AS BIGINT) FROM toks)"
    val branches = (0 to SuffixArray.oracleDepth).map { k =>
      val head =
        s"""SELECT CAST($k AS BIGINT) AS round,
           |    (SELECT max(r) FROM rk$k) AS n_classes,
           |    $tot AS n_pos""".stripMargin
      if (k == 0) head
      else head + s"\n  WHERE (SELECT max(r) FROM rk${k - 1}) < $tot"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $chain
       |SELECT round, n_classes, n_pos FROM (
       |  $branches
       |) ORDER BY round""".stripMargin
  }

  def suffixRanksOracle: String =
    s"""WITH $chain,
       |fp AS (SELECT doc_id, widx, r,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
       |      CAST(widx AS VARCHAR) || '|' || CAST(r AS VARCHAR)), 1, 16))
       |      ::UBIGINT AS h
       |  FROM $finalRk),
       |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
       |    bit_xor(h) AS h,
       |    array_to_string((list(r ORDER BY widx))[1:8], ',') AS head_ranks
       |  FROM fp GROUP BY doc_id)
       |SELECT doc_id, n_pos,
       |  CAST(h::HUGEINT - CASE WHEN h >= 9223372036854775808::UBIGINT
       |    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
       |    AS ranks_hash,
       |  head_ranks
       |FROM g ORDER BY doc_id""".stripMargin

  def suffixTopOracle: String =
    s"""WITH $chain,
       |meta AS (SELECT doc_id, string_split(text, ' ') AS l,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS m
       |  FROM documents),
       |top AS (SELECT k.r AS suffix_rank, k.doc_id, k.widx,
       |    array_to_string(meta.l[k.widx + 1:k.widx + 3], ' ') AS prefix3
       |  FROM $finalRk k JOIN meta USING (doc_id)
       |  WHERE k.widx < meta.m
       |  ORDER BY k.r LIMIT 20)
       |SELECT suffix_rank, doc_id, widx, prefix3 FROM top
       |ORDER BY suffix_rank""".stripMargin

  /** Construction + adjacency + LCP lifting stages k = Rounds−1 … 0
    * (ends in `l0`, one row per rank-adjacent pair with its LCP) —
    * the oracle always lifts through every rk_k (a stage where no
    * equality fires is a no-op, which is also why the engine's
    * early-stopped frame list computes the same LCPs). ONE builder
    * behind both LCP oracles so the lifting cannot fork. */
  private def liftedChain: String = {
    val lifts = ((SuffixArray.oracleDepth - 1) to 0 by -1).map { k =>
      val step = 1L << k
      val prev = if (k == SuffixArray.oracleDepth - 1) "adj" else s"l${k + 1}"
      s"""l$k AS MATERIALIZED (SELECT p.adoc, p.awidx, p.bdoc, p.bwidx,
         |    CASE WHEN ra.r IS NOT NULL AND rb.r IS NOT NULL
         |           AND ra.r = rb.r
         |         THEN p.lcp + $step ELSE p.lcp END AS lcp
         |  FROM $prev p
         |  LEFT JOIN rk$k ra
         |    ON ra.doc_id = p.adoc AND ra.widx = p.awidx + p.lcp
         |  LEFT JOIN rk$k rb
         |    ON rb.doc_id = p.bdoc AND rb.widx = p.bwidx + p.lcp)"""
        .stripMargin
    }.mkString(",\n")
    s"""$chain,
       |adj AS MATERIALIZED (SELECT a.doc_id AS adoc, a.widx AS awidx,
       |    b.doc_id AS bdoc, b.widx AS bwidx, CAST(0 AS BIGINT) AS lcp
       |  FROM $finalRk a JOIN $finalRk b ON b.r = a.r + 1),
       |$lifts""".stripMargin
  }

  def repeatedSeqsOracle: String =
    s"""WITH $liftedChain,
       |meta AS (SELECT doc_id AS adoc, string_split(text, ' ') AS l
       |  FROM documents),
       |top AS (SELECT lcp, adoc, awidx, bdoc, bwidx FROM l0
       |  WHERE lcp >= 3
       |  ORDER BY lcp DESC, adoc, awidx, bdoc, bwidx LIMIT 20)
       |SELECT t.lcp, t.adoc, t.awidx, t.bdoc, t.bwidx,
       |  array_to_string(m.l[t.awidx + 1:t.awidx + least(t.lcp, 6)], ' ')
       |    AS rep6
       |FROM top t JOIN meta m USING (adoc)
       |ORDER BY t.lcp DESC, t.adoc, t.awidx, t.bdoc, t.bwidx""".stripMargin

  def lcpProfileOracle: String =
    s"""WITH $liftedChain
       |SELECT lcp, CAST(count(*) AS BIGINT) AS n_pairs FROM l0
       |WHERE lcp >= 1 GROUP BY lcp ORDER BY lcp""".stripMargin

  /** Coverage replay: both sides of every ≥ MinRepeat pair explode to
    * covered positions, distinct, anti-join the token stream,
    * ordered reassembly + digest. */
  def suffixCutOracle: String =
    s"""WITH $liftedChain,
       |mk AS (SELECT adoc AS doc_id, awidx AS s, lcp FROM l0
       |    WHERE lcp >= $MinRepeat
       |  UNION ALL
       |  SELECT bdoc, bwidx, lcp FROM l0 WHERE lcp >= $MinRepeat),
       |cov AS (SELECT DISTINCT doc_id, s + i AS widx
       |  FROM mk, LATERAL (SELECT unnest(range(0, lcp)) AS i) g),
       |tk AS (SELECT doc_id, string_split(text, ' ') AS w
       |  FROM documents),
       |tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS widx, w[i] AS tok
       |  FROM tk, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) g),
       |kept AS (SELECT t.doc_id, t.widx, t.tok FROM tok t
       |  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.widx = t.widx
       |  WHERE c.widx IS NULL),
       |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY widx) AS clean
       |  FROM kept GROUP BY doc_id),
       |b AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT b.doc_id, b.n_tokens,
       |  COALESCE(a.n_kept, 0) AS n_kept,
       |  b.n_tokens - COALESCE(a.n_kept, 0) AS n_cut,
       |  md5(COALESCE(a.clean, '')) AS clean_hash,
       |  array_to_string((string_split(COALESCE(a.clean, ''), ' '))[1:6],
       |    ' ') AS head_clean
       |FROM b LEFT JOIN ag a USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    Map(
      "tx_suffix_build" -> ((suffixBuild _, Some(suffixBuildOracle))),
      "tx_suffix_ranks" -> ((suffixRanks _, Some(suffixRanksOracle))),
      "tx_suffix_top" -> ((suffixTop _, Some(suffixTopOracle))),
      "tx_repeated_seqs" -> ((repeatedSeqs _, Some(repeatedSeqsOracle))),
      "tx_suffix_cut" -> ((suffixCut _, Some(suffixCutOracle))),
      "tx_lcp_profile" -> ((lcpProfile _, Some(lcpProfileOracle))))
}
