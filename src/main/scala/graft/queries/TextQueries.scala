package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Text-analysis + deduplication queries over `documents`. */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Token/char counts + ratios per document. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val tks = TextAnalysis.tokens(col("text"))
    docs(spark, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        round(size(array_distinct(tks)).cast("double") /
          size(tks).cast("double"), 4).as("ttr"),
        round(TextAnalysis.stopwordCount(col("text")).cast("double") /
          size(tks).cast("double"), 4).as("stop_ratio"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  val tokenStatsOracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      |  CAST(length(text) AS INTEGER) AS n_chars,
      |  round(len(list_distinct(string_split(text, ' '))) * 1.0
      |        / len(string_split(text, ' ')), 4) AS ttr,
      |  round(len(list_filter(string_split(text, ' '),
      |          t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0
      |        / len(string_split(text, ' ')), 4) AS stop_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Repetition/boilerplate signals per doc (the Gopher-style gates):
    * duplicate-3-gram occurrence fraction + modal-bigram fraction.
    * Token and n-gram arrays are hoisted into real columns (lambda
    * bodies re-evaluate inline expressions per element). */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .withColumn("_g3", TextAnalysis.ngramsFromTokens(col("_tk"), 3))
      .withColumn("_g2", TextAnalysis.ngramsFromTokens(col("_tk"), 2))
      .select(col("doc_id"),
        TextAnalysis.dupNgramFraction(col("_g3")).as("dup3_frac"),
        TextAnalysis.topNgramFraction(col("_g2")).as("top2_frac"))
      .transform(QueryUtil.ordered("doc_id"))

  val repetitionOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        CASE WHEN len(w) >= 3
      |             THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
      |             ELSE [] END AS g3,
      |        CASE WHEN len(w) >= 2
      |             THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
      |             ELSE [] END AS g2
      |      FROM t)
      |SELECT doc_id,
      |  CASE WHEN len(g3) > 0
      |       THEN round((len(g3) - len(list_distinct(g3))) * 1.0 / len(g3), 4)
      |       ELSE 0.0 END AS dup3_frac,
      |  CASE WHEN len(g2) > 0
      |       THEN round(list_max(list_transform(list_distinct(g2),
      |              x -> len(list_filter(g2, y -> y = x)))) * 1.0 / len(g2), 4)
      |       ELSE 0.0 END AS top2_frac
      |FROM g ORDER BY doc_id""".stripMargin

  /** In-engine feature-hashing embeddings, sparse form — the DuckDB
    * oracle recomputes the full pipeline (md5-low64 token hash, signed
    * buckets, L2 normalization) from scratch. */
  def hashEmbed(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashEmbedSparse(docs(spark, dir))
      .transform(QueryUtil.ordered("doc_id", "b"))

  val hashEmbedOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h
      |       FROM tok),
      |w AS (SELECT doc_id, CAST(h % 64 AS BIGINT) AS b,
      |        sum(CASE WHEN (h >> 62) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS w
      |      FROM th GROUP BY 1, 2),
      |n AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1)
      |SELECT w.doc_id AS doc_id, b,
      |  round(CASE WHEN nrm > 0 THEN w / nrm ELSE 0 END, 4) AS v
      |FROM w JOIN n ON w.doc_id = n.doc_id
      |ORDER BY w.doc_id, b""".stripMargin

  /** Quality score (formula mirrored exactly by the oracle). */
  def quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .transform(QueryUtil.ordered("doc_id"))

  val qualityOracle: String =
    """WITH s AS (SELECT doc_id,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents)
      |SELECT doc_id,
      |  round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4)
      |    AS quality
      |FROM s ORDER BY doc_id""".stripMargin

  /** Marker-based language-ID distribution. */
  def langDist(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(TextAnalysis.langId(col("text")).as("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .transform(QueryUtil.ordered("lang_pred"))

  val langDistOracle: String =
    """WITH s AS (SELECT
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','is'))) AS e,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist'))) AS d,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('le','la','les','et','est'))) AS f,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp
      |  FROM documents)
      |SELECT CASE WHEN e > 0 AND e >= greatest(e, d, f, sp) THEN 'en'
      |            WHEN d > 0 AND d >= greatest(d, f, sp) THEN 'de'
      |            WHEN f > 0 AND f >= greatest(f, sp) THEN 'fr'
      |            WHEN sp > 0 THEN 'es'
      |            ELSE 'und' END AS lang_pred, count(*) AS n
      |FROM s GROUP BY 1 ORDER BY lang_pred""".stripMargin

  // --- Trained language ID (r12) --------------------------------------
  // See [[graft.ops.TextAnalysis.trainLid]]: hashed char-trigram
  // logistic heads, one per language, trained in-engine by 3
  // deterministic full-batch GD epochs on the corpus's planted `lang`
  // labels. The oracle replays the ENTIRE run — char-gram featurize,
  // every epoch of every head, 4dp scores, the alphabetical-tie-break
  // argmax — as one generated CTE chain, so the trained LID model
  // itself is exact-checked. The marker heuristic above stays as the
  // documented zero-training fallback (`tx_lang_dist`).

  private[queries] val LidBuckets = 1024
  private[queries] val LidIters = 3
  private[queries] val LidLr = 2.0
  private[queries] val LidN = 3

  /** Training + scoring replay over `src` (any relation with doc_id,
    * lang, text), parameterized by the SAME constants the engine
    * trains under; ends at `lpred(doc_id, score_<k>..., lang_pred,
    * lid_score)`. Shared by `tx_langid`, `tx_lang_confusion` and the
    * curation14 chain so the replay cannot fork. */
  private def lidTrainChainSql(src: String): String = {
    val (nb, lr, iters, n) = (LidBuckets, LidLr, LidIters, LidN)
    val classes = TextAnalysis.LidClasses
    val clsList = classes.map(c => s"'$c'").mkString("[", ", ", "]")
    def sig(m: String) =
      s"1.0/(1.0 + exp(-CAST(CAST($m AS DECIMAL(38,12)) AS DOUBLE)))"
    val head =
      s"""lcg AS (SELECT doc_id, lang,
         |    CASE WHEN length(text) >= $n THEN (length(text) - ${n - 1}) * 1.0
         |         ELSE 1.0 END AS n,
         |    unnest(CASE WHEN length(text) >= $n
         |      THEN list_transform(range(1, length(text) - ${n - 2}),
         |             i -> substr(text, i, $n))
         |      ELSE [text] END) AS t
         |  FROM $src),
         |lf0 AS (SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT % $nb AS BIGINT) AS b,
         |    count(*) * 1.0 / n AS x FROM lcg GROUP BY doc_id, lang, n, b),
         |lfeat AS (SELECT * FROM lf0
         |  UNION ALL SELECT DISTINCT doc_id, lang, -1 AS b, 1.0 AS x FROM lf0),
         |lcls AS (SELECT unnest($clsList) AS k),
         |lfk AS (SELECT f.doc_id, f.b, f.x, c.k,
         |         CASE WHEN f.lang = c.k THEN 1.0 ELSE 0.0 END AS y
         |       FROM lfeat f CROSS JOIN lcls c),
         |lnd AS (SELECT count(*) * 1.0 AS n FROM $src),
         |lm1 AS (SELECT DISTINCT doc_id, k, y, 0.0 AS m FROM lfk),
         |lr1 AS (SELECT doc_id, k, y - ${sig("m")} AS r FROM lm1),
         |lw1 AS (SELECT f.b, f.k,
         |         $lr * CAST(sum(CAST(f.x * r.r AS DECIMAL(38,12)))
         |           AS DOUBLE) / (SELECT n FROM lnd) AS w
         |       FROM lfk f JOIN lr1 r USING (doc_id, k) GROUP BY f.b, f.k)"""
        .stripMargin
    val steps = (2 to iters).map { t =>
      s"""lm$t AS (SELECT f.doc_id, f.k, min(f.y) AS y,
         |         coalesce(sum(f.x * w.w), 0.0) AS m
         |       FROM lfk f LEFT JOIN lw${t - 1} w ON f.b = w.b AND f.k = w.k
         |       GROUP BY f.doc_id, f.k),
         |lr$t AS (SELECT doc_id, k, y - ${sig("m")} AS r FROM lm$t),
         |lw$t AS (SELECT g.b, g.k, coalesce(w.w, 0.0) + g.u AS w
         |       FROM (SELECT f.b, f.k,
         |               $lr * CAST(sum(CAST(f.x * r.r AS DECIMAL(38,12)))
         |                 AS DOUBLE) / (SELECT n FROM lnd) AS u
         |             FROM lfk f JOIN lr$t r USING (doc_id, k)
         |             GROUP BY f.b, f.k) g
         |       LEFT JOIN lw${t - 1} w ON g.b = w.b AND g.k = w.k)"""
        .stripMargin
    }
    val pivCols = classes.map(k =>
      s"max(CASE WHEN k = '$k' THEN s END) AS score_$k").mkString(",\n  ")
    val scoreCols = classes.map(k => s"score_$k").mkString(", ")
    val predExpr = classes.map(k =>
      s"WHEN score_$k >= greatest($scoreCols) THEN '$k'")
      .mkString("CASE ", " ", " END")
    val tail =
      s"""lmf AS (SELECT f.doc_id, f.k, coalesce(sum(f.x * w.w), 0.0) AS m
         |       FROM lfk f LEFT JOIN lw$iters w ON f.b = w.b AND f.k = w.k
         |       GROUP BY f.doc_id, f.k),
         |lsc AS (SELECT doc_id, k, round(${sig("m")}, 4) AS s FROM lmf),
         |lpiv AS (SELECT doc_id,
         |  $pivCols
         |  FROM lsc GROUP BY doc_id),
         |lpred AS (SELECT doc_id, $scoreCols,
         |  $predExpr AS lang_pred,
         |  greatest($scoreCols) AS lid_score FROM lpiv)""".stripMargin
    (Seq(head) ++ steps :+ tail).mkString(",\n")
  }

  /** tx_langid — per-doc trained-LID prediction: the 5 head scores,
    * the argmax language, and its score, with the whole training run
    * oracle-replayed. */
  def langIdTrained(spark: SparkSession, dir: String): DataFrame = {
    // spread the per-row CPU-heavy featurize/epoch scans (char-gram
    // explode + margin sums) across cores; partitioning-invariant
    // under the DECIMAL-rounded gradients and margins
    val d = QueryUtil.spreadById(docs(spark, dir))
    val (feat, model) = TextAnalysis.lidCore(d, TextAnalysis.LidClasses,
      LidBuckets, LidIters, LidLr, LidN, "doc_id", "text", "lang")
    // r15: the LID family's BUILD line — the weights just trained
    // are saved as the lid_docs artifact (tx_langid_confusion and
    // curation14's language gate consume them frozen)
    CurationArtifacts.lidSave(spark, dir, model)
    TextAnalysis.lidScoredFrom(feat, model)
      .transform(QueryUtil.ordered("doc_id"))
  }

  val langIdTrainedOracle: String =
    s"""WITH ${lidTrainChainSql("documents")}
       |SELECT * FROM lpred ORDER BY doc_id""".stripMargin

  /** Language-ID confusion matrix: TRAINED-LID prediction vs planted
    * label, per-cell counts — the honest evaluation of the trained
    * model (the synthetic corpus shares one vocabulary across labels,
    * so off-diagonal mass ≈ class priors by construction; the matrix
    * verifies the model, the disclosure explains the accuracy). */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    // r15: frozen lid_docs artifact — one featurize+score sweep, no
    // gradient epochs (oracle unchanged: full training replay)
    val d = QueryUtil.spreadById(docs(spark, dir))
    val model = CurationArtifacts.lid(spark, dir)
    val preds = TextAnalysis.scoreWithLidModel(d, model)
      .select(col("doc_id"), col("lang_pred"))
    d.select(col("doc_id"), col("lang")).join(preds, Seq("doc_id"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .transform(QueryUtil.ordered("lang", "lang_pred"))
  }

  val langConfusionOracle: String =
    s"""WITH ${lidTrainChainSql("documents")}
       |SELECT d.lang, p.lang_pred, count(*) AS n
       |FROM documents d JOIN lpred p USING (doc_id)
       |GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin

  /** Content fingerprints (exact-dedup keys). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
        TextAnalysis.md5Fingerprint(col("text")).as("fp"),
        TextAnalysis.normalizedFingerprint(col("text")).as("fp_norm"))
      .transform(QueryUtil.ordered("doc_id"))

  val fingerprintsOracle: String =
    """SELECT doc_id, md5(text) AS fp,
      |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_norm
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-ish token counts (LLM token budgeting). DuckDB's
    * regexp_extract_all mirrors the same pre-tokenization regex. */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
        size(TextAnalysis.bpeishTokens(col("text"))).as("n_bpe_tokens"))
      .transform(QueryUtil.ordered("doc_id"))

  val bpeTokensOracle: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+')) AS INTEGER)
      |    AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Exact-dedup canonical keeper: min doc id per content hash. */
  def exactKeeper(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(spark, dir))
      .select(col("fp"), col("keep_id"), col("n_copies"))
      .transform(QueryUtil.ordered("fp"))

  val exactKeeperOracle: String =
    """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin

  /** Exact dedup profile per source. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct"))
      .transform(QueryUtil.ordered("source"))

  val exactDedupOracle: String =
    """SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_distinct
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Exact 5-gram-shingle Jaccard near-dup pairs (>= 0.5). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(spark, dir), threshold = 0.5)
      .transform(QueryUtil.ordered("da", "db"))

  val ngramJaccardOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         list_transform(range(1, greatest(len(w) - 3, 1)),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])))
      |         AS s
      |       FROM t WHERE len(w) >= 5),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT da, db, round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
      |FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
      |WHERE c * 1.0 / (x.n + y.n - c) >= 0.5 ORDER BY da, db""".stripMargin

  /** MinHash+LSH near-dup pairs (>= 0.8) with exact verification — the
    * oracle is the exact-Jaccard computation at the same threshold
    * (banding: P[miss | s >= 0.8] ≈ 2e-4, see Dedup.minhashLshPairs). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(docs(spark, dir), threshold = 0.8)
      .transform(QueryUtil.ordered("da", "db"))

  val minhashLshOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         list_transform(range(1, greatest(len(w) - 3, 1)),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])))
      |         AS s
      |       FROM t WHERE len(w) >= 5),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT da, db, round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
      |FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
      |WHERE c * 1.0 / (x.n + y.n - c) >= 0.8 ORDER BY da, db""".stripMargin

  /** SimHash near-dup pairs. Full SQL oracle: the token hash is
    * md5-low64 (see [[graft.ops.Dedup.simhashFrame]]), so DuckDB
    * recomputes the exact simhash per doc and brute-forces all pairs
    * with hamming <= 8 — and the chunk-bucket candidate generation has
    * exact recall by pigeonhole, so the sets must match exactly. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(spark, dir), maxHamming = 8)
      .transform(QueryUtil.ordered("da", "db"))

  val simhashOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |th AS (SELECT doc_id,
      |         ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok),
      |bits AS (SELECT doc_id, i,
      |           CASE WHEN sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) > 0
      |                THEN 1 ELSE 0 END AS b
      |         FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
      |         GROUP BY doc_id, i),
      |sh AS (SELECT doc_id, list(b ORDER BY i) AS bv FROM bits GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
      |            CAST(len(list_filter(range(1, 65), j -> a.bv[j] != b.bv[j]))
      |              AS INTEGER) AS hamming
      |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT da, db, hamming FROM pairs WHERE hamming <= 8
      |ORDER BY da, db""".stripMargin

  /** Near-dup clusters: connected components over the 0.5-Jaccard pair
    * graph — (doc, component) where component = min reachable doc id.
    * Oracle: DuckDB recursive CTE over the SAME pair SQL (exact
    * transitive closure; fixture clusters are tiny). */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs(spark, dir), threshold = 0.5))
      .transform(QueryUtil.ordered("sid"))

  val dedupClustersOracle: String =
    """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         list_transform(range(1, greatest(len(w) - 3, 1)),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])))
      |         AS s
      |       FROM t WHERE len(w) >= 5),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (SELECT da, db
      |          FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
      |          WHERE c * 1.0 / (x.n + y.n - c) >= 0.5),
      |edges AS (SELECT da AS a, db AS b FROM pairs
      |          UNION ALL SELECT db, da FROM pairs),
      |reach(n, m) AS (SELECT a, a FROM edges
      |                UNION
      |                SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a)
      |SELECT n AS sid, min(m) AS component FROM reach GROUP BY n
      |ORDER BY sid""".stripMargin

  /** Cross-corpus (incremental) near-dup: the fixture split by doc-id
    * parity into "incoming" (odd) vs "history" (even) — every incoming
    * doc within 0.8 Jaccard of a history doc, via the ASYMMETRIC banded
    * MinHash join ([[Dedup.minhashLshAgainst]]: candidates only across
    * the two sides, cost scales with the overlap, not |history|²).
    * Oracle: exact cross-side Jaccard at the same threshold. */
  def crossCorpusMinhash(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.minhashLshAgainst(
        d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0), threshold = 0.8)
      .transform(QueryUtil.ordered("da", "db"))
  }

  val crossCorpusMinhashOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         list_transform(range(1, greatest(len(w) - 3, 1)),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])))
      |         AS s
      |       FROM t WHERE len(w) >= 5),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      |      FROM sh a JOIN sh b ON a.s = b.s
      |      WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
      |      GROUP BY 1, 2)
      |SELECT da, db, round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
      |FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
      |WHERE c * 1.0 / (x.n + y.n - c) >= 0.8
      |ORDER BY da, db""".stripMargin

  /** Benchmark decontamination: every doc sharing an 8-gram with the
    * "benchmark" slice (doc_id % 37 = 0 — stands in for an external
    * eval set) is flagged; benchmark members flag themselves (total
    * self-overlap), near-dups of them flag through shared grams. The
    * corpus is scanned once and never shuffled — the benchmark
    * shingle set broadcasts ([[Dedup.decontaminate]]). */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.decontaminate(d, d.filter(col("doc_id") % 37 === 0), k = 8)
      .transform(QueryUtil.ordered("doc_id"))
  }

  val decontaminateOracle: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 8
      |         THEN list_distinct(list_transform(range(1, len(w) - 6),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
      |             || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))
      |         ELSE [text] END) AS s
      |       FROM t),
      |bs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0),
      |hits AS (SELECT sh.doc_id, count(*) AS n
      |         FROM sh JOIN bs ON sh.s = bs.s GROUP BY 1)
      |SELECT d.doc_id, COALESCE(hits.n, 0) AS n_contaminated,
      |  hits.n IS NULL AS keep
      |FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Seeded-shuffle epoch packing ([[graft.ops.Packing.shuffledPack]]):
    * two independent reproducible permutations of the corpus, each
    * packed into 10k-token shards in permuted order — the
    * training-order artifact a trainer consumes. The oracle replays
    * the permutation (hex-string sort keys order identically in both
    * engines) and the per-epoch prefix sum. */
  def shufflePack(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.shuffledPack(docs(spark, dir), budget = 10000L,
        epochs = 2, seed = "graft-r9", bucketWidth = 64L)
      .transform(QueryUtil.ordered("epoch", "pos"))

  val shufflePackOracle: String =
    """WITH c AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |eh AS (SELECT e, doc_id, n,
      |    substr(md5('graft-r9:' || CAST(e AS VARCHAR) || ':'
      |      || CAST(doc_id AS VARCHAR)), 1, 16) AS hk
      |  FROM c, (SELECT unnest([0, 1]) AS e)),
      |r AS (SELECT e, doc_id, n,
      |    row_number() OVER (PARTITION BY e ORDER BY hk, doc_id) AS pos,
      |    sum(n) OVER (PARTITION BY e ORDER BY hk, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM eh)
      |SELECT CAST(e AS INTEGER) AS epoch, doc_id, CAST(pos AS BIGINT) AS pos,
      |  n AS n_tokens, CAST((cum - n) // 10000 AS BIGINT) AS shard
      |FROM r ORDER BY epoch, pos""".stripMargin

  /** Preference-pair mining — the RLHF/DPO data-construction shape:
    * within each (lang, source, length-bucket) stratum, pair the
    * highest-quality document (chosen) against the lowest (rejected),
    * keeping pairs with a strict quality margin. Bucketing by length
    * keeps pairs length-comparable (the standard control for the
    * length-bias confound in preference data). Scale shape: ONE
    * map-side-combined aggregation — chosen/rejected are min/max of a
    * (quality, doc_id) struct, so a hot stratum reduces per map task;
    * no window, no self-join. Ties break deterministically by doc_id
    * (max → highest id, min → lowest), replayed in the oracle via
    * explicit ORDER BY. */
  def prefPairs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), col("source"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("len_bucket", floor(col("n_tokens") / 50).cast("long"))
      .groupBy("lang", "source", "len_bucket")
      .agg(max(struct(col("q"), col("doc_id"))).as("_c"),
        min(struct(col("q"), col("doc_id"))).as("_r"))
      .filter(col("_c.q") > col("_r.q"))
      .select(col("lang"), col("source"), col("len_bucket"),
        col("_c.doc_id").as("chosen_id"), col("_r.doc_id").as("rejected_id"),
        col("_c.q").as("chosen_q"), col("_r.q").as("rejected_q"),
        round(col("_c.q") - col("_r.q"), 4).as("margin"))
      .transform(QueryUtil.ordered("lang", "source", "len_bucket"))

  val prefPairsOracle: String =
    """WITH s AS (SELECT doc_id, lang, source,
      |    len(string_split(text, ' ')) AS nt,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents),
      |b AS (SELECT doc_id, lang, source,
      |    CAST(floor(nt / 50.0) AS BIGINT) AS len_bucket,
      |    round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4
      |      + (1.0 - st / n) * 0.2, 4) AS q
      |  FROM s),
      |c AS (SELECT lang, source, len_bucket, doc_id, q, row_number() OVER (
      |    PARTITION BY lang, source, len_bucket
      |    ORDER BY q DESC, doc_id DESC) AS rn FROM b),
      |r AS (SELECT lang, source, len_bucket, doc_id, q, row_number() OVER (
      |    PARTITION BY lang, source, len_bucket
      |    ORDER BY q ASC, doc_id ASC) AS rn FROM b)
      |SELECT c.lang, c.source, c.len_bucket,
      |  c.doc_id AS chosen_id, r.doc_id AS rejected_id,
      |  c.q AS chosen_q, r.q AS rejected_q, round(c.q - r.q, 4) AS margin
      |FROM c JOIN r ON c.lang = r.lang AND c.source = r.source
      |  AND c.len_bucket = r.len_bucket
      |WHERE c.rn = 1 AND r.rn = 1 AND c.q > r.q
      |ORDER BY c.lang, c.source, c.len_bucket""".stripMargin

  /** Per-language distinct 5-gram-shingle count via the HyperLogLog
    * sketch ([[graft.ops.Sketch]]) — the capacity-planning statistic
    * behind every shingle-keyed dedup index ("how many distinct
    * shingles will MinHash/LSH hold"), computed without shuffling a
    * single shingle: map tasks reduce to ≤ 512 (bucket, max-rho)
    * integers per language. p=9 puts every language in the raw-HLL
    * regime at all three SFs (3–100k distinct vs the 1280 linear-
    * counting ceiling). The oracle replays the sketch exactly (md5
    * buckets, bin()-derived rho, DECIMAL indicator sum), so the
    * approximate answer is still hash-checked to the last digit. */
  def distinctHll(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sketch.hllDistinct(
        docs(spark, dir)
          .withColumn("_tk", TextAnalysis.tokens(col("text")))
          .select(col("lang"),
            explode(TextAnalysis.ngramsFromTokens(col("_tk"), 5)).as("v")),
        Seq("lang"), "v", p = 9)
      .transform(QueryUtil.ordered("lang"))

  val distinctHllOracle: String =
    """WITH t AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
      |tok AS (SELECT lang, unnest(CASE WHEN len(w) >= 5
      |          THEN list_transform(range(1, len(w) - 3),
      |                 i -> array_to_string(w[i:i+4], ' '))
      |          ELSE [] END) AS v
      |        FROM t),
      |""".stripMargin +
      graft.ops.Sketch.hllOracleSql("tok", "lang", 9) +
      "\nORDER BY lang"

  /** Deterministic weighted sampling (Efraimidis–Spirakis A-ES):
    * sample k docs with probability proportional to quality — the
    * "sample by weight, reproducibly" mixing primitive. Key =
    * u^(1/w) with u a content-independent unit hash of the id
    * ([[graft.ops.Sampling.unitHash]] shifted into (0,1]) and w the
    * quality score floored at 1e-4; top-k by key. No RNG: the sample
    * is identical across runs, engines and partitionings. Keys are
    * ROUNDED to 12 dp before ordering so an ulp-level pow()
    * divergence collapses into the deterministic id tie-break instead
    * of flipping the cut. Scale shape: scan-fused key + global top-k
    * via TakeOrderedAndProject (per-partition partial top-k, then one
    * k-row merge — never a global sort). */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = graft.ops.Sampling.unitHashClosed(col("doc_id"))
    val w = greatest(TextAnalysis.qualityScore(col("text")), lit(0.0001))
    docs(spark, dir)
      .select(col("doc_id"), w.as("q"),
        round(pow(u, lit(1.0) / w), 12).as("key"))
      .orderBy(col("key").desc, col("doc_id")).limit(100)
      .transform(QueryUtil.ordered("doc_id"))
  }

  val weightedSampleOracle: String =
    """WITH s AS (SELECT doc_id,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents),
      |k AS (SELECT doc_id,
      |    greatest(round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4
      |      + (1.0 - st / n) * 0.2, 4), 0.0001) AS q,
      |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1)
      |      / 4294967296.0 AS u
      |  FROM s)
      |SELECT doc_id, q, round(pow(u, 1.0 / q), 12) AS key
      |FROM k ORDER BY key DESC, doc_id LIMIT 100""".stripMargin

  /** PMI collocation mining — the phrase-discovery pass behind
    * tokenizer-vocabulary and merge-rule construction: pointwise
    * mutual information log(p(ab) / (p(a)·p(b))) over corpus bigram
    * and unigram counts, min-count floored (singleton "collocations"
    * are noise), top-k by ROUNDED pmi with a bigram tie-break so the
    * cut is deterministic cross-engine (ordering by the raw double
    * could flip ulp-adjacent ties). Scale shape: two count aggs + two
    * equi-joins on the token key (AQE-splittable; the totals ride as
    * one-row broadcast scalars), top-k via TakeOrderedAndProject. */
  def pmi(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
    // ONE corpus scan per grain: the totals derive from the
    // vocabulary-sized count frames (persisted — each feeds both its
    // total and the join), never from a second tokenize pass
    val toks = graft.ops.Dedup.persistTracked(
      d.select(explode(col("_tk")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c")))
    val tokTotal = toks.agg(sum(col("c")).as("nt"))
    val bisAll = graft.ops.Dedup.persistTracked(
      d.select(explode(
          TextAnalysis.ngramsFromTokens(col("_tk"), 2)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("cab")))
    val bis = bisAll.filter(col("cab") >= 5)
    val biTotal = bisAll.agg(sum(col("cab")).as("nb"))
    val split = bis
      .withColumn("a", substring_index(col("b"), " ", 1))
      .withColumn("z", substring_index(col("b"), " ", -1))
    split
      .join(toks.select(col("t").as("a"), col("c").as("ca")), Seq("a"))
      .join(toks.select(col("t").as("z"), col("c").as("cz")), Seq("z"))
      .crossJoin(broadcast(tokTotal)).crossJoin(broadcast(biTotal))
      .select(col("b").as("bigram"), col("cab"),
        round(log((col("cab").cast("double") / col("nb")) /
          ((col("ca").cast("double") / col("nt")) *
            (col("cz").cast("double") / col("nt")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram")).limit(50)
      .transform(QueryUtil.orderedBy(col("pmi").desc, col("bigram")))
  }

  val pmiOracle: String =
    """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |tc AS (SELECT t, count(*) AS c FROM tk GROUP BY 1),
      |nt AS (SELECT count(*) AS nt FROM tk),
      |bg AS (SELECT unnest(CASE WHEN len(w) >= 2
      |    THEN list_transform(range(1, len(w)),
      |           i -> array_to_string(w[i:i+1], ' '))
      |    ELSE [] END) AS b
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents)),
      |bc AS (SELECT b, count(*) AS cab FROM bg GROUP BY 1 HAVING count(*) >= 5),
      |nb AS (SELECT count(*) AS nb FROM bg),
      |j AS (SELECT bc.b AS bigram, bc.cab,
      |    round(ln((bc.cab * 1.0 / nb.nb) /
      |      ((ta.c * 1.0 / nt.nt) * (tz.c * 1.0 / nt.nt))), 4) AS pmi
      |  FROM bc
      |  JOIN tc ta ON ta.t = string_split(bc.b, ' ')[1]
      |  JOIN tc tz ON tz.t = string_split(bc.b, ' ')[-1]
      |  CROSS JOIN nt CROSS JOIN nb)
      |SELECT bigram, cab, pmi FROM j
      |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin

  /** Count-Min frequency estimates ([[graft.ops.Sketch.Cms]]): global
    * occurrence counts of one document's 5-gram shingles — the
    * "is this document boilerplate-heavy?" probe behind hot-shingle
    * caps, answered from a d·w counter table instead of a corpus-wide
    * exact count. Counts are integers, so the oracle replays every
    * estimate exactly, collisions included. */
  def freqCms(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    def shingles(df: DataFrame) = df
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        explode(TextAnalysis.ngramsFromTokens(col("_tk"), 5)).as("v"))
    val counters =
      graft.ops.Sketch.Cms.counters(shingles(d), "v", w = 1024, d = 4)
    graft.ops.Sketch.Cms.estimate(counters,
        shingles(d.filter(col("doc_id") === 0)), "v", 1024, 4)
      .transform(QueryUtil.ordered("v"))
  }

  val freqCmsOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 5
      |    THEN list_transform(range(1, len(w) - 3),
      |           i -> array_to_string(w[i:i+4], ' '))
      |    ELSE [] END) AS v
      |  FROM t),
      |hp AS (SELECT v, ('0x' || substr(md5(v), 1, 16))::UBIGINT AS u FROM sh),
      |pos AS (SELECT i AS _i,
      |    (CAST(u & 4294967295 AS BIGINT)
      |     + i * CAST((u >> 32) | 1 AS BIGINT)) % 1024 AS _p
      |  FROM hp, (SELECT unnest([0, 1, 2, 3]) AS i)),
      |c AS (SELECT _i, _p, count(*) AS cnt FROM pos GROUP BY 1, 2),
      |pu AS (SELECT DISTINCT v FROM sh WHERE doc_id = 0),
      |ph AS (SELECT v, ('0x' || substr(md5(v), 1, 16))::UBIGINT AS u FROM pu),
      |pp AS (SELECT v, i AS _i,
      |    (CAST(u & 4294967295 AS BIGINT)
      |     + i * CAST((u >> 32) | 1 AS BIGINT)) % 1024 AS _p
      |  FROM ph, (SELECT unnest([0, 1, 2, 3]) AS i))
      |SELECT pp.v, min(coalesce(c.cnt, 0)) AS est
      |FROM pp LEFT JOIN c ON pp._i = c._i AND pp._p = c._p
      |GROUP BY 1 ORDER BY v""".stripMargin

  /** Bloom-gated hash-blocklist filter ([[graft.ops.Bloom]]): the
    * corpus gated against a known-bad content-fingerprint list (every
    * `src3` doc's md5 — the "remove these exact texts wherever they
    * appear" list). `bloom_candidate` is the scan-side verdict — its
    * false positives are deterministic (a function of the md5 hash
    * family and m=4096), so the oracle replays bit positions, bitset
    * and probes exactly; `keep` is the exact verdict after the
    * confirming join over the candidate sliver only. */
  def bloomGate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val fp = md5(coalesce(col("text"), lit("")).cast("binary"))
    graft.ops.Bloom.gate(
        d.select(col("doc_id"), fp.as("_fp")),
        d.filter(col("source") === "src3").select(fp.as("_fp")),
        "_fp", "_fp", mBits = 4096, k = 3)
      .select(col("doc_id"), col("bloom_candidate"), col("keep"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  val bloomGateOracle: String =
    """WITH fp AS (SELECT doc_id, md5(coalesce(text, '')) AS f, source
      |            FROM documents),
      |blk AS (SELECT DISTINCT f FROM fp WHERE source = 'src3'),
      |bh AS (SELECT f, ('0x' || substr(md5(f), 1, 16))::UBIGINT AS u FROM blk),
      |bbits AS (SELECT DISTINCT
      |    (CAST(u & 4294967295 AS BIGINT)
      |     + i * CAST((u >> 32) | 1 AS BIGINT)) % 4096 AS p
      |  FROM bh, (SELECT unnest([0, 1, 2]) AS i)),
      |dh AS (SELECT doc_id, f, ('0x' || substr(md5(f), 1, 16))::UBIGINT AS u
      |       FROM fp),
      |pos AS (SELECT doc_id,
      |    (CAST(u & 4294967295 AS BIGINT)
      |     + i * CAST((u >> 32) | 1 AS BIGINT)) % 4096 AS p
      |  FROM dh, (SELECT unnest([0, 1, 2]) AS i)),
      |cand AS (SELECT pos.doc_id, bool_and(b.p IS NOT NULL) AS c
      |         FROM pos LEFT JOIN bbits b ON pos.p = b.p GROUP BY 1)
      |SELECT dh.doc_id, cand.c AS bloom_candidate,
      |  dh.f NOT IN (SELECT f FROM blk) AS keep
      |FROM dh JOIN cand ON dh.doc_id = cand.doc_id
      |ORDER BY dh.doc_id""".stripMargin

  /** The same clustering through the web-scale star-contraction path
    * ([[Dedup.connectedComponentsStar]], O(log n) rounds) — registered
    * against the IDENTICAL recursive-CTE oracle, so the alternative
    * algorithm is cross-engine-verified, not just unit-tested. */
  def dedupClustersStar(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponentsStar(
        Dedup.ngramJaccardPairs(docs(spark, dir), threshold = 0.5))
      .transform(QueryUtil.ordered("sid"))

  /** Canonical survivors after near-dup collapse: every doc not
    * shadowed by a smaller near-duplicate (0.5-Jaccard clusters). */
  def dedupKeep(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.keepCanonical(d,
        Dedup.ngramJaccardPairs(d, threshold = 0.5))
      .select("doc_id", "source")
      .transform(QueryUtil.ordered("doc_id"))
  }

  val dedupKeepOracle: String =
    """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         list_transform(range(1, greatest(len(w) - 3, 1)),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])))
      |         AS s
      |       FROM t WHERE len(w) >= 5),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (SELECT da, db
      |          FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
      |          WHERE c * 1.0 / (x.n + y.n - c) >= 0.5),
      |edges AS (SELECT da AS a, db AS b FROM pairs
      |          UNION ALL SELECT db, da FROM pairs),
      |reach(n, m) AS (SELECT a, a FROM edges
      |                UNION
      |                SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
      |drops AS (SELECT n AS doc_id FROM reach GROUP BY n HAVING min(m) <> n)
      |SELECT doc_id, source FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
      |ORDER BY doc_id""".stripMargin

  /** End-to-end curation pipeline — the composite a training-data run
    * ships: language filter → quality floor → length floor → exact
    * dedup (min-id keeper) → deterministic stratified sample → counts
    * per source. Every stage is one of this engine's operators; the
    * whole thing stays a single declarative plan (filters fused into
    * the scan, one dedup shuffle, sample is a scan-local hash). */
  /** Exact-dedup keeper used by every curation composition: the
    * min-id `(doc_id, source, text)` row per content fingerprint via
    * ONE map-side-combined aggregation — NOT a min-over-window on the
    * fingerprint (a window has no partial aggregation, so a crawl-hot
    * fingerprint — 10^6 copies of one boilerplate page — would funnel
    * every copy through ONE task; the r6 lineDedup finding, same
    * class). min(struct) compares doc_id first (unique), so the kept
    * rows are identical to the window form's. */
  private def fpKeeper(df: DataFrame): DataFrame =
    df.withColumn("fp", TextAnalysis.md5Fingerprint(col("text")))
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("source"), col("text"))).as("_k"))
      .select(col("_k.doc_id").as("doc_id"),
        col("_k.source").as("source"), col("_k.text").as("text"))

  def curation(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val filtered = d.filter(
      TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.58 &&
        TextAnalysis.tokenCount(col("text")) >= 20)
    val keeper = fpKeeper(filtered)
    val sampled = graft.ops.Sampling.stratified(
      keeper, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 1.0), defaultFraction = 0.5)
    sampled.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .transform(QueryUtil.ordered("source"))
  }

  val curationOracle: String =
    """WITH s AS (SELECT doc_id, source, text,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','is'))) AS e,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist'))) AS d,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('le','la','les','et','est'))) AS f,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp
      |  FROM documents),
      |filtered AS (SELECT doc_id, source, text FROM s
      |  WHERE (CASE WHEN e > 0 AND e >= greatest(e, d, f, sp) THEN 'en'
      |              WHEN d > 0 AND d >= greatest(d, f, sp) THEN 'de'
      |              WHEN f > 0 AND f >= greatest(f, sp) THEN 'fr'
      |              WHEN sp > 0 THEN 'es' ELSE 'und' END) = 'en'
      |    AND round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4) >= 0.58
      |    AND n >= 20),
      |kept AS (SELECT * FROM filtered
      |  WHERE doc_id = (SELECT min(doc_id) FROM filtered f2
      |                  WHERE md5(f2.text) = md5(filtered.text))),
      |sampled AS (SELECT * FROM kept
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |          / 4294967296.0
      |        < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 1.0
      |                      ELSE 0.5 END)
      |SELECT source, count(*) AS n_docs FROM sampled
      |GROUP BY source ORDER BY source""".stripMargin

  /** Curation v2: the v1 pipeline plus the Gopher-style repetition
    * gate (duplicate-3-gram fraction ≤ 0.2) — boilerplate/spam docs
    * are dropped BEFORE dedup/sampling, exactly where a production
    * pretraining pipeline applies it. Still one declarative plan. */
  def curation2(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .withColumn("_g3", TextAnalysis.ngramsFromTokens(col("_tk"), 3))
    val filtered = d.filter(
      TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.58 &&
        TextAnalysis.tokenCount(col("text")) >= 20 &&
        TextAnalysis.dupNgramFraction(col("_g3")) <= 0.2)
    val keeper = fpKeeper(filtered)
    val sampled = graft.ops.Sampling.stratified(
      keeper, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 1.0), defaultFraction = 0.5)
    sampled.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .transform(QueryUtil.ordered("source"))
  }

  /** v1 oracle with the repetition predicate injected into the same
    * CTE pipeline. */
  val curation2Oracle: String = curationOracle

  /** Curation v3: the v2 chain with benchmark DECONTAMINATION gated in
    * first — docs sharing an 8-gram with the benchmark slice
    * (doc_id % 37 = 0) are dropped before quality filtering, so a
    * contaminated doc can also no longer act as an exact-dedup keeper
    * (the oracle replays that ordering). The decon semi-join rides the
    * broadcast shingle set ([[Dedup.decontaminate]]); everything
    * downstream is the verified v2 pipeline. */
  def curation3(spark: SparkSession, dir: String): DataFrame = {
    val d0 = docs(spark, dir)
    val clean = Dedup.decontaminate(d0,
        d0.filter(col("doc_id") % 37 === 0), k = 8)
      .filter(col("keep")).select("doc_id")
    val d = d0.join(clean, Seq("doc_id"), "left_semi")
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .withColumn("_g3", TextAnalysis.ngramsFromTokens(col("_tk"), 3))
    val filtered = d.filter(
      TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.58 &&
        TextAnalysis.tokenCount(col("text")) >= 20 &&
        TextAnalysis.dupNgramFraction(col("_g3")) <= 0.2)
    val keeper = fpKeeper(filtered)
    val sampled = graft.ops.Sampling.stratified(
      keeper, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 1.0), defaultFraction = 0.5)
    sampled.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .transform(QueryUtil.ordered("source"))
  }

  val curation3Oracle: String =
    """WITH t8 AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |sh8 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 8
      |         THEN list_distinct(list_transform(range(1, len(w) - 6),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
      |             || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))
      |         ELSE [text] END) AS s
      |       FROM t8),
      |bs8 AS (SELECT DISTINCT s FROM sh8 WHERE doc_id % 37 = 0),
      |dirty AS (SELECT DISTINCT sh8.doc_id FROM sh8 JOIN bs8 ON sh8.s = bs8.s),
      |s AS (SELECT doc_id, source, text,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','is'))) AS e,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist'))) AS d,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('le','la','les','et','est'))) AS f,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp
      |  FROM documents
      |  WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
      |filtered AS (SELECT doc_id, source, text FROM s
      |  WHERE (CASE WHEN e > 0 AND e >= greatest(e, d, f, sp) THEN 'en'
      |              WHEN d > 0 AND d >= greatest(d, f, sp) THEN 'de'
      |              WHEN f > 0 AND f >= greatest(f, sp) THEN 'fr'
      |              WHEN sp > 0 THEN 'es' ELSE 'und' END) = 'en'
      |    AND round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4) >= 0.58
      |    AND n >= 20),
      |kept AS (SELECT * FROM filtered
      |  WHERE doc_id = (SELECT min(doc_id) FROM filtered f2
      |                  WHERE md5(f2.text) = md5(filtered.text))),
      |sampled AS (SELECT * FROM kept
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |          / 4294967296.0
      |        < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 1.0
      |                      ELSE 0.5 END)
      |SELECT source, count(*) AS n_docs FROM sampled
      |GROUP BY source ORDER BY source""".stripMargin
    .replace("    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp",
      """    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp,
        |    CASE WHEN len(string_split(text, ' ')) >= 3
        |         THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
        |                i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
        |         ELSE [] END AS g3""".stripMargin)
    .replace("    AND n >= 20),",
      """    AND n >= 20
        |    AND (len(g3) = 0 OR
        |         round((len(g3) - len(list_distinct(g3))) * 1.0 / len(g3), 4) <= 0.2)),""".stripMargin)

  /** Deterministic stratified sample (data mixing): per-source keep
    * fractions via a content-independent md5 unit hash — reproducible
    * across engines, stable under corpus growth. */
  def sampleStrata(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // mixture: keep 80% of src0, 50% of src1, 25% of src2, 10% of the
    // long tail — the "lots of crawl, little of everything else" shape
    val fractions = Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25)
    graft.ops.Sampling.stratified(d, "source", "doc_id", fractions,
        defaultFraction = 0.1)
      .select("doc_id", "source")
      .transform(QueryUtil.ordered("doc_id"))
  }

  val sampleStrataOracle: String =
    """SELECT doc_id, source FROM documents
      |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |        / 4294967296.0
      |      < CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5
      |                    WHEN 'src2' THEN 0.25 ELSE 0.1 END
      |ORDER BY doc_id""".stripMargin

  /** Corpus profile per source — the dataset-card numbers a curation
    * run reports: doc counts, token-count percentiles, mean quality.
    * One map-side-combined aggregation over a single scan. */
  def corpusProfile(spark: SparkSession, dir: String): DataFrame = {
    // r9: percentile() buffered every token count of a source on one
    // reducer; the histogram quantile is bit-identical (RobustSpec
    // pins quantileFromHistogram == percentile()) and grain-bounded
    val base = Dedup.checkpointTracked(docs(spark, dir)
      .select(col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality")))
    val hist = Dedup.checkpointTracked(base
      .groupBy(col("source"), col("n_tokens").cast("double").as("v"))
      .agg(count(lit(1)).as("c")))
    val p50 = graft.ops.Robust.quantileFromHistogram(hist, 0.5,
      Seq("source"), "_p50")
    val p90 = graft.ops.Robust.quantileFromHistogram(hist, 0.9,
      Seq("source"), "_p90")
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("quality"), 4).as("avg_quality"))
      .join(p50, Seq("source")).join(p90, Seq("source"))
      .select(col("source"), col("n_docs"),
        round(col("_p50"), 2).as("tok_p50"),
        round(col("_p90"), 2).as("tok_p90"), col("avg_quality"))
      .transform(QueryUtil.ordered("source"))
  }

  val corpusProfileOracle: String =
    """WITH s AS (SELECT source,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  round(quantile_cont(n_tokens, 0.5), 2) AS tok_p50,
      |  round(quantile_cont(n_tokens, 0.9), 2) AS tok_p90,
      |  round(avg(round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4
      |    + (1.0 - st / n) * 0.2, 4)), 4) AS avg_quality
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  /** Content-level PII scrubbing over the corpus — the in-text
    * counterpart of the reference's key-based redaction. The synthetic
    * corpus contains no PII, so the check would be a no-op rewrite;
    * like `vec_near_dup_lsh`, the corpus is AUGMENTED identically in
    * engine and oracle: every `doc_id % 7 == 0` doc gains an email, an
    * IP, a US-format phone and a Luhn-VALID card number (all four must
    * be scrubbed), every `doc_id % 7 == 3` doc gains an email, an IP,
    * a UK-format phone whose separators do NOT match the conservative
    * pattern, and a card-shaped number whose Luhn checksum FAILS (both
    * must survive — pins the precision boundary, and proves the
    * checksum actually gates the card scrub). The full scrubbed text
    * is hash-compared, plus per-kind match counts on the planted
    * text. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextAnalysis._
    val planted = docs(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(col("text"),
        lit(" contact alice.smith+x@mail.example.org or 10.42.7.19 or 415-555-2671 card 4111-1111-1111-1111")))
      .when(col("doc_id") % 7 === 3, concat(col("text"),
        lit(" mail bob@ex.io via 192.168.0.1 call 020-7946-0958 ref 4111-1111-1111-1112")))
      .otherwise(col("text")).as("text"))
    planted.select(col("doc_id"),
        scrubPii(col("text")).as("scrubbed"),
        regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("text"), lit(Ipv4Re)).as("n_ips"),
        regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
        size(validCardNumbers(col("text"))).as("n_cards"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  val piiScrubOracle: String = {
    import graft.ops.TextAnalysis._
    // DuckDB single-quoted strings do not process backslashes, so the
    // Java pattern strings drop in verbatim; RE2 and Java agree on
    // every construct used (classes, \b, \d, {m,n}, ?). The card stage
    // replays the engine exactly: extract candidates, keep the
    // Luhn-valid ones (1-based indexed list lambda = the engine's
    // 1-based sequence), literal replace-fold via list_reduce seeded
    // with the post-email text.
    val luhn = "list_sum(list_transform(range(1, length(reverse(regexp_replace(c, '[ -]', '', 'g'))) + 1, 1), i -> CASE WHEN (i-1) % 2 = 0 THEN CAST(substr(reverse(regexp_replace(c, '[ -]', '', 'g')), CAST(i AS INT), 1) AS INT) ELSE CASE WHEN CAST(substr(reverse(regexp_replace(c, '[ -]', '', 'g')), CAST(i AS INT), 1) AS INT) * 2 > 9 THEN CAST(substr(reverse(regexp_replace(c, '[ -]', '', 'g')), CAST(i AS INT), 1) AS INT) * 2 - 9 ELSE CAST(substr(reverse(regexp_replace(c, '[ -]', '', 'g')), CAST(i AS INT), 1) AS INT) * 2 END END)) % 10 = 0"
    s"""WITH planted AS (SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN text || ' contact alice.smith+x@mail.example.org or 10.42.7.19 or 415-555-2671 card 4111-1111-1111-1111'
      |       WHEN doc_id % 7 = 3 THEN text || ' mail bob@ex.io via 192.168.0.1 call 020-7946-0958 ref 4111-1111-1111-1112'
      |       ELSE text END AS text
      |  FROM documents),
      |e1 AS (SELECT doc_id, text,
      |         regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS em
      |       FROM planted),
      |cc AS (SELECT doc_id, text,
      |         list_reduce(list_prepend(em,
      |           list_filter(regexp_extract_all(em, '$CardCandidateRe'),
      |             c -> $luhn)),
      |           (acc, c) -> replace(acc, c, '<CC>')) AS ct
      |       FROM e1)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(ct,
      |    '$Ipv4Re', '<IP>', 'g'),
      |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS INT) AS n_ips,
      |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
      |  CAST(len(list_filter(regexp_extract_all(text, '$CardCandidateRe'),
      |    c -> $luhn)) AS INT) AS n_cards
      |FROM cc ORDER BY doc_id""".stripMargin
  }

  /** Unigram-LM quality scores (top-1000 vocab, 1/T OOV floor) — the
    * in-engine stand-in for a perplexity filter. */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(docs(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  val unigramLogProbOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |total AS (SELECT count(*) * 1.0 AS T FROM tok),
      |lm AS (SELECT t, count(*) * 1.0 AS c FROM tok GROUP BY t
      |       ORDER BY c DESC, t LIMIT 1000)
      |SELECT doc_id,
      |  round(avg(log10(COALESCE(lm.c, 1.0) / total.T)), 4) AS mean_log10p
      |FROM tok LEFT JOIN lm ON tok.t = lm.t CROSS JOIN total
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DoReMi-style domain reweighting ([[graft.ops.Doremi]]): excess
    * unigram-LM loss per source drives 5 linearized multiplicative-
    * weights rounds; the oracle replays the whole trajectory — domain
    * losses from the same capped LM, the token-weighted reference
    * loss, and the exact-decimal (1 + η·excess)^t powers — so the
    * update rule itself is what the hash pins, not just the scores. */
  def doremi(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.ops.Doremi.domainWeights(spark, docs(spark, dir))
    graft.ops.Dedup.releaseCaches()
    out.transform(QueryUtil.ordered("source", "round"))
  }

  /** The DoReMi loss/excess/power CTE chain (dr_-prefixed, ends in
    * `dr_pw` + `dr_su`) — shared by the tx_doremi oracle and the
    * curation16 replay so the update rule cannot fork between the
    * standalone trajectory and the applied mixture. */
  private def doremiChainCtes: String =
    """dr_tok AS MATERIALIZED (
      |  SELECT d.source, unnest(string_split(text, ' ')) AS t
      |  FROM documents d),
      |dr_total AS (SELECT count(*) * 1.0 AS T FROM dr_tok),
      |dr_lm AS MATERIALIZED (SELECT t, count(*) * 1.0 AS c FROM dr_tok
      |  GROUP BY t ORDER BY c DESC, t LIMIT 1000),
      |dr_lp AS (SELECT source,
      |    log10(COALESCE(dr_lm.c, 1.0) / dr_total.T) AS lp
      |  FROM dr_tok LEFT JOIN dr_lm ON dr_tok.t = dr_lm.t
      |  CROSS JOIN dr_total),
      |dr_dl AS MATERIALIZED (SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(round(-avg(lp), 4) AS DECIMAL(18,4)) AS loss
      |  FROM dr_lp GROUP BY source),
      |dr_rf AS (SELECT CAST(round(
      |    CAST(sum(n_tokens * loss) AS DOUBLE) /
      |    CAST(sum(n_tokens) AS DOUBLE), 4) AS DECIMAL(18,4)) AS ref
      |  FROM dr_dl),
      |dr_ex AS MATERIALIZED (SELECT source, n_tokens, loss,
      |    CAST(greatest(CAST(0 AS DECIMAL(18,4)), loss - ref)
      |      AS DECIMAL(18,4)) AS excess,
      |    CAST(1 + greatest(CAST(0 AS DECIMAL(18,4)), loss - ref)
      |      * CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(7,5)) AS b
      |  FROM dr_dl CROSS JOIN dr_rf),
      |dr_pw AS MATERIALIZED (SELECT source, n_tokens, loss, excess,
      |    b AS w1, b*b AS w2, b*b*b AS w3, b*b*b*b AS w4,
      |    b*b*b*b*b AS w5
      |  FROM dr_ex),
      |dr_su AS (SELECT sum(w1) AS s1, sum(w2) AS s2, sum(w3) AS s3,
      |    sum(w4) AS s4, sum(w5) AS s5 FROM dr_pw)""".stripMargin

  val doremiOracle: String =
    s"""WITH $doremiChainCtes,
      |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source)
      |SELECT p.source, r.round, n.n_docs, p.n_tokens,""".stripMargin +
    """
      |  CAST(p.loss AS DOUBLE) AS loss,
      |  CAST(p.excess AS DOUBLE) AS excess,
      |  round(
      |    (CASE r.round WHEN 1 THEN CAST(p.w1 AS DOUBLE)
      |      WHEN 2 THEN CAST(p.w2 AS DOUBLE)
      |      WHEN 3 THEN CAST(p.w3 AS DOUBLE)
      |      WHEN 4 THEN CAST(p.w4 AS DOUBLE)
      |      ELSE CAST(p.w5 AS DOUBLE) END) /
      |    (CASE r.round WHEN 1 THEN CAST(s.s1 AS DOUBLE)
      |      WHEN 2 THEN CAST(s.s2 AS DOUBLE)
      |      WHEN 3 THEN CAST(s.s3 AS DOUBLE)
      |      WHEN 4 THEN CAST(s.s4 AS DOUBLE)
      |      ELSE CAST(s.s5 AS DOUBLE) END),
      |    6) AS weight
      |FROM dr_pw p
      |CROSS JOIN (SELECT CAST(unnest(range(1, 6)) AS INTEGER) AS round) r
      |CROSS JOIN dr_su s
      |JOIN nd n USING (source)
      |ORDER BY p.source, r.round""".stripMargin

  /** Temperature-based source mixing (α = 0.5, target 50%) — rare
    * sources keep more than proportional, dominant ones less. */
  def tempMix(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val kept = graft.ops.Sampling.temperatureMix(d, alpha = 0.5,
        targetFraction = 0.5, strataCol = "source", idCol = "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .transform(QueryUtil.ordered("source"))
  }

  val tempMixOracle: String =
    """WITH c AS (SELECT source, count(*) * 1.0 AS ns
      |           FROM documents GROUP BY source),
      |d AS (SELECT sum(pow(ns, 0.5)) AS den, sum(ns) AS n FROM c),
      |f AS (SELECT source, least(1.0, pow(ns, 0.5) / d.den * 0.5 * d.n / ns) AS kf
      |      FROM c CROSS JOIN d),
      |kept AS (SELECT doc.source, count(*) AS n_kept
      |         FROM documents doc JOIN f ON doc.source = f.source
      |         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |                 / 4294967296.0 < kf
      |         GROUP BY doc.source)
      |SELECT c.source, CAST(c.ns AS BIGINT) AS n_docs,
      |  COALESCE(kept.n_kept, 0) AS n_kept
      |FROM c LEFT JOIN kept ON c.source = kept.source
      |ORDER BY c.source""".stripMargin

  /** Curation v4: the v3 chain (decontamination → language/quality/
    * length/repetition gates → exact-dedup keeper) finished with
    * TEMPERATURE mixing over the surviving per-source distribution
    * (α = 0.5, target 50%) instead of fixed per-source fractions —
    * the mixture adapts to whatever the upstream gates left, which is
    * how a production pipeline actually composes ("rebalance what
    * survived curation", not "rebalance the raw crawl"). */
  def curation4(spark: SparkSession, dir: String): DataFrame = {
    val d0 = docs(spark, dir)
    val clean = Dedup.decontaminate(d0,
        d0.filter(col("doc_id") % 37 === 0), k = 8)
      .filter(col("keep")).select("doc_id")
    val d = d0.join(clean, Seq("doc_id"), "left_semi")
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .withColumn("_g3", TextAnalysis.ngramsFromTokens(col("_tk"), 3))
    val filtered = d.filter(
      TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.58 &&
        TextAnalysis.tokenCount(col("text")) >= 20 &&
        TextAnalysis.dupNgramFraction(col("_g3")) <= 0.2)
    val keeper = fpKeeper(filtered).select("doc_id", "source")
    graft.ops.Sampling.temperatureMix(keeper, alpha = 0.5,
        targetFraction = 0.5, strataCol = "source", idCol = "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .transform(QueryUtil.ordered("source"))
  }

  val curation4Oracle: String =
    """WITH t8 AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |sh8 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 8
      |         THEN list_distinct(list_transform(range(1, len(w) - 6),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
      |             || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))
      |         ELSE [text] END) AS s
      |       FROM t8),
      |bs8 AS (SELECT DISTINCT s FROM sh8 WHERE doc_id % 37 = 0),
      |dirty AS (SELECT DISTINCT sh8.doc_id FROM sh8 JOIN bs8 ON sh8.s = bs8.s),
      |s AS (SELECT doc_id, source, text,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','is'))) AS e,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist'))) AS d,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('le','la','les','et','est'))) AS f,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp
      |  FROM documents
      |  WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
      |filtered AS (SELECT doc_id, source, text FROM s
      |  WHERE (CASE WHEN e > 0 AND e >= greatest(e, d, f, sp) THEN 'en'
      |              WHEN d > 0 AND d >= greatest(d, f, sp) THEN 'de'
      |              WHEN f > 0 AND f >= greatest(f, sp) THEN 'fr'
      |              WHEN sp > 0 THEN 'es' ELSE 'und' END) = 'en'
      |    AND round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4) >= 0.58
      |    AND n >= 20),
      |kept AS (SELECT doc_id, source FROM filtered
      |  WHERE doc_id = (SELECT min(doc_id) FROM filtered f2
      |                  WHERE md5(f2.text) = md5(filtered.text))),
      |c AS (SELECT source, count(*) * 1.0 AS ns FROM kept GROUP BY source),
      |dn AS (SELECT sum(pow(ns, 0.5)) AS den, sum(ns) AS nn FROM c),
      |fr AS (SELECT source, least(1.0, pow(ns, 0.5) / dn.den * 0.5 * dn.nn / ns) AS kf
      |       FROM c CROSS JOIN dn),
      |sampled AS (SELECT k.doc_id, k.source FROM kept k JOIN fr ON k.source = fr.source
      |  WHERE ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |          / 4294967296.0 < fr.kf)
      |SELECT source, count(*) AS n_docs FROM sampled
      |GROUP BY source ORDER BY source""".stripMargin

  /** Curation funnel: how many documents survive each pipeline stage
    * (input → decontamination → content gates → exact-dedup keeper →
    * tempered mixing) — the observability counterpart of the ETL
    * report for the curation surface: a mixture that silently loses a
    * source shows up HERE, not in a training run three weeks later.
    * One corpus pass builds per-doc stage FLAGS (persisted, narrow);
    * every count and the tempered fractions derive from that frame —
    * no stage is recomputed. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val d0 = docs(spark, dir)
    val clean = Dedup.decontaminate(d0,
        d0.filter(col("doc_id") % 37 === 0), k = 8)
      .select(col("doc_id"), col("keep").as("f_clean"))
    // persisted BEFORE the keeper self-join below: both its sides
    // (the min-per-fp aggregation and the row frame) read this, and
    // unpersisted they would each re-run the per-row gate expressions
    // — the whole point of the flags frame is one gate pass
    val flags0 = graft.ops.Dedup.persistTracked(d0.join(clean, Seq("doc_id"))
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .withColumn("_g3", TextAnalysis.ngramsFromTokens(col("_tk"), 3))
      .withColumn("f_gates", col("f_clean") &&
        TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.58 &&
        TextAnalysis.tokenCount(col("text")) >= 20 &&
        TextAnalysis.dupNgramFraction(col("_g3")) <= 0.2)
      .withColumn("fp", TextAnalysis.md5Fingerprint(col("text")))
      .select("doc_id", "source", "f_clean", "f_gates", "fp"))
    // keeper among gate-survivors only: min id per fingerprint,
    // computed by groupBy + join-back rather than a min-over-window on
    // fp (partial aggregation — a crawl-hot fingerprint must not
    // funnel its copies through one window task; same class as the r6
    // lineDedup finding)
    val minKeep = flags0.filter(col("f_gates"))
      .groupBy("fp").agg(min(col("doc_id")).as("_min_keep"))
    val flags = graft.ops.Dedup.persistTracked(flags0
      .join(minKeep, Seq("fp"), "left")
      .withColumn("f_keep", coalesce(
        col("f_gates") && col("doc_id") === col("_min_keep"), lit(false)))
      .select("doc_id", "source", "f_clean", "f_gates", "f_keep"))
    val c = flags.filter(col("f_keep")).groupBy("source")
      .agg(count(lit(1)).cast("double").as("ns"))
    val dn = c.agg(sum(pow(col("ns"), 0.5)).as("den"), sum(col("ns")).as("nn"))
    val fr = c.crossJoin(broadcast(dn))
      .select(col("source"), least(lit(1.0),
        pow(col("ns"), 0.5) / col("den") * lit(0.5) * col("nn") / col("ns"))
        .as("kf"))
    val sampled = flags.join(broadcast(fr), Seq("source"), "left")
      .withColumn("f_sampled", col("f_keep") &&
        graft.ops.Sampling.unitHash(col("doc_id")) < col("kf"))
    sampled.agg(
        count(lit(1)).as("input"),
        sum(when(col("f_clean"), 1L).otherwise(0L)).as("decontaminated"),
        sum(when(col("f_gates"), 1L).otherwise(0L)).as("gates"),
        sum(when(col("f_keep"), 1L).otherwise(0L)).as("keeper"),
        sum(when(col("f_sampled"), 1L).otherwise(0L)).as("sampled"))
      .select(expr("stack(5, 'a_input', input, 'b_decontaminated', " +
        "decontaminated, 'c_gates', gates, 'd_keeper', keeper, " +
        "'e_sampled', sampled) AS (stage, n_docs)"))
      .transform(QueryUtil.ordered("stage"))
  }

  val curationFunnelOracle: String =
    """WITH t8 AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |sh8 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 8
      |         THEN list_distinct(list_transform(range(1, len(w) - 6),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
      |             || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))
      |         ELSE [text] END) AS s
      |       FROM t8),
      |bs8 AS (SELECT DISTINCT s FROM sh8 WHERE doc_id % 37 = 0),
      |dirty AS (SELECT DISTINCT sh8.doc_id FROM sh8 JOIN bs8 ON sh8.s = bs8.s),
      |s AS (SELECT doc_id, source, text,
      |    doc_id NOT IN (SELECT doc_id FROM dirty) AS f_clean,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','is'))) AS e,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist'))) AS d,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('le','la','les','et','est'))) AS f,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp
      |  FROM documents),
      |g AS (SELECT doc_id, source, text, f_clean,
      |    f_clean AND
      |    (CASE WHEN e > 0 AND e >= greatest(e, d, f, sp) THEN 'en'
      |          WHEN d > 0 AND d >= greatest(d, f, sp) THEN 'de'
      |          WHEN f > 0 AND f >= greatest(f, sp) THEN 'fr'
      |          WHEN sp > 0 THEN 'es' ELSE 'und' END) = 'en'
      |    AND round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4) >= 0.58
      |    AND n >= 20 AS f_gates
      |  FROM s),
      |k AS (SELECT doc_id, source, f_clean, f_gates,
      |    f_gates AND doc_id = (SELECT min(g2.doc_id) FROM g g2
      |                          WHERE g2.f_gates AND md5(g2.text) = md5(g.text))
      |      AS f_keep
      |  FROM g),
      |c AS (SELECT source, count(*) * 1.0 AS ns FROM k WHERE f_keep GROUP BY source),
      |dn AS (SELECT sum(pow(ns, 0.5)) AS den, sum(ns) AS nn FROM c),
      |fr AS (SELECT source, least(1.0, pow(ns, 0.5) / dn.den * 0.5 * dn.nn / ns) AS kf
      |       FROM c CROSS JOIN dn),
      |sm AS (SELECT k.*, COALESCE(k.f_keep AND
      |         ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |           / 4294967296.0 < fr.kf, false) AS f_sampled
      |       FROM k LEFT JOIN fr ON k.source = fr.source)
      |SELECT stage, n_docs FROM (
      |  SELECT 'a_input' AS stage, count(*) AS n_docs FROM sm
      |  UNION ALL SELECT 'b_decontaminated', count(*) FILTER (WHERE f_clean) FROM sm
      |  UNION ALL SELECT 'c_gates', count(*) FILTER (WHERE f_gates) FROM sm
      |  UNION ALL SELECT 'd_keeper', count(*) FILTER (WHERE f_keep) FROM sm
      |  UNION ALL SELECT 'e_sampled', count(*) FILTER (WHERE f_sampled) FROM sm)
      |ORDER BY stage""".stripMargin

  /** Blocked hosts for the URL gate — by-contract a small set, so it
    * rides as literal predicates (a large blocklist would broadcast a
    * frame and semi-join instead). */
  private val BlockedHosts = Seq("spam.example.com", "tracker.example.net")

  private val urlPlantSql =
    """CASE WHEN doc_id % 5 = 0 THEN text ||
      |       ' see https://docs.example.com/guide and http://spam.example.com/offer now'
      |     WHEN doc_id % 5 = 2 THEN text || ' ref https://Wiki.Example.org/page ok'
      |     WHEN doc_id % 5 = 4 THEN text ||
      |       ' src http://news.bbc.co.uk/story https://Shop.Example.co.jp/item' ||
      |       ' http://site.k12.ca.us/page http://foo.bar.ck/x' ||
      |       ' http://web.myschool.pvt.k12.ma.us/hall http://www.city.kawasaki.jp/e' ||
      |       ' http://foo.aisai.aichi.jp/z'
      |     ELSE text END""".stripMargin

  /** The synthetic corpus has no URLs; like `tx_pii_scrub`, AUGMENT it
    * identically in engine and oracle: every `doc_id % 5 == 0` doc
    * gains a clean and a blocklisted URL (must be flagged, keep =
    * false), every `doc_id % 5 == 2` doc a mixed-case clean one (must
    * lower-case and keep), and every `doc_id % 5 == 4` doc
    * multi-label-suffix hosts (`co.uk` / `co.jp` 2-label rules, a
    * `k12.ca.us` 3-label rule, a `*.ck` wildcard, a `pvt.k12.ma.us`
    * 4-label rule, the `*.kawasaki.jp`/`!city.kawasaki.jp`
    * wildcard+exception pair, and an `aisai.aichi.jp` municipality
    * rule) so the PSL-backed registrable-domain grouping is exercised
    * across every rule arity the full ICANN section contains. */
  private def urlPlanted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"),
        lit(" see https://docs.example.com/guide and http://spam.example.com/offer now")))
      .when(col("doc_id") % 5 === 2, concat(col("text"),
        lit(" ref https://Wiki.Example.org/page ok")))
      .when(col("doc_id") % 5 === 4, concat(col("text"),
        lit(" src http://news.bbc.co.uk/story https://Shop.Example.co.jp/item" +
          " http://site.k12.ca.us/page http://foo.bar.ck/x" +
          " http://web.myschool.pvt.k12.ma.us/hall http://www.city.kawasaki.jp/e" +
          " http://foo.aisai.aichi.jp/z")))
      .otherwise(col("text")).as("text"))

  /** Per-doc domain blocklist gate — the "where did this text come
    * from" curation filter. Scan-fused, zero shuffle. */
  def urlGate(spark: SparkSession, dir: String): DataFrame = {
    val (nUrls, nBlocked, keep) =
      TextAnalysis.urlGate(col("text"), BlockedHosts)
    urlPlanted(spark, dir).select(col("doc_id"), nUrls.as("n_urls"),
        nBlocked.as("n_blocked"), keep.as("keep"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  val urlGateOracle: String = {
    import graft.ops.TextAnalysis.UrlHostRe
    s"""WITH planted AS (SELECT doc_id, $urlPlantSql AS text FROM documents),
      |h AS (SELECT doc_id, list_transform(
      |        regexp_extract_all(text, '$UrlHostRe', 1), x -> lower(x)) AS hosts
      |      FROM planted)
      |SELECT doc_id, CAST(len(hosts) AS INT) AS n_urls,
      |  CAST(len(list_filter(hosts,
      |    x -> x = 'spam.example.com' OR x = 'tracker.example.net')) AS INT)
      |    AS n_blocked,
      |  len(list_filter(hosts,
      |    x -> x = 'spam.example.com' OR x = 'tracker.example.net')) = 0
      |    AS keep
      |FROM h ORDER BY doc_id""".stripMargin
  }

  /** Corpus composition by registrable domain (public-suffix-list
    * snapshot lookup — see [[graft.ops.PublicSuffix]]). One shuffle on
    * the domain key. */
  def domainStats(spark: SparkSession, dir: String): DataFrame =
    urlPlanted(spark, dir)
      .select(col("doc_id"),
        explode(TextAnalysis.urlHosts(col("text"))).as("host"))
      .select(col("doc_id"),
        TextAnalysis.registrableDomain(col("host")).as("domain"))
      .groupBy("domain")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_urls"))
      .transform(QueryUtil.ordered("domain"))

  val domainStatsOracle: String = {
    import graft.ops.TextAnalysis.UrlHostRe
    import graft.ops.PublicSuffix
    s"""WITH planted AS (SELECT doc_id, $urlPlantSql AS text FROM documents),
      |h AS (SELECT doc_id, unnest(list_transform(
      |        regexp_extract_all(text, '$UrlHostRe', 1), x -> lower(x))) AS host
      |      FROM planted),
      |hw AS (SELECT doc_id, string_split(host, '.') AS w FROM h),
      |hp AS (SELECT doc_id, w, ${PublicSuffix.duckdbSuffixLenCase("w")} AS plen
      |       FROM hw),
      |hd AS (SELECT doc_id,
      |         ${PublicSuffix.duckdbDomainSlice("w", "plen")} AS domain
      |       FROM hp)
      |SELECT domain, count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls
      |FROM hd GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Per-domain quota (the C4/RefinedWeb "cap documents per host"
    * curation rule): keep at most 3 docs per registrable domain, ranked
    * by (quality desc, doc_id) — the best representatives of an
    * over-crawled site survive, the long tail of its pages drops. A
    * doc's domain is the lexicographic min of its URL hosts' registrable
    * domains (deterministic for multi-URL docs); docs without URLs pool
    * under `(none)` and get the same quota. One [[graft.ops.Sampling
    * .topKPerGroup]] aggregation — bounded top-k partial agg, no
    * row_number window on the (hot at crawl scale) domain key. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val base = urlPlanted(spark, dir)
    val dom = base.select(col("doc_id"),
        explode(TextAnalysis.urlHosts(col("text"))).as("host"))
      .select(col("doc_id"),
        TextAnalysis.registrableDomain(col("host")).as("domain"))
      .groupBy("doc_id").agg(min(col("domain")).as("domain"))
    val scored = base.join(dom, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("domain"), lit("(none)")).as("domain"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    graft.ops.Sampling.topKPerGroup(scored, "domain",
        struct(negate(col("quality")), col("doc_id")), k = 3)
      .transform(QueryUtil.ordered("domain", "doc_id"))
  }

  val domainCapOracle: String = {
    import graft.ops.TextAnalysis.UrlHostRe
    import graft.ops.PublicSuffix
    s"""WITH planted AS (SELECT doc_id, $urlPlantSql AS text FROM documents),
      |h AS (SELECT doc_id, unnest(list_transform(
      |        regexp_extract_all(text, '$UrlHostRe', 1), x -> lower(x))) AS host
      |      FROM planted),
      |hw AS (SELECT doc_id, string_split(host, '.') AS w FROM h),
      |hp AS (SELECT doc_id, w, ${PublicSuffix.duckdbSuffixLenCase("w")} AS plen
      |       FROM hw),
      |hd AS (SELECT doc_id,
      |         ${PublicSuffix.duckdbDomainSlice("w", "plen")} AS domain
      |       FROM hp),
      |dom AS (SELECT doc_id, min(domain) AS domain FROM hd GROUP BY 1),
      |s AS (SELECT doc_id,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM planted),
      |q AS (SELECT doc_id,
      |    round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4)
      |      AS quality
      |  FROM s),
      |j AS (SELECT q.doc_id, COALESCE(dom.domain, '(none)') AS domain, q.quality
      |      FROM q LEFT JOIN dom ON q.doc_id = dom.doc_id),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY domain ORDER BY quality DESC, doc_id) AS rn
      |      FROM j)
      |SELECT doc_id, domain, quality FROM r WHERE rn <= 3
      |ORDER BY domain, doc_id""".stripMargin
  }

  /** Curation v7 — the SELECTION back half over the URL-planted
    * corpus, composing this round's new primitives end to end:
    * provenance gate → per-domain quota (BoundedTopK partial agg — no
    * hot-domain window) → distributed global quality rank (range
    * partition — no single-task window) → top-half curriculum cut.
    * Docs without URLs bypass the quota (a quota pools real domains;
    * the unattributed pool is not a "domain"). Funnel counts per
    * stage; every stage drops non-vacuously at every SF (the %5==0
    * plant carries a blocked host, %5∈{2,4} plants share one
    * registrable domain each so the quota bites, the decile cut
    * halves whatever survives). */
  def curation7(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val base = Dedup.persistTracked(urlPlanted(spark, dir))
    val (_, _, keepGate) = TextAnalysis.urlGate(col("text"), BlockedHosts)
    val gated = Dedup.checkpointTracked(base.filter(keepGate))
    val dom = gated.select(col("doc_id"),
        explode(TextAnalysis.urlHosts(col("text"))).as("host"))
      .select(col("doc_id"),
        TextAnalysis.registrableDomain(col("host")).as("domain"))
      .groupBy("doc_id").agg(min(col("domain")).as("domain"))
    val scored = gated.join(dom, Seq("doc_id"), "left")
      .select(col("doc_id"), col("domain"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    val withUrl = scored.filter(col("domain").isNotNull)
    val noUrl = scored.filter(col("domain").isNull)
    val capped = Dedup.checkpointTracked(
      graft.ops.Sampling.topKPerGroup(withUrl, "domain",
          struct(negate(col("quality")), col("doc_id")), k = 2)
        .unionByName(noUrl))
    val ranked = graft.ops.Ranking.withRankBucket(capped,
      Seq(col("quality").desc, col("doc_id")), buckets = 10,
      bucketName = "decile")
    val top = ranked.filter(col("decile") < 5)
    def cnt(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt(base, "a_input")
      .unionByName(cnt(gated, "b_url_gate"))
      .unionByName(cnt(capped, "c_domain_cap"))
      .unionByName(cnt(top, "d_top_half"))
      .transform(QueryUtil.ordered("stage"))
  }

  val curation7Oracle: String = {
    import graft.ops.TextAnalysis.UrlHostRe
    import graft.ops.PublicSuffix
    s"""WITH planted AS (SELECT doc_id, $urlPlantSql AS text FROM documents),
      |hh AS (SELECT doc_id, list_transform(
      |         regexp_extract_all(text, '$UrlHostRe', 1), x -> lower(x)) AS hosts
      |       FROM planted),
      |g AS (SELECT p.doc_id, p.text FROM planted p JOIN hh USING (doc_id)
      |      WHERE len(list_filter(hh.hosts,
      |        x -> x = 'spam.example.com' OR x = 'tracker.example.net')) = 0),
      |h AS (SELECT doc_id, unnest(list_transform(
      |        regexp_extract_all(text, '$UrlHostRe', 1), x -> lower(x))) AS host
      |      FROM g),
      |hw AS (SELECT doc_id, string_split(host, '.') AS w FROM h),
      |hp AS (SELECT doc_id, w, ${PublicSuffix.duckdbSuffixLenCase("w")} AS plen
      |       FROM hw),
      |hd AS (SELECT doc_id,
      |         ${PublicSuffix.duckdbDomainSlice("w", "plen")} AS domain
      |       FROM hp),
      |dom AS (SELECT doc_id, min(domain) AS domain FROM hd GROUP BY 1),
      |s AS (SELECT doc_id,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM g),
      |q AS (SELECT doc_id,
      |    round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4)
      |      AS quality
      |  FROM s),
      |j AS (SELECT q.doc_id, dom.domain, q.quality
      |      FROM q LEFT JOIN dom ON q.doc_id = dom.doc_id),
      |r AS (SELECT doc_id, quality, row_number() OVER
      |        (PARTITION BY domain ORDER BY quality DESC, doc_id) AS rn
      |      FROM j WHERE domain IS NOT NULL),
      |capped AS (SELECT doc_id, quality FROM r WHERE rn <= 2
      |           UNION ALL
      |           SELECT doc_id, quality FROM j WHERE domain IS NULL),
      |rk AS (SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id) AS rk,
      |         count(*) OVER () AS nn
      |       FROM capped),
      |top AS (SELECT doc_id FROM rk WHERE floor(((rk - 1) * 10.0) / nn) < 5)
      |SELECT 'a_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM planted
      |UNION ALL SELECT 'b_url_gate', CAST(count(*) AS BIGINT) FROM g
      |UNION ALL SELECT 'c_domain_cap', CAST(count(*) AS BIGINT) FROM capped
      |UNION ALL SELECT 'd_top_half', CAST(count(*) AS BIGINT) FROM top
      |ORDER BY stage""".stripMargin
  }

  /** Curation v8 — model-driven selection: the trained logistic
    * classifier ([[clfQuality]]) becomes a pipeline stage. Train on
    * the corpus (English as the positive class), keep docs scoring at
    * or above the corpus-average score (one broadcast scalar, the
    * curation6 bigram-floor pattern — splits non-vacuously at any SF;
    * the nearest score sits ~1e-5 from the boundary, five orders
    * above cross-engine summation noise), then cut to the top half by
    * DISTRIBUTED rank on the model score. Funnel counts per stage.
    * This is the CCNet shape end to end: a trained filter, not a
    * hand-tuned heuristic, deciding what survives — with the entire
    * training run inside the oracle. */
  def curation8(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val base = docs(spark, dir)
    val scored = Dedup.checkpointTracked(
      TextAnalysis.logisticScore(QueryUtil.spreadById(base),
        col("lang") === "en",
        numBuckets = ClfBuckets, iterations = ClfIters, learningRate = ClfLr))
    val flr = scored.agg(avg(col("clf_score")).as("_flr"))
    val kept = Dedup.checkpointTracked(
      scored.crossJoin(broadcast(flr))
        .filter(col("clf_score") >= col("_flr"))
        .select(col("doc_id"), col("clf_score")))
    val top = graft.ops.Ranking.withRankBucket(kept,
        Seq(col("clf_score").desc, col("doc_id")), buckets = 10,
        bucketName = "decile")
      .filter(col("decile") < 5)
    def cnt(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt(base, "a_input")
      .unionByName(cnt(kept, "b_clf_floor"))
      .unionByName(cnt(top, "c_top_half"))
      .transform(QueryUtil.ordered("stage"))
  }

  // lazy: clfChainSql is declared later in the file (with the clf
  // constants it derives from); a strict val here would read null
  lazy val curation8Oracle: String =
    s"""$clfChainSql,
       |flr AS (SELECT avg(clf_score) AS f FROM scored),
       |kept AS (SELECT doc_id, clf_score FROM scored
       |         WHERE clf_score >= (SELECT f FROM flr)),
       |rk AS (SELECT doc_id, row_number() OVER
       |         (ORDER BY clf_score DESC, doc_id) AS rk,
       |         count(*) OVER () AS nn
       |       FROM kept),
       |top AS (SELECT doc_id FROM rk WHERE floor(((rk - 1) * 10.0) / nn) < 5)
       |SELECT 'a_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM documents
       |UNION ALL SELECT 'b_clf_floor', CAST(count(*) AS BIGINT) FROM kept
       |UNION ALL SELECT 'c_top_half', CAST(count(*) AS BIGINT) FROM top
       |ORDER BY stage""".stripMargin

  /** Retrieval chunking: overlapping fixed-size token windows per doc
    * (64-token chunks, stride 48 → 16-token overlap) — the RAG-prep
    * op; chunks feed BM25 / the hashing embedder / ANN directly.
    * Scan-fused explode, zero shuffle. */
  def chunkSliding(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkSliding(docs(spark, dir))
      .transform(QueryUtil.ordered("doc_id", "chunk_idx"))

  val chunkSlidingOracle: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |c AS (SELECT doc_id, t,
      |        1 + (greatest(len(t) - 64, 0) + 47) // 48 AS nc
      |      FROM tk),
      |e AS (SELECT doc_id, t, unnest(generate_series(0, nc - 1)) AS i FROM c)
      |SELECT doc_id, i AS chunk_idx,
      |  array_to_string(t[i*48+1 : i*48+64], ' ') AS chunk_text,
      |  CAST(len(t[i*48+1 : i*48+64]) AS BIGINT) AS n_tokens
      |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  /** DSIR data-selection scores (Xie et al. 2023): importance weight
    * of every doc under hashed-unigram models of target = English docs
    * vs the raw multilingual corpus — the "select text that looks like
    * my trusted subset" op. See [[graft.ops.TextAnalysis.dsirScore]]. */
  def dsir(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirScore(docs(spark, dir), col("lang") === "en")
      .transform(QueryUtil.ordered("doc_id"))

  val dsirOracle: String =
    """WITH tok AS (SELECT doc_id, lang = 'en' AS tgt,
      |               unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |bk AS (SELECT doc_id, tgt,
      |         CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT % 1024 AS BIGINT) AS b
      |       FROM tok),
      |c AS (SELECT b, count(*) * 1.0 AS cr,
      |        count(*) FILTER (WHERE tgt) * 1.0 AS ct
      |      FROM bk GROUP BY 1),
      |tt AS (SELECT sum(cr) AS tr, sum(ct) AS ts FROM c),
      |r AS (SELECT b, ln((ct + 1.0) / (tt.ts + 1024.0)) -
      |        ln((cr + 1.0) / (tt.tr + 1024.0)) AS lr
      |      FROM c CROSS JOIN tt)
      |SELECT bk.doc_id, count(*) AS n_tokens, round(avg(r.lr), 4) AS dsir_score
      |FROM bk JOIN r ON bk.b = r.b
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Trained quality classifier (CCNet/fastText-style, Wenzek et al.
    * 2020): logistic regression over hashed-unigram TF features,
    * trained in-engine by 5 deterministic full-batch GD steps with
    * target = English docs, then every doc scored. The oracle replays
    * the ENTIRE training run — feature build, all five weight
    * iterations, final sigmoid — as a generated CTE chain, so the
    * trained model itself is exact-checked, not just the scoring pass.
    * See [[graft.ops.TextAnalysis.logisticScore]]. */
  def clfQuality(spark: SparkSession, dir: String): DataFrame =
    // spread the gradient-epoch + scoring scans (per-row CPU) across
    // cores -- partitioning-invariant under the DECIMAL-rounded
    // gradients, see clfGateHoldout
    TextAnalysis.logisticScore(QueryUtil.spreadById(docs(spark, dir)),
        col("lang") === "en",
        numBuckets = ClfBuckets, iterations = ClfIters, learningRate = ClfLr)
      .transform(QueryUtil.ordered("doc_id"))

  private[queries] val ClfBuckets = 256
  private[queries] val ClfIters = 5
  private[queries] val ClfLr = 2.0

  /** The oracle is generated for (buckets, iterations, lr) so the SQL
    * cannot drift from the engine's constants: iteration t computes
    * margins m_t under w_{t-1}, residuals r_t = y − σ(m_t), and
    * w_t = w_{t-1} + lr/N · Xᵀr_t — the intercept rides as the
    * always-on bucket −1 feature exactly as in the engine. The CTE
    * chain is shared with the curation8 oracle, which composes the
    * trained model into a selection pipeline. */
  /** Training-run CTE chain over an arbitrary training source —
    * `src` is any FROM-able relation with (doc_id, text, lang). The
    * chain ends at `w$iters` (the trained weights); callers append
    * their own scoring tail. Parameterized so the holdout oracle can
    * train on a SPLIT of documents with the identical replay. */
  private def clfTrainChainSql(src: String): String = {
    val (nb, lr, iters) = (ClfBuckets, ClfLr, ClfIters)
    val head =
      s"""WITH tok AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         |    len(string_split(text, ' ')) * 1.0 AS n,
         |    unnest(string_split(text, ' ')) AS t FROM $src),
         |feat0 AS (SELECT doc_id, y,
         |    CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT % $nb AS BIGINT) AS b,
         |    count(*) * 1.0 / n AS x FROM tok GROUP BY doc_id, y, n, b),
         |feat AS (SELECT * FROM feat0
         |  UNION ALL SELECT DISTINCT doc_id, y, -1 AS b, 1.0 AS x FROM feat0),
         |nd AS (SELECT count(*) * 1.0 AS n FROM $src),
         |m1 AS (SELECT DISTINCT doc_id, y, 0.0 AS m FROM feat0),
         |r1 AS (SELECT doc_id, y - 1.0/(1.0 + exp(-m)) AS r FROM m1),
         |w1 AS (SELECT f.b, $lr * CAST(sum(CAST(f.x * r.r AS DECIMAL(38,12)))
         |         AS DOUBLE) / (SELECT n FROM nd) AS w
         |       FROM feat f JOIN r1 r USING (doc_id) GROUP BY f.b)""".stripMargin
    val steps = (2 to iters).map { t =>
      s"""m$t AS (SELECT f.doc_id, min(f.y) AS y, coalesce(sum(f.x * w.w), 0.0) AS m
         |       FROM feat f LEFT JOIN w${t - 1} w ON f.b = w.b GROUP BY f.doc_id),
         |r$t AS (SELECT doc_id, y - 1.0/(1.0 + exp(-m)) AS r FROM m$t),
         |w$t AS (SELECT g.b, coalesce(w.w, 0.0) + g.u AS w
         |       FROM (SELECT f.b,
         |               $lr * CAST(sum(CAST(f.x * r.r AS DECIMAL(38,12)))
         |                 AS DOUBLE) / (SELECT n FROM nd) AS u
         |             FROM feat f JOIN r$t r USING (doc_id) GROUP BY f.b) g
         |       LEFT JOIN w${t - 1} w ON g.b = w.b)""".stripMargin
    }
    (Seq(head) ++ steps).mkString(",\n")
  }

  private val clfChainSql: String = {
    val iters = ClfIters
    val tail =
      s"""mf AS (SELECT f.doc_id, coalesce(sum(f.x * w.w), 0.0) AS m
         |       FROM feat f LEFT JOIN w$iters w ON f.b = w.b GROUP BY f.doc_id),
         |scored AS (SELECT doc_id, round(1.0/(1.0 + exp(-m)), 4) AS clf_score
         |           FROM mf)""".stripMargin
    clfTrainChainSql("documents") + ",\n" + tail
  }

  val clfQualityOracle: String =
    s"""$clfChainSql
       |SELECT doc_id, clf_score FROM scored ORDER BY doc_id""".stripMargin

  /** ROC AUC of the trained classifier against its own label — the
    * evaluation every trained filter needs before it gates a corpus:
    * does the score actually RANK English above non-English? Engine:
    * [[graft.ops.Eval.aucBinary]] (tie-corrected Mann-Whitney over a
    * per-distinct-score frame, integer rank arithmetic → exact
    * cross-engine agreement); oracle: the full training-run CTE chain
    * plus the same windowed rank replay. */
  def clfAuc(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scored = TextAnalysis.logisticScore(d, col("lang") === "en",
      numBuckets = ClfBuckets, iterations = ClfIters, learningRate = ClfLr)
    graft.ops.Eval.aucBinary(
      scored.join(d.select(col("doc_id"), col("lang")), Seq("doc_id")),
      col("lang") === "en")
  }

  lazy val clfAucOracle: String =
    s"""$clfChainSql,
       |lab AS (SELECT s.clf_score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |        FROM scored s JOIN documents d USING (doc_id)),
       |ps AS (SELECT clf_score AS s, count(*) AS n, sum(y) AS np
       |       FROM lab GROUP BY 1),
       |rk AS (SELECT s, n, np, sum(n) OVER (ORDER BY s) AS cum FROM ps),
       |agg AS (SELECT sum(np * (2 * cum - n + 1)) AS s2, sum(np) AS n1,
       |          sum(n) AS nn FROM rk)
       |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(nn - n1 AS BIGINT) AS n_neg,
       |  round(CASE WHEN n1 > 0 AND nn > n1
       |    THEN (s2 / 2.0 - n1 * (n1 + 1) / 2.0) / (n1 * (nn - n1)) END, 6) AS auc
       |FROM agg""".stripMargin

  /** Precision/recall/F1 at every distinct-score threshold of the
    * trained classifier — the threshold-picking table behind a gate
    * like curation8's floor. See [[graft.ops.Eval.prCurve]]. */
  def clfPr(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scored = TextAnalysis.logisticScore(d, col("lang") === "en",
      numBuckets = ClfBuckets, iterations = ClfIters, learningRate = ClfLr)
    graft.ops.Eval.prCurve(
        scored.join(d.select(col("doc_id"), col("lang")), Seq("doc_id")),
        col("lang") === "en")
      .transform(QueryUtil.ordered("threshold"))
  }

  lazy val clfPrOracle: String =
    s"""$clfChainSql,
       |lab AS (SELECT s.clf_score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |        FROM scored s JOIN documents d USING (doc_id)),
       |ps AS (SELECT clf_score AS threshold, count(*) AS n, sum(y) AS np
       |       FROM lab GROUP BY 1),
       |c AS (SELECT threshold,
       |        sum(n) OVER (ORDER BY threshold DESC) AS n_kept,
       |        sum(np) OVER (ORDER BY threshold DESC) AS tp,
       |        sum(np) OVER () AS n1 FROM ps)
       |SELECT threshold, CAST(n_kept AS BIGINT) AS n_kept,
       |  CAST(tp AS BIGINT) AS tp,
       |  tp * 1.0 / n_kept AS prec,
       |  CASE WHEN n1 > 0 THEN tp * 1.0 / n1 END AS rec,
       |  CASE WHEN tp > 0 THEN 2.0 * (tp * 1.0 / n_kept) * (tp * 1.0 / n1)
       |    / ((tp * 1.0 / n_kept) + (tp * 1.0 / n1)) END AS f1
       |FROM c ORDER BY threshold""".stripMargin

  /** Reliability bins of the trained classifier: per decile-of-score
    * bin, count, mean predicted score, observed positive fraction.
    * See [[graft.ops.Eval.calibrationBins]]. */
  def clfCalibration(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scored = TextAnalysis.logisticScore(d, col("lang") === "en",
      numBuckets = ClfBuckets, iterations = ClfIters, learningRate = ClfLr)
    graft.ops.Eval.calibrationBins(
        scored.join(d.select(col("doc_id"), col("lang")), Seq("doc_id")),
        col("lang") === "en")
      .transform(QueryUtil.ordered("bin"))
  }

  lazy val clfCalibrationOracle: String =
    s"""$clfChainSql,
       |lab AS (SELECT s.clf_score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |        FROM scored s JOIN documents d USING (doc_id)),
       |b AS (SELECT CAST(least(floor(clf_score * 10), 9) AS BIGINT) AS bin,
       |        CAST(round(clf_score * 10000, 0) AS BIGINT) AS s4, y FROM lab)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |  sum(s4) * 1.0 / (count(*) * 10000) AS mean_score,
       |  sum(y) * 1.0 / count(*) AS frac_pos
       |FROM b GROUP BY 1 ORDER BY bin""".stripMargin

  /** Isotonic (PAV) calibration of the trained classifier's scores —
    * the monotone score → P(en) mapping, computed via the minimax
    * closed form so the whole fit (training run included) replays in
    * the oracle. See [[graft.ops.Eval.isotonicFit]]. */
  def clfIsotonic(spark: SparkSession, dir: String): DataFrame = {
    val d = QueryUtil.spreadById(docs(spark, dir))
    val scored = TextAnalysis.logisticScore(d, col("lang") === "en",
      numBuckets = ClfBuckets, iterations = ClfIters, learningRate = ClfLr)
    graft.ops.Eval.isotonicFit(
        scored.join(d.select(col("doc_id"), col("lang")), Seq("doc_id")),
        col("lang") === "en")
      .transform(QueryUtil.ordered("score"))
  }

  /** The minimax isotonic-fit CTE block over a `scored` relation
    * (doc_id, clf_score) with labels from `documents` — reused by
    * every consumer (tx_clf_isotonic, the calibrated gate, curation12)
    * so the fit replay cannot fork. Ends at the `iso(sc, f)`
    * relation. */
  private def isoFitCtes(scoredRel: String): String =
    s"""lab AS (SELECT s.clf_score AS sc,
       |          CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |        FROM $scoredRel s JOIN documents d USING (doc_id)),
       |ibins AS MATERIALIZED (SELECT sc, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS np FROM lab GROUP BY sc),
       |ipre AS MATERIALIZED (SELECT sc, n, np,
       |    CAST(sum(n) OVER (ORDER BY sc) AS BIGINT) AS cn,
       |    CAST(sum(np) OVER (ORDER BY sc) AS BIGINT) AS cp FROM ibins),
       |iratios AS MATERIALIZED (SELECT a.sc AS si, b.sc AS sk,
       |    (b.cp - (a.cp - a.np)) * 1.0 / (b.cn - (a.cn - a.n)) AS r
       |  FROM ipre a JOIN ipre b ON a.sc <= b.sc),
       |im AS (SELECT si, sk AS sj,
       |    min(r) OVER (PARTITION BY si ORDER BY sk DESC
       |      ROWS UNBOUNDED PRECEDING) AS m
       |  FROM iratios),
       |ifit AS (SELECT sj, si,
       |    max(m) OVER (PARTITION BY sj ORDER BY si
       |      ROWS UNBOUNDED PRECEDING) AS f
       |  FROM im),
       |iso AS (SELECT sj AS sc, f FROM ifit WHERE si = sj)""".stripMargin

  /** Training run + isotonic fit over the full documents corpus. */
  private lazy val isoChainSql: String =
    s"""$clfChainSql,
       |${isoFitCtes("scored")}""".stripMargin

  lazy val clfIsotonicOracle: String =
    s"""$isoChainSql
       |SELECT b.sc AS score, b.n, b.np AS n_pos, round(iso.f, 6) AS fitted
       |FROM ibins b JOIN iso USING (sc) ORDER BY score""".stripMargin

  /** Calibrated gating: keep documents whose ISOTONIC-CALIBRATED
    * probability of being English reaches 0.5 — the raw score floor
    * (curation8's 0.00005-rounded threshold) replaced by a threshold
    * in probability space, which is what a data curator actually
    * reasons in. The mapping is monotone, so this is a score cut too —
    * but the cut point now has a calibrated meaning instead of a
    * hand-picked scalar. */
  def clfGateCalibrated(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scored = Dedup.checkpointTracked(
      TextAnalysis.logisticScore(d, col("lang") === "en",
        numBuckets = ClfBuckets, iterations = ClfIters, learningRate = ClfLr))
    val iso = graft.ops.Eval.isotonicFit(
      scored.join(d.select(col("doc_id"), col("lang")), Seq("doc_id")),
      col("lang") === "en")
    scored.join(broadcast(iso.select(col("score").as("clf_score"),
        col("fitted"))), Seq("clf_score"))
      .filter(col("fitted") >= 0.5)
      .select("doc_id", "clf_score", "fitted")
      .transform(QueryUtil.ordered("doc_id"))
  }

  lazy val clfGateCalibratedOracle: String =
    s"""$isoChainSql
       |SELECT s.doc_id, s.clf_score, round(iso.f, 6) AS fitted
       |FROM scored s JOIN iso ON s.clf_score = iso.sc
       |WHERE round(iso.f, 6) >= 0.5 ORDER BY s.doc_id""".stripMargin

  /** Held-out classifier evaluation — the honest counterpart of
    * [[clfAuc]]: that row measures the model on its own TRAINING
    * corpus, which overstates a real gate's quality. Here documents
    * split deterministically by the md5 unit hash of doc_id (the
    * [[graft.ops.Sampling.unitHash]] rule, so both engines replay the
    * split exactly): hash < 0.8 trains, the held-out rest is scored
    * under the FROZEN model ([[graft.ops.TextAnalysis.scoreWithClfModel]])
    * and AUC'd. The oracle replays the ENTIRE pipeline — split,
    * training run on the train half, frozen scoring of the holdout,
    * tie-corrected rank AUC. Output `(n_pos, n_neg, auc)` counts the
    * HOLDOUT half only. */
  def clfHoldout(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val isTrain = graft.ops.Sampling.unitHash(col("doc_id")) < ClfTrainFrac
    val model = TextAnalysis.trainLogistic(d.filter(isTrain),
      col("lang") === "en", numBuckets = ClfBuckets, iterations = ClfIters,
      learningRate = ClfLr)
    val hold = d.filter(!isTrain)
    graft.ops.Eval.aucBinary(
      TextAnalysis.scoreWithClfModel(hold, model)
        .join(hold.select(col("doc_id"), col("lang")), Seq("doc_id")),
      col("lang") === "en")
  }

  private[queries] val ClfTrainFrac = 0.8

  lazy val clfHoldoutOracle: String = {
    val (nb, iters) = (ClfBuckets, ClfIters)
    val splitPred = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))" +
      s"::UBIGINT / 4294967296.0 < $ClfTrainFrac"
    s"""${clfTrainChainSql(s"(SELECT * FROM documents WHERE $splitPred)")},
       |htok AS (SELECT doc_id, len(string_split(text, ' ')) * 1.0 AS n,
       |    unnest(string_split(text, ' ')) AS t
       |    FROM documents WHERE NOT ($splitPred)),
       |hfeat0 AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT % $nb AS BIGINT) AS b,
       |    count(*) * 1.0 / n AS x FROM htok GROUP BY doc_id, n, b),
       |hfeat AS (SELECT * FROM hfeat0
       |  UNION ALL SELECT DISTINCT doc_id, -1 AS b, 1.0 AS x FROM hfeat0),
       |hmf AS (SELECT f.doc_id, coalesce(sum(f.x * w.w), 0.0) AS m
       |       FROM hfeat f LEFT JOIN w$iters w ON f.b = w.b GROUP BY f.doc_id),
       |hscored AS (SELECT doc_id, round(1.0/(1.0 + exp(-m)), 4) AS clf_score
       |           FROM hmf),
       |lab AS (SELECT s.clf_score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |        FROM hscored s JOIN documents d USING (doc_id)),
       |ps AS (SELECT clf_score AS s, count(*) AS n, sum(y) AS np
       |       FROM lab GROUP BY 1),
       |rk AS (SELECT s, n, np, sum(n) OVER (ORDER BY s) AS cum FROM ps),
       |agg AS (SELECT sum(np * (2 * cum - n + 1)) AS s2, sum(np) AS n1,
       |          sum(n) AS nn FROM rk)
       |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(nn - n1 AS BIGINT) AS n_neg,
       |  round(CASE WHEN n1 > 0 AND nn > n1
       |    THEN (s2 / 2.0 - n1 * (n1 + 1) / 2.0) / (n1 * (nn - n1)) END, 6) AS auc
       |FROM agg""".stripMargin
  }

  /** Holdout-calibrated gating — the honest composition of
    * [[clfGateCalibrated]] and [[clfHoldout]]: the r9 calibrated gate
    * fit its isotonic map on the same pool it gated (calibration
    * trained on the gated data overstates the gate). Here the corpus
    * splits by the md5 unit hash (train < 0.8), the classifier trains
    * on the train half, the isotonic map fits on the HELD-OUT half
    * under the frozen model, and the FULL pool gates through that
    * holdout-fitted map. Full-pool scores outside the holdout's
    * distinct-score set resolve by the standard isotonic step
    * extension — f(largest calibrated score ≤ s), clamped to the first
    * bin below the minimum — materialized on the 4dp score GRID
    * (10001 rows; the calibration-bins s4 trick), so the pool-side
    * lookup is a broadcast EQUI-join, never a range join over the
    * corpus. The grid windows are grain-bounded (≤ 10001 rows through
    * one task) like every other score-grain window. */
  def clfGateHoldout(spark: SparkSession, dir: String): DataFrame = {
    // r15 artifact split (verdict #2): the holdout-trained model and
    // its calibration grid load from the fingerprint-guarded
    // clf_holdout artifact ([[CurationArtifacts.clfHoldout]];
    // tx_clf_build is the always-retrain line). This row is the GATE
    // pass: one frozen-model scoring sweep over the full pool + a
    // broadcast grid equi-join. Oracle unchanged (full replay).
    val d = QueryUtil.spreadById(docs(spark, dir))
    val (model, calGrid) = CurationArtifacts.clfHoldout(spark, dir)
    TextAnalysis.scoreWithClfModel(d, model)
      .withColumn("s4", round(col("clf_score") * 10000).cast("long"))
      .join(broadcast(calGrid), Seq("s4"))
      .filter(col("calibrated") >= 0.5)
      .select(col("doc_id"), col("clf_score"), col("calibrated"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  lazy val clfGateHoldoutOracle: String = {
    val (nb, iters) = (ClfBuckets, ClfIters)
    val splitPred = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))" +
      s"::UBIGINT / 4294967296.0 < $ClfTrainFrac"
    // frozen-model scoring block over an arbitrary doc subset — used
    // twice (holdout for the iso fit, full pool for the gate)
    def frozenScore(p: String, where: String): String =
      s"""${p}tok AS (SELECT doc_id, len(string_split(text, ' ')) * 1.0 AS n,
         |    unnest(string_split(text, ' ')) AS t
         |    FROM documents $where),
         |${p}feat0 AS (SELECT doc_id,
         |    CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT % $nb AS BIGINT) AS b,
         |    count(*) * 1.0 / n AS x FROM ${p}tok GROUP BY doc_id, n, b),
         |${p}feat AS (SELECT * FROM ${p}feat0
         |  UNION ALL SELECT DISTINCT doc_id, -1 AS b, 1.0 AS x FROM ${p}feat0),
         |${p}mf AS (SELECT f.doc_id, coalesce(sum(f.x * w.w), 0.0) AS m
         |       FROM ${p}feat f LEFT JOIN w$iters w ON f.b = w.b
         |       GROUP BY f.doc_id),
         |${p}scored AS (SELECT doc_id, round(1.0/(1.0 + exp(-m)), 4) AS clf_score
         |           FROM ${p}mf)""".stripMargin
    s"""${clfTrainChainSql(s"(SELECT * FROM documents WHERE $splitPred)")},
       |${frozenScore("h", s"WHERE NOT ($splitPred)")},
       |${isoFitCtes("hscored")},
       |${frozenScore("p", "")},
       |iso4 AS (SELECT CAST(round(sc * 10000, 0) AS BIGINT) AS s4,
       |    round(f, 6) AS f FROM iso),
       |pool AS (SELECT doc_id, clf_score,
       |    CAST(round(clf_score * 10000, 0) AS BIGINT) AS s4 FROM pscored),
       |cal AS (SELECT g.s4, coalesce(
       |    (SELECT f FROM iso4 i WHERE i.s4 <= g.s4
       |     ORDER BY i.s4 DESC LIMIT 1),
       |    (SELECT f FROM iso4 i ORDER BY i.s4 LIMIT 1)) AS calibrated
       |  FROM (SELECT DISTINCT s4 FROM pool) g)
       |SELECT pool.doc_id, pool.clf_score, cal.calibrated
       |FROM pool JOIN cal USING (s4)
       |WHERE cal.calibrated >= 0.5 ORDER BY pool.doc_id""".stripMargin
  }

  /** Curriculum ranking: every doc's global quality rank (1 = best)
    * and decile tier — the "order the corpus by quality and bin it"
    * step of curriculum-style data scheduling. Distributed rank via
    * [[graft.ops.Ranking]] (range repartition + per-partition offsets),
    * never a single-task global window; the oracle replays the same
    * total order with `row_number()`. */
  def rankDeciles(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir).select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    graft.ops.Ranking.withRankBucket(scored,
        Seq(col("quality").desc, col("doc_id")),
        buckets = 10, rankName = "rank", bucketName = "decile")
      .transform(QueryUtil.ordered("doc_id"))
  }

  val rankDecilesOracle: String =
    """WITH s AS (SELECT doc_id,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents),
      |q AS (SELECT doc_id,
      |    round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4)
      |      AS quality
      |  FROM s),
      |r AS (SELECT doc_id, quality,
      |        row_number() OVER (ORDER BY quality DESC, doc_id) AS rk,
      |        count(*) OVER () AS nn
      |      FROM q)
      |SELECT doc_id, quality, CAST(rk AS BIGINT) AS "rank",
      |  CAST(floor(((rk - 1) * 10.0) / nn) AS BIGINT) AS decile
      |FROM r ORDER BY doc_id""".stripMargin

  /** Operating-point sweep for the quality gate: rank the corpus by
    * quality (the rankDeciles total order), bin into deciles, and for
    * each candidate threshold ("keep deciles 0..d") report what
    * survives — docs, whitespace tokens, min in-bucket score (the
    * threshold a config would pin) and the cumulative token fraction.
    * The curve a pipeline owner reads to pick a gate before committing
    * a full run. Scale shape: the distributed [[graft.ops.Ranking]]
    * rank (range partition + offsets, never a corpus-wide window),
    * one per-decile partial agg; the cumulative windows run on the
    * DECILE-sized frame (10 rows), not the corpus. */
  def gateSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs(spark, dir).select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      size(split(col("text"), " ")).cast("long").as("_nt"))
    val ranked = graft.ops.Ranking.withRankBucket(scored,
      Seq(col("quality").desc, col("doc_id")), buckets = 10,
      rankName = "rank", bucketName = "decile")
    val per = ranked.groupBy("decile").agg(
      count(lit(1)).as("n_docs"), sum("_nt").as("n_tokens"),
      min("quality").as("threshold"))
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("cum_docs", sum("n_docs").over(cum))
      .withColumn("cum_tokens", sum("n_tokens").over(cum))
      .withColumn("frac_tokens", round(col("cum_tokens").cast("double") /
        sum("n_tokens").over(all).cast("double"), 6))
      .select("decile", "threshold", "n_docs", "n_tokens",
        "cum_docs", "cum_tokens", "frac_tokens")
      .transform(QueryUtil.ordered("decile"))
  }

  val gateSweepOracle: String =
    """WITH s AS (SELECT doc_id,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents),
      |q AS (SELECT doc_id,
      |    round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4)
      |      AS quality,
      |    CAST(n AS BIGINT) AS nt
      |  FROM s),
      |r AS (SELECT doc_id, quality, nt,
      |        row_number() OVER (ORDER BY quality DESC, doc_id) AS rk,
      |        count(*) OVER () AS nn
      |      FROM q),
      |b AS (SELECT CAST((rk - 1) * 10 // nn AS BIGINT) AS decile,
      |        quality, nt FROM r),
      |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
      |        CAST(sum(nt) AS BIGINT) AS n_tokens,
      |        min(quality) AS threshold
      |      FROM b GROUP BY decile)
      |SELECT decile, threshold, n_docs, n_tokens,
      |  CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT) AS cum_docs,
      |  CAST(sum(n_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens,
      |  round(CAST(sum(n_tokens) OVER (ORDER BY decile) AS DOUBLE) /
      |    CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS frac_tokens
      |FROM g ORDER BY decile""".stripMargin

  /** Corpus version diff over a planted v2: v1 = the documents table;
    * v2 drops every doc_id % 7 == 0 (removed), rewrites the text of
    * doc_id % 11 == 0 survivors (changed), and re-keys doc_id % 13 == 0
    * docs at +1,000,000 (added) — both sides replay the identical
    * projection, so every status class is non-vacuous at every SF.
    * See [[graft.ops.Versioning.corpusDiff]]. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = docs(spark, dir)
    val v2 = v1.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    graft.ops.Versioning.corpusDiff(v1, v2)
      .transform(QueryUtil.ordered("doc_id"))
  }

  val corpusDiffOracle: String =
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0),
      |a AS (SELECT doc_id AS id1, md5(coalesce(text, '')) AS fp1 FROM documents),
      |b AS (SELECT doc_id AS id2, md5(coalesce(text, '')) AS fp2 FROM v2)
      |SELECT coalesce(id1, id2) AS doc_id,
      |  CASE WHEN id2 IS NULL THEN 'removed'
      |       WHEN id1 IS NULL THEN 'added'
      |       ELSE 'changed' END AS status
      |FROM a FULL JOIN b ON id1 = id2
      |WHERE id1 IS NULL OR id2 IS NULL OR fp1 <> fp2
      |ORDER BY doc_id""".stripMargin

  /** Incremental re-processing over the same planted v2 as
    * [[corpusDiff]]: per-doc curation gates (quality ≥ 0.6, emitting
    * lang/quality/token counts) run ONLY on the `added ∪ changed`
    * delta, unchanged docs reuse their materialized v1 output rows,
    * removed docs drop out — and the result must equal a FULL
    * recompute over v2, which is exactly what the oracle computes.
    * See [[graft.ops.Versioning.incrementalApply]]. */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    // project to the columns the gates read: incrementalApply
    // fingerprints EVERY non-id column (metadata changes must
    // recompute), so v1/v2 must share a schema
    val v1 = docs(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    val v2 = v1.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          col("text")))
    def gates(d: DataFrame): DataFrame =
      d.select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("quality") >= 0.6)
    // v1's outputs are materialized tables in a real release pipeline;
    // derived inline here so the oracle stays closed-form
    graft.ops.Versioning.incrementalApply(v1, gates(v1), v2, gates)
      .transform(QueryUtil.ordered("doc_id"))
  }

  val incrementalOracle: String =
    """WITH v2 AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 13 = 0),
      |s AS (SELECT doc_id, lang,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM v2),
      |q AS (SELECT doc_id, lang,
      |    round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4)
      |      AS quality,
      |    CAST(n AS BIGINT) AS n_tokens
      |  FROM s)
      |SELECT doc_id, lang, quality, n_tokens FROM q
      |WHERE quality >= 0.6 ORDER BY doc_id""".stripMargin

  /** Release drift monitor over the SAME planted v2 as [[corpusDiff]]:
    * PSI + KL divergence per quality-score decile between the v1 and
    * v2 releases ([[graft.ops.Versioning.distributionDrift]]) — the
    * "did this release shift the score distribution" check that runs
    * next to the diff in a real release pipeline. The v2 projection,
    * the quality formula and the bin arithmetic are all replayed by
    * the oracle; counts are integers, shares are smoothed integer
    * ratios, and ln terms round at 6dp (the tx_pmi precedent). */
  def drift(spark: SparkSession, dir: String): DataFrame = {
    val v1 = docs(spark, dir)
    val v2 = v1.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    def scores(d: DataFrame) =
      d.select(TextAnalysis.qualityScore(col("text")).as("score"))
    graft.ops.Versioning.distributionDrift(scores(v1), scores(v2))
      .transform(QueryUtil.ordered("bin"))
  }

  val driftOracle: String =
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0),
      |q1 AS (SELECT round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 +
      |         (1.0 - st / n) * 0.2, 4) AS score FROM (
      |  SELECT len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents) s),
      |q2 AS (SELECT round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 +
      |         (1.0 - st / n) * 0.2, 4) AS score FROM (
      |  SELECT len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM v2) s),
      |h1 AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n1 FROM q1 GROUP BY 1),
      |h2 AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n2 FROM q2 GROUP BY 1),
      |j AS (SELECT b.bin, coalesce(h1.n1, 0) AS n1, coalesce(h2.n2, 0) AS n2
      |  FROM (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS bin) b
      |  LEFT JOIN h1 USING (bin) LEFT JOIN h2 USING (bin)),
      |t AS (SELECT bin, n1, n2,
      |    CAST(n1 + 1 AS DOUBLE) / CAST(sum(n1) OVER () + 10 AS DOUBLE) AS p,
      |    CAST(n2 + 1 AS DOUBLE) / CAST(sum(n2) OVER () + 10 AS DOUBLE) AS q
      |  FROM j)
      |SELECT bin, n1, n2, round(p, 6) AS p1, round(q, 6) AS p2,
      |  round((q - p) * ln(q / p), 6) AS psi_term,
      |  round(q * ln(q / p), 6) AS kl_term
      |FROM t ORDER BY bin""".stripMargin

  /** Exact top-20 most frequent keys via the two-pass SpaceSaving
    * scheme ([[graft.ops.Frequency.topKExact]]). The key stream is the
    * corpus token stream UNIONed with one planted singleton per doc
    * (`rare_<doc_id>`) — a long tail that overflows the 256-entry
    * sketch and forces real evictions, so the candidate pass exercises
    * the bounded-memory machinery non-vacuously while the true top-20
    * (corpus tokens, each ~N/31 occurrences) clears the
    * N/capacity monitoring guarantee by orders of magnitude. */
  def heavyHittersTop(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val keys = d.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .unionAll(d.select(concat(lit("rare_"), col("doc_id")).as("t")))
    graft.ops.Frequency.topKExact(keys, col("t"), n = 20, capacity = 256)
      .transform(QueryUtil.ordered("key"))
  }

  val heavyHittersOracle: String =
    """WITH k AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents
      |           UNION ALL
      |           SELECT 'rare_' || doc_id FROM documents),
      |c AS (SELECT t AS key, CAST(count(*) AS BIGINT) AS cnt FROM k GROUP BY 1),
      |r AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT 20)
      |SELECT key, cnt FROM r ORDER BY key""".stripMargin

  /** Text canonicalization ([[graft.ops.TextAnalysis.canonicalText]])
    * over a corpus planted with crawl formatting damage (tabs, CRLF,
    * a BEL byte, doubled spaces on doc_id % 5 == 0): control bytes →
    * spaces, runs collapse, edges trim, case folds — plus the md5
    * canonical fingerprint that makes reformatted copies collapse
    * under EXACT dedup. */
  def textCanon(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" \t"), col("text"), lit("\u0007 End  Block\r\n")))
        .otherwise(col("text")).as("text"))
    planted.select(col("doc_id"),
        TextAnalysis.canonicalText(col("text")).as("canon"))
      .withColumn("fp", md5(col("canon")))
      .transform(QueryUtil.ordered("doc_id"))
  }

  val textCanonOracle: String =
    """WITH p AS (SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN ' ' || chr(9) || text || chr(7) || ' End  Block' ||
      |              chr(13) || chr(10)
      |         ELSE text END AS text
      |  FROM documents),
      |c AS (SELECT doc_id,
      |    lower(trim(regexp_replace(regexp_replace(
      |      text, '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))) AS canon
      |  FROM p)
      |SELECT doc_id, canon, md5(canon) AS fp
      |FROM c ORDER BY doc_id""".stripMargin

  /** Corpus report card: per-language doc/token/unique counts and mean
    * quality — the dataset-release summary every corpus version ships
    * with. One aggregation pass; text reduces to md5 fingerprints for
    * the distinct count (never shuffles payloads). */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
        countDistinct(md5(col("text"))).as("n_unique"),
        round(avg(TextAnalysis.qualityScore(col("text"))), 4).as("avg_quality"))
      .transform(QueryUtil.ordered("lang"))

  val corpusStatsOracle: String =
    """WITH s AS (SELECT lang, text,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CAST(n AS BIGINT)) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
      |  round(avg(round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 +
      |    (1.0 - st / n) * 0.2, 4)), 4) AS avg_quality
      |FROM s GROUP BY lang ORDER BY lang""".stripMargin

  // --- HTML extraction ---------------------------------------------------
  // Wrap a slice of the corpus in markup (script+style payloads that
  // must vanish, block structure, entities) identically on both sides;
  // the extractor must recover whitespace-normalized visible text.

  private val htmlPlantSql =
    """CASE WHEN doc_id % 4 = 1 THEN
      |  '<html><head><style>p { color: red; }</style>' ||
      |  '<script type="text/javascript">var x = 1 < 2; alert("drop me");</script>' ||
      |  '</head><body><!-- nav boilerplate --><div class="main"><p>' || text ||
      |  '</p><br><p>Tom &amp; Jerry say &quot;hi&quot; &#39;now&#39; 1 &lt; 2 esc &amp;lt;b&amp;gt;</p>' ||
      |  '</div></body></html>'
      |ELSE text END""".stripMargin.replace("\n", " ")

  private def htmlPlanted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 4 === 1, concat(
        lit("<html><head><style>p { color: red; }</style>"),
        lit("<script type=\"text/javascript\">var x = 1 < 2; alert(\"drop me\");</script>"),
        lit("</head><body><!-- nav boilerplate --><div class=\"main\"><p>"),
        col("text"),
        lit("</p><br><p>Tom &amp; Jerry say &quot;hi&quot; &#39;now&#39; 1 &lt; 2 esc &amp;lt;b&amp;gt;</p>"),
        lit("</div></body></html>")))
      .otherwise(col("text")).as("text"))

  /** HTML -> visible text over the planted corpus. */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    htmlPlanted(spark, dir).select(col("doc_id"),
        TextAnalysis.htmlToText(col("text")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .transform(QueryUtil.ordered("doc_id"))

  val htmlExtractOracle: String = {
    import graft.ops.TextAnalysis._
    s"""WITH planted AS (SELECT doc_id, $htmlPlantSql AS text FROM documents),
      |s1 AS (SELECT doc_id, regexp_replace(text, '$HtmlScriptRe', ' ', 'g') AS t
      |       FROM planted),
      |s2 AS (SELECT doc_id, regexp_replace(t, '$HtmlStyleRe', ' ', 'g') AS t FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(t, '$HtmlCommentRe', ' ', 'g') AS t FROM s2),
      |s4 AS (SELECT doc_id, regexp_replace(t, '$HtmlTagRe', ' ', 'g') AS t FROM s3),
      |s5 AS (SELECT doc_id,
      |         replace(replace(replace(replace(replace(replace(t,
      |           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |           '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t
      |       FROM s4),
      |s6 AS (SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS text
      |       FROM s5)
      |SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
      |FROM s6 ORDER BY doc_id""".stripMargin
  }

  // --- Curation v5: the crawl-to-corpus FRONT half ----------------------
  // v1–v4 curate already-extracted text; v5 composes the r6 stages that
  // come BEFORE them: raw markup + decode damage → HTML extraction →
  // encoding gate → quality floor → exact-dedup keeper → per-source
  // profile. Plants: every doc gains its unique marker damage profile
  // (decode damage survives extraction — U+FFFD and C0 chars are not
  // markup), %4==1 docs additionally arrive wrapped in full HTML.

  private val curation5PlantSql: String = {
    val damaged = s"""text || CASE WHEN doc_id % 11 = 0 THEN ' bad' || chr(65533)
      |  WHEN doc_id % 13 = 5 THEN ' ' || repeat(chr(7), 40) ELSE '' END"""
      .stripMargin.replace("\n", " ")
    s"""CASE WHEN doc_id % 4 = 1 THEN
      |  '<html><head><style>p {{ color: red; }}</style>' ||
      |  '<script>var x = 1 < 2;</script></head><body><!-- nav --><p>' ||
      |  ($damaged) || '</p><p>Tom &amp; Jerry &#39;now&#39; esc &amp;lt;b&amp;gt;</p></body></html>'
      |ELSE ($damaged) END""".stripMargin.replace("\n", " ")
      .replace("{{", "{").replace("}}", "}")
  }

  private def curation5Planted(spark: SparkSession, dir: String): DataFrame = {
    val damaged = concat(col("text"),
      when(col("doc_id") % 11 === 0, lit(" bad\uFFFD"))
        .when(col("doc_id") % 13 === 5, lit(" " + "\u0007" * 40))
        .otherwise(lit("")))
    docs(spark, dir).select(col("doc_id"), col("source"),
      when(col("doc_id") % 4 === 1, concat(
        lit("<html><head><style>p { color: red; }</style>"),
        lit("<script>var x = 1 < 2;</script></head><body><!-- nav --><p>"),
        damaged,
        lit("</p><p>Tom &amp; Jerry &#39;now&#39; esc &amp;lt;b&amp;gt;</p></body></html>")))
      .otherwise(damaged).as("text"))
  }

  /** Crawl-front curation profile: survivors per source after
    * extract → encoding gate → quality floor → exact keeper. */
  def curation5(spark: SparkSession, dir: String): DataFrame = {
    val extracted = curation5Planted(spark, dir)
      .withColumn("text", TextAnalysis.htmlToText(col("text")))
    val (_, _, _, encKeep) = TextAnalysis.encodingQuality(col("text"))
    val gated = extracted.filter(encKeep)
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
    fpKeeper(gated).groupBy("source").agg(count(lit(1)).as("n_docs"))
      .transform(QueryUtil.ordered("source"))
  }

  val curation5Oracle: String = {
    import graft.ops.TextAnalysis._
    s"""WITH planted AS (SELECT doc_id, source, $curation5PlantSql AS text
      |  FROM documents),
      |x1 AS (SELECT doc_id, source,
      |         regexp_replace(text, '$HtmlScriptRe', ' ', 'g') AS t FROM planted),
      |x2 AS (SELECT doc_id, source,
      |         regexp_replace(t, '$HtmlStyleRe', ' ', 'g') AS t FROM x1),
      |x3 AS (SELECT doc_id, source,
      |         regexp_replace(t, '$HtmlCommentRe', ' ', 'g') AS t FROM x2),
      |x4 AS (SELECT doc_id, source,
      |         regexp_replace(t, '$HtmlTagRe', ' ', 'g') AS t FROM x3),
      |x5 AS (SELECT doc_id, source,
      |         replace(replace(replace(replace(replace(replace(t,
      |           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |           '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t FROM x4),
      |ex AS (SELECT doc_id, source,
      |         trim(regexp_replace(t, '\\s+', ' ', 'g')) AS text FROM x5),
      |enc AS (SELECT doc_id, source, text,
      |          length(text) - length(regexp_replace(text, chr(65533), '', 'g'))
      |            AS n_repl,
      |          length(text) - length(regexp_replace(text, '$ControlCharRe', '', 'g'))
      |            AS n_ctrl
      |        FROM ex),
      |gated0 AS (SELECT doc_id, source, text FROM enc
      |  WHERE n_repl = 0
      |    AND (n_repl + n_ctrl) * 1.0 / greatest(length(text), 1) <= 0.01),
      |q AS (SELECT doc_id, source, text,
      |        len(string_split(text, ' ')) * 1.0 AS n,
      |        len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |        len(list_filter(string_split(text, ' '),
      |          t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |      FROM gated0),
      |gated AS (SELECT doc_id, source, text FROM q
      |  WHERE round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4
      |          + (1.0 - st / n) * 0.2, 4) >= 0.5),
      |kept AS (SELECT doc_id, source FROM gated
      |  WHERE doc_id = (SELECT min(doc_id) FROM gated g2
      |                  WHERE md5(g2.text) = md5(gated.text)))
      |SELECT source, count(*) AS n_docs FROM kept
      |GROUP BY source ORDER BY source""".stripMargin
  }

  // --- Curation v6: the whole pipeline, front to back -------------------
  // The thesis query: crawl-shaped input (markup, decode damage,
  // boilerplate lines, exact-dup pairs) through EVERY stage the repo
  // implements, as one declarative plan, reported as a funnel —
  //   a_input -> b_encoding (extract + U+FFFD/control gate)
  //   -> c_line (corpus-wide line dedup, maxOccurrences=2, empty docs out)
  //   -> d_decon (8-gram benchmark decontamination)
  //   -> e_gates (language / quality / length / repetition)
  //   -> f_keeper (exact-dedup min-id keeper)
  //   -> g_bigram (bigram-LM fluency floor: >= corpus-average score)
  //   -> h_sampled (temperature mixing alpha=0.5, target 50%).
  // Every stage drops non-vacuously: damage plants fail the encoding
  // gate; %19 docs are ALL boilerplate (lose every line); %37 docs are
  // the benchmark slice; the word-salad corpus feeds the content
  // gates; %23 pair plants are exact dups that SURVIVE line dedup
  // (2 copies <= maxOccurrences) so the keeper has real work; the
  // >=-average bigram floor splits any population; the tempered mix
  // downsamples the dominant source. HTML extraction is CONDITIONAL
  // (content sniff) so the line structure of plain-text docs survives
  // — the reason v5's unconditional extract could never feed a line
  // stage. maxOccurrences=2 is the load-bearing constant: at 1, any
  // exact-dup pair is destroyed at the line stage before the keeper
  // can see it (their shared lines have 2 copies).

  /** Pair-doc body segments with the pair id INTERLEAVED every six
    * words: no 8-gram window avoids the id token, so no 8-gram is
    * shared ACROSS pairs — a pair doc landing in the %37 benchmark
    * slice must not decontaminate every other pair away (it did: all
    * pairs shared their leading 8-grams, and one benchmark pair doc
    * killed the keeper stage's entire dup supply). */
  private val curation6PairSegs = Seq(
    "the quick brown fox jumps over p",
    " a lazy dog sits very still p",
    " while seven wizards mix bright potions p",
    " near an old stone tower tonight p")

  private val curation6PlantSql: String = {
    val damaged = """CASE WHEN doc_id % 11 = 0 THEN ' bad' || chr(65533)
      |  WHEN doc_id % 13 = 5 THEN ' ' || repeat(chr(7), 40) ELSE '' END"""
      .stripMargin.replace("\n", " ")
    val lineTails =
      """CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Subscribe to our newsletter!' ELSE '' END
        | || CASE WHEN doc_id % 5 = 1 THEN chr(10) || 'Terms of service apply.' ELSE '' END"""
        .stripMargin.replace("\n", " ")
    def pairSql(idExpr: String) = curation6PairSegs
      .map(seg => s"'$seg' || $idExpr").mkString(" || ")
    s"""CASE WHEN doc_id % 19 = 4 THEN 'all rights reserved.'
      |  WHEN doc_id % 23 = 6 THEN ${pairSql("CAST(doc_id AS VARCHAR)")}
      |  WHEN doc_id % 23 = 7 THEN ${pairSql("CAST(doc_id - 1 AS VARCHAR)")}
      |  WHEN doc_id % 4 = 1 THEN
      |    '<html><head><style>p { color: red; }</style>' ||
      |    '<script>var x = 1 < 2;</script></head><body><!-- nav --><p>' ||
      |    (text || ($damaged)) ||
      |    '</p><p>Tom &amp; Jerry &#39;now&#39; esc &amp;lt;b&amp;gt;</p></body></html>'
      |  ELSE text || ($lineTails) || ($damaged) END"""
      .stripMargin.replace("\n", " ")
  }

  private[graft] def curation6Planted(spark: SparkSession, dir: String): DataFrame = {
    val damaged = when(col("doc_id") % 11 === 0, lit(" bad\uFFFD"))
      .when(col("doc_id") % 13 === 5, lit(" " + "\u0007" * 40))
      .otherwise(lit(""))
    val lineTails = concat(
      when(col("doc_id") % 3 === 0, lit("\nSubscribe to our newsletter!"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 1, lit("\nTerms of service apply."))
        .otherwise(lit("")))
    def pairCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(curation6PairSegs.flatMap(seg =>
        Seq(lit(seg), id.cast("string"))): _*)
    // spread BEFORE the plant projections (r18): the planted-text
    // concat battery otherwise runs inside the single-split scan task
    // (the downstream spreadById exchange map), serializing the
    // chain's first CPU stage on one core
    QueryUtil.spreadById(docs(spark, dir)).select(col("doc_id"), col("source"),
      when(col("doc_id") % 19 === 4, lit("all rights reserved."))
        .when(col("doc_id") % 23 === 6, pairCol(col("doc_id")))
        .when(col("doc_id") % 23 === 7, pairCol(col("doc_id") - 1))
        .when(col("doc_id") % 4 === 1, concat(
          lit("<html><head><style>p { color: red; }</style>"),
          lit("<script>var x = 1 < 2;</script></head><body><!-- nav --><p>"),
          col("text"), damaged,
          lit("</p><p>Tom &amp; Jerry &#39;now&#39; esc &amp;lt;b&amp;gt;</p></body></html>")))
        .otherwise(concat(col("text"), lineTails, damaged)).as("text"))
  }

  /** The full-pipeline funnel (stage, n_docs) — see the section
    * comment for the stage list and why each drop is non-vacuous.
    *
    * Stage boundaries are eager tracked localCheckpoints, not
    * persists: each stage here references its upstream frame several
    * times (decon reads `cleaned` three ways, the bigram scorer reads
    * `keeper` six), so with lazy caching the LOGICAL tree compounds
    * near-exponentially down the chain and the driver spends ~10× the
    * cluster time canonicalizing plans for cache lookups (measured
    * 50 s query / <15 s of stage work at sf0.1). Checkpointing
    * collapses every downstream reference to a leaf scan — the
    * composed pipeline costs the sum of its stages, which is also the
    * 100 TB shape (a production pipeline materializes stage outputs
    * between phases for exactly this reason). */
  def curation6(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val f = curation6Frames(spark, dir)
    def cnt(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt(f("planted"), "a_input")
      .unionByName(cnt(f("enc"), "b_encoding"))
      .unionByName(cnt(f("cleaned"), "c_line"))
      .unionByName(cnt(f("deconned"), "d_decon"))
      .unionByName(cnt(f("gated"), "e_gates"))
      .unionByName(cnt(f("keeper"), "f_keeper"))
      .unionByName(cnt(f("bigramKept"), "g_bigram"))
      .unionByName(cnt(f("sampled"), "h_sampled"))
      .transform(QueryUtil.ordered("stage"))
  }

  /** The curation6 pipeline's stage frames, shared by the funnel query
    * and curation9's crawl-to-shards composition (the stage semantics
    * cannot fork between the two). */
  private[queries] def curation6Frames(spark: SparkSession, dir: String)
      : Map[String, DataFrame] = {
    import org.apache.spark.sql.DataFrame
    val planted = curation6Planted(spark, dir)
    // conditional extraction + encoding gate: the canonical
    // crawlFrontGates transform the streaming front half also uses.
    // spreadById before each regex/tokenize-heavy narrow stage — see
    // [[QueryUtil.spreadById]] (single-task checkpoint fix, r10)
    // planted is already spread by doc_id (inside curation6Planted),
    // so the gates run wide without a second exchange here (r18)
    val enc = Dedup.checkpointTracked(
      TextAnalysis.crawlFrontGates(planted))
    val cleaned = Dedup.checkpointTracked(
      Dedup.lineDedup(enc, maxOccurrences = 2)
        .filter(length(col("clean_text")) > 0)
        .join(enc.select("doc_id", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("clean_text").as("text")))
    val clean = Dedup.decontaminate(cleaned,
        cleaned.filter(col("doc_id") % 37 === 0), k = 8)
      .filter(col("keep")).select("doc_id")
    val deconned = Dedup.checkpointTracked(QueryUtil.spreadById(
      cleaned.join(clean, Seq("doc_id"), "left_semi")))
    val gated = Dedup.checkpointTracked(deconned
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .withColumn("_g3", TextAnalysis.ngramsFromTokens(col("_tk"), 3))
      .filter(TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.58 &&
        TextAnalysis.tokenCount(col("text")) >= 20 &&
        TextAnalysis.dupNgramFraction(col("_g3")) <= 0.2)
      .select("doc_id", "source", "text"))
    val keeper = Dedup.checkpointTracked(
      QueryUtil.spreadById(fpKeeper(gated)))
    // bigram fluency floor: model trained on the keeper survivors,
    // keep docs scoring at or above the (rounded) corpus average —
    // population-relative, so the stage splits non-vacuously at any
    // corpus size; the threshold is one broadcast scalar
    // scored feeds both the threshold scalar and the join — checkpoint
    // so the bigram scoring pass runs once, not twice
    val scored = Dedup.checkpointTracked(TextAnalysis.bigramLogProb(keeper))
    val thr = scored.agg(round(avg(col("mean_log10p")), 4).as("_avg"))
    val bigramKept = Dedup.checkpointTracked(keeper
      .join(scored, Seq("doc_id"))
      .crossJoin(broadcast(thr))
      .filter(col("mean_log10p").isNotNull &&
        col("mean_log10p") >= col("_avg"))
      .select("doc_id", "source"))
    val sampled = graft.ops.Sampling.temperatureMix(bigramKept, alpha = 0.5,
      targetFraction = 0.5, strataCol = "source", idCol = "doc_id")
    Map("planted" -> planted, "enc" -> enc, "cleaned" -> cleaned,
      "deconned" -> deconned, "gated" -> gated, "keeper" -> keeper,
      "bigramKept" -> bigramKept, "sampled" -> sampled)
  }

  /** Curation v9 — crawl to SHIPPED dataset in one declarative plan:
    * the entire v6 pipeline (extract → encoding gate → line dedup →
    * decon → gates → keeper → bigram floor → tempered mix) feeding
    * directly into release packaging — the surviving docs' CLEANED
    * text packs into token-budgeted shards and emits the verifiable
    * manifest ([[graft.ops.Release.manifest]]). The oracle chains the
    * full v6 replay into the prefix-sum shard assignment and the
    * unsigned-XOR rollup. Output: one manifest row per shard. */
  def curation9(spark: SparkSession, dir: String): DataFrame = {
    val f = curation6Frames(spark, dir)
    val shipped = f("keeper")
      .join(f("sampled").select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    graft.ops.Release.manifest(shipped, budget = 500L)
      .transform(QueryUtil.ordered("shard"))
  }

  // chain concatenated, not re-stripMargin'd — see curation6Oracle;
  // the manifest replay comes from the shared manifestSqlTail
  lazy val curation9Oracle: String = curation6ChainSql + ",\n" +
    """shipped AS (SELECT k.doc_id, k.text FROM kept k
      |            JOIN sampled USING (doc_id)),""".stripMargin + "\n" +
    manifestSqlTail("shipped", 500L)

  /** Curation v10 — the missing last mile after v9's shipped shards:
    * the SAME curated corpus in reproducible TRAINING ORDER. The v6
    * survivors' cleaned text runs through
    * [[graft.ops.Packing.shuffledPack]] (one epoch, fixed seed):
    * seeded global permutation + token-budget shard assignment in
    * permuted order — what the trainer actually reads. Oracle = the
    * shared v6 chain + hex-key permutation + prefix sum. */
  def curation10(spark: SparkSession, dir: String): DataFrame = {
    // r15: consumes the saved pool artifact (leaf scan; v6 chain runs
    // only on fingerprint miss) — tx_pool_build is the chain's
    // always-rebuild line, and the full-replay oracle below pins the
    // loaded pool byte-for-byte
    val shipped = CurationArtifacts.pool(spark, dir)
      .select(col("doc_id"), col("text"))
    graft.ops.Packing.shuffledPack(shipped, budget = 500L, epochs = 1,
        seed = "graft-r10", bucketWidth = 64L)
      .select("doc_id", "pos", "n_tokens", "shard")
      .transform(QueryUtil.ordered("pos"))
  }

  lazy val curation10Oracle: String = curation6ChainSql + ",\n" +
    """shipped AS (SELECT k.doc_id, k.text FROM kept k
      |            JOIN sampled USING (doc_id)),
      |shp_c AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    substr(md5('graft-r10:0:' || CAST(doc_id AS VARCHAR)), 1, 16) AS hk
      |  FROM shipped),
      |shp_r AS (SELECT doc_id, n,
      |    row_number() OVER (ORDER BY hk, doc_id) AS pos,
      |    sum(n) OVER (ORDER BY hk, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM shp_c)
      |SELECT doc_id, CAST(pos AS BIGINT) AS pos, n AS n_tokens,
      |  CAST((cum - n) // 500 AS BIGINT) AS shard
      |FROM shp_r ORDER BY pos""".stripMargin

  /** Curation v11: the v6 survivors under an exact per-source TOKEN
    * budget ([[graft.ops.Sampling.tokenBudgetMix]]) — the final mixing
    * stage a dataset card publishes ("≤ 400 tokens per source from the
    * curated pool, best quality first, deterministic boundary"). */
  def curation11(spark: SparkSession, dir: String): DataFrame = {
    // r15: pool-artifact consumer (see curation10) — the token-budget
    // mix is the whole query once the pool is a leaf scan
    val shipped = CurationArtifacts.pool(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    graft.ops.Sampling.tokenBudgetMix(shipped, budget = 400L,
        bucketWidth = 64L)
      .transform(QueryUtil.ordered("source", "doc_id"))
  }

  lazy val curation11Oracle: String = curation6ChainSql + ",\n" +
    s"""shipped AS MATERIALIZED (SELECT k.doc_id, p.source, k.text
      |  FROM kept k JOIN sampled USING (doc_id)
      |  JOIN planted p ON k.doc_id = p.doc_id),
      |${tokenBudgetChainSql("shipped", 400L)}
      |SELECT doc_id, source, q, n_tokens, admit FROM admitted
      |ORDER BY source, doc_id""".stripMargin

  /** Curation v12 — the full modern selection pipeline in one
    * declarative plan: crawl gates (v6) → quality classifier TRAINED
    * ON THE CURATED POOL → isotonic-calibrated probability gate
    * (P(en) ≥ 0.5) → per-source token budget → seeded-shuffle
    * training order. Every stage's replay is a shared builder
    * (curation6 chain, clfTrainChainSql over the pool relation,
    * isoFitCtes, tokenBudgetChainSql, the v10 pack tail), so no stage
    * can fork from its standalone row. */
  def curation12(spark: SparkSession, dir: String): DataFrame = {
    // r15 artifact split (verdict #2): the pool AND its trained gate
    // load from fingerprint-guarded artifacts — tx_pool_build /
    // tx_clf_pool_build are the always-retrain lines, this row is the
    // SELECTION pass a lab re-runs per release candidate (score under
    // the frozen model, gate, budget, pack). The full-replay oracle is
    // unchanged: a loaded model scores byte-identically to in-query
    // training, so the same hashes pin the artifact path end-to-end.
    val shipped = CurationArtifacts.pool(spark, dir)
    val (model, iso) = CurationArtifacts.clfPool(spark, dir)
    val scored = TextAnalysis.scoreWithClfModel(shipped, model)
    val gated = shipped.join(scored, Seq("doc_id"))
      .join(broadcast(iso.select(col("score").as("clf_score"),
        col("fitted"))), Seq("clf_score"))
      .filter(col("fitted") >= 0.5)
      .select("doc_id", "source", "text")
    val admitted = graft.ops.Sampling.tokenBudgetMix(gated, budget = 300L,
      bucketWidth = 64L)
    val adm = gated.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "text")
    graft.ops.Packing.shuffledPack(adm, budget = 500L, epochs = 1,
        seed = "graft-r12", bucketWidth = 64L)
      .select("doc_id", "pos", "n_tokens", "shard")
      .transform(QueryUtil.ordered("pos"))
  }

  lazy val curation12Oracle: String = {
    val poolSrc = "(SELECT sh.doc_id, d.lang, sh.text " +
      "FROM shipped sh JOIN documents d USING (doc_id))"
    val trainChain = clfTrainChainSql(poolSrc).stripPrefix("WITH ")
    curation6ChainSql + ",\n" +
      """shipped AS MATERIALIZED (SELECT k.doc_id, p.source, k.text
        |  FROM kept k JOIN sampled USING (doc_id)
        |  JOIN planted p ON k.doc_id = p.doc_id),""".stripMargin + "\n" +
      trainChain + ",\n" +
      s"""c12mf AS (SELECT f.doc_id, coalesce(sum(f.x * w.w), 0.0) AS m
         |       FROM feat f LEFT JOIN w$ClfIters w ON f.b = w.b
         |       GROUP BY f.doc_id),
         |c12scored AS (SELECT doc_id, round(1.0/(1.0 + exp(-m)), 4)
         |    AS clf_score FROM c12mf),
         |${isoFitCtes("c12scored")},
         |c12gated AS MATERIALIZED (SELECT sh.doc_id, sh.source, sh.text
         |  FROM shipped sh JOIN c12scored s USING (doc_id)
         |  JOIN iso ON s.clf_score = iso.sc
         |  WHERE round(iso.f, 6) >= 0.5),
         |${tokenBudgetChainSql("c12gated", 300L)},
         |adm AS (SELECT g.doc_id, g.text FROM c12gated g
         |        JOIN admitted a USING (doc_id)),
         |shp_c AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         |    substr(md5('graft-r12:0:' || CAST(doc_id AS VARCHAR)), 1, 16)
         |      AS hk
         |  FROM adm),
         |shp_r AS (SELECT doc_id, n,
         |    row_number() OVER (ORDER BY hk, doc_id) AS pos,
         |    sum(n) OVER (ORDER BY hk, doc_id ROWS UNBOUNDED PRECEDING)
         |      AS cum
         |  FROM shp_c)
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos, n AS n_tokens,
         |  CAST((cum - n) // 500 AS BIGINT) AS shard
         |FROM shp_r ORDER BY pos""".stripMargin
  }

  /** tx_curation13 — the CCNet-shaped selection: exact dedup FIRST,
    * then a Kneser–Ney LM trained on the deduplicated pool itself,
    * then a population-relative perplexity floor (keep docs at or
    * above the rounded corpus-average log-probability) — the
    * composition CCNet actually runs (dedup → LM perplexity buckets →
    * keep head/middle), here as ONE declarative plan: map-side keeper
    * aggregation, the KN count model derived from one bigram scan,
    * scoring equi-joins, one broadcast threshold scalar, and a
    * three-row funnel output. */
  def curation13(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val base = docs(spark, dir)
    val kept = Dedup.checkpointTracked(QueryUtil.spreadById(fpKeeper(base)))
    // checkpoint: the scored frame feeds both the threshold scalar and
    // the selection filter — one KN scoring pass, not two
    val scored = Dedup.checkpointTracked(TextAnalysis.knBigramLogProb(kept))
    val thr = scored.agg(round(avg(col("kn_log10p")), 4).as("_avg"))
    val sel = scored.crossJoin(broadcast(thr))
      .filter(col("kn_log10p").isNotNull && col("kn_log10p") >= col("_avg"))
    def cnt(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt(base, "a_input")
      .unionByName(cnt(kept, "b_dedup"))
      .unionByName(cnt(sel, "c_lm_kept"))
      .transform(QueryUtil.ordered("stage"))
  }

  lazy val curation13Oracle: String =
    s"""WITH k AS MATERIALIZED (SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM documents) z WHERE rn = 1),
      |${knSqlCtes("k")},
      |flr AS (SELECT round(avg(kn_log10p), 4) AS f FROM knagg),
      |c13sel AS (SELECT a.doc_id FROM knagg a CROSS JOIN flr
      |           WHERE a.kn_log10p >= flr.f)
      |SELECT stage, n_docs FROM (
      |  SELECT 'a_input' AS stage, count(*) AS n_docs FROM documents
      |  UNION ALL SELECT 'b_dedup', count(*) FROM k
      |  UNION ALL SELECT 'c_lm_kept', count(*) FROM c13sel) t
      |ORDER BY stage""".stripMargin

  /** tx_curation14 — the LID-GATED curation (the CCNet/C4/Gopher
    * front door: language identification BEFORE any quality or dedup
    * stage, because every downstream model — the KN LM here — is
    * only meaningful within one language). Chain: train the LID on
    * the full labeled corpus (the `tx_langid` run, shared constants),
    * keep docs PREDICTED `en`, exact-dedup the gated pool, train the
    * KN bigram LM on the deduplicated pool itself and apply the
    * population-relative perplexity floor — `tx_curation13`'s tail
    * behind a trained-model gate. Output is the four-stage funnel.
    *
    * Scale shape: the LID model is a ≤ K·(buckets+1) driver artifact
    * broadcast into a pure scoring projection; the gate is a
    * left-semi join on doc_id; checkpoints cut the deep-composition
    * plan at each stage boundary (the r7 lesson). Disclosure: on the
    * synthetic corpus the `lang` labels share one vocabulary, so the
    * trained gate selects a deterministic-but-arbitrary subset — the
    * oracle replays the full training run + gate + dedup + LM floor,
    * so the CONTRACT verified is the composition, not LID accuracy
    * (same disclosure as `tx_langid`). */
  def curation14(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val base = docs(spark, dir)
    // r15: the language gate scores under the frozen lid_docs
    // artifact (tx_langid is the build line); the KN floor still
    // trains in-query — its pool is THIS query's dedup output
    val model = CurationArtifacts.lid(spark, dir)
    val enIds = TextAnalysis.scoreWithLidModel(
        QueryUtil.spreadById(base), model)
      .filter(col("lang_pred") === "en").select("doc_id")
    val gated = Dedup.checkpointTracked(
      base.join(enIds, Seq("doc_id"), "left_semi"))
    val kept = Dedup.checkpointTracked(QueryUtil.spreadById(fpKeeper(gated)))
    // checkpoint: the scored frame feeds the threshold scalar AND the
    // selection filter — one KN scoring pass, not two
    val scored = Dedup.checkpointTracked(TextAnalysis.knBigramLogProb(kept))
    val thr = scored.agg(round(avg(col("kn_log10p")), 4).as("_avg"))
    val sel = scored.crossJoin(broadcast(thr))
      .filter(col("kn_log10p").isNotNull && col("kn_log10p") >= col("_avg"))
    def cnt(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt(base, "a_input")
      .unionByName(cnt(gated, "b_lid"))
      .unionByName(cnt(kept, "c_dedup"))
      .unionByName(cnt(sel, "d_lm_kept"))
      .transform(QueryUtil.ordered("stage"))
  }

  /** The LID training replay (lidTrainChainSql, the `tx_langid`
    * oracle's own chain) gating the curation13 tail — engine and
    * oracle share BOTH building blocks, so neither the LID replay nor
    * the KN replay can fork between their standalone and composed
    * uses. */
  lazy val curation14Oracle: String =
    s"""WITH ${lidTrainChainSql("documents")},
      |g14 AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d
      |  JOIN lpred p USING (doc_id) WHERE p.lang_pred = 'en'),
      |k14 AS MATERIALIZED (SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM g14) z WHERE rn = 1),
      |${knSqlCtes("k14")},
      |flr AS (SELECT round(avg(kn_log10p), 4) AS f FROM knagg),
      |c14sel AS (SELECT a.doc_id FROM knagg a CROSS JOIN flr
      |           WHERE a.kn_log10p >= flr.f)
      |SELECT stage, n_docs FROM (
      |  SELECT 'a_input' AS stage, count(*) AS n_docs FROM documents
      |  UNION ALL SELECT 'b_lid', count(*) FROM g14
      |  UNION ALL SELECT 'c_dedup', count(*) FROM k14
      |  UNION ALL SELECT 'd_lm_kept', count(*) FROM c14sel) t
      |ORDER BY stage""".stripMargin

  /** The v6 replay's WITH chain (through `sampled`), shared with the
    * curation9 oracle so the two cannot fork. */
  private lazy val curation6ChainSql: String = {
    import graft.ops.TextAnalysis._
    s"""WITH planted AS (SELECT doc_id, source, $curation6PlantSql AS text
      |  FROM documents),
      |x1 AS (SELECT doc_id,
      |         regexp_replace(text, '$HtmlScriptRe', ' ', 'g') AS t FROM planted),
      |x2 AS (SELECT doc_id, regexp_replace(t, '$HtmlStyleRe', ' ', 'g') AS t FROM x1),
      |x3 AS (SELECT doc_id, regexp_replace(t, '$HtmlCommentRe', ' ', 'g') AS t FROM x2),
      |x4 AS (SELECT doc_id, regexp_replace(t, '$HtmlTagRe', ' ', 'g') AS t FROM x3),
      |x5 AS (SELECT doc_id,
      |         replace(replace(replace(replace(replace(replace(t,
      |           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |           '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t FROM x4),
      |ex AS (SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS t FROM x5),
      |sel AS (SELECT p.doc_id, p.source,
      |          CASE WHEN p.text LIKE '%<html%' THEN ex.t ELSE p.text END AS text
      |        FROM planted p JOIN ex USING (doc_id)),
      |encm AS (SELECT doc_id, source, text,
      |           length(text) - length(regexp_replace(text, chr(65533), '', 'g'))
      |             AS n_repl,
      |           length(text) - length(regexp_replace(text, '$ControlCharRe', '', 'g'))
      |             AS n_ctrl
      |         FROM sel),
      |encok AS (SELECT doc_id, source, text FROM encm
      |  WHERE n_repl = 0
      |    AND (n_repl + n_ctrl) * 1.0 / greatest(length(text), 1) <= 0.01),
      |l AS (SELECT doc_id,
      |        unnest(string_split(text, chr(10))) AS line,
      |        unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      |      FROM encok),
      |lk AS (SELECT doc_id, pos, line, lower(trim(line)) AS key FROM l),
      |occ AS (SELECT key, count(*) AS c FROM lk GROUP BY 1),
      |keptl AS (SELECT lk.doc_id, lk.pos, lk.line
      |          FROM lk JOIN occ USING (key) WHERE occ.c <= 2),
      |cleaned AS (SELECT e.doc_id, e.source,
      |              string_agg(keptl.line, chr(10) ORDER BY keptl.pos) AS text
      |            FROM encok e JOIN keptl ON e.doc_id = keptl.doc_id
      |            GROUP BY 1, 2),
      |t8 AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM cleaned),
      |sh8 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 8
      |         THEN list_distinct(list_transform(range(1, len(w) - 6),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
      |             || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))
      |         ELSE [text] END) AS s
      |       FROM t8),
      |bs8 AS (SELECT DISTINCT s FROM sh8 WHERE doc_id % 37 = 0),
      |dirty AS (SELECT DISTINCT sh8.doc_id FROM sh8 JOIN bs8 ON sh8.s = bs8.s),
      |deconned AS (SELECT doc_id, source, text FROM cleaned
      |  WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
      |s AS (SELECT doc_id, source, text,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','is'))) AS e,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist'))) AS d,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('le','la','les','et','est'))) AS f,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el','los','las','y','es'))) AS sp,
      |    CASE WHEN len(string_split(text, ' ')) >= 3
      |         THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))
      |         ELSE [] END AS g3
      |  FROM deconned),
      |gated AS (SELECT doc_id, source, text FROM s
      |  WHERE (CASE WHEN e > 0 AND e >= greatest(e, d, f, sp) THEN 'en'
      |              WHEN d > 0 AND d >= greatest(d, f, sp) THEN 'de'
      |              WHEN f > 0 AND f >= greatest(f, sp) THEN 'fr'
      |              WHEN sp > 0 THEN 'es' ELSE 'und' END) = 'en'
      |    AND round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4 + (1.0 - st / n) * 0.2, 4) >= 0.58
      |    AND n >= 20
      |    AND (len(g3) = 0 OR
      |         round((len(g3) - len(list_distinct(g3))) * 1.0 / len(g3), 4) <= 0.2)),
      |kept AS (SELECT doc_id, source, text FROM gated
      |  WHERE doc_id = (SELECT min(doc_id) FROM gated g2
      |                  WHERE md5(g2.text) = md5(gated.text))),
      |tkb AS (SELECT doc_id, string_split(text, ' ') AS w FROM kept),
      |bi AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS u, unnest(w[2:len(w)]) AS v
      |       FROM tkb WHERE len(w) >= 2),
      |bc AS (SELECT u, v, count(*) * 1.0 AS cuv FROM bi GROUP BY 1, 2),
      |cx AS (SELECT u, sum(cuv) AS cu FROM bc GROUP BY 1),
      |topcx AS (SELECT u, cu FROM cx ORDER BY cu DESC, u LIMIT 1000),
      |vsz AS (SELECT count(*) * 1.0 AS vv FROM topcx),
      |topbi AS (SELECT bc.u, bc.v, bc.cuv FROM bc JOIN topcx ON bc.u = topcx.u
      |          ORDER BY bc.cuv DESC, bc.u, bc.v LIMIT 4000),
      |sc AS (SELECT bi.doc_id,
      |         log10((coalesce(tb.cuv, 0) + 1) / (coalesce(tc.cu, 0) + vsz.vv)) AS lp
      |       FROM bi
      |       LEFT JOIN topbi tb ON bi.u = tb.u AND bi.v = tb.v
      |       LEFT JOIN topcx tc ON bi.u = tc.u
      |       CROSS JOIN vsz),
      |scored AS (SELECT doc_id, round(avg(lp), 4) AS mlp FROM sc GROUP BY 1),
      |thr AS (SELECT round(avg(mlp), 4) AS av FROM scored),
      |bkept AS (SELECT k.doc_id, k.source FROM kept k
      |          JOIN scored USING (doc_id) CROSS JOIN thr
      |          WHERE scored.mlp >= thr.av),
      |c AS (SELECT source, count(*) * 1.0 AS ns FROM bkept GROUP BY source),
      |dn AS (SELECT sum(pow(ns, 0.5)) AS den, sum(ns) AS nn FROM c),
      |fr AS (SELECT source, least(1.0, pow(ns, 0.5) / dn.den * 0.5 * dn.nn / ns) AS kf
      |       FROM c CROSS JOIN dn),
      |sampled AS (SELECT b.doc_id FROM bkept b JOIN fr ON b.source = fr.source
      |  WHERE ('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |          / 4294967296.0 < fr.kf)""".stripMargin
  }

  // NB: the chain is CONCATENATED, never re-interpolated under a
  // second stripMargin — the chain's SQL `||` continuation lines begin
  // with a pipe, and a second strip silently eats one of them
  lazy val curation6Oracle: String = curation6ChainSql + "\n" +
    """SELECT stage, n_docs FROM (
      |  SELECT 'a_input' AS stage, count(*) AS n_docs FROM planted
      |  UNION ALL SELECT 'b_encoding', count(*) FROM encok
      |  UNION ALL SELECT 'c_line', count(*) FROM cleaned
      |  UNION ALL SELECT 'd_decon', count(*) FROM deconned
      |  UNION ALL SELECT 'e_gates', count(*) FROM gated
      |  UNION ALL SELECT 'f_keeper', count(*) FROM kept
      |  UNION ALL SELECT 'g_bigram', count(*) FROM bkept
      |  UNION ALL SELECT 'h_sampled', count(*) FROM sampled)
      |ORDER BY stage""".stripMargin

  // --- Encoding quality -------------------------------------------------
  // The corpus is clean UTF-8, so decode damage is PLANTED identically
  // on both sides: replacement chars (decode-error proof), a sprinkle
  // of control chars (ratio below the gate), and a control-char flood
  // (ratio above it).

  private val encPlantSql =
    """text || CASE WHEN doc_id % 11 = 0 THEN ' bad' || chr(65533) || chr(65533)
      |  WHEN doc_id % 13 = 5 THEN ' ' || repeat(chr(7), 40)
      |  WHEN doc_id % 17 = 3 THEN ' x' || chr(1) || 'y' ELSE '' END"""
      .stripMargin.replace("\n", " ")

  private def encPlanted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 11 === 0, lit(" bad\uFFFD\uFFFD"))
        .when(col("doc_id") % 13 === 5, lit(" " + "\u0007" * 40))
        .when(col("doc_id") % 17 === 3, lit(" x\u0001y"))
        .otherwise(lit(""))).as("text"))

  /** Encoding-quality gate over the planted corpus. */
  def encodingGate(spark: SparkSession, dir: String): DataFrame = {
    val (nRepl, nCtrl, ratio, keep) =
      TextAnalysis.encodingQuality(col("text"))
    encPlanted(spark, dir).select(col("doc_id"), nRepl.as("n_repl"),
        nCtrl.as("n_ctrl"), ratio.as("bad_ratio"), keep.as("keep"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  val encodingGateOracle: String = {
    // the runtime constant already holds single-backslash \xNN escapes,
    // which RE2 (DuckDB) reads identically to Java
    val ctl = graft.ops.TextAnalysis.ControlCharRe
    s"""WITH planted AS (SELECT doc_id, $encPlantSql AS text FROM documents),
      |m AS (SELECT doc_id, length(text) AS n,
      |        length(text) - length(regexp_replace(text, chr(65533), '', 'g'))
      |          AS n_repl,
      |        length(text) - length(regexp_replace(text, '$ctl', '', 'g'))
      |          AS n_ctrl
      |      FROM planted)
      |SELECT doc_id, CAST(n_repl AS BIGINT) AS n_repl,
      |  CAST(n_ctrl AS BIGINT) AS n_ctrl,
      |  round((n_repl + n_ctrl) * 1.0 / greatest(n, 1), 4) AS bad_ratio,
      |  n_repl = 0 AND (n_repl + n_ctrl) * 1.0 / greatest(n, 1) <= 0.01 AS keep
      |FROM m ORDER BY doc_id""".stripMargin
  }

  // --- Line-level dedup ------------------------------------------------
  // The corpus is single-line, so the query PLANTS lines identically on
  // both sides: a unique per-doc marker (must survive), two boilerplate
  // lines shared across many docs (must drop), and a case/whitespace
  // variant pair normalizing to one key (must drop via normalization).

  // single-line (embedded into a stripMargin oracle — a leading "||"
  // after a newline would be eaten as a margin)
  private val linePlantSql: String =
    """text || chr(10) || 'marker ' || doc_id
      |  || CASE WHEN doc_id % 3 = 0
      |       THEN chr(10) || 'Subscribe to our newsletter!' ELSE '' END
      |  || CASE WHEN doc_id % 5 = 1
      |       THEN chr(10) || 'Terms of service apply.' ELSE '' END
      |  || CASE WHEN doc_id % 7 = 2
      |       THEN chr(10) || 'follow us on social media'
      |         || chr(10) || 'Follow us on social media  ' ELSE '' END"""
      .stripMargin.replace("\n", " ")

  private def linePlanted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      concat(col("text"),
        lit("\nmarker "), col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0,
          lit("\nSubscribe to our newsletter!")).otherwise(lit("")),
        when(col("doc_id") % 5 === 1,
          lit("\nTerms of service apply.")).otherwise(lit("")),
        when(col("doc_id") % 7 === 2,
          lit("\nfollow us on social media\nFollow us on social media  "))
          .otherwise(lit(""))).as("text"))

  /** C4-style corpus-wide line dedup over the planted corpus. */
  def lineDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.lineDedup(linePlanted(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  val lineDedupOracle: String =
    s"""WITH planted AS (SELECT doc_id, $linePlantSql AS text FROM documents),
      |l AS (SELECT doc_id,
      |        unnest(string_split(text, chr(10))) AS line,
      |        unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      |      FROM planted),
      |k AS (SELECT doc_id, pos, line, lower(trim(line)) AS key FROM l),
      |occ AS (SELECT key, count(*) AS c FROM k GROUP BY 1),
      |kept AS (SELECT k.doc_id, k.pos, k.line
      |         FROM k JOIN occ USING (key) WHERE occ.c <= 1),
      |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
      |          count(*) AS n_kept FROM kept GROUP BY 1),
      |n AS (SELECT doc_id,
      |        len(string_split(text, chr(10))) AS n_lines FROM planted)
      |SELECT n.doc_id, coalesce(agg.clean_text, '') AS clean_text,
      |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(n.n_lines - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped
      |FROM n LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Paragraph-level dedup — [[graft.ops.Dedup.paragraphDedup]], the
    * separator-generalized lineDedup at RefinedWeb's other boilerplate
    * unit. The corpus is single-line, so the query PLANTS paragraphs
    * on both sides: a hot boilerplate paragraph on every `%4==1` doc
    * (must drop from all of them) and an intra-document repeated
    * unique paragraph on `%9==5` docs (repeats inside one doc count
    * too); each doc's own word-salad body stays. */
  private val paraPlantSql =
    """text || CASE WHEN doc_id % 4 = 1
      |  THEN chr(10) || chr(10) || 'Subscribe to our newsletter today'
      |  ELSE '' END
      |  || CASE WHEN doc_id % 9 = 5
      |  THEN repeat(chr(10) || chr(10) || 'twice para ' || doc_id, 2)
      |  ELSE '' END""".stripMargin.replace("\n", " ")

  private def paraPlanted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 4 === 1,
          lit("\n\nSubscribe to our newsletter today")).otherwise(lit("")),
        when(col("doc_id") % 9 === 5,
          concat(lit("\n\ntwice para "), col("doc_id"),
            lit("\n\ntwice para "), col("doc_id"))).otherwise(lit("")))
        .as("text"))

  def paraDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.paragraphDedup(paraPlanted(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  val paraDedupOracle: String =
    s"""WITH planted AS (SELECT doc_id, $paraPlantSql AS text FROM documents),
      |l AS (SELECT doc_id,
      |        unnest(string_split(text, chr(10) || chr(10))) AS line,
      |        unnest(range(1, len(string_split(text, chr(10) || chr(10))) + 1)) AS pos
      |      FROM planted),
      |k AS (SELECT doc_id, pos, line, lower(trim(line)) AS key FROM l),
      |occ AS (SELECT key, count(*) AS c FROM k GROUP BY 1),
      |kept AS (SELECT k.doc_id, k.pos, k.line
      |         FROM k JOIN occ USING (key) WHERE occ.c <= 1),
      |agg AS (SELECT doc_id,
      |          string_agg(line, chr(10) || chr(10) ORDER BY pos) AS clean_text,
      |          count(*) AS n_kept FROM kept GROUP BY 1),
      |n AS (SELECT doc_id,
      |        len(string_split(text, chr(10) || chr(10))) AS n_lines FROM planted)
      |SELECT n.doc_id, coalesce(agg.clean_text, '') AS clean_text,
      |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(n.n_lines - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped
      |FROM n LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  // --- Exact substring dedup (ExactSubstr, Lee et al. 2022) ------------
  // The corpus is word-salad with no repeated spans, so the query
  // PLANTS them identically on both sides: a cross-document repeated
  // 9-token tail (every copy must vanish, 2 overlapping hot 8-grams
  // merging into one span) and an intra-document doubled 9-token run
  // (repeats inside one doc count too). Body tokens stay: grams
  // STARTING in the unique body don't repeat even when they extend
  // into the planted tail.

  private val substrPlantSql =
    """text || CASE WHEN doc_id % 6 = 3
      |  THEN ' legal notice the terms of service apply here today' ELSE '' END
      |  || CASE WHEN doc_id % 10 = 2
      |  THEN ' rep one two three four five six seven eight'
      |    || ' rep one two three four five six seven eight' ELSE '' END"""
      .stripMargin.replace("\n", " ")

  private def substrPlanted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 6 === 3,
          lit(" legal notice the terms of service apply here today"))
          .otherwise(lit("")),
        when(col("doc_id") % 10 === 2,
          lit(" rep one two three four five six seven eight" +
            " rep one two three four five six seven eight"))
          .otherwise(lit(""))).as("text"))

  /** Corpus-wide repeated-substring removal over the planted corpus. */
  def substrDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.exactSubstringDedup(substrPlanted(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  val substrDedupOracle: String =
    s"""WITH planted AS (SELECT doc_id, $substrPlantSql AS text FROM documents),
      |tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM planted),
      |tok AS (SELECT doc_id, unnest(w) AS tok,
      |          unnest(range(1, len(w) + 1)) AS pos FROM tk),
      |gr AS (SELECT doc_id,
      |         unnest(CASE WHEN len(w) >= 8 THEN list_transform(
      |             range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' '))
      |           ELSE [] END) AS gram,
      |         unnest(CASE WHEN len(w) >= 8 THEN range(1, len(w) - 6)
      |           ELSE [] END) AS gpos
      |       FROM tk),
      |occ AS (SELECT gram, count(*) AS c FROM gr GROUP BY 1),
      |hot AS (SELECT gr.doc_id, gr.gpos FROM gr JOIN occ USING (gram)
      |        WHERE occ.c > 1),
      |fl AS (SELECT tok.doc_id, tok.pos, tok.tok,
      |         CASE WHEN hot.gpos IS NOT NULL THEN 1 ELSE 0 END AS hs
      |       FROM tok LEFT JOIN hot
      |         ON tok.doc_id = hot.doc_id AND tok.pos = hot.gpos),
      |cov AS (SELECT doc_id, pos, tok,
      |          max(hs) OVER (PARTITION BY doc_id ORDER BY pos
      |            RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS cv
      |        FROM fl),
      |agg AS (SELECT doc_id,
      |          string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE cv = 0)
      |            AS clean_text,
      |          count(*) AS n_tokens,
      |          count(*) FILTER (WHERE cv = 1) AS n_removed
      |        FROM cov GROUP BY 1)
      |SELECT doc_id, coalesce(clean_text, '') AS clean_text,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_removed AS BIGINT) AS n_removed
      |FROM agg ORDER BY doc_id""".stripMargin

  /** BM25 top-10 for a fixed three-term query (k1 = 1.2, b = 0.75) —
    * corpus search over the curated store. Scale shape: the token
    * stream is filtered to the QUERY terms before any shuffle (the tf
    * groupBy sees ~query-term-df rows, not the corpus token count);
    * document-frequency and the (N, avgdl) scalars are tiny frames
    * broadcast back; the corpus is scanned once. Scores round to 4dp
    * with doc_id tie-break — same float-determinism contract as the
    * jaccard/quality queries. */
  /** (doc_id, 4dp score) for every doc matching >= 1 term — shared by
    * [[bm25]] and [[hybridSearch]]. */
  private def bm25Scores(spark: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val d = docs(spark, dir).select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("tk"))
      .withColumn("dl", size(col("tk")).cast("double"))
    val stats = d.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    // tf is df-sized (query-term rows only) but derives from a full
    // corpus scan; persisting it keeps the dfreq agg from re-planning
    // that scan (one corpus pass for tf + one for the stats scalars)
    val tf = Dedup.persistTracked(
      d.select(col("doc_id"), col("dl"), explode(col("tk")).as("t"))
        .filter(col("t").isin(terms: _*))
        .groupBy("doc_id", "dl", "t")
        .agg(count(lit(1)).cast("double").as("tf")))
    val dfreq = tf.groupBy("t")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    tf.join(broadcast(dfreq), "t").crossJoin(broadcast(stats))
      .withColumn("w",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum(col("w")), 4).as("score"))
  }

  def bm25(spark: SparkSession, dir: String): DataFrame =
    bm25Scores(spark, dir, Seq("hash", "join", "vector"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)

  val bm25Oracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |dl AS (SELECT doc_id, len(tk) * 1.0 AS dl FROM d),
      |stats AS (SELECT count(*) * 1.0 AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, t, count(*) * 1.0 AS tf
      |       FROM (SELECT doc_id, unnest(tk) AS t FROM d)
      |       WHERE t IN ('hash', 'join', 'vector') GROUP BY 1, 2),
      |df AS (SELECT t, count(DISTINCT doc_id) * 1.0 AS df FROM tf GROUP BY 1)
      |SELECT tf.doc_id, round(sum(
      |    ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) *
      |    tf.tf * (1.2 + 1) /
      |    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))), 4) AS score
      |FROM tf JOIN df USING (t) JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN stats s
      |GROUP BY tf.doc_id
      |ORDER BY score DESC, tf.doc_id LIMIT 10""".stripMargin

  /** Hybrid retrieval: BM25 lexical candidates re-ranked with the
    * in-engine hashing embedder, fused by reciprocal-rank fusion
    * (RRF, k = 60) — the standard two-tower hybrid without any
    * external model. Scale shape: BM25 prunes the corpus to a 50-doc
    * candidate set (broadcast semi-join), so the embedding pass runs
    * over 50 docs, not the corpus; the query's own vector comes from
    * the SAME `hashEmbedSparse` pipeline over a one-row frame. RRF is
    * rank-based, so fusion never mixes raw score scales (integer
    * ranks; the only floats are the final 1/(60+r) sums, rounded).
    * The 50-row rank windows are single-partition by construction —
    * the candidate set is the contract, not the corpus. */
  def hybridSearch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("hash", "join", "vector")
    val cand = bm25Scores(spark, dir, terms)
      .orderBy(col("score").desc, col("doc_id")).limit(50)
    val candDocs = docs(spark, dir)
      .join(broadcast(cand.select("doc_id")), Seq("doc_id"), "left_semi")
    val dv = TextAnalysis.hashEmbedSparse(candDocs)
    val q = spark.range(1).select(lit(0L).as("doc_id"),
      lit(terms.mkString(" ")).as("text"))
    val qv = TextAnalysis.hashEmbedSparse(q)
      .select(col("b"), col("v").as("qv"))
    val cos = dv.join(broadcast(qv), Seq("b"))
      .groupBy("doc_id").agg(round(sum(col("v") * col("qv")), 4).as("cos"))
    val wb = Window.orderBy(col("score").desc, col("doc_id"))
    val wc = Window.orderBy(col("cos").desc, col("doc_id"))
    cand.join(cos, Seq("doc_id"), "left")
      .withColumn("cos", coalesce(col("cos"), lit(0.0)))
      .withColumn("rb", row_number().over(wb))
      .withColumn("rc", row_number().over(wc))
      .withColumn("rrf", round(lit(1.0) / (lit(60.0) + col("rb")) +
        lit(1.0) / (lit(60.0) + col("rc")), 6))
      .select("doc_id", "score", "cos", "rrf")
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
  }

  val hybridSearchOracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |dl AS (SELECT doc_id, len(tk) * 1.0 AS dl FROM d),
      |stats AS (SELECT count(*) * 1.0 AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, t, count(*) * 1.0 AS tf
      |       FROM (SELECT doc_id, unnest(tk) AS t FROM d)
      |       WHERE t IN ('hash', 'join', 'vector') GROUP BY 1, 2),
      |df AS (SELECT t, count(DISTINCT doc_id) * 1.0 AS df FROM tf GROUP BY 1),
      |bm AS (SELECT tf.doc_id, round(sum(
      |    ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * tf.tf * (1.2 + 1) /
      |    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))), 4) AS score
      |  FROM tf JOIN df USING (t) JOIN dl ON tf.doc_id = dl.doc_id
      |    CROSS JOIN stats s GROUP BY tf.doc_id),
      |cand AS (SELECT doc_id, score FROM bm ORDER BY score DESC, doc_id LIMIT 50),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
      |        WHERE doc_id IN (SELECT doc_id FROM cand)),
      |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok),
      |w AS (SELECT doc_id, CAST(h % 64 AS BIGINT) AS b,
      |        sum(CASE WHEN (h >> 62) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS w
      |      FROM th GROUP BY 1, 2),
      |nn AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
      |dv AS (SELECT w.doc_id, b,
      |         round(CASE WHEN nrm > 0 THEN w / nrm ELSE 0 END, 4) AS v
      |       FROM w JOIN nn ON w.doc_id = nn.doc_id),
      |qth AS (SELECT ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h
      |        FROM (SELECT unnest(['hash', 'join', 'vector']) AS t)),
      |qw AS (SELECT CAST(h % 64 AS BIGINT) AS b,
      |         sum(CASE WHEN (h >> 62) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS w
      |       FROM qth GROUP BY 1),
      |qn AS (SELECT sqrt(sum(w * w)) AS nrm FROM qw),
      |qv AS (SELECT b, round(CASE WHEN qn.nrm > 0 THEN w / qn.nrm ELSE 0 END, 4) AS qv
      |       FROM qw CROSS JOIN qn),
      |cs AS (SELECT dv.doc_id, round(sum(dv.v * qv.qv), 4) AS cos
      |       FROM dv JOIN qv USING (b) GROUP BY 1),
      |j AS (SELECT cand.doc_id, cand.score, COALESCE(cs.cos, 0.0) AS cos
      |      FROM cand LEFT JOIN cs ON cand.doc_id = cs.doc_id),
      |r AS (SELECT doc_id, score, cos,
      |        row_number() OVER (ORDER BY score DESC, doc_id) AS rb,
      |        row_number() OVER (ORDER BY cos DESC, doc_id) AS rc
      |      FROM j)
      |SELECT doc_id, score, cos,
      |  round(1.0 / (60 + rb) + 1.0 / (60 + rc), 6) AS rrf
      |FROM r ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  /** Token-budget shard packing profile (budget 10k tokens, small
    * bucket width so the two-level prefix sum exercises multiple
    * buckets even at sf0.001). Oracle = the straightforward global
    * running sum — DuckDB can afford single-threaded semantics; the
    * engine must not ([[graft.ops.Packing]]). */
  def packShards(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.shardProfile(docs(spark, dir), budget = 10000L,
        bucketWidth = 64L)
      .transform(QueryUtil.ordered("shard"))

  val packShardsOracle: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents)
      |SELECT CAST((cum - n) // 10000 AS BIGINT) AS shard,
      |  count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS n_tokens
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Release-shard manifest ([[graft.ops.Release.manifest]]): per
    * token-budgeted shard, doc count, token total, and the
    * order-independent bit-XOR content checksum of per-doc md5-low64
    * fingerprints. The oracle replays the single-threaded prefix-sum
    * shard assignment (the tx_pack_shards contract) plus the same
    * rollup, XOR-folding in unsigned space and converting the one
    * final value to the engine's signed 64-bit domain. */
  def releaseManifest(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Release.manifest(docs(spark, dir), budget = 10000L)
      .transform(QueryUtil.ordered("shard"))

  /** The manifest replay (prefix-sum shard assignment → per-shard
    * rollup → unsigned-XOR → one signed conversion) over any source
    * CTE — the ONE copy both `tx_release_manifest` and `tx_curation9`
    * chain onto, so the replay cannot fork between them. */
  private def manifestSqlTail(srcCte: String, budget: Long): String =
    s"""pt AS (SELECT doc_id, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM $srcCte),
      |ps AS (SELECT doc_id, text, n,
      |        CAST((cum - n) // $budget AS BIGINT) AS shard FROM pt),
      |pf AS (SELECT shard, n,
      |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
      |          coalesce(text, '')), 1, 16))::UBIGINT AS fp
      |      FROM ps),
      |pg AS (SELECT shard, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
      |        bit_xor(fp) AS h FROM pf GROUP BY 1)
      |SELECT shard, n_docs, n_tokens,
      |  CAST(h::HUGEINT - CASE WHEN h >= 9223372036854775808::UBIGINT
      |    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
      |    AS content_hash
      |FROM pg ORDER BY shard""".stripMargin

  lazy val releaseManifestOracle: String =
    "WITH " + manifestSqlTail("documents", 10000L)

  /** Incremental release manifest over the planted v1→v2 delta (the
    * [[incremental]] corpus construction restricted to the columns a
    * release reads): v1's per-doc stats are carried, only the delta's
    * text is re-read, and the result must EQUAL a full repack of v2 —
    * which is exactly what the oracle computes, so the
    * equals-full-repack contract IS the correctness check. See
    * [[graft.ops.Release.incrementalManifest]]. */
  def incrementalRelease(spark: SparkSession, dir: String): DataFrame = {
    val v1 = docs(spark, dir).select(col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    graft.ops.Release.incrementalManifest(v1,
        graft.ops.Release.docStats(v1), v2, budget = 10000L)
      .transform(QueryUtil.ordered("shard"))
  }

  lazy val incrementalReleaseOracle: String =
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0),
      |""".stripMargin + manifestSqlTail("v2", 10000L)

  /** Bigram-LM quality scoring (word-order-sensitive — see
    * [[graft.ops.TextAnalysis.bigramLogProb]]). */
  def bigramLogProb(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogProb(docs(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  val bigramLogProbOracle: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bi AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS u, unnest(w[2:len(w)]) AS v
      |       FROM tk WHERE len(w) >= 2),
      |bc AS (SELECT u, v, count(*) * 1.0 AS cuv FROM bi GROUP BY 1, 2),
      |cx AS (SELECT u, sum(cuv) AS cu FROM bc GROUP BY 1),
      |topcx AS (SELECT u, cu FROM cx ORDER BY cu DESC, u LIMIT 1000),
      |vsz AS (SELECT count(*) * 1.0 AS vv FROM topcx),
      |topbi AS (SELECT bc.u, bc.v, bc.cuv FROM bc JOIN topcx ON bc.u = topcx.u
      |          ORDER BY bc.cuv DESC, bc.u, bc.v LIMIT 4000),
      |sc AS (SELECT bi.doc_id,
      |         log10((coalesce(tb.cuv, 0) + 1) / (coalesce(tc.cu, 0) + vsz.vv)) AS lp
      |       FROM bi
      |       LEFT JOIN topbi tb ON bi.u = tb.u AND bi.v = tb.v
      |       LEFT JOIN topcx tc ON bi.u = tc.u
      |       CROSS JOIN vsz),
      |agg AS (SELECT doc_id, round(avg(lp), 4) AS mean_log10p FROM sc GROUP BY 1)
      |SELECT d.doc_id, agg.mean_log10p
      |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** The Gopher rule battery at its published thresholds (see
    * [[graft.ops.TextAnalysis.gopherRules]]) — per-rule columns plus
    * the conjunction, so the oracle checks every rule's arithmetic
    * independently, not just the final boolean. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(docs(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  val gopherRulesOracle: String =
    """WITH b AS (SELECT doc_id, text,
      |    string_split(text, ' ') AS w,
      |    string_split(text, chr(10)) AS ln FROM documents),
      |c AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_words,
      |  round(list_aggregate(list_transform(w, x -> length(x)), 'sum')
      |    * 1.0 / len(w), 4) AS mean_word_len,
      |  round(((strlen(text) - strlen(replace(text, '#', ''))) +
      |    (strlen(text) - strlen(replace(text, '...', ''))) / 3 +
      |    (length(text) - length(replace(text, '…', ''))))
      |    * 1.0 / len(w), 4) AS symbol_ratio,
      |  round(len(list_filter(ln, l -> l LIKE '- %' OR l LIKE '* %'
      |    OR l LIKE '•%')) * 1.0 / len(ln), 4) AS bullet_line_frac,
      |  round(len(list_filter(ln, l -> l LIKE '%...' OR l LIKE '%…'))
      |    * 1.0 / len(ln), 4) AS ellipsis_line_frac,
      |  round(len(list_filter(w, x -> regexp_matches(lower(x), '[a-z]')))
      |    * 1.0 / len(w), 4) AS alpha_word_frac,
      |  CAST(len(list_filter(w, x -> lower(x) IN ('the','be','to','of',
      |    'and','that','have','with'))) AS BIGINT) AS n_stop_hits
      |  FROM b)
      |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
      |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits,
      |  (n_words >= 50 AND n_words <= 100000
      |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
      |    AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
      |    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
      |    AND n_stop_hits >= 2) AS gopher_pass
      |FROM c ORDER BY doc_id""".stripMargin

  /** C4 line/page filtering over PLANTED multi-line text (the corpus
    * is single-line and unpunctuated, so the raw gate would be
    * vacuous — the tokenizer-probe lesson): doc_id%7 appends a line
    * block exercising one branch each (3 keepable sentences; a lorem
    * ipsum page; a curly-brace code page; a page with only 1 keepable
    * line — which also fails the 3-sentence page rule; a page whose
    * "javascript" boilerplate line is dropped but whose page
    * survives; a bad-word page; a quote-terminal page whose bare-'"'
    * kept line counts as one sentence), replayed verbatim by the
    * oracle.
    * Output pins the kept-line arithmetic, the sentence count, the
    * page flags AND the cleaned text content (md5). */
  private val C4Segments: Seq[(Int, String)] = Seq(
    0 -> ("\nThis line has five good words.\nshort line\n" +
      "Another proper sentence ends right here!\n" +
      "And a third full sentence follows here."),
    1 -> ("\nlorem ipsum dolor sit amet here.\n" +
      "This sentence is long enough to keep.\n" +
      "Another good long sentence ends with punctuation.\n" +
      "Third full sentence present and accounted for."),
    2 -> ("\nfunction f() { return 1; }\n" +
      "This sentence is long enough to keep.\n" +
      "Another good long sentence ends with punctuation.\n" +
      "Third full sentence present and accounted for."),
    3 -> ("\nOnly one proper sentence lives right here.\n" +
      "no terminal punct\nshort.\nalso nothing"),
    4 -> ("\nEnable JavaScript to view this page properly.\n" +
      "This sentence is long enough to keep.\n" +
      "Another good long sentence ends with punctuation.\n" +
      "Third full sentence present and accounted for."),
    5 -> ("\nThis spam page mentions viagra deals today.\n" +
      "This sentence is long enough to keep.\n" +
      "Another good long sentence ends with punctuation.\n" +
      "Third full sentence present and accounted for."),
    // r14: quote-terminal sentences — a bare-'"' kept line counts as
    // ONE sentence (the closed undercount); a '!"' ending is counted
    // by its mark, not the quote rule (no double count)
    6 -> ("\nHe said the words \"this is fine today\"\n" +
      "\"An entire quoted sentence stands here!\"\n" +
      "Another proper sentence ends right here."))

  def c4Rules(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).withColumn("text", concat(col("text"),
      C4Segments.foldRight(lit("")) { case ((m, seg), acc) =>
        when(col("doc_id") % C4Segments.size === m, lit(seg)).otherwise(acc)
      }))
    TextAnalysis.c4Rules(planted)
      .select(col("doc_id"), col("n_lines"), col("n_kept_lines"),
        col("has_lorem"), col("has_brace"), col("has_badword"),
        col("n_sentences"),
        length(col("clean_text")).cast("long").as("clean_len"),
        md5(col("clean_text").cast("binary")).as("clean_md5"),
        col("c4_keep"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  val c4RulesOracle: String = {
    val caseSql = C4Segments.map { case (m, seg) =>
      s"WHEN doc_id % ${C4Segments.size} = $m THEN '${seg.replace("\n", "' || chr(10) || '")}'"
    }.mkString("CASE ", " ", " ELSE '' END")
    val badIn = TextAnalysis.DefaultBadwords
      .map(w => s"'$w'").mkString("(", ", ", ")")
    s"""WITH p AS (SELECT doc_id, text || $caseSql AS text FROM documents),
      |b AS (SELECT doc_id, text, string_split(text, chr(10)) AS ln FROM p),
      |f AS (SELECT doc_id, CAST(len(ln) AS BIGINT) AS n_lines,
      |    list_filter(ln, l -> (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?'
      |      OR l LIKE '%"') AND len(string_split(l, ' ')) >= 5
      |      AND NOT contains(lower(l), 'javascript')) AS kept,
      |    contains(lower(text), 'lorem ipsum') AS has_lorem,
      |    (contains(text, '{') OR contains(text, '}')) AS has_brace,
      |    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |      x -> x IN $badIn)) > 0 AS has_badword
      |  FROM b),
      |g AS (SELECT doc_id, n_lines, kept, has_lorem, has_brace, has_badword,
      |    array_to_string(kept, chr(10)) AS clean,
      |    len(list_filter(kept, l -> l LIKE '%"' AND NOT (l LIKE '%."'
      |      OR l LIKE '%!"' OR l LIKE '%?"'))) AS n_quote_lines FROM f)
      |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept_lines,
      |  has_lorem, has_brace, has_badword,
      |  CAST(length(clean) - length(regexp_replace(clean, '[.!?]', '', 'g'))
      |    + n_quote_lines AS BIGINT) AS n_sentences,
      |  CAST(length(clean) AS BIGINT) AS clean_len,
      |  md5(clean) AS clean_md5,
      |  (NOT has_lorem AND NOT has_brace AND NOT has_badword
      |    AND length(clean) - length(regexp_replace(clean, '[.!?]', '', 'g'))
      |      + n_quote_lines >= 3
      |    AND len(kept) >= 3) AS c4_keep
      |FROM g ORDER BY doc_id""".stripMargin
  }

  /** The Gopher repetition battery (see
    * [[graft.ops.TextAnalysis.gopherRepetition]]); the oracle replays
    * the gram fan-out, the count reduction, the lexicographic
    * tie-broken top gram and every char-fraction division, with the
    * thresholds generated from the SAME
    * [[graft.ops.TextAnalysis.GopherRepThresholds]] map the engine
    * gates on. */
  def gopherRepetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRepetition(docs(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  val gopherRepetitionOracle: String = {
    val th = TextAnalysis.GopherRepThresholds
    val gramBranches = (2 to 10).map { n =>
      s"""SELECT doc_id, $n AS n, array_to_string(w[i:i+${n - 1}], ' ') AS g
         |  FROM tk, LATERAL (SELECT unnest(range(1, len(w) - $n + 2)) AS i)
         |  WHERE len(w) >= $n""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val pivCols = (2 to 10).map { n =>
      s"max(CASE WHEN n = $n THEN v END) AS m$n"
    }.mkString(",\n  ")
    def colName(n: Int) =
      if (n <= 4) s"top${n}gram_char_frac" else s"dup${n}gram_char_frac"
    val fracCols = (2 to 10).map { n =>
      s"round(least(coalesce(m$n, 0) * 1.0 / nc, 1.0), 4) AS ${colName(n)}"
    }.mkString(",\n  ")
    val passExpr = (2 to 10).map { n =>
      s"round(least(coalesce(m$n, 0) * 1.0 / nc, 1.0), 4) <= ${th(n)}"
    }.mkString("(", " AND ", ")")
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  $gramBranches),
      |cnts AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3),
      |vals AS (
      |  SELECT doc_id, n, c * length(g) AS v FROM (
      |    SELECT doc_id, n, g, c, row_number() OVER (
      |      PARTITION BY doc_id, n ORDER BY c DESC, g) AS rk FROM cnts) z
      |  WHERE rk = 1 AND n <= 4
      |  UNION ALL
      |  SELECT doc_id, n, sum(c * length(g)) AS v FROM cnts
      |  WHERE c > 1 AND n >= 5 GROUP BY 1, 2),
      |piv AS (SELECT doc_id,
      |  $pivCols
      |  FROM vals GROUP BY doc_id),
      |m AS (SELECT doc_id, length(text) AS nc FROM documents)
      |SELECT m.doc_id,
      |  $fracCols,
      |  $passExpr AS rep_pass
      |FROM m LEFT JOIN piv USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Kneser–Ney bigram quality scoring (see
    * [[graft.ops.TextAnalysis.knBigramLogProb]]) — the smoothing
    * variant LM-perplexity filters actually use; oracle replays the
    * full count/context/continuation model and the interpolated
    * estimate term-for-term. */
  def knBigram(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.knBigramLogProb(docs(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))

  /** The KN model + per-doc scoring replay over any (doc_id, text)
    * relation `src` — ends at `knagg(doc_id, kn_log10p)`. The ONE copy
    * both `tx_kn_bigram` and `tx_curation13` chain onto, so the
    * smoothing replay cannot fork between them. */
  private def knSqlCtes(src: String): String =
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
      |bi AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS u, unnest(w[2:len(w)]) AS v
      |       FROM tk WHERE len(w) >= 2),
      |bc AS (SELECT u, v, count(*) * 1.0 AS cuv FROM bi GROUP BY 1, 2),
      |cx AS (SELECT u, sum(cuv) AS cu, count(*) * 1.0 AS n1u FROM bc GROUP BY 1),
      |ct AS (SELECT v, count(*) * 1.0 AS n1v FROM bc GROUP BY 1),
      |tt AS (SELECT count(*) * 1.0 AS n1tot FROM bc),
      |sc AS (SELECT bi.doc_id,
      |         log10(greatest(bc.cuv - 0.75, 0) / cx.cu +
      |           0.75 * cx.n1u / cx.cu * ct.n1v / tt.n1tot) AS lp
      |       FROM bi JOIN bc USING (u, v) JOIN cx USING (u)
      |       JOIN ct USING (v) CROSS JOIN tt),
      |knagg AS (SELECT doc_id, round(avg(lp), 4) AS kn_log10p FROM sc GROUP BY 1)""".stripMargin

  val knBigramOracle: String =
    s"""WITH ${knSqlCtes("documents")}
      |SELECT d.doc_id, knagg.kn_log10p
      |FROM documents d LEFT JOIN knagg USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Per-doc shard + within-shard token position (sample-boundary
    * metadata for attention masking across packed documents). */
  def packPositions(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.packWithPositions(docs(spark, dir), budget = 10000L,
        bucketWidth = 64L)
      .transform(QueryUtil.ordered("doc_id"))

  val packPositionsOracle: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents),
      |g AS (SELECT doc_id, n, cum - n AS gp,
      |        CAST((cum - n) // 10000 AS BIGINT) AS shard FROM t)
      |SELECT doc_id, n AS n_tokens, shard,
      |  CAST(gp - min(gp) OVER (PARTITION BY shard) AS BIGINT) AS pos
      |FROM g ORDER BY doc_id""".stripMargin

  /** Split-mode packing: exact fixed-size shards, docs sliced across
    * boundaries (slice ranges are doc-relative token offsets). */
  def packSplit(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.packWithSplitting(docs(spark, dir), budget = 10000L,
        bucketWidth = 64L)
      .transform(QueryUtil.ordered("doc_id", "shard"))

  val packSplitOracle: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents),
      |g AS (SELECT doc_id, n, CAST(cum - n AS BIGINT) AS gp FROM t),
      |e AS (SELECT doc_id, n, gp,
      |        unnest(range(gp // 10000, (gp + n - 1) // 10000 + 1)) AS shard
      |      FROM g)
      |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
      |  CAST(greatest(shard * 10000 - gp, 0) AS BIGINT) AS slice_start,
      |  CAST(least((shard + 1) * 10000 - gp, n)
      |    - greatest(shard * 10000 - gp, 0) AS BIGINT) AS slice_len
      |FROM e ORDER BY doc_id, shard""".stripMargin

  // --- Tokenizer-contract probes --------------------------------------
  // The synthetic corpus is whitespace-bland (no punctuation runs, no
  // double spaces), so token-sensitive oracle rows could be green by
  // corpus luck rather than by tokenizer agreement. These two queries
  // append punctuation / underscore / multi-space / trailing-space
  // segments (deterministic per doc_id, replayed verbatim in the
  // oracle) so engine-vs-DuckDB tokenizer agreement is exercised on
  // divergence-probing text every round.

  private val ProbeSegments: Seq[(Int, String)] = Seq(
    0 -> " alpha,beta  gamma_delta! (x.y)",
    1 -> " multi  space   runs here",
    2 -> " trailing space ",
    3 -> " under_score mixed123tokens ,,;;")

  private def probedDocs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).withColumn("text", concat(col("text"),
      ProbeSegments.foldRight(lit("")) { case ((m, seg), acc) =>
        when(col("doc_id") % 5 === m, lit(seg)).otherwise(acc)
      }))

  private val probeCaseSql: String =
    ProbeSegments.map { case (m, seg) =>
      s"WHEN doc_id % 5 = $m THEN '$seg'"
    }.mkString("CASE ", " ", " ELSE '' END")

  /** Whitespace + BPE-ish token counts over the probed text. */
  def tokenizerProbe(spark: SparkSession, dir: String): DataFrame =
    probedDocs(spark, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        size(TextAnalysis.bpeishTokens(col("text"))).as("n_bpe"))
      .transform(QueryUtil.ordered("doc_id"))

  val tokenizerProbeOracle: String =
    s"""WITH p AS (SELECT doc_id, text || $probeCaseSql AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+')) AS INTEGER)
      |    AS n_bpe
      |FROM p ORDER BY doc_id""".stripMargin

  /** Shard packing over the probed text — de-lucks `tx_pack_shards`:
    * the engine's prefix sum and the oracle's global running sum must
    * agree on token counts of punctuation/multi-space docs too. */
  def packShardsProbe(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.shardProfile(probedDocs(spark, dir),
        budget = 10000L, bucketWidth = 64L)
      .transform(QueryUtil.ordered("shard"))

  val packShardsProbeOracle: String =
    s"""WITH p AS (SELECT doc_id, text || $probeCaseSql AS text
      |  FROM documents),
      |t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM p)
      |SELECT CAST((cum - n) // 10000 AS BIGINT) AS shard,
      |  count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS n_tokens
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Multimodal plumbing profile: binary payload + typed metadata,
    * plus the DECODER each row will route to ([[graft.ops.Multimodal
    * .plannedDecoder]] provenance — synthetic-feature rows are
    * filterable by `decoder = 'fake'`; the decode paths themselves are
    * exercised in MultimodalSpec, which also pins the Column mirror
    * used here against the Scala dispatch). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.withSyntheticMedia(docs(spark, dir))
      .select(col("media_id"), col("meta.mime").as("mime"),
        col("meta.byte_len").as("byte_len"),
        // MUST agree with Multimodal.chunked's layout: ceil, floored at
        // one chunk (a floor+1 formula disagreed with the actual chunk
        // rows for payloads that are exact multiples of the chunk size)
        greatest(ceil(col("meta.byte_len") / 256.0), lit(1))
          .cast("int").as("n_chunks"),
        graft.ops.Multimodal.decoderCol(col("meta.mime")).as("decoder"))
      .transform(QueryUtil.ordered("media_id"))

  val mediaMetaOracle: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  CAST(n_chars AS BIGINT) AS byte_len,
      |  CAST(greatest((n_chars + 255) // 256, 1) AS INTEGER) AS n_chunks,
      |  CASE WHEN doc_id % 3 = 0 THEN 'imageio'
      |       WHEN doc_id % 3 = 1 THEN 'wav'
      |       ELSE 'mp4-meta' END AS decoder
      |FROM documents ORDER BY media_id""".stripMargin

  /** Media chunk profile: every blob as fixed-size chunk rows — the
    * sharding step before parallel decode; oracle recomputes chunk
    * layout from byte lengths. */
  def mediaChunks(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.chunked(
        graft.ops.Multimodal.withSyntheticMedia(docs(spark, dir)),
        chunkBytes = 256)
      .select("media_id", "chunk_idx", "chunk_len")
      .transform(QueryUtil.ordered("media_id", "chunk_idx"))

  val mediaChunksOracle: String =
    """SELECT doc_id AS media_id, CAST(i AS INT) AS chunk_idx,
      |  CAST(least(256, strlen(text) - i * 256) AS INT) AS chunk_len
      |FROM documents,
      |  LATERAL (SELECT unnest(range(0,
      |    greatest(CAST(ceil(strlen(text) / 256.0) AS BIGINT), 1))) AS i)
      |ORDER BY media_id, chunk_idx""".stripMargin

  /** EXIF metadata over PLANTED real rotated JPEGs: each doc row
    * carries the [[graft.ops.Multimodal.exifFixture]] payload for
    * orientation `doc_id % 8 + 1` (8 driver-built byte arrays,
    * broadcast-joined onto the corpus — at 100 TB the payloads would
    * come from storage; the fixture plant is what makes the expected
    * values ORACLE-EXPRESSIBLE: orientation and display dims are known
    * by construction, so DuckDB checks the whole
    * JPEG-encode → APP1 splice → marker walk → TIFF IFD parse →
    * dim-swap chain without decoding a byte itself). byte_len is
    * codec-dependent (ImageIO's entropy coding) and deliberately NOT
    * in the output. */
  def exifMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (1 to 8)
      .map(o => (o.toLong, graft.ops.Multimodal.exifFixture(o)))
      .toDF("orient", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 8 + 1).as("orient"))
      .transform(QueryUtil.spreadScanIfThin(_, dir, "media_id"))
      .join(broadcast(fixtures), "orient")
      .select(col("media_id"), col("payload"),
        struct(lit("image/jpeg").as("mime"),
          octet_length(col("payload")).cast("long").as("byte_len"))
          .as("meta"))
    graft.ops.Multimodal.exifFeatures(media).toDF()
      .select("media_id", "exif_orientation", "width", "height")
      .transform(QueryUtil.ordered("media_id"))
  }

  val exifMetaOracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(doc_id % 8 + 1 AS INTEGER) AS exif_orientation,
      |  CAST(CASE WHEN doc_id % 8 + 1 >= 5 THEN 8 ELSE 16 END AS INTEGER)
      |    AS width,
      |  CAST(CASE WHEN doc_id % 8 + 1 >= 5 THEN 16 ELSE 8 END AS INTEGER)
      |    AS height
      |FROM documents ORDER BY media_id""".stripMargin

  /** WebDataset-style ustar shard member enumeration over PLANTED
    * archives: each doc row carries the
    * [[graft.ops.MediaFixtures.plantedTar]] shard for slot
    * `doc_id % 8` (slot m: m % 3 + 1 members named `f<m>_<k>.txt`,
    * sized 37·m + 300·k — the empty member at slot 0, multi-block
    * members from the 300·k term), the engine walks headers/checksums/
    * block rounding ([[graft.ops.Multimodal.TarWalk]]), and the oracle
    * states names, sizes and payload OFFSETS as pure doc_id
    * arithmetic — offset k = 512·(k+1) + Σ_{j<k} ceil(s_j/512)·512 —
    * without reading a byte. 8 driver-built shards, broadcast. */
  def tarMembers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedTar(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.tarMembers(media).toDF()
      .select("media_id", "member_idx", "name", "size", "offset")
      .transform(QueryUtil.ordered("media_id", "member_idx"))
  }

  /** MP4 keyframe seek index over PLANTED AVC/HEVC containers: each
    * doc row carries the [[graft.ops.MediaFixtures.plantedAvcMp4]]
    * container for slot `doc_id % 8` (slot m: m%4+3 samples sized
    * 100 + 17·m + 23·k, sync samples every m%3+2 — slot 7 omits `stss`
    * entirely, exercising the every-sample-is-sync spec rule; slots 2
    * and 6 are HEVC `hvc1`/`hvcC`, whose 30-byte-longer stsd entry
    * shifts the mdat base), the engine walks
    * `stss`/`stsz`/`stco`/`stsc` + `avcC`/`hvcC`
    * ([[graft.ops.Multimodal.Mp4KeyframeWalk]]), and the oracle states
    * sample numbers, byte offsets (closed-form prefix sums over the
    * planted sizes plus the box-layout base
    * 285 [+30 HEVC] + 4n [+ 16 + 4s]), codec and decoder config as
    * pure doc_id arithmetic — without reading a byte. The
    * r13-disclosed inter-frame boundary's loader-side slice: pixels
    * still need a codec, but the seek structure is fully real. */
  def keyframes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedAvcMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.keyframeIndex(media).toDF()
      .select("media_id", "kf_idx", "sample_no", "offset", "size",
        "profile", "level", "nal_len", "codec")
      .transform(QueryUtil.ordered("media_id", "kf_idx"))
  }

  /** mm_sps: TRUE coded video dimensions from the SPS NAL's
    * exp-Golomb bitstream (r15, verdict #4 — zero codec deps, pure
    * ISO 14496-10 §7.3.2.1.1 / 23008-2 §7.3.2.2 arithmetic) over the
    * same planted 8-slot AVC/HEVC table as mm_keyframes. Every slot
    * carries a hand-encoded SPS whose dimensions are slot
    * arithmetic; slot 7's container lies about its width (+16), so
    * `dims_match` is the loader's filterable mismatch flag. */
  def sps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedAvcMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.spsIndex(media).toDF()
      .select("media_id", "codec", "profile_idc", "level_idc",
        "chroma_idc", "coded_w", "coded_h", "disp_w", "disp_h",
        "container_w", "container_h", "dims_match")
      .transform(QueryUtil.ordered("media_id"))
  }

  /** mm_frame_types: per-SAMPLE frame types (I/P/B) decoded from the
    * slice headers' exp-Golomb bitstream (r15 — the per-frame slice
    * of the inter-frame boundary after `mm_sps`) over the same
    * planted 8-slot AVC/HEVC table. Every sample now carries a real
    * access unit (optional SEI + one slice NAL + spec filler NALs);
    * the planted [[graft.ops.MediaFixtures.plantedFrameType]] rule is
    * restated by the oracle as doc_id arithmetic. Slot 3 sample 3 is
    * the planted container LIE (stss claims sync, the bitstream is a
    * P slice) and slot 1 sample 3 the inverse (an unclaimed IDR) —
    * `sync_consistent` is the loader's filterable flag. Slot 6's PPS
    * plants num_extra_slice_header_bits = 2, so a walk that assumes
    * the common zero case instead of PARSING the PPS mis-decodes
    * every slot-6 slice_type. */
  def frameTypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedAvcMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.frameTypeIndex(media).toDF()
      .select("media_id", "sample_no", "codec", "nal_type", "frame_type",
        "sync_claimed", "is_rap", "sync_consistent")
      .transform(QueryUtil.ordered("media_id", "sample_no"))
  }

  /** The shared frame-rule CTE: planted sample grid + the
    * [[graft.ops.MediaFixtures.plantedFrameType]] rule as SQL. */
  private val frameRuleCte: String =
    """p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |s AS (SELECT media_id, slot, slot % 3 + 2 AS step,
      |    CAST(i AS INTEGER) AS sample_no
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 4 + 4)) AS i) g),
      |f AS (SELECT media_id, slot, sample_no,
      |    (slot = 7 OR (sample_no - 1) % step = 0) AS claimed,
      |    ((slot = 7 OR (sample_no - 1) % step = 0)
      |        AND NOT (slot = 3 AND sample_no = 3))
      |      OR (slot = 1 AND sample_no = 3) AS is_i
      |  FROM s)""".stripMargin

  val frameTypesOracle: String =
    s"""WITH $frameRuleCte
      |SELECT media_id, sample_no,
      |  CASE WHEN slot IN (2, 6) THEN 'hvc1' ELSE 'avc1' END AS codec,
      |  CAST(CASE WHEN slot IN (2, 6) THEN
      |         CASE WHEN is_i THEN CASE WHEN slot = 2 THEN 19 ELSE 21 END
      |              WHEN sample_no % 3 = 0 THEN 0 ELSE 1 END
      |       ELSE CASE WHEN is_i THEN 5 ELSE 1 END END AS INTEGER)
      |    AS nal_type,
      |  CASE WHEN is_i THEN 'I' WHEN sample_no % 3 = 0 THEN 'B'
      |       ELSE 'P' END AS frame_type,
      |  claimed AS sync_claimed,
      |  is_i AS is_rap,
      |  claimed = is_i AS sync_consistent
      |FROM f ORDER BY media_id, sample_no""".stripMargin

  /** mm_gop: the per-media GOP-structure audit a video loader runs
    * before training — frame-type counts, random-access density
    * (`gop_len` = frames per RAP), whether the stream opens on a RAP
    * (`closed_gop`), and the count of container sync LIES
    * (`sync_lies` > 0 ⇒ quarantine the file: seeking to a claimed
    * sync point that is not a RAP decodes garbage). Same planted
    * table; blobs never shuffle — only the narrow per-media audit
    * rows do. */
  def gop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedAvcMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.frameTypeIndex(media).toDF()
      .groupBy("media_id", "codec")
      .agg(
        count(lit(1)).cast("int").as("n_frames"),
        sum(when(col("frame_type") === "I", 1).otherwise(0)).cast("int")
          .as("n_i"),
        sum(when(col("frame_type") === "P", 1).otherwise(0)).cast("int")
          .as("n_p"),
        sum(when(col("frame_type") === "B", 1).otherwise(0)).cast("int")
          .as("n_b"),
        sum(when(col("is_rap"), 1).otherwise(0)).cast("int").as("n_rap"),
        sum(when(!col("sync_consistent"), 1).otherwise(0)).cast("int")
          .as("sync_lies"),
        round(count(lit(1)).cast("double") /
          sum(when(col("is_rap"), 1).otherwise(0)), 4).as("gop_len"),
        (sum(when(col("sample_no") === 1 && col("is_rap"), 1)
          .otherwise(0)) > 0).as("closed_gop"))
      .transform(QueryUtil.ordered("media_id"))
  }

  val gopOracle: String =
    s"""WITH $frameRuleCte
      |SELECT media_id,
      |  CASE WHEN slot IN (2, 6) THEN 'hvc1' ELSE 'avc1' END AS codec,
      |  CAST(count(*) AS INTEGER) AS n_frames,
      |  CAST(sum(CASE WHEN is_i THEN 1 ELSE 0 END) AS INTEGER) AS n_i,
      |  CAST(sum(CASE WHEN NOT is_i AND sample_no % 3 <> 0
      |    THEN 1 ELSE 0 END) AS INTEGER) AS n_p,
      |  CAST(sum(CASE WHEN NOT is_i AND sample_no % 3 = 0
      |    THEN 1 ELSE 0 END) AS INTEGER) AS n_b,
      |  CAST(sum(CASE WHEN is_i THEN 1 ELSE 0 END) AS INTEGER) AS n_rap,
      |  CAST(sum(CASE WHEN claimed <> is_i THEN 1 ELSE 0 END) AS INTEGER)
      |    AS sync_lies,
      |  round(count(*) * 1.0 /
      |    sum(CASE WHEN is_i THEN 1 ELSE 0 END), 4) AS gop_len,
      |  TRUE AS closed_gop
      |FROM f GROUP BY media_id, slot ORDER BY media_id""".stripMargin

  /** mm_fragments: the FRAGMENTED-MP4 (DASH/CMAF) sample walk — the
    * wire format video corpora actually ship in, where sample tables
    * live in `moof > traf > tfhd/trun` boxes instead of `stbl`
    * (r15). The planted 8-slot table exercises the ISO 14496-12
    * §8.8.7 field-precedence ladder: layout 'A' (odd slots, explicit
    * base_data_offset + per-sample trun sizes/flags), 'B' (tfhd
    * defaults + first_sample_flags), 'C' (slot 4 — everything falls
    * through to the `trex` defaults). Frame types ride the same
    * slice-header bitstream parse as `mm_frame_types`;
    * `sync_consistent` cross-checks the `sample_flags` sync claim
    * against the bitstream RAP (slot 5 fragment 2 plants the claim
    * lie, slot 3 the unclaimed IDR). The oracle states every byte
    * range as doc_id arithmetic: moof_pos via a prefix sum over
    * closed-form fragment lengths, never reading a byte. */
  def fragments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedFragMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.fragmentIndex(media).toDF()
      .select("media_id", "frag_idx", "seq_no", "sample_no", "offset",
        "size", "sync_claimed", "nal_type", "frame_type", "is_rap",
        "sync_consistent", "codec")
      .transform(QueryUtil.ordered("media_id", "sample_no"))
  }

  val fragmentsOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |fr AS (SELECT media_id, slot, CAST(f AS INTEGER) AS f,
      |    CAST((slot + f) % 3 + 1 AS INTEGER) AS n
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 3 + 2)) AS f) g),
      |fr2 AS (SELECT *,
      |    CASE WHEN slot % 2 = 1 THEN 76 + 8 * n
      |         WHEN slot = 4 THEN 72 ELSE 80 END AS moof_len,
      |    CASE WHEN slot % 2 = 1
      |         THEN n * (60 + 9 * slot) + 7 * (n * (n - 1)) // 2
      |         ELSE n * (60 + 9 * slot) END AS mdat_pay
      |  FROM fr),
      |fr3 AS (SELECT *,
      |    301 + CASE WHEN slot IN (2, 6) THEN 30 ELSE 0 END
      |      + coalesce(sum(moof_len + 8 + mdat_pay) OVER (
      |          PARTITION BY media_id ORDER BY f
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS moof_pos
      |  FROM fr2),
      |s AS (SELECT media_id, slot, f, n, moof_pos, moof_len,
      |    CAST(sl AS INTEGER) AS sl
      |  FROM fr3, LATERAL (SELECT unnest(range(1, n + 1)) AS sl) g),
      |s2 AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY media_id ORDER BY f, sl)
      |      AS INTEGER) AS gs,
      |    CASE WHEN slot % 2 = 1 THEN 60 + 9 * slot + 7 * (sl - 1)
      |         ELSE 60 + 9 * slot END AS sz,
      |    moof_pos + moof_len + 8
      |      + CASE WHEN slot % 2 = 1
      |             THEN (sl - 1) * (60 + 9 * slot)
      |               + 7 * ((sl - 1) * (sl - 2)) // 2
      |             ELSE (sl - 1) * (60 + 9 * slot) END AS off
      |  FROM s),
      |s3 AS (SELECT *, (sl = 1) AS claimed,
      |    ((sl = 1) AND NOT (slot = 5 AND f = 2))
      |      OR (slot = 3 AND f = 1 AND sl = 2) AS is_i
      |  FROM s2)
      |SELECT media_id,
      |  CAST(f - 1 AS INTEGER) AS frag_idx,
      |  CAST(f AS INTEGER) AS seq_no,
      |  gs AS sample_no,
      |  CAST(off AS BIGINT) AS "offset",
      |  CAST(sz AS INTEGER) AS size,
      |  claimed AS sync_claimed,
      |  CAST(CASE WHEN slot IN (2, 6) THEN
      |        CASE WHEN is_i THEN CASE WHEN slot = 2 THEN 19 ELSE 21 END
      |             WHEN gs % 3 = 0 THEN 0 ELSE 1 END
      |      ELSE CASE WHEN is_i THEN 5 ELSE 1 END END AS INTEGER)
      |    AS nal_type,
      |  CASE WHEN is_i THEN 'I' WHEN gs % 3 = 0 THEN 'B' ELSE 'P' END
      |    AS frame_type,
      |  is_i AS is_rap,
      |  claimed = is_i AS sync_consistent,
      |  CASE WHEN slot IN (2, 6) THEN 'hvc1' ELSE 'avc1' END AS codec
      |FROM s3 ORDER BY media_id, sample_no""".stripMargin

  /** mm_webm: the WebM/Matroska (EBML) container walk (r16) — the
    * fMP4 coverage's twin for the OTHER wire format video corpora
    * ship in: RFC 8794 EBML framing, DocType, TimestampScale, the
    * first video TrackEntry's codec/dims, and every Cluster
    * SimpleBlock with its keyframe CLAIM cross-checked against the
    * VP9 uncompressed-header frame_type bit (`key_consistent` — the
    * EBML `sync_consistent`). Planted lies: slot 2 claims key over
    * an inter frame, slot 5 hides a key frame. The oracle restates
    * every field as doc_id arithmetic. */
  def webmBlocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedWebm(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.webmIndex(media).toDF()
      .select("media_id", "cluster_idx", "track", "track_type", "rel_ts",
        "frame_idx", "abs_ts", "size", "key_claimed", "vp9_key",
        "key_consistent", "codec", "pixel_w", "pixel_h", "timescale",
        "doc_type")
      .transform(QueryUtil.ordered("media_id", "cluster_idx", "rel_ts"))
  }

  val webmOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |cl AS (SELECT media_id, slot, CAST(c AS INTEGER) AS c
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 3 + 2)) AS c) g),
      |bl AS (SELECT media_id, slot, c, CAST(k AS INTEGER) AS k
      |  FROM cl, LATERAL (
      |    SELECT unnest(range(1, (slot + c) % 3 + 2)) AS k) g),
      |b2 AS (SELECT *,
      |    CASE WHEN slot = 5 AND c = 1 AND k = 1 THEN TRUE
      |         WHEN slot = 2 AND c = 2 AND k = 2 THEN FALSE
      |         ELSE k = 1 END AS vkey,
      |    CASE WHEN slot = 5 AND c = 1 AND k = 1 THEN FALSE
      |         WHEN slot = 2 AND c = 2 AND k = 2 THEN TRUE
      |         ELSE k = 1 END AS claimed
      |  FROM bl)
      |SELECT media_id,
      |  CAST(c - 1 AS INTEGER) AS cluster_idx,
      |  CAST(slot % 2 + 1 AS INTEGER) AS track,
      |  CAST(1 AS INTEGER) AS track_type,
      |  CAST(7 * k AS INTEGER) AS rel_ts,
      |  CAST(0 AS INTEGER) AS frame_idx,
      |  CAST(1000 * c + 10 * slot + 7 * k AS BIGINT) AS abs_ts,
      |  CAST(30 + 5 * slot + 3 * k AS INTEGER) AS size,
      |  claimed AS key_claimed,
      |  vkey AS vp9_key,
      |  claimed = vkey AS key_consistent,
      |  'V_VP9' AS codec,
      |  CAST(320 + 16 * slot AS INTEGER) AS pixel_w,
      |  CAST(180 + 8 * slot AS INTEGER) AS pixel_h,
      |  CAST(1000000 + 1000 * slot AS BIGINT) AS timescale,
      |  'webm' AS doc_type
      |FROM b2 ORDER BY media_id, cluster_idx, rel_ts""".stripMargin

  /** mm_webm_stream: the STREAMING-MUXED WebM walk (r17) — the same
    * 8-slot planted truth as `mm_webm`, emitted with unknown-size
    * Segment and Cluster markers (RFC 8794 §6.2 — a live muxer writes
    * the element header before it knows the final size, so real
    * captured streams carry the all-ones marker everywhere). The walk
    * resolves unknown sizes by the first-non-child rule; the ORACLE IS
    * `mm_webm`'s, verbatim, because the audit rows must be identical
    * across the two encodings. */
  def webmStreamBlocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong,
        graft.ops.MediaFixtures.plantedWebm(m, unknownSize = true)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.webmIndex(media).toDF()
      .select("media_id", "cluster_idx", "track", "track_type", "rel_ts",
        "frame_idx", "abs_ts", "size", "key_claimed", "vp9_key",
        "key_consistent", "codec", "pixel_w", "pixel_h", "timescale",
        "doc_type")
      .transform(QueryUtil.ordered("media_id", "cluster_idx", "rel_ts"))
  }

  /** mm_webm_tracks: the MULTI-TRACK WebM walk (r17) — real Matroska
    * interleaves a video track with an audio track whose blocks lace
    * near-universally, so a first-video-track-only walk never meets
    * lacing in the wild. The walk audits every declared TrackEntry:
    * VP9 key cross-check on the video track (with a planted slot-4
    * claim lie), vacuous-true on the A_OPUS audio track whose
    * Xiph-laced blocks exercise the lace tables where they actually
    * live. The oracle restates every field as doc_id arithmetic. */
  def webmTrackBlocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedWebmTracks(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.webmIndex(media).toDF()
      .select("media_id", "cluster_idx", "track", "track_type", "rel_ts",
        "frame_idx", "abs_ts", "size", "key_claimed", "vp9_key",
        "key_consistent", "codec", "pixel_w", "pixel_h", "timescale",
        "doc_type")
      .transform(QueryUtil.ordered("media_id", "cluster_idx", "track",
        "frame_idx"))
  }

  /** mm_timeline_tracks: the MUXED MULTI-TRACK decode-time audit
    * (r18 — closes the single-track walk's disclosed scope boundary):
    * each moof carries one traf per track, and each track's decode
    * clock is audited independently against its own accumulated trun
    * durations, with the §8.8.7 ladder resolving against the track's
    * OWN trex. Two planted lies, each on one track's clock in a moof
    * whose other track stays truthful — the summed-duration
    * single-track audit would condemn both. The oracle restates every
    * field as doc_id arithmetic. */
  def timelineTracks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong,
        graft.ops.MediaFixtures.plantedTimelineTracksMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.trackTimelineIndex(media).toDF()
      .select("media_id", "frag_idx", "seq_no", "track_id", "n_samples",
        "dur_sum", "tfdt", "tfdt_consistent")
      .transform(QueryUtil.ordered("media_id", "frag_idx", "track_id"))
  }

  val timelineTracksOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |fr AS (SELECT media_id, slot, CAST(f AS INTEGER) AS f
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 3 + 3)) AS f) g),
      |tr AS (SELECT media_id, slot, f, CAST(t AS INTEGER) AS t,
      |    CAST(CASE WHEN t = 1 THEN (slot + f) % 3 + 1
      |      ELSE (slot + 2 * f) % 2 + 1 END AS INTEGER) AS n,
      |    CAST(CASE WHEN t = 1 THEN 40 + slot ELSE 30 + slot END
      |      AS BIGINT) AS d,
      |    CAST(CASE WHEN t = 1 THEN 50 * slot ELSE 70 * slot END
      |      AS BIGINT) AS base,
      |    CASE WHEN t = 2 AND slot = 3 AND f = 2 THEN 7
      |         WHEN t = 1 AND slot = 4 AND f = 3 THEN 5
      |         ELSE 0 END AS lie
      |  FROM fr, (SELECT unnest([1, 2]) AS t) tt),
      |tr2 AS (SELECT *,
      |    base + coalesce(sum(n * d) OVER (PARTITION BY media_id, t
      |        ORDER BY f
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + lie AS tfdt
      |  FROM tr)
      |SELECT media_id,
      |  CAST(f - 1 AS INTEGER) AS frag_idx,
      |  f AS seq_no,
      |  t AS track_id,
      |  n AS n_samples,
      |  CAST(n * d AS BIGINT) AS dur_sum,
      |  CAST(tfdt AS BIGINT) AS tfdt,
      |  lie = 0 AS tfdt_consistent
      |FROM tr2 ORDER BY media_id, frag_idx, track_id""".stripMargin

  /** mm_webm_cues: the SEEK-INDEX audit (r18, verdict #5) — every
    * Cues/CuePoint entry's (time, track, cluster position) claim
    * cross-checked against the actual cluster layout and block
    * timeline, plus the cued track's DefaultDuration frame-rate claim
    * vs the measured block cadence. Four planted lies, one per axis:
    * a position not landing on a cluster (slot 1), a cue time with no
    * block (slot 2), a cue onto a non-keyframe (slot 5), and an
    * overstated DefaultDuration (slot 4). The oracle restates every
    * field as doc_id arithmetic. */
  def webmCueAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedWebmCues(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.webmCuesIndex(media).toDF()
      .select("media_id", "cue_idx", "cue_time", "cue_track",
        "cluster_idx", "cluster_found", "cue_time_ok", "cue_key_ok",
        "default_dur_ns", "measured_frame_ticks", "default_dur_ok",
        "timescale", "codec", "track_type")
      .transform(QueryUtil.ordered("media_id", "cue_idx"))
  }

  val webmCuesOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |c AS (SELECT media_id, slot, CAST(k AS INTEGER) AS c
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 3 + 2)) AS k) g)
      |SELECT media_id,
      |  CAST(c - 1 AS INTEGER) AS cue_idx,
      |  CAST(600 * (c - 1) + 10 * slot + 4
      |    + CASE WHEN slot = 2 AND c = 3 THEN 5 ELSE 0 END AS BIGINT)
      |    AS cue_time,
      |  CAST(1 AS INTEGER) AS cue_track,
      |  CAST(CASE WHEN slot = 1 AND c = 2 THEN -1 ELSE c - 1 END
      |    AS INTEGER) AS cluster_idx,
      |  NOT (slot = 1 AND c = 2) AS cluster_found,
      |  NOT (slot = 2 AND c = 3) AS cue_time_ok,
      |  NOT (slot = 5 AND c = 2) AS cue_key_ok,
      |  CAST(CASE WHEN slot = 7 THEN -1
      |    ELSE (CASE WHEN slot = 4 THEN 580 ELSE 600 END)
      |      * (1000000 + 125 * slot) END AS BIGINT) AS default_dur_ns,
      |  CAST(CASE WHEN slot % 3 = 0 THEN -1 ELSE 600 END AS BIGINT)
      |    AS measured_frame_ticks,
      |  (slot != 4) AS default_dur_ok,
      |  CAST(1000000 + 125 * slot AS BIGINT) AS timescale,
      |  'V_VP9' AS codec,
      |  CAST(1 AS INTEGER) AS track_type
      |FROM c ORDER BY media_id, cue_idx""".stripMargin

  val webmTracksOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |cl AS (SELECT media_id, slot, CAST(c AS INTEGER) AS c
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 2 + 2)) AS c) g),
      |vid AS (SELECT media_id, slot, c,
      |    CAST(1 AS INTEGER) AS track, CAST(1 AS INTEGER) AS track_type,
      |    CAST(9 * c AS INTEGER) AS rel_ts,
      |    CAST(0 AS INTEGER) AS frame_idx,
      |    CAST(24 + 4 * slot + c AS INTEGER) AS size,
      |    c = 1 AS claimed,
      |    CASE WHEN slot = 4 AND c = 1 THEN FALSE ELSE c = 1 END AS vkey,
      |    'V_VP9' AS codec,
      |    CAST(288 + 8 * slot AS INTEGER) AS pixel_w,
      |    CAST(160 + 4 * slot AS INTEGER) AS pixel_h
      |  FROM cl),
      |aud AS (SELECT media_id, slot, c,
      |    CAST(2 AS INTEGER) AS track, CAST(2 AS INTEGER) AS track_type,
      |    CAST(9 * c + 3 AS INTEGER) AS rel_ts,
      |    CAST(k - 1 AS INTEGER) AS frame_idx,
      |    CAST(15 + 2 * slot + 3 * k AS INTEGER) AS size,
      |    TRUE AS claimed, FALSE AS vkey,
      |    'A_OPUS' AS codec,
      |    CAST(-1 AS INTEGER) AS pixel_w, CAST(-1 AS INTEGER) AS pixel_h
      |  FROM cl, LATERAL (SELECT unnest(range(1,
      |    (slot + c) % 3 + 3)) AS k) g),
      |u AS (SELECT * FROM vid UNION ALL SELECT * FROM aud)
      |SELECT media_id,
      |  CAST(c - 1 AS INTEGER) AS cluster_idx,
      |  track, track_type, rel_ts, frame_idx,
      |  CAST(400 * c + 10 * slot + rel_ts AS BIGINT) AS abs_ts,
      |  size,
      |  claimed AS key_claimed,
      |  vkey AS vp9_key,
      |  CASE WHEN track = 1 THEN claimed = vkey ELSE TRUE END
      |    AS key_consistent,
      |  codec, pixel_w, pixel_h,
      |  CAST(1000000 + 250 * slot AS BIGINT) AS timescale,
      |  'webm' AS doc_type
      |FROM u ORDER BY media_id, cluster_idx, track, frame_idx""".stripMargin

  /** mm_webm_laced: the LACED WebM walk (r17, verdict #6) — real
    * Matroska audio laces near-universally, so the EBML slice is not
    * closed without the three lacing modes. Slot m % 4 selects the
    * mode (none / Xiph / fixed-size / EBML); each laced SimpleBlock
    * emits one audit row per frame with the block's keyframe claim
    * cross-checked against each frame's own VP9 header bit. Planted
    * lies: slot 3 (EBML) hides an inter frame under a key claim,
    * slot 1 (Xiph) hides a key frame under a non-key claim. The
    * oracle restates every field as doc_id arithmetic. */
  def webmLacedBlocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedWebmLaced(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.webmIndex(media).toDF()
      .select("media_id", "cluster_idx", "track", "track_type", "rel_ts",
        "frame_idx", "abs_ts", "size", "key_claimed", "vp9_key",
        "key_consistent", "codec", "pixel_w", "pixel_h", "timescale",
        "doc_type")
      .transform(QueryUtil.ordered("media_id", "cluster_idx", "frame_idx"))
  }

  val webmLacedOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot,
      |    CAST(doc_id % 8 % 4 AS INTEGER) AS mode FROM documents),
      |cl AS (SELECT media_id, slot, mode, CAST(c AS INTEGER) AS c
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 2 + 2)) AS c) g),
      |fr AS (SELECT media_id, slot, mode, c, CAST(k AS INTEGER) AS k
      |  FROM cl, LATERAL (SELECT unnest(range(1,
      |    CASE WHEN mode = 0 THEN 2 ELSE (slot + c) % 3 + 3 END)) AS k) g),
      |b2 AS (SELECT *,
      |    CASE WHEN slot = 3 AND c = 1 AND k = 2 THEN FALSE
      |         WHEN slot = 1 AND c = 2 AND k = 1 THEN TRUE
      |         ELSE c = 1 END AS vkey,
      |    c = 1 AS claimed
      |  FROM fr)
      |SELECT media_id,
      |  CAST(c - 1 AS INTEGER) AS cluster_idx,
      |  CAST(1 AS INTEGER) AS track,
      |  CAST(1 AS INTEGER) AS track_type,
      |  CAST(9 * c AS INTEGER) AS rel_ts,
      |  CAST(k - 1 AS INTEGER) AS frame_idx,
      |  CAST(500 * c + 10 * slot + 9 * c AS BIGINT) AS abs_ts,
      |  CAST(CASE WHEN mode IN (1, 3) THEN 20 + 4 * slot + 3 * k
      |       ELSE 20 + 4 * slot END AS INTEGER) AS size,
      |  claimed AS key_claimed,
      |  vkey AS vp9_key,
      |  claimed = vkey AS key_consistent,
      |  'V_VP9' AS codec,
      |  CAST(256 + 8 * slot AS INTEGER) AS pixel_w,
      |  CAST(144 + 4 * slot AS INTEGER) AS pixel_h,
      |  CAST(1000000 + 500 * slot AS BIGINT) AS timescale,
      |  'webm' AS doc_type
      |FROM b2 ORDER BY media_id, cluster_idx, frame_idx""".stripMargin

  /** mm_timeline: the DASH/CMAF SEGMENT-TIMELINE audit (r16, verdict
    * #5) — `sidx` earliest_presentation_time + per-segment
    * (referenced_size, subsegment_duration) rows cross-checked
    * against each fragment's `tfdt` decode-time claim and its
    * accumulated trun durations (resolved through the §8.8.7 ladder:
    * per-sample trun on odd slots, tfhd default on slots 0/2, trex
    * default on slots 4/6). Three planted lies, one per audit axis
    * (slot 3: a tfdt gap; slot 5: an overstated subsegment_duration;
    * slot 6: an overstated referenced_size). The oracle restates
    * every field as doc_id arithmetic — closed-form fragment lengths,
    * window-summed decode times — without reading a byte. */
  def timeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedTimelineMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.timelineIndex(media).toDF()
      .select("media_id", "frag_idx", "seq_no", "n_samples", "dur_sum",
        "tfdt", "sidx_dur", "sidx_size", "actual_size", "timescale",
        "tfdt_consistent", "sidx_dur_consistent", "sidx_size_consistent",
        "tree_dur_consistent", "tree_size_consistent",
        "tree_ept_consistent")
      .transform(QueryUtil.ordered("media_id", "frag_idx"))
  }

  /** mm_timeline_tree: the HIERARCHICAL segment-index audit (r18,
    * verdict #3) — a root `sidx` of type-1 references, each resolved
    * to its child sidx box, flattened to leaf references aligned 1:1
    * with the moofs. Four planted lies, one per remaining audit axis:
    * a child-level duration lie behind a consistent parent (slot 2 —
    * the exact case the r17 sentinel could not see), a child-level
    * size lie (slot 7), a root duration claim disagreeing with its
    * child's total (slot 4), and a root size claim disagreeing with
    * the child box + covered bytes (slot 5). The oracle restates
    * every field as doc_id arithmetic — closed-form fragment lengths,
    * window-summed decode times — without reading a byte. */
  def timelineTree(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedTimelineTreeMp4(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.timelineIndex(media).toDF()
      .select("media_id", "frag_idx", "seq_no", "n_samples", "dur_sum",
        "tfdt", "sidx_dur", "sidx_size", "actual_size", "timescale",
        "tfdt_consistent", "sidx_dur_consistent", "sidx_size_consistent",
        "tree_dur_consistent", "tree_size_consistent",
        "tree_ept_consistent")
      .transform(QueryUtil.ordered("media_id", "frag_idx"))
  }

  val timelineTreeOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |grp AS (SELECT media_id, slot, CAST(g AS INTEGER) AS g
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 2 + 3)) AS g) gg),
      |fr AS (SELECT media_id, slot, g, CAST(f AS INTEGER) AS f,
      |    CAST((slot + g + f) % 3 + 1 AS INTEGER) AS n,
      |    CAST(40 + slot AS BIGINT) AS d
      |  FROM grp, LATERAL
      |    (SELECT unnest(range(1, (slot + g) % 2 + 2)) AS f) ff),
      |fr2 AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY media_id ORDER BY g, f)
      |      AS INTEGER) AS seq,
      |    n * d AS dur_sum,
      |    CASE WHEN slot % 3 = 0 THEN 88 + 14 * n
      |         WHEN slot % 3 = 1 THEN 92 + 10 * n
      |         ELSE 88 + 10 * n END AS frag_len,
      |    100 * slot
      |      + coalesce(sum(n * d) OVER (PARTITION BY media_id
      |          ORDER BY g, f
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS tfdt,
      |    n * d + CASE WHEN slot = 2 AND g = 1 AND f = 1 THEN 4 ELSE 0
      |      END AS sidx_dur
      |  FROM fr),
      |fr3 AS (SELECT *,
      |    frag_len + CASE WHEN slot = 7 AND g = 2 AND f = 1 THEN 2
      |      ELSE 0 END AS sidx_size
      |  FROM fr2)
      |SELECT media_id,
      |  CAST(seq - 1 AS INTEGER) AS frag_idx,
      |  seq AS seq_no,
      |  n AS n_samples,
      |  CAST(dur_sum AS BIGINT) AS dur_sum,
      |  CAST(tfdt AS BIGINT) AS tfdt,
      |  CAST(sidx_dur AS BIGINT) AS sidx_dur,
      |  CAST(sidx_size AS BIGINT) AS sidx_size,
      |  CAST(frag_len AS BIGINT) AS actual_size,
      |  CAST(1000 + 100 * slot AS BIGINT) AS timescale,
      |  TRUE AS tfdt_consistent,
      |  sidx_dur = dur_sum AS sidx_dur_consistent,
      |  sidx_size = frag_len AS sidx_size_consistent,
      |  NOT (slot = 4 AND g = 2) AS tree_dur_consistent,
      |  NOT (slot = 5 AND g = 3) AS tree_size_consistent,
      |  NOT (slot IN (2, 6) AND g = 2) AS tree_ept_consistent
      |FROM fr3 ORDER BY media_id, frag_idx""".stripMargin

  val timelineOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |fr AS (SELECT media_id, slot, CAST(f AS INTEGER) AS f,
      |    CAST((slot + f) % 3 + 1 AS INTEGER) AS n,
      |    CAST(40 + slot AS BIGINT) AS d
      |  FROM p, LATERAL (SELECT unnest(range(1, slot % 3 + 3)) AS f) g),
      |fr2 AS (SELECT *, n * d AS dur_sum,
      |    CASE WHEN slot % 2 = 1 THEN 88 + 14 * n
      |         WHEN slot IN (0, 2) THEN 92 + 10 * n
      |         ELSE 88 + 10 * n END AS frag_len,
      |    100 * slot
      |      + coalesce(sum(n * d) OVER (PARTITION BY media_id ORDER BY f
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + CASE WHEN slot = 3 AND f = 2 THEN 7 ELSE 0 END AS tfdt,
      |    n * d + CASE WHEN slot = 5 AND f = 1 THEN 5 ELSE 0 END
      |      AS sidx_dur
      |  FROM fr),
      |fr3 AS (SELECT *,
      |    frag_len + CASE WHEN slot = 6 AND f = 2 THEN 3 ELSE 0 END
      |      AS sidx_size,
      |    lag(tfdt) OVER (PARTITION BY media_id ORDER BY f) AS prev_tfdt,
      |    lag(dur_sum) OVER (PARTITION BY media_id ORDER BY f)
      |      AS prev_dur
      |  FROM fr2)
      |SELECT media_id,
      |  CAST(f - 1 AS INTEGER) AS frag_idx,
      |  CAST(f AS INTEGER) AS seq_no,
      |  n AS n_samples,
      |  CAST(dur_sum AS BIGINT) AS dur_sum,
      |  CAST(tfdt AS BIGINT) AS tfdt,
      |  CAST(sidx_dur AS BIGINT) AS sidx_dur,
      |  CAST(sidx_size AS BIGINT) AS sidx_size,
      |  CAST(frag_len AS BIGINT) AS actual_size,
      |  CAST(1000 + 100 * slot AS BIGINT) AS timescale,
      |  CASE WHEN f = 1 THEN tfdt = 100 * slot
      |       ELSE tfdt = prev_tfdt + prev_dur END AS tfdt_consistent,
      |  sidx_dur = dur_sum AS sidx_dur_consistent,
      |  sidx_size = frag_len AS sidx_size_consistent,
      |  TRUE AS tree_dur_consistent,
      |  TRUE AS tree_size_consistent,
      |  TRUE AS tree_ept_consistent
      |FROM fr3 ORDER BY media_id, frag_idx""".stripMargin

  val spsOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot FROM documents),
      |d AS (SELECT media_id, slot,
      |    slot IN (2, 6) AS hevc,
      |    CASE WHEN slot IN (2, 6) THEN 64 + 8 * slot
      |         ELSE 16 * (slot % 4 + 2) END AS coded_w,
      |    CASE WHEN slot IN (2, 6) THEN 48 + 8 * (slot % 3)
      |         ELSE 16 * (slot % 3 + 2) END AS coded_h,
      |    CASE WHEN slot = 6 THEN 4
      |         WHEN slot = 2 THEN 0
      |         ELSE 2 * (slot % 2) END AS cut_w,
      |    CASE WHEN slot = 6 THEN 2
      |         WHEN slot = 2 THEN 0
      |         ELSE 2 * (slot % 3) END AS cut_h
      |  FROM p)
      |SELECT media_id,
      |  CASE WHEN hevc THEN 'hvc1' ELSE 'avc1' END AS codec,
      |  CAST(CASE WHEN slot = 2 THEN 1 WHEN slot = 6 THEN 2
      |    ELSE CASE slot % 3 WHEN 0 THEN 66 WHEN 1 THEN 77 ELSE 100 END
      |    END AS INTEGER) AS profile_idc,
      |  CAST(CASE WHEN hevc THEN 90 + slot ELSE 30 + slot END
      |    AS INTEGER) AS level_idc,
      |  CAST(1 AS INTEGER) AS chroma_idc,
      |  CAST(coded_w AS INTEGER) AS coded_w,
      |  CAST(coded_h AS INTEGER) AS coded_h,
      |  CAST(coded_w - cut_w AS INTEGER) AS disp_w,
      |  CAST(coded_h - cut_h AS INTEGER) AS disp_h,
      |  CAST(coded_w - cut_w + CASE WHEN slot = 7 THEN 16 ELSE 0 END
      |    AS INTEGER) AS container_w,
      |  CAST(coded_h - cut_h AS INTEGER) AS container_h,
      |  slot <> 7 AS dims_match
      |FROM d ORDER BY media_id""".stripMargin

  val keyframesOracle: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CAST(doc_id % 8 AS INTEGER) AS slot,
      |    CAST(doc_id % 8 AS INTEGER) % 4 + 3 AS n,
      |    CAST(doc_id % 8 AS INTEGER) % 3 + 2 AS step
      |  FROM documents),
      |s AS (SELECT media_id, slot, n,
      |    CAST(i AS INTEGER) AS kf_idx,
      |    CAST(CASE WHEN slot = 7 THEN i + 1
      |              ELSE 1 + i * step END AS INTEGER) AS sample_no,
      |    285 + CASE WHEN slot IN (2, 6) THEN 30 ELSE 0 END
      |      + 4 * n + CASE WHEN slot = 7 THEN 0
      |      ELSE 16 + 4 * ((n - 1) // step + 1) END AS base
      |  FROM p, LATERAL (SELECT unnest(range(0,
      |    CASE WHEN slot = 7 THEN n
      |         ELSE (n - 1) // step + 1 END)) AS i) g)
      |SELECT media_id, kf_idx, sample_no,
      |  CAST(base + (sample_no - 1) * (100 + 17 * slot)
      |    + (23 * (sample_no - 1) * (sample_no - 2)) // 2 AS BIGINT)
      |    AS "offset",
      |  CAST(100 + 17 * slot + 23 * (sample_no - 1) AS INTEGER) AS size,
      |  CAST(CASE WHEN slot = 2 THEN 1 WHEN slot = 6 THEN 2
      |    ELSE CASE slot % 3 WHEN 0 THEN 66 WHEN 1 THEN 77 ELSE 100 END
      |    END AS INTEGER) AS profile,
      |  CAST(CASE WHEN slot IN (2, 6) THEN 90 + slot ELSE 30 + slot END
      |    AS INTEGER) AS level,
      |  CAST(CASE slot % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END
      |    AS INTEGER) AS nal_len,
      |  CASE WHEN slot IN (2, 6) THEN 'hvc1' ELSE 'avc1' END AS codec
      |FROM s ORDER BY media_id, kf_idx""".stripMargin

  /** mm_tar_longnames (r18 — closes TarWalk's disclosed long-name
    * boundary): planted shards whose member paths run past the
    * 100-byte header field, written per slot in one of the three wire
    * encodings — POSIX ustar `prefix` (slots 0,3,6), GNU
    * `././@LongLink` 'L' markers (1,4,7), pax 'x' extended headers
    * (2,5). Marker entries cost exactly 1024 bytes each at these
    * lengths, so names, sizes and payload offsets stay doc_id
    * arithmetic. */
  def tarLongNames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedTarLong(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.tarMembers(media).toDF()
      .select("media_id", "member_idx", "name", "size", "offset")
      .transform(QueryUtil.ordered("media_id", "member_idx"))
  }

  val tarLongNamesOracle: String =
    """WITH m AS (SELECT doc_id AS media_id, doc_id % 8 AS slot
      |  FROM documents),
      |mem AS (SELECT media_id, slot, CAST(k AS INTEGER) AS member_idx,
      |    repeat('d', CAST(100 + slot AS INTEGER)) ||
      |      '/f' || slot || '_' || k || '.bin' AS name,
      |    CAST(37 * slot + 300 * k AS BIGINT) AS size,
      |    CAST(CASE WHEN slot % 3 = 0 THEN 0 ELSE 1024 END AS BIGINT)
      |      AS marker
      |  FROM m, LATERAL (SELECT unnest(range(0, slot % 3 + 1)) AS k) g),
      |o AS (SELECT media_id, member_idx, name, size,
      |    marker * (member_idx + 1) + 512 * (member_idx + 1) +
      |      coalesce(sum((size + 511) // 512 * 512) OVER (
      |        PARTITION BY media_id ORDER BY member_idx
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS poff
      |  FROM mem)
      |SELECT media_id, member_idx, name, size,
      |  CAST(poff AS BIGINT) AS "offset"
      |FROM o ORDER BY media_id, member_idx""".stripMargin

  val tarMembersOracle: String =
    """WITH m AS (SELECT doc_id AS media_id, doc_id % 8 AS slot
      |  FROM documents),
      |mem AS (SELECT media_id, CAST(k AS INTEGER) AS member_idx,
      |    'f' || slot || '_' || k || '.txt' AS name,
      |    CAST(37 * slot + 300 * k AS BIGINT) AS size
      |  FROM m, LATERAL (SELECT unnest(range(0, slot % 3 + 1)) AS k) g),
      |o AS (SELECT media_id, member_idx, name, size,
      |    512 * (member_idx + 1) +
      |      coalesce(sum((size + 511) // 512 * 512) OVER (
      |        PARTITION BY media_id ORDER BY member_idx
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS poff
      |  FROM mem)
      |SELECT media_id, member_idx, name, size,
      |  CAST(poff AS BIGINT) AS "offset"
      |FROM o ORDER BY media_id, member_idx""".stripMargin

  /** Compressed-shard (.tar.gz) member walk over PLANTED archives —
    * the same slot arithmetic as [[tarMembers]] behind a gzip
    * envelope ([[graft.ops.MediaFixtures.plantedTgz]]), so the SAME
    * oracle states the member rows: the engine must gunzip (bomb-
    * capped) and walk to recover them. */
  /** Compressed twin of [[tarLongNames]] (r18): the long-path marker
    * encodings behind the gzip envelope — gunzip (bomb-capped), then
    * the prefix/'L'/pax resolution; SHARES [[tarLongNamesOracle]]. */
  def tgzLongNames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedTgzLong(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.tgzMembers(media).toDF()
      .select("media_id", "member_idx", "name", "size", "offset")
      .transform(QueryUtil.ordered("media_id", "member_idx"))
  }

  def tgzMembers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedTgz(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.tgzMembers(media).toDF()
      .select("media_id", "member_idx", "name", "size", "offset")
      .transform(QueryUtil.ordered("media_id", "member_idx"))
  }

  /** ZIP central-directory enumeration over PLANTED STORED archives —
    * the zip twin of [[tarMembers]] ([[graft.ops.MediaFixtures.plantedZip]],
    * same slot arithmetic): the engine scans for the EOCD record and
    * walks the central directory ([[graft.ops.Multimodal.ZipWalk]]);
    * the oracle states names, sizes, methods and LOCAL-HEADER offsets
    * (Σ of 30-byte headers + names + payloads) as pure doc_id
    * arithmetic. */
  def zipMembers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedZip(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.zipMembers(media).toDF()
      .select("media_id", "member_idx", "name", "usize", "method", "offset")
      .transform(QueryUtil.ordered("media_id", "member_idx"))
  }

  /** ZIP64 twin of [[zipMembers]] (r18 — closes the "classic ZIP
    * only" boundary): the SAME planted members under the ZIP64
    * encoding — masked 0xFFFFFFFF central-directory fields resolved
    * through per-entry 0x0001 extras, masked EOCD counts/offset
    * resolved through the ZIP64 EOCD record via its locator. Local
    * headers are byte-identical to the classic twin, so this SHARES
    * [[zipMembersOracle]] verbatim: the member rows must be
    * identical under both encodings. */
  def zip64Members(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = (0 until 8)
      .map(m => (m.toLong, graft.ops.MediaFixtures.plantedZip64(m)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 8).as("slot"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"))
    graft.ops.Multimodal.zipMembers(media).toDF()
      .select("media_id", "member_idx", "name", "usize", "method", "offset")
      .transform(QueryUtil.ordered("media_id", "member_idx"))
  }

  val zipMembersOracle: String =
    """WITH m AS (SELECT doc_id AS media_id, doc_id % 8 AS slot
      |  FROM documents),
      |mem AS (SELECT media_id, CAST(k AS INTEGER) AS member_idx,
      |    'f' || slot || '_' || k || '.bin' AS name,
      |    CAST(37 * slot + 300 * k AS BIGINT) AS usize
      |  FROM m, LATERAL (SELECT unnest(range(0, slot % 3 + 1)) AS k) g)
      |SELECT media_id, member_idx, name, usize,
      |  CAST(0 AS INTEGER) AS method,
      |  CAST(coalesce(sum(30 + length(name) + usize) OVER (
      |      PARTITION BY media_id ORDER BY member_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS "offset"
      |FROM mem ORDER BY media_id, member_idx""".stripMargin

  /** Planted-truth decode over ALL the byte-walk decoders at once:
    * each doc row gets the [[graft.ops.MediaFixtures.planted]] payload
    * for slot `doc_id % 12` (PNG / WAV / MP3 MPEG1+MPEG2 / MP4 v0+v1
    * tkhd), [[graft.ops.Multimodal.JdkMediaDecoder]] dispatches and
    * decodes, and the oracle states the CONSTRUCTION parameters the
    * decode must recover — tkhd 16.16 dims, stsz counts, MP3
    * rate/channels/frame walks (through ID3 tags and trailing junk),
    * WAV format, PNG dims. ~400 LoC of decoder logic moves from
    * spec-only to the per-round driver gate. Fixture payloads are
    * driver-built once (12 rows) and broadcast. */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = graft.ops.MediaFixtures.planted
      .map(p => (p.slot, p.mime, p.payload))
      .toDF("slot", "mime", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 12).as("slot"))
      .transform(QueryUtil.spreadScanIfThin(_, dir, "media_id"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"),
        struct(col("mime"),
          octet_length(col("payload")).cast("long").as("byte_len"))
          .as("meta"))
    graft.ops.Multimodal
      .extractFeatures(media, graft.ops.Multimodal.JdkMediaDecoder).toDF()
      .select("media_id", "mime", "width", "height", "n_frames", "decoder")
      .transform(QueryUtil.ordered("media_id"))
  }

  /** Oracle generated from the SAME construction-parameter table the
    * engine plants from ([[graft.ops.MediaFixtures.planted]]) — the
    * parameters are inputs to the byte builders, never decoder
    * outputs, so nothing the engine computes leaks into the check. */
  val mediaDecodeOracle: String = {
    val p = graft.ops.MediaFixtures.planted
    def cases(f: graft.ops.MediaFixtures.Planted => String): String =
      p.map(x => s"WHEN ${x.slot} THEN ${f(x)}").mkString(" ")
    s"""SELECT doc_id AS media_id,
       |  CASE doc_id % 12 ${cases(x => s"'${x.mime}'")} END AS mime,
       |  CAST(CASE doc_id % 12 ${cases(_.width.toString)} END AS INTEGER)
       |    AS width,
       |  CAST(CASE doc_id % 12 ${cases(_.height.toString)} END AS INTEGER)
       |    AS height,
       |  CAST(CASE doc_id % 12 ${cases(_.nFrames.toString)} END AS INTEGER)
       |    AS n_frames,
       |  CASE doc_id % 12 ${cases(x => s"'${x.decoder}'")} END AS decoder
       |FROM documents ORDER BY media_id""".stripMargin
  }

  /** Planted-truth MJPEG frame sampling: doc_id%2 picks a
    * [[graft.ops.MediaFixtures.mjpegMp4]] container (2 frames of 16×8,
    * or 3 of 12×6), [[graft.ops.Multimodal.sampleFrames]] walks the
    * real stsd/stsz/stco/stsc sample tables and ImageIO-decodes every
    * sample, and the oracle states the construction truth: frame
    * indices 0..n-1 with the planted dims. The most intricate byte
    * walk in the module (chunk-offset × sample-size addressing) moves
    * under the driver gate. */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = Seq(
        (0L, graft.ops.MediaFixtures.mjpegMp4(Seq((16, 8), (16, 8)))),
        (1L, graft.ops.MediaFixtures.mjpegMp4(Seq((12, 6), (12, 6), (12, 6)))))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 2).as("slot"))
      .transform(QueryUtil.spreadScanIfThin(_, dir, "media_id"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"),
        struct(lit("video/mp4").as("mime"),
          octet_length(col("payload")).cast("long").as("byte_len"))
          .as("meta"))
    graft.ops.Multimodal.sampleFrames(media).toDF()
      .select("media_id", "frame_idx", "width", "height")
      .transform(QueryUtil.ordered("media_id", "frame_idx"))
  }

  val mediaFramesOracle: String =
    """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 12 END AS INTEGER)
      |    AS width,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 6 END AS INTEGER)
      |    AS height
      |FROM documents,
      |  LATERAL (SELECT unnest(range(0,
      |    CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 3 END)) AS i)
      |ORDER BY media_id, frame_idx""".stripMargin

  /** Planted-truth animated-GIF metadata: doc_id%3 picks an
    * [[graft.ops.MediaFixtures.animatedGif]] whose frame count,
    * per-frame delays and NETSCAPE loop count are construction
    * parameters; [[graft.ops.Multimodal.GifAnim]] walks the real
    * block structure (logical screen descriptor, graphic-control
    * extensions, image descriptors, length-prefixed pixel sub-blocks
    * skipped undecoded) and the oracle states the parameters back.
    * Covers: no-loop single frame, loop-forever (0) multi-frame with
    * summed delays, and a finite loop count. */
  def mediaGifAnim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = Seq(
        (0L, graft.ops.MediaFixtures.animatedGif(16, 8,
          Seq((16, 8)), Seq(10), None)),
        (1L, graft.ops.MediaFixtures.animatedGif(12, 6,
          Seq((12, 6), (12, 6), (12, 6)), Seq(10, 20, 30), Some(0))),
        (2L, graft.ops.MediaFixtures.animatedGif(8, 8,
          Seq((8, 8), (8, 8)), Seq(5, 5), Some(4))))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 3).as("slot"))
      .transform(QueryUtil.spreadScanIfThin(_, dir, "media_id"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"),
        struct(lit("image/gif").as("mime"),
          octet_length(col("payload")).cast("long").as("byte_len"))
          .as("meta"))
    graft.ops.Multimodal.gifAnimations(media).toDF()
      .select("media_id", "width", "height", "n_frames",
        "total_delay_cs", "loop_count")
      .transform(QueryUtil.ordered("media_id"))
  }

  val mediaGifAnimOracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 12 ELSE 8 END
      |    AS INTEGER) AS width,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 6 ELSE 8 END
      |    AS INTEGER) AS height,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 2 END
      |    AS INTEGER) AS n_frames,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 60 ELSE 10 END
      |    AS BIGINT) AS total_delay_cs,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN -1 WHEN 1 THEN 0 ELSE 4 END
      |    AS INTEGER) AS loop_count
      |FROM documents ORDER BY media_id""".stripMargin

  /** Planted-truth orientation-aware resize: doc_id%4 picks a payload
    * whose POST-resize dims are known by construction under
    * maxDim = 10 — PNG 40×16 → 10×4, PNG 16×40 → 4×10, PNG 8×8 →
    * untouched (never upscale), and the orientation-6 EXIF fixture
    * (16×8 stored → 8×16 display → 5×10): the aspect-preserving scale
    * math AND the rotate-before-resize contract, driver-gated. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = Seq(
        (0L, graft.ops.MediaFixtures.png(40, 16), "image/png"),
        (1L, graft.ops.MediaFixtures.png(16, 40), "image/png"),
        (2L, graft.ops.MediaFixtures.png(8, 8), "image/png"),
        (3L, graft.ops.Multimodal.exifFixture(6), "image/jpeg"))
      .toDF("slot", "payload", "mime")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 4).as("slot"))
      .transform(QueryUtil.spreadScanIfThin(_, dir, "media_id"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"),
        struct(col("mime"),
          octet_length(col("payload")).cast("long").as("byte_len"))
          .as("meta"))
    graft.ops.Multimodal.resizeImages(media, maxDim = 10).toDF()
      .select("media_id", "width", "height")
      .transform(QueryUtil.ordered("media_id"))
  }

  val mediaResizeOracle: String =
    """SELECT doc_id AS media_id,
      |  CAST(CASE doc_id % 4 WHEN 0 THEN 10 WHEN 1 THEN 4
      |    WHEN 2 THEN 8 ELSE 5 END AS INTEGER) AS width,
      |  CAST(CASE doc_id % 4 WHEN 0 THEN 4 WHEN 1 THEN 10
      |    WHEN 2 THEN 8 ELSE 10 END AS INTEGER) AS height
      |FROM documents ORDER BY media_id""".stripMargin

  /** Planted-truth image near-dup pairs: docs < 48 carry one of four
    * [[graft.ops.MediaFixtures.dhashPatternPng]] images whose dHash
    * values are CHOSEN (0x0, all-ones, alternating, row-alternating —
    * pairwise ≥ 32 bits apart, pinned in OpsSpec), two further slots
    * carry non-image payloads (must drop). Same-slot docs share a
    * payload, so the exact near-dup pair set at hamming ≤ 8 is all
    * same-slot pairs at hamming 0 — the oracle states it from doc_id
    * arithmetic alone while the engine runs the REAL pigeonhole
    * chunk-bucket join over decoded dHashes
    * ([[graft.ops.Multimodal.imageNearDupPairs]]). */
  def mediaDhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pats = Seq(
        (0L, graft.ops.MediaFixtures.dhashPatternPng(0L), "image/png"),
        (1L, graft.ops.MediaFixtures.dhashPatternPng(-1L), "image/png"),
        (2L, graft.ops.MediaFixtures
          .dhashPatternPng(0xAAAAAAAAAAAAAAAAL), "image/png"),
        (3L, graft.ops.MediaFixtures
          .dhashPatternPng(0xFF00FF00FF00FF00L), "image/png"),
        (4L, "not an image".getBytes, "text/plain"),
        (5L, "also not an image".getBytes, "text/plain"))
      .toDF("slot", "payload", "mime")
    val media = docs(spark, dir).filter(col("doc_id") < 48)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 6).as("slot"))
      .join(broadcast(pats), "slot")
      .select(col("media_id"), col("payload"),
        struct(col("mime"),
          octet_length(col("payload")).cast("long").as("byte_len"))
          .as("meta"))
    graft.ops.Multimodal.imageNearDupPairs(media, maxHamming = 8)
      .transform(QueryUtil.ordered("da", "db"))
  }

  val mediaDhashPairsOracle: String =
    """WITH m AS (SELECT doc_id FROM documents
      |  WHERE doc_id < 48 AND doc_id % 6 < 4)
      |SELECT a.doc_id AS da, b.doc_id AS db, CAST(0 AS INTEGER) AS hamming
      |FROM m a JOIN m b
      |  ON a.doc_id % 6 = b.doc_id % 6 AND a.doc_id < b.doc_id
      |ORDER BY da, db""".stripMargin

  /** Planted-truth spectral gate: doc_id%3 picks a pure-tone WAV
    * ([[graft.ops.MediaFixtures.sineWav]], 16 kHz, 4096 samples) whose
    * dominant FFT octave band is known by construction — the tone's
    * bin (freq·fftSize/rate: 1000 Hz→256, 6000 Hz→1536, 187.5 Hz→48)
    * sits mid-band, so the Hann main lobe cannot straddle a band edge.
    * Drives the WHOLE hand-rolled FFT path
    * ([[graft.ops.Multimodal.audioSpectra]]: decode → window → radix-2
    * FFT → octave binning → argmax) under the driver gate. */
  def audioBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtures = Seq(
        (0L, graft.ops.MediaFixtures.sineWav(1000.0, 16000, 4096)),
        (1L, graft.ops.MediaFixtures.sineWav(6000.0, 16000, 4096)),
        (2L, graft.ops.MediaFixtures.sineWav(187.5, 16000, 4096)))
      .toDF("slot", "payload")
    val media = docs(spark, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 3).as("slot"))
      .transform(QueryUtil.spreadScanIfThin(_, dir, "media_id"))
      .join(broadcast(fixtures), "slot")
      .select(col("media_id"), col("payload"),
        struct(lit("audio/wav").as("mime"),
          octet_length(col("payload")).cast("long").as("byte_len"))
          .as("meta"))
    graft.ops.Multimodal.audioSpectra(media)
      .map(s => (s.media_id, s.sample_rate, s.n_samples,
        s.band_energy.zipWithIndex.maxBy(_._1)._2))
      .toDF("media_id", "sample_rate", "n_samples", "top_band")
      .transform(QueryUtil.ordered("media_id"))
  }

  val audioBandsOracle: String =
    """SELECT doc_id AS media_id, CAST(16000 AS INTEGER) AS sample_rate,
      |  CAST(4096 AS BIGINT) AS n_samples,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 5 WHEN 1 THEN 7 ELSE 3 END
      |    AS INTEGER) AS top_band
      |FROM documents ORDER BY media_id""".stripMargin

  /** Robust per-language length stats: exact interpolated median +
    * MAD + 3-MAD outlier counts, all from ONE corpus scan into a
    * (lang, n_chars) histogram — no percentile() value buffering on a
    * hot language key. See [[graft.ops.Robust]]. */
  def outliers(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Robust.madOutlierStats(docs(spark, dir), "lang", col("n_chars"))
      .transform(QueryUtil.ordered("lang"))

  private def quantileCteSql(src: String, key: String, q: String,
      outCte: String, outCol: String): String =
    QueryUtil.quantileCteSql(src, key, q, outCte, outCol)

  val outliersOracle: String =
    s"""WITH h AS MATERIALIZED (SELECT lang, CAST(n_chars AS DOUBLE) AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1, 2),
       |${quantileCteSql("h", "lang", "0.5", "medq", "med")},
       |d0 AS (SELECT h.lang, abs(h.v - m.med) AS v, h.c
       |       FROM h JOIN medq m USING (lang)),
       |d AS MATERIALIZED (SELECT lang, v, CAST(sum(c) AS BIGINT) AS c
       |  FROM d0 GROUP BY 1, 2),
       |${quantileCteSql("d", "lang", "0.5", "madq", "mad")}
       |SELECT h.lang, round(max(m.med), 4) AS med, round(max(x.mad), 4) AS mad,
       |  CAST(sum(h.c) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN abs(h.v - m.med) > 3 * x.mad THEN h.c ELSE 0 END)
       |    AS BIGINT) AS n_outliers
       |FROM h JOIN medq m USING (lang) JOIN madq x USING (lang)
       |GROUP BY h.lang ORDER BY h.lang""".stripMargin

  /** Exact per-source token-budget mixing: 1500 tokens per source,
    * best quality grains first, boundary grain cut by doc-id prefix.
    * See [[graft.ops.Sampling.tokenBudgetMix]]. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.tokenBudgetMix(docs(spark, dir), budget = 1500L,
        bucketWidth = 512L)
      .transform(QueryUtil.ordered("source", "doc_id"))

  /** Token-budget admission replay over any (doc_id, source, text)
    * relation `src` — shared by tx_token_budget (documents) and
    * curation11 (the v6 shipped set) so the two cannot fork. Ends with
    * an `admitted` relation; callers SELECT from it. */
  private def tokenBudgetChainSql(src: String, budget: Long): String =
    s"""${tokenStatsSql(src, "source", "tb")},
      |${admitFromStatsSql("tb_d", budget)}""".stripMargin

  /** The admission tail over an arbitrary `(doc_id, source, q,
    * n_tokens)` stats relation — split out so compositions with a
    * NON-whitespace token measure (tx_curation17's unigram-LM counts)
    * admit through the SAME SQL as the whitespace-count chain. */
  private def admitFromStatsSql(statsRel: String, budget: Long): String =
    s"""tb_h AS (SELECT source, q, CAST(sum(n_tokens) AS BIGINT) AS t
      |      FROM $statsRel GROUP BY 1, 2),
      |tb_cg AS MATERIALIZED (SELECT source, q, t,
      |    CAST(sum(t) OVER (PARTITION BY source ORDER BY q DESC) AS BIGINT)
      |      AS cum FROM tb_h),
      |tb_fa AS (SELECT d.doc_id, d.source, d.q, d.n_tokens, 'grain' AS admit
      |       FROM $statsRel d JOIN tb_cg cg ON d.source = cg.source AND d.q = cg.q
      |       WHERE cg.cum <= $budget),
      |tb_bg AS (SELECT source, q, $budget - (cum - t) AS rem FROM tb_cg
      |       WHERE cum > $budget AND cum - t < $budget),
      |tb_bd AS (SELECT d.doc_id, d.source, d.q, d.n_tokens, bg.rem,
      |         CAST(sum(d.n_tokens) OVER (PARTITION BY d.source
      |           ORDER BY d.doc_id) AS BIGINT) AS c2
      |       FROM $statsRel d JOIN tb_bg bg ON d.source = bg.source AND d.q = bg.q),
      |admitted AS (
      |  SELECT doc_id, source, q, n_tokens, admit FROM tb_fa
      |  UNION ALL
      |  SELECT doc_id, source, q, n_tokens, 'boundary' AS admit
      |  FROM tb_bd WHERE c2 <= rem)""".stripMargin

  val tokenBudgetOracle: String =
    s"""WITH ${tokenBudgetChainSql("documents", 1500L)}
      |SELECT doc_id, source, q, n_tokens, admit FROM admitted
      |ORDER BY source, doc_id""".stripMargin

  /** The shared per-doc token stats CTEs (`<p>_s`, `<p>_d`): token
    * count and the 4-dp quality score per doc, grouped-column
    * aliased to `source` — ONE builder behind the token-budget chain
    * and the UniMax chain so the stats formula cannot fork between
    * them. */
  private def tokenStatsSql(src: String, groupCol: String,
      p: String): String =
    s"""${p}_s AS (SELECT doc_id, $groupCol AS source,
      |    len(string_split(text, ' ')) * 1.0 AS n,
      |    len(list_distinct(string_split(text, ' '))) * 1.0 AS nd,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'))) * 1.0 AS st
      |  FROM $src),
      |${p}_d AS MATERIALIZED (SELECT doc_id, source,
      |    round(least(n / 100.0, 1.0) * 0.4 + (nd / n) * 0.4
      |      + (1.0 - st / n) * 0.2, 4) AS q,
      |    CAST(n AS BIGINT) AS n_tokens FROM ${p}_s)""".stripMargin

  /** UniMax language-balanced admission (see
    * [[graft.ops.Sampling.unimaxMix]]): budget = `num`/`den` of the
    * corpus's total tokens, per-language allocations by the
    * epoch-capped waterfill (closed form — the capped set is a prefix
    * of the ascending-token order), each language then admitted
    * best-quality-grains-first against ITS allocation. All-BIGINT
    * waterfill, so DuckDB's `//` and Spark's `div` agree term by
    * term. */
  def unimax(spark: SparkSession, dir: String): DataFrame =
    unimaxQuery(spark, dir, 4L, 5L, 1L)

  /** The epoch-capped variant (N = 2, budget 3/2 of the corpus) —
    * registered separately so the N > 1 waterfill arm is DRIVER-gated,
    * not just spec-gated: at these parameters every SF's corpus puts
    * the low-resource languages in the capped set AT THEIR DOUBLED
    * mass (the allocation exceeds what one pass can admit — admission
    * saturates at the whole language, budget column still records the
    * published 2n) and leaves the top language uncapped with a
    * boundary cut. */
  def unimaxEpochs(spark: SparkSession, dir: String): DataFrame =
    unimaxQuery(spark, dir, 3L, 2L, 2L)

  private def unimaxQuery(spark: SparkSession, dir: String,
      num: Long, den: Long, cap: Long): DataFrame =
    graft.ops.Sampling.unimaxMix(docs(spark, dir),
        budgetNum = num, budgetDen = den, epochCap = cap,
        bucketWidth = 512L)
      .withColumnRenamed("source", "lang")
      .transform(QueryUtil.ordered("lang", "doc_id"))

  val unimaxOracle: String = unimaxOracleSql(4L, 5L, 1L)
  val unimaxEpochsOracle: String = unimaxOracleSql(3L, 2L, 2L)

  private def unimaxOracleSql(num: Long, den: Long, cap: Long): String =
    s"""WITH ${unimaxChainCtes(num, den, cap)}
      |SELECT m.doc_id, m.source AS lang, m.q, m.n_tokens, m.admit,
      |  a.bud AS lang_budget
      |FROM um_adm m JOIN um_al a ON m.source = a.source
      |ORDER BY lang, doc_id""".stripMargin

  /** The UniMax waterfill + admission CTE chain over `documents`
    * (ends in `um_adm` / `um_al`) — shared by the two tx_unimax
    * oracles AND the curation15 replay so the waterfill cannot fork
    * between standalone and composed use. */
  private def unimaxChainCtes(num: Long, den: Long, cap: Long): String =
    s"""${tokenStatsSql("documents", "lang", "um")},
      |um_lt AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n
      |    FROM um_d GROUP BY 1),
      |um_b AS (SELECT (CAST(sum(n) AS BIGINT) * $num) // $den AS b
      |    FROM um_lt),
      |um_o AS MATERIALIZED (SELECT source, n, n * $cap AS cp,
      |    row_number() OVER (ORDER BY n, source) AS i,
      |    count(*) OVER () AS l,
      |    coalesce(CAST(sum(n * $cap) OVER (ORDER BY n, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS cumcap
      |  FROM um_lt),
      |um_f AS (SELECT um_o.*, CASE WHEN cp * (l - i + 1) <= b - cumcap
      |    THEN 1 ELSE 0 END AS capped FROM um_o CROSS JOIN um_b),
      |um_k AS (SELECT coalesce(sum(capped), 0) AS k,
      |    coalesce(sum(CASE WHEN capped = 1 THEN cp END), 0) AS capmass
      |  FROM um_f),
      |um_al AS MATERIALIZED (SELECT source,
      |    CAST(CASE WHEN capped = 1 THEN cp
      |         ELSE (b - capmass) // (l - k) END AS BIGINT) AS bud
      |  FROM um_f CROSS JOIN um_k CROSS JOIN um_b),
      |${budgetedAdmitCtes("um", "um_al")}""".stripMargin

  /** Per-group-budget admission replay over an existing `${p}_d` stats
    * relation (from [[tokenStatsSql]]) and a `(source, bud)` budget
    * relation — the SQL twin of
    * [[graft.ops.Sampling.admitWithBudgets]], factored out of the
    * UniMax chain so every budgeted composition (tx_unimax,
    * tx_curation15's replay, tx_curation16's DoReMi budgets) admits
    * through ONE builder. Ends in `${p}_adm`. */
  private def budgetedAdmitCtes(p: String, budRel: String): String =
    s"""${p}_h AS (SELECT source, q, CAST(sum(n_tokens) AS BIGINT) AS t
      |    FROM ${p}_d GROUP BY 1, 2),
      |${p}_cg AS MATERIALIZED (SELECT h.source, h.q, h.t,
      |    CAST(sum(h.t) OVER (PARTITION BY h.source ORDER BY h.q DESC)
      |      AS BIGINT) AS cum, a.bud
      |  FROM ${p}_h h JOIN $budRel a ON h.source = a.source),
      |${p}_fa AS (SELECT d.doc_id, d.source, d.q, d.n_tokens,
      |      'grain' AS admit
      |    FROM ${p}_d d JOIN ${p}_cg cg
      |      ON d.source = cg.source AND d.q = cg.q
      |    WHERE cg.cum <= cg.bud),
      |${p}_bg AS (SELECT source, q, bud - (cum - t) AS rem FROM ${p}_cg
      |    WHERE cum > bud AND cum - t < bud),
      |${p}_bd AS (SELECT d.doc_id, d.source, d.q, d.n_tokens, bg.rem,
      |    CAST(sum(d.n_tokens) OVER (PARTITION BY d.source
      |      ORDER BY d.doc_id) AS BIGINT) AS c2
      |  FROM ${p}_d d JOIN ${p}_bg bg
      |    ON d.source = bg.source AND d.q = bg.q),
      |${p}_adm AS (
      |  SELECT doc_id, source, q, n_tokens, admit FROM ${p}_fa
      |  UNION ALL
      |  SELECT doc_id, source, q, n_tokens, 'boundary' AS admit
      |  FROM ${p}_bd WHERE c2 <= rem)""".stripMargin

  /** tx_curation15 — the curation ladder's MIXING front door: UniMax
    * language-balanced admission FIRST (the published fairness stage a
    * multilingual pipeline runs before anything monolingual), then
    * exact dedup of the balanced pool, then the KN bigram LM trained
    * on that pool applying the population-relative perplexity floor —
    * `tx_curation13` behind the waterfill gate, exactly as v14 put it
    * behind the trained-LID gate. Output: four-stage funnel. Every
    * stage replay is a shared builder (`unimaxChainCtes`, the keeper
    * CTE, `knSqlCtes`), so no stage can fork from its standalone row. */
  def curation15(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val base = docs(spark, dir)
    val admitted = graft.ops.Sampling.unimaxMix(base,
      budgetNum = 4L, budgetDen = 5L, epochCap = 1L, bucketWidth = 512L)
      .select("doc_id")
    val pool = Dedup.checkpointTracked(
      base.join(admitted, Seq("doc_id"), "left_semi"))
    val kept = Dedup.checkpointTracked(QueryUtil.spreadById(fpKeeper(pool)))
    val scored = Dedup.checkpointTracked(TextAnalysis.knBigramLogProb(kept))
    val thr = scored.agg(round(avg(col("kn_log10p")), 4).as("_avg"))
    val sel = scored.crossJoin(broadcast(thr))
      .filter(col("kn_log10p").isNotNull && col("kn_log10p") >= col("_avg"))
    def cnt(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt(base, "a_input")
      .unionByName(cnt(pool, "b_unimax"))
      .unionByName(cnt(kept, "c_dedup"))
      .unionByName(cnt(sel, "d_lm_kept"))
      .transform(QueryUtil.ordered("stage"))
  }

  lazy val curation15Oracle: String =
    s"""WITH ${unimaxChainCtes(4L, 5L, 1L)},
      |g15 AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d
      |  JOIN um_adm p USING (doc_id)),
      |k15 AS MATERIALIZED (SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM g15) z WHERE rn = 1),
      |${knSqlCtes("k15")},
      |flr AS (SELECT round(avg(kn_log10p), 4) AS f FROM knagg),
      |c15sel AS (SELECT a.doc_id FROM knagg a CROSS JOIN flr
      |           WHERE a.kn_log10p >= flr.f)
      |SELECT stage, n_docs FROM (
      |  SELECT 'a_input' AS stage, count(*) AS n_docs FROM documents
      |  UNION ALL SELECT 'b_unimax', count(*) FROM g15
      |  UNION ALL SELECT 'c_dedup', count(*) FROM k15
      |  UNION ALL SELECT 'd_lm_kept', count(*) FROM c15sel) t
      |ORDER BY stage""".stripMargin

  /** tx_curation16 — the DoReMi mixture APPLIED: the round-5
    * [[graft.ops.Doremi]] domain weights become per-source TOKEN
    * budgets (weight × half the corpus tokens, in exact integer
    * arithmetic: the 6-dp weight re-scaled to k/10^6 and multiplied
    * under HUGEINT/BigInt so no float division decides a budget), and
    * each source is admitted best-quality-grains-first against ITS
    * budget through the shared admission core
    * ([[graft.ops.Sampling.admitWithBudgetsPrepared]] — the UniMax
    * machinery with DoReMi allocations instead of the waterfill).
    * Output: the admitted rows with their source budgets — the
    * training mix a DoReMi run would actually draw. Stats frame is
    * checkpointed ONCE (totals pass + admission share it); weights
    * are a domain-sized collect. Oracle: `doremiChainCtes` +
    * `budgetedAdmitCtes`, so neither the update rule nor the
    * admission semantics can fork from their standalone rows. */
  def curation16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir)
    val stats = Dedup.checkpointTracked(base.select(
      col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")))
    val budgetTotal = stats.agg(sum("n_tokens")).collect().head.getLong(0) / 2
    val wts = graft.ops.Doremi.domainWeights(spark, base)
      .filter(col("round") === 5).select("source", "weight").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val budgets = wts.map { case (s, w) =>
      (s, (BigInt(math.round(w * 1e6)) * budgetTotal / 1000000).toLong)
    }.toSeq
    graft.ops.Sampling.admitWithBudgetsPrepared(stats,
        budgets.toDF("source", "_budget"), bucketWidth = 512L)
      .join(broadcast(budgets.toDF("source", "src_budget")), Seq("source"))
      .transform(QueryUtil.ordered("source", "doc_id"))
  }

  lazy val curation16Oracle: String =
    s"""WITH $doremiChainCtes,
      |${tokenStatsSql("documents", "source", "c16")},
      |c16_t AS (SELECT CAST(sum(n_tokens) AS BIGINT) // 2 AS b
      |  FROM c16_d),
      |dr_w AS (SELECT source,
      |    round(CAST(p.w5 AS DOUBLE) / CAST(s.s5 AS DOUBLE), 6) AS weight
      |  FROM dr_pw p CROSS JOIN dr_su s),
      |c16_bud AS MATERIALIZED (SELECT w.source,
      |    CAST(CAST(round(w.weight * 1000000, 0) AS HUGEINT) * t.b
      |      // 1000000 AS BIGINT) AS bud
      |  FROM dr_w w CROSS JOIN c16_t t),
      |${budgetedAdmitCtes("c16", "c16_bud")}
      |SELECT m.doc_id, m.source, m.q, m.n_tokens, m.admit,
      |  a.bud AS src_budget
      |FROM c16_adm m JOIN c16_bud a ON m.source = a.source
      |ORDER BY m.source, m.doc_id""".stripMargin

  /** Curation v17 — the budget in REAL tokenizer tokens: the v6
    * survivors' per-source token budget is measured in unigram-LM
    * tokens from a tokenizer TRAINED ON THE CURATED POOL itself (what
    * a lab actually budgets: trainable tokens under its own
    * tokenizer, not whitespace words). Chain: v6 gates → pool-trained
    * unigram model ([[graft.ops.UnigramLm.learn]]) → per-doc Viterbi
    * token totals → each source keeps its best HALF (population-
    * relative budgets) through the SAME admission core as
    * tx_token_budget ([[graft.ops.Sampling.admitWithBudgetsPrepared]]).
    * Docs with zero gated words carry zero trainable tokens and drop
    * (the tx_pack_bpe contract). Oracle: the shared v6 chain + the
    * whole unigram training replay over the shipped pool
    * ([[UnigramQueries.chainBody]]) + the shared admission tail —
    * no stage can fork from its standalone row. */
  def curation17(spark: SparkSession, dir: String): DataFrame = {
    // r15 artifact split (verdict #2): pool + pool-trained unigram
    // tokenizer load from fingerprint-guarded artifacts
    // (tx_pool_build / tx_unigram_pool_build are the always-retrain
    // lines); this row is the per-release BUDGETING pass — count
    // trainable tokens under the frozen tokenizer, admit per-source.
    // Oracle unchanged (full training replay — the loaded seg table
    // is byte-equal to in-query training).
    val shipped = CurationArtifacts.pool(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val seg = CurationArtifacts.unigramPool(spark, dir)
    val stats = Dedup.checkpointTracked(shipped
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .join(graft.ops.UnigramLm.scoreDocs(shipped, seg)
        .select(col("doc_id"), col("n_uni_tokens").as("n_tokens")),
        Seq("doc_id")))
    // population-relative budgets (the bigram-floor precedent): each
    // source keeps the best HALF of its own tokens — every multi-grain
    // source crosses its budget, so both admission arms stay live at
    // every SF (a fixed literal flips arms as the pool grows —
    // measured: 600 lost boundary at sf0.01, 100 lost grain at sf0.1)
    val budgets = stats.groupBy("source")
      .agg(expr("sum(n_tokens) div 2").as("_budget"))
    graft.ops.Sampling.admitWithBudgetsPrepared(stats, budgets,
        bucketWidth = 64L)
      .transform(QueryUtil.ordered("source", "doc_id"))
  }

  lazy val curation17Oracle: String =
    "WITH RECURSIVE" + curation6ChainSql.stripPrefix("WITH") + ",\n" +
    s"""shipped AS MATERIALIZED (SELECT k.doc_id, p.source, k.text
      |  FROM kept k JOIN sampled USING (doc_id)
      |  JOIN planted p ON k.doc_id = p.doc_id),
      |${UnigramQueries.chainBody("shipped")},
      |${tokenStatsSql("shipped", "source", "c17w")},
      |c17_tok AS (SELECT doc_id, word FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      |    FROM shipped) u
      |  WHERE regexp_matches(word, '^[a-z]+$$') AND length(word) <= 20),
      |c17_uni AS (SELECT doc_id, CAST(sum(f.n) AS BIGINT) AS n_tokens
      |  FROM c17_tok JOIN ${UnigramQueries.finalSeg} f USING (word)
      |  GROUP BY doc_id),
      |c17_d AS MATERIALIZED (SELECT d.doc_id, d.source, d.q, u.n_tokens
      |  FROM c17w_d d JOIN c17_uni u USING (doc_id)),
      |c17_bud AS MATERIALIZED (SELECT source,
      |    CAST(sum(n_tokens) AS BIGINT) // 2 AS bud
      |  FROM c17_d GROUP BY source),
      |${budgetedAdmitCtes("c17", "c17_bud")}
      |SELECT doc_id, source, q, n_tokens, admit FROM c17_adm
      |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Build lines for the curation artifact families (r15, verdict #2):
  // one always-retrain row per family — the bench honesty rule (the
  // tx_suffix_build precedent), so construction cost stays measured
  // every round while the consumer rows (curation10/11/12/17,
  // tx_clf_gate_holdout) run against the frozen artifacts.

  /** Pool-relation CTE with lang, appended to the v6 chain — the SQL
    * twin of [[CurationArtifacts]]' pool projection, shared by every
    * build-line oracle below. */
  private lazy val poolChainSql: String = curation6ChainSql + ",\n" +
    """shipped AS MATERIALIZED (SELECT k.doc_id, p.source, d.lang, k.text
      |  FROM kept k JOIN sampled USING (doc_id)
      |  JOIN planted p ON k.doc_id = p.doc_id
      |  JOIN documents d ON k.doc_id = d.doc_id)""".stripMargin

  /** tx_pool_build: force-rebuild the curated-pool artifact (the full
    * v6 chain ALWAYS runs) and emit the per-source release summary —
    * doc count, whitespace-token count, and an order-insensitive
    * bit-XOR digest of md5-low64 over every pool row, so one
    * added/dropped/edited survivor anywhere breaks the hash (the
    * tx_bpe_ids bounded-digest contract). */
  def poolBuild(spark: SparkSession, dir: String): DataFrame =
    CurationArtifacts.poolRebuild(spark, dir)
      .withColumn("_fp", TextAnalysis.md5Low64(concat_ws("|",
        col("doc_id").cast("string"), col("lang"), col("source"),
        col("text"))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        expr("bit_xor(_fp)").as("pool_hash"))
      .transform(QueryUtil.ordered("source"))

  // chains CONCATENATED, never re-stripMargin'd (the curation9Oracle
  // rule: the embedded chain's own `|| ' ' ||` continuation lines
  // would lose their leading pipes to a second strip)
  lazy val poolBuildOracle: String = poolChainSql + ",\n" +
    """pfp AS (SELECT source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || lang ||
      |      '|' || source || '|' || text), 1, 16))::UBIGINT AS h,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM shipped),
      |pg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(nt) AS BIGINT) AS n_tokens, bit_xor(h) AS hx
      |  FROM pfp GROUP BY source)
      |SELECT source, n_docs, n_tokens,
      |  CAST(hx::HUGEINT - CASE WHEN hx >= 9223372036854775808::UBIGINT
      |    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
      |    AS BIGINT) AS pool_hash
      |FROM pg ORDER BY source""".stripMargin

  /** tx_clf_pool_build: force-retrain the pool quality gate
    * (logistic classifier + isotonic calibration ON the pool —
    * curation12's model family) and emit the trained weight table.
    * The oracle replays the entire gradient run over the v6 pool, so
    * the emitted weights — and therefore the saved artifact
    * curation12 consumes — are pinned cross-engine. */
  def clfPoolBuild(spark: SparkSession, dir: String): DataFrame =
    CurationArtifacts.clfPoolRebuild(spark, dir)
      .select(col("b"), round(col("w"), 6).as("w6"))
      .transform(QueryUtil.ordered("b"))

  lazy val clfPoolBuildOracle: String = {
    val trainChain = clfTrainChainSql("shipped").stripPrefix("WITH ")
    poolChainSql + ",\n" + trainChain + "\n" +
      s"SELECT b, round(w, 6) AS w6 FROM w$ClfIters ORDER BY b"
  }

  /** tx_clf_build: force-retrain the HOLDOUT gate family
    * (tx_clf_gate_holdout's model: classifier on the unit-hash train
    * split + holdout-fitted calibration grid) and emit the weight
    * table — the same replay contract as [[clfPoolBuild]], over the
    * split corpus. */
  def clfBuild(spark: SparkSession, dir: String): DataFrame =
    CurationArtifacts.clfHoldoutRebuild(spark, dir)
      .select(col("b"), round(col("w"), 6).as("w6"))
      .transform(QueryUtil.ordered("b"))

  lazy val clfBuildOracle: String = {
    val splitPred = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))" +
      s"::UBIGINT / 4294967296.0 < $ClfTrainFrac"
    s"""${clfTrainChainSql(s"(SELECT * FROM documents WHERE $splitPred)")}
       |SELECT b, round(w, 6) AS w6 FROM w$ClfIters ORDER BY b""".stripMargin
  }

  /** tx_unigram_pool_build: force-retrain the pool tokenizer
    * (curation17's unigram-LM family) and emit the segmented word
    * table — the [[UnigramQueries]] tx_unigram contract over the v6
    * pool instead of the raw corpus, full hard-EM replay in the
    * oracle. */
  def unigramPoolBuild(spark: SparkSession, dir: String): DataFrame =
    CurationArtifacts.unigramPoolRebuild(spark, dir)
      .select(col("word"), col("cnt"), col("n_uni"), col("uni_pieces"))
      .transform(QueryUtil.ordered("word"))

  lazy val unigramPoolBuildOracle: String =
    "WITH RECURSIVE" + poolChainSql.stripPrefix("WITH") + ",\n" +
      UnigramQueries.chainBody("shipped") + "\n" +
      s"""SELECT w0.word, w0.cnt, CAST(f.n AS INTEGER) AS n_uni,
         |  f.pieces AS uni_pieces
         |FROM w0 JOIN ${UnigramQueries.finalSeg} f USING (word)
         |ORDER BY word""".stripMargin

  /** Dedup impact card: per source, docs/tokens before exact dedup,
    * after it, and the share removed — the one-table summary a dataset
    * card publishes for the dedup stage. Exact duplicate groups come
    * from the md5 fingerprint (the dd_exact core); the removed share
    * is an integer ratio rounded at the boundary. */
  def dedupImpact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      md5(col("text")).as("fp"))
    val keep = d.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val kept = d.join(keep, Seq("fp", "doc_id"), "left_semi")
    d.groupBy("source")
      .agg(count(lit(1)).as("docs_before"), sum("n_tokens").as("tokens_before"))
      .join(kept.groupBy("source")
        .agg(count(lit(1)).as("docs_after"), sum("n_tokens").as("tokens_after")),
        Seq("source"))
      .withColumn("removed_frac",
        round((col("docs_before") - col("docs_after")).cast("double") /
          col("docs_before").cast("double"), 4))
      .transform(QueryUtil.ordered("source"))
  }

  val dedupImpactOracle: String =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    md5(text) AS fp FROM documents),
      |keep AS (SELECT fp, min(doc_id) AS doc_id FROM d GROUP BY fp),
      |kept AS (SELECT d.* FROM d JOIN keep USING (fp, doc_id)),
      |b AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
      |        CAST(sum(n_tokens) AS BIGINT) AS tokens_before
      |      FROM d GROUP BY source),
      |a AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_after,
      |        CAST(sum(n_tokens) AS BIGINT) AS tokens_after
      |      FROM kept GROUP BY source)
      |SELECT b.source, b.docs_before, b.tokens_before,
      |  a.docs_after, a.tokens_after,
      |  round((b.docs_before - a.docs_after) * 1.0 / b.docs_before, 4)
      |    AS removed_frac
      |FROM b JOIN a USING (source) ORDER BY b.source""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "tx_outliers" -> ((outliers _, Some(outliersOracle))),
    "dd_impact" -> ((dedupImpact _, Some(dedupImpactOracle))),
    "tx_token_budget" -> ((tokenBudget _, Some(tokenBudgetOracle))),
    "tx_token_stats" -> ((tokenStats _, Some(tokenStatsOracle))),
    "tx_quality" -> ((quality _, Some(qualityOracle))),
    "tx_repetition" -> ((repetition _, Some(repetitionOracle))),
    "tx_hash_embed" -> ((hashEmbed _, Some(hashEmbedOracle))),
    "tx_lang_dist" -> ((langDist _, Some(langDistOracle))),
    "tx_langid" -> ((langIdTrained _, Some(langIdTrainedOracle))),
    "tx_lang_confusion" -> ((langConfusion _, Some(langConfusionOracle))),
    "tx_pii_scrub" -> ((piiScrub _, Some(piiScrubOracle))),
    "tx_url_gate" -> ((urlGate _, Some(urlGateOracle))),
    "tx_domain_stats" -> ((domainStats _, Some(domainStatsOracle))),
    "tx_domain_cap" -> ((domainCap _, Some(domainCapOracle))),
    "tx_dsir" -> ((dsir _, Some(dsirOracle))),
    "tx_clf_quality" -> ((clfQuality _, Some(clfQualityOracle))),
    "tx_clf_auc" -> ((clfAuc _, Some(clfAucOracle))),
    "tx_clf_pr" -> ((clfPr _, Some(clfPrOracle))),
    "tx_clf_calibration" -> ((clfCalibration _, Some(clfCalibrationOracle))),
    "tx_clf_isotonic" -> ((clfIsotonic _, Some(clfIsotonicOracle))),
    "tx_clf_gate_calibrated" ->
      ((clfGateCalibrated _, Some(clfGateCalibratedOracle))),
    "tx_clf_holdout" -> ((clfHoldout _, Some(clfHoldoutOracle))),
    "tx_clf_gate_holdout" ->
      ((clfGateHoldout _, Some(clfGateHoldoutOracle))),
    "tx_rank_deciles" -> ((rankDeciles _, Some(rankDecilesOracle))),
    "tx_gate_sweep" -> ((gateSweep _, Some(gateSweepOracle))),
    "tx_corpus_diff" -> ((corpusDiff _, Some(corpusDiffOracle))),
    "tx_incremental" -> ((incremental _, Some(incrementalOracle))),
    "tx_drift" -> ((drift _, Some(driftOracle))),
    "tx_heavy_hitters" -> ((heavyHittersTop _, Some(heavyHittersOracle))),
    "tx_text_canon" -> ((textCanon _, Some(textCanonOracle))),
    "tx_corpus_stats" -> ((corpusStats _, Some(corpusStatsOracle))),
    "tx_curation7" -> ((curation7 _, Some(curation7Oracle))),
    "tx_curation8" -> ((curation8 _, Some(curation8Oracle))),
    "tx_curation9" -> ((curation9 _, Some(curation9Oracle))),
    "tx_curation10" -> ((curation10 _, Some(curation10Oracle))),
    "tx_curation11" -> ((curation11 _, Some(curation11Oracle))),
    "tx_curation12" -> ((curation12 _, Some(curation12Oracle))),
    "tx_curation13" -> ((curation13 _, Some(curation13Oracle))),
    "tx_curation14" -> ((curation14 _, Some(curation14Oracle))),
    "tx_unimax" -> ((unimax _, Some(unimaxOracle))),
    "tx_unimax_epochs" -> ((unimaxEpochs _, Some(unimaxEpochsOracle))),
    "tx_curation15" -> ((curation15 _, Some(curation15Oracle))),
    "tx_curation16" -> ((curation16 _, Some(curation16Oracle))),
    "tx_curation17" -> ((curation17 _, Some(curation17Oracle))),
    "tx_pool_build" -> ((poolBuild _, Some(poolBuildOracle))),
    "tx_clf_pool_build" -> ((clfPoolBuild _, Some(clfPoolBuildOracle))),
    "tx_clf_build" -> ((clfBuild _, Some(clfBuildOracle))),
    "tx_unigram_pool_build" ->
      ((unigramPoolBuild _, Some(unigramPoolBuildOracle))),
    "tx_chunk_sliding" -> ((chunkSliding _, Some(chunkSlidingOracle))),
    "tx_pack_shards" -> ((packShards _, Some(packShardsOracle))),
    "tx_release_manifest" -> ((releaseManifest _, Some(releaseManifestOracle))),
    "tx_incremental_release" -> ((incrementalRelease _, Some(incrementalReleaseOracle))),
    "tx_tokenizer_probe" -> ((tokenizerProbe _, Some(tokenizerProbeOracle))),
    "tx_line_dedup" -> ((lineDedup _, Some(lineDedupOracle))),
    "tx_para_dedup" -> ((paraDedup _, Some(paraDedupOracle))),
    "tx_substr_dedup" -> ((substrDedup _, Some(substrDedupOracle))),
    "tx_encoding_gate" -> ((encodingGate _, Some(encodingGateOracle))),
    "tx_html_extract" -> ((htmlExtract _, Some(htmlExtractOracle))),
    "tx_pack_shards_probe" -> ((packShardsProbe _, Some(packShardsProbeOracle))),
    "tx_pack_positions" -> ((packPositions _, Some(packPositionsOracle))),
    "tx_pack_split" -> ((packSplit _, Some(packSplitOracle))),
    "tx_bm25" -> ((bm25 _, Some(bm25Oracle))),
    "tx_hybrid_search" -> ((hybridSearch _, Some(hybridSearchOracle))),
    "tx_unigram_logprob" -> ((unigramLogProb _, Some(unigramLogProbOracle))),
    "tx_bigram_logprob" -> ((bigramLogProb _, Some(bigramLogProbOracle))),
    "tx_kn_bigram" -> ((knBigram _, Some(knBigramOracle))),
    "tx_gopher_rules" -> ((gopherRules _, Some(gopherRulesOracle))),
    "tx_c4_rules" -> ((c4Rules _, Some(c4RulesOracle))),
    "tx_gopher_repetition" ->
      ((gopherRepetition _, Some(gopherRepetitionOracle))),
    "tx_temp_mix" -> ((tempMix _, Some(tempMixOracle))),
    "tx_doremi" -> ((doremi _, Some(doremiOracle))),
    "tx_fingerprints" -> ((fingerprints _, Some(fingerprintsOracle))),
    "dd_exact" -> ((exactDedup _, Some(exactDedupOracle))),
    "dd_exact_keeper" -> ((exactKeeper _, Some(exactKeeperOracle))),
    "tx_bpe_tokens" -> ((bpeTokens _, Some(bpeTokensOracle))),
    "dd_ngram_jaccard" -> ((ngramJaccard _, Some(ngramJaccardOracle))),
    "dd_minhash_lsh" -> ((minhashLsh _, Some(minhashLshOracle))),
    "dd_cross_corpus" -> ((crossCorpusMinhash _, Some(crossCorpusMinhashOracle))),
    "dd_decontaminate" -> ((decontaminate _, Some(decontaminateOracle))),
    "tx_bloom_gate" -> ((bloomGate _, Some(bloomGateOracle))),
    "tx_distinct_hll" -> ((distinctHll _, Some(distinctHllOracle))),
    "tx_pref_pairs" -> ((prefPairs _, Some(prefPairsOracle))),
    "tx_shuffle_pack" -> ((shufflePack _, Some(shufflePackOracle))),
    "tx_freq_cms" -> ((freqCms _, Some(freqCmsOracle))),
    "tx_pmi" -> ((pmi _, Some(pmiOracle))),
    "tx_weighted_sample" -> ((weightedSample _, Some(weightedSampleOracle))),
    "dd_simhash" -> ((simhashPairs _, Some(simhashOracle))),
    "dd_clusters" -> ((dedupClusters _, Some(dedupClustersOracle))),
    "dd_clusters_star" -> ((dedupClustersStar _, Some(dedupClustersOracle))),
    "dd_keep" -> ((dedupKeep _, Some(dedupKeepOracle))),
    "tx_curation" -> ((curation _, Some(curationOracle))),
    "tx_curation2" -> ((curation2 _, Some(curation2Oracle))),
    "tx_curation3" -> ((curation3 _, Some(curation3Oracle))),
    "tx_curation4" -> ((curation4 _, Some(curation4Oracle))),
    "tx_curation_funnel" -> ((curationFunnel _, Some(curationFunnelOracle))),
    "tx_curation5" -> ((curation5 _, Some(curation5Oracle))),
    "tx_curation6" -> ((curation6 _, Some(curation6Oracle))),
    "tx_sample_strata" -> ((sampleStrata _, Some(sampleStrataOracle))),
    "tx_corpus_profile" -> ((corpusProfile _, Some(corpusProfileOracle))),
    "mm_media_meta" -> ((mediaMeta _, Some(mediaMetaOracle))),
    "mm_chunks" -> ((mediaChunks _, Some(mediaChunksOracle))),
    "mm_exif_meta" -> ((exifMeta _, Some(exifMetaOracle))),
    "mm_tar_members" -> ((tarMembers _, Some(tarMembersOracle))),
    "mm_tar_longnames" -> ((tarLongNames _, Some(tarLongNamesOracle))),
    "mm_keyframes" -> ((keyframes _, Some(keyframesOracle))),
    "mm_sps" -> ((sps _, Some(spsOracle))),
    "mm_frame_types" -> ((frameTypes _, Some(frameTypesOracle))),
    "mm_gop" -> ((gop _, Some(gopOracle))),
    "mm_fragments" -> ((fragments _, Some(fragmentsOracle))),
    "mm_timeline" -> ((timeline _, Some(timelineOracle))),
    "mm_timeline_tree" -> ((timelineTree _, Some(timelineTreeOracle))),
    "mm_timeline_tracks" -> ((timelineTracks _, Some(timelineTracksOracle))),
    "mm_webm" -> ((webmBlocks _, Some(webmOracle))),
    "mm_webm_laced" -> ((webmLacedBlocks _, Some(webmLacedOracle))),
    "mm_webm_stream" -> ((webmStreamBlocks _, Some(webmOracle))),
    "mm_webm_tracks" -> ((webmTrackBlocks _, Some(webmTracksOracle))),
    "mm_webm_cues" -> ((webmCueAudit _, Some(webmCuesOracle))),
    "mm_zip_members" -> ((zipMembers _, Some(zipMembersOracle))),
    "mm_zip64_members" -> ((zip64Members _, Some(zipMembersOracle))),
    "mm_tgz_members" -> ((tgzMembers _, Some(tarMembersOracle))),
    "mm_tgz_longnames" -> ((tgzLongNames _, Some(tarLongNamesOracle))),
    "mm_meta_oracle" -> ((mediaDecode _, Some(mediaDecodeOracle))),
    "mm_frames" -> ((mediaFrames _, Some(mediaFramesOracle))),
    "mm_gif_anim" -> ((mediaGifAnim _, Some(mediaGifAnimOracle))),
    "mm_resize" -> ((mediaResize _, Some(mediaResizeOracle))),
    "mm_dhash_pairs" -> ((mediaDhashPairs _, Some(mediaDhashPairsOracle))),
    "mm_audio_bands" -> ((audioBands _, Some(audioBandsOracle))))
}
