package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Bpe, Wordpiece}

/** BPE merge learning + compression profile, with the ENTIRE k-round
  * training loop replayed inside the DuckDB oracle (the tx_clf_quality
  * precedent): each round's pair histogram, argmax winner and merge
  * application are unrolled CTE stages, so the oracle independently
  * re-derives the merge sequence — nothing about the engine's choices
  * leaks into the check. Counts are integers end-to-end and ties break
  * on binary string order, so the sequences must agree exactly. */
object BpeQueries {

  /** Merge rounds learned/replayed. Vocab words here are ≤ 20 symbols,
    * so k=8 always finds pairs; the engine stops early (and the oracle
    * contributes empty rows) if a corpus ever runs dry. */
  val K = 8

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Merge-table artifact frame `(rank, left_sym, right_sym,
    * pair_count)` — integers and a-z strings, so parquet round-trips
    * it exactly and a loaded sequence encodes byte-identically. */
  private def mergesFrame(spark: SparkSession,
      merges: Seq[Bpe.Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** The learned merge sequence from the fingerprint-guarded
    * `bpe_merges` artifact (r15, verdict #2 — the train-once /
    * encode-forever split): every encode-side row (tx_bpe_encode/
    * apply/vocab/ids, tx_pack_bpe, the WordPiece and triad rows)
    * consumes the frozen sequence; `tx_bpe_merges` is the
    * always-retrain build line. */
  private def loadMerges(spark: SparkSession, dir: String): Seq[Bpe.Merge] =
    graft.ops.ArtifactStore.loadOrBuild(spark, dir, "bpe_merges",
        s"k=$K", Seq("merges"))(
        Map("merges" -> mergesFrame(spark,
          Bpe.learnMerges(docs(spark, dir), K)._1)))("merges")
      .collect()
      .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** tx_bpe_merges: the learned merge table (rank, pair, count) — the
    * family's BUILD line: always retrains (the bench honesty rule)
    * and saves the artifact the encode-side rows consume. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val f = graft.ops.ArtifactStore.rebuild(spark, dir, "bpe_merges",
      s"k=$K", Seq("merges"))(
      Map("merges" -> mergesFrame(spark,
        Bpe.learnMerges(docs(spark, dir), K)._1)))("merges")
    f.select(col("rank").as("merge_rank"), col("left_sym"),
        col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_count"))
      .transform(QueryUtil.ordered("merge_rank"))
  }

  /** tx_bpe_encode: occurrence-weighted symbols-per-word by original
    * word length after all K merges — the chars-per-token / fertility
    * profile a tokenizer team tracks. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Bpe.applyMerges(docs(spark, dir), loadMerges(spark, dir))
    Bpe.compressionProfile(vocab).transform(QueryUtil.ordered("word_len"))
  }

  /** tx_bpe_apply: encode the corpus with the learned vocab — per-doc
    * post-BPE token counts via an equi-join of the doc word stream
    * against the merged word table (vocab-sized side; the corpus never
    * shuffles — words flow map-side into the join and reduce straight
    * to per-doc sums). Words outside the a-z gate are excluded from
    * both counts (defined contract, mirrored by the oracle). */
  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val vocab = Bpe.applyMerges(docs(spark, dir), loadMerges(spark, dir))
    // size-aware hint (Bpe.vocabJoinSide): broadcast while the vocab
    // fits, vocab-built shuffled hash join past the cap — never lets
    // AQE pick the corpus word stream as the build side
    val wordSyms = Bpe.vocabJoinSide(vocab.select(col("word"),
      size(split(expr(s"btrim(ws, '${Bpe.Sep}')"), s"${Bpe.Sep}${Bpe.Sep}"))
        .cast("long").as("syms")))
    docs(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$") && length(col("word")) <= 20)
      .join(wordSyms, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("syms").as("n_bpe_tokens"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  /** tx_bpe_vocab: the tokenizer's id table — base a-z at 0–25, merged
    * symbols at 26+rank−1, duplicate surface strings keeping the
    * earliest id ([[graft.ops.Bpe.vocabIdTable]]). */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    Bpe.vocabIdTable(spark, loadMerges(spark, dir))
      .transform(QueryUtil.ordered("token_id"))

  /** tx_bpe_ids: the id-encoded corpus — every (doc_id, widx, sidx,
    * token_id) row of [[graft.ops.Bpe.encodeIds]] — verified through a
    * BOUNDED registered output (the r10 verdict's scale fix): the raw
    * id frame is corpus_tokens-sized, so materializing it in total
    * order through the single-partition result sort was the one
    * scale-killer in the wrapper. Instead each doc reduces to
    * (n_ids, order-insensitive bit-XOR digest of md5-low64 over the
    * full (doc_id,widx,sidx,token_id) tuple — the Release checksum
    * pattern — plus the first 8 token ids in stream order), so a
    * single flipped/missing/duplicated token row anywhere in the
    * corpus still breaks the hash, but the registered result is
    * per-doc-sized and the heavy frame reduces under a map-side
    * partial aggregate instead of sorting in one task. */
  def bpeIds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // r15: frozen merges from the bpe_merges artifact — this row now
    // measures ENCODING (the per-corpus pass), not merge learning
    val merges = loadMerges(spark, dir)
    // spread the CPU-heavy narrow chain (regex gate -> double explode
    // -> per-token md5) across cores: the small-SF scan arrives as ONE
    // file split and would otherwise serialize it on one task (the
    // curation-chain spreadById lesson); at cluster scale this is the
    // stage-boundary layout step before a token-proportional phase
    // head_ids bound (r16, ADVICE fix): the first 8 tokens in stream
    // order are exactly the 8 lexicographically-smallest
    // (widx, sidx, token_id) tuples, so a BoundedTopK(…, 8) keeps a
    // constant 8-element buffer with map-side partials. The r15
    // `widx <= 8` pre-filter was wrong: widx numbers ALL whitespace
    // positions (posexplode runs before the regex gate), so a doc
    // whose first 8 positions include ungated words dropped tokens
    // the true first-8-gated-tokens contract includes.
    val headTuple = org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.BoundedTopK(
        org.apache.spark.sql.graft.Bridge.expression(
          struct(col("widx"), col("sidx"), col("token_id"))), 8)
        .toAggregateExpression())
    Bpe.encodeIds(spark, QueryUtil.spreadById(docs(spark, dir)), merges)
      .withColumn("_fp", graft.ops.TextAnalysis.md5Low64(
        concat_ws("|", col("doc_id").cast("string"),
          col("widx").cast("string"), col("sidx").cast("string"),
          col("token_id").cast("string"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ids"),
        expr("bit_xor(_fp)").as("ids_hash"),
        concat_ws(",", transform(headTuple,
          t => t.getField("token_id").cast("string"))).as("head_ids"))
      .transform(QueryUtil.ordered("doc_id"))
  }

  /** tx_pack_bpe: token-budget shard packing on REAL tokenizer counts —
    * the curation-variant swap the r9 verdict asked for: the packing
    * input is per-doc post-BPE token totals (tx_bpe_apply's
    * n_bpe_tokens), not whitespace counts, through the same two-level
    * prefix-sum core ([[graft.ops.Packing.packFromCounts]]). Docs with
    * zero gated words carry zero trainable tokens and are excluded
    * (defined contract, mirrored by the oracle). */
  val PackBudget = 5000L

  def packBpe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val wordSyms = Bpe.vocabJoinSide(
      Bpe.applyMerges(docs(spark, dir), loadMerges(spark, dir))
        .select(col("word"),
          size(split(expr(s"btrim(ws, '${Bpe.Sep}')"),
            s"${Bpe.Sep}${Bpe.Sep}")).cast("long").as("syms")))
    val counts = docs(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$") && length(col("word")) <= 20)
      .join(wordSyms, "word")
      .groupBy("doc_id").agg(sum("syms").as("n_tokens"))
    graft.ops.Packing.packFromCounts(counts, PackBudget, bucketWidth = 64L)
      .transform(QueryUtil.ordered("doc_id"))
  }

  /** tx_wordpiece: greedy-WordPiece vs merge-order-BPE vs optimal-DP
    * segmentation of the word table under the SAME learned vocabulary —
    * the tokenizer-efficiency diagnostic (greedy_gap / bpe_gap = extra
    * pieces each apply rule pays over the minimal segmentation). One
    * row per gated word; `wp_pieces` is the BERT-style greedy token
    * stream, exact-checked against a recursive-CTE replay. */
  def wordpiece(spark: SparkSession, dir: String): DataFrame = {
    val merges = loadMerges(spark, dir)
    val vocabDf = Bpe.applyMerges(docs(spark, dir), merges)
    val vocab = Wordpiece.vocabSymbols(merges)
    val base = vocabDf.select(col("word"), col("cnt"),
      size(split(expr(s"btrim(ws, '$S')"), s"$S$S")).as("n_bpe"))
    Wordpiece.withOptimal(Wordpiece.withGreedy(base, vocab), vocab)
      .select(col("word"), col("cnt"), col("n_bpe"), col("n_wp"),
        col("n_opt"),
        (col("n_wp") - col("n_opt")).as("greedy_gap"),
        (col("n_bpe") - col("n_opt")).as("bpe_gap"),
        col("wp_pieces"))
      .transform(QueryUtil.ordered("word"))
  }

  /** tx_wordpiece_apply: per-doc greedy-WordPiece vs BPE token totals —
    * the corpus-side fertility comparison. Same scale shape as
    * tx_bpe_apply: the corpus word stream equi-joins the vocab-sized
    * per-word piece counts and reduces straight to per-doc sums. */
  def wordpieceApply(spark: SparkSession, dir: String): DataFrame = {
    Wordpiece.scoreDocs(docs(spark, dir), loadMerges(spark, dir))
      .transform(QueryUtil.ordered("doc_id"))
  }

  // ---------------------------------------------------------------- oracle

  private val S = Bpe.Sep

  /** Word histogram + K unrolled merge rounds. Each round: overlapping
    * pair counts from the wrapped strings, deterministic argmax,
    * left-to-right non-overlapping replace. The coalesce guard turns an
    * exhausted round's NULL scalar into a no-op replace instead of
    * NULL-poisoning later rounds. */
  private def chainSql(k: Int): String = {
    val sb = new StringBuilder(
      s"""WITH w0 AS MATERIALIZED (
         |  SELECT word, CAST(length(word) AS INTEGER) AS word_len,
         |    regexp_replace(word, '(.)', '$S\\1$S', 'g') AS ws, cnt
         |  FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt
         |    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
         |          FROM documents) u
         |    WHERE regexp_matches(word, '^[a-z]+$$') AND length(word) <= 20
         |    GROUP BY word) f)""".stripMargin)
    for (r <- 1 to k) {
      val prev = s"w${r - 1}"
      sb ++= s""",
         |p$r AS MATERIALIZED (SELECT l[i] AS s1, l[i + 1] AS s2,
         |    CAST(sum(cnt) AS BIGINT) AS total
         |  FROM (SELECT string_split(trim(ws, '$S'), '$S$S') AS l, cnt
         |        FROM $prev) t,
         |       LATERAL (SELECT unnest(range(1, len(l))) AS i) g
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT s1, s2, total FROM p$r
         |  ORDER BY total DESC, s1, s2 LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, word_len,
         |    replace(ws,
         |      coalesce('$S' || (SELECT s1 FROM b$r) || '$S$S' ||
         |        (SELECT s2 FROM b$r) || '$S', '$S$S'),
         |      coalesce('$S' || (SELECT s1 FROM b$r) ||
         |        (SELECT s2 FROM b$r) || '$S', '$S$S')) AS ws, cnt
         |  FROM $prev)""".stripMargin
    }
    sb.toString
  }

  val bpeMergesOracle: String = {
    val branches = (1 to K).map { r =>
      s"""SELECT $r AS merge_rank, s1 AS left_sym, s2 AS right_sym,
         |  s1 || s2 AS merged, total AS pair_count FROM b$r""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""${chainSql(K)}
       |SELECT merge_rank, left_sym, right_sym, merged, pair_count FROM (
       |  $branches) m
       |ORDER BY merge_rank""".stripMargin
  }

  val bpeEncodeOracle: String =
    s"""${chainSql(K)}
       |SELECT word_len,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(cnt) AS BIGINT) AS occurrences,
       |  CAST(sum(cnt * len(string_split(trim(ws, '$S'), '$S$S')))
       |    AS BIGINT) AS n_syms,
       |  round(sum(cnt * len(string_split(trim(ws, '$S'), '$S$S'))) * 1.0
       |    / sum(cnt), 4) AS avg_syms
       |FROM w$K GROUP BY word_len ORDER BY word_len""".stripMargin

  val bpeApplyOracle: String =
    s"""${chainSql(K)},
       |tokd AS (SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
       |    FROM documents) u
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND length(word) <= 20),
       |vsym AS (SELECT word,
       |    CAST(len(string_split(trim(ws, '$S'), '$S$S')) AS BIGINT) AS syms
       |  FROM w$K)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(syms) AS BIGINT) AS n_bpe_tokens
       |FROM tokd JOIN vsym USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Id table replay: base a-z + one row per unrolled merge round,
    * duplicate surface strings collapsed to the minimum id — shared by
    * the vocab and ids oracles so the id assignment cannot fork. */
  private def idsCtes: String = {
    val mergeRows = (1 to K).map { r =>
      s"SELECT CAST(${25 + r} AS BIGINT) AS token_id, s1 || s2 AS sym FROM b$r"
    }.mkString("\n  UNION ALL\n  ")
    s"""ids0 AS (SELECT CAST(i AS BIGINT) AS token_id,
       |    chr(CAST(97 + i AS INTEGER)) AS sym
       |    FROM (SELECT unnest(range(0, 26)) AS i) a
       |  UNION ALL
       |  $mergeRows),
       |ids AS (SELECT sym, CAST(min(token_id) AS BIGINT) AS token_id
       |  FROM ids0 GROUP BY sym)""".stripMargin
  }

  val bpeVocabOracle: String =
    s"""${chainSql(K)},
       |$idsCtes
       |SELECT token_id, sym FROM ids ORDER BY token_id""".stripMargin

  val bpeIdsOracle: String =
    s"""${chainSql(K)},
       |$idsCtes,
       |wsym AS (SELECT word, string_split(trim(ws, '$S'), '$S$S') AS syms
       |  FROM w$K),
       |tokw AS (SELECT doc_id, CAST(i AS BIGINT) AS widx, l[i] AS word
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
       |        FROM documents) t,
       |       LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) g
       |  WHERE regexp_matches(l[i], '^[a-z]+$$') AND length(l[i]) <= 20),
       |toks AS (SELECT doc_id, widx, CAST(j AS BIGINT) AS sidx,
       |    syms[j] AS sym
       |  FROM (SELECT doc_id, widx, syms
       |        FROM tokw JOIN wsym USING (word)) x,
       |       LATERAL (SELECT unnest(range(1, len(syms) + 1)) AS j) h),
       |idrows AS (SELECT doc_id, widx, sidx, token_id
       |  FROM toks JOIN ids USING (sym)),
       |idfp AS (SELECT doc_id, widx, sidx, token_id,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
       |      CAST(widx AS VARCHAR) || '|' || CAST(sidx AS VARCHAR) ||
       |      '|' || CAST(token_id AS VARCHAR)), 1, 16))::UBIGINT AS h
       |  FROM idrows),
       |idg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ids,
       |    bit_xor(h) AS h,
       |    array_to_string((list(token_id ORDER BY widx, sidx))[1:8], ',')
       |      AS head_ids
       |  FROM idfp GROUP BY doc_id)
       |SELECT doc_id, n_ids,
       |  CAST(h::HUGEINT - CASE WHEN h >= 9223372036854775808::UBIGINT
       |    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
       |    AS ids_hash,
       |  head_ids
       |FROM idg ORDER BY doc_id""".stripMargin

  val packBpeOracle: String =
    s"""${chainSql(K)},
       |tokd AS (SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
       |    FROM documents) u
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND length(word) <= 20),
       |vsym AS (SELECT word,
       |    CAST(len(string_split(trim(ws, '$S'), '$S$S')) AS BIGINT) AS syms
       |  FROM w$K),
       |cnts AS (SELECT doc_id, CAST(sum(syms) AS BIGINT) AS n
       |  FROM tokd JOIN vsym USING (word) GROUP BY doc_id),
       |pre AS (SELECT doc_id, n,
       |    sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM cnts)
       |SELECT doc_id, n AS n_tokens,
       |  CAST((cum - n) // $PackBudget AS BIGINT) AS shard
       |FROM pre ORDER BY doc_id""".stripMargin

  /** Shared CTE block for the wordpiece oracles: the learned-vocab
    * symbol set, the greedy segmentation, and the minimal-piece DP.
    * Greedy: the longest-match pick at every (word, position) is
    * precomputed as a PLAIN materialized aggregate (`pk` — max_by on
    * length is deterministic: two distinct equal-length symbols cannot
    * both equal the same substring; coalesce mirrors the engine's
    * 1-char fallback, unreachable for gated a-z words), and the
    * recursion is then a simple equi-join walk over positions — NO
    * correlated subquery inside the recursive part, which DuckDB's
    * decorrelation handled non-deterministically (observed: identical
    * SQL returning longest-match picks in one run and 1-char picks in
    * another when ORDER BY..LIMIT 1 sat under REC; the join form is
    * stable). DP: unrolled one CTE stage per position (dpa_i carries
    * dp(0..i); word length is gated ≤ [[Wordpiece.MaxWordLen]], and
    * every stage is MATERIALIZED — dpa_i is referenced twice, so the
    * un-hinted form re-inlines the whole chain exponentially). */
  private def wordpieceCtes: String = {
    val mergeSyms = (1 to K)
      .map(r => s"SELECT s1 || s2 AS sym FROM b$r")
      .mkString("\n  UNION ALL\n  ")
    val dpStages = (1 to Wordpiece.MaxWordLen).map { i =>
      s"""dp$i AS MATERIALIZED (SELECT p.word, $i AS pos,
         |    CAST(min(p.cost) + 1 AS INTEGER) AS cost
         |  FROM dpa${i - 1} p JOIN vsyms v
         |    ON p.pos = $i - length(v.sym)
         |    AND substr(p.word, $i - CAST(length(v.sym) AS INTEGER) + 1,
         |          length(v.sym)) = v.sym
         |  WHERE length(p.word) >= $i
         |  GROUP BY p.word),
         |dpa$i AS MATERIALIZED (SELECT * FROM dpa${i - 1}
         |  UNION ALL SELECT * FROM dp$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""vsyms AS MATERIALIZED (SELECT DISTINCT sym FROM (
       |  SELECT chr(CAST(97 + i AS INTEGER)) AS sym
       |    FROM (SELECT unnest(range(0, 26)) AS i) a
       |  UNION ALL
       |  $mergeSyms) v0),
       |pk AS MATERIALIZED (
       |  SELECT a.word, a.pos,
       |    coalesce(max_by(v.sym, length(v.sym)), substr(a.word, a.pos, 1))
       |      AS pick
       |  FROM (SELECT word,
       |          CAST(unnest(range(1, length(word) + 1)) AS INTEGER) AS pos
       |        FROM w$K) a
       |  LEFT JOIN vsyms v ON substr(a.word, a.pos, length(v.sym)) = v.sym
       |  GROUP BY a.word, a.pos),
       |seg AS (
       |  SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS pieces, 0 AS n
       |  FROM w$K
       |  UNION ALL
       |  SELECT s.word, CAST(s.pos + length(p.pick) AS INTEGER),
       |    s.pieces || '|' || p.pick, s.n + 1
       |  FROM seg s JOIN pk p ON p.word = s.word AND p.pos = s.pos
       |  WHERE s.pos <= length(s.word)),
       |greedy AS MATERIALIZED (SELECT word, CAST(n AS INTEGER) AS n_wp,
       |    substr(pieces, 2) AS wp_pieces
       |  FROM seg WHERE pos = length(word) + 1),
       |dpa0 AS MATERIALIZED (SELECT word, 0 AS pos, 0 AS cost FROM w$K),
       |$dpStages,
       |opt AS MATERIALIZED (SELECT word, cost AS n_opt
       |  FROM dpa${Wordpiece.MaxWordLen}
       |  WHERE pos = length(word))""".stripMargin
  }

  val wordpieceOracle: String =
    s"""WITH RECURSIVE${chainSql(K).stripPrefix("WITH")},
       |$wordpieceCtes
       |SELECT b.word, b.cnt,
       |  CAST(len(string_split(trim(b.ws, '$S'), '$S$S')) AS INTEGER)
       |    AS n_bpe,
       |  g.n_wp, o.n_opt,
       |  CAST(g.n_wp - o.n_opt AS INTEGER) AS greedy_gap,
       |  CAST(len(string_split(trim(b.ws, '$S'), '$S$S')) - o.n_opt
       |    AS INTEGER) AS bpe_gap,
       |  g.wp_pieces
       |FROM w$K b JOIN greedy g USING (word) JOIN opt o USING (word)
       |ORDER BY b.word""".stripMargin

  val wordpieceApplyOracle: String =
    s"""WITH RECURSIVE${chainSql(K).stripPrefix("WITH")},
       |$wordpieceCtes,
       |vsym AS (SELECT word,
       |    CAST(len(string_split(trim(ws, '$S'), '$S$S')) AS BIGINT) AS syms
       |  FROM w$K),
       |tokd AS (SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
       |    FROM documents) u
       |  WHERE regexp_matches(word, '^[a-z]+$$') AND length(word) <= 20)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(g.n_wp) AS BIGINT) AS n_wp_tokens,
       |  CAST(sum(v.syms) AS BIGINT) AS n_bpe_tokens
       |FROM tokd JOIN greedy g USING (word) JOIN vsym v USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** tx_tokenizer_triad: per-word fertility across ALL THREE trained
    * tokenizers — merge-order BPE, greedy WordPiece and minimal-DP
    * under the BPE vocabulary, and the unigram-LM's Viterbi count
    * under its OWN trained model (Bostrom & Durrett 2020's BPE-vs-
    * unigram comparison, as a standing diagnostic table). The oracle
    * replays all three training runs in one statement: the K-round
    * merge chain, the greedy/DP segmentation CTEs, and the unigram
    * hard-EM chain (CTEs prefixed `uw0` — the one name the chains
    * share). */
  def tokenizerTriad(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val merges = loadMerges(spark, dir)
    val vocabDf = Bpe.applyMerges(d, merges)
    val wpVocab = Wordpiece.vocabSymbols(merges)
    val base = vocabDf.select(col("word"), col("cnt"),
      size(split(expr(s"btrim(ws, '$S')"), s"$S$S")).as("n_bpe"))
    val wp = Wordpiece.withOptimal(
      Wordpiece.withGreedy(base, wpVocab), wpVocab)
    val seg = UnigramQueries.loadSeg(spark, dir)
    wp.join(seg.select(col("word"), col("n_uni")), Seq("word"))
      .select(col("word"), col("cnt"), col("n_bpe"), col("n_wp"),
        col("n_opt"), col("n_uni"))
      .transform(QueryUtil.ordered("word"))
  }

  val tokenizerTriadOracle: String =
    s"""WITH RECURSIVE${chainSql(K).stripPrefix("WITH")},
       |$wordpieceCtes,
       |${UnigramQueries.chainBody("documents").replace("w0", "uw0")}
       |SELECT b.word, b.cnt,
       |  CAST(len(string_split(trim(b.ws, '$S'), '$S$S')) AS INTEGER)
       |    AS n_bpe,
       |  g.n_wp, o.n_opt, CAST(f.n AS INTEGER) AS n_uni
       |FROM w$K b JOIN greedy g USING (word) JOIN opt o USING (word)
       |JOIN ${UnigramQueries.finalSeg} f USING (word)
       |ORDER BY b.word""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    Map(
      "tx_tokenizer_triad" -> ((tokenizerTriad _, Some(tokenizerTriadOracle))),
      "tx_bpe_merges" -> ((bpeMerges _, Some(bpeMergesOracle))),
      "tx_bpe_encode" -> ((bpeEncode _, Some(bpeEncodeOracle))),
      "tx_bpe_apply" -> ((bpeApply _, Some(bpeApplyOracle))),
      "tx_bpe_vocab" -> ((bpeVocab _, Some(bpeVocabOracle))),
      "tx_bpe_ids" -> ((bpeIds _, Some(bpeIdsOracle))),
      "tx_pack_bpe" -> ((packBpe _, Some(packBpeOracle))),
      "tx_wordpiece" -> ((wordpiece _, Some(wordpieceOracle))),
      "tx_wordpiece_apply" -> ((wordpieceApply _, Some(wordpieceApplyOracle))))
}
