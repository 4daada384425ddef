package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Bpe

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

  /** tx_bpe_merges: the learned merge table (rank, pair, count). */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val (merges, _) = Bpe.learnMerges(docs(spark, dir), K)
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.left + m.right, m.count))
      .toDF("merge_rank", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** tx_bpe_encode: occurrence-weighted symbols-per-word by original
    * word length after all K merges — the chars-per-token / fertility
    * profile a tokenizer team tracks. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, vocab) = Bpe.learnMerges(docs(spark, dir), K)
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
    val (_, vocab) = Bpe.learnMerges(docs(spark, dir), K)
    val wordSyms = vocab.select(col("word"),
      size(split(expr(s"btrim(ws, '${Bpe.Sep}')"), s"${Bpe.Sep}${Bpe.Sep}"))
        .cast("long").as("syms"))
    docs(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$") && length(col("word")) <= 20)
      .join(wordSyms, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("syms").as("n_bpe_tokens"))
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

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    Map(
      "tx_bpe_merges" -> ((bpeMerges _, Some(bpeMergesOracle))),
      "tx_bpe_encode" -> ((bpeEncode _, Some(bpeEncodeOracle))),
      "tx_bpe_apply" -> ((bpeApply _, Some(bpeApplyOracle))))
}
