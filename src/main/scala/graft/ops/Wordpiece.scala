package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy (WordPiece-style) and optimal (minimal-piece DP) segmentation
  * of the word table under a FIXED symbol vocabulary — the two published
  * alternatives to applying BPE merges in merge-rank order:
  *
  *   - GREEDY longest-match-first is the WordPiece apply rule (Wu et
  *     al. 2016, GNMT; the BERT tokenizer): at each position take the
  *     longest vocabulary symbol that prefixes the remainder. Same
  *     vocabulary as the learned BPE merges, generally DIFFERENT
  *     segmentations (greedy ignores merge order).
  *   - OPTIMAL is the dynamic-program lower bound: the fewest vocab
  *     pieces that concatenate to the word (the segmentation-
  *     efficiency baseline used to measure greedy/BPE inefficiency,
  *     cf. Bostrom & Durrett 2020's BPE-vs-unigram comparisons).
  *
  * Both run as pure Column programs over the VOCAB-SIZED word table
  * (never the corpus): a word ≤ `MaxWordLen` chars is segmented by a
  * fixed `MaxWordLen`-step loop of narrow projections — each step is a
  * constant-size codegen'd expression, so the whole segmentation is
  * one whole-stage-codegen pass over the word histogram, the same
  * scale shape as [[Bpe.applyMerges]] (at crawl scale the word table
  * is ~10^7–10^8 rows vs 10^11 documents; corpus scoring then
  * equi-joins the per-word result exactly like tx_bpe_apply).
  *
  * Reference scope: beyond-reference LLM-pipeline tier (the reference
  * engine has no tokenizer surface).
  */
object Wordpiece {

  /** The [[Bpe.wordTable]] gate bounds word length, which bounds both
    * loops. */
  val MaxWordLen = 20

  /** Symbol vocabulary from a learned merge sequence: base a-z plus
    * every merged surface string (duplicates collapsed — the
    * vocabulary is a SET of strings; ids are irrelevant here). */
  def vocabSymbols(merges: Seq[Bpe.Merge]): Seq[String] =
    (('a' to 'z').map(_.toString) ++ merges.map(m => m.left + m.right)).distinct

  /** Length of the longest vocabulary symbol prefixing `rest` — a
    * constant when-chain (longest length first; at a fixed position
    * two distinct symbols of equal length cannot both match, so the
    * chain is deterministic). Falls back to 1: the base alphabet is
    * always in the vocabulary, so for gated a-z words the fallback is
    * unreachable; for a hypothetical un-gated character it consumes
    * one char, mirroring the oracle's single-char step. */
  private def pieceLen(rest: Column, vocab: Seq[String]): Column = {
    val byLen = vocab.groupBy(_.length)
    val conds = for {
      l <- byLen.keys.toSeq.sorted.reverse if l >= 2
      ss <- byLen.get(l)
    } yield (substring(rest, 1, l).isin(ss: _*), l)
    conds.foldRight(lit(1): Column) { case ((c, l), acc) =>
      when(c, lit(l)).otherwise(acc)
    }
  }

  /** Greedy longest-match segmentation of `wordCol`: adds
    * `n_wp` (INT piece count) and `wp_pieces` ('|'-joined pieces, in
    * order — the BERT-style token stream for the word). */
  def withGreedy(words: DataFrame, vocab: Seq[String],
      wordCol: String = "word"): DataFrame = {
    var df = words
      .withColumn("_rest", col(wordCol))
      .withColumn("_ps", lit(""))
      .withColumn("_n", lit(0))
    for (_ <- 1 to MaxWordLen) {
      df = df
        .withColumn("_pl",
          when(col("_rest") === "", lit(0))
            .otherwise(pieceLen(col("_rest"), vocab)))
        .withColumn("_ps",
          when(col("_pl") === 0, col("_ps"))
            .otherwise(concat(col("_ps"), lit("|"),
              expr("substr(_rest, 1, _pl)"))))
        .withColumn("_n",
          col("_n") + when(col("_pl") === 0, lit(0)).otherwise(lit(1)))
        .withColumn("_rest", expr("substr(_rest, _pl + 1)"))
        .drop("_pl")
    }
    df.withColumn("n_wp", col("_n"))
      .withColumn("wp_pieces", expr("substr(_ps, 2)"))
      .drop("_rest", "_ps", "_n")
  }

  /** Frozen-model corpus scoring: per-doc greedy-WordPiece vs
    * merge-order-BPE token totals for ANY corpus under an
    * already-learned merge sequence (the train-once / score-forever
    * half — [[Bpe.MergesArtifact]] is the model). The batch word
    * table is built from `docsDf` itself (segmentation of a word is
    * corpus-independent given the frozen vocabulary), so the result
    * is per-doc-local: batch boundaries cannot change a row. */
  def scoreDocs(docsDf: DataFrame, merges: Seq[Bpe.Merge]): DataFrame = {
    val vocab = vocabSymbols(merges)
    val wordSyms = Bpe.applyMerges(docsDf, merges).select(col("word"),
      size(split(expr(s"btrim(ws, '${Bpe.Sep}')"),
        s"${Bpe.Sep}${Bpe.Sep}")).cast("long").as("_bpe"))
    val perWord = withGreedy(wordSyms, vocab)
      .select(col("word"), col("n_wp").cast("long").as("_wp"), col("_bpe"))
    docsDf
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$") &&
        length(col("word")) <= MaxWordLen)
      .join(perWord, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("_wp").as("n_wp_tokens"),
        sum("_bpe").as("n_bpe_tokens"))
  }

  /** Minimal-piece segmentation cost of `wordCol`: adds `n_opt` (INT).
    * Forward DP over positions: dp(0) = 0, dp(i) = 1 + min over vocab
    * symbols s ending at i of dp(i − |s|); the dp vector rides in an
    * array column extended one position per step. The base alphabet
    * guarantees dp(i) is always defined for gated words. */
  def withOptimal(words: DataFrame, vocab: Seq[String],
      wordCol: String = "word"): DataFrame = {
    val byLen = vocab.groupBy(_.length)
    val maxLen = vocab.map(_.length).max
    var df = words.withColumn("_dp", array(lit(0)))
    for (i <- 1 to MaxWordLen) {
      val cands: Seq[Column] = for {
        l <- (1 to math.min(maxLen, i)).toSeq
        ss <- byLen.get(l)
      } yield when(substring(col(wordCol), i - l + 1, l).isin(ss: _*),
        element_at(col("_dp"), i - l + 1) + 1)
      // `least` skips null branches; the pad literal can never win
      // (every reachable dp value is < MaxWordLen + 1)
      val dpi = least(cands :+ (lit(MaxWordLen + 1): Column): _*)
      df = df.withColumn("_dp",
        when(length(col(wordCol)) >= i, concat(col("_dp"), array(dpi)))
          .otherwise(col("_dp")))
    }
    df.withColumn("n_opt", element_at(col("_dp"), length(col(wordCol)) + 1))
      .drop("_dp")
  }
}
