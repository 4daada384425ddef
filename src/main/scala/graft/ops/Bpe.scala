package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — tokenizer-vocabulary construction
  * as a Spark plan.
  *
  * Sennrich-style byte-pair encoding re-shaped for scale: the corpus is
  * scanned ONCE into a word-frequency table (vocabulary-sized — at
  * crawl scale ~10^7–10^8 rows against 10^11 documents), and every
  * merge round after that touches only that table. Per round:
  * adjacent-symbol pair counting is one map-side-combined aggregation
  * whose key space is the pair vocabulary, the winner is a 1-row
  * TakeOrdered, and the merge application is a narrow map (string
  * replace) — k merges cost k small vocab-table jobs after exactly one
  * corpus pass, the shape industrial BPE trainers use (word-histogram
  * first, never re-tokenize the corpus per merge).
  *
  * Symbol sequences ride in ONE delimiter-wrapped string
  * ("␟h␟␟e␟…"): replacing "␟A␟␟B␟"
  * with "␟AB␟" is the left-to-right non-overlapping greedy
  * merge of classic BPE ("aaaa" + merge (a,a) → "aa","aa"), and full
  * wrapping makes the pattern boundary-safe against symbol-substring
  * collisions ("XA B" can never match "A B"). Pair counting is
  * OVERLAPPING (zip(w, w[1:]) — "aaaa" contributes (a,a)×3), also the
  * classic definition. Merge selection tie-breaks on
  * (count DESC, left, right) binary string order so engine and oracle
  * pick identical merge sequences; counts are integers end-to-end, so
  * no summation-order noise exists anywhere. Interior-only variant: no
  * end-of-word sentinel (GPT-2-style byte-level BPE also has none);
  * the alphabet is gated to lowercase a-z words ≤ 20 chars so the
  * symbol strings stay delimiter-clean by construction.
  *
  * Reference scope: the reference engine has no tokenizer surface —
  * this is part of the beyond-reference LLM-pipeline tier (vocab /
  * merge construction feeding the tx_bpe_tokens/tx_pmi family).
  */
object Bpe {

  /** Symbol delimiter (U+241F SYMBOL FOR UNIT SEPARATOR): cannot occur
    * in the gated a-z alphabet, so wrapping is collision-free. */
  val Sep = "␟"

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** One corpus pass: (word, cnt, word_len) over lowercase a-z words
    * (≤ 20 chars), occurrence-weighted. Splitting on a single space
    * (not \s+) keeps the engine and the DuckDB oracle byte-identical
    * on every whitespace shape (the tokenizer-probe lesson). */
  def wordTable(docsDf: DataFrame): DataFrame =
    docsDf.select(explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$") && length(col("word")) <= 20)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("word_len", length(col("word")))

  /** Wrap each character: "he" → "␟h␟␟e␟". */
  def wrapSymbols(word: Column): Column =
    regexp_replace(word, "(.)", s"$Sep$$1$Sep")

  /** Overlapping adjacent-pair counts, occurrence-weighted: one
    * partial-agg job over the vocab table; key space = pair vocab. */
  private[graft] def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .withColumn("_l", split(expr(s"btrim(ws, '$Sep')"), s"$Sep$Sep"))
      .withColumn("_n", size(col("_l")))
      .where(col("_n") >= 2)
      .select(explode(expr(
        "transform(sequence(1, _n - 1), i -> " +
          "struct(element_at(_l, i) AS s1, element_at(_l, i + 1) AS s2))"))
        .as("_p"), col("cnt"))
      .groupBy(col("_p.s1").as("s1"), col("_p.s2").as("s2"))
      .agg(sum("cnt").as("total"))

  /** Rounds of [[learnMerges]] whose string-replace maps may CHAIN as
    * narrow expressions before the vocab frame is re-materialized: a
    * chain of ≤ 8 replaces over the vocab-sized cached frame costs
    * far less than 8 eager checkpoint jobs (r18 — the per-round
    * checkpoint was one full materialization per merge, pure job
    * overhead at every scale), while the cap keeps the recompute
    * depth bounded for large k (an unbounded chain would re-apply
    * O(r) replaces inside round r's pair count — O(k²) total). */
  private val MergeCheckpointEvery = 8

  /** Learn `k` merges. Returns the merge table (rank order) and the
    * final vocab frame (word, ws, cnt, word_len) with all merges
    * applied. Each round's winner is a single collected row
    * (model-sized by definition); the vocab frame is persisted once
    * and re-materialized every [[MergeCheckpointEvery]] merges so
    * lineage stays bounded without paying one checkpoint job per
    * round. Stops early if no pair remains. */
  def learnMerges(docsDf: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    // the base is CHECKPOINTED (a leaf scan), not persisted: every
    // round's pair count re-plans the chained-replace tree, and over
    // a persisted base each of those plannings pays a CacheManager
    // canonicalization walk of the growing tree (measured 1.8 s of
    // pure driver gap over 8 rounds, r18) — over a leaf it is flat
    var vocab: DataFrame = Dedup.checkpointTracked(
      wordTable(docsDf).withColumn("ws", wrapSymbols(col("word"))))
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var chained = 0
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("total"), asc("s1"), asc("s2")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (s1, s2) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(r, s1, s2, top(0).getLong(2))
        // s1/s2 are a-z only by construction — safe to inline
        vocab = vocab.withColumn("ws",
          expr(s"replace(ws, '$Sep$s1$Sep$Sep$s2$Sep', '$Sep$s1$s2$Sep')"))
        chained += 1
        if (chained >= MergeCheckpointEvery) {
          vocab = Dedup.checkpointTracked(vocab)
          chained = 0
        }
        r += 1
      }
    }
    // r19 (ADVICE r18): never return an unmaterialized replace chain —
    // a caller running multiple actions on the returned frame would
    // re-execute up to MergeCheckpointEvery-1 chained replaces (and
    // the upstream plan) per action. One checkpoint job at most.
    if (chained > 0) vocab = Dedup.checkpointTracked(vocab)
    (merges.result(), vocab)
  }

  /** GPT-style vocabulary id table from a learned merge sequence: the
    * base alphabet a-z takes ids 0–25, then one id per merge in rank
    * order (id = 26 + rank − 1). Two merges can yield the same surface
    * string ((a,bc) and (ab,c) both produce "abc"); the table is keyed
    * by SYMBOL STRING, so duplicates keep the LOWEST id (earliest
    * rank) — the symbol→id map stays a function. Model-sized
    * (≤ 26 + k rows) by construction. */
  def vocabIdTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val base = ('a' to 'z').map(c => (c.toString, (c - 'a').toLong))
    val learned = merges.map(m => (m.left + m.right, 25L + m.rank))
    (base ++ learned).groupBy(_._1).view
      .mapValues(_.map(_._2).min).toSeq
      .map { case (s, id) => (id, s) }.sortBy(_._1)
      .toDF("token_id", "sym")
  }

  /** Apply an already-learned merge sequence to a (new) corpus's word
    * table — the encode-time twin of [[learnMerges]] (train once,
    * encode any corpus from the persisted artifact). No per-round
    * action exists here, so the k string-replaces chain as ONE narrow
    * map over the vocab-sized table (no checkpoints needed — lineage
    * is k replace expressions, not k jobs). */
  def applyMerges(docsDf: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(
      wordTable(docsDf).withColumn("ws", wrapSymbols(col("word")))) {
      (v, m) =>
        v.withColumn("ws", expr(
          s"replace(ws, '$Sep${m.left}$Sep$Sep${m.right}$Sep', " +
            s"'$Sep${m.left}${m.right}$Sep')"))
    }

  /** Broadcast cap (rows) for a vocab-shaped join side — distinct
    * gated words plus their segmentation, ~100–200 B/row, so 1M rows
    * is a ~100–200 MB broadcast: comfortably inside executor memory
    * on any 100 TB-class cluster, far above every bench SF. */
  val BroadcastVocabMaxRows = 1000000L

  /** Size-aware join hint for a vocab-shaped (one row per distinct
    * gated word) table. Neither static choice survives both ends of
    * the scale axis: AQE left to its own stats picked the
    * corpus-token-sized exploded stream as the BUILD side at small SF
    * (r15 plan audit) — a full token-stream shuffle, or an impossible
    * broadcast, at corpus scale — while an unconditional `broadcast()`
    * hint bypasses autoBroadcastJoinThreshold entirely and OOMs the
    * driver once a crawl's gated vocab reaches 10^7–10^8 words. So the
    * table is persisted (tracked — [[Dedup.releaseCaches]] frees it)
    * and counted once: ≤ [[BroadcastVocabMaxRows]] broadcasts (the
    * corpus never shuffles), above it a `shuffle_hash` hint pins the
    * vocab side as the build side of a shuffled hash join — the word
    * key's hot heads ("the") are stream-side skew, which AQE's
    * skew-join split handles for SHJ. The count is one extra job over
    * data the old broadcast path materialized on the driver anyway. */
  private[graft] def vocabJoinSide(df: DataFrame,
      cap: Long = BroadcastVocabMaxRows): DataFrame = {
    val cached = Dedup.persistTracked(df)
    if (cached.count() <= cap) broadcast(cached)
    else cached.hint("shuffle_hash")
  }

  /** Id-encoded corpus: every gated word of every document as
    * (doc_id, widx, sidx, token_id) rows — widx = 1-based word
    * position in the doc, sidx = 1-based symbol position in the word,
    * token_id from [[vocabIdTable]]. The corpus word stream equi-joins
    * the vocab-sized symbol table ([[vocabJoinSide]]: broadcast while
    * it fits, vocab-built shuffled hash join past the cap — the
    * corpus-token stream is never the build side either way), then the
    * model-sized id table broadcasts. Words outside the a-z gate are
    * excluded (the [[wordTable]] contract). Output rows = total
    * post-merge tokens — this IS the corpus a trainer reads. */
  def encodeIds(spark: org.apache.spark.sql.SparkSession,
      docsDf: DataFrame, merges: Seq[Merge]): DataFrame = {
    val wordSyms = vocabJoinSide(applyMerges(docsDf, merges).select(col("word"),
      split(expr(s"btrim(ws, '$Sep')"), s"$Sep$Sep").as("_syms")))
    val ids = broadcast(vocabIdTable(spark, merges))
    docsDf
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("_w0", "word")))
      .where(col("word").rlike("^[a-z]+$") && length(col("word")) <= 20)
      .withColumn("widx", (col("_w0") + 1).cast("long")).drop("_w0")
      .join(wordSyms, "word")
      .select(col("doc_id"), col("widx"),
        posexplode(col("_syms")).as(Seq("_s0", "sym")))
      .withColumn("sidx", (col("_s0") + 1).cast("long")).drop("_s0")
      .join(ids, "sym")
      .select("doc_id", "widx", "sidx", "token_id")
  }

  /** Merge-sequence artifacts — the tokenizer model: persist the
    * learned (rank, left, right, count) table once, reload it to
    * encode any corpus ([[applyMerges]]/[[encodeIds]]) without
    * re-training. Load validates ranks are exactly 1..k (a truncated
    * or duplicated artifact would silently encode with a DIFFERENT
    * tokenizer — rejected loudly instead). */
  object MergesArtifact {
    def save(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge],
        path: String): Unit = {
      require(merges.nonEmpty, "empty merge sequence")
      import spark.implicits._
      merges.map(m => (m.rank, m.left, m.right, m.count))
        .toDF("rank", "left", "right", "count").coalesce(1)
        .write.mode("overwrite").parquet(path)
    }

    def load(spark: org.apache.spark.sql.SparkSession,
        path: String): Seq[Merge] = {
      val rows = spark.read.parquet(path).collect()
        .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("left"),
          r.getAs[String]("right"), r.getAs[Long]("count")))
        .sortBy(_.rank).toSeq
      require(rows.nonEmpty, s"empty BPE merges artifact at $path")
      require(rows.map(_.rank) == (1 to rows.length),
        s"BPE merges artifact at $path: ranks ${rows.map(_.rank)} are " +
          s"not contiguous 1..${rows.length}")
      rows
    }
  }

  /** Compression profile of a learned vocab: per original word length,
    * how many symbols the merged encoding needs (occurrence-weighted).
    * The post-merge twin of tx_token_stats — the number a tokenizer
    * team actually tracks (chars-per-token / fertility). */
  def compressionProfile(vocab: DataFrame): DataFrame =
    vocab
      .withColumn("_syms",
        size(split(expr(s"btrim(ws, '$Sep')"), s"$Sep$Sep")).cast("long"))
      .groupBy("word_len")
      .agg(count(lit(1)).as("n_words"),
        sum("cnt").as("occurrences"),
        sum(col("cnt") * col("_syms")).as("n_syms"),
        round(sum(col("cnt") * col("_syms")).cast("double") /
          sum("cnt").cast("double"), 4).as("avg_syms"))
}
