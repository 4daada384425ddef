package graft.ops

import org.apache.spark.sql.functions._
import graft.etl.SparkSpec

/** BPE merge-learning contracts: classic merge sequence, overlap
  * semantics, deterministic tie-breaks, partitioning independence. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("learnMerges: the classic low/lower/lowest sequence, early stop") {
    val d = corpus("low low low lower lowest")
    val (merges, _) = Bpe.learnMerges(d, 8)
    // (l,o) ties (o,w) at 5 → lexicographic; then the chain collapses
    // every word and round 7 finds no pairs left.
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("l", "o", 5L), ("lo", "w", 5L), ("low", "e", 2L),
      ("lowe", "r", 1L), ("lowe", "s", 1L), ("lowes", "t", 1L)))
    assert(merges.map(_.rank) == (1 to 6))
    Dedup.releaseCaches()
  }

  test("pair counting overlaps; merge application does not") {
    // "aaaa" contributes (a,a) three times per occurrence, but the
    // left-to-right greedy replace yields aa|aa (never aa|a|a… drift).
    val d = corpus("aaaa aaaa")
    val (merges, vocab) = Bpe.learnMerges(d, 2)
    assert(merges.head.left == "a" && merges.head.right == "a"
      && merges.head.count == 6L)
    assert(merges(1).left == "aa" && merges(1).right == "aa"
      && merges(1).count == 2L)
    val ws = vocab.select("ws").as[String].collect().head
    assert(ws == s"${Bpe.Sep}aaaa${Bpe.Sep}")
    Dedup.releaseCaches()
  }

  test("merge selection is partitioning-independent") {
    val d = corpus("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "the five boxing wizards jump quickly")
    val (m1, _) = Bpe.learnMerges(d.repartition(1), 5)
    val (m7, _) = Bpe.learnMerges(d.repartition(7), 5)
    assert(m1 == m7)
    Dedup.releaseCaches()
  }

  test("compressionProfile: occurrence-weighted symbols per word length") {
    val d = corpus("low low low lower lowest")
    val (_, vocab) = Bpe.learnMerges(d, 8)
    val prof = Bpe.compressionProfile(vocab)
      .orderBy("word_len").collect()
    // every word fully merged to one symbol by round 6
    assert(prof.map(r => (r.getAs[Int]("word_len"), r.getAs[Long]("n_words"),
      r.getAs[Long]("occurrences"), r.getAs[Long]("n_syms"),
      r.getAs[Double]("avg_syms"))).toSeq == Seq(
      (3, 1L, 3L, 3L, 1.0), (5, 1L, 1L, 1L, 1.0), (6, 1L, 1L, 1L, 1.0)))
    Dedup.releaseCaches()
  }

  test("apply: merged vocab joins back to per-doc post-BPE token counts") {
    // after learning on "low low low lower lowest", every word is one
    // symbol — a doc "low lowest X9" has 2 gated words, 2 BPE tokens
    val d = corpus("low low low lower lowest")
    val (_, vocab) = Bpe.learnMerges(d, 8)
    val wordSyms = vocab.select(col("word"),
      size(split(expr(s"btrim(ws, '${Bpe.Sep}')"),
        s"${Bpe.Sep}${Bpe.Sep}")).cast("long").as("syms"))
    val target = Seq((99L, "low lowest X9")).toDF("doc_id", "text")
    val r = target
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$") && length(col("word")) <= 20)
      .join(wordSyms, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("syms").as("n_bpe_tokens"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((99L, 2L, 2L)))
    Dedup.releaseCaches()
  }

  test("word table gates the alphabet: case folds, non-a-z words drop") {
    val d = corpus("Hello WORLD x9 a-b keep keep")
    val words = Bpe.wordTable(d).orderBy("word")
      .select("word", "cnt").as[(String, Long)].collect().toSeq
    assert(words == Seq(("hello", 1L), ("keep", 2L), ("world", 1L)))
  }
}
