package graft.ops

import org.apache.spark.sql.functions._
import graft.etl.SparkSpec

/** Greedy-WordPiece and minimal-piece-DP segmentation contracts:
  * hand-checked segmentations under a fixed vocabulary, the classic
  * greedy-suboptimal case, and the invariants n_opt ≤ n_wp ≤ |word|
  * with pieces reassembling to the word. */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private val az = ('a' to 'z').map(_.toString)

  private def words(ws: String*) = ws.toDF("word")

  private def greedyMap(vocab: Seq[String], ws: String*) =
    Wordpiece.withGreedy(words(ws: _*), vocab)
      .select("word", "n_wp", "wp_pieces").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap

  private def optMap(vocab: Seq[String], ws: String*) =
    Wordpiece.withOptimal(words(ws: _*), vocab)
      .select("word", "n_opt").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

  test("greedy takes the longest prefix at each step") {
    val vocab = az ++ Seq("ab", "abc", "bc")
    val g = greedyMap(vocab, "abcbc", "abcd", "zzz")
    assert(g("abcbc") == ((2, "abc|bc")))
    assert(g("abcd") == ((2, "abc|d")))
    assert(g("zzz") == ((3, "z|z|z")))
  }

  test("classic greedy-suboptimal case: DP beats longest-match") {
    // greedy on "abcd": ab|c|d (3); optimal: a|bcd (2)
    val vocab = az ++ Seq("ab", "bcd")
    val g = greedyMap(vocab, "abcd")
    val o = optMap(vocab, "abcd")
    assert(g("abcd") == ((3, "ab|c|d")))
    assert(o("abcd") == 2)
  }

  test("single-symbol word and max-length word both terminate") {
    val vocab = az ++ Seq("ab")
    val long = "ab" * 10 // exactly MaxWordLen chars
    val g = greedyMap(vocab, "a", long)
    assert(g("a") == ((1, "a")))
    assert(g(long) == ((10, Seq.fill(10)("ab").mkString("|"))))
    val o = optMap(vocab, "a", long)
    assert(o("a") == 1 && o(long) == 10)
  }

  test("invariants on a learned vocabulary over a real corpus") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the lazy dog sleeps while the quick fox runs"),
      (3L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val (merges, vocabDf) = Bpe.learnMerges(d, 8)
    val vocab = Wordpiece.vocabSymbols(merges)
    val out = Wordpiece.withOptimal(
      Wordpiece.withGreedy(vocabDf.select("word"), vocab), vocab)
      .select("word", "n_wp", "n_opt", "wp_pieces").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, nwp, nopt, ps) =
        (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))
      assert(nopt >= 1 && nopt <= nwp && nwp <= w.length,
        s"$w: n_opt=$nopt n_wp=$nwp")
      // pieces reassemble to the word, and every piece is in the vocab
      val pieces = ps.split('|').toSeq
      assert(pieces.mkString == w, s"$w reassembled as ${pieces.mkString}")
      assert(pieces.forall(vocab.contains), s"$w pieces $pieces")
    }
    Dedup.releaseCaches()
  }

  test("segmentation is partitioning-independent") {
    val vocab = az ++ Seq("ab", "bcd", "abc")
    val ws = Seq("abcd", "abcbc", "dcba", "aabbcc")
    val one = Wordpiece.withGreedy(ws.toDF("word").repartition(1), vocab)
      .select("word", "wp_pieces").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val many = Wordpiece.withGreedy(ws.toDF("word").repartition(5), vocab)
      .select("word", "wp_pieces").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(one == many)
  }
}
