package graft.ops

import org.apache.spark.sql.functions._
import graft.etl.SparkSpec

/** Unigram-LM contracts: Viterbi maximizes segmentation probability
  * (not piece count), exact ties break toward the longest piece, EM
  * counts satisfy the mass identity, and frozen-model corpus scoring
  * matches a hand join. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Base alphabet at a low floor prob + overrides (dedup'd — the
    * literal prob map rejects duplicate keys). */
  private def vocab(pairs: (String, Double)*): Seq[(String, Double)] =
    (('a' to 'z').map(_.toString -> 0.01).toMap ++ pairs.toMap)
      .toSeq.sortBy(_._1)

  private def seg(v: Seq[(String, Double)], ws: String*) =
    UnigramLm.withViterbi(ws.toDF("word"), v)
      .select("word", "n_uni", "uni_pieces").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap

  test("Viterbi maximizes probability, not piece count") {
    // p(ab)·p(c) = 0.04 beats both p(abc) = 0.01 and a·b·c = 2e-5
    val v = vocab("ab" -> 0.2, "c" -> 0.2, "abc" -> 0.01)
    assert(seg(v, "abc")("abc") == ((2, "ab|c")))
  }

  test("a dominant long piece wins over any split") {
    val v = vocab("abc" -> 0.5)
    assert(seg(v, "abc")("abc") == ((1, "abc")))
  }

  test("exact probability tie breaks toward the longest piece") {
    // powers of two make the tie exact in binary64: 0.5·0.5 == 0.25
    val v = vocab("a" -> 0.5, "b" -> 0.5, "ab" -> 0.25)
    assert(seg(v, "ab")("ab") == ((1, "ab")))
  }

  test("pieces reassemble to the word; n_uni counts pieces") {
    val v = vocab("he" -> 0.1, "llo" -> 0.1, "wor" -> 0.1, "ld" -> 0.1)
    seg(v, "hello", "world", "a", "zzzz").foreach { case (w, (n, ps)) =>
      val pieces = ps.split("\\|")
      assert(pieces.mkString("") == w, s"$w reassembles")
      assert(pieces.length == n, s"$w piece count")
    }
  }

  private val docs = Seq(
    (1L, "hello world hello"),
    (2L, "world wide world"),
    (3L, "hello wide")).toDF("doc_id", "text")

  test("learn: vocab carries the full base alphabet; EM mass identity") {
    val (seed, fin, segd) = UnigramLm.learn(docs)
    assert(seed.map(_.piece).toSet.intersect(
      ('a' to 'z').map(_.toString).toSet).size == 26)
    assert(seed.map(_.piece) == fin.map(_.piece), "fixed piece set")
    // Σ_piece em_cnt == Σ_word cnt · n_uni (every Viterbi piece counted)
    val totalPieces = segd.select(
      sum(col("cnt") * col("n_uni"))).collect()(0).getLong(0)
    assert(fin.map(_.cnt).sum == totalPieces)
    // EM counts Viterbi usage, seed counts overlapping substrings —
    // they must differ somewhere on this corpus
    assert(seed != fin)
  }

  test("scoreDocs matches a hand join of per-word Viterbi counts") {
    val (_, _, segd) = UnigramLm.learn(docs)
    val perWord = segd.select("word", "n_uni").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val got = UnigramLm.scoreDocs(docs, segd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Seq(
      (1L, Seq("hello", "world", "hello")),
      (2L, Seq("world", "wide", "world")),
      (3L, Seq("hello", "wide"))).map { case (id, ws) =>
      (id, ws.size.toLong, ws.map(perWord(_).toLong).sum)
    }.toSet
    assert(got == want)
  }
}
