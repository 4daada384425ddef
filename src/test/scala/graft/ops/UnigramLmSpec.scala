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

  /** All segmentations of `w` into vocab pieces (≤ MaxPieceLen). */
  private def allSegs(w: String, v: Map[String, Double]): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(UnigramLm.MaxPieceLen, w.length)).flatMap { l =>
      val q = w.take(l)
      if (v.contains(q)) allSegs(w.drop(l), v).map(q +: _) else Seq.empty
    }

  test("UnigramFBExpected: posteriors match brute-force enumeration; mass identities hold") {
    import org.apache.spark.sql.graft.Bridge
    val v = vocab("ab" -> 0.2, "ba" -> 0.1, "aba" -> 0.05, "b" -> 0.3)
    val word = "ababab"
    val exp = Bridge.column(graft.etl.expressions.UnigramFBExpected(
      Bridge.expression(col("word")),
      v.map(_._1).toArray, v.map(_._2).toArray, UnigramLm.MaxPieceLen))
    val got = Seq(word).toDF("word").select(explode(exp).as("o"))
      .select(col("o.piece"), col("o.e")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    // brute force: P(seg) = Π p; E[count(q)] = Σ_seg P·count(q) / Σ_seg P
    val vm = v.toMap
    val segs = allSegs(word, vm)
    assert(segs.size > 4, "premise: a genuinely ambiguous lattice")
    val z = segs.map(_.map(vm).product).sum
    val want = segs.flatMap(s => s.map(q => q -> s.map(vm).product / z))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).sum }
    val gotByPiece = got.groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).sum }
    assert(gotByPiece.keySet == want.keySet)
    gotByPiece.foreach { case (q, e) =>
      assert(math.abs(e - want(q)) < 1e-12, s"piece $q: $e vs ${want(q)}")
    }
    // mass identity: Σ_occ e·|piece| = word length (every char covered
    // by exactly one piece in every segmentation)
    val mass = got.map { case (q, e) => e * q.length }.sum
    assert(math.abs(mass - word.length) < 1e-12)
  }

  test("learnEm: true E-step + pruning — alphabet survives, prune cuts to PruneKeep multis, counts quantize consistently") {
    val (m, segd) = UnigramLm.learnEm(docs)
    // every seed piece has a round-1 expectation; alphabet all kept
    assert(m.e1.map(_._1) == m.seed.map(_.piece))
    val singles = m.kept.filter(_.length == 1)
    assert(singles.toSet == ('a' to 'z').map(_.toString).toSet)
    assert(m.kept.count(_.length >= 2) ==
      math.min(UnigramLm.PruneKeep, m.seed.count(_.piece.length >= 2)))
    // pruned pieces are exactly the seed multis missing from kept
    val pruned = m.seed.map(_.piece).toSet -- m.kept.toSet
    assert(pruned.forall(_.length >= 2))
    // expected counts are nonnegative and the final probs are a
    // distribution over the kept set
    assert(m.e1.forall(_._2.signum >= 0))
    assert(m.finalProbs.map(_._1) == m.e2.map(_._1))
    assert(math.abs(m.finalProbs.map(_._2).sum - 1.0) < 1e-9)
    // the segmentation table is Viterbi under the final model: pieces
    // reassemble and only kept pieces appear
    val keptSet = m.kept.toSet
    segd.select("word", "uni_pieces").collect().foreach { r =>
      val pieces = r.getString(1).split("\\|")
      assert(pieces.mkString("") == r.getString(0))
      assert(pieces.forall(keptSet), s"non-kept piece in ${r.getString(1)}")
    }
    graft.ops.Dedup.releaseCaches()
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
