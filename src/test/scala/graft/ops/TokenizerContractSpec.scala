package graft.ops

import org.apache.spark.sql.functions._
import graft.etl.SparkSpec

/** Pins the tokenizer contract ([[TextAnalysis.tokens]] scaladoc):
  * Spark `split(text, " ")` must agree with DuckDB
  * `string_split(text, ' ')` on divergence-probing text — punctuation,
  * underscores, multi-space runs, leading/trailing spaces — not just on
  * the whitespace-bland synthetic corpus. The expected counts below are
  * hand-computed under single-space-split semantics (interior AND
  * trailing empties kept), which is what both engines implement; the
  * driver-level `tx_tokenizer_probe` / `tx_pack_shards_probe` oracle
  * rows re-verify the DuckDB side every round. */
class TokenizerContractSpec extends SparkSpec {
  import spark.implicits._

  private def wsCounts(texts: Seq[String]): Seq[Int] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect().map(_.getInt(1)).toSeq

  test("whitespace tokens: single-space split keeps interior and trailing empties") {
    val cases = Seq(
      // text -> expected split(' ') length (count the separators + 1)
      "a b c" -> 3,
      "a  b" -> 3, // interior empty from the double space
      "a b " -> 3, // trailing empty kept
      " a b" -> 3, // leading empty kept
      "a,b c!" -> 2, // punctuation does NOT split
      "under_score x.y.z" -> 2,
      "" -> 1, // empty string is one empty token
      "   " -> 4) // three separators -> four empties
    val got = wsCounts(cases.map(_._1))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((exp, act), i) =>
      assert(act == exp, s"case ${i}: '${cases(i)._1}' expected $exp got $act")
    }
  }

  test("bpeish tokens: letter/digit runs and punctuation clusters split") {
    val d = Seq((1L, "alpha,beta  gamma_delta! mixed123x")).toDF("doc_id", "text")
    val toks = d.select(TextAnalysis.bpeishTokens(col("text")))
      .collect()(0).getSeq[String](0).toList
    assert(toks == List("alpha", ",", "beta", "gamma", "_", "delta", "!",
      "mixed", "123", "x"))
  }

  test("packByTokenBudget agrees with a sequential reference on nasty text") {
    // doc lengths under split(' ') semantics: punctuation/multi-space
    // docs included so the prefix sum is exercised off the bland path
    val texts = Seq(
      "a b c",          // 3
      "x,y z!  w",      // 4 (one interior empty)
      "t " * 10,        // "t t ... t " -> 20 separators? build explicitly below
      "solo")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.Packing
      .packByTokenBudget(d, budget = 5L, bucketWidth = 2L)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("shard")))
    // sequential reference: shard = floor(exclusive-prefix / budget)
    val ns = texts.map(_.split(" ", -1).length.toLong)
    var cum = 0L
    val exp = ns.map { n => val s = cum / 5L; cum += n; (n, s) }
    assert(got.toSeq == exp, s"got=${got.toSeq} exp=$exp")
  }

  test("packWithPositions: within-shard offsets match the sequential reference") {
    val texts = Seq("a b c", "d e", "f g h i", "j", "k l m", "n o")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.Packing
      .packWithPositions(d, budget = 5L, bucketWidth = 2L)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    // sequential reference: pos resets at each shard's first doc
    val ns = texts.map(_.split(" ", -1).length.toLong)
    var cum = 0L
    val gps = ns.map { n => val g = cum; cum += n; g }
    val shards = gps.map(_ / 5L)
    val exp = gps.zip(shards).map { case (g, s) =>
      (s, g - gps.zip(shards).filter(_._2 == s).map(_._1).min)
    }
    assert(got.toSeq == exp, s"got=${got.toSeq} exp=$exp")
    // the first doc of every shard sits at position 0
    got.toSeq.groupBy(_._1).values.foreach(g => assert(g.map(_._2).min == 0L))
    graft.ops.Dedup.releaseCaches()
  }

  test("packWithSplitting: exact shard fill, contiguous doc slices") {
    val texts = Seq("a b c", "d e f g h i j", "k l", "m n o p q")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = graft.ops.Packing
      .packWithSplitting(d, budget = 4L, bucketWidth = 2L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("slice_start"), r.getAs[Long]("slice_len")))
    val ns = texts.map(_.split(" ", -1).length.toLong)
    // every slice positive; per-doc slices contiguous and cover the doc
    rows.foreach { case (_, _, _, len) => assert(len > 0) }
    rows.groupBy(_._1).foreach { case (id, sl) =>
      val sorted = sl.sortBy(_._2)
      assert(sorted.head._3 == 0L, s"doc $id first slice must start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 == a._2 + 1, s"doc $id must cover consecutive shards")
          assert(b._3 == a._3 + a._4, s"doc $id slices must be contiguous")
        case _ =>
      }
      assert(sorted.map(_._4).sum == ns(id.toInt), s"doc $id slices must cover it")
    }
    // every shard except the last holds EXACTLY the budget
    val byShard = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val last = byShard.keys.max
    byShard.foreach { case (s, tot) =>
      if (s != last) assert(tot == 4L, s"shard $s holds $tot != budget")
    }
    assert(byShard(last) == ns.sum - last * 4L)
    graft.ops.Dedup.releaseCaches()
  }

  test("urlGate: empty blocklist is a trivially-true keep, not a crash") {
    val d = Seq((1L, "see https://a.example.com/x")).toDF("doc_id", "text")
    val (nUrls, nBlocked, keep) = TextAnalysis.urlGate(col("text"), Seq.empty)
    val r = d.select(nUrls.as("u"), nBlocked.as("b"), keep.as("k")).collect()(0)
    assert(r.getInt(0) == 1 && r.getInt(1) == 0 && r.getBoolean(2))
  }

  test("urlGate: userinfo URL form cannot evade the host blocklist") {
    val d = Seq(
      (1L, "go http://spam.example.com@evil.com/x now"), // host is evil.com
      (2L, "go http://alice@spam.example.com/x now"), // host is spam.example.com
      (3L, "go http://spam.example.com/x now")).toDF("doc_id", "text")
    val hosts = d.select(col("doc_id"),
        TextAnalysis.urlHosts(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(hosts(1L) == List("evil.com"))
    assert(hosts(2L) == List("spam.example.com"))
    assert(hosts(3L) == List("spam.example.com"))
    val (_, nBlocked, keep) =
      TextAnalysis.urlGate(col("text"), Seq("spam.example.com"))
    val kept = d.select(col("doc_id"), nBlocked.as("b"), keep.as("k"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(kept(2L) == ((1, false)) && kept(3L) == ((1, false)),
      "blocklisted host must be caught with and without userinfo")
    assert(kept(1L) == ((0, true)), "evil.com is not on this blocklist")
  }
}
