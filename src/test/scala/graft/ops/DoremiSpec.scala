package graft.ops

import graft.etl.SparkSpec

/** DoReMi linearized-MW contracts: weights normalize per round, excess
  * loss moves mass toward hard domains monotonically over rounds, and
  * a two-domain case matches an independent closed-form replica. */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  private def weightsFor(rows: Seq[(Long, String, String)]) = {
    val df = rows.toDF("doc_id", "text", "source")
    val out = Doremi.domainWeights(spark, df).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    Dedup.releaseCaches()
    out
  }

  test("two domains: normalization, direction, closed-form replica") {
    // dA tokens: a a (low loss); dB: a b (b is rarer -> higher loss)
    val w = weightsFor(Seq((1L, "a a", "dA"), (2L, "a b", "dB")))
    assert(w.size == 10)
    for (t <- 1 to 5) {
      val (_, _, wa) = w(("dA", t))
      val (_, _, wb) = w(("dB", t))
      assert(math.abs(wa + wb - 1.0) < 2e-6, s"round $t: $wa + $wb")
      assert(wb > wa, s"harder domain must out-weigh at round $t")
    }
    // independent replica from the published rule: losses under the
    // unigram LM (a:3/4, b:1/4), 4dp-rounded; token-weighted ref;
    // w_t = (1 + excess/2)^t
    val lossA = BigDecimal(-math.log10(0.75) * 2 / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val lossB = BigDecimal(-(math.log10(0.75) + math.log10(0.25)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val ref = BigDecimal((lossA * 2 + lossB * 2).toDouble / 4)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val bB = BigDecimal(1) + (lossB - ref).max(0) / 2
    for (t <- 1 to 5) {
      val wB = bB.pow(t)
      val expect = BigDecimal(wB.toDouble / (1.0 + wB.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(w(("dB", t))._3 == expect, s"round $t")
    }
    // excess column: dA at the floor, dB strictly positive
    assert(w(("dA", 1))._2 == 0.0)
    assert(w(("dB", 1))._2 > 0.0)
  }

  test("hard domain gains weight monotonically over rounds") {
    val w = weightsFor(Seq(
      (1L, "x x x x x x x x", "easy"), (2L, "x x x x x x x x", "easy"),
      (3L, "x y z q r s t u", "hard")))
    val hard = (1 to 5).map(t => w(("hard", t))._3)
    assert(hard == hard.sorted, s"hard weights not increasing: $hard")
    val easy = (1 to 5).map(t => w(("easy", t))._3)
    assert(easy == easy.sorted.reverse, s"easy weights not decreasing: $easy")
  }

  test("uniform corpus: zero excess everywhere, uniform weights") {
    val w = weightsFor(Seq(
      (1L, "m n", "d1"), (2L, "m n", "d2"), (3L, "m n", "d3")))
    for (t <- 1 to 5; d <- Seq("d1", "d2", "d3")) {
      assert(w((d, t))._2 == 0.0)
      assert(math.abs(w((d, t))._3 - 1.0 / 3) < 1e-5)
    }
  }
}
