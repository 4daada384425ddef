package graft.ops

import java.math.{BigDecimal => JBig, MathContext, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
  * arXiv:2305.10429), reduced to its deterministic core: per-domain
  * EXCESS LOSS under a proxy model drives multiplicative-weights
  * updates, and the resulting weights are the sampling mixture for the
  * next training run.
  *
  * Simplifications (disclosed, so engine and oracle agree exactly):
  *   - The proxy/reference losses come from the in-engine capped-vocab
  *     unigram LM ([[TextAnalysis.unigramLogProb]]'s model — top-V
  *     tokens, 1/T OOV floor), not from trained transformer proxies:
  *     loss_d = −mean log10 p over the domain's tokens, and the
  *     reference loss is the token-weighted mean of the (rounded)
  *     domain losses — the corpus loss, made DECIMAL-derivable.
  *   - The update is the LINEARIZED multiplicative-weights rule
  *     w ← w·(1 + η·excess) (the Hedge linear variant) instead of
  *     exp(η·excess): with static losses the T-round trajectory is the
  *     closed form w_t = (1+η·excess)^t, exact in decimal arithmetic —
  *     no transcendental whose last-ulp could differ across engines.
  *
  * Numeric contract: the ONLY floating-point steps are (a) the
  * per-domain mean log-prob, rounded to 4 dp on both sides (the
  * tx_unigram_logprob precedent), and (b) the final normalization
  * round(w/Σw, 6) — computed from identical exact decimals via
  * correctly-rounded decimal→double casts, so both engines divide
  * identical doubles. Everything between — excess, 1+η·excess, its
  * powers, their sums — is exact BigDecimal / DuckDB DECIMAL.
  *
  * Scale shape: one model pass over the corpus (vocab-sized counts,
  * persisted), one scoring pass (capped LM + total broadcast, map-side
  * join, per-domain partial agg), then a DOMAIN-sized collect (the
  * model-parameter collect pattern) for the closed-form update. At
  * 100 TB both passes are embarrassingly parallel; nothing
  * domain-count-proportional ever shuffles the corpus.
  */
object Doremi {

  /** η = 1/2 — exact in decimal, so 1 + η·excess has scale
    * excess.scale + 1. */
  private val Eta = new JBig("0.5")

  final case class DomainWeight(source: String, round: Int, nDocs: Long,
      nTokens: Long, loss: Double, excess: Double, weight: Double)

  /** Per-domain mixture weights after each of `rounds` linearized-MW
    * updates: (source, round, n_docs, n_tokens, loss, excess, weight),
    * one row per domain per round, weight summing to 1 (± rounding)
    * within a round. */
  def domainWeights(spark: SparkSession, docs: DataFrame, rounds: Int = 5,
      vocab: Int = 1000, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(groupCol).as("_g"),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))
    val counts = Dedup.persistTracked(
      tok.groupBy("t").agg(count(lit(1)).cast("double").as("c")))
    val total = counts.agg(sum(col("c")).as("_tot"))
    val lm = counts.orderBy(col("c").desc, col("t")).limit(vocab)
    // domain-sized collect: (source, n_tokens, 4dp-rounded loss)
    val lossRows = tok.join(broadcast(lm), Seq("t"), "left")
      .crossJoin(broadcast(total))
      .select(col("_g"),
        log10(coalesce(col("c"), lit(1.0)) / col("_tot")).as("lp"))
      .groupBy("_g")
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(col("lp")), 4).as("loss"))
      .collect()
    val nDocs = docs.groupBy(col(groupCol).as("_g"))
      .agg(count(lit(1)).as("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val doms = lossRows.map { r =>
      (r.getString(0), r.getLong(1),
        JBig.valueOf(r.getDouble(2)).setScale(4, RoundingMode.HALF_UP))
    }.sortBy(_._1)
    // reference loss: token-weighted mean of the rounded domain losses
    // (exact decimal numerator / BIGINT denominator, then one
    // correctly-rounded double division — mirrored in the oracle)
    val num = doms.map { case (_, n, l) => l.multiply(JBig.valueOf(n)) }
      .foldLeft(JBig.ZERO)(_.add(_))
    val den = doms.map(_._2).sum
    val ref = JBig.valueOf(
      BigDecimal(num.doubleValue / den.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(4, RoundingMode.HALF_UP)

    // closed-form linearized MW: w_t(d) = (1 + η·excess_d)^t, exact
    val based = doms.map { case (g, n, l) =>
      val excess = l.subtract(ref).max(JBig.ZERO) // scale 4
      val b = JBig.ONE.add(Eta.multiply(excess)) // scale 5
      (g, n, l, excess, b)
    }
    val rows = (1 to rounds).flatMap { t =>
      val ws = based.map { case (g, n, l, e, b) =>
        (g, n, l, e, b.pow(t, MathContext.UNLIMITED))
      }
      val s = ws.map(_._5).foldLeft(JBig.ZERO)(_.add(_))
      ws.map { case (g, n, l, e, w) =>
        Row(g, t, nDocs(g), n, l.doubleValue, e.doubleValue,
          BigDecimal(w.doubleValue / s.doubleValue)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("round", IntegerType),
      StructField("n_docs", LongType), StructField("n_tokens", LongType),
      StructField("loss", DoubleType), StructField("excess", DoubleType),
      StructField("weight", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
