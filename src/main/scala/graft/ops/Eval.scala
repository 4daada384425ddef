package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model evaluation over scored corpora — the missing half of training
  * a filter in-engine ([[TextAnalysis.trainLogistic]]): measure how
  * well the score actually ranks the positive class before gating a
  * corpus on it.
  */
object Eval {

  /** Tie-corrected ROC AUC (the Mann-Whitney U statistic with average
    * ranks for tied scores) of `scoreCol` against a boolean label.
    * Emits one row `(n_pos, n_neg, auc)`; `auc` is NULL when either
    * class is empty (undefined, not 0).
    *
    * Scale shape: the corpus reduces MAP-SIDE to one row per DISTINCT
    * score (partial-aggregated groupBy); the rank window runs over
    * that per-score frame, whose size is bounded by the score GRAIN —
    * a 4-decimal score has ≤ 10,001 distinct values — never by the
    * corpus (the bounded-window class of the packing `_pid` offsets
    * frame, not the lineDedup hot-key class). All rank arithmetic
    * stays in integers (2·avgrank = 2·cum − n + 1) until the final
    * division, so the engine and the DuckDB oracle agree exactly —
    * no float-order noise to round away. */
  def aucBinary(scored: DataFrame, labelPred: Column,
      scoreCol: String = "clf_score"): DataFrame = {
    val perScore = scored
      .select(col(scoreCol).as("_s"), labelPred.cast("long").as("_y"))
      .groupBy("_s")
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_np"))
    val ranked = perScore.withColumn("_cum",
      sum(col("_n")).over(Window.orderBy("_s")))
    // the rank-sum accumulator grows as n_pos × 2N — a LongType sum
    // overflows (ANSI: aborts) around 10^9.5 positives, which the
    // 100 TB bar actually reaches; decimal(38,0) keeps it exact to
    // ~10^19 docs and both engines convert the one final value to
    // double identically
    ranked.agg(
        sum(col("_np").cast("decimal(38,0)") *
          (lit(2) * col("_cum") - col("_n") + 1).cast("decimal(38,0)"))
          .as("_s2"),
        sum(col("_np")).as("_n1"),
        sum(col("_n")).as("_nn"))
      .select(col("_n1").as("n_pos"), (col("_nn") - col("_n1")).as("n_neg"),
        round(when(col("_n1") > 0 && col("_nn") > col("_n1"),
          (col("_s2").cast("double") / 2.0 -
            col("_n1").cast("double") * (col("_n1") + 1).cast("double") / 2.0) /
            (col("_n1") * (col("_nn") - col("_n1"))).cast("double")), 6)
          .as("auc"))
  }

  /** Precision/recall/F1 at every distinct-score threshold ("keep
    * score ≥ t") — the threshold-picking table for a trained gate
    * (curation8's floor is one row of this). Same bounded shape as
    * [[aucBinary]]: per-distinct-score partial agg, then descending
    * cumulative sums over the score-grain-bounded frame; counts stay
    * integers until the final divisions, so engine ≡ oracle exactly.
    * F1 is NULL at thresholds keeping no true positive. */
  def prCurve(scored: DataFrame, labelPred: Column,
      scoreCol: String = "clf_score"): DataFrame = {
    val perScore = scored
      .select(col(scoreCol).as("threshold"), labelPred.cast("long").as("_y"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_np"))
    val wDesc = Window.orderBy(col("threshold").desc)
    val wAll = Window.partitionBy()
    perScore
      .withColumn("n_kept", sum(col("_n")).over(wDesc))
      .withColumn("tp", sum(col("_np")).over(wDesc))
      .withColumn("_n1", sum(col("_np")).over(wAll))
      .select(col("threshold"), col("n_kept"), col("tp"),
        // "prec"/"rec": PRECISION is a reserved type keyword in the
        // oracle's SQL dialect
        (col("tp").cast("double") / col("n_kept")).as("prec"),
        when(col("_n1") > 0, col("tp").cast("double") / col("_n1"))
          .as("rec"))
      .withColumn("f1",
        when(col("tp") > 0,
          lit(2.0) * col("prec") * col("rec") /
            (col("prec") + col("rec"))))
  }

  /** Reliability (calibration) bins: does a predicted 0.7 come true
    * ~70% of the time? `bins` equal-width score bins; emits per-bin
    * count, mean predicted score, and observed positive fraction.
    * The mean rides as an integer sum of ten-thousandths (scores are
    * 4-decimal), so no float-summation-order noise can split engine
    * and oracle. One partial-aggregated groupBy on ≤ `bins` keys. */
  def calibrationBins(scored: DataFrame, labelPred: Column,
      scoreCol: String = "clf_score", bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val s = col(scoreCol)
    scored.select(
        least(floor(s * bins), lit(bins - 1)).cast("long").as("bin"),
        round(s * 10000).cast("long").as("_s4"),
        labelPred.cast("long").as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        (sum(col("_s4")).cast("double") / (count(lit(1)) * 10000))
          .as("mean_score"),
        (sum(col("_y")).cast("double") / count(lit(1))).as("frac_pos"))
  }

  /** Isotonic (PAV) calibration of a score against a boolean label —
    * the monotone-nondecreasing mapping score → P(positive) that
    * minimizes squared error, i.e. what sklearn's IsotonicRegression
    * fits over the score bins.
    *
    * Computed WITHOUT the sequential pool-adjacent-violators loop, via
    * the minimax characterization of isotonic regression:
    *   fitted(j) = max_{i ≤ j} min_{k ≥ j} pos[i..k] / n[i..k]
    * over per-distinct-score bins — a closed form, so it distributes
    * as joins + windows AND replays exactly in the DuckDB oracle
    * (a driver-side PAV loop would be neither). Cost is O(S²) rows
    * where S = DISTINCT SCORES (4-dp grain → ≤ 10,001; the corpus
    * reduces map-side to the bins first) — every frame after the scan
    * is bins-sized, never corpus-sized. Range averages come from
    * integer prefix-sum differences, one double division each:
    * engine ≡ oracle bit-for-bit before the 6-dp output rounding.
    *
    * Emits (score, n, n_pos, fitted), monotone in `score` by
    * construction. */
  def isotonicFit(scored: DataFrame, labelPred: Column,
      scoreCol: String = "clf_score"): DataFrame = {
    val bins = Dedup.checkpointTracked(scored
      .select(col(scoreCol).as("_s"), labelPred.cast("long").as("_y"))
      .groupBy("_s")
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_np")))
    val pre = bins
      .withColumn("_cn", sum("_n").over(Window.orderBy("_s")))
      .withColumn("_cp", sum("_np").over(Window.orderBy("_s")))
    val lo = pre.select(col("_s").as("_si"),
      (col("_cn") - col("_n")).as("_pn"), (col("_cp") - col("_np")).as("_pp"))
    val hi = pre.select(col("_s").as("_sk"), col("_cn"), col("_cp"))
    // broadcast the (grain-bounded) hi side: the i<=k range pairing
    // must plan as BroadcastNestedLoopJoin over the bins frame, never
    // a shuffled CartesianProduct
    val ratios = lo.join(broadcast(hi), col("_si") <= col("_sk"))
      .select(col("_si"), col("_sk"),
        ((col("_cp") - col("_pp")).cast("double") /
          (col("_cn") - col("_pn")).cast("double")).as("_r"))
    val m = ratios.withColumn("_m",
      min("_r").over(Window.partitionBy("_si").orderBy(col("_sk").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("_si"), col("_sk").as("_sj"), col("_m"))
    val fitted = m.withColumn("_f",
      max("_m").over(Window.partitionBy("_sj").orderBy(col("_si"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_si") === col("_sj"))
      .select(col("_sj").as("score"), round(col("_f"), 6).as("fitted"))
    bins.select(col("_s").as("score"), col("_n").as("n"),
        col("_np").as("n_pos"))
      .join(fitted, Seq("score"))
  }
}
