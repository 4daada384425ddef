package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust distribution statistics (exact interpolated quantiles,
  * median absolute deviation, MAD outlier gating) over DISCRETE value
  * domains, computed from a value histogram instead of per-group value
  * collection.
  *
  * `percentile()`-style aggregates buffer every group value on one
  * reducer — a hot-key scale hazard when one language owns 40% of a
  * 100 TB corpus. Here the corpus is scanned ONCE into
  * (key, value, count); every quantile after that runs on the
  * histogram, whose size is bounded by the value grain (distinct doc
  * lengths ≤ ~10^5), not the corpus. Windows are therefore
  * grain-bounded (the Eval.prCurve rule), and the interpolation
  * arithmetic is plain IEEE on integer counts — deterministic and
  * replayed exactly by the DuckDB oracle.
  *
  * Quantile definition: percentile_cont/`percentile` semantics — 0-based
  * position p = (n-1)·q, linear interpolation between the covering
  * ranks. A histogram row with cumulative count `cum` and count `c`
  * covers ranks [cum-c, cum-1]; rank lookups are conditional aggs, no
  * per-value probing. */
object Robust {

  /** Exact interpolated quantile per key from a value histogram
    * (`key`, `v: double`, `c: long`) → (`key`, `qv: double`). */
  def quantileFromHistogram(hist: DataFrame, q: Double,
      keyCol: String, out: String): DataFrame =
    quantileFromHistogram(hist, q, Seq(keyCol), out)

  def quantileFromHistogram(hist: DataFrame, q: Double,
      keyCol: String): DataFrame =
    quantileFromHistogram(hist, q, Seq(keyCol), "qv")

  /** Composite-key form: (`keyCols…`, `v: double`, `c: long`) →
    * (`keyCols…`, `out: double`). */
  def quantileFromHistogram(hist: DataFrame, q: Double,
      keyCols: Seq[String], out: String): DataFrame = {
    val kcols = keyCols.map(col)
    val wCum = Window.partitionBy(kcols: _*).orderBy("v")
    val wAll = Window.partitionBy(kcols: _*)
    val t = hist
      .withColumn("_cum", sum("c").over(wCum))
      .withColumn("_n", sum("c").over(wAll))
      .withColumn("_pos", (col("_n") - 1) * lit(q))
      .withColumn("_lo", floor(col("_pos")).cast("long"))
      .withColumn("_hi", ceil(col("_pos")).cast("long"))
    def at(rank: Column): Column =
      max(when(col("_cum") - col("c") <= rank && rank <= col("_cum") - 1,
        col("v")))
    t.groupBy(kcols: _*)
      .agg(at(col("_lo")).as("_vlo"), at(col("_hi")).as("_vhi"),
        max(col("_pos") - col("_lo")).as("_frac"))
      .select(kcols :+
        (col("_vlo") + (col("_vhi") - col("_vlo")) * col("_frac")).as(out): _*)
  }

  /** Histogram artifacts — the sketch-artifact lifecycle (Cms / Hll /
    * Bloom) applied to robust stats: a (keys…, v, c) grain histogram
    * persists with its value grain recorded, merges by count SUM
    * (associative and commutative — 1000 shards histogram
    * independently and roll up anywhere), and serves exact-at-grain
    * quantiles / MAD forever without rescanning values. This is the
    * honest mergeable quantile sketch: EXACT at the recorded grain
    * rather than approximate at every value (a KLL/t-digest trades
    * that exactness for unbounded-domain support the discrete grain
    * doesn't need). */
  object Artifact {
    def save(spark: org.apache.spark.sql.SparkSession, hist: DataFrame,
        keyCols: Seq[String], grainDp: Int, path: String): Unit = {
      require(grainDp >= 0, s"grainDp must be >= 0, got $grainDp")
      import spark.implicits._
      hist.coalesce(1).write.mode("overwrite").parquet(s"$path/hist")
      Seq((grainDp, keyCols.mkString(","))).toDF("grain_dp", "key_cols")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }

    /** (hist, keyCols, grainDp); rejects a meta-less artifact loudly. */
    def load(spark: org.apache.spark.sql.SparkSession,
        path: String): (DataFrame, Seq[String], Int) = {
      val meta = spark.read.parquet(s"$path/meta").collect()
      require(meta.nonEmpty, s"empty histogram artifact meta at $path")
      (spark.read.parquet(s"$path/hist"),
        meta.head.getString(1).split(",").toSeq.filter(_.nonEmpty),
        meta.head.getInt(0))
    }

    /** Count-sum merge of two histograms over the same keys + grain
      * (the caller gets both from [[load]]). */
    def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
      a.unionByName(b)
        .groupBy((keyCols.map(col) :+ col("v")): _*)
        .agg(sum(col("c")).as("c"))
  }

  /** Median + MAD + 3-MAD outlier counts per key over an integer-ish
    * value column. One corpus scan (the histogram); the deviation
    * histogram is re-bucketed from the value histogram (|v−med| has
    * the same grain), so MAD costs histogram-sized work only.
    * Returns (key, med, mad, n_docs, n_outliers), med/mad rounded
    * 4 dp at the output boundary; the 3-MAD comparison runs on the
    * unrounded doubles (identical IEEE arithmetic in the oracle). */
  def madOutlierStats(df: DataFrame, keyCol: String, valueCol: Column)
      : DataFrame =
    madStatsFromHistogram(
      df.groupBy(col(keyCol), valueCol.cast("double").as("v"))
        .agg(count(lit(1)).as("c")),
      keyCol)

  /** [[madOutlierStats]] from a prebuilt (`keyCol`, v, c) histogram —
    * the shared core the streaming twin feeds with its carried
    * histogram, so batch and stream semantics cannot fork. */
  def madStatsFromHistogram(histRaw: DataFrame, keyCol: String)
      : DataFrame = {
    val hist = Dedup.checkpointTracked(histRaw)
    val med = quantileFromHistogram(hist, 0.5, keyCol, "med")
    val dev = hist.join(med, keyCol)
      .groupBy(col(keyCol), abs(col("v") - col("med")).as("v"))
      .agg(sum("c").as("c"))
    val mad = quantileFromHistogram(dev, 0.5, keyCol, "mad")
    hist.join(med, keyCol).join(mad, keyCol)
      .groupBy(keyCol)
      .agg(round(max("med"), 4).as("med"), round(max("mad"), 4).as("mad"),
        sum("c").as("n_docs"),
        sum(when(abs(col("v") - col("med")) > lit(3) * col("mad"),
          col("c")).otherwise(lit(0L))).as("n_outliers"))
  }
}
