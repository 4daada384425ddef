package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, as deployed
  * in Heule et al.'s HLL++ without the bias tables) — the corpus-scale
  * answer to "how many distinct tokens / URLs / fingerprints per
  * group": exact `countDistinct` shuffles every (group, value) pair —
  * the whole vocabulary through the wire — while the sketch
  * partial-aggregates to ≤ m rows per group per map task (bucket,
  * max-rho), so 100 TB of text reduces map-side to a few thousand
  * integers per group. The trade is a ~1.04/√m relative error, which
  * is the published, calibrated price (≈1.6% at m = 4096).
  *
  * Everything is md5-derived integer arithmetic, so a SQL oracle
  * replays the sketch EXACTLY — bucket ids, rho values, and the
  * indicator sum (kept in DECIMAL(38,0) via 2^(K−M) terms, so
  * summation order cannot matter cross-engine; every term is a power
  * of two ≤ 2^53, exact in the double that produces it). The only
  * floats are the one final division and (in the sparse regime) one
  * `ln` — single operations on identical inputs, not accumulations.
  *
  * Hash layout per value, from the repo-wide signed low-64 md5
  * ([[TextAnalysis.md5Low64]]): bucket = low p bits; w = the remaining
  * 64−p bits via unsigned shift; rho(w) = leading zeros of w in its
  * (64−p)-bit field + 1 = (65−p) − bitlength(w), with bitlength via
  * `bin()` string length (minimal-length in both engines, verified)
  * and rho(0) = 65−p.
  */
object Sketch {

  /** alpha_m for m ≥ 128 (the standard large-m constant). */
  def hllAlpha(m: Int): Double = 0.7213 / (1 + 1.079 / m)

  /** Per-row (bucket, rho) columns for a value column under 2^p
    * buckets. */
  private[ops] def bucketAndRho(value: Column, p: Int): (Column, Column) = {
    val h = TextAnalysis.md5Low64(value)
    val bucket = h.bitwiseAND(lit((1L << p) - 1))
    val w = shiftrightunsigned(h, p)
    val k = 65 - p
    val rho = when(w === 0L, lit(k))
      .otherwise(lit(k).cast("int") - length(bin(w)))
    (bucket, rho)
  }

  private def validP(p: Int): Unit =
    require(p >= 7 && p <= 16, s"p must be in [7,16] (m=128..65536), got $p")

  /** The sketch itself: one (group, `_b`, `_m` = max rho) row per hit
    * bucket — ≤ m rows per group after a map-side-combined max
    * aggregation; values never shuffle. Mergeable: sketches over
    * disjoint (or overlapping!) inputs merge by per-bucket max, the
    * property the streaming twin carries across batches. */
  def perBucketMax(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int): DataFrame = {
    validP(p)
    val gcols = groupCols.map(col)
    val (bucket, rho) = bucketAndRho(col(valueCol), p)
    df.select(gcols :+ bucket.as("_b") :+ rho.as("_r"): _*)
      .groupBy(gcols :+ col("_b"): _*)
      .agg(max(col("_r")).as("_m"))
  }

  /** Estimator fold over a [[perBucketMax]]-shaped frame (group cols +
    * `_b` + `_m`): group columns + `n_buckets` (buckets hit, exact) +
    * `est_distinct` (rounded to 2 dp), with the standard
    * linear-counting fallback for the sparse regime (E_raw ≤ 2.5m and
    * empty buckets remain). Shared by batch and streaming so the
    * estimate semantics cannot fork. */
  def estimateFromBuckets(perBucket: DataFrame, groupCols: Seq[String],
      p: Int): DataFrame = {
    validP(p)
    val m = 1 << p
    val kMax = 65 - p
    val gcols = groupCols.map(col)
    // indicator sum in DECIMAL(38,0): term = 2^(K−M) (integer powers of
    // two ≤ 2^(K−1), exact in double before the cast); empty buckets
    // contribute 2^K each, added as (m − present)·2^K
    val termExpr = pow(lit(2.0), lit(kMax) - col("_m"))
      .cast("decimal(38,0)")
    val twoK = math.pow(2.0, kMax)
    val agg = perBucket.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(termExpr).as("_sp"))
      .withColumn("_s", col("_sp") +
        (lit(m.toLong) - col("n_buckets")) * lit(twoK).cast("decimal(38,0)"))
    val eRawConst = hllAlpha(m) * m.toDouble * m.toDouble * twoK
    val eRaw = lit(eRawConst) / col("_s").cast("double")
    val vEmpty = lit(m.toLong) - col("n_buckets")
    val est = when(eRaw <= lit(2.5 * m) && vEmpty > 0L,
        lit(m.toDouble) * log(lit(m.toDouble) / vEmpty.cast("double")))
      .otherwise(eRaw)
    agg.select(gcols :+ col("n_buckets") :+
      round(est, 2).as("est_distinct"): _*)
  }

  /** Distinct-count estimate of `valueCol` per `groupCols`:
    * [[perBucketMax]] → [[estimateFromBuckets]]. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 12): DataFrame =
    estimateFromBuckets(perBucketMax(df, groupCols, valueCol, p),
      groupCols, p)

  /** HLL sketch artifacts — build per-shard register frames once,
    * persist, merge and probe forever without rescanning values (the
    * Cms artifact lifecycle applied to the distinct sketch; precision
    * rides IN the artifact so probing under a different p cannot
    * happen silently — the classifier hash-width lesson). Merge is the
    * register algebra itself (per-bucket max: associative, commutative,
    * idempotent), so sketch(A ∪ B) ≡ merge(sketch(A), sketch(B))
    * EXACTLY — the property that lets 1000 shards sketch independently
    * and roll up driver-free. */
  object Hll {
    def save(spark: org.apache.spark.sql.SparkSession, buckets: DataFrame,
        groupCols: Seq[String], p: Int, path: String): Unit = {
      validP(p)
      import spark.implicits._
      buckets.coalesce(1).write.mode("overwrite").parquet(s"$path/buckets")
      Seq((p, groupCols.mkString(","))).toDF("p", "group_cols").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/meta")
    }

    /** (buckets, groupCols, p) from [[save]]'s layout; rejects an
      * artifact with no meta row loudly. */
    def load(spark: org.apache.spark.sql.SparkSession,
        path: String): (DataFrame, Seq[String], Int) = {
      val meta = spark.read.parquet(s"$path/meta").collect()
      require(meta.nonEmpty, s"empty HLL artifact meta at $path")
      (spark.read.parquet(s"$path/buckets"),
        meta.head.getString(1).split(",").toSeq.filter(_.nonEmpty),
        meta.head.getInt(0))
    }

    /** Per-bucket max merge of two register frames (same groupCols and
      * p — the caller gets them from [[load]]). */
    def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
      a.unionByName(b)
        .groupBy((groupCols.map(col) :+ col("_b")): _*)
        .agg(max(col("_m")).as("_m"))

    /** Estimate from a persisted sketch under its OWN recorded
      * precision. */
    def estimateFromArtifact(spark: org.apache.spark.sql.SparkSession,
        path: String): DataFrame = {
      val (buckets, groupCols, p) = load(spark, path)
      estimateFromBuckets(buckets, groupCols, p)
    }
  }

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — point
    * frequency estimates over a domain too large to count exactly
    * ("how often does THIS shingle occur corpus-wide"): d rows × w
    * counters, each occurrence increments one counter per row at
    * position_i = (h1 + i·h2) mod w (the same Kirsch–Mitzenmacher
    * md5 double hashing as [[Bloom]] — one hash family across the
    * sketch ops), estimate = min over rows. Guarantees: est ≥ true
    * always; est ≤ true + (e/w)·N with probability 1 − e^−d.
    *
    * Scale shape: the counter build is ONE map-side-combined
    * aggregation whose distinct-key space is ≤ d·w regardless of
    * corpus size — each map task ships at most d·w (row, bucket,
    * partial-count) integers, never a value. Counts are integers, so
    * the oracle replays estimates EXACTLY — no float anywhere. */
  object Cms {

    /** The counter table: one (`_i`, `_p`, `cnt`) row per non-zero
      * counter (≤ d·w rows). */
    def counters(df: DataFrame, valueCol: String, w: Int, d: Int): DataFrame = {
      require(w > 0 && d > 0, s"w and d must be positive, got w=$w d=$d")
      df.select(TextAnalysis.md5Low64(col(valueCol)).as("_h"))
        .select(posexplode(array(
          Bloom.positionsFromHash(col("_h"), w, d): _*)).as(Seq("_i", "_p")))
        .groupBy("_i", "_p").agg(count(lit(1)).as("cnt"))
    }

    /** Point estimates for `probes(probeCol)`: min over the d probed
      * counters (absent counter = 0). The probe frame is small by
      * contract (a document's shingles, a watchlist) and broadcasts to
      * the ≤ d·w counter frame. */
    def estimate(counters: DataFrame, probes: DataFrame,
        probeCol: String, w: Int, d: Int): DataFrame = {
      require(w > 0 && d > 0, s"w and d must be positive, got w=$w d=$d")
      val pr = probes.select(col(probeCol)).distinct()
        .select(col(probeCol), posexplode(array(
          Bloom.positions(col(probeCol), w, d): _*)).as(Seq("_i", "_p")))
      broadcast(pr).join(counters, Seq("_i", "_p"), "left")
        .groupBy(probeCol)
        .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    }

    /** Artifact persistence: build the counters once over the corpus,
      * probe forever without rescanning ([[AnnModels]]' train-once
      * contract for the sketch family). The hash parameters ride IN
      * the artifact as a one-row `meta` sidecar — probing a loaded
      * sketch under a different (w, d) is impossible to do silently
      * (the classifier hash-width lesson): [[estimateFromArtifact]]
      * reads them back and nothing else accepts a path. Counts are
      * integers, so the round-trip is exact by construction. */
    def save(spark: org.apache.spark.sql.SparkSession, counters: DataFrame,
        w: Int, d: Int, path: String): Unit = {
      require(w > 0 && d > 0, s"w and d must be positive, got w=$w d=$d")
      import spark.implicits._
      counters.coalesce(1).write.mode("overwrite").parquet(s"$path/counters")
      Seq((w, d)).toDF("w", "d").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/meta")
    }

    /** (counters, w, d) from [[save]]'s layout; rejects an artifact
      * with no meta row loudly. */
    def load(spark: org.apache.spark.sql.SparkSession,
        path: String): (DataFrame, Int, Int) = {
      val meta = spark.read.parquet(s"$path/meta").collect()
      require(meta.nonEmpty, s"empty CMS artifact meta at $path")
      (spark.read.parquet(s"$path/counters"),
        meta.head.getInt(0), meta.head.getInt(1))
    }

    /** Probe a persisted sketch under its OWN recorded parameters. */
    def estimateFromArtifact(spark: org.apache.spark.sql.SparkSession,
        path: String, probes: DataFrame, probeCol: String): DataFrame = {
      val (counters, w, d) = load(spark, path)
      estimate(counters, probes, probeCol, w, d)
    }
  }

  /** The oracle-side replay of [[hllDistinct]] as a SQL fragment
    * generator: given a source CTE exposing the group columns and a
    * `v` value column, returns SQL computing the identical result —
    * constants (alpha·m²·2^K) interpolated from the SAME Scala
    * doubles, so the two engines cannot fork. */
  def hllOracleSql(sourceCte: String, groupCol: String, p: Int = 12): String = {
    val m = 1 << p
    val kMax = 65 - p
    val mask = (1L << p) - 1
    val eRawConst = hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, kMax)
    s"""h AS (SELECT $groupCol, ('0x' || substr(md5(v), 1, 16))::UBIGINT AS u
      |       FROM $sourceCte),
      |br AS (SELECT $groupCol, CAST(u & $mask AS BIGINT) AS b,
      |         CAST(u >> $p AS BIGINT) AS w FROM h),
      |r AS (SELECT $groupCol, b,
      |        CASE WHEN w = 0 THEN $kMax
      |             ELSE $kMax - length(bin(w)) END AS rho FROM br),
      |mx AS (SELECT $groupCol, b, max(rho) AS mr FROM r GROUP BY 1, 2),
      |g AS (SELECT $groupCol, count(*) AS present,
      |        sum(CAST(power(2, $kMax - mr) AS DECIMAL(38,0))) AS sp
      |      FROM mx GROUP BY 1),
      |f AS (SELECT $groupCol, present,
      |        CAST(sp + ($m - present)
      |          * CAST(power(2, $kMax) AS DECIMAL(38,0)) AS DOUBLE) AS s
      |      FROM g)
      |SELECT $groupCol, CAST(present AS BIGINT) AS n_buckets,
      |  round(CASE WHEN $eRawConst / s <= ${2.5 * m}
      |              AND present < $m
      |             THEN $m.0 * ln($m.0 / ($m - present))
      |             ELSE $eRawConst / s END, 2) AS est_distinct
      |FROM f""".stripMargin
  }
}
