package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset versioning: diff two corpus versions — the "what changed
  * between crawl v1 and v2" audit every dataset release needs (and the
  * input to incremental re-processing: re-run the pipeline on `added ∪
  * changed` only, instead of the full corpus).
  *
  * Scale shape: each side reduces to a narrow `(id, fingerprint)`
  * projection BEFORE the join — 16 bytes a row, not the payload — so
  * the full-outer equi-join on the unique id shuffles fingerprints
  * only (AQE-balanced; no hot keys on a unique id). Text never moves.
  */
object Versioning {

  /** One row per difference: `(idCol, status)` with status ∈
    * `removed` (in v1 only), `added` (in v2 only), `changed` (both,
    * different `textCol` fingerprint). Unchanged docs emit nothing.
    * NULL text fingerprints as the empty string on both sides (a doc
    * flipping null ↔ "" counts as unchanged — disclosed). Collisions:
    * xxhash64 pairs at ~2⁻⁶⁴ — a changed doc misread as unchanged at
    * odds no release audit resolves anyway. */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val a = v1.select(col(idCol).as("_id1"),
      xxhash64(coalesce(col(textCol), lit(""))).as("_fp1"))
    val b = v2.select(col(idCol).as("_id2"),
      xxhash64(coalesce(col(textCol), lit(""))).as("_fp2"))
    a.join(b, col("_id1") === col("_id2"), "full_outer")
      .filter(col("_id1").isNull || col("_id2").isNull ||
        col("_fp1") =!= col("_fp2"))
      .select(coalesce(col("_id1"), col("_id2")).as(idCol),
        when(col("_id2").isNull, "removed")
          .when(col("_id1").isNull, "added")
          .otherwise("changed").as("status"))
  }

  /** Incremental re-processing in [[corpusDiff]]'s mold: apply a
    * PER-DOCUMENT `transform` (gates, scores, projections — anything
    * whose output for a doc depends only on that doc's row) to corpus
    * version v2, given v1 and the already-materialized
    * `transform(v1)` outputs. Unchanged docs reuse their v1 output
    * row; `added ∪ changed` docs — and ONLY those — flow through
    * `transform`; `removed` docs drop out. The result equals
    * `transform(v2)` exactly, row for row.
    *
    * Unlike [[corpusDiff]] (a TEXT-content audit), change detection
    * here fingerprints EVERY non-id column: the transform may read
    * any of them (the quality gates read `lang`), so a doc whose text
    * is identical but whose metadata moved must recompute — a
    * text-only hash would silently reuse a stale output row.
    *
    * This is the 100 TB release cadence: a daily crawl delta of 1%
    * costs 1% of the gate compute instead of a full recompute. The
    * diff itself shuffles 16-byte fingerprint rows only; the reuse
    * path is one AQE-splittable anti join against the dirty-id frame
    * and the recompute path a semi join against the delta-id frame —
    * v1's payload text is never read, v2's only for the delta.
    *
    * The per-document contract is the caller's to honor (a corpus-wide
    * stage — dedup, a trained model, a global rank — must recompute or
    * carry state like the streaming twins do); OpsSpec enforces it
    * mechanically with a transform that throws on any clean doc. */
  def incrementalApply(v1: DataFrame, v1Out: DataFrame, v2: DataFrame,
      transform: DataFrame => DataFrame, idCol: String = "doc_id")
      : DataFrame = {
    // whole-row fingerprint (canonical column order, which v1 must
    // share): each column contributes TWO hash children in fixed
    // order — a never-null null-flag and the coalesced value. Children
    // fold into the xxhash64 accumulator as separate steps (no string
    // concatenation), so a value cannot slide across a column
    // boundary, and NULL differs from any literal value in the flag.
    // A separator-joined concat was injectable (a U+0001 inside a
    // value shifted content between columns) and a bare multi-arg
    // hash SKIPS null children, aliasing ("a", NULL) with (NULL, "a").
    require(v1.columns.sorted.sameElements(v2.columns.sorted),
      s"v1/v2 schemas differ: ${v1.columns.toSeq} vs ${v2.columns.toSeq}")
    val payload = v2.columns.filter(_ != idCol).sorted.toSeq
    def fp(d: DataFrame, id: String, h: String): DataFrame =
      d.select(col(idCol).as(id),
        xxhash64(payload.flatMap(c => Seq(
          col(c).isNull.cast("int"),
          coalesce(col(c).cast("string"), lit("")))): _*).as(h))
    val diff = Dedup.persistTracked(
      fp(v1, "_id1", "_fp1").join(fp(v2, "_id2", "_fp2"),
          col("_id1") === col("_id2"), "full_outer")
        .filter(col("_id1").isNull || col("_id2").isNull ||
          col("_fp1") =!= col("_fp2"))
        .select(coalesce(col("_id1"), col("_id2")).as(idCol),
          when(col("_id2").isNull, "removed")
            .when(col("_id1").isNull, "added")
            .otherwise("changed").as("status")))
    val dirty = diff.filter(col("status").isin("removed", "changed"))
      .select(col(idCol))
    val delta = diff.filter(col("status").isin("added", "changed"))
      .select(col(idCol))
    val reused = v1Out.join(dirty, Seq(idCol), "left_anti")
    val recomputed = transform(v2.join(delta, Seq(idCol), "left_semi"))
    reused.unionByName(recomputed)
  }

  /** Release-to-release distribution drift: Population Stability Index
    * and KL divergence per fixed-width score bin — the standard
    * ML-monitoring check for "did this release shift the quality/score
    * distribution" (PSI is the banking/ML-ops staple; KL its
    * information-theoretic sibling). Inputs are one `score` DOUBLE
    * column per side (scores in [0,1]); plus-one smoothing over the
    * `bins` fixed bins keeps every log finite (and the replay exact:
    * shares are integer-count ratios).
    *
    * Scale shape: each corpus reduces through a map-side partial
    * count to a BINS-sized histogram; the full-outer alignment, the
    * totals window and the PSI/KL arithmetic all run on that bounded
    * frame — the corpus is never windowed or joined wide. Outputs
    * per-bin rows (n1, n2, shares, psi/kl terms, 6dp — the tx_pmi
    * rounding precedent for ln); totals are the column sums. */
  def distributionDrift(s1: DataFrame, s2: DataFrame,
      bins: Int = 10): DataFrame =
    distributionDriftFromHists(
      scoreHistogram(s1, bins), scoreHistogram(s2, bins), bins)

  /** Fixed-width bin histogram of a `score` DOUBLE column in [0,1]:
    * `(bin, n)`, absent bins omitted (the drift core re-aligns). This
    * is also the streaming twin's carried state — BOUNDED at `bins`
    * rows per contribution, summable across batches. */
  def scoreHistogram(s: DataFrame, bins: Int): DataFrame = s
    // clamp BOTH ends: the documented input contract is [0,1], but a
    // score just below 0 (a caller's float error) must land in bin 0,
    // not produce a negative bin that silently vanishes through the
    // range(0, bins) alignment join and deflates the PSI/KL totals
    .select(greatest(least(floor(col("score") * bins), lit(bins - 1)),
      lit(0)).cast("long").as("bin"))
    .groupBy("bin").agg(count(lit(1)).as("n"))

  /** [[distributionDrift]]'s core over precomputed `(bin, n)`
    * histograms (the streaming path sums carried per-batch histograms
    * into `h2` and freezes `h1` as the release artifact). */
  def distributionDriftFromHists(h1: DataFrame, h2: DataFrame,
      bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = h1.sparkSession.range(0, bins).toDF("bin")
    val j = all
      .join(h1.withColumnRenamed("n", "n1"), Seq("bin"), "left")
      .join(h2.withColumnRenamed("n", "n2"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
    // single-partition window over the BINS-sized frame only (the
    // key is constant-VALUED but not foldable — a lit() would be
    // constant-folded away and logged as a global window)
    val w = Window.partitionBy(col("bin") * 0)
    j.withColumn("_t1", sum("n1").over(w))
      .withColumn("_t2", sum("n2").over(w))
      .withColumn("_p",
        (col("n1") + 1L).cast("double") / (col("_t1") + bins).cast("double"))
      .withColumn("_q",
        (col("n2") + 1L).cast("double") / (col("_t2") + bins).cast("double"))
      .select(col("bin"), col("n1"), col("n2"),
        round(col("_p"), 6).as("p1"),
        round(col("_q"), 6).as("p2"),
        round((col("_q") - col("_p")) * log(col("_q") / col("_p")), 6)
          .as("psi_term"),
        round(col("_q") * log(col("_q") / col("_p")), 6).as("kl_term"))
  }
}
