package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Saved suffix-array INDEX artifact — the AnnModels pattern applied
  * to ExactSubstr (Lee et al. 2022, arXiv:2107.06499): at 100 TB the
  * expensive step is the O(log maxDocLen) prefix-doubling construction
  * plus the LCP lift, so a pipeline builds the index ONCE per corpus
  * release, persists it next to the corpus, and every downstream query
  * (rank digests, index head, repeated-sequence mining, the LCP
  * duplication-depth histogram) is a leaf scan over the artifact.
  * Parquet round-trips the integer rank/LCP columns exactly, so a
  * loaded index is bit-identical to the built one — queries give
  * byte-equal results before and after persistence.
  *
  * Artifact layout under `spark-warehouse/graft_artifacts/suffix/<key>`
  * (key = md5 of the corpus dir path):
  *   - `rk_0..rk_c`: the executed doubling-round frames (doc_id, widx,
  *     r) — frame k is the dense rank of the first-2^k-token class,
  *     i.e. the LCP lifting tables;
  *   - `pairs`: every rank-adjacent suffix pair with its lifted LCP;
  *   - `meta`: one row carrying a corpus FINGERPRINT (row count + XOR
  *     of per-doc md5s — one cheap scan to recompute) plus the round
  *     count and convergence curve. A consumer re-fingerprints the
  *     corpus on every load and rebuilds on mismatch, so a stale
  *     artifact can never serve a changed corpus.
  */
object SuffixIndex {

  /** Loaded index: round frames, final ranks, the lifted adjacent-pair
    * table (lcp ≥ 0 — consumers filter), and the corpus totals. All
    * frames are parquet leaf scans. */
  case class Handle(frames: Seq[DataFrame], ranks: DataFrame,
      pairs: DataFrame, total: Long, maxLen: Long)

  private def root(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    java.nio.file.Paths.get(sys.props("user.dir"), "spark-warehouse",
      "graft_artifacts", "suffix", md).toString
  }

  private def docsOf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Corpus fingerprint: (row count, order-insensitive XOR of per-doc
    * content hashes). One scan; any added/removed/edited doc flips it. */
  private def fingerprint(docs: DataFrame): (Long, Long) = {
    val r = docs.select(TextAnalysis.md5Low64(concat_ws("|",
        col("doc_id").cast("string"), col("text"))).as("_h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(_h)").as("x"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Load the index for `dir`, building and saving it first if absent
    * or stale (fingerprint mismatch). Thread-safe; the build runs at
    * most once per process per corpus. */
  def loadOrBuild(spark: SparkSession, dir: String): Handle =
    this.synchronized {
      val docs = docsOf(spark, dir)
      val (fpN, fpXor) = fingerprint(docs)
      val p = root(dir)
      val meta = try {
        val m = spark.read.parquet(s"$p/meta").collect()(0)
        if (m.getLong(0) == fpN && m.getLong(1) == fpXor)
          Some((m.getInt(2), m.getLong(3), m.getLong(4)))
        else None
      } catch { case _: Exception => None }
      val (nFrames, total, maxLen) = meta.getOrElse {
        val rr = buildAndSave(spark, docs, p, fpN, fpXor)
        (rr.frames.size, rr.total, rr.maxLen)
      }
      val frames = (0 until nFrames)
        .map(k => spark.read.parquet(s"$p/rk_$k"))
      Handle(frames, frames.last, spark.read.parquet(s"$p/pairs"),
        total, maxLen)
    }

  /** Force a rebuild (ignores any saved artifact — the BUILD is this
    * operator's semantics, so its bench line always measures
    * construction, never an artifact hit) and return the convergence
    * curve: one row per executed doubling round with its distinct
    * prefix-class count — `n_classes` reaches `n_pos` exactly at the
    * convergence round. The curve is the build's progress invariant
    * (monotone non-decreasing, capped by N), which makes it the
    * natural oracle-checkable output for an operator whose real
    * product is a saved artifact. */
  def rebuild(spark: SparkSession, dir: String): DataFrame =
    this.synchronized {
      val docs = docsOf(spark, dir)
      val (fpN, fpXor) = fingerprint(docs)
      val rr = buildAndSave(spark, docs, root(dir), fpN, fpXor)
      import spark.implicits._
      rr.classes.zipWithIndex
        .map { case (c, k) => (k.toLong, c, rr.total) }
        .toDF("round", "n_classes", "n_pos")
    }

  private def buildAndSave(spark: SparkSession, docs: DataFrame,
      p: String, fpN: Long, fpXor: Long): SuffixArray.RankRounds = {
    val rr = SuffixArray.rankRounds(docs)
    // LCP-lift over the in-memory (checkpointed) frames, THEN write:
    // the lift is the second-heaviest stage and must not re-read the
    // frames it just wrote
    val pairs = SuffixArray.lcpPairs(rr.frames, rr.ranks)
    rr.frames.zipWithIndex.foreach { case (f, k) =>
      f.write.mode("overwrite").parquet(s"$p/rk_$k")
    }
    pairs.write.mode("overwrite").parquet(s"$p/pairs")
    import spark.implicits._
    Seq((fpN, fpXor, rr.frames.size, rr.total, rr.maxLen,
        rr.classes.mkString(",")))
      .toDF("fp_n", "fp_xor", "n_frames", "total", "max_len", "classes")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/meta")
    rr
  }
}
