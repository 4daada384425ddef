package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset release packaging: turn a curated corpus into
  * token-budgeted shards plus a verifiable manifest — the artifact a
  * training job consumes and the audit trail a release needs
  * ([[Versioning.corpusDiff]] answers "what changed"; the manifest
  * answers "what exactly shipped, and did it arrive intact").
  *
  * The per-shard content checksum is a bit-XOR of per-document 64-bit
  * fingerprints: order-independent (parquet readers return rows in
  * any order), overflow-free (no ANSI sum-overflow at corpus scale),
  * and cross-engine recomputable (md5-low64, the repo's pinned
  * portable hash). Two shards with the same docs in any order match;
  * one flipped byte in one doc does not.
  */
object Release {

  private[graft] def fingerprinted(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
      TextAnalysis.md5Low64(concat(col(idCol).cast("string"), lit("|"),
        coalesce(col(textCol), lit("")))).as("_fp"))

  private[graft] def manifestFromAssigned(docs: DataFrame, assigned: DataFrame,
      idCol: String, textCol: String): DataFrame =
    fingerprinted(docs, idCol, textCol)
      .join(assigned, Seq(idCol))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(_fp)").as("content_hash"))

  /** Per-shard manifest `(shard, n_docs, n_tokens, content_hash)`
    * under [[Packing.packByTokenBudget]] assignment. One equi-join of
    * the 16-byte fingerprint frame against the narrow assignment
    * frame, then a partial-aggregated rollup — text crosses no
    * shuffle. */
  def manifest(docs: DataFrame, budget: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    manifestFromAssigned(docs,
      Packing.packByTokenBudget(docs, budget, idCol, textCol),
      idCol, textCol)

  /** Per-doc release stats `(idCol, n_tokens, _fp)` — ONE text scan
    * producing everything [[manifest]] needs from a document: its
    * token count (assignment math) and its content fingerprint
    * (checksum). Materialize this at release time and the NEXT
    * release's manifest costs text reads over the corpus DELTA only
    * ([[incrementalManifest]]). */
  def docStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      TextAnalysis.md5Low64(concat(col(idCol).cast("string"), lit("|"),
        coalesce(col(textCol), lit("")))).as("_fp"))

  /** [[manifest]] from a precomputed stats frame: the prefix-sum
    * assignment reruns over `(id, n_tokens)` and the rollup XORs the
    * carried fingerprints — identical output to a full repack, zero
    * text reads. */
  def manifestFromStats(stats: DataFrame, budget: Long,
      idCol: String = "doc_id"): DataFrame = {
    // both consumers (assignment counts, fingerprint join) read the
    // stats frame — persist it, or an expensive upstream (e.g.
    // incrementalApply's delta tokenize in [[incrementalManifest]])
    // executes twice
    val s = Dedup.persistTracked(stats)
    Packing.packFromCounts(s.select(col(idCol), col("n_tokens")),
        budget, idCol)
      .join(s.select(col(idCol), col("_fp")), Seq(idCol))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(_fp)").as("content_hash"))
  }

  /** Incremental release manifest: given corpus v1, its materialized
    * [[docStats]], and corpus v2, produce v2's manifest EQUAL to a
    * full repack (`manifest(v2, budget)`) while reading text for the
    * v1→v2 DELTA only — [[Versioning.incrementalApply]] diffs the two
    * versions by whole-row fingerprint, reuses v1's per-doc stats for
    * unchanged docs, recomputes `added ∪ changed` and drops `removed`
    * (delta-only contract enforced there); the manifest then rolls up
    * from the narrow stats frame. At a daily 1% crawl delta this is
    * 1% of the tokenize/fingerprint compute plus a stats-sized
    * (≤ 24 B/doc) rollup, instead of a full-corpus text pass.
    *
    * Deliberately NOT a per-shard XOR subtract-and-add against the
    * stored manifest: under prefix-sum packing a single changed token
    * COUNT shifts the assignment of every later doc, so "update only
    * the shards containing changed docs" is unsound in general — the
    * algebra only balances when token counts are unchanged, and a
    * correctness contract that holds "usually" is not one. The
    * carried-stats form is exact for every delta shape. */
  def incrementalManifest(v1: DataFrame, v1Stats: DataFrame, v2: DataFrame,
      budget: Long, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    manifestFromStats(
      Versioning.incrementalApply(v1, v1Stats, v2,
        docStats(_, idCol, textCol), idCol),
      budget, idCol)

  /** Write the shards (parquet partitioned by `shard=`) and the
    * manifest next to them; returns the manifest. A reader verifies a
    * delivery by recomputing [[verifyShards]] against the stored
    * manifest. The packing pipeline (tokenize + two-level prefix sum
    * — the expensive phase of a release job) runs ONCE; its persisted
    * narrow assignment frame feeds both the shard write and the
    * manifest rollup. */
  def writeShards(docs: DataFrame, outDir: String, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val assigned = Dedup.persistTracked(
      Packing.packByTokenBudget(docs, budget, idCol, textCol))
    docs.join(assigned.select(col(idCol), col("shard")), Seq(idCol))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/shards")
    val m = manifestFromAssigned(docs, assigned, idCol, textCol)
    m.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    m
  }

  /** Recompute per-shard rollups from the stored shards and join the
    * stored manifest: emits one row per shard with an `intact` flag —
    * false on any count/token/checksum mismatch (or a shard missing
    * from either side). */
  def verifyShards(spark: SparkSession, outDir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stored = spark.read.parquet(s"$outDir/shards")
    val recomputed = fingerprinted(stored, idCol, textCol)
      .join(stored.select(col(idCol), col("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("_n")),
        Seq(idCol))
      .groupBy("shard")
      .agg(count(lit(1)).as("r_docs"), sum(col("_n")).as("r_tokens"),
        expr("bit_xor(_fp)").as("r_hash"))
    spark.read.parquet(s"$outDir/manifest")
      .join(recomputed, Seq("shard"), "full_outer")
      .select(col("shard"),
        // coalesce(false): a shard present on only one side compares
        // null, and "missing" must read as broken, not unknown
        coalesce(col("n_docs") === col("r_docs") &&
          col("n_tokens") === col("r_tokens") &&
          col("content_hash") === col("r_hash"), lit(false)).as("intact"))
  }
}
