package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Token-budget sequence packing: assign documents (in stable id
  * order) to fixed-token-budget training shards — the shard-cutting
  * step of a pre-training data pipeline ("fill each shard with ~N
  * tokens of consecutive curated text").
  *
  * The naive form is a GLOBAL running sum (`Window.orderBy(id)` with
  * no partition key), which Spark executes in a single partition —
  * the whole corpus through one task. This is the two-level prefix
  * sum instead, all DataFrame ops:
  *
  *   1. bucket rows by an id range (`bucketWidth` ids per bucket) and
  *      cumsum WITHIN each bucket — parallel window, one shuffle on
  *      the bucket key;
  *   2. cumsum the per-bucket totals (tiny frame: one row per bucket
  *      — the only single-partition step, O(corpus / bucketWidth)
  *      rows) into per-bucket offsets, broadcast back;
  *   3. global running total = bucket offset + within-bucket cumsum.
  *
  * A document is assigned to the shard its FIRST token lands in
  * (exclusive-prefix / budget) — whole docs are never split, so
  * shards overflow by at most one document (the standard
  * don't-break-documents packing; splitting is a tokenizer-level
  * concern, disclosed).
  */
object Packing {

  /** Per-doc shard assignment: (idCol, n_tokens, shard). `tokenCount`
    * is whitespace tokens ([[TextAnalysis.tokenCount]] — the pinned
    * tokenizer contract). `startOffset` shifts the global prefix sum
    * by tokens that came BEFORE this frame — 0 for a batch corpus; the
    * carried cumulative total for a streaming micro-batch
    * ([[graft.streaming.StreamingPacking]]). */
  /** The two-level prefix-sum core: (idCol, n_tokens, _gp) where `_gp`
    * is each doc's GLOBAL exclusive token prefix (tokens before its
    * first token, `startOffset` included). */
  private def withGlobalPrefix(docs: DataFrame, idCol: String,
      textCol: String, bucketWidth: Long, startOffset: Long): DataFrame =
    withGlobalPrefixFromCounts(
      docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      idCol, bucketWidth, startOffset)

  /** [[withGlobalPrefix]] over a precomputed `(idCol, n_tokens)` frame
    * — the narrow-stats path ([[Release.incrementalManifest]] carries
    * per-doc stats across releases, so assignment math reruns with NO
    * text scan; identical results by construction). */
  private[ops] def withGlobalPrefixFromCounts(counts: DataFrame,
      idCol: String, bucketWidth: Long, startOffset: Long): DataFrame =
    withGlobalPrefixKeep(
      counts.select(col(idCol), col("n_tokens")),
      idCol, bucketWidth, startOffset)

  /** [[withGlobalPrefixFromCounts]] with PASSTHROUGH: every input
    * column survives alongside `_gp` (the select-down variant above
    * keeps the public packFromCounts contract at exactly
    * (idCol, n_tokens, _gp)). Same prefix-sum core. */
  private[ops] def withGlobalPrefixKeep(counts: DataFrame,
      idCol: String, bucketWidth: Long, startOffset: Long): DataFrame = {
    // narrow (id, count, bucket) frame persisted: both the per-bucket
    // window and the offsets agg read it — without the persist each
    // plans its OWN corpus scan + tokenize (verified in docs/PLANS.md
    // history), i.e. the whole input twice for a layout job
    val base = Dedup.persistTracked(counts
      .withColumn("n_tokens", col("n_tokens").cast("long"))
      .withColumn("_bkt", floor(col(idCol) / bucketWidth)))
    val within = base.withColumn("_wcum",
      sum(col("n_tokens")).over(Window.partitionBy(col("_bkt"))
        .orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = base.groupBy("_bkt")
      .agg(sum(col("n_tokens")).as("_btot"))
      .withColumn("_off",
        coalesce(sum(col("_btot")).over(Window.orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_bkt", "_off")
    within.join(broadcast(offsets), Seq("_bkt"))
      .withColumn("_gp",
        col("_off") + col("_wcum") - col("n_tokens") + startOffset)
      .drop("_bkt", "_wcum", "_off")
  }

  def packByTokenBudget(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketWidth: Long = 100000L, startOffset: Long = 0L): DataFrame = {
    require(budget > 0 && bucketWidth > 0 && startOffset >= 0)
    withGlobalPrefix(docs, idCol, textCol, bucketWidth, startOffset)
      .select(col(idCol), col("n_tokens"),
        floor(col("_gp").cast("double") / budget).cast("long").as("shard"))
  }

  /** [[packByTokenBudget]] from a precomputed `(idCol, n_tokens)`
    * frame: no tokenize, no text scan — same assignment. */
  def packFromCounts(counts: DataFrame, budget: Long,
      idCol: String = "doc_id", bucketWidth: Long = 100000L,
      startOffset: Long = 0L): DataFrame = {
    require(budget > 0 && bucketWidth > 0 && startOffset >= 0)
    withGlobalPrefixFromCounts(counts, idCol, bucketWidth, startOffset)
      .select(col(idCol), col("n_tokens"),
        floor(col("_gp").cast("double") / budget).cast("long").as("shard"))
  }

  /** [[packByTokenBudget]] plus each doc's token POSITION within its
    * shard (`pos` = first-token offset relative to the shard's first
    * doc) — the sample-boundary metadata sequence packing emits so
    * training can mask attention across document boundaries inside a
    * packed shard. One extra bounded shuffle (a min window keyed by
    * shard — shards are budget-sized, never one partition). */
  def packWithPositions(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketWidth: Long = 100000L, startOffset: Long = 0L): DataFrame = {
    require(budget > 0 && bucketWidth > 0 && startOffset >= 0)
    withGlobalPrefix(docs, idCol, textCol, bucketWidth, startOffset)
      .withColumn("shard",
        floor(col("_gp").cast("double") / budget).cast("long"))
      .withColumn("pos",
        col("_gp") - min(col("_gp")).over(Window.partitionBy(col("shard"))))
      .select(col(idCol), col("n_tokens"), col("shard"), col("pos"))
  }

  /** GPT-style packing WITH document splitting: shards are EXACT
    * fixed-size token windows ([s·budget, (s+1)·budget)) and a doc
    * crossing a boundary is sliced — each output row is one
    * (doc, shard) slice with the doc-relative token range
    * [slice_start, slice_start + slice_len). Every shard except the
    * last holds exactly `budget` tokens (the invariant no-split
    * packing trades away; [[packByTokenBudget]] is the
    * don't-break-documents mode). Same distributed prefix-sum core;
    * the explode emits one extra row per boundary crossing —
    * corpus_tokens / budget rows total, independent of doc count. */
  def packWithSplitting(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketWidth: Long = 100000L, startOffset: Long = 0L): DataFrame = {
    require(budget > 0 && bucketWidth > 0 && startOffset >= 0)
    withGlobalPrefix(docs, idCol, textCol, bucketWidth, startOffset)
      .withColumn("_s0", floor(col("_gp").cast("double") / budget).cast("long"))
      .withColumn("_s1", floor((col("_gp") + col("n_tokens") - 1)
        .cast("double") / budget).cast("long"))
      .select(col(idCol), col("n_tokens"), col("_gp"),
        explode(sequence(col("_s0"), col("_s1"))).as("shard"))
      .select(col(idCol), col("shard"),
        greatest(col("shard") * budget - col("_gp"), lit(0L)).as("slice_start"),
        (least((col("shard") + 1) * budget - col("_gp"), col("n_tokens")) -
          greatest(col("shard") * budget - col("_gp"), lit(0L))).as("slice_len"))
  }

  /** Deterministic seeded shuffle + epoch-sliced packing — the
    * training-order step between curation and the trainer: every epoch
    * is an independent, REPRODUCIBLE global permutation of the corpus
    * (key = md5(seed:epoch:id), a 16-hex-char string that sorts
    * identically in any engine; id tiebreak makes the order total),
    * packed into token-budgeted shards in permuted order. No RNG, no
    * `orderBy(rand(seed))` (partitioning-sensitive), no single-task
    * sort: the permutation materializes through
    * [[Ranking.withGlobalRank]]'s range-partition machinery and the
    * contiguous rank feeds the same two-level prefix-sum core as every
    * other packing mode. Epochs are independent permutations (seed
    * namespaced per epoch), so multi-epoch training never replays
    * shard order — the Ouroboros/data-order effect mitigation —
    * while any row's placement is recomputable from (seed, epoch, id)
    * alone. */
  def shuffledPack(docs: DataFrame, budget: Long, epochs: Int, seed: String,
      idCol: String = "doc_id", textCol: String = "text",
      bucketWidth: Long = 100000L): DataFrame = {
    require(budget > 0 && epochs > 0 && bucketWidth > 0 && seed.nonEmpty)
    val counts = Dedup.persistTracked(docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")))
    (0 until epochs).map { e =>
      val hk = substring(md5(concat(lit(s"$seed:$e:"),
        col(idCol).cast("string")).cast("binary")), 1, 16)
      val ranked = Ranking.withGlobalRank(
        counts.withColumn("_hk", hk), Seq(col("_hk"), col(idCol)), "pos")
      withGlobalPrefixKeep(ranked.drop("_hk"), "pos", bucketWidth, 0L)
        .select(lit(e).as("epoch"), col(idCol), col("pos"), col("n_tokens"),
          floor(col("_gp").cast("double") / budget).cast("long").as("shard"))
    }.reduce(_ unionByName _)
  }

  /** Shard profile from [[packByTokenBudget]]: docs and tokens per
    * shard. Invariant (no doc is split, docs assigned by first-token
    * shard): an interior shard's token count lies in
    * (budget - maxDocLen, budget + maxDocLen) — a doc overflowing a
    * boundary pushes the next shard's first doc forward, so interior
    * shards can run UNDER budget by up to a doc length; and a doc
    * longer than the whole budget makes shard ids skip. */
  def shardProfile(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketWidth: Long = 100000L): DataFrame =
    packByTokenBudget(docs, budget, idCol, textCol, bucketWidth)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
}
