package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming line-level dedup — the `foreachBatch` twin of
  * [[graft.ops.Dedup.lineDedup]], closing the last batch-only stage in
  * the crawl front half.
  *
  * Corpus-wide line counts are inherently STATEFUL AND RETROACTIVE: a
  * boilerplate line only reveals itself once enough copies have
  * arrived, which may be batches after the first document carrying it
  * was emitted. The twin therefore has UPSERT output semantics (the
  * sink keys on the doc id): after batch N, the sink's latest row per
  * doc equals batch [[Dedup.lineDedup]] over the concatenation of
  * batches 0..N — asserted in StreamingSpec. An append-only contract
  * would either have to delay every doc forever (no bound on when a
  * line goes hot) or silently disagree with the batch operator; the
  * upsert contract is the honest one, and it is what a curation sink
  * (a keyed table the next pipeline stage reads) does anyway.
  *
  * State layout: each batch overwrites its OWN partition
  * `lines/batch_id=N` with its exploded `(doc_id, pos, line, k)` frame
  * (dynamic partition overwrite — a checkpoint-replayed batch rewrites
  * its files instead of duplicating rows, the [[StreamingAnn]]
  * exactly-once pattern). The state is the line table itself — bounded
  * by corpus size, not stream lifetime (disclosed: that is the
  * fundamental cost of EXACT corpus-wide counts; the batch op's state
  * is the same table).
  *
  * Per-batch work is NOT history-sized: cumulative counts aggregate
  * the narrow `k` column only (map-side combined), and documents are
  * re-emitted only when their judgment could have changed — the
  * current batch's docs, plus historical docs sharing a key that this
  * batch pushed over `maxOccurrences` (keys hot before this batch
  * already had their lines dropped from every prior emission; keys
  * untouched by this batch have unchanged counts). Reassembly reads
  * history lines via a semi-join on those affected ids.
  */
object StreamingLineDedup {

  private def linesDir(stateDir: String) = s"$stateDir/lines"

  /** The `foreachBatch` body. Wire as
    * {{{ stream.writeStream.foreachBatch(
    *       StreamingLineDedup.foreachBatchLineDeduper(
    *         maxOccurrences, stateDir, sink)) }}}
    * `sink` receives the same `(idCol, clean_text, n_kept, n_dropped)`
    * schema as the batch operator and must upsert by `idCol`. */
  def foreachBatchLineDeduper(maxOccurrences: Long, stateDir: String,
      sink: DataFrame => Unit, idCol: String = "doc_id",
      textCol: String = "text", sep: String = "\n"): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      require(maxOccurrences >= 1, "maxOccurrences must be >= 1")
      // 1. this batch's exploded lines land in the batch's own
      //    partition FIRST (replay rewrites the same files)
      val batchExploded = Dedup.explodeLines(batch, idCol, textCol, sep)
      StreamingState.writePartition(batchExploded, linesDir(stateDir), batchId)
      // 2. cumulative counts over batches <= this one (replay blinding
      //    + schema-supplied empty-batch safety live in StreamingState)
      val allLines = Dedup.persistTracked(
        StreamingState.readUpTo(spark, linesDir(stateDir),
          batchExploded.schema, batchId))
      val counts = allLines.groupBy("k").agg(count(lit(1)).as("occ"))
      val batchLines = allLines.filter(col("batch_id") === batchId)
      // 3. docs whose judgment could have changed: this batch's, plus
      //    historical docs holding a key this batch pushed OVER the
      //    threshold. Keys already hot before this batch are excluded
      //    (their lines were dropped from every prior emission, and a
      //    hot boilerplate line recurs in EVERY batch — including them
      //    would re-emit its entire history each batch, making
      //    per-batch work history-sized)
      val batchCounts = batchLines.groupBy("k").agg(count(lit(1)).as("bocc"))
      val newlyHot = counts.join(batchCounts, Seq("k"))
        .filter(col("occ") > maxOccurrences &&
          col("occ") - col("bocc") <= maxOccurrences)
        .select("k")
      val affected = batchLines.select(idCol).union(
          allLines.filter(col("batch_id") < batchId)
            .join(newlyHot, Seq("k")).select(idCol))
        .distinct()
      val out = Dedup.reassembleAgainstCounts(
        allLines.join(affected, Seq(idCol), "left_semi")
          .select(idCol, "pos", "line", "k"),
        counts, maxOccurrences, idCol, sep)
      sink(out)
      Dedup.releaseCaches()
  }
}
