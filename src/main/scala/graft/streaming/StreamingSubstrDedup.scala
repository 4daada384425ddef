package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming exact repeated-substring removal — the `foreachBatch`
  * twin of [[graft.ops.Dedup.exactSubstringDedup]], with the same
  * UPSERT contract as [[StreamingLineDedup]] and for the same reason:
  * a k-token span only reveals itself as repeated once enough copies
  * arrive, possibly batches after its first document was emitted, so
  * the sink keys on the doc id and after batch N its latest rows
  * equal the batch operator over the concatenation of batches 0..N.
  *
  * State layout: each batch overwrites its OWN `batch_id=N` partition
  * in TWO tables — the hashed-gram frame `(doc_id, gpos, gram)` (what
  * occurrence counting and hot-start lookup need) and the token frame
  * `(doc_id, pos, tok)` (what reassembly of an affected doc needs) —
  * so a checkpoint-replayed batch rewrites its files instead of
  * duplicating rows. State is corpus-sized, as for the batch op and
  * the line twin (exact corpus-wide counts cost the corpus).
  *
  * Per-batch work is NOT history-sized: gram counts aggregate the
  * 8-byte hashed key (map-side combined); documents re-emit only when
  * their judgment could have changed — the current batch's, plus
  * historical docs holding a gram THIS batch pushed over
  * `maxOccurrences` (grams hot before this batch already had their
  * spans removed from every prior emission); reassembly reads history
  * tokens via a semi-join on the affected ids. */
object StreamingSubstrDedup {

  private def gramsDir(stateDir: String) = s"$stateDir/grams"
  private def toksDir(stateDir: String) = s"$stateDir/toks"

  /** The `foreachBatch` body. `sink` receives the batch operator's
    * `(idCol, clean_text, n_tokens, n_removed)` schema and must
    * upsert by `idCol`. */
  def foreachBatchSubstrDeduper(k: Int, maxOccurrences: Long,
      stateDir: String, sink: DataFrame => Unit,
      idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      require(maxOccurrences >= 1, "maxOccurrences must be >= 1")
      val (toks, grams) = Dedup.substringFrames(batch, k, idCol, textCol)
      StreamingState.writePartition(grams, gramsDir(stateDir), batchId)
      StreamingState.writePartition(toks, toksDir(stateDir), batchId)
      // replay blinding + schema-supplied empty-batch safety live in
      // StreamingState
      def readState(dir: String, template: DataFrame): DataFrame =
        StreamingState.readUpTo(spark, dir, template.schema, batchId)
      val allGrams = Dedup.persistTracked(
        readState(gramsDir(stateDir), grams))
      val counts = allGrams.groupBy("gram").agg(count(lit(1)).as("occ"))
      val hot = counts.filter(col("occ") > maxOccurrences).select("gram")
      val batchGrams = allGrams.filter(col("batch_id") === batchId)
      // threshold-CROSSING grams only (a gram hot before this batch
      // already had its span removed from every prior emission —
      // re-including it would make per-batch work history-sized)
      val batchCounts = batchGrams.groupBy("gram")
        .agg(count(lit(1)).as("bocc"))
      val newlyHot = counts.join(batchCounts, Seq("gram"))
        .filter(col("occ") > maxOccurrences &&
          col("occ") - col("bocc") <= maxOccurrences)
        .select("gram")
      // affected docs seed from the batch's TOKEN frame, not its gram
      // frame: a doc shorter than k tokens has no grams at all but
      // must still be emitted (batch parity — no silent row loss)
      val affected = toks.select(idCol).union(
          allGrams.filter(col("batch_id") < batchId)
            .join(newlyHot, Seq("gram")).select(idCol))
        .distinct()
      val hotStarts = allGrams.join(affected, Seq(idCol), "left_semi")
        .join(hot, Seq("gram"))
        .select(col(idCol), col("gpos"))
      val affToks = readState(toksDir(stateDir), toks)
        .join(affected, Seq(idCol), "left_semi")
        .select(idCol, "pos", "tok")
      sink(Dedup.removeCoveredTokens(affToks, hotStarts, k, idCol))
      Dedup.releaseCaches()
  }
}
