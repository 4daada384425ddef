package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming twin of [[Dedup.connectedComponentsStar]] (r17, verdict
  * #8): component labels over an unbounded EDGE stream, re-contracted
  * per micro-batch with the same alternating large-star/small-star
  * rounds the batch operator runs — so the web-scale CC path carries
  * the same stream-equals-batch + replay-idempotence guarantee the
  * label-propagation twins already have.
  *
  * State is the batch-partitioned edge log ([[StreamingState]]): each
  * micro-batch overwrites its own `batch_id=N` partition and the
  * snapshot labels are `connectedComponentsStar` over every partition
  * `<= N`. A checkpoint-replayed batch rewrites the same files and
  * recomputes the same labels (the read is blind to later partitions),
  * so replay is idempotent by construction; an empty trigger reads the
  * schema-supplied log and emits the unchanged snapshot.
  *
  * 100 TB shape: the per-batch recompute reads the whole edge log —
  * right for the audit sizes the twins run at, and COMPACTIBLE without
  * a semantics change when the log outgrows it: labels are
  * star-edges (sid → component), and CC(labels(E₁) ∪ E₂) =
  * CC(E₁ ∪ E₂) because a label edge only ever connects nodes already
  * connected — so a compaction job may replace any log prefix with its
  * label snapshot and every later batch contracts the compacted union
  * instead. The contraction itself is the batch operator unchanged:
  * O(log n) equi-shuffle rounds, nothing node-count-sized broadcast.
  */
object StreamingCc {

  private def edgesDir(stateDir: String) = s"$stateDir/cc_edges"

  /** foreachBatch body: log this batch's `(da, db)` pairs, contract
    * the visible log, hand the `(sid, component)` snapshot to `sink`.
    * The caller releases [[Dedup]] caches when the stream stops. */
  def foreachBatchCcStar(stateDir: String, sink: DataFrame => Unit)
      : (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    val spark = batch.sparkSession
    val edges = batch.select(col("da").cast("long").as("da"),
      col("db").cast("long").as("db"))
    StreamingState.writePartition(edges, edgesDir(stateDir), batchId)
    val all = StreamingState.readUpTo(spark, edgesDir(stateDir),
      edges.schema, batchId).select("da", "db")
    val labels = Dedup.connectedComponentsStar(all)
    sink(labels)
    Dedup.releaseCaches()
  }
}
