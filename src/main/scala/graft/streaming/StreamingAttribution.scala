package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming multi-touch attribution — the WATERMARK-FINALIZATION
  * pattern, distinct from both the summary-carry twins (HLL/CMS/heavy
  * hitters) and the full-prefix-recompute twins (token budget, robust
  * stats):
  *
  *   - a purchase's credit split is IMMUTABLE once the watermark
  *     passes its timestamp (its lookback window [pe−horizon, pe) can
  *     receive no more arrivals), so finalized credits accumulate
  *     APPEND-ONLY by integer SUM on the `batch_id=` contribution
  *     protocol — no retro-correction, by theorem rather than by
  *     recompute;
  *   - everything not yet finalizable (events young enough to serve a
  *     future purchase, purchases still inside the lateness bound)
  *     rides a pruned pending file-carry: events below
  *     watermark − horizon can never be touched again and are DROPPED,
  *     so state is O(horizon + lateness window), not O(stream).
  *
  * Credit arithmetic matches the batch op exactly: per purchase,
  * share = (touches_of_type · 10^12) DIV touches_total — integral, so
  * accumulation order cannot move a bit and the snapshot equals the
  * batch attribution over every FINALIZED purchase. A replayed batch
  * re-reads its predecessor's pending state and rewrites both its
  * pending file and its credit partition byte-identically. */
object StreamingAttribution {

  private def pendingDir(stateDir: String, batchId: Long) =
    s"$stateDir/pending/batch-$batchId"

  private def priorPending(spark: SparkSession, stateDir: String,
      batchId: Long): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(s"$stateDir/pending")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val direct = new org.apache.hadoop.fs.Path(pendingDir(stateDir, batchId - 1))
    if (fs.exists(direct)) Some(spark.read.parquet(direct.toString))
    else {
      val dir = new org.apache.hadoop.fs.Path(s"$stateDir/pending")
      if (!fs.exists(dir)) None
      else {
        val ids = fs.listStatus(dir).toSeq.flatMap { s =>
          val n = s.getPath.getName
          if (n.startsWith("batch-")) n.stripPrefix("batch-").toLongOption
            .map(_ -> s.getPath)
          else None
        }
        val prior = ids.filter(_._1 < batchId)
        if (prior.nonEmpty)
          Some(spark.read.parquet(prior.maxBy(_._1)._2.toString))
        else if (ids.exists(_._1 > batchId))
          throw new IllegalStateException(
            s"attribution state for batches before $batchId was pruned " +
              s"(oldest retained: ${ids.map(_._1).min}); only the last " +
              "uncommitted batch is replayable")
        else None
      }
    }
  }

  /** The `foreachBatch` body. Input batch schema: (event_id, user_id,
    * ts, event_type). `sink` receives the running finalized credit
    * table (event_type, touches, credit_scaled) each batch — scaled by
    * 10^12, exact integers. */
  def foreachBatchAttribution(horizonUs: Long, latenessUs: Long,
      stateDir: String, purchaseType: String = "purchase",
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val incoming = batch.select(col("event_id").cast("long"),
        col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type").cast("string"))
      val pending = priorPending(spark, stateDir, batchId) match {
        case Some(p) => p.unionByName(incoming)
        case None => incoming
      }
      val all = Dedup.checkpointTracked(pending)
      // monotone watermark over everything still carried + arrived
      val maxUs = all.agg(max("us")).as[Option[Long]].collect().head
        .getOrElse(Long.MinValue)
      val wm = maxUs - latenessUs
      // finalize purchases the watermark has passed: their windows are
      // complete, their credits immutable
      val fin = all.filter(col("event_type") === purchaseType &&
        col("us") <= wm)
        .select(col("event_id").as("pid"), col("user_id").as("pu"),
          col("us").as("pe"))
      val touches = all.filter(col("event_type") =!= purchaseType)
        .join(fin, col("user_id") === col("pu") &&
          col("us") >= col("pe") - horizonUs && col("us") < col("pe"))
        .select(col("pid"), col("event_type"))
      val pn = touches.groupBy("pid").agg(count(lit(1)).as("n"))
      val contrib = touches.groupBy("pid", "event_type")
        .agg(count(lit(1)).as("c"))
        .join(pn, "pid")
        .groupBy("event_type")
        .agg(sum("c").as("touches"),
          sum(expr("(c * 1000000000000) DIV n")).as("credit_scaled"))
      StreamingState.writePartition(contrib, s"$stateDir/credits", batchId)
      // prune: finalized purchases leave; events below wm − horizon can
      // serve no future purchase (any later purchase has pe > wm)
      val nextPending = all
        .filter((col("event_type") =!= purchaseType &&
            col("us") >= wm - horizonUs) ||
          (col("event_type") === purchaseType && col("us") > wm))
      nextPending.coalesce(1).write.mode("overwrite")
        .parquet(pendingDir(stateDir, batchId))
      // prune stale carries: only the last uncommitted batch is
      // replayable, so everything before the predecessor can go (the
      // StreamingSketch file-carry rule — keeps the state dir O(1)
      // files, not O(stream))
      val fs = new org.apache.hadoop.fs.Path(s"$stateDir/pending")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$stateDir/pending"))
        .foreach { st =>
          val nm = st.getPath.getName
          if (nm.startsWith("batch-"))
            nm.stripPrefix("batch-").toLongOption.foreach { id =>
              if (id < batchId - 1) fs.delete(st.getPath, true): Unit
            }
        }
      val rolled = StreamingState.readUpTo(spark, s"$stateDir/credits",
          contrib.schema, batchId)
        .groupBy("event_type")
        .agg(sum("touches").as("touches"),
          sum("credit_scaled").as("credit_scaled"))
      sink(rolled)
      Dedup.releaseCaches()
  }
}
