package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** The exactly-once parquet state idiom shared by every stateful
  * `foreachBatch` twin (line/substr dedup, funnel, retention,
  * transitions — the [[StreamingAnn]] pattern):
  *
  *   - each batch OVERWRITES its own `batch_id=N` partition, so a
  *     checkpoint-replayed batch rewrites its files byte-for-byte
  *     instead of duplicating rows;
  *   - reads SUPPLY the schema (an empty first batch writes a
  *     partitionless dir that schema inference would reject — the
  *     stream must survive empty triggers) and filter
  *     `batch_id <= N`, keeping a manually replayed batch blind to
  *     partitions written after it (live streams never have any).
  *
  * Holding both halves of the contract in one place keeps the seven
  * call sites from drifting — a change to the replay semantics lands
  * everywhere or nowhere.
  */
private[streaming] object StreamingState {

  /** Write `df` as the state contribution of `batchId`. */
  def writePartition(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)

  /** Read every contribution visible to `batchId`. `rowSchema` is the
    * schema WITHOUT the batch_id column (pass `frame.schema` of the
    * frame handed to [[writePartition]]). */
  def readUpTo(spark: SparkSession, dir: String, rowSchema: StructType,
      batchId: Long): DataFrame =
    spark.read.schema(rowSchema.add("batch_id", LongType)).parquet(dir)
      .filter(col("batch_id") <= batchId)
}
