package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout utilities for repeated large-scale joins: Spark's
  * bucketing co-locates both sides of a join by key at WRITE time, so
  * every subsequent join/aggregation on that key runs with ZERO
  * exchanges — at 100 TB the shuffle is the dominant cost of a big
  * join, and a nightly-rebuilt bucketed table amortizes it across every
  * downstream query (the classic fact/dimension layout decision;
  * PlanSpec-style test asserts the no-Exchange plan mechanically).
  *
  * Bucketing requires the session catalog (`saveAsTable`) — bucket
  * metadata lives in the metastore, not the parquet footers. Bucket
  * counts must match on both sides for the exchange to be elided
  * (Spark does not yet coalesce mismatched bucket counts without AQE
  * help); pick the count from target partition size (~128 MB each) at
  * the LARGER table and reuse it for its join partners. */
object Layout {

  /** Write `df` as a bucketed+sorted managed table. Sorting within
    * buckets additionally lets sort-merge joins skip their sort. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Ingest (especially streaming
    * micro-batches) leaves thousands of KB-scale files; at 100 TB the
    * per-file open/footer cost and the scheduler's per-split overhead
    * dominate scans long before I/O does, and a nightly compaction
    * pass is the standard fix.
    *
    * File count comes from the INPUT's on-disk bytes (a driver-side
    * metadata listing — same cost class as planning the scan itself),
    * so the output sizing survives compression: parquet-in ≈
    * parquet-out for the same codec. `shuffle = false` uses
    * `coalesce` — no shuffle, but input-order file packing (can skew
    * when input files vary wildly in size); `shuffle = true` (default)
    * pays one even repartition — for a compaction job that runs once
    * and amortizes over every later scan, even output beats cheap.
    *
    * Returns (input file count, output file count). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20, shuffle: Boolean = true): (Int, Int) = {
    require(targetBytes > 0)
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $inDir")
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    (if (shuffle) df.repartition(n) else df.coalesce(n))
      .write.mode("overwrite").parquet(outDir)
    val out = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, out)
  }

  /** Morton interleave of the low `bits` bits of two non-negative cell
    * indices — pure shift/mask column arithmetic, whole-stage
    * codegen'd. */
  private[ops] def mortonInterleave(a: Column, b: Column,
      bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** The z-value column for two numeric columns: each is scaled into a
    * 2^bits-cell grid over its [min, max] range (`mn/mx` come from a
    * one-pass stats agg — see [[zorderWrite]]) and the cell indices
    * are Morton-interleaved. */
  private[ops] def zValue(c1: Column, mn1: Column, mx1: Column,
      c2: Column, mn2: Column, mx2: Column, bits: Int): Column = {
    val cells = (1L << bits) - 1
    def cell(c: Column, mn: Column, mx: Column): Column =
      when(mx <= mn, lit(0L)).otherwise(
        least(lit(cells), greatest(lit(0L),
          floor((c.cast("double") - mn) / (mx - mn) * cells))))
    mortonInterleave(cell(c1, mn1, mx1), cell(c2, mn2, mx2), bits)
  }

  /** Z-order clustering: rewrite `df` sorted by the Morton code of
    * (col1, col2), range-partitioned into `numFiles` files. Parquet
    * keeps per-row-group/file min-max stats; a LINEAR sort prunes on
    * one column only, while the z-curve keeps BOTH columns' value
    * ranges narrow within every file — so 2-D box predicates skip
    * files/row-groups on either dimension. At 100 TB this is the
    * difference between scanning a shard and scanning the table for
    * the common `WHERE key BETWEEN ... AND metric > ...` shape.
    *
    * Cost: one stats pass (min/max of both columns, broadcast as a
    * 1-row frame) + one range shuffle — a layout job, amortized over
    * every later scan, same contract as [[writeBucketed]]/[[compact]].
    */
  def zorderWrite(df: DataFrame, outDir: String, col1: String,
      col2: String, numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles > 0 && bits > 0 && bits <= 31)
    val stats = df.agg(
      min(col(col1)).cast("double").as("_mn1"),
      max(col(col1)).cast("double").as("_mx1"),
      min(col(col2)).cast("double").as("_mn2"),
      max(col(col2)).cast("double").as("_mx2"))
    df.crossJoin(broadcast(stats))
      .withColumn("_z", zValue(
        col(col1), col("_mn1"), col("_mx1"),
        col(col2), col("_mn2"), col("_mx2"), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_mn1", "_mx1", "_mn2", "_mx2", "_z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Hive-style partitioned layout (`outDir/col=value/...`): the
    * third leg of the layout family. Bucketing co-locates JOIN keys,
    * z-order narrows 2-D range scans, partitioning makes an
    * equality/IN predicate on the partition column skip whole
    * directories at PLANNING time — and, through dynamic partition
    * pruning, a JOIN against a filtered dimension skips them at
    * RUNTIME (the fact side scans only partitions the dim filter
    * admits; at 100 TB a `lang = 'en'` dim cut reads the English
    * shard, not the corpus). The pre-write `repartition` on the
    * partition column gives each partition directory one task's worth
    * of files instead of tasks × partitions small files.
    *
    * The DPP proof lives in OpsSpec: same join, DPP on vs off, scan
    * metrics must show fewer files read with pruning. */
  def writePartitioned(df: DataFrame, outDir: String,
      partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(outDir)
}
