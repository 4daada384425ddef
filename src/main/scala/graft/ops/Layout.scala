package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
