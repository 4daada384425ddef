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
}
