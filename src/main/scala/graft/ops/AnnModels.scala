package graft.ops

import org.apache.spark.sql.SparkSession

/** ANN model persistence: train once, query forever. IVF centroids and
  * PQ codebooks are driver-sized `Array` parameters; at 100 TB the
  * expensive step is the training scans, so a pipeline trains nightly,
  * persists the model next to the encoded corpus, and every query
  * session loads it back. Parquet round-trips IEEE doubles exactly, so
  * a loaded model is BIT-IDENTICAL to the trained one — searches give
  * byte-equal results before and after persistence (asserted in
  * OpsSpec), which is what makes the recall floors in CORRECTNESS
  * transferable across sessions.
  */
object AnnModels {

  /** IVF centroid matrix → parquet rows (cell, vec). */
  def saveCentroids(spark: SparkSession, centroids: Array[Array[Double]],
      path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "vec").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** PQ codebooks (m × kSub × subDim) → parquet rows (j, c, vec). */
  def saveCodebooks(spark: SparkSession,
      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    (for {
      (book, j) <- codebooks.zipWithIndex
      (v, c) <- book.zipWithIndex
    } yield (j, c, v.toSeq)).toSeq
      .toDF("j", "c", "vec").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadCodebooks(spark: SparkSession,
      path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path).orderBy("j", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
  }
}
