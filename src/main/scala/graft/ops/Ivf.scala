package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the
  * data-adaptive complement to sign-LSH ([[Similarity.lshKnn]]):
  * a coarse quantizer of `numCentroids` k-means centroids partitions
  * the corpus into cells; a query probes its `nprobe` nearest cells and
  * exact-scores only their members. Centroids adapt to the data
  * distribution, so cells are balanced where LSH buckets would be
  * skewed by density.
  *
  * Scale design: the centroid model is TINY (C × dim doubles — model
  * parameters, not data) and is the only thing ever collected to the
  * driver; training is `spark.ml`-style iterative DataFrame
  * aggregation (assign = plan-time-expanded argmin over C codegen dot
  * products; update = per-dimension avg via posexplode + groupBy —
  * map-side combined, one narrow shuffle per iteration). Search is an
  * equi-join on cell id: probe rows ≈ queries × nprobe, candidate rows
  * ≈ corpus × nprobe / C — never a full scan per query.
  *
  * Fully deterministic: seeds are the vectors at evenly-strided ranks
  * of the vec-id order (no RNG), Lloyd iterations are a fixed count,
  * ties broken by index — reproducible across sessions like the
  * MinHash/LSH families.
  */
object Ivf {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** The k nearest cell ids by squared L2, as ONE codegen expression
    * ([[graft.etl.expressions.NearestCells]]) with the centroid matrix
    * as a reference object. The plan-time-expanded argmin this replaces
    * (C struct terms × dim literal coefficients each) breaks Janino
    * long before the C ≈ √n a real IVF runs at 10^9 vectors; arithmetic
    * and tie order are bit-identical to that form. */
  private def nearestCells(vec: Column, centroids: Array[Array[Double]],
      k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.NearestCells(
        org.apache.spark.sql.graft.Bridge.expression(vec), centroids, k))

  /** Train `numCentroids` centroids with `iters` Lloyd iterations.
    * Returns the centroid matrix (model parameters, driver-sized). */
  def train(emb: DataFrame, numCentroids: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    require(numCentroids > 0, "numCentroids must be positive")
    // deterministic seeds WITHOUT a global sort and WITHOUT a bucket
    // window (row_number over a bucket key has no partial aggregation:
    // corpus/numCentroids rows would funnel through each bucket's ONE
    // task): min(struct(sid, ve)) per id-hash bucket partial-aggregates
    // to one candidate row per bucket per map task, and struct ordering
    // compares sid first (unique), so the selected rows are IDENTICAL
    // to the row_number form. Empty buckets (tiny corpora) just yield
    // fewer centroids.
    var centroids: Array[Array[Double]] = emb
      .select(col(idCol).as("sid"), asDouble(col(vecCol)).as("ve"))
      .withColumn("b", pmod(hash(col("sid")), lit(numCentroids)))
      .groupBy("b").agg(min(struct(col("sid"), col("ve"))).as("_s"))
      .orderBy("b").select("_s.ve").collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val assigned = assign(emb, centroids, idCol, vecCol)
        .select(col("cell"), posexplode(asDouble(col(vecCol))).as(Seq("d", "x")))
      // per-dimension mean per cell: one narrow map-side-combined shuffle
      val means = assigned.groupBy("cell", "d").agg(avg("x").as("m"))
        .groupBy("cell").agg(map_from_arrays(
          collect_list(col("d")), collect_list(col("m"))).as("dm"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        val cell = r.getInt(0)
        r.getMap[Int, Double](1).foreach { case (d, m) => next(cell)(d) = m }
      }
      centroids = next
    }
    centroids
  }

  /** Nearest-centroid cell id per vector (argmin over squared L2:
    * |v|² is constant across centroids so -2·v·c + |c|² suffices —
    * computed inside [[nearestCells]]'s single codegen loop). */
  def assign(emb: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.withColumn("cell",
      element_at(nearestCells(asDouble(col(vecCol)), centroids, 1), 1))

  /** Cells ranked by distance for a vector — the probe list. */
  private[ops] def probeCells(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column = nearestCells(vec, centroids, nprobe)

  /** IVF top-k cosine search: queries selected by `queryPred` probe
    * their `nprobe` nearest cells; exact cosine over cell members only;
    * deterministic ranking (rounded sim, id tiebreak) like
    * [[Similarity.bruteForceKnn]]. */
  def knn(emb: DataFrame, k: Int, queryPred: Column,
      numCentroids: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      iters: Int = 2): DataFrame =
    knnWithModel(emb, k, queryPred,
      train(emb, numCentroids, iters, idCol, vecCol), nprobe, idCol, vecCol)

  /** [[knn]] against a PREBUILT centroid model (trained earlier, or
    * loaded via [[AnnModels.loadCentroids]]) — no training scans in
    * the query session. Queries are selected from `emb` itself (NOT
    * the narrower encoded projection), so `queryPred` may reference
    * any `emb` column — consistent with [[Pq.knnWithModel]]. */
  def knnWithModel(emb: DataFrame, k: Int, queryPred: Column,
      centroids: Array[Array[Double]], nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    knnEncoded(encodeCorpus(emb, centroids, idCol, vecCol), k, queryPred,
      centroids, nprobe, idCol, vecCol, queriesFrom = Some(emb))

  /** The stored IVF index rows — (idCol, vecCol as array<double>,
    * cell): assignment against a frozen model, writable next to the
    * model's [[AnnModels.saveCentroids]] parquet and appendable as new
    * vectors arrive ([[appendToIndex]]). */
  def encodeCorpus(emb: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(emb, centroids, idCol, vecCol)
      .select(col(idCol), asDouble(col(vecCol)).as(vecCol), col("cell"))

  /** Daily-ingest append: assign NEW vectors against the FROZEN model
    * and append their encoded rows to the stored index — no retrain,
    * no rewrite of existing rows, and searches over the loaded index
    * ([[knnEncoded]]) see the union. Encodings are byte-identical to
    * what a full re-encode under the same model would produce
    * (assignment is deterministic), asserted in OpsSpec. */
  def appendToIndex(newVecs: DataFrame, centroids: Array[Array[Double]],
      indexPath: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    encodeCorpus(newVecs, centroids, idCol, vecCol)
      .write.mode("append").parquet(indexPath)

  /** [[knnWithModel]] over an ALREADY-ENCODED index (the
    * [[encodeCorpus]] layout, typically read back from parquet): the
    * query session re-assigns nothing — queries compute their probe
    * list against the model and equi-join the stored cells.
    * `queriesFrom` optionally supplies the query rows (a wider corpus
    * table whose extra columns `queryPred` may reference); by default
    * queries come from the index itself, so the predicate may only
    * reference the index columns (idCol, vecCol, cell). */
  def knnEncoded(index: DataFrame, k: Int, queryPred: Column,
      centroids: Array[Array[Double]], nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queriesFrom: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = index
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("ce"),
        col("cell"))
      .withColumn("cn", Similarity.norm(col("ce")))
    val q = queriesFrom.getOrElse(index).filter(queryPred)
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qe"))
      .withColumn("qn", Similarity.norm(col("qe")))
      .withColumn("cell", explode(probeCells(col("qe"), centroids, nprobe)))
    val sims = q.join(cells, "cell")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 4)
          .as("sim"))
      .dropDuplicates("qid", "cid")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
