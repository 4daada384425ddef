package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the memory-footprint scale path the
  * other ANN forms don't cover: at 10^9 vectors, float embeddings are
  * the dominant storage/IO cost (64 dims × 4 B = 256 B/vector); PQ
  * stores each vector as `m` sub-codebook indices (+1 true norm), a
  * ~16× compression, and scans CODES instead of vectors.
  *
  * Pipeline (the classic IVF-PQ decomposition, PQ half):
  *  1. train: an independent deterministic k-means codebook per
  *     contiguous `dim/m` subspace (reuses [[Ivf.train]] — model is
  *     m × kSub × subDim doubles, driver-sized parameters, the ONLY
  *     thing collected besides the tiny query set);
  *  2. encode: per vector, argmin sub-centroid per subspace →
  *     `array<int>` of length m (plan-time-expanded codegen dot
  *     products, same shape as [[Ivf.assign]]);
  *  3. ADC scan: per query, a lookup table LUT[j][c] = q_j · C_j[c]
  *     (queries × m × kSub doubles, built driver-side from the model —
  *     parameters, not data) is broadcast; approximate
  *     dot(q, v) ≈ Σ_j LUT[j][code_j] is a pure table lookup per
  *     corpus row — the scan never touches float vectors;
  *  4. exact re-rank: the ADC top-`rerank` per query fetch their true
  *     vectors (candidates-then-fetch, as everywhere else in this
  *     repo) and exact cosine decides the final top-k — the standard
  *     recall repair for quantization error.
  *
  * Determinism: seeded k-means (no RNG), fixed iteration counts,
  * rounded-sim + id tiebreaks — reproducible across sessions, so the
  * driver checks a per-query recall floor exactly like IVF
  * (`vec_knn_pq_recall`).
  */
object Pq {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Σ_j lut[j][code[j]] — the ADC hot loop as a codegen expression
    * ([[graft.etl.expressions.PqAdc]]). Runs per (corpus row × query);
    * the `aggregate(zip_with(...))` column form it replaces is two
    * interpreted higher-order functions in exactly the loop PQ exists
    * to make cheap. Bit-equal to that form (sequential ascending fold;
    * asserted in PqSpec). */
  private[ops] def adcDot(code: Column, lut: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.PqAdc(
        org.apache.spark.sql.graft.Bridge.expression(code),
        org.apache.spark.sql.graft.Bridge.expression(lut)))

  /** The interpreted higher-order form of [[adcDot]] — kept ONLY as the
    * bit-equality witness for PqSpec; never used in an operator path. */
  private[ops] def adcDotInterpreted(code: Column, lut: Column): Column =
    aggregate(
      zip_with(code, lut, (c, l) => element_at(l, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** Per-subspace codebooks: m entries of kSub × subDim.
    *
    * All m subspaces train FUSED (r5): the per-subspace [[Ivf.train]]
    * loop this replaces ran m × (1 + iters) separate jobs — 48 corpus
    * scans at the defaults, which dominated the benched PQ runtime
    * (scheduling overhead locally; real re-scans at scale). Here the
    * whole training is 1 + iters jobs regardless of m:
    *  - seeds: ONE pass — the min-id vector per id-hash bucket (the
    *    exact rows each per-subspace Ivf.train call selected, since
    *    bucketing is on ids, not values), sliced into m seed books;
    *  - each Lloyd iteration: assignment for ALL subspaces at once via
    *    the codegen [[graft.etl.expressions.PqEncode]] (argmin per
    *    subspace, ties to lowest index — Ivf.assign's ordering), then
    *    one map-side-combined groupBy (j, cluster, coord) avg; clusters
    *    with no members keep their previous centroid, as in Ivf.
    * Deterministic (no RNG, fixed iterations) like everything else in
    * the ANN family. */
  def train(emb: DataFrame, m: Int, kSub: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    val dim = Similarity.inferDim(emb, vecCol)
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val subDim = dim / m
    val v = asDouble(col(vecCol))
    // min-struct per bucket instead of a bucket-window row_number:
    // partial aggregation, identical selected rows (see Ivf.train)
    val seedRows = emb
      .select(col(idCol).as("sid"), v.as("ve"))
      .withColumn("b", pmod(hash(col("sid")), lit(kSub)))
      .groupBy("b").agg(min(struct(col("sid"), col("ve"))).as("_s"))
      .orderBy("b").select("_s.ve").collect()
      .map(_.getSeq[Double](0).toArray)
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => seedRows.map(_.slice(j * subDim, (j + 1) * subDim)))
    for (_ <- 1 to iters) {
      val codeCol = org.apache.spark.sql.graft.Bridge.column(
        graft.etl.expressions.PqEncode(
          org.apache.spark.sql.graft.Bridge.expression(v), codebooks))
      val means = emb
        .select(posexplode(codeCol).as(Seq("j", "c")), v.as("ve"))
        .select(col("j"), col("c"), posexplode(
          slice(col("ve"), col("j") * subDim + 1, lit(subDim))).as(Seq("t", "x")))
        .groupBy("j", "c", "t").agg(avg("x").as("mu"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      codebooks = next
    }
    codebooks
  }

  /** (id, code: array<int>, vnorm) — the compressed corpus row. One
    * codegen expression ([[graft.etl.expressions.PqEncode]]) computes
    * all m argmins per row: the plan-time-expanded argmin form breaks
    * Janino already at 16 × 32 codebooks (the LshSignBands wall). */
  def encode(emb: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    val codeCol = org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.PqEncode(
        org.apache.spark.sql.graft.Bridge.expression(v), codebooks))
    emb.select(col(idCol), codeCol.as("code"),
      Similarity.norm(v).as("vnorm"))
  }


  /** Query vectors collected to the driver — tiny by contract (same
    * rationale as the broadcast side of [[Similarity.bruteForceKnn]]);
    * everything derived from them (LUTs, probe lists) is model-sized. */
  private def collectQueries(emb: DataFrame, queryPred: Column,
      idCol: String, vecCol: String): Array[(Long, Array[Double])] =
    emb.filter(queryPred)
      .select(col(idCol), asDouble(col(vecCol))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** LUT[j][c] = q_j . C_j[c] for one query against the codebooks. */
  private[ops] def lutFor(qv: Array[Double],
      codebooks: Array[Array[Array[Double]]]): Seq[Seq[Double]] = {
    val subDim = codebooks.head.head.length
    codebooks.indices.map { j =>
      val sub = qv.slice(j * subDim, (j + 1) * subDim)
      codebooks(j).map(c =>
        c.zip(sub).map { case (a, b) => a * b }.sum).toSeq
    }
  }

  /** Exact cosine re-rank of an ADC shortlist (candidates-then-fetch):
    * shared tail of [[knn]] and [[ivfPqKnn]], so tie-breaks and
    * rounding stay identical across the two ANN paths. */
  private def exactRerank(shortlist: DataFrame, emb: DataFrame,
      queries: Array[(Long, Array[Double])], k: Int,
      idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("ce"))
      .withColumn("cn", Similarity.norm(col("ce")))
    val qvecs = queries.map { case (qid, qv) =>
      (qid, qv.toSeq, math.sqrt(qv.map(x => x * x).sum))
    }.toSeq.toDF("qid", "qe", "qn2")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    shortlist
      .join(vecs, "cid")
      .join(broadcast(qvecs), "qid")
      .select(col("qid"), col("cid"),
        round(Similarity.dot(col("qe"), col("ce")) / (col("qn2") * col("cn")), 4)
          .as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Full IVF-PQ (the production ANN architecture, FAISS-style): a
    * coarse quantizer partitions the corpus into [[Ivf]] cells and PQ
    * codebooks are trained on RESIDUALS (v − centroid[cell]) — far less
    * variance than raw vectors, so the same codebook budget quantizes
    * finer — while search probes only `nprobe` cells and ADC-scans
    * their members' codes.
    *
    * The ADC decomposition that makes probing cheap:
    * dot(q, v) = dot(q, c_cell) + dot(q, r) ≈ dot(q, c_cell) +
    * Σ_j LUT[j][code_j], where the LUT is built from q against the
    * GLOBAL residual codebooks (cell-independent — one LUT per query)
    * and dot(q, c_cell) is one scalar per (query, probed cell). Scan
    * cost: corpus × nprobe / C rows of m codes each, never a float
    * vector until the exact top-`rerank` re-rank. */
  /** Residual-annotated corpus: (input columns, cell, res) where
    * res = v − centroid[cell] via the codegen
    * [[graft.etl.expressions.CentroidResidual]]. PERSISTED: codebook
    * training re-reads it per iteration, encode scans it again, and
    * Spark's CacheManager matches the identical plan subtree from the
    * with-model encode path — released by `Dedup.releaseCaches()`
    * like every operator-internal cache. */
  private def withResiduals(emb: DataFrame,
      centroids: Array[Array[Double]],
      idCol: String, vecCol: String): DataFrame = {
    val residualCol = org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.CentroidResidual(
        org.apache.spark.sql.graft.Bridge.expression(asDouble(col(vecCol))),
        org.apache.spark.sql.graft.Bridge.expression(col("cell")),
        centroids))
    Dedup.persistTracked(
      Ivf.assign(emb, centroids, idCol, vecCol)
        .withColumn("res", residualCol))
  }

  /** Train the full IVF-PQ model pair: coarse centroids, then residual
    * codebooks on v − centroid[cell]. Persist both via [[AnnModels]]
    * for the train-once lifecycle. */
  def ivfPqTrain(emb: DataFrame, numCentroids: Int = 16,
      m: Int = 16, kSub: Int = 32, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val centroids = Ivf.train(emb, numCentroids, iters, idCol, vecCol)
    val withRes = withResiduals(emb, centroids, idCol, vecCol)
    val codebooks = train(withRes.select(col(idCol), col("res")),
      m, kSub, iters, idCol, "res")
    (centroids, codebooks)
  }

  /** The stored IVF-PQ index rows — (idCol, cell, code, vnorm):
    * assignment + residual PQ codes against FROZEN models, writable
    * next to the [[AnnModels]] parquet and appendable via
    * [[ivfPqAppendToIndex]]. */
  def ivfPqEncodeCorpus(emb: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withRes = withResiduals(emb, centroids, idCol, vecCol)
    encode(withRes.select(col(idCol), col("res"), col("cell"),
        asDouble(col(vecCol)).as("_orig")), codebooks, idCol, "res")
      .join(withRes.select(col(idCol), col("cell"),
        Similarity.norm(asDouble(col(vecCol))).as("_tn")), Seq(idCol))
      .select(col(idCol), col("cell"), col("code"), col("_tn").as("vnorm"))
  }

  /** Daily-ingest append for the full IVF-PQ index: assign + encode
    * ONLY the new vectors against the frozen model pair, append the
    * rows — byte-identical to a full re-encode (both expressions are
    * deterministic), asserted in OpsSpec. */
  def ivfPqAppendToIndex(newVecs: DataFrame,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    ivfPqEncodeCorpus(newVecs, centroids, codebooks, idCol, vecCol)
      .write.mode("append").parquet(indexPath)

  def ivfPqKnn(emb: DataFrame, k: Int, queryPred: Column,
      numCentroids: Int = 16, nprobe: Int = 12,
      m: Int = 16, kSub: Int = 32, rerank: Int = 256, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (centroids, codebooks) =
      ivfPqTrain(emb, numCentroids, m, kSub, iters, idCol, vecCol)
    ivfPqKnnWithModel(emb, k, queryPred, centroids, codebooks, nprobe,
      rerank, idCol, vecCol)
  }

  /** [[ivfPqKnn]] against a PREBUILT model pair — encode + probe +
    * ADC + re-rank, no training scans. */
  def ivfPqKnnWithModel(emb: DataFrame, k: Int, queryPred: Column,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nprobe: Int = 12, rerank: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfPqKnnEncoded(
      ivfPqEncodeCorpus(emb, centroids, codebooks, idCol, vecCol),
      emb, k, queryPred, centroids, codebooks, nprobe, rerank, idCol, vecCol)

  /** [[ivfPqKnnWithModel]] over an ALREADY-ENCODED index (the
    * [[ivfPqEncodeCorpus]] layout, typically read back from parquet):
    * the query session touches no corpus-sized float vectors until
    * the exact re-rank fetch. */
  def ivfPqKnnEncoded(encIndex: DataFrame, emb: DataFrame, k: Int,
      queryPred: Column, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nprobe: Int = 12, rerank: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    val enc = encIndex.select(col(idCol).as("cid"), col("code"),
      col("cell"), col("vnorm"))
    val queries = collectQueries(emb, queryPred, idCol, vecCol)
    // per query: one global-residual-codebook LUT + per-probed-cell
    // scalar q·c — all model-sized driver arithmetic. The LUT frame is
    // broadcast ONCE per query (joined on qid) rather than duplicated
    // into each of its nprobe probe rows.
    val probeRows = queries.flatMap { case (qid, qv) =>
      centroids.zipWithIndex.map { case (c, i) =>
        val d = c.zip(qv).map { case (a, b) => val t = a - b; t * t }.sum
        (d, i)
      }.sortBy(x => (x._1, x._2)).take(nprobe).map { case (_, cell) =>
        val qdotc = centroids(cell).zip(qv).map { case (a, b) => a * b }.sum
        (qid, cell, qdotc)
      }
    }.toSeq
    val probeDf = probeRows.toDF("qid", "cell", "qdotc")
    val lutDf = queries.map { case (qid, qv) =>
      (qid, lutFor(qv, codebooks), math.sqrt(qv.map(x => x * x).sum))
    }.toSeq.toDF("qid", "lut", "qn")
    val adcSim = (col("qdotc") + adcDot(col("code"), col("lut"))) /
      (col("qn") * col("vnorm"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("sim_adc").desc, col("cid").asc)
    val shortlist = enc.join(broadcast(probeDf), "cell")
      .join(broadcast(lutDf), "qid")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adcSim.as("sim_adc"))
      .withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= rerank)
      .select("qid", "cid")
    exactRerank(shortlist, emb, queries, k, idCol, vecCol)
  }

  /** PQ top-k cosine search with ADC scan + exact re-rank.
    *
    * Defaults (m=16 subspaces × 32 codes, rerank 256) measure recall@5
    * = 1.0 vs brute force at sf0.1 — the structureless fixture needs
    * fine codebooks (4-dim subspaces) because true neighbours sit near
    * sim ≈ 0.35, barely above quantization noise; a real clustered
    * corpus runs coarser m/kSub and smaller rerank for the same recall
    * (the same fixture physics as [[Similarity.lshKnn]]'s scaladoc).
    * Compression story at the defaults: 16 byte-sized codes + 1 norm vs
    * 64 float dims ≈ 10× smaller scan footprint. */
  def knn(emb: DataFrame, k: Int, queryPred: Column,
      m: Int = 16, kSub: Int = 32, rerank: Int = 256, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the m-subspace training loop re-reads the corpus m x (1 + iters)
    // times — persist the narrow (id, vec) projection it slices from
    val base = Dedup.persistTracked(
      emb.select(col(idCol), asDouble(col(vecCol)).as(vecCol)))
    knnWithModel(emb, k, queryPred,
      train(base, m, kSub, iters, idCol, vecCol), rerank, idCol, vecCol)
  }

  /** [[knn]] against a PREBUILT codebook model (trained earlier, or
    * loaded via [[AnnModels.loadCodebooks]]) — the query-session half
    * of the train-once lifecycle: no training scans, just encode +
    * ADC + re-rank. */
  def knnWithModel(emb: DataFrame, k: Int, queryPred: Column,
      codebooks: Array[Array[Array[Double]]], rerank: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = emb.select(col(idCol), asDouble(col(vecCol)).as(vecCol))
    knnEncoded(encode(base, codebooks, idCol, vecCol), emb, k, queryPred,
      codebooks, rerank, idCol, vecCol)
  }

  /** Daily-ingest append: PQ-encode NEW vectors against the FROZEN
    * codebooks and append the (id, code, vnorm) rows to the stored
    * index — no retrain, no rewrite of existing rows; encodings are
    * byte-identical to a full re-encode under the same model
    * ([[graft.etl.expressions.PqEncode]] is deterministic), asserted
    * in OpsSpec. Searches over the loaded index ([[knnEncoded]]) see
    * the union. */
  def appendToIndex(newVecs: DataFrame,
      codebooks: Array[Array[Array[Double]]], indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    encode(newVecs.select(col(idCol), asDouble(col(vecCol)).as(vecCol)),
        codebooks, idCol, vecCol)
      .write.mode("append").parquet(indexPath)

  /** [[knnWithModel]] over an ALREADY-ENCODED corpus (the [[encode]]
    * layout — (idCol, code, vnorm) — typically read back from
    * parquet): the query session encodes nothing corpus-sized. `emb`
    * still supplies the query vectors and the exact re-rank's float
    * vectors (the raw corpus table — candidates-then-fetch). */
  def knnEncoded(enc: DataFrame, emb: DataFrame, k: Int, queryPred: Column,
      codebooks: Array[Array[Array[Double]]], rerank: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    val encSel = enc.select(col(idCol).as("cid"), col("code"), col("vnorm"))
    val queries = collectQueries(emb, queryPred, idCol, vecCol)
    val qdf = queries.map { case (qid, qv) =>
      (qid, lutFor(qv, codebooks), math.sqrt(qv.map(x => x * x).sum))
    }.toSeq.toDF("qid", "lut", "qn")
    // ADC: pure LUT lookups per corpus row — no vector access
    val adcSim = adcDot(col("code"), col("lut")) / (col("qn") * col("vnorm"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("sim_adc").desc, col("cid").asc)
    val shortlist = encSel.crossJoin(broadcast(qdf))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), adcSim.as("sim_adc"))
      .withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= rerank)
      .select("qid", "cid")
    exactRerank(shortlist, emb, queries, k, idCol, vecCol)
  }
}
