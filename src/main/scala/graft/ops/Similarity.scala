package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline (and is exactly
  * what the DuckDB oracle recomputes); LSH-bucketed ANN is the scale
  * path: at 100 TB the query side is broadcast, the candidate side is
  * pruned by sign-pattern buckets before any dot product is computed,
  * and both stages stay equi-joins (no cross join ever materializes
  * n² rows).
  */
object Similarity {

  /** Sequential tight-loop dot product (custom codegen expression —
    * the higher-order `aggregate(zip_with(...))` form is interpreted
    * and runs once per candidate pair). Summation order matches the
    * oracle's `list_sum`, so results are bit-reproducible across
    * engines. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.ArrayDot(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * candidates. `queryPred` selects the query subset (at scale the
    * query side is small and broadcast — Catalyst picks
    * BroadcastNestedLoopJoin for the pruned cross join).
    *
    * Ranking uses the ROUNDED similarity (4 dp) with id tiebreak, so
    * the top-k set is deterministic and engine-portable. */
  def bruteForceKnn(emb: DataFrame, k: Int, queryPred: Column,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per-vector norms hoisted to columns: O(n) norm computations
    // instead of one per candidate pair
    val q = emb.filter(queryPred)
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qe"))
      .withColumn("qn", norm(col("qe")))
    val c = emb.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("ce"))
      .withColumn("cn", norm(col("ce")))
    val sims = q.hint("broadcast").crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 4).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Hard-negative mining: for each query vector, the k most-similar
    * candidates whose LABEL differs from the query's — the negatives a
    * contrastive / DPO trainer wants (similar embedding, different
    * class). Same broadcast-query shape as [[bruteForceKnn]]; the
    * label inequality prunes before any dot product runs. Ranking on
    * rounded sim (4 dp) + cid, so the mined set is deterministic and
    * engine-portable. At 10^9+ candidates, swap the candidate scan for
    * an [[lshKnn]]-style bucket probe with label-oversampling. */
  def hardNegatives(emb: DataFrame, k: Int, queryPred: Column,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(queryPred)
      .select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qe"),
        col(labelCol).as("qlabel"))
      .withColumn("qn", norm(col("qe")))
    val c = emb.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("ce"),
        col(labelCol).as("clabel"))
      .withColumn("cn", norm(col("ce")))
    val sims = q.hint("broadcast").crossJoin(c)
      .filter(col("qlabel") =!= col("clabel"))
      .select(col("qid"), col("qlabel"), col("cid"), col("clabel"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 4).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** [[hardNegatives]]' scale path: the [[lshKnn]] bucket-probe
    * pipeline with the label filter applied at the CANDIDATE stage —
    * same-label pairs never reach a dot product, and the top-k ranks
    * over the surviving different-label candidates directly (no
    * oversampling heuristics: filtering precedes ranking). Fully
    * deterministic, so the oracle replays buckets, probes, label
    * filter and ranking end-to-end. */
  def hardNegativesLsh(emb: DataFrame, k: Int, queryPred: Column,
      numPlanes: Int = 5, probeHamming: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numPlanes >= 1 && numPlanes <= 24,
      s"numPlanes=$numPlanes out of range")
    val base = emb.select(col(idCol), asDouble(col(vecCol)).as("ve"),
      col(labelCol).as("lbl"), lshBucket(col(vecCol), numPlanes).as("bucket"))
    val cands = base.select(col(idCol).as("cid"), col("ve").as("ce"),
      col("lbl").as("clabel"), col("bucket")).withColumn("cn", norm(col("ce")))
    val masks = (0 until (1 << numPlanes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val q = base.filter(queryPred)
      .withColumn("qn", norm(col("ve")))
      .select(col(idCol).as("qid"), col("ve").as("qe"), col("qn"),
        col("lbl").as("qlabel"),
        explode(array(masks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("qbucket"))
    val sims = q.hint("broadcast").join(cands, col("qbucket") === col("bucket"))
      .filter(col("qid") =!= col("cid") && col("qlabel") =!= col("clabel"))
      .select(col("qid"), col("qlabel"), col("cid"), col("clabel"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 4).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** All pairs with cosine >= threshold (embedding near-dup), EXACT:
    * upper-triangle join. This is the oracle-checkable baseline — fine
    * to tens of thousands of vectors; beyond that use
    * [[cosinePairsLsh]]. */
  def cosinePairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("da"), asDouble(col(vecCol)).as("ea"))
      .withColumn("na", norm(col("ea")))
    val b = emb.select(col(idCol).as("db"), asDouble(col(vecCol)).as("eb"))
      .withColumn("nb", norm(col("eb")))
    a.crossJoin(b).filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding dimensionality taken from the data (first row) — one
    * tiny first-partition job at plan-build time. Ragged inputs are a
    * data error: vectors shorter than the inferred dim fail fast under
    * ANSI `element_at`, longer ones would be silently truncated. */
  def inferDim(emb: DataFrame, vecCol: String = "embedding"): Int = {
    val d = emb.select(size(col(vecCol))).head().getInt(0)
    require(d > 0, s"$vecCol: first vector is empty — cannot infer dim")
    d
  }

  /** Scale path for embedding near-dup: banded sign-LSH (AND-OR
    * amplification — the same construction as the MinHash banding in
    * [[Dedup.minhashLshPairs]], over hyperplane sign bits): `bands`
    * bands of `rowsPerBand` planes each; a pair is a candidate iff some
    * band's sign pattern matches exactly, then candidates get exact
    * cosine verification — an equi-join on (band, pattern) instead of an
    * n² cross join, and never a false positive.
    *
    * Recall for a pair at similarity s: a plane splits it w.p.
    * p = arccos(s)/π, a band matches w.p. (1-p)^rowsPerBand, and the
    * pair is missed w.p. (1-(1-p)^rowsPerBand)^bands. Defaults 32×4
    * give ≥99.5% recall even at s=0.4 (p≈0.37) and ~1-1e-13 at s=0.9.
    * At scale, raise rowsPerBand with corpus size (bucket population ~
    * n/2^rowsPerBand per band) and raise bands to hold recall.
    *
    * Parameter physics (why selectivity is threshold-bound): a RANDOM
    * pair collides in some band w.p. 1-(1-2^-rowsPerBand)^bands — with
    * recall-preserving parameters for a LOW threshold (0.4 → 48×4,
    * ~95% collision) banding cannot prune, and this operator honestly
    * degrades to verified all-pairs; that is intrinsic to low-threshold
    * similarity (the output itself can be Θ(n²)), not to the plan. At
    * production near-dup thresholds (≥0.9) the same operator with e.g.
    * bands=64, rowsPerBand=16 keeps 99.6% recall while pruning 99.95%
    * of random pairs — choose rowsPerBand by threshold
    * (≈ log(n)/log(1/(1-arccos(s)/π)) heuristics), bands for recall.
    *
    * Plan shape (the 100 TB shape): the band join ships only 8-byte
    * ids + band structs — never the embeddings; candidates are
    * distinct'd and vectors fetched for survivors (measured 2× faster
    * than carrying vectors through the band join even at bench scale,
    * where the wide-row join materialization dominates). */
  /** Size-adaptive banding: pick (bands, rowsPerBand) from the corpus
    * size and the threshold instead of hard-coding scale-tuned values.
    *
    * rowsPerBand ≈ log2(n): a random pair agrees with a plane w.p. 1/2,
    * so it collides in one band w.p. 2^-rowsPerBand — at log2(n) bits
    * the expected candidate volume is O(n·bands) (linear), independent
    * of corpus growth. bands then holds the per-true-pair miss bound:
    * a pair AT the threshold agrees per plane w.p. 1-arccos(s)/π, so
    * miss = (1-(agree^rpb))^bands <= missBound solves for bands.
    *
    * The r3 bench ran the fixed 64×16 production banding on a 3k-vector
    * fixture — 1,024 plane dots per vector, ~2× slower than the exact
    * crossJoin it exists to beat. Adaptive params (32×12 at n=3k,
    * s=0.9) cut plane work ~3× while KEEPING linear candidate volume,
    * and grow with n exactly as the scaladoc heuristic prescribes, so
    * the same call is right at 3k and at 10^9 vectors. */
  def adaptiveBandParams(n: Long, threshold: Double,
      missBound: Double = 5e-3, maxBands: Int = 512): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold=$threshold")
    val agree = 1.0 - math.acos(threshold) / math.Pi
    def bandsFor(rpb: Int): Int = {
      val bandMatch = math.pow(agree, rpb)
      math.max(1, math.ceil(math.log(missBound) / math.log1p(-bandMatch)).toInt)
    }
    // start at the pruning-optimal log2(n) bits; at LOW thresholds the
    // recall-holding band count explodes (agree^rpb → 0), so walk rpb
    // down until the plane budget is feasible — each step doubles the
    // random-collision rate, degrading smoothly toward the verified
    // all-pairs behaviour that low-threshold similarity intrinsically
    // is (see [[cosinePairsLsh]] parameter physics)
    var rpb = math.max(2, math.min(31,
      math.ceil(math.log(math.max(n, 2).toDouble) / math.log(2.0)).toInt))
    while (rpb > 2 && bandsFor(rpb) > maxBands) rpb -= 1
    (math.min(bandsFor(rpb), maxBands), rpb)
  }

  /** [[cosinePairsLsh]] with [[adaptiveBandParams]] banding. Without
    * `numRows`, costs one zero-column count job at plan-build time —
    * row-group-metadata work on a parquet scan, but a REAL pass on a
    * composed input (union, transform, join), so composed pipelines
    * should pass the corpus size (or any estimate within ~2×: only
    * log2(n) feeds the banding, so precision is irrelevant). */
  def cosinePairsLshAuto(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numRows: Option[Long] = None): DataFrame = {
    val (bands, rpb) =
      adaptiveBandParams(numRows.getOrElse(emb.count()), threshold)
    cosinePairsLsh(emb, threshold, bands, rpb, idCol, vecCol)
  }

  def cosinePairsLsh(emb: DataFrame, threshold: Double,
      bands: Int = 32, rowsPerBand: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // all band sign-patterns in ONE codegen'd tight loop (the
    // plan-time-expanded column form is a 100k-node tree — see
    // LshSignBands scaladoc); dim comes from each vector at runtime
    val base = emb.select(col(idCol).as("sid"),
        asDouble(col(vecCol)).as("ve"))
      .withColumn("vn", norm(col("ve")))
    val signBands = org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.LshSignBands(
        org.apache.spark.sql.graft.Bridge.expression(col("ve")),
        bands * rowsPerBand, rowsPerBand))
    // band key packed into one long (band << 32 | pattern): cheaper to
    // hash/compare/shuffle than a two-field struct
    val bucketed = base.select(col("sid"),
        posexplode(signBands).as(Seq("band", "bh")))
      .select(col("sid"), (shiftleft(col("band").cast("long"), 32)
        .bitwiseOR(col("bh").cast("long"))).as("bk"))
    val cand = bucketed.as("l").join(bucketed.as("r"),
        col("l.bk") === col("r.bk") && col("l.sid") < col("r.sid"))
      .select(col("l.sid").as("da"), col("r.sid").as("db"))
      .distinct()
    val vecs = base.select(col("sid").as("vid"), col("ve"), col("vn"))
    cand
      .join(vecs.select(col("vid").as("da"), col("ve").as("ea"),
        col("vn").as("na")), "da")
      .join(vecs.select(col("vid").as("db"), col("ve").as("eb"),
        col("vn").as("nb")), "db")
      .select(col("da"), col("db"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Sign-pattern LSH bucket id: the packed sign bits of `numPlanes`
    * hyperplane projections, computed in ONE codegen'd tight loop
    * ([[graft.etl.expressions.LshSignBands]] with a single band — the
    * plan-time-expanded per-plane column form was a numPlanes×dim-node
    * Catalyst tree and dominated the old lshKnn's runtime). Dim comes
    * from each vector at runtime; the splitmix64 plane family is shared
    * with [[cosinePairsLsh]] and is deterministic across sessions AND
    * engines (the vec_knn_lsh DuckDB oracle replays it from literal
    * coefficients). */
  def lshBucket(vec: Column, numPlanes: Int): Column =
    element_at(org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.LshSignBands(
        org.apache.spark.sql.graft.Bridge.expression(asDouble(vec)),
        numPlanes, numPlanes)), 1)

  /** ANN via sign-LSH with multi-probe: each query probes its own
    * bucket plus every bucket within Hamming distance `probeHamming` of
    * it (bit-flip masks computed at plan time). Work per query is
    * bounded by the probed buckets' population; candidate generation is
    * an equi-join on the bucket id with the (tiny) exploded query side
    * broadcast — the corpus is never shuffled and never fully scanned
    * per query.
    *
    * No dedup step is needed: for a single table, candidate cid falls
    * in EXACTLY ONE probed bucket of qid (the mask is forced to
    * bucket(q) XOR bucket(c)), so the probe join emits each (qid, cid)
    * at most once — the plan is broadcast-join → dot → one top-k window
    * (rank-limit pushdown keeps the shuffle at ~k rows per partition
    * per query).
    *
    * Parameter physics: recall@k is bounded by P[true neighbour within
    * Hamming `probeHamming` of the query's pattern], which depends on
    * the neighbour similarity s (flip prob per plane = arccos(s)/π).
    * On clustered corpora (s ≥ 0.8) a few probes at high numPlanes give
    * high recall over a tiny corpus fraction. On a structureless corpus
    * whose true neighbours sit near s ≈ 0.35 — the synthetic fixture —
    * ANY sublinear method must trade recall for coverage (measured:
    * every recall-0.9 configuration scans ≥ 80% of the corpus, and no
    * probing scheme, Hamming-ball or query-directed, does better,
    * because the data carries no structure to exploit).
    *
    * Amortization bound worth doing the arithmetic on: the bucket scan
    * costs numPlanes×dim multiplies per corpus row; pruning saves
    * (1-scannedFrac)×nQueries×dim — so LSH only nets a compute win when
    * numPlanes < nQueries×(1-scannedFrac). With the fixture's 40
    * queries at 81% scan that bound is ~7 planes; real ANN workloads
    * (thousands of queries per batch, clustered corpora pushing
    * scannedFrac toward zero) sit far inside it. The defaults (5, 3)
    * hold measured recall@5 0.96/0.88/0.90 at sf0.001/0.01/0.1 while
    * staying compute-positive. At scale, size numPlanes so bucket
    * population ≈ 1k (2^numPlanes ≈ corpus/1k) and probeHamming for the
    * recall the corpus' similarity profile needs. */
  def lshKnn(emb: DataFrame, k: Int, queryPred: Column,
      numPlanes: Int = 5, probeHamming: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numPlanes >= 1 && numPlanes <= 24,
      s"numPlanes=$numPlanes out of range: the probe-mask enumeration is " +
        "2^numPlanes driver-side literals")
    val base = emb.select(col(idCol), asDouble(col(vecCol)).as("ve"),
      lshBucket(col(vecCol), numPlanes).as("bucket"))
    val cands = base.select(col(idCol).as("cid"), col("ve").as("ce"),
      col("bucket")).withColumn("cn", norm(col("ce")))
    // all xor masks with <= probeHamming bits set
    val masks = (0 until (1 << numPlanes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val q = base.filter(queryPred)
      .withColumn("qn", norm(col("ve")))
      .select(col(idCol).as("qid"), col("ve").as("qe"), col("qn"),
        explode(array(masks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("qbucket"))
    val sims = q.hint("broadcast").join(cands, col("qbucket") === col("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 4).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** SemDeDup-style semantic near-dup (Abbas et al. 2023,
    * arXiv:2303.09540): candidate pairs are blocked by k-means CLUSTER
    * instead of sign-LSH bands — the data-adaptive blocking that
    * motivated SemDeDup (centroids follow the embedding density, so
    * cells stay balanced where random-hyperplane buckets skew), with
    * exact cosine verification inside each cell (never a false
    * positive, like every candidate-verify op in this repo).
    *
    * Deviation from the published form, documented: each vector is
    * blocked into its `probes` nearest cells (multi-cell assignment),
    * not just its argmin cell — pairs straddling a cell boundary are
    * the published algorithm's accepted miss class, and probing 2
    * cells shrinks it the same way IVF's nprobe > 1 does for search.
    * A pair is a candidate iff the two vectors SHARE any of their
    * probed cells.
    *
    * Scale shape: one tiny trained model (deterministic
    * [[Ivf.train]] — no RNG, reproducible across sessions), one
    * equi-join on the cell id (candidate volume ≈ Σ_cell |cell|²,
    * balanced by k-means; never an n² cross join), duplicate
    * candidates from shared probe cells compacted AFTER the sim
    * filter (the distinct shuffles surviving pairs only, not
    * vectors). numCentroids should grow ~√n with the corpus exactly
    * as for [[Ivf.knn]]. */
  def semDedupPairs(emb: DataFrame, threshold: Double,
      numCentroids: Int = 16, probes: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    val centroids = Ivf.train(emb, numCentroids, idCol = idCol, vecCol = vecCol)
    val assigned = Dedup.persistTracked(
      emb.select(col(idCol), asDouble(col(vecCol)).as("e"))
        .withColumn("n", norm(col("e")))
        .withColumn("cell",
          explode(Ivf.probeCells(col("e"), centroids, probes))))
    val a = assigned.select(col("cell"), col(idCol).as("da"),
      col("e").as("ea"), col("n").as("na"))
    val b = assigned.select(col("cell"), col(idCol).as("db"),
      col("e").as("eb"), col("n").as("nb"))
    a.join(b, Seq("cell")).filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }

  /** Diversity-balanced subsampling: bin the corpus by sign-LSH bucket
    * (similar vectors share buckets) and keep a per-bucket quota ranked
    * by deterministic unit-hash — an embedding-space coverage sample
    * that a uniform draw cannot give (dense regions are capped, sparse
    * regions survive whole). This is the bit-reproducible scale path
    * for cluster-balanced selection: k-means cells ([[Ivf]]) would
    * serve the same role but their float centroids are not replayable
    * across engines, while the splitmix64 plane family is (the
    * vec_knn_lsh oracle precedent).
    *
    * Scale shape: ONE aggregation — bucket count and the
    * [[graft.etl.expressions.BoundedTopK]] quota compute together, so
    * map-side partials cap every hot bucket at `quota` rows per map
    * task before the shuffle; output is ≤ 2^numPlanes·quota rows. */
  def balancedSample(emb: DataFrame, numPlanes: Int, quota: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val base = emb.select(col(idCol),
      lshBucket(col(vecCol), numPlanes).cast("long").as("bucket"))
    val packed = struct(
      struct(Sampling.unitHash(col(idCol)).as("_h"), col(idCol).as("_i"))
        .as("_r"),
      struct(col(idCol)).as("_p"))
    val topk = Bridge.column(
      graft.etl.expressions.BoundedTopK(Bridge.expression(packed), quota)
        .toAggregateExpression())
    base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_bucket"), topk.as("_top"))
      .select(col("bucket"), col("n_bucket"), explode(col("_top")).as("_e"))
      .select(col("bucket"), col("n_bucket"), col(s"_e._p.$idCol"))
  }
}
