package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Similarity-search queries over `embeddings` (`vec_id`,
  * `embedding: array<float>`, `label`).
  *
  * Every query here is driver-verifiable: the LSH ANN pipeline is
  * deterministic down to the bit (splitmix64 hyperplanes, sequential
  * dot-product summation), so its DuckDB oracle REPLAYS the whole ANN —
  * plane projections, sign buckets, Hamming-ball probing, top-k — from
  * literal plane coefficients embedded in the SQL. IVF centroids are
  * data-derived floats (k-means averages, not bit-reproducible across
  * engines), so its check is a per-query recall floor against the
  * brute-force oracle instead. */
object VectorQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Query selector shared by every kNN form (and their oracles). */
  private val queryPredSql = "vec_id % 50 = 0"

  private def cosineSql(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
       |    / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |       * sqrt(list_sum(list_transform($b, x -> x * x)))), 4)""".stripMargin

  /** Brute-force cosine top-5 for query vectors (vec_id % 50 == 0). */
  def knnBrute(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceKnn(emb(spark, dir), k = 5,
        queryPred = col("vec_id") % 50 === 0)
      .transform(QueryUtil.ordered("qid", "rn"))

  val knnBruteOracle: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE $queryPredSql),
      |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
      |s AS (SELECT qid, cid, ${cosineSql("qe", "ce")} AS sim
      |      FROM q, c WHERE qid <> cid),
      |r AS (SELECT qid, cid, sim,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
      |      FROM s)
      |SELECT qid, cid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  /** Hard negatives: top-5 nearest different-label candidates per
    * query vector — the contrastive-training mining pass. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(emb(spark, dir), k = 5,
        queryPred = col("vec_id") % 50 === 0)
      .transform(QueryUtil.ordered("qid", "rn"))

  val hardNegativesOracle: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe,
      |             label AS qlabel
      |           FROM embeddings WHERE $queryPredSql),
      |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
      |        label AS clabel FROM embeddings),
      |s AS (SELECT qid, qlabel, cid, clabel, ${cosineSql("qe", "ce")} AS sim
      |      FROM q, c WHERE qlabel <> clabel),
      |r AS (SELECT qid, qlabel, cid, clabel, sim,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
      |      FROM s)
      |SELECT qid, qlabel, cid, clabel, sim, rn FROM r WHERE rn <= 5
      |ORDER BY qid, rn""".stripMargin

  /** Hard negatives on the ANN path: bucket-probed candidates with the
    * same-label filter before any dot product; the oracle replays the
    * whole pipeline (planes, probes, label filter, ranking). */
  def hardNegativesLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegativesLsh(emb(spark, dir), k = 5,
        queryPred = col("vec_id") % 50 === 0,
        numPlanes = LshPlanes, probeHamming = LshProbeHamming)
      .transform(QueryUtil.ordered("qid", "rn"))

  lazy val hardNegativesLshOracle: String =
    s"""WITH ${lshAnnCtesImpl(labelAware = true)}
      |SELECT qid, qlabel, cid, clabel, sim, rn FROM ann WHERE rn <= 5
      |ORDER BY qid, rn""".stripMargin

  private def nearDupOracle(threshold: Double): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
      |SELECT a.vec_id AS da, b.vec_id AS db, ${cosineSql("a.e", "b.e")} AS sim
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE ${cosineSql("a.e", "b.e")} >= $threshold
      |ORDER BY da, db""".stripMargin

  /** Embedding-cosine near-dup pairs (sim >= 0.4), EXACT upper-triangle
    * cross join — the declared correctness baseline the LSH twins are
    * judged against (and the bench's crossJoin reference point). */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupPairs(emb(spark, dir), threshold = 0.4)
      .transform(QueryUtil.ordered("da", "db"))

  /** Banded sign-LSH near-dup at the PRODUCTION threshold (0.9) with
    * SIZE-ADAPTIVE banding ([[Similarity.adaptiveBandParams]]):
    * rowsPerBand ≈ log2(n) keeps random-pair candidate volume linear in
    * n at any corpus size, bands holds per-true-pair recall ≥ 99.5%;
    * at 10^9 vectors the same call grows to ~30 bits per band.
    *
    * The raw synthetic corpus has NO pairs at sim >= 0.9 (max
    * off-diagonal sim ≈ 0.62), which made this row's green check
    * vacuous (0 = 0). The corpus is therefore AUGMENTED in-query with
    * deterministic planted near-dups — both engine and oracle apply the
    * identical augmentation, so the hash compare covers real rows:
    *  - `vec_id % 50 == 0` → a copy at id+1,000,000 shifted by +0.05
    *    per coordinate: cosine lands in [0.92, 0.95] on the unit-norm
    *    fixture — INSIDE the 0.9 band, every pair must be found;
    *  - `vec_id % 50 == 25` → a copy at id+2,000,000 shifted by +0.08:
    *    cosine lands in [0.82, 0.90) — decoys straddling the threshold
    *    from BELOW, proving the filter excludes near-misses.
    * The shift arithmetic is double-precision and order-identical in
    * both engines (float→double cast is exact, IEEE add is
    * deterministic), so sims are bit-equal and round identically.
    * `numRows` is passed explicitly: the augmented union frame has no
    * metadata count, and only log2(n) feeds the banding. */
  /** The deterministic planted-near-dup augmentation shared by the
    * 0.9-threshold twins ([[nearDupPairsLsh]], [[semDedup]]): the
    * persisted augmented frame plus the raw-corpus row count (taken
    * from parquet metadata BEFORE the union). `copyDelta` sets how
    * tight the planted must-find copies are: 0.05 → cos ∈ [0.92, 0.95]
    * (wide pairs — stress LSH recall), 0.01 → cos ≥ 0.995 (the
    * SemDeDup operating point — near-identical duplicates). The 0.08
    * decoys straddle the threshold from BELOW in both variants. */
  private def plantedAug(spark: SparkSession, dir: String,
      copyDelta: Double = 0.05): (DataFrame, Long) = {
    val raw = emb(spark, dir)
    val n0 = raw.count() // parquet metadata count (raw scan, no union)
    val base = raw.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    def planted(offset: Long, delta: Double, residue: Int): DataFrame =
      base.filter(col("vec_id") % 50 === residue)
        .select((col("vec_id") + offset).as("vec_id"),
          transform(col("embedding"), x => x + lit(delta)).as("embedding"))
    // persistTracked: the LSH op scans its input three times (signature
    // pass + both sides of the candidate fetch) — cheap re-reads on a
    // parquet scan, but a composed union+transform would recompute; the
    // cache is released by the harness like every operator-internal one
    (Dedup.persistTracked(base
      .unionAll(planted(1000000L, copyDelta, 0))
      .unionAll(planted(2000000L, 0.08, 25))), n0)
  }

  def nearDupPairsLsh(spark: SparkSession, dir: String): DataFrame = {
    val (aug, n0) = plantedAug(spark, dir)
    Similarity.cosinePairsLshAuto(aug, threshold = 0.9,
        numRows = Some(n0 + 2 * (n0 / 50 + 1)))
      .transform(QueryUtil.ordered("da", "db"))
  }

  /** SemDeDup against the exact-pairs oracle at its designed operating
    * point: the planted must-find copies are TIGHT (+0.01 → cos ≥
    * 0.995 — near-identical semantic duplicates, the regime SemDeDup
    * exists for), the +0.08 decoys still straddle the threshold from
    * below. Cluster blocking must recover every copy and the exact
    * verify must exclude every decoy, so a boundary-split miss or a
    * verify slip fails the row loudly. (The 0.05-delta corpus the LSH
    * twin uses is cos ≈ 0.93 ≈ 21° apart — adversarially WIDE for any
    * cluster blocking: with pruning-preserving probes/centroids those
    * pairs legitimately split, which is the published algorithm's
    * accepted miss class, not a bug; banded LSH covers that regime.)
    * See [[graft.ops.Similarity.semDedupPairs]]. */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semDedupPairs(plantedAug(spark, dir, copyDelta = 0.01)._1,
        threshold = 0.9)
      .transform(QueryUtil.ordered("da", "db"))

  /** The oracle twin of [[plantedAug]], parameterized the same way. */
  private def plantedNearDupOracleFor(copyDelta: Double): String =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |v AS (SELECT vec_id, e FROM base
      |      UNION ALL
      |      SELECT vec_id + 1000000, list_transform(e, x -> x + $copyDelta::DOUBLE)
      |      FROM base WHERE vec_id % 50 = 0
      |      UNION ALL
      |      SELECT vec_id + 2000000, list_transform(e, x -> x + 0.08::DOUBLE)
      |      FROM base WHERE vec_id % 50 = 25)
      |SELECT a.vec_id AS da, b.vec_id AS db, ${cosineSql("a.e", "b.e")} AS sim
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE ${cosineSql("a.e", "b.e")} >= 0.9
      |ORDER BY da, db""".stripMargin

  private val plantedNearDupOracle: String = plantedNearDupOracleFor(0.05)

  /** Banded sign-LSH near-dup at a LOW threshold (0.4, 48×4 banding):
    * recall-preserving bands at this threshold collide ~95% of random
    * pairs, so the operator honestly degrades to verified all-pairs
    * (intrinsic to low-threshold similarity — the output itself can be
    * Θ(n²)); registered because the fixture's pair mass lives here, so
    * this is the query that demonstrates LSH recall (deterministic 1.0
    * at sf0.001/0.01/0.1) against the exact-pairs oracle. */
  def nearDupPairsLshLow(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsLsh(emb(spark, dir), threshold = 0.4, bands = 48)
      .transform(QueryUtil.ordered("da", "db"))

  /** End-to-end embedding dedup: exact near-dup pairs at 0.4 →
    * connected components → keep the canonical (min-id) member of each
    * cluster — the embedding twin of the text corpus' `dd_keep`.
    * Oracle: recursive-CTE transitive closure over the exact-pairs
    * SQL. */
  def nearDupKeep(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Dedup.keepCanonical(e,
        Dedup.embeddingNearDupPairs(e, threshold = 0.4), idCol = "vec_id")
      .select("vec_id", "label")
      .transform(QueryUtil.ordered("vec_id"))
  }

  val nearDupKeepOracle: String =
    s"""WITH RECURSIVE v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |p AS (SELECT a.vec_id AS da, b.vec_id AS db
      |      FROM v a JOIN v b ON a.vec_id < b.vec_id
      |      WHERE ${cosineSql("a.e", "b.e")} >= 0.4),
      |edges AS (SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p),
      |reach(n, m) AS (SELECT a, a FROM edges
      |                UNION
      |                SELECT r.n, e2.b FROM reach r JOIN edges e2 ON r.m = e2.a),
      |drops AS (SELECT n FROM reach GROUP BY n HAVING min(m) <> n)
      |SELECT vec_id, label FROM embeddings
      |WHERE vec_id NOT IN (SELECT n FROM drops)
      |ORDER BY vec_id""".stripMargin

  // --- LSH ANN: parameters shared by the engine call and its oracle.
  // (5, 3) is the compute-positive recall-0.9 point on this fixture:
  // bucket signatures cost numPlanes×dim per corpus row while pruning
  // saves (1-scannedFrac)×nQueries×dim, so with 40 queries and the
  // structureless corpus forcing ~81% scan for recall 0.9, more planes
  // than ~5 cost more than they prune (see Similarity.lshKnn). ---
  private val LshPlanes = 5
  private val LshProbeHamming = 3
  // oracle plane table width; >= fixture dim (the engine reads dim from
  // each vector, the SQL literal just needs enough columns)
  private val OracleDim = 64

  private def probeMasks: Seq[Int] =
    (0 until (1 << LshPlanes)).filter(m => Integer.bitCount(m) <= LshProbeHamming)

  /** The common table expressions replaying the sign-LSH ANN in DuckDB:
    * plane coefficients as literals (splitmix64 — identical bits to
    * [[graft.etl.expressions.LshSignBands.planeCoef]]), sequential-sum
    * projections (list_sum matches the ArrayDot loop order; min |proj|
    * on the fixture is ~3e-5, nine orders above any summation-order
    * noise, so signs are engine-stable), packed sign buckets, and the
    * Hamming-<=4 probe mask list. */
  private def lshAnnCtes: String = lshAnnCtesImpl(labelAware = false)

  /** The full sign-LSH replay chain; with `labelAware` the candidate
    * stage also drops same-label pairs and the `ann` relation carries
    * both labels — the hard-negative mining scale path, replayed
    * end-to-end like the plain ANN. */
  private def lshAnnCtesImpl(labelAware: Boolean): String = {
    val planes = (0 until LshPlanes).map { p =>
      val cs = (0 until OracleDim)
        .map(d => graft.etl.expressions.LshSignBands.planeCoef(p, d).toString)
        .mkString("[", ", ", "]")
      s"($p, $cs::DOUBLE[])"
    }.mkString(",\n|    ")
    val masks = probeMasks.map(m => s"($m)").mkString(", ")
    val labelFilter =
      if (labelAware) " AND ql.label <> cl.label" else ""
    val labelJoin =
      if (labelAware)
        """
          |       JOIN embeddings ql ON ql.vec_id = qp.qid
          |       JOIN embeddings cl ON cl.vec_id = cb.vec_id""".stripMargin
      else ""
    val candCols =
      if (labelAware) "qp.qid, ql.label AS qlabel, cb.vec_id AS cid, cl.label AS clabel"
      else "qp.qid, cb.vec_id AS cid"
    val passthrough = if (labelAware) "cand.qlabel, " else ""
    val passthrough2 = if (labelAware) "cand.clabel, " else ""
    val annCols = if (labelAware) "qid, qlabel, cid, clabel, sim" else "qid, cid, sim"
    s"""pl(p, pc) AS (VALUES
      |    $planes),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |proj AS (SELECT v.vec_id, pl.p,
      |    list_sum(list_transform(range(1, len(v.e) + 1), i -> v.e[i] * pl.pc[i])) AS s
      |  FROM v, pl),
      |b AS (SELECT vec_id, CAST(sum(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id),
      |m(mask) AS (VALUES $masks),
      |qp AS (SELECT b.vec_id AS qid, xor(b.bucket, CAST(m.mask AS BIGINT)) AS pb
      |  FROM b, m WHERE $queryPredSql),
      |cand AS (SELECT $candCols
      |  FROM qp JOIN b cb ON cb.bucket = qp.pb$labelJoin
      |  WHERE cb.vec_id <> qp.qid$labelFilter),
      |sims AS (SELECT cand.qid, $passthrough cand.cid, $passthrough2 ${cosineSql("qv.e", "cv.e")} AS sim
      |  FROM cand JOIN v qv ON qv.vec_id = cand.qid
      |            JOIN v cv ON cv.vec_id = cand.cid),
      |ann AS (SELECT $annCols,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
      |  FROM sims)""".stripMargin
  }

  /** Sign-LSH multi-probe ANN top-5 — fully oracle-checked: the
    * pipeline is deterministic, so DuckDB replays it end-to-end (see
    * [[lshAnnCtes]]) and the driver hash-compares the actual ANN rows.
    * Recall@5 vs brute force >= 0.9 on the fixture is asserted in
    * OpsSpec and surfaced per-query by `vec_knn_lsh_recall`. */
  def knnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshKnn(emb(spark, dir), k = 5,
        queryPred = col("vec_id") % 50 === 0,
        numPlanes = LshPlanes, probeHamming = LshProbeHamming)
      .transform(QueryUtil.ordered("qid", "rn"))

  val knnLshOracle: String =
    s"""WITH $lshAnnCtes
      |SELECT qid, cid, sim, rn FROM ann WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  /** Per-query ANN recall surfaced as driver-checkable rows:
    * hits = |LSH top-5 ∩ brute-force top-5| per query, computed
    * in-engine; the oracle recomputes BOTH sides in DuckDB (the ANN via
    * the replayed pipeline, the truth via the brute-force SQL) so the
    * intersection counts hash-match exactly. */
  def knnLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val ann = Similarity.lshKnn(e, k = 5, queryPred = pred,
      numPlanes = LshPlanes, probeHamming = LshProbeHamming)
      .select(col("qid"), col("cid"))
    val brute = Similarity.bruteForceKnn(e, k = 5, queryPred = pred)
      .select(col("qid"), col("cid"))
    val hits = ann.join(brute, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    e.filter(pred).select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"))
      .transform(QueryUtil.ordered("qid"))
  }

  val knnLshRecallOracle: String =
    s"""WITH $lshAnnCtes,
      |qv2 AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
      |        FROM embeddings WHERE $queryPredSql),
      |s2 AS (SELECT qid, cid, ${cosineSql("qe", "ce")} AS sim
      |       FROM qv2, (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings) c
      |       WHERE qid <> cid),
      |brute AS (SELECT qid, cid FROM (
      |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
      |    FROM s2) WHERE rn <= 5),
      |annhits AS (SELECT a.qid AS hq, count(*) AS h
      |  FROM (SELECT qid, cid FROM ann WHERE rn <= 5) a
      |  JOIN brute ON brute.qid = a.qid AND brute.cid = a.cid GROUP BY a.qid)
      |SELECT q.vec_id AS qid, CAST(coalesce(annhits.h, 0) AS BIGINT) AS hits
      |FROM embeddings q LEFT JOIN annhits ON annhits.hq = q.vec_id
      |WHERE q.vec_id % 50 = 0
      |ORDER BY qid""".stripMargin

  /** Driver-verifiable IVF recall floor: emits every query id whose IVF
    * top-5 recovers >= 3 of the true (brute-force) top-5. The oracle is
    * the full query list — so the check FAILS loudly if any query's
    * recall drops below 0.6, turning the former rows-only entry into a
    * real correctness row. (Mean recall >= 0.9 at sf0.1 is asserted in
    * OpsSpec; the per-query floor is what is provable cross-engine.)
    * nprobe 12 of 16 cells: measured mean recall 0.94 / per-query min
    * 0.8 at sf0.01 AND sf0.1 — the near-uniform fixture quantizes
    * poorly (true neighbours sit at sim ≈ 0.35), so a real clustered
    * corpus runs far lower nprobe/C for the same recall. */
  /** Shared recall-floor harness: emit every query id whose ANN top-5
    * recovers >= 3 of the true (brute-force) top-5 — used by the IVF /
    * PQ / IVF-PQ recall queries so the floor and tiebreak contract
    * live in ONE place. The oracle for each is the full query list, so
    * one below-floor query fails the driver check loudly. */
  private def recallFloor(spark: SparkSession, dir: String)(
      ann: DataFrame => DataFrame): DataFrame = {
    val e = emb(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val annPairs = ann(e).select(col("qid"), col("cid"))
    val brute = Similarity.bruteForceKnn(e, k = 5, queryPred = pred)
      .select(col("qid"), col("cid"))
    annPairs.join(brute, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= 3)
      .select(col("qid"))
      .transform(QueryUtil.ordered("qid"))
  }

  def knnIvfRecall(spark: SparkSession, dir: String): DataFrame =
    recallFloor(spark, dir)(e => graft.ops.Ivf.knn(e, k = 5,
      queryPred = col("vec_id") % 50 === 0, numCentroids = 16, nprobe = 12))

  val knnIvfRecallOracle: String =
    s"""SELECT vec_id AS qid FROM embeddings WHERE $queryPredSql ORDER BY qid""".stripMargin

  /** PQ ANN recall floor, same driver contract as [[knnIvfRecall]]:
    * every query whose PQ top-5 recovers >= 3 of the true top-5 — the
    * oracle is the FULL query list, so one bad query fails the check.
    * (Measured recall 1.0 at sf0.01/sf0.1 with the defaults; the ADC
    * scan reads 16 codes + 1 norm per row, never the float vectors.) */
  def knnPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallFloor(spark, dir)(e =>
      graft.ops.Pq.knn(e, k = 5, queryPred = col("vec_id") % 50 === 0))

  val knnPqRecallOracle: String =
    s"""SELECT vec_id AS qid FROM embeddings WHERE $queryPredSql ORDER BY qid""".stripMargin

  /** Full IVF-PQ recall floor (coarse cells + residual PQ + ADC over
    * probed cells only — the FAISS-style production composition).
    * Measured mean 0.94 / min 0.8 at sf0.01 AND sf0.1: bounded by the
    * IVF probe truncation (nprobe 12/16), with residual quantization +
    * deep re-rank recovering everything the probed cells contain. */
  def knnIvfPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallFloor(spark, dir)(e =>
      graft.ops.Pq.ivfPqKnn(e, k = 5, queryPred = col("vec_id") % 50 === 0))

  val knnIvfPqRecallOracle: String =
    s"""SELECT vec_id AS qid FROM embeddings WHERE $queryPredSql ORDER BY qid""".stripMargin

  /** Incremental-append lifecycle, driver-checked: the centroid model
    * trains on the historical 90% only, the remaining 10% is appended
    * to the encoded index with the model FROZEN
    * ([[graft.ops.Ivf.appendToIndex]] semantics — the union built here
    * via encodeCorpus twice is what the parquet append stores, proven
    * byte-equal in OpsSpec), and the search runs over the union index.
    * Same per-query recall floor vs the FULL-corpus brute force as
    * [[knnIvfRecall]]: a lost appended vector or a drifting frozen
    * model drops a query below the floor and fails the row loudly. */
  def knnIvfAppend(spark: SparkSession, dir: String): DataFrame =
    recallFloor(spark, dir) { e =>
      val old = e.filter(col("vec_id") % 10 =!= 0)
      val fresh = e.filter(col("vec_id") % 10 === 0)
      val cents = graft.ops.Ivf.train(old, numCentroids = 16)
      val index = graft.ops.Ivf.encodeCorpus(old, cents)
        .unionByName(graft.ops.Ivf.encodeCorpus(fresh, cents))
      graft.ops.Ivf.knnEncoded(index, k = 5,
        col("vec_id") % 50 === 0, cents, nprobe = 12)
    }

  val knnIvfAppendOracle: String =
    s"""SELECT vec_id AS qid FROM embeddings WHERE $queryPredSql ORDER BY qid""".stripMargin

  /** The [[knnIvfAppend]] lifecycle for the full IVF-PQ composition:
    * both models (coarse centroids + residual codebooks) train on the
    * historical 90%, the rest appends frozen, search runs over the
    * union index with no training or corpus-encoding scans. Same
    * per-query recall floor. */
  def knnIvfPqAppend(spark: SparkSession, dir: String): DataFrame =
    recallFloor(spark, dir) { e =>
      val old = e.filter(col("vec_id") % 10 =!= 0)
      val fresh = e.filter(col("vec_id") % 10 === 0)
      val (cents, books) = graft.ops.Pq.ivfPqTrain(old)
      val index = graft.ops.Pq.ivfPqEncodeCorpus(old, cents, books)
        .unionByName(graft.ops.Pq.ivfPqEncodeCorpus(fresh, cents, books))
      graft.ops.Pq.ivfPqKnnEncoded(index, e, k = 5,
        col("vec_id") % 50 === 0, cents, books)
    }

  val knnIvfPqAppendOracle: String =
    s"""SELECT vec_id AS qid FROM embeddings WHERE $queryPredSql ORDER BY qid""".stripMargin

  // --- diversity-balanced subsampling: 4 planes = 16 buckets; quota 20
  // binds in dense buckets and passes sparse ones whole at every SF ---
  private val BalPlanes = 4
  private val BalQuota = 20

  /** LSH-bucket-balanced embedding subsample — per-bucket quota ranked
    * by the deterministic unit-hash ([[graft.ops.Similarity.balancedSample]]);
    * the oracle replays the planes, the bucket ids, the md5 unit-hash
    * rank and the quota cut end-to-end. */
  def balancedSample(spark: SparkSession, dir: String): DataFrame =
    Similarity.balancedSample(emb(spark, dir), BalPlanes, BalQuota)
      .transform(QueryUtil.ordered("bucket", "vec_id"))

  val balancedSampleOracle: String = {
    val planes = (0 until BalPlanes).map { p =>
      val cs = (0 until OracleDim)
        .map(d => graft.etl.expressions.LshSignBands.planeCoef(p, d).toString)
        .mkString("[", ", ", "]")
      s"($p, $cs::DOUBLE[])"
    }.mkString(",\n|    ")
    s"""WITH pl(p, pc) AS (VALUES
      |    $planes),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |proj AS (SELECT v.vec_id, pl.p,
      |    list_sum(list_transform(range(1, len(v.e) + 1), i -> v.e[i] * pl.pc[i])) AS s
      |  FROM v, pl),
      |b AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id),
      |n AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_bucket
      |  FROM b GROUP BY 1),
      |r AS (SELECT bucket, vec_id,
      |    row_number() OVER (PARTITION BY bucket ORDER BY
      |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT
      |        / 4294967296.0, vec_id) AS rn
      |  FROM b)
      |SELECT r.bucket, n.n_bucket, r.vec_id
      |FROM r JOIN n USING (bucket) WHERE rn <= $BalQuota
      |ORDER BY bucket, vec_id""".stripMargin
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "vec_balanced_sample" -> ((balancedSample _, Some(balancedSampleOracle))),
    "vec_knn_brute" -> ((knnBrute _, Some(knnBruteOracle))),
    "vec_hard_negatives" -> ((hardNegatives _, Some(hardNegativesOracle))),
    "vec_hard_negatives_lsh" ->
      ((hardNegativesLsh _, Some(hardNegativesLshOracle))),
    "vec_near_dup" -> ((nearDupPairs _, Some(nearDupOracle(0.4)))),
    "vec_keep" -> ((nearDupKeep _, Some(nearDupKeepOracle))),
    "vec_near_dup_lsh" -> ((nearDupPairsLsh _, Some(plantedNearDupOracle))),
    "vec_semdedup" -> ((semDedup _, Some(plantedNearDupOracleFor(0.01)))),
    "vec_near_dup_lsh_low" -> ((nearDupPairsLshLow _, Some(nearDupOracle(0.4)))),
    "vec_knn_lsh" -> ((knnLsh _, Some(knnLshOracle))),
    "vec_knn_lsh_recall" -> ((knnLshRecall _, Some(knnLshRecallOracle))),
    "vec_knn_ivf_recall" -> ((knnIvfRecall _, Some(knnIvfRecallOracle))),
    "vec_knn_ivf_append" -> ((knnIvfAppend _, Some(knnIvfAppendOracle))),
    "vec_knn_ivfpq_append" -> ((knnIvfPqAppend _, Some(knnIvfPqAppendOracle))),
    "vec_knn_pq_recall" -> ((knnPqRecall _, Some(knnPqRecallOracle))),
    "vec_knn_ivfpq_recall" -> ((knnIvfPqRecall _, Some(knnIvfPqRecallOracle))))
}
