package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Similarity-search queries over `embeddings` (`vec_id`,
  * `embedding: array<float>`, `label`). */
object VectorQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Brute-force cosine top-5 for query vectors (vec_id % 50 == 0). */
  def knnBrute(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceKnn(emb(spark, dir), k = 5,
        queryPred = col("vec_id") % 50 === 0)
      .transform(QueryUtil.ordered("qid", "rn"))

  val knnBruteOracle: String =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
      |s AS (SELECT qid, cid,
      |        round(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i]))
      |          / (sqrt(list_sum(list_transform(qe, x -> x * x)))
      |             * sqrt(list_sum(list_transform(ce, x -> x * x)))), 4) AS sim
      |      FROM q, c WHERE qid <> cid),
      |r AS (SELECT qid, cid, sim,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
      |      FROM s)
      |SELECT qid, cid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  /** Embedding-cosine near-dup pairs (sim >= 0.4). */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupPairs(emb(spark, dir), threshold = 0.4)
      .transform(QueryUtil.ordered("da", "db"))

  val nearDupOracle: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
      |SELECT a.vec_id AS da, b.vec_id AS db,
      |  round(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
      |    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
      |       * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 4) AS sim
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE round(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
      |    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
      |       * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 4) >= 0.4
      |ORDER BY da, db""".stripMargin

  /** Embedding near-dup via banded sign-LSH — the SCALE path (equi-join
    * on band sign-patterns, exact cosine verification of candidates,
    * never a cross join). Deterministic hyperplanes + exact verify make
    * the output reproducible; with 32×4 banding the miss probability
    * per true pair at sim>=0.4 is <0.03% (48 bands) and the fixture
    * recall is exactly 1.0 at sf0.001 and sf0.01 (deterministic planes;
    * asserted >=0.98 vs [[Similarity.cosinePairs]] in OpsSpec), so the
    * exact-pairs SQL doubles as the oracle. */
  def nearDupPairsLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsLsh(emb(spark, dir), threshold = 0.4, bands = 48)
      .transform(QueryUtil.ordered("da", "db"))

  /** LSH-bucketed ANN top-5 — the scale path; engine-internal bucketing,
    * rows-only check (recall vs brute force asserted in SimilaritySpec).
    */
  def knnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshKnn(emb(spark, dir), k = 5,
        queryPred = col("vec_id") % 50 === 0)
      .transform(QueryUtil.ordered("qid", "rn"))

  /** IVF ANN top-5 — the data-adaptive scale path (k-means cells +
    * nprobe search); engine-internal cell assignment, rows-only check
    * (recall vs brute force asserted in OpsSpec). nprobe=8 of 16 cells:
    * the fixture's near-uniform high-d vectors quantize poorly
    * (measured recall 0.94/0.83 at sf0.001/sf0.1) — clustered real
    * embedding corpora separate far better and run lower nprobe/C. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Ivf.knn(emb(spark, dir), k = 5,
        queryPred = col("vec_id") % 50 === 0,
        numCentroids = 16, nprobe = 8)
      .transform(QueryUtil.ordered("qid", "rn"))

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "vec_knn_brute" -> ((knnBrute _, Some(knnBruteOracle))),
    "vec_near_dup" -> ((nearDupPairs _, Some(nearDupOracle))),
    "vec_near_dup_lsh" -> ((nearDupPairsLsh _, Some(nearDupOracle))),
    "vec_knn_lsh" -> ((knnLsh _, None)),
    "vec_knn_ivf" -> ((knnIvf _, None)))
}
