package graft.ops

import org.apache.spark.sql.functions.col
import graft.etl.SparkSpec

/** PageRank contracts: exact agreement with an in-memory integer
  * reference, symmetry, hub dominance, partitioning independence. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the op's exact fixed-point arithmetic. */
  private def referenceRanks(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = out.size.toLong
    val base = (15L * Graph.Scale) / (100L * n)
    var pr = out.keys.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / out(s) }.sum
      }
      pr = pr.keys.map(v => v -> (base + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    pr
  }

  private def undirected(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("pageRank agrees exactly with the integer reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.tabulate(60) { _ =>
      val a = rnd.nextInt(25).toLong
      var b = rnd.nextInt(25).toLong
      while (b == a) b = rnd.nextInt(25).toLong
      (a, b)
    }
    val edges = undirected(pairs: _*)
    val got = Graph.pageRankTopK(edges.toDF("src", "dst"), 3, 100)
      .as[(Long, Long)].collect().toSeq
    val want = referenceRanks(edges, 3).toSeq
      .sortBy { case (node, pr) => (-pr, node) }
    assert(got == want)
    Dedup.releaseCaches()
  }

  test("symmetric leaves tie; the hub dominates; mass is conserved") {
    val edges = undirected((1L, 2L), (2L, 3L)) // chain: 2 is the hub
    val r = Graph.pageRankTopK(edges.toDF("src", "dst"), 3, 10)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == r(3L))
    assert(r(2L) > r(1L))
    // each DIV floors away < 1 unit per node per step — mass stays
    // within a few hundred units of Scale
    assert(r.values.sum <= Graph.Scale &&
      r.values.sum >= Graph.Scale - 1000L)
    Dedup.releaseCaches()
  }

  test("personalized: exact integer reference; nothing beyond the hop horizon") {
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Set(1L)
    val got = Graph.personalizedPageRankTopK(edges.toDF("src", "dst"),
        seedPred = col("src") === 1L, iterations = 3, k = 10)
      .as[(Long, Long)].collect().toMap
    // driver replica of the seeded arithmetic
    val e = edges.distinct
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nS = seeds.size.toLong
    val base = (15L * Graph.Scale) / (100L * nS)
    var pr = out.keys
      .map(v => v -> (if (seeds(v)) Graph.Scale / nS else 0L)).toMap
    for (_ <- 1 to 3) {
      val c = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / out(s) }.sum
      }
      pr = pr.keys.map(v => v ->
        ((if (seeds(v)) base else 0L) + 85L * c.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(got == pr)
    assert(got(5L) == 0L, "node 5 is 4 hops out — nothing arrives in 3")
    Dedup.releaseCaches()
  }

  test("ranks are partitioning-independent") {
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRankTopK(df.repartition(1), 3, 10).collect().toSeq
    val b = Graph.pageRankTopK(df.repartition(7), 3, 10).collect().toSeq
    assert(a == b)
    Dedup.releaseCaches()
  }
}
