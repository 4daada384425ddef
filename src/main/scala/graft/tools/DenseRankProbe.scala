package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool (r19): isolates [[graft.ops.Ranking.denseRank]]
  * — the per-row engine of every suffix-array doubling round — on a
  * synthetic frame big enough that per-row CPU dominates the job floor
  * (sf0.1's 276 k rows/round cannot resolve a per-row change on this
  * box). Times `withDenseRank` over two long keys on an N-row
  * `range()` frame, noop-forced, cold caches between runs — the same
  * discipline as Bench, minus the suite.
  *
  *   scripts/run_main.sh graft.tools.DenseRankProbe [rows] [runs]
  */
object DenseRankProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ~n/64 distinct (k1, k2) classes, interleaved so the range sort
    // does real comparison work; three payload columns ride along so
    // pass 2's per-row emit carries realistic extra fields. With a
    // third arg "str", k1 becomes a string key — the suffix build's
    // round-0 shape (dense rank of the token column), where the Row
    // path additionally converts UTF8String ⇄ String per row.
    val strKey = args.drop(2).headOption.contains("str")
    def frame = spark.range(n).select(
      (if (strKey) concat(lit("tok_"), (col("id") % 7919L))
       else (col("id") % 7919L)).as("k1"),
      ((col("id") * 31L) % 104729L).as("k2"),
      col("id").as("p1"), (col("id") * 3L).as("p2"),
      (col("id") % 997L).as("p3"))
    def drop(): Unit = {
      graft.ops.Dedup.releaseCaches(blocking = true)
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(250); System.gc()
      spark.sparkContext.parallelize(0 until 2, 2).count(): Unit
    }
    val times = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      graft.ops.Ranking.withDenseRank(frame, Seq("k1", "k2"), "r")
        .write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      drop()
      println(f"run $i: $s%.2f s")
      s
    }
    println(f"denseRank n=$n median=${times.sorted.apply(runs / 2)}%.2f s")
    spark.stop()
  }
}
