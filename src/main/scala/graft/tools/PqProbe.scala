package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level A/B probe for the vec_knn_pq_recall drift (r15,
  * verdict #1): times PQ train / encode+ADC+re-rank / brute-force /
  * recall-join in isolation on the bench session settings, printing
  * one line per stage. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PqProbe"
  * A diagnostic main, not a driver row — kept so the next drift on
  * this line starts from attribution instead of re-deriving the
  * harness. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Dedup, Pq, Similarity}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pred = col("vec_id") % 50 === 0

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqprobe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save(); () }

    (1 to (if (args.isEmpty) 3 else args(0).toInt)).foreach { pass =>
      println(s"[pqprobe] --- pass $pass ---")
      val base = Dedup.persistTracked(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")))
      val model = time("train")(
        Pq.train(base, m = 16, kSub = 32, iters = 2))
      time("encode+adc+rerank")(
        force(Pq.knnWithModel(emb, 5, pred, model)))
      time("brute")(
        force(Similarity.bruteForceKnn(emb, k = 5, queryPred = pred)))
      time("full recall row")(
        force(graft.SparkEntry.queries("vec_knn_pq_recall")(spark, sfDir)))
      Dedup.releaseCaches(blocking = true)
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
