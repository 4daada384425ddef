package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage probe for the curation14 LID-artifact conversion. */
object LidProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lidprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 2).foreach { p =>
      println(s"[lidprobe] --- pass $p ---")
      val model = time("lid loadOrBuild")(
        graft.queries.CurationArtifacts.lid(spark, sfDir))
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val scored = graft.ops.TextAnalysis.scoreWithLidModel(
        graft.queries.QueryUtil.spreadById(d), model)
      time("score sweep (count)")(
        scored.filter(col("lang_pred") === "en").count())
      time("full curation14")(
        graft.SparkEntry.queries("tx_curation14")(spark, sfDir)
          .write.mode("overwrite").format("noop").save())
      graft.ops.Dedup.releaseCaches(blocking = true)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
