package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for named queries to
  * one file each — the before/after plan evidence the optimization
  * rounds commit under `plans/r{N}/`.
  *
  * Usage: `scripts/run_main.sh graft.tools.ExplainFmt <outDir> <suffix>
  * <query> [query...]`; SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in
  * Bench (same session configuration, so the dumped plan is the one
  * the bench actually executes — AQE initial frame).
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
      graft.ops.Dedup.releaseCaches()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
