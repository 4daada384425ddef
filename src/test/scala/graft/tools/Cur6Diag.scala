package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage/wall diagnostics for tx_curation6 (test scope, like
  * CcDiag): times the full composed query and reports any Spark stage
  * slower than 200 ms — the r7 finding this tool existed for was that
  * the UNCHECKPOINTED composition spent ~10× its stage time in pure
  * driver-side plan canonicalization (deep stage trees referenced
  * multiple times compound near-exponentially; see the
  * checkpointTracked scaladoc in Dedup). */
object Cur6Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lst = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b
        if (ms.exists(_ > 200))
          println(s"[cur6-stage] ${ms.getOrElse(-1L)}ms tasks=${i.numTasks} " +
            i.details.linesIterator.take(1).mkString)
      }
    }
    spark.sparkContext.addSparkListener(lst)
    val t0 = System.nanoTime()
    graft.queries.TextQueries.curation6(spark, dir)
      .write.mode("overwrite").format("noop").save()
    println(f"[cur6] full-query ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    graft.ops.Dedup.releaseCaches()
    spark.stop()
  }
}
