package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev tool: run one query by name and print a per-Spark-job timing
  * breakdown (job id, wall seconds, stage count, task count, shuffle
  * bytes, first stage's callsite) — the empirical half of guide §1.1
  * for queries whose cost lives in driver-side loops (suffix build,
  * PageRank, GD epochs) where `explain` shows only the final frame.
  *
  * Usage: `scripts/run_main.sh graft.JobProfile <query> [query...]`;
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Runs ONE
  * warm-up, then ONE profiled pass (caches dropped between), so the
  * per-job numbers are the steady-state cold-plan cost.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
      var desc: String = "", var stages: Int = 0, var tasks: Int = 0,
      var shufRead: Long = 0L, var shufWrite: Long = 0L,
      var callsite: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Integer]()
    @volatile var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (capture) {
        val r = JobRec(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        r.stages = e.stageInfos.size
        r.callsite = e.stageInfos.headOption.map(_.details.linesIterator
          .find(l => l.contains("graft")).getOrElse("").trim.take(90))
          .getOrElse("")
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
        jobs.put(e.jobId, r)
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.end = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.get(e.stageId)
        if (j != null && jobs.get(j.intValue()) != null) {
          val r = jobs.get(j.intValue())
          r.tasks += 1
          val m = e.taskMetrics
          if (m != null) {
            r.shufRead += m.shuffleReadMetrics.totalBytesRead
            r.shufWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    })

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    def dropAllCaches(): Unit = {
      graft.ops.Dedup.releaseCaches(blocking = true)
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(250); System.gc()
      spark.sparkContext.parallelize(0 until 2, 2).count(): Unit
    }

    args.foreach { name =>
      try force(name) catch { case e: Throwable =>
        System.err.println(s"[profile] warm-up $name failed: $e") }
      dropAllCaches()
      jobs.clear(); stageToJob.clear()
      capture = true
      val t0 = System.nanoTime()
      try force(name) catch { case e: Throwable =>
        System.err.println(s"[profile] $name FAILED: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      capture = false
      dropAllCaches()
      import scala.jdk.CollectionConverters._
      val rs = jobs.values.asScala.toSeq.sortBy(_.start)
      val totalJob = rs.filter(_.end > 0).map(r => r.end - r.start).sum / 1e3
      println(f"%n=== $name: wall $wall%.2f s, ${rs.size} jobs, " +
        f"sum(job) $totalJob%.2f s, gap ${wall - totalJob}%.2f s ===")
      rs.foreach { r =>
        val dur = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
        println(f"job ${r.id}%4d ${dur}%7.3f s  stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d shufR=${r.shufRead / 1048576}%5d MB " +
          f"shufW=${r.shufWrite / 1048576}%5d MB  ${r.callsite}")
      }
    }
    spark.stop()
  }
}
