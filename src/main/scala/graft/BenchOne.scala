package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries by name (same harness discipline
  * as [[Bench]] — noop-forced, warm-up + cold-cache timed runs) without
  * paying for the whole headline suite. `sbt "runMain graft.BenchOne
  * q1 q2 ..."`; SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // nanos-typed events parquet must read as long — session-build
      // flag, same as Verify/Bench (the accessor never sets it)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    def dropAllCaches(): Unit = {
      graft.ops.Dedup.releaseCaches(blocking = true)
      spark.catalog.clearCache()
      // settle phase — see Bench.dropAllCaches
      System.gc()
      Thread.sleep(250)
      System.gc()
      spark.sparkContext.parallelize(0 until 2, 2).count(): Unit
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // spill telemetry (r18, verdict #2): decade receipts must record
    // whether a probe spilled, not assert it — task-metric bytes
    // accumulated across the run, printed per timed run
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled): Unit
            spillDisk.addAndGet(m.diskBytesSpilled): Unit
          }
        }
      })
    args.foreach { name =>
      try force(name) catch { case e: Throwable =>
        System.err.println(s"[benchone] warm-up $name failed: $e")
      }
      dropAllCaches()
      val ts = (1 to runs).map { _ =>
        val gc0 = gcMillis
        val (sm0, sd0) = (spillMem.get(), spillDisk.get())
        val t0 = System.nanoTime()
        force(name)
        val t = (System.nanoTime() - t0) / 1e9
        val gcd = gcMillis - gc0
        // listener bus is async — give it a beat before reading
        Thread.sleep(200)
        val (sm, sd) = (spillMem.get() - sm0, spillDisk.get() - sd0)
        System.err.println(f"[benchone-run] $name t=$t%.3f gcInRun=${gcd}ms" +
          f" spillMem=${sm}B spillDisk=${sd}B")
        dropAllCaches()
        t
      }
      println(f"[benchone] $name: median=${ts.sorted.apply(ts.size / 2)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
