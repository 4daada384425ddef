package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json). The same
  * line is also written to `bench_result.json` in the working directory
  * so the result survives log-noise on stdout.
  *
  * Results are forced with a `noop`-format write so every column of
  * every operator is fully computed (a bare `count()` would let Catalyst
  * prune the very expressions being measured). Each query gets one
  * untimed warm-up (JVM boot, codegen compile, FS cache) and THREE timed
  * runs; the reported per-query number is the MEDIAN (single-shot
  * timings on a shared box drift ±30% — r2's etl_report "regression"
  * was exactly that), with every raw run kept in the JSON under `runs`
  * so spreads stay auditable. ALL caches — operator-internal persists
  * included — are dropped between runs, so every timed number is the
  * steady-state cold-plan cost, not a cache-hit artifact.
  *
  * A query that throws is recorded as value -1 plus an `errors` entry
  * (never a silently-tiny elapsed time).
  */
object Bench {
  private val TimedRuns = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    def dropAllCaches(): Unit = {
      graft.ops.Dedup.releaseCaches(blocking = true)
      spark.catalog.clearCache()
      // deterministic cleanup point: ContextCleaner frees broadcasts /
      // shuffle files when their driver references are GC'd — without
      // this, a GC lands inside some LATER timed run and its cleanup
      // storm shows up as a 2-3x outlier on an unrelated query
      System.gc()
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val allRuns = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val results = names.map { name =>
      try force(name) catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: $e")
      }
      dropAllCaches()
      val runs = (1 to TimedRuns).map { _ =>
        val t0 = System.nanoTime()
        val r =
          try { force(name); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            if (!errors.contains(name)) errors(name) = e.toString.take(500)
            System.err.println(s"[bench] $name FAILED: $e")
            -1.0
          }
        dropAllCaches()
        r
      }
      allRuns(name) = runs
      val ok = runs.filter(_ >= 0)
      val median =
        if (ok.isEmpty) -1.0
        else ok.sorted.apply(ok.size / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runsJson = allRuns.map { case (k, v) =>
      "\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"errors":$errJson,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_result.json"), line + "\n")
    spark.stop()
    // after stop() so no executor/shutdown log line can interleave
    println(line)
  }
}
