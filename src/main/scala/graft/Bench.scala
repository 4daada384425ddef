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
  * untimed warm-up (JVM boot, codegen compile, FS cache), and ALL
  * caches — operator-internal persists included — are dropped between
  * the warm-up and the timed run, so the timed number is the
  * steady-state plan cost, not a cache-hit artifact.
  *
  * A query that throws is recorded as value -1 plus an `errors` entry
  * (never a silently-tiny elapsed time).
  */
object Bench {
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
      graft.ops.Dedup.releaseCaches()
      spark.catalog.clearCache()
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      try force(name) catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: $e")
      }
      dropAllCaches()
      val t0 = System.nanoTime()
      val elapsed =
        try { force(name); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          errors(name) = e.toString.take(500)
          System.err.println(s"[bench] $name FAILED: $e")
          -1.0
        }
      dropAllCaches()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_result.json"), line + "\n")
    spark.stop()
    // after stop() so no executor/shutdown log line can interleave
    println(line)
  }
}
