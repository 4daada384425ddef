package graft.tools
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Ad-hoc diagnostic main (test scope, never shipped): phase timings,
  * round count, and top stages for star-contraction clustering. */
object CcDiag {
  def main(a: Array[String]): Unit = {
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = mutable.ArrayBuffer[(String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (for (s <- i.submissionTime; c <- i.completionTime)
            yield c - s).getOrElse(-1L)
          stages += ((i.name.take(60), i.numTasks,
            i.taskMetrics.executorRunTime, wall))
          ()
        }
      })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warm up codegen/FS
    graft.ops.Dedup.connectedComponentsStar(
      graft.ops.Dedup.ngramJaccardPairs(docs, 0.5)).count()
    graft.ops.Dedup.releaseCaches(true)
    stages.clear()
    var t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.ngramJaccardPairs(docs, 0.5)
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    graft.ops.Dedup.releaseCaches(true)
    val pairStages = stages.size
    t0 = System.nanoTime()
    val r = graft.ops.Dedup.connectedComponentsStar(
      graft.ops.Dedup.ngramJaccardPairs(docs, 0.5))
    val n = r.count()
    val tAll = (System.nanoTime() - t0) / 1e9
    println(s"RESULT pairs=$nPairs tPairs=$tPairs rows=$n tAll=$tAll " +
      s"rounds=${graft.ops.Dedup.lastStarRounds} " +
      s"stages(pairs)=$pairStages stages(all)=${stages.size - pairStages}")
    println("ROUND TRACE (round, wallSec, edges): " +
      graft.ops.Dedup.lastStarTrace.mkString(" "))
    println("TOP STAGES (name, tasks, execRunMs, wallMs):")
    stages.drop(pairStages).sortBy(-_._4).take(12).foreach(s => println(s"  $s"))
    graft.ops.Dedup.releaseCaches(true)
    spark.stop()
  }
}
