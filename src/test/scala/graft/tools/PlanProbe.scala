package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- a) {
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"=== $n: Exchanges=${p.sliding(8).count(_ == "Exchange")} " +
        s"TakeOrdered=${p.contains("TakeOrderedAndProject")} " +
        s"Cartesian=${p.contains("CartesianProduct")} " +
        s"BHJ=${p.sliding(17).count(_ == "BroadcastHashJoin")}")
    }
    spark.stop()
  }
}
