package graft.ops

import org.apache.spark.sql.functions._
import graft.etl.SparkSpec

/** Histogram-quantile + MAD contracts. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("histogram quantile == percentile() on random multisets") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500) { i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextInt(40).toLong)
    }
    val df = rows.toDF("key", "x")
    val hist = df.groupBy(col("key"), col("x").cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val got = Robust.quantileFromHistogram(hist, q, "key")
        .as[(String, Double)].collect().toMap
      val want = df.groupBy("key")
        .agg(expr(s"percentile(x, $q)").as("p"))
        .as[(String, Double)].collect().toMap
      assert(got == want, s"q=$q: $got vs $want")
    }
  }

  test("median/MAD: odd and even counts, interpolation at .5 grain") {
    // key a: values 1,2,3,4 → med 2.5; devs 1.5,0.5,0.5,1.5 → mad 1.0
    // key b: values 1,1,10 → med 1; devs 0,0,9 → mad 0
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
      ("b", 1), ("b", 1), ("b", 10)).toDF("k", "x")
    val r = Robust.madOutlierStats(df, "k", col("x"))
      .orderBy("k").collect()
    assert(r.map(x => (x.getString(0), x.getDouble(1), x.getDouble(2),
      x.getLong(3), x.getLong(4))).toSeq ==
      Seq(("a", 2.5, 1.0, 4L, 0L), ("b", 1.0, 0.0, 3L, 1L)))
    Dedup.releaseCaches()
  }

  test("planted extreme value is flagged; inliers are not") {
    val df = (Seq.tabulate(99)(i => ("en", 100 + (i % 5))) :+ (("en", 100000)))
      .toDF("k", "x")
    val r = Robust.madOutlierStats(df, "k", col("x")).collect().head
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Long]("n_docs") == 100L)
    Dedup.releaseCaches()
  }
}
