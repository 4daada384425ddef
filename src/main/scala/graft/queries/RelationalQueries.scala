package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational analytics over the TPC-H-ish star schema: scan+agg,
  * joins (shuffle / broadcast / semi / anti), windows, rollup, top-k —
  * the general-purpose query surface the log engine gains from being
  * Spark-native.
  *
  * Scale notes per query are in each Scaladoc; common rules:
  *   - dimensions (region, nation, supplier at these SFs) are broadcast;
  *   - all sort keys include a unique id so results are deterministic;
  *   - double aggregates are rounded at the output boundary (2–4 dp)
  *     so engine-order FP noise can't flip the comparison.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q1 shape: one scan, map-side partial agg, 6-group output. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") <= lit("2000-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .transform(QueryUtil.ordered("l_returnflag", "l_linestatus"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 shape: tight filter → single-row agg; the whole point is
    * that every predicate reaches the parquet scan (PushedFilters). */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1998-01-01").cast("date") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 25)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n"))

  val q6Oracle: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25""".stripMargin

  /** TPC-H Q3 shape: 3-way join, group, rounded-revenue top-10.
    * customer is the small side (broadcast); lineitem never shuffles
    * twice. Ranking on the ROUNDED revenue + orderkey keeps the top-k
    * deterministic and engine-portable. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
    val l = t(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") > lit("1998-01-01").cast("date"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 5-way join with region filter; all dims broadcast,
    * the single big shuffle is lineitem⋈orders on orderkey. */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region").filter(col("r_name") === "EUROPE")
    val n = t(spark, dir, "nation")
    val s = t(spark, dir, "supplier")
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
    val l = t(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .transform(QueryUtil.ordered("n_name"))
  }

  val q5Oracle: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Top-k by a stored column: raw parquet values sort identically in
    * both engines — no rounding needed. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val topOrdersOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Left-semi join (EXISTS): orders having any heavy line. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val heavy = t(spark, dir, "lineitem").filter(col("l_quantity") >= 48)
      .select("l_orderkey")
    t(spark, dir, "orders")
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .transform(QueryUtil.ordered("o_orderpriority"))
  }

  val semiJoinOracle: String =
    """SELECT o_orderpriority, count(*) AS n FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no 1995-H1 orders
    * (time-bounded so the result is non-trivial at every SF — every
    * customer has SOME order in this data). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val early = t(spark, dir, "orders")
      .filter(col("o_orderdate").cast("date") < lit("1995-07-01").cast("date"))
    t(spark, dir, "customer")
      .join(early, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .transform(QueryUtil.ordered("c_mktsegment"))
  }

  val antiJoinOracle: String =
    """SELECT c_mktsegment, count(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND CAST(o_orderdate AS DATE) < DATE '1995-07-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Window ranking: top-3 orders per customer. One shuffle on the
    * partition key; rank on stored values (deterministic). */
  def windowTop3(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .transform(QueryUtil.ordered("o_custkey", "rn"))
  }

  val windowTop3Oracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Running (cumulative) monthly revenue: agg then ordered window. */
  def runningMonthly(spark: SparkSession, dir: String): DataFrame = {
    val monthly = t(spark, dir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly.select(col("month"), round(col("rev"), 2).as("revenue"),
        round(sum(col("rev")).over(w), 2).as("cum_revenue"))
      .transform(QueryUtil.ordered("month"))
  }

  val runningMonthlyOracle: String =
    """WITH m AS (
      |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
      |         sum(l_extendedprice * (1 - l_discount)) AS rev
      |  FROM lineitem GROUP BY 1)
      |SELECT month, round(rev, 2) AS revenue,
      |  round(sum(rev) OVER (ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_revenue
      |FROM m ORDER BY month""".stripMargin

  /** ROLLUP grouping sets with labeled subtotals. */
  def rollupFlags(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .transform(QueryUtil.ordered("rf", "ls"))

  /** GROUPING SETS beyond rollup's prefix lattice: independent
    * per-flag, per-status and grand-total groupings in one pass. */
  def groupingSetsQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_price"))
      .transform(QueryUtil.ordered("rf", "ls"))

  val groupingSetsOracle: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  val rollupFlagsOracle: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** Exact distinct counts per group (+ a joined activity count). */
  def distinctStats(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_custkey")).as("n_cust"),
        countDistinct(col("o_custkey")).as("n_active_cust"),
        count(col("o_orderkey")).as("n_orders"))
      .transform(QueryUtil.ordered("c_mktsegment"))
  }

  val distinctStatsOracle: String =
    """SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
      |  count(DISTINCT o_custkey) AS n_active_cust, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Conditional aggregation (CASE inside agg). */
  def caseAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
        round(avg(when(col("o_orderstatus") === "F", col("o_totalprice"))), 2)
          .as("avg_f_price"))
      .transform(QueryUtil.ordered("o_orderpriority"))

  val caseAggOracle: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS avg_f_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Broadcast chain through two dims: revenue by region. */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    val s = t(spark, dir, "supplier")
    t(spark, dir, "lineitem")
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_lines"))
      .transform(QueryUtil.ordered("r_name"))
  }

  val regionRevenueOracle: String =
    """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Set operations: customers active in 1995 INTERSECT 1996, and
    * 1995 EXCEPT 1996 — one row of counts. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def active(y: Int) = o
      .filter(col("o_orderdate").cast("date") >= lit(s"$y-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit(s"${y + 1}-01-01").cast("date"))
      .select("o_custkey").distinct()
    val both = active(1995).intersect(active(1996))
    val only95 = active(1995).except(active(1996))
    both.agg(count(lit(1)).as("n_both"))
      .crossJoin(only95.agg(count(lit(1)).as("n_only_1995")))
  }

  val setOpsOracle: String =
    """WITH a95 AS (SELECT DISTINCT o_custkey FROM orders
      |             WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      |               AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'),
      |a96 AS (SELECT DISTINCT o_custkey FROM orders
      |        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |          AND CAST(o_orderdate AS DATE) < DATE '1997-01-01')
      |SELECT (SELECT count(*) FROM (SELECT * FROM a95 INTERSECT SELECT * FROM a96)) AS n_both,
      |       (SELECT count(*) FROM (SELECT * FROM a95 EXCEPT SELECT * FROM a96)) AS n_only_1995""".stripMargin

  /** PageRank over the part co-purchase graph: parts are linked when
    * they ship in the same order (the "customers also bought" graph a
    * crawl-curation team ranks pages with). Edge build is an equi
    * self-join on the order key (co-partitioned, per-order local
    * expansion — never all-pairs); 3 exact fixed-point iterations in
    * [[graft.ops.Graph.pageRankTopK]]; the oracle replays every
    * iteration's integer arithmetic through materialized CTEs. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    graft.ops.Graph.pageRankTopK(e, iterations = 3, k = 40)
  }

  /** Weighted PageRank: the same co-purchase graph with edge weight =
    * co-occurrence multiplicity (how many orders shipped the pair
    * together), contributions split proportionally — still exact
    * integer arithmetic ((pr·w) DIV Σw). */
  def pageRankWeighted(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    graft.ops.Graph.pageRankWeightedTopK(e, iterations = 3, k = 40)
  }

  val pageRankWeightedOracle: String = {
    val scale = graft.ops.Graph.Scale
    val iters = (1 to 3).map { i =>
      s""",
         |wc$i AS MATERIALIZED (SELECT ed.dst AS node,
         |    CAST(sum((r.pr * ed.w) // ed.outw) AS BIGINT) AS c
         |  FROM wed ed JOIN wr${i - 1} r ON ed.src = r.node GROUP BY ed.dst),
         |wr$i AS MATERIALIZED (SELECT r.node,
         |    CAST(${15L * scale} // (100 * (SELECT n FROM wnn)) +
         |      (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM wr${i - 1} r LEFT JOIN wc$i c USING (node))""".stripMargin
    }.mkString
    s"""WITH we0 AS MATERIALIZED (
       |  SELECT l1.l_partkey AS src, l2.l_partkey AS dst,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
       |  GROUP BY 1, 2),
       |wdeg AS MATERIALIZED (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM we0 GROUP BY src),
       |wnn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM wdeg),
       |wed AS MATERIALIZED (
       |  SELECT we0.src, we0.dst, we0.w, wdeg.outw
       |  FROM we0 JOIN wdeg USING (src)),
       |wr0 AS MATERIALIZED (SELECT src AS node,
       |  CAST($scale // (SELECT n FROM wnn) AS BIGINT) AS pr FROM wdeg)$iters
       |SELECT node, pr FROM wr3 ORDER BY pr DESC, node LIMIT 40""".stripMargin
  }

  /** Personalized PageRank from the "century" parts (pk % 100 = 0):
    * ranks measure proximity to the seed set through the co-purchase
    * graph — the related-items query. */
  def pageRankPersonalized(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    graft.ops.Graph.personalizedPageRankTopK(e,
      seedPred = col("src") % 100 === 0, iterations = 3, k = 40)
  }

  val pageRankPersonalizedOracle: String = {
    val scale = graft.ops.Graph.Scale
    val iters = (1 to 3).map { i =>
      s""",
         |pc$i AS MATERIALIZED (SELECT ed.dst AS node,
         |    CAST(sum(r.pr // ed.outdeg) AS BIGINT) AS c
         |  FROM ped ed JOIN pr${i - 1} r ON ed.src = r.node GROUP BY ed.dst),
         |pr$i AS MATERIALIZED (SELECT r.node,
         |    CAST(CASE WHEN r.node % 100 = 0
         |        THEN ${15L * scale} // (100 * (SELECT n FROM pnn))
         |        ELSE 0 END +
         |      (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM pr${i - 1} r LEFT JOIN pc$i c USING (node))""".stripMargin
    }.mkString
    s"""WITH pe0 AS MATERIALIZED (
       |  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey),
       |pdeg AS MATERIALIZED (
       |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM pe0 GROUP BY src),
       |pnn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n
       |  FROM pdeg WHERE src % 100 = 0),
       |ped AS MATERIALIZED (
       |  SELECT pe0.src, pe0.dst, pdeg.outdeg FROM pe0 JOIN pdeg USING (src)),
       |pr0 AS MATERIALIZED (SELECT src AS node,
       |  CAST(CASE WHEN src % 100 = 0 THEN $scale // (SELECT n FROM pnn)
       |       ELSE 0 END AS BIGINT) AS pr FROM pdeg)$iters
       |SELECT node, pr FROM pr3 ORDER BY pr DESC, node LIMIT 40""".stripMargin
  }

  val pageRankOracle: String = {
    val scale = graft.ops.Graph.Scale
    val iters = (1 to 3).map { i =>
      s""",
         |c$i AS MATERIALIZED (SELECT ed.dst AS node,
         |    CAST(sum(r.pr // ed.outdeg) AS BIGINT) AS c
         |  FROM ed JOIN r${i - 1} r ON ed.src = r.node GROUP BY ed.dst),
         |r$i AS MATERIALIZED (SELECT r.node,
         |    CAST(${15L * scale} // (100 * (SELECT n FROM nn)) +
         |      (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM r${i - 1} r LEFT JOIN c$i c USING (node))""".stripMargin
    }.mkString
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey),
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e0 GROUP BY src),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
       |ed AS MATERIALIZED (
       |  SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg USING (src)),
       |r0 AS MATERIALIZED (SELECT src AS node,
       |  CAST($scale // (SELECT n FROM nn) AS BIGINT) AS pr FROM deg)$iters
       |SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 40""".stripMargin
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_pagerank" -> ((pageRank _, Some(pageRankOracle))),
    "q_pagerank_weighted" ->
      ((pageRankWeighted _, Some(pageRankWeightedOracle))),
    "q_pagerank_seeded" ->
      ((pageRankPersonalized _, Some(pageRankPersonalizedOracle))),
    "q1_pricing" -> ((q1Pricing _, Some(q1Oracle))),
    "q6_revenue" -> ((q6Revenue _, Some(q6Oracle))),
    "q3_top_orders" -> ((q3TopOrders _, Some(q3Oracle))),
    "q5_nation_revenue" -> ((q5NationRevenue _, Some(q5Oracle))),
    "q_topk_orders" -> ((topOrders _, Some(topOrdersOracle))),
    "q_semi_join" -> ((semiJoin _, Some(semiJoinOracle))),
    "q_anti_join" -> ((antiJoin _, Some(antiJoinOracle))),
    "q_window_top3" -> ((windowTop3 _, Some(windowTop3Oracle))),
    "q_running_monthly" -> ((runningMonthly _, Some(runningMonthlyOracle))),
    "q_rollup_flags" -> ((rollupFlags _, Some(rollupFlagsOracle))),
    "q_grouping_sets" -> ((groupingSetsQ _, Some(groupingSetsOracle))),
    "q_distinct_stats" -> ((distinctStats _, Some(distinctStatsOracle))),
    "q_case_agg" -> ((caseAgg _, Some(caseAggOracle))),
    "q_region_revenue" -> ((regionRevenue _, Some(regionRevenueOracle))),
    "q_set_ops" -> ((setOps _, Some(setOpsOracle))))
}
