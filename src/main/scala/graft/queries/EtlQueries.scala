package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Transforms

/** ETL-operator queries (SURVEY §2: P1, P2, P3–P5, A1–A5) expressed over
  * the driver's `events` table via [[EventsAsLogs]], each with a DuckDB
  * oracle that recomputes the expected result by CASE arithmetic.
  */
object EtlQueries {

  private val errKind = col("error_kind")
  private val isErr = errKind.isNotNull

  /** P1+P2: the full per-record normalize output. */
  def normalizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val n = graft.etl.Normalize(EventsAsLogs.lines(spark, dir))
    n.select(
        col("event_id"),
        errKind,
        when(isErr, lit(null).cast("string")).otherwise(col("ts")).as("ts_str"),
        col("level"),
        col("message"),
        col("service"),
        size(col("fields")).as("n_fields"))
      .transform(QueryUtil.ordered("event_id"))
  }

  val normalizeOracle: String =
    """SELECT event_id,
      |  CASE WHEN event_id % 97 = 0 THEN 'json'
      |       WHEN event_id % 83 = 0 OR event_id % 89 = 0 THEN 'normalize' END AS error_kind,
      |  CASE WHEN event_id % 97 = 0 OR event_id % 83 = 0 OR event_id % 89 = 0 THEN NULL
      |       ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ') END AS ts_str,
      |  CASE WHEN event_id % 97 = 0 OR event_id % 83 = 0 OR event_id % 89 = 0 THEN NULL
      |       WHEN event_id % 5 IN (0, 4) THEN 'INFO'
      |       WHEN event_id % 5 = 1 THEN 'WARN'
      |       WHEN event_id % 5 = 2 THEN 'ERROR'
      |       ELSE 'DEBUG' END AS level,
      |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE 'evt ' || event_type END AS message,
      |  CASE WHEN event_id % 97 = 0 THEN '' ELSE event_type END AS service,
      |  CASE WHEN event_id % 97 = 0 THEN NULL
      |       ELSE CAST(3 + CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END AS INTEGER) END AS n_fields
      |FROM events ORDER BY event_id""".stripMargin

  /** Shared CASE: which pipeline category a row lands in. */
  private def category = {
    when(errKind === "json", "json")
      .when(isErr, "normalize")
      .when(col(Transforms.DropReasonCol).isNotNull, col(Transforms.DropReasonCol))
      .otherwise("kept")
  }

  private val oracleCategory =
    """CASE WHEN event_id % 97 = 0 THEN 'json'
      |     WHEN event_id % 83 = 0 OR event_id % 89 = 0 THEN 'normalize'
      |     WHEN event_id % 5 NOT IN (1, 2) THEN 'level'
      |     WHEN event_type = 'signup' THEN 'service'
      |     ELSE 'kept' END""".stripMargin

  /** P3–P5 + A5: counts per pipeline category (incl. drop reasons). */
  def breakdownQuery(spark: SparkSession, dir: String): DataFrame =
    EventsAsLogs.transformed(spark, dir)
      .groupBy(category.as("category"))
      .agg(count(lit(1)).as("n"))
      .transform(QueryUtil.ordered("category"))

  val breakdownOracle: String =
    s"""SELECT $oracleCategory AS category, count(*) AS n
       |FROM events GROUP BY 1 ORDER BY category""".stripMargin

  /** A1–A2 + A5 rollup: the report counters as one row. */
  def reportQuery(spark: SparkSession, dir: String): DataFrame =
    EventsAsLogs.transformed(spark, dir).agg(
      count(lit(1)).as("total_lines"),
      count(when(errKind === "json", 1)).as("json_failed"),
      count(when(errKind =!= "json" || errKind.isNull, 1)).as("json_parsed"),
      count(when(errKind.isNull, 1)).as("normalized_ok"),
      count(when(errKind === "normalize", 1)).as("normalized_failed"),
      count(when(col(Transforms.DropReasonCol) === "level", 1)).as("filtered_level"),
      count(when(col(Transforms.DropReasonCol) === "service", 1)).as("filtered_service"),
      count(when(errKind.isNull && col(Transforms.DropReasonCol).isNull, 1)).as("kept"))

  val reportOracle: String =
    s"""WITH c AS (SELECT $oracleCategory AS cat FROM events)
       |SELECT count(*) AS total_lines,
       |  count(*) FILTER (WHERE cat = 'json') AS json_failed,
       |  count(*) FILTER (WHERE cat <> 'json') AS json_parsed,
       |  count(*) FILTER (WHERE cat NOT IN ('json', 'normalize')) AS normalized_ok,
       |  count(*) FILTER (WHERE cat = 'normalize') AS normalized_failed,
       |  count(*) FILTER (WHERE cat = 'level') AS filtered_level,
       |  count(*) FILTER (WHERE cat = 'service') AS filtered_service,
       |  count(*) FILTER (WHERE cat = 'kept') AS kept
       |FROM c""".stripMargin

  /** A3: by-level counts over normalized-OK rows. */
  def byLevelQuery(spark: SparkSession, dir: String): DataFrame =
    EventsAsLogs.transformed(spark, dir)
      .filter(errKind.isNull)
      .groupBy("level").agg(count(lit(1)).as("n"))
      .transform(QueryUtil.ordered("level"))

  val byLevelOracle: String =
    """SELECT CASE WHEN event_id % 5 IN (0, 4) THEN 'INFO'
      |            WHEN event_id % 5 = 1 THEN 'WARN'
      |            WHEN event_id % 5 = 2 THEN 'ERROR'
      |            ELSE 'DEBUG' END AS level, count(*) AS n
      |FROM events
      |WHERE event_id % 97 <> 0 AND event_id % 83 <> 0 AND event_id % 89 <> 0
      |GROUP BY 1 ORDER BY level""".stripMargin

  /** A4: by-service counts over normalized-OK rows. */
  def byServiceQuery(spark: SparkSession, dir: String): DataFrame =
    EventsAsLogs.transformed(spark, dir)
      .filter(errKind.isNull && col("service") =!= "")
      .groupBy("service").agg(count(lit(1)).as("n"))
      .transform(QueryUtil.ordered("service"))

  val byServiceOracle: String =
    """SELECT event_type AS service, count(*) AS n
      |FROM events
      |WHERE event_id % 97 <> 0 AND event_id % 83 <> 0 AND event_id % 89 <> 0
      |GROUP BY 1 ORDER BY service""".stripMargin

  /** P5: redaction proof — PII count before and after on kept rows. The
    * `pii_after` column comes from the REAL post-redaction fields map. */
  def redactQuery(spark: SparkSession, dir: String): DataFrame = {
    val kept = EventsAsLogs.transformed(spark, dir)
      .filter(errKind.isNull && col(Transforms.DropReasonCol).isNull)
    kept.agg(
      count(lit(1)).as("kept"),
      count(when(col("event_id") % 11 === 0, 1)).as("pii_before"),
      count(when(map_contains_key(col("fields"), "user_email"), 1)).as("pii_after"))
  }

  val redactOracle: String =
    s"""WITH c AS (SELECT event_id, $oracleCategory AS cat FROM events)
       |SELECT count(*) AS kept,
       |  count(*) FILTER (WHERE event_id % 11 = 0) AS pii_before,
       |  CAST(0 AS BIGINT) AS pii_after
       |FROM c WHERE cat = 'kept'""".stripMargin

  /** S1 breadth: the events-derived CSV twin round-tripped through a
    * real CSV file and the FULL normalize chain (CSV rows re-encoded to
    * the line protocol by [[graft.etl.Normalize.parseCsvLines]] — empty
    * cells behave as absent keys, so the missing-level error path fires
    * exactly like the JSONL twin's). `event_id` rides the residual
    * fields map, proving unknown CSV columns land there too. */
  def csvSourceQuery(spark: SparkSession, dir: String): DataFrame = {
    val n = graft.etl.Normalize(EventsAsLogs.csvLines(spark, dir))
    n.select(
        try_element_at(col("fields"), lit("event_id")).cast("long").as("event_id"),
        errKind,
        when(isErr, lit(null).cast("string")).otherwise(col("ts")).as("ts_str"),
        col("level"),
        col("message"),
        col("service"),
        size(col("fields")).as("n_fields"))
      .transform(QueryUtil.ordered("event_id"))
  }

  val csvSourceOracle: String =
    """SELECT event_id,
      |  CASE WHEN event_id % 83 = 0 OR event_id % 89 = 0 THEN 'normalize' END AS error_kind,
      |  CASE WHEN event_id % 83 = 0 OR event_id % 89 = 0 THEN NULL
      |       ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ') END AS ts_str,
      |  CASE WHEN event_id % 83 = 0 OR event_id % 89 = 0 THEN NULL
      |       WHEN event_id % 5 IN (0, 4) THEN 'INFO'
      |       WHEN event_id % 5 = 1 THEN 'WARN'
      |       WHEN event_id % 5 = 2 THEN 'ERROR'
      |       ELSE 'DEBUG' END AS level,
      |  'evt ' || event_type AS message,
      |  event_type AS service,
      |  CAST(3 + CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END AS INTEGER) AS n_fields
      |FROM events ORDER BY event_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "etl_normalize" -> ((normalizeQuery _, Some(normalizeOracle))),
    "etl_csv_source" -> ((csvSourceQuery _, Some(csvSourceOracle))),
    "etl_breakdown" -> ((breakdownQuery _, Some(breakdownOracle))),
    "etl_report" -> ((reportQuery _, Some(reportOracle))),
    "etl_by_level" -> ((byLevelQuery _, Some(byLevelOracle))),
    "etl_by_service" -> ((byServiceQuery _, Some(byServiceOracle))),
    "etl_redact" -> ((redactQuery _, Some(redactOracle))))
}
