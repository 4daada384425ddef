package graft.queries

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic output ordering without a global sort: a bare
  * `orderBy` plans RangePartitioning, whose sampling pass re-executes
  * the whole child plan (2× cost on expensive queries). Driver-facing
  * results are small, so shuffle everything into one partition and sort
  * locally — upstream parallelism intact, single execution.
  * (`orderBy(...).limit(k)` is fine as-is: TakeOrderedAndProject.) */
object QueryUtil {
  def ordered(cols: String*)(df: DataFrame): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)

  /** Stage-boundary spread for CPU-heavy narrow phases: hash-partition
    * on the id across the session's parallelism. A small-SF scan
    * arrives as ONE file split, and AQE coalesces tiny shuffles to one
    * partition BY BYTES — right for IO-bound stages, wrong immediately
    * before a regex/tokenize-heavy narrow chain whose cost is per-row
    * CPU (the chain serializes on one core; measured 1.4–3.6 s
    * single-task checkpoint stages in the v6 curation chain). At
    * cluster scale this is one hash exchange of data that is being
    * materialized at the stage boundary anyway — the explicit layout
    * step a production pipeline runs between phases. */
  def spreadById(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism,
      df(idCol))
  def orderedBy(cols: Column*)(df: DataFrame): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** DuckDB replay of [[graft.ops.Robust.quantileFromHistogram]] as a
    * CTE-pair generator over a (`keys…`, v, c) histogram relation
    * `src`: a row with cumulative count `cum` and count `c` covers
    * 0-based ranks [cum-c, cum-1]; the covering values interpolate at
    * position (n-1)·q. `keys` is a comma list usable in both
    * PARTITION BY and GROUP BY. */
  def quantileCteSql(src: String, keys: String, q: String,
      outCte: String, outCol: String): String = {
    def at(rank: String) =
      s"""max(CASE WHEN cum - c <= CAST($rank AS BIGINT)
         |      AND CAST($rank AS BIGINT) <= cum - 1 THEN v END)""".stripMargin
    val lo = at(s"floor((n - 1) * $q)")
    val hi = at(s"ceil((n - 1) * $q)")
    s"""${outCte}_t AS (SELECT $keys, v, c,
       |    CAST(sum(c) OVER (PARTITION BY $keys ORDER BY v) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY $keys) AS BIGINT) AS n FROM $src),
       |$outCte AS (SELECT $keys,
       |    $lo + ($hi - $lo) * max((n - 1) * $q - floor((n - 1) * $q))
       |      AS $outCol
       |  FROM ${outCte}_t GROUP BY $keys)""".stripMargin
  }
}
