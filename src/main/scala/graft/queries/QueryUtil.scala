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
  def orderedBy(cols: Column*)(df: DataFrame): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
