package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table access for the /root/testdata star schema.
  *
  * `events.parquet` stores TIMESTAMP(NANOS) which Spark 4 refuses to
  * read natively (PARQUET_TYPE_ILLEGAL): with
  * `spark.sql.legacy.parquet.nanosAsLong=true` the column arrives as
  * nanosecond LONGs, converted here to a µs TimestampType — the same
  * ns→µs truncation DuckDB's `CAST(ts AS TIMESTAMP)` applies, keeping
  * oracle comparisons exact.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
}
