package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table access for the /root/testdata star schema.
  *
  * `events.parquet` has shipped with two physical `ts` encodings across
  * testdata generations: TIMESTAMP(NANOS), which Spark 4 refuses to read
  * natively (PARQUET_TYPE_ILLEGAL) and arrives as nanosecond LONGs under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, and plain µs
  * TIMESTAMP_NTZ. Both normalize here to a µs TimestampType under the
  * UTC session zone — the same value DuckDB's `CAST(ts AS TIMESTAMP)`
  * produces for either encoding, keeping oracle comparisons exact. The
  * dispatch is on the OBSERVED column type, never on an assumed
  * generation, so a regenerated dataset cannot break every event query
  * at load (it did in round 7).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events-schema `ts` to µs TimestampType from whichever
    * physical type the parquet read produced. `DIV` (integral divide)
    * for the nanos-long case: a float path would lose precision above
    * 2^53 ns (~1970+104 days). */
  def withNormalizedTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** No accessor-side session mutation: the nanosAsLong flag (needed
    * only when the driver regenerates events.parquet with NANOS
    * timestamps) is set at session BUILD in Verify/Bench/the test
    * session; [[withNormalizedTs]] dispatches on whichever physical
    * type the scan then produces. */
  def events(spark: SparkSession, dir: String): DataFrame =
    withNormalizedTs(table(spark, dir, "events"))
}
