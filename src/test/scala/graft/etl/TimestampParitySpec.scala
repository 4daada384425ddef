package graft.etl

import org.apache.spark.sql.functions._

/** Differential guard for [[expressions.Rfc3339Parse]]: on a generated
  * corpus of valid + adversarial timestamp strings, its accept set and
  * epoch micros must EXACTLY match the column-expression path it
  * replaced (strict shape regex AND Spark's own `try_to_timestamp`),
  * and the rendered form must round-trip through a second parse. */
class TimestampParitySpec extends SparkSpec {
  import spark.implicits._

  private val Shape =
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})$"

  private def samples: Seq[String] = {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic
    def pad(n: Int, w: Int) = s"%0${w}d".format(n)
    val valid = (1 to 250).map { _ =>
      val y = 1 + rnd.nextInt(9999)
      val mo = 1 + rnd.nextInt(12)
      val d = 1 + rnd.nextInt(31) // some invalid day-of-month on purpose
      val (h, mi, se) = (rnd.nextInt(24), rnd.nextInt(60), rnd.nextInt(60))
      val frac = rnd.nextInt(4) match {
        case 0 => ""
        case 1 => "." + pad(rnd.nextInt(1000), 3)
        case 2 => "." + rnd.nextInt(10)
        case _ => "." + pad(rnd.nextInt(1000000000), 9)
      }
      val zone = rnd.nextInt(3) match {
        case 0 => "Z"
        case 1 => f"+${rnd.nextInt(18)}%02d:${rnd.nextInt(60)}%02d"
        case _ => f"-${rnd.nextInt(18)}%02d:${rnd.nextInt(60)}%02d"
      }
      s"${pad(y, 4)}-${pad(mo, 2)}-${pad(d, 2)}T${pad(h, 2)}:${pad(mi, 2)}:${pad(se, 2)}$frac$zone"
    }
    val adversarial = Seq(
      "2025-02-30T00:00:00Z",        // bad day
      "2025-13-01T00:00:00Z",        // bad month
      "2025-01-01T24:00:00Z",        // bad hour
      "2025-01-01T00:60:00Z",        // bad minute
      "2025-01-01T00:00:60Z",        // leap second (rejected)
      "2025-01-01T00:00:00.1234567890Z", // 10 fraction digits (accepted, truncated)
      "2025-01-01T00:00:00.Z",       // empty fraction
      "2025-01-01T00:00:00+19:00",   // beyond ZoneOffset ±18h
      "2025-01-01T00:00:00+05:60",   // bad offset minutes
      "2025-01-01 00:00:00Z",        // space instead of T
      "2025-01-01T00:00:00",         // missing zone
      "2025-01-01T00:00:00Zx",       // trailing garbage
      "25-01-01T00:00:00Z",          // short year
      "2025-1-01T00:00:00Z",         // unpadded month
      "",
      "not a timestamp")
    valid ++ adversarial
  }

  test("accept set and epoch micros match the replaced Spark-native path") {
    val df = samples.toDF("s").select(
      col("s"),
      org.apache.spark.sql.graft.Bridge.column(
        expressions.Rfc3339Parse(
          org.apache.spark.sql.graft.Bridge.expression(col("s")))).as("mine"),
      (col("s").rlike(Shape) && try_to_timestamp(col("s")).isNotNull)
        .as("spark_ok"),
      unix_micros(try_to_timestamp(col("s"))).as("spark_us"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      val mine = if (r.isNullAt(1)) None
        else Some(r.getStruct(1).getLong(0))
      assert(mine.isDefined == r.getBoolean(2),
        s"accept mismatch for '$s': mine=${mine.isDefined} spark=${r.getBoolean(2)}")
      mine.foreach(us => assert(us == r.getLong(3),
        s"epoch mismatch for '$s': mine=$us spark=${r.getLong(3)}"))
    }
  }

  test("rendered form round-trips to the same instant and offset") {
    val df = samples.toDF("s").select(
      org.apache.spark.sql.graft.Bridge.column(
        expressions.Rfc3339Parse(
          org.apache.spark.sql.graft.Bridge.expression(col("s")))).as("p1"))
      .filter(col("p1").isNotNull)
      .select(col("p1"),
        org.apache.spark.sql.graft.Bridge.column(
          expressions.Rfc3339Parse(
            org.apache.spark.sql.graft.Bridge.expression(
              col("p1.rendered")))).as("p2"))
    df.collect().foreach { r =>
      val (p1, p2) = (r.getStruct(0), r.getStruct(1))
      assert(p2 != null, s"rendered '${p1.getString(2)}' failed to re-parse")
      assert(p1.getLong(0) == p2.getLong(0) && p1.getInt(1) == p2.getInt(1),
        s"round-trip drift for '${p1.getString(2)}'")
      // idempotent: re-rendering the rendered form is a fixpoint
      assert(p1.getString(2) == p2.getString(2))
    }
  }
}
