package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over the normalize operator (SURVEY §5 rebuild
  * strategy): residual-field partition law, alias precedence,
  * total-function robustness. Deterministic ScalaCheck generator
  * sampling (fixed seeds) — no runner bridge needed, failures
  * reproduce exactly. */
class NormalizePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val keyGen: Gen[String] =
    Gen.frequency(
      3 -> Gen.oneOf(LogSchema.CanonicalKeys),
      5 -> (for {
        n <- Gen.choose(1, 8)
        cs <- Gen.listOfN(n, Gen.alphaLowerChar)
      } yield cs.mkString))
  private val valGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  test("residual-field partition law: fields == raw keys minus canonical") {
    val cases = samples(Gen.mapOf(Gen.zip(keyGen, valGen)), 40)
    val base = Map("ts" -> "2025-01-01T00:00:00Z", "level" -> "I", "msg" -> "m")
    val lines = cases.map { extra =>
      (extra ++ base).map { case (k, v) => s""""$k":"$v"""" }
        .mkString("{", ",", "}")
    }
    val rows = Normalize(lines.toDF("line")).collect()
    rows.zip(cases).foreach { case (row, extra) =>
      val all = (extra ++ base).keySet
      val fields = row.getAs[Map[String, String]]("fields")
      assert(fields.keySet == all -- LogSchema.CanonicalKeys)
      assert(fields.keySet.intersect(LogSchema.CanonicalKeys.toSet).isEmpty)
    }
  }

  test("alias precedence: primary wins iff non-empty after trim") {
    val primaryVals = Seq("", " ", "x", " y ")
    val cases = for {
      (primary, alias, outGet) <- Seq(
        ("msg", "message", (r: org.apache.spark.sql.Row) => r.getAs[String]("message")),
        ("level", "severity", (r: org.apache.spark.sql.Row) => r.getAs[String]("level")),
        ("service", "app", (r: org.apache.spark.sql.Row) => r.getAs[String]("service")),
        ("trace_id", "trace", (r: org.apache.spark.sql.Row) => r.getAs[String]("trace_id")))
      pv <- primaryVals
    } yield (primary, alias, outGet, pv)
    cases.foreach { case (primary, alias, outGet, pv) =>
      val m = Map("ts" -> "2025-01-01T00:00:00Z", "level" -> "INFO",
        "msg" -> "m", primary -> pv, alias -> "aliasval")
      val line = m.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
      val row = Normalize(Seq(line).toDF("line")).head()
      val expected = if (pv.trim.nonEmpty) pv.trim else "aliasval"
      val got = outGet(row)
      val want = if (primary == "level") expected.toUpperCase else expected
      assert(got == want, s"$primary='$pv' → got '$got', want '$want'")
    }
  }

  test("normalize is total: never throws on arbitrary printable input") {
    val junkGen = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, Gen.asciiPrintableChar)
    } yield cs.mkString
    val lines = samples(junkGen, 80).filter(_.trim.nonEmpty)
    val rows = Normalize(lines.toDF("line")).collect()
    rows.zip(lines).foreach { case (row, junk) =>
      if (!junk.trim.startsWith("{"))
        assert(row.getAs[String]("error_kind") == "json", s"input: $junk")
    }
  }
}
