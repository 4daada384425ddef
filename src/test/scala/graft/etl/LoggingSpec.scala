package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** slog-parity contract for the operational logger
  * (`/root/reference/internal/logger/logger.go`): JSON line shape,
  * level gating, bound trace_id attributes, text handler. */
class LoggingSpec extends AnyFunSuite {

  private def captured(body: => Unit): Seq[String] = {
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true, "UTF-8")
    val savedNow = EtlLogger.now
    EtlLogger.setOutput(ps)
    EtlLogger.now = () => java.time.Instant.parse("2026-01-02T03:04:05Z")
    try body
    finally {
      EtlLogger.setOutput(System.err)
      EtlLogger.now = savedNow
      EtlLogger.setJsonHandler()
      EtlLogger.setLevel(EtlLogger.Info)
    }
    buf.toString("UTF-8").split("\n").toSeq.filter(_.nonEmpty)
  }

  test("JSON handler: Go slog line shape with typed attrs") {
    val lines = captured {
      EtlLogger.info("pipeline starting", "input" -> "/x.jsonl", "n" -> 6)
    }
    assert(lines == Seq(
      """{"time":"2026-01-02T03:04:05Z","level":"INFO","msg":"pipeline starting","input":"/x.jsonl","n":6}"""))
  }

  test("level gating: debug suppressed at Info, emitted at Debug") {
    val quiet = captured { EtlLogger.debug("hidden") }
    assert(quiet.isEmpty)
    val loud = captured {
      EtlLogger.setLevel(EtlLogger.Debug)
      EtlLogger.debug("visible")
    }
    assert(loud.size == 1 && loud.head.contains(""""level":"DEBUG""""))
  }

  test("withAttrs binds trace_id to every line (slog With)") {
    val lines = captured {
      val log = EtlLogger.withAttrs("trace_id" -> "abc-1")
      log.info("first")
      log.warn("second", "k" -> true)
    }
    assert(lines.forall(_.contains(""""trace_id":"abc-1"""")))
    assert(lines(1).contains(""""k":true"""))
  }

  test("text handler: key=value rendering") {
    val lines = captured {
      EtlLogger.setTextHandler()
      EtlLogger.error("boom", "code" -> 2)
    }
    assert(lines == Seq(
      """time=2026-01-02T03:04:05Z level=ERROR msg="boom" code=2"""))
  }

  test("non-finite floats stay parseable JSON (quoted, not bare NaN)") {
    val lines = captured {
      EtlLogger.info("rates", "a" -> Double.NaN,
        "b" -> Double.PositiveInfinity, "c" -> 0.5, "d" -> Float.NegativeInfinity)
    }
    assert(lines == Seq(
      """{"time":"2026-01-02T03:04:05Z","level":"INFO","msg":"rates","a":"NaN","b":"Infinity","c":0.5,"d":"-Infinity"}"""))
  }

  test("escaping: quotes and control chars never break the JSON line") {
    val lines = captured {
      EtlLogger.info("he said \"hi\"\n", "path" -> "a\\b")
    }
    assert(lines == Seq(
      """{"time":"2026-01-02T03:04:05Z","level":"INFO","msg":"he said \"hi\"\n","path":"a\\b"}"""))
  }
}
