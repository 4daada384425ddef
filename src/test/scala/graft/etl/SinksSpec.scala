package graft.etl

import org.apache.spark.sql.functions._
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.util.concurrent.atomic.AtomicInteger

/** K1–K7 sink contracts: ports of internal/sink tests —
  * rotate_test.go, http_test.go (happy / succeed-on-3rd / exhausted),
  * plus DLQ capture and the Go-compatible record rendering. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def normalized(lines: String*) =
    Transforms.split(TransformRegistry(EtlConfig.default.copy(
      filterLevels = Nil))(Normalize(lines.toDF("line"))).toOption.get)._1
      .select("ts", "level", "message", "service", "namespace", "pod",
        "node", "trace_id", "fields")

  private val recordLine =
    """{"ts":"2025-01-01T00:00:00Z","level":"INFO","msg":"hello","service":"svc","status":200,"flag":true,"name":"x"}"""

  test("renderRecord: Go field names, order, typed fields, HTML escaping") {
    val row = normalized(recordLine).head()
    val json = Sinks.renderRecord(row)
    assert(json.startsWith("""{"TS":"2025-01-01T00:00:00Z","Level":"INFO","Service":"svc""""))
    // struct order: TS, Level, Service, Namespace, Pod, Node, Message, TraceID, Fields
    assert(json.indexOf("\"Message\"") > json.indexOf("\"Node\""))
    // typed field values: number/bool raw, string quoted; keys sorted
    assert(json.contains(""""Fields":{"flag":true,"name":"x","status":200}"""))
    // encoding/json HTML escaping
    val row2 = normalized(
      """{"ts":"2025-01-01T00:00:00Z","level":"I","msg":"a<b>&c"}""").head()
    assert(Sinks.renderRecord(row2).contains("a\\u003cb\\u003e\\u0026c"))
  }

  test("rotating sink: checkpoint resume continues the NEWEST rotated file") {
    // a prior run rotated: base holds the oldest records, base.1 the
    // newest. Resume must continue at index 1 — resuming at 0 would
    // append to the oldest file and the first rotation would TRUNCATE
    // the existing base.1 (the 'restart must not truncate' contract).
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("rotres")
    val base = s"$dir/out.jsonl"
    Files.writeString(Paths.get(base), "old-run-base\n")
    Files.writeString(Paths.get(s"$base.1"), "old-run-rotated\n")
    val sink = new Sinks.RotatingSink(base, maxBytes = 10000, maxFiles = 3,
      startAppend = true)
    sink.write(normalized(
      """{"ts":"2025-01-01T00:00:00Z","level":"INFO","msg":"resumed"}"""))
    assert(Files.readAllLines(Paths.get(base)).size == 1,
      "base (oldest) must be untouched on resume")
    val rotated = Files.readAllLines(Paths.get(s"$base.1"))
    assert(rotated.get(0) == "old-run-rotated",
      "pre-restart output must survive")
    assert(rotated.size == 2 && rotated.get(1).contains("resumed"),
      "resume must append to the newest rotated file")
  }

  test("rotating sink: byte-threshold rotation + retention (rotate_test.go)") {
    val dir = java.nio.file.Files.createTempDirectory("rot")
    val base = s"$dir/out.jsonl"
    // ~190-byte records, 400-byte threshold, keep 2 rotated files
    val df = normalized((1 to 10).map(i =>
      s"""{"ts":"2025-01-01T00:00:0${i % 10}Z","level":"INFO","msg":"padding padding padding $i"}"""): _*)
    val sink = new Sinks.RotatingSink(base, maxBytes = 400, maxFiles = 2)
    val res = sink.write(df)
    assert(res.writtenOk == 10)
    val files = new java.io.File(dir.toString).listFiles().map(_.getName).sorted
    // retention: at most maxFiles rotated + current
    assert(files.length <= 3, files.mkString(","))
    val total = files.map(f => java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/$f")).size).sum
    assert(total <= 10) // older files deleted
  }

  test("http sink: happy path + retry-then-success + exhausted-to-DLQ") {
    val hits = new AtomicInteger(0)
    val failFirst2 = new AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/ok", (ex: HttpExchange) => {
      hits.incrementAndGet()
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      val n = failFirst2.incrementAndGet()
      ex.sendResponseHeaders(if (n <= 2) 500 else 200, -1); ex.close()
    })
    server.createContext("/dead", (ex: HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val df = normalized(recordLine).coalesce(1)
      val policy = new Sinks.RetryPolicy(3, 1, 5, 0.2)
      val ok = new Sinks.HttpSink(s"http://localhost:$port/ok", policy).write(df)
      assert(ok.writtenOk == 1 && ok.writeFailed == 0 && hits.get() == 1)

      val flaky = new Sinks.HttpSink(s"http://localhost:$port/flaky", policy).write(df)
      assert(flaky.writtenOk == 1)
      assert(flaky.retry.totalRetries == 2)       // succeeded on 3rd attempt
      assert(flaky.retry.writesWithRetries == 1)
      assert(flaky.retry.maxRetriesPerWrite == 2)

      val dead = new Sinks.HttpSink(s"http://localhost:$port/dead", policy).write(df)
      assert(dead.writtenOk == 0 && dead.writeFailed == 1)
      assert(dead.dlq.size == 1)
      // reasons carry the ACTUAL error (err.Error() parity) ...
      assert(dead.dlq.head._2 == "unexpected status 500")
      // ... and with NO dlq configured nothing was "written" anywhere
      // (the reference only counts dlq_written with a live dlqWriter)
      assert(dead.dlqWritten == 0 && dead.dlqReasons.isEmpty)
    } finally server.stop(0)
  }

  test("http sink: total outage writes DLQ distributed, no driver materialization") {
    // EVERY record fails — the failure set is the whole batch. The sink
    // must (a) write the full DLQ via the distributed path, (b) report
    // exact counts + reasons from aggregation, (c) surface only a
    // capped driver-side sample.
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/dead", (ex: HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val n = 1200
      val df = normalized((1 to n).map(i =>
        s"""{"ts":"2025-01-01T00:00:00Z","level":"INFO","msg":"m$i"}"""): _*)
        .repartition(8)
      val dir = java.nio.file.Files.createTempDirectory("dlqdist")
      val dlq = s"$dir/dlq.jsonl"
      val policy = new Sinks.RetryPolicy(0, 1, 2, 0)
      val res = new Sinks.HttpSink(s"http://localhost:$port/dead", policy,
        dlqPath = dlq).write(df)
      assert(res.writtenOk == 0 && res.writeFailed == n)
      assert(res.dlqWritten == n)
      assert(res.dlqReasons == Map("unexpected status 500" -> n.toLong))
      assert(res.dlq.size == Sinks.HttpSink.DlqSampleCap,
        s"driver sample must be capped, got ${res.dlq.size}")
      assert(res.dlqHandled.nonEmpty, "sink must own the DLQ write")
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dlq))
      assert(lines.size == n, s"distributed DLQ must hold all $n failures")
      assert(lines.get(0).startsWith("""{"record":{"TS":"""))
      assert(lines.get(0).endsWith(""","reason":"unexpected status 500"}"""))
      // a second failing write APPENDS (openDLQ semantics)
      new Sinks.HttpSink(s"http://localhost:$port/dead", policy,
        dlqPath = dlq).write(normalized(recordLine))
      assert(java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dlq)).size == n + 1)
    } finally server.stop(0)
  }

  test("DLQ file: {record, reason} JSONL appended (openDLQ semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("dlq")
    val path = s"$dir/sub/dlq.jsonl" // parent dirs created
    Sinks.writeDlq(path, Seq(("""{"TS":"t"}""", "write failed after 3 retries")))
    Sinks.writeDlq(path, Seq(("""{"TS":"u"}""", "boom")))
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.size == 2)
    assert(lines.get(0) == """{"record":{"TS":"t"},"reason":"write failed after 3 retries"}""")
  }

  test("sink builder: dispatch + kafka gated on connector + unknown type") {
    assert(Sinks.build(EtlConfig.default).toOption.get.isInstanceOf[Sinks.StdoutSink])
    assert(Sinks.build(EtlConfig.default.copy(outputType = "rotate",
      outputPath = "/tmp/x")).toOption.get.isInstanceOf[Sinks.RotatingSink])
    assert(Sinks.build(EtlConfig.default.copy(outputType = "parquet",
      outputPath = "/tmp/x")).toOption.get.isInstanceOf[Sinks.ParquetSink])
    // kafka: native when the connector jar is present, clear error when
    // not (this environment ships core Spark only)
    val kafka = Sinks.build(EtlConfig.default.copy(outputType = "kafka",
      outputPath = "broker:9092/logs"))
    if (Sinks.kafkaConnectorAvailable)
      assert(kafka.toOption.get.isInstanceOf[Sinks.KafkaSink])
    else
      assert(kafka.swap.toOption.get.contains("spark-sql-kafka"))
    // malformed path rejected before any connector use
    if (Sinks.kafkaConnectorAvailable)
      assert(Sinks.build(EtlConfig.default.copy(outputType = "kafka",
        outputPath = "no-topic")).swap.toOption.get.contains("bootstrap-servers/topic"))
    assert(Sinks.build(EtlConfig.default.copy(outputType = "nope")).isLeft)
  }

  test("parquet sink: round-trips the normalized schema") {
    val dir = java.nio.file.Files.createTempDirectory("pq")
    val df = normalized(recordLine)
    val res = new Sinks.ParquetSink(s"$dir/out").write(df)
    assert(res.writtenOk == 1)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 1)
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("sink lifecycle: second write on the same instance appends, fresh instance truncates") {
    def rec(i: Int) =
      s"""{"ts":"2025-01-01T00:00:00Z","level":"INFO","msg":"m$i"}"""
    val dir = java.nio.file.Files.createTempDirectory("appnd")

    // FileSink: batch 2 must extend batch 1's file
    val f = new Sinks.FileSink(s"$dir/out.jsonl")
    assert(f.write(normalized(rec(1), rec(2))).writtenOk == 2)
    assert(f.write(normalized(rec(3))).writtenOk == 1)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/out.jsonl"))
    assert(lines.size == 3, s"expected 3 cumulative lines, got $lines")
    // a NEW instance starts fresh (one-shot CLI semantics)
    assert(new Sinks.FileSink(s"$dir/out.jsonl")
      .write(normalized(rec(9))).writtenOk == 1)
    assert(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/out.jsonl")).size == 1)

    // ParquetSink: append across writes on one instance
    val p = new Sinks.ParquetSink(s"$dir/pq")
    p.write(normalized(rec(1)))
    p.write(normalized(rec(2)))
    assert(spark.read.parquet(s"$dir/pq").count() == 2)

    // RotatingSink: rotation state (index/size) survives across writes
    val r = new Sinks.RotatingSink(s"$dir/rot.jsonl", maxBytes = 10000,
      maxFiles = 3)
    r.write(normalized(rec(1)))
    r.write(normalized(rec(2)))
    assert(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/rot.jsonl")).size == 2)
  }
  test("render: a string field that LOOKS like JSON but is not stays quoted") {
    // "{oops" must not be emitted raw — the whole line would be invalid
    val dir = java.nio.file.Files.createTempDirectory("jsonq")
    val out = s"$dir/out.jsonl"
    new Sinks.FileSink(out).write(normalized(
      """{"ts":"2025-01-01T00:00:00Z","level":"INFO","msg":"x","bad":"{oops","good":"{\"a\":1}","num":"5"}"""))
    val line = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(out)).get(0)
    // the full line must parse as JSON
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(line.contains(""""bad":"{oops""""))
    assert(line.contains(""""good":{"a":1}""")) // valid JSON stays raw
    assert(line.contains(""""num":5"""))
  }

  test("fresh pipeline run truncates the DLQ (os.Create parity); resume keeps it") {
    val dir = java.nio.file.Files.createTempDirectory("dlqfresh")
    val path = s"$dir/dlq.jsonl"
    Sinks.writeDlq(path, Seq(("""{"TS":"stale"}""", "old failure")))
    assert(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).size == 1)
    Sinks.initDlq(path) // what a fresh run does before writing
    assert(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).isEmpty, "fresh run must truncate")
    Sinks.writeDlq(path, Seq(("""{"TS":"new"}""", "boom")))
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.size == 1 && lines.get(0).contains("new"))
  }

  test("rotating sink: oversized record rotates even into an empty base (rotate.go:41)") {
    val dir = java.nio.file.Files.createTempDirectory("rotbig")
    val base = s"$dir/out.jsonl"
    val sink = new Sinks.RotatingSink(base, maxBytes = 10, maxFiles = 5)
    sink.write(normalized(recordLine)) // record far over 10 bytes
    // rotate happens BEFORE the first write, like rotate.go:41 (no
    // size>0 guard); in this sink's documented ordering (base oldest →
    // base.N newest) the empty base is left behind and the record
    // lands in the fresh base.1
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(base)) == 0)
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(s"$base.1")) > 0)
  }

  test("builder floors zero config values like the reference") {
    // output_max_bytes=0 must mean 10MB, not rotate-per-record
    val dir = java.nio.file.Files.createTempDirectory("floors")
    val cfg = EtlConfig.default.copy(outputType = "rotate",
      outputPath = s"$dir/r.jsonl", outputMaxBytes = 0, outputMaxFiles = 0,
      sinkBackoffBaseMs = 0, sinkBackoffMaxMs = 0)
    val sink = Sinks.build(cfg).fold(e => fail(e), identity)
    sink.write(normalized(recordLine, recordLine, recordLine))
    assert(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/r.jsonl")).size == 3,
      "3 small records must stay in one un-rotated file under the 10MB floor")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/r.jsonl.1")))
  }
}
