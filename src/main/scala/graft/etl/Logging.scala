package graft.etl

/** Operational structured logging — the Spark-side analogue of the
  * reference's slog wrapper (`/root/reference/internal/logger/
  * logger.go:1-95`): a process-global logger with JSON (default) or
  * text handlers on stderr, level gating, and bound attributes
  * (`With("trace_id", …)` → [[EtlLogger.withAttrs]]).
  *
  * Go slog's JSON line shape is reproduced:
  * `{"time":"…","level":"INFO","msg":"…",<attrs…>}` with RFC3339Nano
  * time, so downstream log pipelines written against the reference
  * parse these lines unchanged. Operational logging only — data-path
  * records never go through here.
  */
object EtlLogger {

  sealed abstract class Level(val rank: Int, val name: String)
  case object Debug extends Level(0, "DEBUG")
  case object Info extends Level(1, "INFO")
  case object Warn extends Level(2, "WARN")
  case object Error extends Level(3, "ERROR")

  @volatile private var minLevel: Level = Info
  @volatile private var json: Boolean = true
  @volatile private var out: java.io.PrintStream = System.err
  /** Injectable clock for deterministic tests. */
  @volatile private[etl] var now: () => java.time.Instant =
    () => java.time.Instant.now()

  def setLevel(l: Level): Unit = minLevel = l
  def setJsonHandler(): Unit = json = true
  def setTextHandler(): Unit = json = false
  private[etl] def setOutput(ps: java.io.PrintStream): Unit = out = ps

  /** A logger with attributes bound to every line (slog's `With`);
    * the reference injects `trace_id` this way (`logger.go:42-54`). */
  def withAttrs(attrs: (String, Any)*): BoundLogger = new BoundLogger(attrs)

  final class BoundLogger private[EtlLogger] (bound: Seq[(String, Any)]) {
    def debug(msg: String, attrs: (String, Any)*): Unit =
      log(Debug, msg, bound ++ attrs)
    def info(msg: String, attrs: (String, Any)*): Unit =
      log(Info, msg, bound ++ attrs)
    def warn(msg: String, attrs: (String, Any)*): Unit =
      log(Warn, msg, bound ++ attrs)
    def error(msg: String, attrs: (String, Any)*): Unit =
      log(Error, msg, bound ++ attrs)
  }

  def debug(msg: String, attrs: (String, Any)*): Unit = log(Debug, msg, attrs)
  def info(msg: String, attrs: (String, Any)*): Unit = log(Info, msg, attrs)
  def warn(msg: String, attrs: (String, Any)*): Unit = log(Warn, msg, attrs)
  def error(msg: String, attrs: (String, Any)*): Unit = log(Error, msg, attrs)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    // JSON has no NaN/Infinity tokens — a bare NaN would make the whole
    // log line unparseable (slog quotes them too: +Inf etc. are emitted
    // as strings by encoding/json-compatible handlers)
    case n: Float if java.lang.Float.isFinite(n) => n.toString
    case n: Double if java.lang.Double.isFinite(n) => n.toString
    case n @ (_: Float | _: Double) => "\"" + n.toString + "\""
    case other => "\"" + esc(other.toString) + "\""
  }

  private[etl] def render(level: Level, msg: String,
      attrs: Seq[(String, Any)]): String = {
    val ts = java.time.format.DateTimeFormatter.ISO_INSTANT.format(now())
    if (json) {
      val sb = new StringBuilder(96)
      sb ++= s"""{"time":"$ts","level":"${level.name}","msg":"${esc(msg)}""""
      attrs.foreach { case (k, v) => sb ++= s""","${esc(k)}":${jsonValue(v)}""" }
      sb += '}'
      sb.toString
    } else {
      val kv = attrs.map { case (k, v) => s"$k=$v" }.mkString(" ")
      s"time=$ts level=${level.name} msg=${'"'}${esc(msg)}${'"'}" +
        (if (kv.isEmpty) "" else s" $kv")
    }
  }

  private def log(level: Level, msg: String, attrs: Seq[(String, Any)]): Unit =
    if (level.rank >= minLevel.rank) out.println(render(level, msg, attrs))
}
