package graft.etl.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass strict RFC3339 validate + parse + re-render.
  *
  * The column-expression form of the timestamp path was SIX chained
  * regex/format operations per record (shape `rlike`, two
  * `regexp_extract` for the zone, `try_to_timestamp`, two
  * `date_format` + `regexp_replace` for the RFC3339Nano render) — the
  * hottest part of normalize. This expression does the same work in a
  * single character-level scan, preserving the EXACT accept/reject and
  * render semantics of that path (oracle-verified):
  *
  *   - shape: `YYYY-MM-DDTHH:MM:SS(.d{1,9})?(Z|±HH:MM)` — Go
  *     `time.RFC3339` strictness (`normalize.go:192-206`);
  *   - ranges: proleptic-Gregorian field validation (java.time), the
  *     same set Spark's `stringToTimestamp` accepts; offsets beyond
  *     ±18:00 rejected (ZoneOffset limit); fraction of any length
  *     accepted, truncated to micros (Spark timestamp precision);
  *   - render: Go `time.RFC3339Nano` — the input's own civil fields,
  *     fraction with trailing zeros trimmed (omitted when zero), `Z`
  *     for zero offset, otherwise the original `±HH:MM`.
  *
  * Output: `struct<us: bigint, off: int, rendered: string>` (UTC epoch
  * micros, zone offset seconds, re-rendered literal) — null when the
  * input is not a valid strict-RFC3339 timestamp.
  */
case class Rfc3339Parse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("us", LongType, nullable = false),
    StructField("off", IntegerType, nullable = false),
    StructField("rendered", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "rfc3339_parse"

  override def nullSafeEval(input: Any): Any =
    Rfc3339Parse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Rfc3339Parse.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Rfc3339Parse =
    copy(child = newChild)
}

object Rfc3339Parse {

  private def dig(s: String, i: Int): Int = {
    val c = s.charAt(i)
    if (c < '0' || c > '9') -1 else c - '0'
  }

  private def num2(s: String, i: Int): Int = {
    val a = dig(s, i); val b = dig(s, i + 1)
    if (a < 0 || b < 0) -1 else a * 10 + b
  }

  /** Static entry for interpreted eval and generated code. Returns the
    * result row or null (never throws). */
  def parse(u: UTF8String): InternalRow = {
    if (u == null) return null
    val s = u.toString
    val n = s.length
    if (n < 20) return null
    // fixed skeleton
    if (s.charAt(4) != '-' || s.charAt(7) != '-' || s.charAt(10) != 'T' ||
      s.charAt(13) != ':' || s.charAt(16) != ':') return null
    val y1 = num2(s, 0); val y2 = num2(s, 2)
    val mo = num2(s, 5); val da = num2(s, 8)
    val ho = num2(s, 11); val mi = num2(s, 14); val se = num2(s, 17)
    if (y1 < 0 || y2 < 0 || mo < 0 || da < 0 || ho < 0 || mi < 0 || se < 0)
      return null
    val year = y1 * 100 + y2
    // optional fraction: any number of digits, truncated (not rounded)
    // to micros — exactly Spark's stringToTimestamp and Go's
    // RFC3339Nano behavior (differentially tested in
    // TimestampParitySpec)
    var i = 19
    var micros = 0L
    if (s.charAt(i) == '.') {
      i += 1
      var cnt = 0
      var v = 0L
      while (i < n && dig(s, i) >= 0) {
        if (cnt < 6) v = v * 10 + dig(s, i)
        cnt += 1; i += 1
      }
      if (cnt == 0) return null
      var k = math.min(cnt, 6)
      while (k < 6) { v *= 10; k += 1 }
      micros = v
    }
    // zone suffix
    if (i >= n) return null
    var offSecs = 0
    val zc = s.charAt(i)
    if (zc == 'Z') {
      if (i + 1 != n) return null
    } else if (zc == '+' || zc == '-') {
      if (i + 6 != n || s.charAt(i + 3) != ':') return null
      val oh = num2(s, i + 1); val om = num2(s, i + 4)
      if (oh < 0 || om < 0 || om > 59) return null
      offSecs = oh * 3600 + om * 60
      if (zc == '-') offSecs = -offSecs
      if (math.abs(offSecs) > 18 * 3600) return null // ZoneOffset limit
    } else return null
    // range validation + epoch math via java.time (proleptic Gregorian,
    // the same accept set as Spark's stringToTimestamp)
    val epochSecs =
      try {
        java.time.LocalDateTime.of(year, mo, da, ho, mi, se)
          .toEpochSecond(java.time.ZoneOffset.ofTotalSeconds(offSecs))
      } catch { case _: java.time.DateTimeException => return null }
    val us = epochSecs * 1000000L + micros
    // render: the input's own civil fields; fraction from the
    // micro-truncated value, trailing zeros trimmed; Z for zero offset
    val sb = new java.lang.StringBuilder(30)
    sb.append(s, 0, 19)
    if (micros > 0) {
      var f = micros
      var width = 6
      while (f % 10 == 0) { f /= 10; width -= 1 }
      sb.append('.')
      val fs = java.lang.Long.toString(f)
      var p = fs.length
      while (p < width) { sb.append('0'); p += 1 }
      sb.append(fs)
    }
    if (offSecs == 0) sb.append('Z')
    else sb.append(s, n - 6, n)
    new GenericInternalRow(Array[Any](us, offSecs,
      UTF8String.fromString(sb.toString)))
  }
}
