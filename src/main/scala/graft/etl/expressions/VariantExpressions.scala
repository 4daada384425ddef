package graft.etl.expressions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Codegen-capable "residual JSON fields as VARIANT".
  *
  * The portable `fields` column is `map<string,string>` (raw JSON text
  * for non-string values — SURVEY §7.4 option a), which loses the
  * distinction the reference keeps in `Fields map[string]any`
  * (`/root/reference/internal/stages/normalize.go:151-172`): JSON
  * number `123` and JSON string `"123"` both arrive as `"123"`.
  * This expression is option b: parse the ORIGINAL line, drop the
  * canonical keys, and emit the remaining object as a Spark 4
  * `VariantType` value — typed access via `variant_get(fields_v,
  * '$.status', 'int')`, `fields_v:a.b` path extraction, and
  * `schema_of_variant`, with the type information intact.
  *
  * Same failure contract as [[JsonToStringMap]]: null (never a throw)
  * for non-object / malformed / trailing-garbage input. Duplicate keys:
  * last wins (Go map unmarshal semantics).
  */
case class JsonResidualVariant(child: Expression, dropKeys: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
  override def dataType: DataType = VariantType
  override def nullable: Boolean = true
  override def prettyName: String = "json_residual_variant"

  @transient private lazy val keySet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    dropKeys.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    JsonResidualVariant.parse(input.asInstanceOf[UTF8String], keySet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JsonResidualVariant.getClass.getName.stripSuffix("$")
    val setRef = ctx.addReferenceObj("dropKeySet", keySet,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.parse($c, $setRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonResidualVariant =
    copy(child = newChild)
}

object JsonResidualVariant {
  private val factory = new JsonFactory()

  /** Static entry used by interpreted eval and generated code: strip
    * `drop` keys from the top-level object, then build the VARIANT
    * binary from the residual JSON. Returns null on anything the Go
    * `json.Unmarshal`-to-map would reject. */
  def parse(s: UTF8String, drop: java.util.HashSet[String]): VariantVal = {
    if (s == null) return null
    try {
      val parser = factory.createParser(s.getBytes)
      try {
        if (parser.nextToken() != JsonToken.START_OBJECT) return null
        val sw = new java.io.StringWriter()
        val gen = factory.createGenerator(sw)
        gen.writeStartObject()
        var tok = parser.nextToken()
        while (tok == JsonToken.FIELD_NAME) {
          val key = parser.currentName()
          parser.nextToken()
          if (drop.contains(key)) parser.skipChildren()
          else {
            gen.writeFieldName(key)
            gen.copyCurrentStructure(parser)
          }
          tok = parser.nextToken()
        }
        if (tok != JsonToken.END_OBJECT) return null
        if (parser.nextToken() != null) return null // trailing garbage
        gen.writeEndObject()
        gen.close()
        // allowDuplicateKeys = true → last occurrence wins (Go parity)
        val v = org.apache.spark.types.variant.VariantBuilder
          .parseJson(sw.toString, true)
        new VariantVal(v.getValue, v.getMetadata)
      } finally parser.close()
    } catch {
      case _: Exception => null
    }
  }
}
