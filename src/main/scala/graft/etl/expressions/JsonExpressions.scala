package graft.etl.expressions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-capable JSON-object → map<string,string> parse.
  *
  * Spark's `from_json` (JsonToStructs) is `CodegenFallback`: one
  * occurrence anywhere in a projection knocks the whole stage out of
  * whole-stage codegen and disables subexpression elimination — measured
  * ~4× on the normalize path (see Normalize scaladoc). This expression
  * has a real `doGenCode` (a static-call into [[JsonToStringMap.parse]])
  * so the surrounding projection stays codegen'd.
  *
  * Semantics match `from_json(line, "map<string,string>")` PERMISSIVE:
  *   - non-object / malformed / trailing-garbage input → null (the Go
  *     `json.Unmarshal` failure contract, `cmd/etl/main.go:365-374`);
  *   - string values decoded; scalar non-strings keep their raw literal
  *     text; nested objects/arrays keep compact JSON text;
  *   - duplicate keys: last value wins;
  *   - JSON null value → null map value.
  */
case class JsonToStringMap(child: Expression)
    extends UnaryExpression {

  // AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4 —
  // manual input type check instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "json_to_string_map"

  override def nullSafeEval(input: Any): Any =
    JsonToStringMap.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JsonToStringMap.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonToStringMap =
    copy(child = newChild)
}

object JsonToStringMap {
  private val factory = new JsonFactory()

  /** Static entry used by both interpreted eval and generated code.
    * Returns null (never throws) on anything Go's Unmarshal-to-map
    * would reject. */
  def parse(s: UTF8String): MapData = {
    if (s == null) return null
    try {
      val parser = factory.createParser(s.getBytes)
      try {
        if (parser.nextToken() != JsonToken.START_OBJECT) return null
        val keys = new java.util.LinkedHashMap[String, UTF8String]()
        var tok = parser.nextToken()
        while (tok == JsonToken.FIELD_NAME) {
          val key = parser.currentName()
          val v = parser.nextToken() match {
            case JsonToken.VALUE_STRING =>
              UTF8String.fromString(parser.getText)
            case JsonToken.VALUE_NULL => null
            case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT |
                JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE =>
              // raw literal text, exactly as from_json coerces scalars
              UTF8String.fromString(parser.getText)
            case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
              val sw = new java.io.StringWriter()
              val gen = factory.createGenerator(sw)
              gen.copyCurrentStructure(parser)
              gen.close()
              UTF8String.fromString(sw.toString)
            case _ => return null
          }
          keys.put(key, v)
          tok = parser.nextToken()
        }
        if (tok != JsonToken.END_OBJECT) return null
        if (parser.nextToken() != null) return null // trailing garbage
        val n = keys.size()
        val ks = new Array[AnyRef](n)
        val vs = new Array[AnyRef](n)
        var i = 0
        val it = keys.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          ks(i) = UTF8String.fromString(e.getKey)
          vs(i) = e.getValue
          i += 1
        }
        new ArrayBasedMapData(
          new GenericArrayData(ks), new GenericArrayData(vs))
      } finally parser.close()
    } catch {
      case _: Exception => null
    }
  }
}

/** Codegen-capable "drop these literal keys from a string map" — the
  * redaction/residual-fields primitive. `map_filter` is a
  * higher-order function (CodegenFallback + per-element lambda
  * dispatch); for a FIXED key set this is a single static call that
  * keeps the projection inside whole-stage codegen. */
case class MapRemoveKeys(child: Expression, removeKeys: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires map<string,string>, got $other")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "map_remove_keys"

  @transient private lazy val keySet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    removeKeys.foreach(k => s.add(UTF8String.fromString(k)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    MapRemoveKeys.remove(input.asInstanceOf[MapData], keySet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MapRemoveKeys.getClass.getName.stripSuffix("$")
    val setRef = ctx.addReferenceObj("removeKeySet", keySet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.remove($c, $setRef);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MapRemoveKeys =
    copy(child = newChild)
}

object MapRemoveKeys {
  def remove(m: MapData, drop: java.util.HashSet[UTF8String]): MapData = {
    val n = m.numElements()
    val keys = m.keyArray()
    val values = m.valueArray()
    val ks = new java.util.ArrayList[AnyRef](n)
    val vs = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val k = keys.getUTF8String(i)
      if (!drop.contains(k)) {
        ks.add(k)
        vs.add(if (values.isNullAt(i)) null else values.getUTF8String(i))
      }
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
  }
}

/** Codegen-capable dot product over two array<double> columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * two higher-order functions — interpreted, per-element lambda
  * dispatch, and run once per CANDIDATE PAIR in similarity search.
  * This is a single static tight loop; sequential-fold order matches
  * the oracle's list_sum semantics. */
case class ArrayDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ArrayDot.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.dot($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}
