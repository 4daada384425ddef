package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.etl.expressions.{JsonToStringMap, MapRemoveKeys}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT json_to_string_map(line) FROM logs")
  * spark.sql("SELECT map_remove_keys(fields, 'user_email', 'token') FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
  import org.apache.spark.unsafe.types.UTF8String

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("json_to_string_map"),
      new ExpressionInfo(classOf[JsonToStringMap].getName, "json_to_string_map"),
      (args: Seq[Expression]) => JsonToStringMap(args.head)))
    e.injectFunction((
      FunctionIdentifier("map_remove_keys"),
      new ExpressionInfo(classOf[MapRemoveKeys].getName, "map_remove_keys"),
      (args: Seq[Expression]) => MapRemoveKeys(args.head,
        args.tail.map {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"map_remove_keys: key arguments must be string literals, got $other")
        })))
  }
}
