package graft.etl.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All nine Gopher repetition metrics (Rae et al. 2021, arXiv:2112.11446
  * A1.1) from one token array in ONE compiled pass.
  *
  * Input: the document's token array (the pinned single-space tokenizer,
  * [[graft.ops.TextAnalysis.tokens]]). Output: `array<long>` of 9 char
  * counts, index k ↔ gram size n = k + 2:
  *
  *   - n = 2..4: occurrences × char length of the single most frequent
  *     n-gram (ties → lexicographically smallest by BINARY order, the
  *     same tie-break as `min(struct(-count, gram))` and the DuckDB
  *     oracle's `ORDER BY c DESC, g` under its default binary collation
  *     — `UTF8String.compareTo` is byte-wise unsigned, which equals
  *     code-point order for UTF-8);
  *   - n = 5..10: Σ occurrences × char length over every n-gram that
  *     appears more than once.
  *
  * Char length is `UTF8String.numChars` = code points, matching both
  * Spark's and DuckDB's `length()`. Grams are built with
  * `UTF8String.concatWs`, the engine behind SQL `concat_ws(" ", …)`, so
  * the gram strings are bit-identical to the column-expression form
  * ([[graft.ops.TextAnalysis.ngramsFromTokens]]) they replace.
  *
  * Why an expression and not columns: every declarative formulation of
  * this battery measured worse — exploding (doc, n, gram) rows costs a
  * 9·T row fan-out plus two hash-aggregate shuffles (r11: behind a
  * 9-scan union; r12: behind a per-row 9-array concat that was 3.7×
  * slower still), and the higher-order `aggregate` run-length fold pays
  * per-ELEMENT interpretation. Here the whole battery is one static
  * Java call per document inside whole-stage codegen: one scan, zero
  * shuffle, zero cache, per-doc-bounded memory — a pathological
  * repeated-phrase document collapses inside its own hash map and can
  * never become a hot reduce key.
  */
case class GopherRepMetrics(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_rep_metrics"

  override def nullSafeEval(input: Any): Any =
    GopherRepMetrics.metrics(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GopherRepMetrics.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.metrics($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRepMetrics =
    copy(child = newChild)
}

object GopherRepMetrics {

  private val Sep = UTF8String.fromString(" ")
  private val MinN = 2
  private val MaxN = 10

  /** Static entry for interpreted eval and generated code. */
  def metrics(arr: ArrayData): ArrayData = {
    val t = arr.numElements()
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](MaxN - MinN + 1)
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var n = MinN
    while (n <= MaxN) {
      if (t >= n) {
        counts.clear()
        i = 0
        while (i <= t - n) {
          val gram = UTF8String.concatWs(Sep,
            java.util.Arrays.copyOfRange(toks, i, i + n): _*)
          val c = counts.get(gram)
          if (c == null) counts.put(gram, Array(1)) else c(0) += 1
          i += 1
        }
        var metric = 0L
        if (n <= 4) {
          var bestC = 0
          var bestG: UTF8String = null
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue()(0)
            if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
              bestC = c; bestG = e.getKey
            }
          }
          if (bestG != null) metric = bestC.toLong * bestG.numChars()
        } else {
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue()(0)
            if (c > 1) metric += c.toLong * e.getKey.numChars()
          }
        }
        out(n - MinN) = metric
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}
