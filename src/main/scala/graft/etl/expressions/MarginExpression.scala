package graft.etl.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sparse linear margin Σ w[b]·x over a doc's parallel (buckets,
  * values) feature arrays, under a frozen weight map — ONE compiled
  * loop per row.
  *
  * Drop-in replacement for the interpreted higher-order form
  * `aggregate(zip_with(bs, xs, (b,x) → coalesce(w[b],0)·x), 0, +)`
  * that the LID / quality-classifier paths evaluated once per row PER
  * CLASS PER EPOCH (the GopherRepMetrics lesson yet again: HOFs stay
  * outside whole-stage codegen and re-walk the lambda per element).
  *
  * EXACTNESS CONTRACT (what keeps every training oracle untouched):
  * terms accumulate in ARRAY ORDER — the buckets are sorted at
  * featurize time precisely so the summation order is deterministic —
  * and a missing bucket contributes +0.0, which IEEE addition makes
  * bit-identical to skipping the term, so the compiled skip-missing
  * loop reproduces the interpreted coalesce-to-zero chain double for
  * double. The DECIMAL(38,12) margin rounding stays OUTSIDE this
  * expression, exactly where it was.
  *
  * The weight map rides as a serialized reference object, never as
  * literals (the UnigramViterbi precedent — literal maps of ~1k
  * entries per class per epoch built multi-thousand-node plans whose
  * analysis time dwarfed the data). */
case class SparseMargin(left: Expression, right: Expression,
    weights: java.util.HashMap[java.lang.Long, java.lang.Double])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_margin"

  override def nullSafeEval(bs: Any, xs: Any): Any =
    SparseMargin.margin(bs.asInstanceOf[ArrayData],
      xs.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = SparseMargin.getClass.getName.stripSuffix("$")
    val wm = ctx.addReferenceObj("marginWeights", weights,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (b, x) =>
      s"${ev.value} = $cls.margin($b, $x, $wm);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SparseMargin =
    copy(left = newLeft, right = newRight)
}

object SparseMargin {

  def build(w: Map[Long, Double])
      : java.util.HashMap[java.lang.Long, java.lang.Double] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Double](
      w.size * 2)
    w.foreach { case (k, v) =>
      m.put(java.lang.Long.valueOf(k), java.lang.Double.valueOf(v))
    }
    m
  }

  /** Static entry for interpreted eval and generated code. Terms add
    * in array order; missing buckets skip (≡ +0.0). */
  def margin(bs: ArrayData, xs: ArrayData,
      w: java.util.HashMap[java.lang.Long, java.lang.Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = bs.numElements()
    while (i < n) {
      val p = w.get(java.lang.Long.valueOf(bs.getLong(i)))
      if (p != null) acc += p.doubleValue() * xs.getDouble(i)
      i += 1
    }
    acc
  }
}
