package graft.etl.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation of one word under a frozen piece
  * model, in ONE compiled pass per row.
  *
  * Input: the gated a-z word (≤ [[graft.ops.UnigramLm.MaxWordLen]]
  * chars). Output: `struct(n_uni int, uni_pieces string)` — the
  * Viterbi-best piece count and the '|'-joined piece stream.
  *
  * EXACTNESS CONTRACT (the whole reason the oracle can replay
  * training): only IEEE-754 multiply and compare — dp(i) is the max
  * over piece lengths l of dp(i−l)·p(piece ending at i) (max is
  * order-free over doubles), and the backtrace re-tests
  * dp(i−l)·p == dp(i) from the LONGEST l down (two distinct pieces of
  * equal length cannot end at one position, so the tie rule is total).
  * Identical operand bits ⇒ identical results in DuckDB's replay.
  *
  * Why an expression and not columns: the Column-program form (a
  * fixed MaxWordLen-step loop of projections, each step carrying
  * per-length lookups into an ~86-entry literal map) builds a
  * multi-thousand-node Catalyst tree whose analysis + codegen costs
  * ~4 s PER VITERBI PASS at any data size — a pure plan-time
  * pathology (the GopherRepMetrics lesson, r13): tx_unigram spent
  * 12.6 s at sf0.1 with the data itself being a 31-row word table.
  * The model is DATA-derived, so it rides along as a serialized
  * reference object rather than literals (the PqEncode precedent).
  *
  * A word containing a character outside the model's alphabet (the
  * base a-z alphabet is always in the vocabulary, so this is
  * unreachable for gated words) segments to the `(0, "")` sentinel
  * instead of failing — total-function rule. */
case class UnigramViterbi(child: Expression, pieces: Array[String],
    probs: Array[Double], maxPieceLen: Int) extends UnaryExpression {
  require(pieces.length == probs.length && pieces.nonEmpty,
    "model arrays must align and be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string word, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_uni", IntegerType, nullable = false),
    StructField("uni_pieces", StringType, nullable = false)))
  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val model: java.util.HashMap[String, java.lang.Double] =
    UnigramViterbi.buildModel(pieces, probs)

  override def nullSafeEval(input: Any): Any =
    UnigramViterbi.segment(input.asInstanceOf[UTF8String], model, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = UnigramViterbi.getClass.getName.stripSuffix("$")
    val pm = ctx.addReferenceObj("unigramModel", model, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.segment($c, $pm, $maxPieceLen);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramViterbi = copy(child = newChild)
}

/** Forward–backward expected piece counts of one word under a frozen
  * unigram piece model (Kudo 2018 §3's true E-step, vs
  * [[UnigramViterbi]]'s 1-best counts), in ONE compiled pass per row.
  *
  * Output: `array<struct<piece string, e double>>` — one entry per
  * piece OCCURRENCE in the word's lattice (end position × length, in
  * end-position-then-length order), `e` = the occurrence's posterior
  * expectation α(i−l)·p·β(i)/α(n). Per-occurrence (not per-piece)
  * output is deliberate: the caller rounds each occurrence's
  * contribution to DECIMAL(38,12) BEFORE summing, so corpus-level
  * expected counts are an exact decimal sum — order-free, replayable
  * — instead of a float sum whose value depends on partitioning.
  *
  * EXACTNESS CONTRACT (the oracle-replay rule): α accumulates
  * ascending l with skipped missing pieces — IEEE `x + 0.0 = x` makes
  * that bit-identical to the oracle's COALESCE(term, 0) left-assoc
  * chain; β the same backward; each occurrence computes
  * ((α·p)·β)/Z in exactly that association. Multiplication operand
  * order is commutative bit-for-bit; only ADDITION order has to be
  * pinned, and it is.
  *
  * A word with a non-alphabet character (unreachable for gated words)
  * yields the empty array — total-function rule. */
case class UnigramFBExpected(child: Expression, pieces: Array[String],
    probs: Array[Double], maxPieceLen: Int) extends UnaryExpression {
  require(pieces.length == probs.length && pieces.nonEmpty,
    "model arrays must align and be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string word, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("e", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "unigram_fb_expected"

  @transient private lazy val model: java.util.HashMap[String, java.lang.Double] =
    UnigramViterbi.buildModel(pieces, probs)

  override def nullSafeEval(input: Any): Any =
    UnigramFBExpected.expected(input.asInstanceOf[UTF8String], model,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = UnigramFBExpected.getClass.getName.stripSuffix("$")
    val pm = ctx.addReferenceObj("unigramFbModel", model, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.expected($c, $pm, $maxPieceLen);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramFBExpected = copy(child = newChild)
}

object UnigramFBExpected {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Static entry for interpreted eval and generated code. */
  def expected(word: UTF8String,
      pm: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int): GenericArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return Empty
    // forward: α(i) = Σ_{l asc} α(i−l)·p(s[i−l..i)) — skipped missing
    // terms are bit-identical to adding 0.0 (left-assoc)
    val a = new Array[Double](n + 1)
    a(0) = 1.0
    var i = 1
    while (i <= n) {
      var acc = 0.0
      var any = false
      var l = 1
      val lm = if (maxPieceLen < i) maxPieceLen else i
      while (l <= lm) {
        val p = pm.get(s.substring(i - l, i))
        if (p != null) { acc += a(i - l) * p.doubleValue(); any = true }
        l += 1
      }
      if (!any) return Empty // non-alphabet char: unreachable gated
      a(i) = acc
      i += 1
    }
    // backward: β(i) = Σ_{l asc} p(s[i..i+l))·β(i+l)
    val b = new Array[Double](n + 1)
    b(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var acc = 0.0
      var l = 1
      val lm = if (maxPieceLen < n - i) maxPieceLen else n - i
      while (l <= lm) {
        val p = pm.get(s.substring(i, i + l))
        if (p != null) acc += p.doubleValue() * b(i + l)
        l += 1
      }
      b(i) = acc
      i -= 1
    }
    val z = a(n)
    // occurrences in (end position, length) order
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * maxPieceLen)
    i = 1
    while (i <= n) {
      var l = 1
      val lm = if (maxPieceLen < i) maxPieceLen else i
      while (l <= lm) {
        val q = s.substring(i - l, i)
        val p = pm.get(q)
        if (p != null) {
          val e = ((a(i - l) * p.doubleValue()) * b(i)) / z
          out += InternalRow(UTF8String.fromString(q), e)
        }
        l += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object UnigramViterbi {

  def buildModel(pieces: Array[String],
      probs: Array[Double]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Double.valueOf(probs(i)))
      i += 1
    }
    m
  }

  private val Sentinel =
    InternalRow(0, UTF8String.fromString(""))

  /** Static entry for interpreted eval and generated code. */
  def segment(word: UTF8String,
      pm: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int): InternalRow = {
    val s = word.toString
    val n = s.length
    if (n == 0) return Sentinel
    // forward: dp(i) = best probability of segmenting the first i chars
    val dp = new Array[Double](n + 1)
    dp(0) = 1.0
    var i = 1
    while (i <= n) {
      var best = 0.0
      var found = false
      var l = 1
      val lm = if (maxPieceLen < i) maxPieceLen else i
      while (l <= lm) {
        val p = pm.get(s.substring(i - l, i))
        if (p != null) {
          val v = dp(i - l) * p.doubleValue()
          if (!found || v > best) { best = v; found = true }
        }
        l += 1
      }
      if (!found) return Sentinel // non-alphabet char: unreachable gated
      dp(i) = best
      i += 1
    }
    // backtrace: longest piece whose product EXACTLY equals dp(pos)
    val parts = new Array[String](n)
    var cnt = 0
    var pos = n
    while (pos > 0) {
      var pick = 0
      var l = if (maxPieceLen < pos) maxPieceLen else pos
      while (l >= 1 && pick == 0) {
        val p = pm.get(s.substring(pos - l, pos))
        if (p != null && dp(pos - l) * p.doubleValue() == dp(pos)) pick = l
        l -= 1
      }
      if (pick == 0) return Sentinel // cannot happen: dp(pos) is one of these
      parts(cnt) = s.substring(pos - pick, pos)
      cnt += 1
      pos -= pick
    }
    val sb = new java.lang.StringBuilder(n + cnt)
    var k = cnt - 1
    while (k >= 0) {
      sb.append(parts(k))
      if (k > 0) sb.append('|')
      k -= 1
    }
    InternalRow(cnt, UTF8String.fromString(sb.toString))
  }
}
