package graft.etl.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram TF featurization of one document in ONE compiled
  * pass — `struct(_bs array<bigint>, _xs array<double>)`: bucket ids
  * ascending with the −1 intercept appended, and the matching
  * occurrence-count / total-grams ratios with the intercept's 1.0.
  *
  * Replaces the r13 five-operator featurize pipeline (per-doc substring
  * ARRAY build → explode to one row per occurrence → bucket hash →
  * shuffle groupBy (doc, bucket) → shuffle groupBy (doc) collect_list
  * + sort) with a zero-shuffle projection: the r14 probe measured that
  * pipeline at 2.7 s of tx_langid's 5.5 s at sf0.1 — pure explode
  * traffic and double shuffles over corpus-character-proportional rows
  * for a result that is per-doc-local by definition.
  *
  * EXACTNESS CONTRACT (every LID training oracle replays unchanged):
  * grams are SQL-substring semantics over code points
  * (`UTF8String.substringSQL`, bit-equal to `Column.substr`); a doc
  * shorter than n contributes its whole text as ONE gram (the
  * [[graft.ops.TextAnalysis.charNgrams]] fallback); bucket =
  * pmod(signed-low-64-md5(gram), numBuckets) — the md5Low64 rule;
  * x = occurrences/totalGrams with the same long→double division.
  * Buckets sort ascending (they are distinct per doc, so the order
  * equals the old sort_array of (b, x) structs).
  *
  * The gram→hash map is cached process-wide (n-gram space is
  * alphabet-bounded; capped, falls back to direct hashing when full),
  * so steady-state featurization computes ~zero md5s. */
case class CharGramFeatures(child: Expression, n: Int, numBuckets: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be positive, got $n")
  require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
    s"numBuckets must be a power of two, got $numBuckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string document, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("_bs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("_xs", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "char_gram_features"

  override def nullSafeEval(input: Any): Any =
    CharGramFeatures.featurize(input.asInstanceOf[UTF8String], n, numBuckets)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = CharGramFeatures.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.featurize($c, $n, $numBuckets);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharGramFeatures = copy(child = newChild)
}

object CharGramFeatures {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Process-wide gram → signed-low-64-md5 cache (numBuckets applies
    * after, so one cache serves every width). Alphabet-bounded in
    * practice; the cap guards adversarial unicode corpora. */
  private val CacheCap = 1 << 20
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def md5Low64(s: String): Long = {
    val cached = cache.get(s)
    if (cached != null) return cached.longValue()
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    if (cache.size < CacheCap) cache.put(s, java.lang.Long.valueOf(v))
    v
  }

  /** Static entry for interpreted eval and generated code. */
  def featurize(text: UTF8String, n: Int,
      numBuckets: Int): GenericInternalRow = {
    val len = text.numChars()
    // SQL-substring gram extraction (code points); short doc → the
    // whole text as one gram (the charNgrams fallback)
    val grams =
      if (len >= n) {
        val out = new Array[String](len - n + 1)
        var i = 1
        while (i <= len - n + 1) {
          out(i - 1) = text.substringSQL(i, n).toString
          i += 1
        }
        out
      } else Array(text.toString)
    val total = grams.length.toDouble
    // occurrence counts per distinct gram, then bucket-level sums
    val byBucket = new java.util.TreeMap[Long, Long]()
    val byGram = new java.util.HashMap[String, Array[Long]]()
    var g = 0
    while (g < grams.length) {
      val c = byGram.get(grams(g))
      if (c != null) c(0) += 1L
      else byGram.put(grams(g), Array(1L))
      g += 1
    }
    val it = byGram.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nb = numBuckets.toLong
      val b = ((md5Low64(e.getKey) % nb) + nb) % nb
      val prev = byBucket.get(b)
      byBucket.put(b, (if (prev == null) 0L else prev.longValue()) +
        e.getValue()(0))
    }
    val m = byBucket.size()
    val bs = new Array[Any](m + 1)
    val xs = new Array[Any](m + 1)
    val bit = byBucket.entrySet().iterator()
    var k = 0
    while (bit.hasNext) {
      val e = bit.next()
      bs(k) = e.getKey.longValue()
      xs(k) = e.getValue.longValue().toDouble / total
      k += 1
    }
    bs(m) = -1L
    xs(m) = 1.0
    new GenericInternalRow(Array[Any](
      new GenericArrayData(bs), new GenericArrayData(xs)))
  }
}
