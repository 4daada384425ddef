package graft.etl.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.ops.TextAnalysis

/** Catalyst builders for the curation gates' SQL surface.
  *
  * `SparkSessionExtensions.injectFunction` must return a CATALYST
  * expression tree — a Column built with the DSL carries unresolved
  * ColumnNodes that SQL analysis never converts (executing one dies
  * with `Cannot evaluate expression: columnnodeexpression(...)`), so
  * the SQL functions cannot literally delegate to the Column ops.
  * These builders restate them at the catalyst level, and
  * QueriesSpec's mirror test holds the two surfaces together: for a
  * probe set covering every branch (valid/invalid cards, mixed PII,
  * control chars, stopword text), the SQL function and the Column op
  * must produce identical results — a fork fails the suite instead of
  * shipping (the r8 `scrub_pii` card-stage gap, made impossible to
  * repeat silently).
  *
  * Regex/threshold constants come FROM [[TextAnalysis]] — only the
  * expression plumbing is restated, never the semantics' parameters.
  */
object CurationSqlExprs {

  private def v(name: String) = UnresolvedNamedLambdaVariable(Seq(name))
  private def lit(s: String) = Literal.create(s)

  /** Luhn checksum over a digit-string expression — the catalyst form
    * of [[TextAnalysis.luhnValid]]. */
  def luhnValid(digits: Expression): Expression = {
    val rev = Reverse(digits)
    val i = v("i")
    val d = Cast(Substring(rev, i, Literal(1)), IntegerType)
    val doubled = Multiply(d, Literal(2))
    val contrib = CaseWhen(
      Seq((EqualTo(Remainder(Subtract(i, Literal(1)), Literal(2)),
        Literal(0)), d)),
      Some(CaseWhen(
        Seq((GreaterThan(doubled, Literal(9)),
          Subtract(doubled, Literal(9)))),
        Some(doubled))))
    val contribs = ArrayTransform(
      new Sequence(Literal(1), Length(rev)),
      LambdaFunction(contrib, Seq(i)))
    val (a, x, f) = (v("a"), v("x"), v("f"))
    val sum = ArrayAggregate(contribs, Literal(0),
      LambdaFunction(Add(a, x), Seq(a, x)),
      LambdaFunction(f, Seq(f)))
    EqualTo(Remainder(sum, Literal(10)), Literal(0))
  }

  /** Luhn-valid card matches of a text expression
    * ([[TextAnalysis.validCardNumbers]]). */
  def validCardNumbers(text: Expression): Expression = {
    val c = v("c")
    ArrayFilter(
      RegExpExtractAll(text, lit(TextAnalysis.CardCandidateRe), Literal(0)),
      LambdaFunction(
        luhnValid(RegExpReplace(c, lit("[ -]"), lit(""))), Seq(c)))
  }

  /** The full content-PII chain ([[TextAnalysis.scrubPii]]): email →
    * Luhn-valid cards (literal replace-fold) → IPv4 → phone. */
  def scrubPii(text: Expression): Expression = {
    val afterEmail =
      RegExpReplace(text, lit(TextAnalysis.EmailRe), lit("<EMAIL>"))
    val (acc, c, f) = (v("acc"), v("cc"), v("fin"))
    val afterCards = ArrayAggregate(
      validCardNumbers(afterEmail), afterEmail,
      LambdaFunction(StringReplace(acc, c, lit("<CC>")), Seq(acc, c)),
      LambdaFunction(f, Seq(f)))
    RegExpReplace(
      RegExpReplace(afterCards, lit(TextAnalysis.Ipv4Re), lit("<IP>")),
      lit(TextAnalysis.PhoneRe), lit("<PHONE>"))
  }

  /** [[TextAnalysis.canonicalText]] at the catalyst level. */
  def canonicalText(text: Expression): Expression =
    Lower(StringTrim(RegExpReplace(
      RegExpReplace(text, lit("[\\x00-\\x1f\\x7f]"), lit(" ")),
      lit(" +"), lit(" "))))

  /** [[TextAnalysis.qualityScore]] at the catalyst level (same
    * weights, same stopword list — both read from TextAnalysis). */
  def qualityScore(text: Expression): Expression = {
    val toks = StringSplit(text, lit(" "), Literal(-1))
    val n = Cast(Size(toks), DoubleType)
    val nd = Cast(Size(ArrayDistinct(toks)), DoubleType)
    val t = v("t")
    val st = Cast(Size(ArrayFilter(toks,
      LambdaFunction(
        In(t, TextAnalysis.Stopwords.map(Literal.create(_))), Seq(t)))),
      DoubleType)
    def d(x: Double) = Literal(x)
    Round(
      Add(
        Add(
          Multiply(Least(Seq(Divide(n, d(100.0)), d(1.0))), d(0.4)),
          Multiply(Divide(nd, n), d(0.4))),
        Multiply(Subtract(d(1.0), Divide(st, n)), d(0.2))),
      Literal(4))
  }
}
