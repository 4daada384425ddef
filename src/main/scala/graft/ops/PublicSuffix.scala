package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Public-suffix-list lookup for registrable-domain grouping
  * (`tx_domain_stats` — per-domain corpus composition and blocklists
  * group crawl text by the domain a REGISTRANT controls, and the
  * naive last-two-labels key mis-buckets every `co.uk`/`co.jp`-class
  * host under its registry suffix).
  *
  * The rule set is a committed snapshot of the public list's full
  * ICANN section (`graft/public_suffix_snapshot.dat`, provenance +
  * refresh path in its header; 7,380 rules). Matching is the PSL
  * algorithm with rule-arity classes DERIVED from the data (plain
  * rules grouped by label count, wildcard bases and exceptions
  * likewise), so a refreshed list with new shapes needs no code
  * change: exception rules win outright (suffix = exception minus its
  * first label), otherwise the longest matching rule wins (a wildcard
  * `*.base` has effective length labels(base)+1), unmatched hosts
  * fall to the implicit 1-label rule. Everything compiles to pure
  * column expressions — `In` over >10 literals optimizes to an O(1)
  * `InSet` hash probe per row inside whole-stage codegen, no UDF, no
  * shuffle; at the full section's 5,900 multi-label rules this is a
  * handful of set probes per row (1-label plain rules coincide with
  * the implicit rule and are skipped outright).
  */
object PublicSuffix {

  private val ruleLines: Vector[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "public_suffix_snapshot.dat missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
    finally in.close()
  }

  private def labels(r: String): Int = r.count(_ == '.') + 1

  /** Exception rules, stored without the '!', grouped by label count.
    * A host whose last e labels equal an exception has public suffix =
    * the exception's last e-1 labels. */
  val exceptionsByArity: Map[Int, Seq[String]] = ruleLines
    .filter(_.startsWith("!")).map(_.drop(1)).groupBy(labels)
  /** Wildcard bases (`*.ck` stored as `ck`), grouped by label count.
    * A base of b labels makes a public suffix of b+1 labels. */
  val wildcardBasesByArity: Map[Int, Seq[String]] = ruleLines
    .filter(_.startsWith("*.")).map(_.drop(2)).groupBy(labels)
  /** Plain rules of >= 2 labels by label count (1-label plain rules
    * give the same answer as the implicit `*` fallback, so they never
    * need a probe). */
  val plainByArity: Map[Int, Seq[String]] = ruleLines
    .filterNot(l => l.startsWith("!") || l.startsWith("*."))
    .groupBy(labels).filter(_._1 >= 2)

  /** Effective suffix lengths present in the snapshot, longest first:
    * plain arity a contributes a; wildcard base arity b contributes
    * b+1. */
  private val effectiveLens: Seq[Int] =
    (plainByArity.keySet ++ wildcardBasesByArity.keySet.map(_ + 1))
      .toSeq.sorted.reverse

  /** Exception arities, longest first (more-specific carve-out wins). */
  private val exceptionLens: Seq[Int] =
    exceptionsByArity.keySet.toSeq.sorted.reverse

  /** Registrable domain as a raw catalyst expression — the CANONICAL
    * implementation: the Column API and the injected SQL function
    * (`registrable_domain`) both delegate here, so the two surfaces
    * cannot fork. (A Column-built tree cannot be handed to
    * `injectFunction` — its ColumnNode wrappers are never converted on
    * the SQL path — hence catalyst-first, Column-wrapped.) */
  def registrableDomainExpr(host: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    def i(v: Int) = Literal.create(v)
    def strings(xs: Seq[String]) = xs.map(Literal.create(_))
    val parts = StringSplit(host, Literal.create("\\."), i(-1))
    val n = Size(parts, legacySizeOfNull = false)
    // last k labels; the whole host when it has fewer (which then
    // cannot equal any k-label rule, so the clamp never false-matches)
    def lastLabels(k: Int): Expression =
      ConcatWs(Seq(Literal.create("."),
        Slice(parts, Greatest(Seq(Add(Subtract(n, i(k)), i(1)), i(1))), i(k))))
    // precedence: exceptions (longest first) beat everything; then the
    // longest matching rule, where plain arity L and wildcard base
    // arity L-1 both yield suffix length L (disjoint-or-equal, order
    // within a length immaterial); then the implicit 1-label rule
    val exceptionArms = exceptionLens.map { e =>
      (In(lastLabels(e), strings(exceptionsByArity(e))), i(e - 1))
    }
    val ruleArms = effectiveLens.flatMap { l =>
      plainByArity.get(l).map(rs => (In(lastLabels(l), strings(rs)), i(l))) ++
        wildcardBasesByArity.get(l - 1)
          .map(bs => (In(lastLabels(l - 1), strings(bs)), i(l)))
    }
    val suffixLen = CaseWhen(exceptionArms ++ ruleArms, Some(i(1)))
    val take = Least(Seq(Add(suffixLen, i(1)), n))
    ConcatWs(Seq(Literal.create("."),
      Slice(parts, Greatest(Seq(Add(Subtract(n, take), i(1)), i(1))), take)))
  }

  /** Registrable domain of a (lower-cased) host column: public suffix
    * per the snapshot + one label. A host that IS a public suffix (or
    * shorter) returns itself — the full algorithm's "no registrable
    * domain" answer collapsed to a stable grouping key (disclosed in
    * the snapshot header). */
  def registrableDomain(host: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      registrableDomainExpr(
        org.apache.spark.sql.graft.Bridge.expression(host)))

  private def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  /** DuckDB replay of the public-suffix-length lookup, as a CASE over
    * a label-array column `w` (`string_split(host, '.')`). Generated
    * from the SAME snapshot AND the same derived arity classes as
    * [[registrableDomainExpr]], so the oracle's rule sets cannot fork
    * from the engine's; an absent arity class emits no WHEN clause at
    * all (never an invalid empty `IN ()`). */
  def duckdbSuffixLenCase(w: String): String = {
    def lastLabels(k: Int) =
      s"array_to_string($w[greatest(len($w)-${k - 1},1):len($w)], '.')"
    val exceptionArms = exceptionLens.map { e =>
      s"WHEN ${lastLabels(e)} IN ${inList(exceptionsByArity(e))} THEN ${e - 1}"
    }
    val ruleArms = effectiveLens.flatMap { l =>
      plainByArity.get(l)
        .map(rs => s"WHEN ${lastLabels(l)} IN ${inList(rs)} THEN $l") ++
        wildcardBasesByArity.get(l - 1)
          .map(bs => s"WHEN ${lastLabels(l - 1)} IN ${inList(bs)} THEN $l")
    }
    (exceptionArms ++ ruleArms).mkString("CASE ", " ", " ELSE 1 END")
  }

  /** DuckDB replay of the registrable-domain slice given the label
    * array `w` and a suffix-length column `plen`. */
  def duckdbDomainSlice(w: String, plen: String): String =
    s"array_to_string($w[greatest(len($w) - least($plen + 1, len($w)) + 1, 1)" +
      s":len($w)], '.')"
}
