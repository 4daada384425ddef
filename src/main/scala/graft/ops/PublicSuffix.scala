package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Public-suffix-list lookup for registrable-domain grouping
  * (`tx_domain_stats` — per-domain corpus composition and blocklists
  * group crawl text by the domain a REGISTRANT controls, and the
  * naive last-two-labels key mis-buckets every `co.uk`/`co.jp`-class
  * host under its registry suffix).
  *
  * The rule set is a committed snapshot subset of the public list
  * (`graft/public_suffix_snapshot.dat`, provenance + refresh path in
  * its header). Matching is the PSL algorithm restricted to the
  * snapshot's rule shapes: longest matching rule wins, exception
  * rules beat the wildcard they carve out of, unmatched hosts fall to
  * the implicit 1-label rule. Everything compiles to pure column
  * expressions — `isInCollection` optimizes to an O(1) `InSet` probe
  * per row inside whole-stage codegen, no UDF, no shuffle. At the
  * full list's ~10k rules this stays a hash-set probe; a list grown
  * beyond literal-plan comfort would move to a broadcast map-join
  * (disclosed boundary, not needed at snapshot size).
  */
object PublicSuffix {

  private val ruleLines: Vector[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "public_suffix_snapshot.dat missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
    finally in.close()
  }

  /** Exception rules, stored without the '!' (2-label in snapshot). */
  val exceptions: Seq[String] =
    ruleLines.filter(_.startsWith("!")).map(_.drop(1))
  /** Wildcard bases: `*.ck` stored as `ck`. */
  val wildcardBases: Seq[String] =
    ruleLines.filter(_.startsWith("*.")).map(_.drop(2))
  private val plain = ruleLines.filterNot(l =>
    l.startsWith("!") || l.startsWith("*."))
  /** Plain 2-label rules (`co.uk`). */
  val rules2: Seq[String] = plain.filter(_.count(_ == '.') == 1)
  /** Plain 3-label rules (`k12.ca.us`). */
  val rules3: Seq[String] = plain.filter(_.count(_ == '.') == 2)

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
    // precedence: exception (beats its wildcard) > longest plain rule
    // > wildcard (2-label class in snapshot) > plain 2-label > implicit
    val suffixLen = CaseWhen(Seq(
      (In(lastLabels(2), strings(exceptions)), i(1)),
      (In(lastLabels(3), strings(rules3)), i(3)),
      (In(lastLabels(1), strings(wildcardBases)), i(2)),
      (In(lastLabels(2), strings(rules2)), i(2))), Some(i(1)))
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
    * from the SAME snapshot so the oracle's rule sets cannot fork from
    * the engine's. */
  def duckdbSuffixLenCase(w: String): String =
    s"""CASE WHEN array_to_string($w[greatest(len($w)-1,1):len($w)], '.')
       |       IN ${inList(exceptions)} THEN 1
       |   WHEN array_to_string($w[greatest(len($w)-2,1):len($w)], '.')
       |       IN ${inList(rules3)} THEN 3
       |   WHEN $w[len($w)] IN ${inList(wildcardBases)} THEN 2
       |   WHEN array_to_string($w[greatest(len($w)-1,1):len($w)], '.')
       |       IN ${inList(rules2)} THEN 2
       |   ELSE 1 END""".stripMargin.replace("\n", " ")

  /** DuckDB replay of the registrable-domain slice given the label
    * array `w` and a suffix-length column `plen`. */
  def duckdbDomainSlice(w: String, plen: String): String =
    s"array_to_string($w[greatest(len($w) - least($plen + 1, len($w)) + 1, 1)" +
      s":len($w)], '.')"
}
