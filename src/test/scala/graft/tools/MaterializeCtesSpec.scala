package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryUtil.materializeCtes

/** Contract for the oracle-SQL CTE materialization rewrite (r16): only
  * genuine top-level non-recursive CTE heads gain MATERIALIZED; string
  * literals, nested parens, recursive arms and already-materialized
  * heads are untouched. The rewrite exists because DuckDB re-inlines
  * multi-referenced CTEs — the deep curation replays cost 100–220 s
  * each at sf0.01 without it (the r15 empty-CORRECTNESS root cause). */
class MaterializeCtesSpec extends AnyFunSuite {

  test("plain CTE heads gain MATERIALIZED; main select untouched") {
    val sql = "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) " +
      "SELECT * FROM b JOIN a USING (x)"
    assert(materializeCtes(sql) ==
      "WITH a AS MATERIALIZED (SELECT 1 AS x), " +
        "b AS MATERIALIZED (SELECT x FROM a) " +
        "SELECT * FROM b JOIN a USING (x)")
  }

  test("self-referencing (recursive) CTEs stay unmaterialized") {
    val sql = "WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL " +
      "SELECT n + 1 FROM r WHERE n < 5), s AS (SELECT n FROM r) " +
      "SELECT * FROM s"
    val out = materializeCtes(sql)
    assert(out.contains("RECURSIVE r AS (SELECT"), out)
    assert(out.contains("s AS MATERIALIZED (SELECT n FROM r)"), out)
  }

  test("AS ( inside string literals and nested subqueries is untouched") {
    val sql = "WITH a AS (SELECT 'x AS (' AS lit, " +
      "(SELECT 2) AS sub FROM t) SELECT lit FROM a"
    val out = materializeCtes(sql)
    assert(out == "WITH a AS MATERIALIZED (SELECT 'x AS (' AS lit, " +
      "(SELECT 2) AS sub FROM t) SELECT lit FROM a")
  }

  test("already-materialized heads are not doubled") {
    val sql = "WITH a AS MATERIALIZED (SELECT 1 AS x) SELECT x FROM a"
    assert(materializeCtes(sql) == sql)
  }

  test("quoted parens and doubled-quote escapes keep depth tracking honest") {
    val sql = "WITH a AS (SELECT '(((' AS p, 'it''s (a)' AS q FROM t), " +
      "b AS (SELECT p FROM a) SELECT * FROM b"
    val out = materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT '((('"), out)
    assert(out.contains("b AS MATERIALIZED (SELECT p FROM a)"), out)
  }

  test("comments with unbalanced parens/quotes don't corrupt depth tracking (r17 ADVICE)") {
    // a line comment carrying a stray ')' and an unclosed quote, and
    // a block comment carrying '(' — pre-r17 these corrupted the
    // depth/quote state and could silently mangle the rewrite
    val sql = "WITH a AS ( -- don't ) count ( this\n" +
      "SELECT 1 AS x), /* ( also ( not ) this */ b AS (SELECT x FROM a) " +
      "SELECT * FROM b"
    val out = materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED ( -- don't ) count ( this"),
      out)
    assert(out.contains("b AS MATERIALIZED (SELECT x FROM a)"), out)
    // an "AS (" lookalike inside a comment must not be rewritten
    val sql2 = "WITH /* fake AS ( */ a AS (SELECT 1 AS x) " +
      "-- trail AS (\nSELECT x FROM a"
    val out2 = materializeCtes(sql2)
    assert(out2 == "WITH /* fake AS ( */ a AS MATERIALIZED " +
      "(SELECT 1 AS x) -- trail AS (\nSELECT x FROM a", out2)
    // "/*/" does not close the block comment it opens
    val sql3 = "WITH a AS (SELECT 1 AS x /*/ ) still comment */ ) " +
      "SELECT x FROM a"
    val out3 = materializeCtes(sql3)
    assert(out3.contains("a AS MATERIALIZED (SELECT 1 AS x /*/"), out3)
  }

  test("every registered oracle survives the rewrite structurally") {
    // parens balance is preserved and no oracle loses content — the
    // rewrite only ever inserts the single keyword
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      val stripped = sql.replace("MATERIALIZED (", "(")
      def bal(s: String): Int = {
        var d = 0; var q = false
        s.foreach { c =>
          if (q) { if (c == '\'') q = false }
          else c match {
            case '\'' => q = true
            case '(' => d += 1
            case ')' => d -= 1
            case _ =>
          }
        }
        d
      }
      assert(bal(sql) == 0, s"$name: unbalanced parens after rewrite")
      assert(bal(stripped) == 0, s"$name: rewrite touched a literal")
      // no materialized CTE may reference itself (the recursive-arm
      // shape MATERIALIZED would break): walk each materialized head
      // and scan its body with the same quote/paren discipline
      val head = java.util.regex.Pattern
        .compile("([A-Za-z_][A-Za-z0-9_]*)\\s+AS MATERIALIZED \\(")
        .matcher(sql)
      while (head.find()) {
        val cte = head.group(1)
        var j = head.end; var d = 1; var q = false
        val b = new StringBuilder
        while (j < sql.length && d > 0) {
          val c = sql.charAt(j)
          if (q) { if (c == '\'') q = false }
          else c match {
            case '\'' => q = true
            case '(' => d += 1
            case ')' => d -= 1
            case _ =>
          }
          if (d > 0) b.append(c)
          j += 1
        }
        assert(("(?i)\\b(from|join)\\s+" + cte + "\\b").r
          .findFirstIn(b.toString).isEmpty,
          s"$name: materialized CTE $cte references itself")
      }
    }
  }
}
