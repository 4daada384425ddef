package graft

import graft.etl.SparkSpec

/** Driver-contract smoke: every SparkEntry query runs at sf0.001 and
  * returns a well-formed result; entry() returns rows; every oracle key
  * has a query; SQL extension functions resolve. */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql covers EVERY query; bench subset exists") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
    // r3: no rows-only entries remain — the LSH ANN gained a full
    // replay oracle (deterministic planes as SQL literals) and the IVF
    // check is the per-query recall floor
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ==
      Set.empty[String])
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      // pair/knn queries may be small but the rest must be non-empty
      if (!name.startsWith("dd_") && !name.startsWith("vec_"))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("tx_gate_sweep: curve invariants (monotone cumulative, total = 1)") {
    val rows = queries.TextQueries.gateSweep(spark, sf).collect()
    graft.ops.Dedup.releaseCaches()
    assert(rows.length == 10)
    val deciles = rows.map(_.getLong(0)).toSeq
    assert(deciles == (0L to 9L))
    val thresholds = rows.map(_.getDouble(1)).toSeq
    assert(thresholds == thresholds.sorted.reverse,
      s"thresholds not non-increasing: $thresholds")
    val fracs = rows.map(_.getDouble(6)).toSeq
    assert(fracs == fracs.sorted, s"cumulative fraction not monotone: $fracs")
    assert(fracs.last == 1.0)
    assert(rows.map(_.getLong(2)).sum == rows.last.getLong(4)) // cum_docs
  }

  test("SQL extension functions resolve via GraftExtensions") {
    // getOrCreate returns the active session (ignoring withExtensions),
    // so detach the shared test session, build a fresh one (reuses the
    // SparkContext), and restore afterwards.
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT json_to_string_map('{"a":1,"b":"x"}') AS m,
          |  map_remove_keys(json_to_string_map('{"a":1,"b":"x"}'), 'a') AS f,
          |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
          |  rfc3339_parse('2025-01-02T03:04:05.500Z').rendered AS ts,
          |  variant_get(json_residual_variant('{"a":1,"b":"x"}', 'b'), '$.a', 'int') AS va,
          |  size(lsh_sign_bands(array(1.0d, -1.0d), 8, 4)) AS nbands,
          |  pq_adc(array(1, 0), array(array(0.5d, 2.0d), array(3.0d, 4.0d))) AS adc
          |""".stripMargin).head()
      assert(r.getAs[Map[String, String]]("m") == Map("a" -> "1", "b" -> "x"))
      assert(r.getAs[Map[String, String]]("f") == Map("b" -> "x"))
      assert(r.getAs[Double]("dot") == 11.0)
      assert(r.getAs[String]("ts") == "2025-01-02T03:04:05.5Z")
      assert(r.getAs[Int]("va") == 1)
      assert(r.getAs[Int]("nbands") == 2)
      assert(r.getAs[Double]("adc") == 5.0) // lut[0][1] + lut[1][0]
      val c = s2.sql(
        """SELECT scrub_pii('mail a@b.co from 10.0.0.1') AS sc,
          |  url_hosts('x https://A.Example.com/p y http://b.org') AS uh,
          |  registrable_domain('deep.sub.example.org') AS rd,
          |  registrable_domain('news.bbc.co.uk') AS rduk
          |""".stripMargin).head()
      assert(c.getAs[String]("sc") == "mail <EMAIL> from <IP>")
      // the SQL surface delegates through the SAME Column ops (Bridge):
      // the card stage, checksum gate and all — a hand-maintained
      // regexp copy here would have silently missed it
      val lc = s2.sql(
        """SELECT scrub_pii('pay 4111-1111-1111-1111 or 4111-1111-1111-1112') AS sc,
          |  luhn_valid('4111111111111111') AS lv,
          |  luhn_valid('4111111111111112') AS li,
          |  canonical_text('  A  B ') AS ct,
          |  quality_score('the quick brown fox') AS qs
          |""".stripMargin).head()
      assert(lc.getAs[String]("sc") == "pay <CC> or 4111-1111-1111-1112",
        "valid card scrubbed, checksum-failing twin kept — via SQL")
      assert(lc.getAs[Boolean]("lv") && !lc.getAs[Boolean]("li"))
      assert(lc.getAs[String]("ct") == "a b")
      assert(lc.getAs[Double]("qs") > 0.0 && lc.getAs[Double]("qs") <= 1.0)
      // MIRROR: SQL function ≡ Column op on a branch-covering probe set
      // (the anti-fork guard — CurationSqlExprs restates the plumbing
      // at catalyst level, so equality must be proven, not assumed)
      locally {
        import graft.ops.TextAnalysis
        import org.apache.spark.sql.functions.col
        import s2.implicits._
        val probes = Seq(
          "mail a@b.co 10.0.0.1 call 415-555-2671 pay 4111 1111 1111 1111",
          "ref 4111-1111-1111-1112 amex 371449635398431",
          "id 12345678901234567890 short 123456789012",
          "  Mixed\tCASE  ctrl  runs  ",
          "the quick the fox of it is a and in")
        val df = probes.toDF("t")
        df.createOrReplaceTempView("probes")
        val viaSql = s2.sql(
          """SELECT scrub_pii(t) AS sc, canonical_text(t) AS ct,
            |  quality_score(t) AS qs FROM probes""".stripMargin).collect()
        val viaCol = df.select(TextAnalysis.scrubPii(col("t")).as("sc"),
          TextAnalysis.canonicalText(col("t")).as("ct"),
          TextAnalysis.qualityScore(col("t")).as("qs")).collect()
        viaSql.zip(viaCol).foreach { case (a, b) =>
          assert(a == b, s"SQL/Column fork: $a vs $b")
        }
      }
      assert(c.getSeq[String](c.fieldIndex("uh")) ==
        Seq("a.example.com", "b.org"))
      assert(c.getAs[String]("rd") == "example.org")
      // PSL snapshot path (not last-two-labels): SQL function and
      // Column op share the same catalyst implementation
      assert(c.getAs[String]("rduk") == "bbc.co.uk")
      val a = s2.sql(
        """SELECT sorted_asof_idx(7L, array(5L, 10L)) AS i,
          |  sorted_asof_idx(1L, array(5L, 10L)) AS none
          |""".stripMargin).head()
      assert(a.getAs[Int]("i") == 0)
      assert(a.isNullAt(a.fieldIndex("none")))
      // bounded_top_k: an AGGREGATE extension function — the analyzer
      // wraps the AggregateFunction, GROUP BY semantics apply
      val t = s2.sql(
        """SELECT g, bounded_top_k(v, 2) AS top2 FROM VALUES
          |  ('a', 3), ('a', 1), ('a', 2), ('b', 9) AS t(g, v)
          |GROUP BY g ORDER BY g""".stripMargin).collect()
      assert(t(0).getSeq[Int](1) == Seq(1, 2), "k smallest, ascending")
      assert(t(1).getSeq[Int](1) == Seq(9))
      // space_saving_top_k: bounded heavy-hitters summary — exact
      // counts (err = 0) at capacity >= distinct, (cnt desc, key) order
      val ss = s2.sql(
        """SELECT space_saving_top_k(v, 4) AS s FROM VALUES
          |  ('x'), ('y'), ('x'), ('z'), ('x'), ('y') AS t(v)""".stripMargin)
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(ss == Seq(("x", 3L, 0L), ("y", 2L, 0L), ("z", 1L, 0L)))
      // wrong arity fails with an argument error, not an index crash
      val err = intercept[Exception] { s2.sql("SELECT array_dot(array(1.0d))") }
      assert(err.getMessage.contains("array_dot expects 2"),
        s"unexpected: ${err.getMessage}")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
