package graft.queries

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic output ordering without a global sort: a bare
  * `orderBy` plans RangePartitioning, whose sampling pass re-executes
  * the whole child plan (2× cost on expensive queries). Driver-facing
  * results are small, so shuffle everything into one partition and sort
  * locally — upstream parallelism intact, single execution.
  * (`orderBy(...).limit(k)` is fine as-is: TakeOrderedAndProject.) */
object QueryUtil {
  def ordered(cols: String*)(df: DataFrame): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)

  /** Stage-boundary spread for CPU-heavy narrow phases: hash-partition
    * on the id across the session's parallelism. A small-SF scan
    * arrives as ONE file split, and AQE coalesces tiny shuffles to one
    * partition BY BYTES — right for IO-bound stages, wrong immediately
    * before a regex/tokenize-heavy narrow chain whose cost is per-row
    * CPU (the chain serializes on one core; measured 1.4–3.6 s
    * single-task checkpoint stages in the v6 curation chain). At
    * cluster scale this is one hash exchange of data that is being
    * materialized at the stage boundary anyway — the explicit layout
    * step a production pipeline runs between phases. */
  def spreadById(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism,
      df(idCol))

  /** [[spreadById]] ONLY when the frame's scan parallelism is below
    * the session parallelism (r19, guide §2 scale-adaptive
    * partitioning): a single-file local scan needs the exchange to
    * get a CPU-heavy decode stage off one core, but a multi-split
    * input already provides the width and the exchange is pure cost —
    * measured on mm_audio_bands over the 32-file sf1 scaledata corpus
    * (decode stage 32-wide in BOTH arms): 16.0 s without the spread
    * vs 20.9 s with it, while the single-file sf0.1 driver corpus
    * runs the whole FFT on ONE task unless spread. ONLY for frames
    * whose plan is exchange-free upstream (a bare scan + projections):
    * `.rdd` on a frame with an upstream exchange would execute those
    * stages at query-BUILD time under AQE.
    *
    * The split count is INPUT LAYOUT, not data: it is probed once per
    * (memoKey = input dir, parallelism) per JVM and memoized — the
    * probe is a driver-side file listing (no job), but it still cost
    * ~0.1–0.3 s per query definition when run inside every timed
    * region. No query RESULT is cached: the memo holds one boolean of
    * scan metadata, the same fact every plan's FileSourceScan
    * recomputes. */
  private val thinScanMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  def spreadScanIfThin(df: DataFrame, memoKey: String,
      idCol: String = "doc_id"): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val thin = thinScanMemo.computeIfAbsent(s"$memoKey#$want",
      _ => df.rdd.getNumPartitions < want)
    if (thin) df.repartition(want, df(idCol)) else df
  }
  def orderedBy(cols: Column*)(df: DataFrame): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** DuckDB replay of [[graft.ops.Robust.quantileFromHistogram]] as a
    * CTE-pair generator over a (`keys…`, v, c) histogram relation
    * `src`: a row with cumulative count `cum` and count `c` covers
    * 0-based ranks [cum-c, cum-1]; the covering values interpolate at
    * position (n-1)·q. `keys` is a comma list usable in both
    * PARTITION BY and GROUP BY. */
  def quantileCteSql(src: String, keys: String, q: String,
      outCte: String, outCol: String): String = {
    def at(rank: String) =
      s"""max(CASE WHEN cum - c <= CAST($rank AS BIGINT)
         |      AND CAST($rank AS BIGINT) <= cum - 1 THEN v END)""".stripMargin
    val lo = at(s"floor((n - 1) * $q)")
    val hi = at(s"ceil((n - 1) * $q)")
    s"""${outCte}_t AS (SELECT $keys, v, c,
       |    CAST(sum(c) OVER (PARTITION BY $keys ORDER BY v) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY $keys) AS BIGINT) AS n FROM $src),
       |$outCte AS (SELECT $keys,
       |    $lo + ($hi - $lo) * max((n - 1) * $q - floor((n - 1) * $q))
       |      AS $outCol
       |  FROM ${outCte}_t GROUP BY $keys)""".stripMargin
  }

  /** Rewrite every NON-RECURSIVE top-level CTE head `name AS (` to
    * `name AS MATERIALIZED (` — the DuckDB hint that evaluates a CTE
    * once instead of re-inlining its whole upstream chain at every
    * reference. The deep curation-chain oracles reference shared CTEs
    * up to 10×, and DuckDB's re-inlining made single replays cost
    * 100–220 s at sf0.01 (r15: the full driver compare outgrew its
    * budget and shipped an empty CORRECTNESS record); materialized,
    * the same replays run in 0.3–2.4 s with identical results.
    *
    * The scanner tracks single-quote literal state (the oracles embed
    * regexes and HTML with parens, `--` and `AS (`-lookalikes inside
    * strings), SQL comment spans (`--` to end-of-line and `/* */` —
    * r17 ADVICE: an unbalanced paren or quote inside a comment must
    * not corrupt depth tracking) and paren depth, so only genuine
    * depth-0 CTE heads — preceded by `WITH`, `RECURSIVE` or the `,`
    * separating CTEs — are rewritten. A CTE whose body references
    * itself (`FROM`/`JOIN` name — the recursive-arm shape) is left
    * untouched: MATERIALIZED on a truly recursive CTE is a DuckDB
    * parse error. */
  def materializeCtes(sql: String): String = {
    val n = sql.length
    // masked = inside a quote OR a comment; depth = paren depth —
    // both computed by one pass of the same state machine close()
    // uses, so the two can never disagree
    val depth = new Array[Int](n)
    val masked = new Array[Boolean](n)
    var d = 0
    var q = false
    var lc = false // "--" line comment, to end-of-line
    var bc = -1 // "/*" block comment: start index, -1 when outside
    var i = 0
    while (i < n) {
      depth(i) = d
      masked(i) = q || lc || bc >= 0
      val c = sql.charAt(i)
      if (lc) { if (c == '\n') lc = false }
      else if (bc >= 0) {
        // the closing '/' must not reuse the opener's '*' ("/*/" is
        // still open; the shortest closed span is "/**/")
        if (c == '/' && i >= bc + 3 && sql.charAt(i - 1) == '*') bc = -1
      } else if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          lc = true; masked(i) = true // the opener is comment too
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          bc = i; masked(i) = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    def close(open: Int): Int = {
      var j = open + 1
      var dd = 1
      var qq = false
      var jlc = false
      var jbc = -1
      while (j < n && dd > 0) {
        val c = sql.charAt(j)
        if (jlc) { if (c == '\n') jlc = false }
        else if (jbc >= 0) {
          if (c == '/' && j >= jbc + 3 && sql.charAt(j - 1) == '*') jbc = -1
        } else if (qq) { if (c == '\'') qq = false }
        else c match {
          case '\'' => qq = true
          case '-' if j + 1 < n && sql.charAt(j + 1) == '-' => jlc = true
          case '/' if j + 1 < n && sql.charAt(j + 1) == '*' => jbc = j
          case '(' => dd += 1
          case ')' => dd -= 1
          case _ =>
        }
        j += 1
      }
      j - 1
    }
    val head = java.util.regex.Pattern
      .compile("([A-Za-z_][A-Za-z0-9_]*)\\s+AS\\s+\\(").matcher(sql)
    val out = new StringBuilder(n + 1024)
    var last = 0
    while (head.find()) {
      val s = head.start
      val open = head.end - 1
      // the significant token preceding the head, skipping whitespace
      // AND comment spans (r17 ADVICE: "x), /* c */ b AS (" is still
      // a CTE head)
      var k = s - 1
      while (k >= 0 && (masked(k) || sql.charAt(k).isWhitespace)) k -= 1
      val tEnd = k
      while (k >= 0 && !masked(k) && !sql.charAt(k).isWhitespace) k -= 1
      val pre =
        if (tEnd < 0) "" else sql.substring(k + 1, tEnd + 1).toUpperCase
      val isCteHead = !masked(s) && depth(s) == 0 && (pre.endsWith(",") ||
        pre.endsWith("WITH") || pre.endsWith("RECURSIVE") || pre.isEmpty)
      if (isCteHead && open >= last) {
        val body = sql.substring(open + 1, close(open))
        val selfRef = ("(?i)\\b(from|join)\\s+" +
          java.util.regex.Pattern.quote(head.group(1)) + "\\b").r
          .findFirstIn(body).isDefined
        if (!selfRef) {
          out.append(sql.substring(last, open)).append("MATERIALIZED (")
          last = open + 1
        }
      }
    }
    out.append(sql.substring(last, n)).toString
  }
}
