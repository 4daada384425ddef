package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines over a `documents`-like
  * table (`doc_id`, `text`, …). All pure column expressions — they fuse
  * into whole-stage codegen, scale linearly with the scan, and never
  * shuffle (per-document metrics are embarrassingly parallel, exactly
  * like the reference's record-at-a-time stages).
  */
object TextAnalysis {

  /** Single-space tokens — THE pinned tokenizer contract for every
    * oracle-checked token-sensitive op (`tx_pack_shards`, `tx_bm25`
    * dl/avgdl, `tx_repetition`, the unigram LM): Spark
    * `split(text, " ")` and DuckDB `string_split(text, ' ')` agree on
    * ANY input (both keep interior and trailing empties from runs of
    * spaces), so engine/oracle agreement holds by construction, not by
    * corpus blandness — TokenizerContractSpec probes punctuation,
    * underscores, multi-space and trailing-space docs. The BPE-ish
    * variant additionally splits punctuation clusters (see
    * [[bpeishTokens]]) and is used only where its scaladoc says so. */
  def tokens(text: Column): Column = split(text, " ")

  /** A BPE-style pre-tokenization: letter runs, digit runs, and
    * punctuation clusters as separate tokens (the regex pre-pass every
    * BPE tokenizer runs before merges). Token *count* approximates LLM
    * token counts for budgeting at corpus scale. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text,
      lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical text for fuzzy-exact dedup and stable fingerprints:
    * C0/DEL control bytes become spaces, whitespace runs collapse to
    * one space, edges trim, case folds to lower — the normalization
    * pass that makes "same page, different crawl formatting" collapse
    * under EXACT dedup instead of needing the fuzzy machinery. Pure
    * codegen'd built-ins (regexp engine is the cost), Java∩RE2 regex
    * so the DuckDB oracle replays it verbatim. */
  def canonicalText(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "), " +", " ")))

  /** English-ish stopwords present in the synthetic corpus vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  def stopwordCount(text: Column, stopwords: Seq[String] = Stopwords): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** Per-document quality score in [0,1]: length saturation (40%),
    * type-token ratio (40%), non-stopword density (20%). Deterministic,
    * SQL-expressible (mirrored by the DuckDB oracle in Queries). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val distinctN = size(array_distinct(tokens(text))).cast("double")
    val stopN = stopwordCount(text).cast("double")
    round(
      least(n / 100.0, lit(1.0)) * 0.4 +
        (distinctN / n) * 0.4 +
        (lit(1.0) - stopN / n) * 0.2, 4)
  }

  /** Gopher's 8 high-frequency English words — the published
    * "document contains ≥ 2 of these" fluency rule (Rae et al. 2021,
    * arXiv:2112.11446 appendix A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule gate (Rae et al. 2021, arXiv:2112.11446
    * A1.1) — the named, published heuristic battery crawl pipelines
    * cite, exposed rule-by-rule so a curation run can report WHICH
    * rule dropped a document (the audit question a composite score
    * cannot answer): word count in [minWords, maxWords], mean word
    * length in [3, 10], symbol-to-word ratio ('#' chars plus ellipsis
    * occurrences — BOTH the ASCII '...' spelling and U+2026 '…', as
    * the published rule counts the character real crawl text uses)
    * ≤ 0.1, ≤ 90% of lines may start with a bullet, ≤ 30% may end
    * with an ellipsis (either spelling), ≥ 80% of words contain an
    * alphabetic character, and ≥ 2 [[GopherStopwords]] hits.
    * `gopher_pass` is the conjunction. All pure column expressions —
    * scan-fused, zero shuffle; ratios are exact integer divisions
    * rounded to 4dp BEFORE thresholding so the engine and the oracle
    * can never disagree at a float boundary. `minWords` defaults to
    * the published 50 (the synthetic corpus' docs are shorter — tests
    * pass a smaller floor to keep the gate non-vacuous there). */
  def gopherRules(docs: DataFrame, minWords: Long = 50L,
      maxWords: Long = 100000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val w = tokens(t)
    val lines = split(t, "\n")
    val n = size(w).cast("long")
    val nd = n.cast("double")
    val nl = size(lines).cast("double")
    def occurrences(c: Column, lit0: String): Column =
      ((length(c) - length(regexp_replace(c, java.util.regex.Pattern
        .quote(lit0), ""))) / lit0.length).cast("long")
    val meanWl = round(aggregate(transform(w, x => length(x)), lit(0),
      (a, x) => a + x).cast("double") / nd, 4)
    val symbols = (occurrences(t, "#") + occurrences(t, "...") +
      occurrences(t, "…")).cast("double")
    val bulletFrac = round(size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") ||
        l.startsWith("•"))).cast("double") / nl, 4)
    val ellipsisFrac = round(size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("double") / nl, 4)
    val alphaFrac = round(size(filter(w,
      x => lower(x).rlike("[a-z]"))).cast("double") / nd, 4)
    val stops = size(filter(w,
      x => lower(x).isInCollection(GopherStopwords))).cast("long")
    docs.select(col(idCol).as("doc_id"),
        n.as("n_words"),
        when(n > 0, meanWl).as("mean_word_len"),
        when(n > 0, round(symbols / nd, 4)).as("symbol_ratio"),
        bulletFrac.as("bullet_line_frac"),
        ellipsisFrac.as("ellipsis_line_frac"),
        when(n > 0, alphaFrac).as("alpha_word_frac"),
        stops.as("n_stop_hits"))
      .withColumn("gopher_pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_line_frac") <= 0.9 &&
          col("ellipsis_line_frac") <= 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("n_stop_hits") >= 2L)
  }

  /** Committed snapshot of the published "List of Dirty, Naughty,
    * Obscene, and Otherwise Bad Words" (LDNOOBW) English list — the
    * list the C4 page filter actually gates on (Raffel et al. 2020
    * §2.2). Single-token entries only ([[c4Rules]] matching is
    * whole-token on [a-z0-9]-runs, so multi-word phrases could never
    * match and are excluded rather than carried dead); provenance,
    * license and refresh path live in the resource header (the
    * [[PublicSuffix]] snapshot precedent). Other languages (or a
    * refreshed/full list) ship through the `badwords` parameter. */
  val DefaultBadwords: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/ldnoobw_en_snapshot.txt")
    require(in != null, "ldnoobw_en_snapshot.txt missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    finally in.close()
  }

  /** The C4 line/page filter (Raffel et al. 2020, arXiv:1910.10683
    * §2.2) — the other named, published crawl-cleaning battery.
    * Line rules: keep only lines that end in terminal punctuation
    * (. ! ? ") AND carry ≥ 5 words AND do not contain the word
    * "javascript" (case-insensitive — the published boilerplate
    * rule). Page rules: drop the whole page if it mentions
    * "lorem ipsum", contains a curly brace (code — we check both
    * '{' and '}', a deliberate widening of the published '{'), hits
    * the bad-word list (published: the externally-maintained LDNOOBW
    * list; [[DefaultBadwords]] is a committed single-token snapshot
    * of its English file — matching is whole-token on
    * [a-z0-9]-runs, not substring, so
    * "essex" never trips "sex"-style entries), has fewer than 3
    * sentences (published rule; sentence count approximated as
    * terminal-punctuation marks [.!?] in the cleaned text — mid-line
    * sentences add theirs — PLUS one for each kept line ending in a
    * bare '"' not preceded by a mark: such a line is by construction
    * a full sentence, so counting it closes the r13-disclosed
    * quote-terminal undercount that let quote-heavy pages be dropped
    * by the 3-sentence floor; a '."'/'!"'/'?"' ending is already
    * counted by its mark and does not double-count), or keeps
    * fewer than `minLines` lines. Deliberately NOT implemented here: the
    * published three-sentence-span dedup, which is the separate
    * [[graft.ops.Dedup]] line/substring family, and langdetect
    * (see the trained LID). Returns per-doc `(doc_id, n_lines,
    * n_kept_lines, has_lorem, has_brace, has_badword, n_sentences,
    * clean_text, c4_keep)` — the cleaned text is the surviving lines
    * rejoined, so the op composes into curation chains exactly like
    * [[graft.ops.Dedup.lineDedup]]. Pure column expressions,
    * scan-fused, zero shuffle. */
  def c4Rules(docs: DataFrame, minLines: Int = 3,
      badwords: Seq[String] = DefaultBadwords,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) && size(split(l, " ")) >= 5 &&
        !lower(l).contains("javascript"))
    val clean = concat_ws("\n", kept)
    // one sentence per quote-terminal kept line (bare '"' ending — a
    // '."'/'!"'/'?"' ending is counted by its mark below)
    val quoteSentences = size(filter(kept, l =>
      l.endsWith("\"") && !(l.endsWith(".\"") || l.endsWith("!\"") ||
        l.endsWith("?\""))))
    val nSentences =
      (length(clean) - length(regexp_replace(clean, "[.!?]", "")) +
        quoteSentences).cast("long")
    val badHit =
      if (badwords.isEmpty) lit(false)
      else size(filter(split(lower(t), "[^a-z0-9]+"),
        w => w.isInCollection(badwords))) > 0
    docs.select(col(idCol).as("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept_lines"),
        lower(t).contains("lorem ipsum").as("has_lorem"),
        (t.contains("{") || t.contains("}")).as("has_brace"),
        badHit.as("has_badword"),
        nSentences.as("n_sentences"),
        clean.as("clean_text"))
      .withColumn("c4_keep",
        !col("has_lorem") && !col("has_brace") && !col("has_badword") &&
          col("n_sentences") >= 3L && col("n_kept_lines") >= minLines)
  }

  /** Gopher's published repetition thresholds (arXiv:2112.11446 A1.1,
    * table A1): max char-fraction for the TOP n-gram (n = 2, 3, 4) and
    * for ALL duplicated n-grams (n = 5..10). */
  val GopherRepThresholds: Map[Int, Double] = Map(
    2 -> 0.20, 3 -> 0.18, 4 -> 0.16,
    5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The Gopher REPETITION battery (Rae et al. 2021 A1.1): per doc,
    * the character fraction of the single most frequent {2,3,4}-gram
    * and of all duplicated {5..10}-grams, each against its published
    * threshold, plus the conjunction `rep_pass`. Char fractions use
    * the standard overlap-ignoring approximation every open
    * implementation ships (occurrences × gram length over doc chars,
    * capped at 1) — exact span marking is quadratic per doc. The top
    * gram tie-breaks to the lexicographically smallest (determinism —
    * engine `min(struct(-count, gram))`, oracle `ORDER BY c DESC,
    * gram`).
    *
    * Scale shape (r13): ONE source scan, ONE tokenize, ZERO shuffle,
    * ZERO cache — all nine metrics come from the codegen
    * [[graft.etl.expressions.GopherRepMetrics]] expression, one
    * compiled hash-count pass per document inside whole-stage codegen.
    * The battery's 9·T gram fan-out never leaves the row, so there is
    * no join back to the source, no reduce key a pathological
    * repeated-phrase doc could heat (it collapses inside its own
    * per-doc hash map), and the only exchange in the whole query is
    * the caller's result ordering. (History: the r11 union-of-9-
    * explodes form re-scanned the source nine times at 2.45 s/sf0.1;
    * the r12 single-scan concat-of-9-struct-arrays form was a
    * measured 3.7× regression at 9.07 s; declarative middle grounds —
    * persisted-base union, dynamic-n explode, higher-order run-length
    * fold — all measured 4.2–7.0 s. The expression form is both the
    * fastest AND the only zero-shuffle shape.) */
  def gopherRepetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val metrics = docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("double").as("_nc"),
      org.apache.spark.sql.graft.Bridge.column(
        graft.etl.expressions.GopherRepMetrics(
          org.apache.spark.sql.graft.Bridge.expression(
            tokens(col(textCol))))).as("_m"))
    def frac(n: Int): Column =
      round(least(coalesce(element_at(col("_m"), n - 1), lit(0L))
        .cast("double") / col("_nc"), lit(1.0)), 4)
    val named = (2 to 4).map(n => frac(n).as(s"top${n}gram_char_frac")) ++
      (5 to 10).map(n => frac(n).as(s"dup${n}gram_char_frac"))
    metrics
      .select(col("doc_id") +: named: _*)
      .withColumn("rep_pass",
        (2 to 4).map(n =>
            col(s"top${n}gram_char_frac") <= GopherRepThresholds(n))
          .reduce(_ && _) &&
        (5 to 10).map(n =>
            col(s"dup${n}gram_char_frac") <= GopherRepThresholds(n))
          .reduce(_ && _))
  }

  /** Marker-word language ID. An n-gram/charset heuristic distilled to
    * its SQL-expressible core: count marker hits per language, argmax
    * with a fixed precedence, `und` when nothing matches. (The synthetic
    * corpus shares one vocabulary across its `lang` labels, so scores —
    * not label recovery — are the verifiable contract.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens(text), t => t.isInCollection(markers)))
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  // --- Trained language ID --------------------------------------------
  // The fastText/langid.py-shaped LID real pipelines gate on (char
  // n-gram features + linear per-language heads — Joulin et al. 2016,
  // arXiv:1607.01759; Lui & Baldwin 2012 langid.py): hashed char
  // TRIGRAM term frequencies, one logistic head per language, trained
  // jointly IN the engine by the same deterministic full-batch GD loop
  // as the quality classifier ([[logisticCore]] widened to K residuals
  // per scan — still ONE corpus-sized job per epoch, with a
  // ≤ K·(numBuckets+1)-double model crossing the driver). Margins are
  // rounded to DECIMAL(38,12) before every sigmoid so residuals and
  // scores are independent of float summation order — the engine and
  // the DuckDB oracle replay the ENTIRE training run and agree
  // per-epoch by arithmetic.
  //
  // Honesty note (disclosed, same as [[LangMarkers]]): the synthetic
  // corpus plants its `lang` labels over ONE shared vocabulary, so
  // there is no recoverable language signal and held-out accuracy ≈
  // the class prior by construction. What the oracle verifies is the
  // trained model itself — features, every epoch's weights, scores,
  // argmax — and what the confusion matrix reports is the honest
  // evaluation of that model. On real multilingual text the identical
  // machinery is the published approach.

  /** Languages the registered LID trains heads for — FIXED (not read
    * from data) so the generated oracle SQL and the engine can never
    * disagree about head order; argmax ties break to the
    * alphabetically smallest, and a doc labeled outside this set is
    * simply negative for every head. */
  val LidClasses: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Char n-grams for LID features. A doc shorter than `n` chars
    * contributes its whole text as one term (never zero terms, so
    * every doc keeps a feature row — the [[dsirScore]] contract). */
  def charNgrams(text: Column, n: Int): Column = {
    val t = coalesce(text, lit(""))
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
      .otherwise(array(t))
  }

  /** A trained multi-class LID model: per-class weight maps (bucket
    * −1 = intercept) plus the hash width and n-gram size they were
    * trained under, inseparable ([[ClfModel]] contract). */
  final case class LidModel(classes: Seq[String],
      weights: Map[String, Map[Long, Double]], numBuckets: Int, n: Int) {
    require(classes.nonEmpty && classes == classes.sorted,
      "LID classes must be non-empty and sorted (argmax tie-break order)")
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")
    require(classes.forall(weights.contains), "missing class head")
  }

  /** One row per doc: `(doc_id, [_lang,] _bs, _xs)` — hashed char
    * n-gram TF as parallel sorted arrays + the bucket −1 intercept
    * (the [[clfFeatureArrays]] layout, char-gram terms). */
  private def lidFeatureArrays(docs: DataFrame, numBuckets: Int, n: Int,
      idCol: String, textCol: String, langCol: Option[String]): DataFrame = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")
    val lCols = langCol.map(c => Seq(col(c).as("_lang"))).getOrElse(Nil)
    val yCols = if (lCols.isEmpty) Nil else Seq(col("_lang"))
    // ONE compiled projection per doc, zero shuffle
    // ([[graft.etl.expressions.CharGramFeatures]]): the r13 form —
    // per-doc substring array → explode → bucket hash → groupBy
    // (doc, bucket) → groupBy (doc) collect+sort — shuffled
    // corpus-character-proportional rows twice for a result that is
    // per-doc-local by definition (2.7 s of tx_langid's 5.5 s at
    // sf0.1). Identical values (SQL-substring grams, md5Low64 pmod
    // buckets, same division), so every LID oracle replays unchanged.
    import org.apache.spark.sql.graft.Bridge
    val f = Bridge.column(graft.etl.expressions.CharGramFeatures(
      Bridge.expression(coalesce(col(textCol), lit(""))), n, numBuckets))
    docs.select(col(idCol).as("doc_id") +: (lCols :+ f.as("_f")): _*)
      .select(Seq(col("doc_id")) ++ yCols ++ Seq(
        col("_f._bs").as("_bs"), col("_f._xs").as("_xs")): _*)
  }

  /** Order-free margin: Σ w[b]·x rounded to DECIMAL(38,12) before the
    * sigmoid, so an engine/oracle float-summation-order difference at
    * the 1e-16 scale cannot leak into residuals or scores. */
  private def lidMargin(w: Map[Long, Double]): Column =
    marginCol(w).cast("decimal(38,12)").cast("double")

  /** Train the LID on labeled docs: `iterations` full-batch GD epochs
    * over all heads at once — each epoch is ONE scan of the persisted
    * feature frame producing a ≤ (numBuckets+1)-row ×K-column partial-
    * aggregated gradient (DECIMAL-exact, partitioning-invariant). */
  def trainLid(docs: DataFrame, classes: Seq[String] = LidClasses,
      numBuckets: Int = 1024, iterations: Int = 3, learningRate: Double = 2.0,
      n: Int = 3, idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang"): LidModel =
    lidCore(docs, classes, numBuckets, iterations, learningRate, n,
      idCol, textCol, langCol)._2

  private[graft] def lidCore(docs: DataFrame, classes: Seq[String],
      numBuckets: Int, iterations: Int, learningRate: Double, n: Int,
      idCol: String, textCol: String, langCol: String)
      : (DataFrame, LidModel) = {
    require(iterations >= 1, s"need at least one GD step, got $iterations")
    val feat = Dedup.persistTracked(lidFeatureArrays(docs, numBuckets, n,
      idCol, textCol, Some(langCol)))
    // corpus size for the (lr · g) / n update below — kept as the raw
    // count, NOT pre-divided into an eta: the oracle's update term is
    // `lr * CAST(sum(..) AS DOUBLE) / n`, one float rounding, and a
    // precomputed lr/n would add a second rounding (ulp-level weight
    // drift the DECIMAL margin rounding only usually absorbs)
    val cnt = docs.count().toDouble
    var w: Map[String, Map[Long, Double]] =
      classes.map(_ -> Map.empty[Long, Double]).toMap
    for (_ <- 1 to iterations) {
      val resCols = classes.map { k =>
        // label coalesced to 0.0: the oracle's CASE WHEN lang = k THEN
        // 1.0 ELSE 0.0 sends a NULL lang to 0.0, while a bare
        // (=).cast would yield NULL and silently drop the row from
        // the gradient sum
        (coalesce((col("_lang") === k).cast("double"), lit(0.0)) -
          lit(1.0) / (lit(1.0) + exp(-lidMargin(w(k))))).as(s"_r_$k")
      }
      val gradAggs = classes.map { k =>
        sum((col("_z._x") * col(s"_r_$k")).cast("decimal(38,12)"))
          .cast("double").as(s"_g_$k")
      }
      val grad = feat
        .select(col("_bs") +: col("_xs") +: resCols: _*)
        .select(explode(zip_with(col("_bs"), col("_xs"),
          (b, x) => struct(b.as("_b"), x.as("_x")))).as("_z") +:
          classes.map(k => col(s"_r_$k")): _*)
        .groupBy(col("_z._b").as("_b"))
        .agg(gradAggs.head, gradAggs.tail: _*)
        .collect()
      w = w.map { case (k, wk) =>
        val i = classes.indexOf(k) + 1
        k -> (wk ++ grad.map(r =>
          r.getLong(0) -> (wk.getOrElse(r.getLong(0), 0.0) +
            learningRate * r.getDouble(i) / cnt)))
      }
    }
    (feat, LidModel(classes, w, numBuckets, n))
  }

  /** Score docs under a frozen LID model: per-class sigmoid scores
    * (4dp) plus the argmax prediction (ties → alphabetically smallest
    * class, pinned on both engine and oracle). One featurize pass,
    * then a pure projection — the K weight maps ride as broadcast
    * literals. */
  def scoreWithLidModel(docs: DataFrame, model: LidModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // persist the featurize pass: the K-class scorer references the
    // feature arrays from 2K+ expression sites (per-class sigmoids +
    // the argmax struct), and over an UNPERSISTED projection the
    // optimizer re-expands the char-gram featurization into each —
    // measured 13 s vs ~1 s on a 60k-doc sweep (r15; the training
    // path always persisted, so only the frozen-model path paid it).
    // persistTracked: query callers release via Dedup.releaseCaches;
    // the streaming appender unpersists per batch.
    lidScoredFrom(Dedup.persistTracked(
      lidFeaturize(docs, model, idCol, textCol)), model)

  /** The frozen-model featurize pass alone (unpersisted) — for
    * callers that manage their own cache lifecycle (the streaming
    * appender persists per micro-batch and unpersists after its
    * write; [[scoreWithLidModel]] uses the tracked-persist default). */
  private[graft] def lidFeaturize(docs: DataFrame, model: LidModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    lidFeatureArrays(docs, model.numBuckets, model.n, idCol, textCol, None)

  private[graft] def lidScoredFrom(feat: DataFrame, model: LidModel)
      : DataFrame = {
    val sCols = model.classes.map { k =>
      round(lit(1.0) / (lit(1.0) + exp(-lidMargin(model.weights(k)))), 4)
        .as(s"score_$k")
    }
    val scored = feat.select(col("doc_id") +: sCols: _*)
    val best = array_min(array(model.classes.map(k =>
      struct((-col(s"score_$k")).as("ns"), lit(k).as("k"))): _*))
    scored
      .withColumn("lang_pred", best.getField("k"))
      .withColumn("lid_score", -best.getField("ns"))
  }

  /** Signed low-64 bits of md5 — the ONE cross-engine-recomputable
    * token hash shared by SimHash and the hashing embedder (each copy
    * is mirrored by a DuckDB oracle, so the definition must not fork:
    * DuckDB recomputes it as ('0x' || substr(md5(t),1,16))::UBIGINT).
    * conv's NEGATIVE target base yields the SIGNED 64-bit value. */
  def md5Low64(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 16), 16, -10).cast("long")

  /** Content-defined fingerprints. `md5Fingerprint` is the
    * oracle-checkable exact-dedup key; `normalizedFingerprint` folds
    * case/whitespace so trivially-edited copies collide. */
  def md5Fingerprint(text: Column): Column = md5(text.cast("binary"))
  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " ").cast("binary"))

  // --- Content-level PII scrubbing -----------------------------------
  // The reference redacts by FIELD KEY (`redact_keys`); crawled
  // training text needs the content-level counterpart: PII patterns
  // scrubbed inside the text itself before the corpus is stored or
  // trained on. Patterns are deliberately conservative (precision over
  // recall — a scrubber that eats code identifiers is worse than one
  // that misses an exotic phone format) and restricted to syntax whose
  // semantics are identical in Java regex and RE2, so the DuckDB
  // oracle replays the exact pipeline (`tx_pii_scrub`).

  /** Email addresses (user@host.tld, tld >= 2 letters). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (word-bounded; no octet range check — precision
    * is acceptable because stray a.b.c.d number runs are rare in prose
    * and scrubbing one is harmless). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Separator-delimited phone numbers (NNN-NNN-NNNN with -, space or
    * dot): requires separators so plain 10-digit ids in data/text are
    * not eaten. */
  val PhoneRe = "\\+?\\d{3}[- .]\\d{3}[- .]\\d{4}"

  /** Card-number candidates: 13–19 digits with at most one space or
    * dash between digits (the common 4-4-4-4 / 4-6-5 groupings and the
    * contiguous form). A syntactic match alone is NOT scrubbed — only
    * candidates passing the Luhn checksum ([[luhnValid]]) are, which is
    * what keeps long ids, timestamps and order numbers out of the
    * scrubber (the precision-over-recall contract, now with an actual
    * checksum instead of a prayer). Java∩RE2 syntax. */
  val CardCandidateRe = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** Luhn checksum (ISO/IEC 7812) over a digit string as pure column
    * arithmetic: from the rightmost digit, double every second digit,
    * subtract 9 when doubling exceeds 9, sum ≡ 0 (mod 10). The indexed
    * lambda mirrors the oracle's 1-based DuckDB list lambda exactly. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val contribs = transform(sequence(lit(1), length(rev)), i => {
      val d = rev.substr(i, lit(1)).cast("int")
      when((i - 1) % 2 === 0, d)
        .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
    })
    aggregate(contribs, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** The document's Luhn-valid card-number matches, document order. */
  def validCardNumbers(text: Column): Column =
    filter(regexp_extract_all(text, lit(CardCandidateRe), lit(0)),
      c => luhnValid(regexp_replace(c, "[ -]", "")))

  /** Scrub every Luhn-valid card candidate to `<CC>` via a literal
    * replace-fold over the (per-doc, tiny) valid-match list. A literal
    * replace also rewrites an equal digit substring embedded in a
    * LONGER run the regex never matched — disclosed; the oracle's
    * list_reduce replays the identical fold. */
  def scrubCards(text: Column): Column =
    aggregate(validCardNumbers(text), text,
      (acc, c) => replace(acc, c, lit("<CC>")))

  /** Scrub emails → `<EMAIL>`, Luhn-valid cards → `<CC>`, IPv4 →
    * `<IP>`, phones → `<PHONE>`, in that order (emails first so their
    * host dots can never half-match the IP pattern on the rewritten
    * string; cards before phones so a separator-grouped card is never
    * half-eaten as a phone). Codegen-friendly: scan-fused column ops,
    * no shuffle; the card fold is bounded by the per-doc match list. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        scrubCards(regexp_replace(text, EmailRe, "<EMAIL>")),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  // --- URL / domain analysis -----------------------------------------
  // Crawled corpora are curated by WHERE text came from as much as by
  // what it says: per-domain corpus composition and domain blocklists
  // are standard gates. Host extraction shares the PII-scrub contract:
  // Java∩RE2-identical syntax so the DuckDB oracle replays the exact
  // pipeline (`tx_url_gate`, `tx_domain_stats`).

  /** URL host capture: `http(s)://`, an OPTIONAL userinfo segment
    * (`user@` / `user:pass@` — skipped, not captured, so
    * `http://spam.example.com@evil.com` extracts `evil.com` and the
    * blocklist gate cannot be evaded via the userinfo URL form),
    * then the host (letters, digits, dots, dashes — port/path/query
    * stop the match). Group 1 is the host. Java∩RE2 syntax so the
    * DuckDB oracles replay it verbatim. */
  val UrlHostRe = "https?://(?:[^/@\\s]+@)?([A-Za-z0-9.-]+)"

  /** All URL hosts in a document, lower-cased, document order.
    * Scan-fused, zero shuffle. */
  def urlHosts(text: Column): Column =
    transform(regexp_extract_all(text, lit(UrlHostRe), lit(1)),
      h => lower(h))

  /** Registrable domain of a host: public-suffix-list lookup against
    * the committed snapshot ([[PublicSuffix]]) + one label, so
    * `news.bbc.co.uk` groups as `bbc.co.uk`, not `co.uk`. Pure column
    * expressions (InSet probes in codegen), oracle-replayed from the
    * same snapshot. */
  def registrableDomain(host: Column): Column =
    PublicSuffix.registrableDomain(host)

  /** Per-document blocklist gate: n_urls, how many hit the (small,
    * broadcast-as-literal) blocked-host set, and keep = none did. */
  def urlGate(text: Column, blockedHosts: Seq[String])
      : (Column, Column, Column) = {
    val hosts = urlHosts(text)
    // foldLeft over lit(false): an empty blocklist is a trivially-true
    // keep, not a plan-build crash (reduce on Nil throws)
    val blocked = filter(hosts,
      h => blockedHosts.foldLeft(lit(false))((acc, b) => acc || (h === lit(b))))
    (size(hosts), size(blocked), size(blocked) === 0)
  }

  // --- HTML -> text extraction -----------------------------------------
  // Crawled corpora start as markup; the extraction step (strip
  // script/style/comments, drop tags, decode entities, normalize
  // whitespace) runs before every text gate in this file. This is the
  // regexp-chain core of that stage (a trafilatura-class extractor
  // additionally does boilerplate DOM scoring — out of scope, the
  // line-dedup op covers boilerplate REMOVAL corpus-wide). Every
  // pattern is Java∩RE2 (inline (?is) flags, non-greedy spans, no
  // backreferences) so the DuckDB oracle replays the chain verbatim.

  /** script/style elements WITH their content, then comments. */
  val HtmlScriptRe = "(?is)<script[^>]*>.*?</script>"
  val HtmlStyleRe = "(?is)<style[^>]*>.*?</style>"
  val HtmlCommentRe = "(?s)<!--.*?-->"
  /** Any remaining tag. */
  val HtmlTagRe = "<[^>]+>"

  /** Visible text of an HTML fragment: remove script/style/comments,
    * replace every other tag with a space, decode the common entities,
    * collapse whitespace runs, trim. Pure codegen regexp_replace
    * chain — scan-fused, zero shuffle. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(
        regexp_replace(html, HtmlScriptRe, " "),
        HtmlStyleRe, " "),
      HtmlCommentRe, " ")
    val noTags = regexp_replace(noScript, HtmlTagRe, " ")
    // entity names contain no regex metachars and the replacements no
    // Matcher specials ($, \), so plain patterns are literal-safe in
    // Java AND RE2 (no \Q...\E needed). `&amp;` decodes LAST — HTML
    // semantics: a double-escaped `&amp;lt;` is the literal text
    // `&lt;`, and decoding `&amp;` first would double-decode it to `<`
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The crawl FRONT GATES as one frame transform — markup-sniffed
    * conditional HTML extraction, then the encoding gate: the
    * canonical implementation batch curation (`tx_curation6`) and the
    * streaming front half ([[graft.streaming.StreamingCuration]])
    * both call, so the sniff string, extraction conditionality, and
    * gate threshold cannot fork between the two. Extraction is
    * conditional because [[htmlToText]]'s whitespace collapse would
    * destroy the line structure plain-text docs carry into line-level
    * dedup. Stateless, scan-fused, zero shuffle. */
  def crawlFrontGates(docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      maxBadRatio: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val extracted = docs.withColumn(textCol,
      when(col(textCol).contains("<html"),
        htmlToText(col(textCol))).otherwise(col(textCol)))
    val (_, _, _, encKeep) = encodingQuality(col(textCol), maxBadRatio)
    extracted.filter(encKeep)
  }

  // --- Encoding quality (mojibake / control chars) --------------------
  // Crawled text arrives with decode damage: U+FFFD replacement chars
  // (a miscoded byte sequence) and stray C0/DEL control chars. Both are
  // strong junk signals a curation pipeline gates on before training.

  /** C0 controls except \t \n \r, plus DEL — Java∩RE2-identical so the
    * DuckDB oracle replays it. */
  val ControlCharRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Encoding-quality signals: (n_replacement, n_control, bad_ratio,
    * keep). `keep` = no replacement char at all (one U+FFFD proves a
    * decode error) AND (replacement+control)/chars <= `maxBadRatio`.
    * Occurrence counting is split-and-count — `size(split(text, re,
    * -1)) - 1` references `text` ONCE where the old strip-and-subtract
    * (`length(text) - length(regexp_replace(text, re, ""))`)
    * referenced it twice, and `keep` exploits nRepl === 0 to gate on
    * `nCtrl/len` alone (identical: when nRepl > 0 keep is false
    * regardless; when nRepl = 0 the ratio's numerator IS nCtrl). Both
    * count single-char matches, so the values are unchanged — this is
    * expression-SIZE surgery (r19): the crawl-gate filter predicate
    * inlines its input tree once per `text` reference (predicate
    * pushdown substitutes through the extraction projection), and at
    * 7 references over the planted-corpus CASE battery the generated
    * method blew janino's 64 KB limit — the whole front-gate stage
    * silently ran INTERPRETED (with no subexpression elimination, so
    * the regex battery also evaluated per reference). 3 references
    * compile. The gate still compares the UNROUNDED ratio (the
    * emitted `bad_ratio` column is rounded for display only) — gating
    * on the rounded value would keep raw ratios in (maxBadRatio,
    * round-up boundary] that the exact-arithmetic oracle drops. */
  def encodingQuality(text: Column, maxBadRatio: Double = 0.01)
      : (Column, Column, Column, Column) = {
    val nRepl = (size(split(text, "\\uFFFD", -1)) - 1).cast("long")
    val nCtrl = (size(split(text, ControlCharRe, -1)) - 1).cast("long")
    val rawRatio = (nRepl + nCtrl).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val keep = nRepl === 0 && nCtrl.cast("double") /
      greatest(length(text).cast("double"), lit(1.0)) <= maxBadRatio
    (nRepl, nCtrl, round(rawRatio, 4), keep)
  }

  // --- Unigram LM scoring ---------------------------------------------
  // The CCNet-style quality signal: score each document by the mean
  // log-probability of its tokens under a unigram model trained on the
  // corpus itself (boilerplate/gibberish scores low, fluent text high).
  // A full LM is external; the unigram model IS computable in-engine.

  /** Per-document mean log10 unigram probability. The model is the
    * top-`vocab` corpus tokens (count desc, token asc tie-break —
    * deterministic at any engine); out-of-vocabulary tokens get the
    * 1/T floor. Two corpus scans (model pass + scoring pass) and the
    * model frame BROADCASTS — at 100 TB a capped-vocab unigram LM is
    * a few MB regardless of corpus size, so the scoring pass is
    * map-side with one per-doc agg shuffle. */
  def unigramLogProb(docs: DataFrame, vocab: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("t"))
    // ONE model pass: the vocab-sized counts frame is persisted and
    // serves both the total-token scalar and the top-V cut — without
    // it, total/lm/scoring each plan their own corpus scan (three
    // full passes for a two-pass algorithm)
    val counts = Dedup.persistTracked(
      tok.groupBy("t").agg(count(lit(1)).cast("double").as("c")))
    val total = counts.agg(sum(col("c")).as("_tot"))
    val lm = counts.orderBy(col("c").desc, col("t")).limit(vocab)
    tok.join(broadcast(lm), Seq("t"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        log10(coalesce(col("c"), lit(1.0)) / col("_tot")).as("lp"))
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 4).as("mean_log10p"))
  }

  /** Per-document mean log10 bigram probability under an add-one-
    * smoothed, capped bigram model trained on the corpus itself — the
    * next notch of the CCNet-style quality ladder above
    * [[unigramLogProb]]: word-ORDER sensitivity, so shuffled or
    * keyword-stuffed text keeps its unigram mass but loses its bigram
    * mass.
    *
    * Model (deterministic in any engine — count desc, key asc): the
    * top-`vocab` contexts by c(u) = Σ_v c(u,v), and the top-`bigrams`
    * bigram counts RESTRICTED to modeled contexts (so
    * p = (c(u,v)+1)/(c(u)+V) ≤ 1 always; V = |modeled contexts|).
    * Unseen context scores 1/V, unseen bigram under a seen context
    * 1/(c(u)+V). Docs with < 2 tokens score NULL (no bigram evidence
    * — downstream gates decide, the row is never lost).
    *
    * Scale shape: ONE bigram-position scan persisted as counts; the
    * context frame derives from the bigram counts (no second corpus
    * pass); both model frames are capped → broadcast at any corpus
    * size; scoring is map-side joins + one per-doc agg shuffle. */
  def bigramLogProb(docs: DataFrame, vocab: Int = 1000,
      bigrams: Int = 4000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_tk"))
    val bi = tk
      .select(col("doc_id"), explode(
        when(size(col("_tk")) >= 2,
          transform(sequence(lit(2), size(col("_tk"))),
            i => struct(element_at(col("_tk"), i - 1).as("u"),
              element_at(col("_tk"), i).as("v"))))
        .otherwise(array().cast("array<struct<u:string,v:string>>"))).as("b"))
      .select(col("doc_id"), col("b.u").as("u"), col("b.v").as("v"))
    val biCounts = Dedup.persistTracked(
      bi.groupBy("u", "v").agg(count(lit(1)).cast("double").as("cuv")))
    val ctx = biCounts.groupBy("u").agg(sum(col("cuv")).as("cu"))
    val topCtx = ctx.orderBy(col("cu").desc, col("u")).limit(vocab)
    val vFrame = topCtx.agg(count(lit(1)).cast("double").as("_v"))
    val topBi = biCounts.join(topCtx.select("u"), Seq("u"), "left_semi")
      .orderBy(col("cuv").desc, col("u"), col("v")).limit(bigrams)
    val scored = bi
      .join(broadcast(topBi), Seq("u", "v"), "left")
      .join(broadcast(topCtx), Seq("u"), "left")
      .crossJoin(broadcast(vFrame))
      .select(col("doc_id"),
        log10((coalesce(col("cuv"), lit(0.0)) + 1.0) /
          (coalesce(col("cu"), lit(0.0)) + col("_v"))).as("lp"))
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 4).as("mean_log10p"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("mean_log10p"))
  }

  /** Per-document mean log10 probability under an interpolated
    * Kneser–Ney bigram model trained on the corpus itself — the
    * CCNet-class perplexity quality filter, with the smoothing
    * variant LM toolkits actually ship: the discounted bigram estimate
    * backs off to the CONTINUATION unigram (how many distinct contexts
    * a word follows — "francisco" is frequent but follows only "san",
    * so its continuation mass is tiny), which is what makes KN beat
    * add-k on natural text. For each doc bigram (u,v):
    *
    *   P(v|u) = max(c(u,v) − D, 0)/c(u)
    *          + D·N₁₊(u·)/c(u) · N₁₊(·v)/N₁₊(··)
    *
    * with fixed discount D (0.75, the standard choice). Scoring the
    * training corpus means every event was counted (no unseen terms),
    * and the estimate sums to 1 over v for every context. Docs with
    * < 2 tokens score NULL.
    *
    * Scale shape: ONE bigram-position scan persisted as counts; the
    * context, continuation and total frames all derive from that
    * counts frame (no second corpus pass). The model tables are
    * vocabulary-sized — at crawl scale too big to broadcast — so
    * scoring is three EQUI-joins of the bigram stream against them
    * (AQE-planned); only the 1-row N₁₊(··) total broadcasts. */
  def knBigramLogProb(docs: DataFrame, discount: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreWithKnModel(docs, knBigramModel(docs, discount, idCol, textCol),
      idCol, textCol)

  /** The doc bigram stream (doc_id, u, v) — the ONE tokenize shape
    * shared by model building and scoring so they cannot fork. */
  private def bigramStream(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_tk"))
      .select(col("doc_id"), explode(
        when(size(col("_tk")) >= 2,
          transform(sequence(lit(2), size(col("_tk"))),
            i => struct(element_at(col("_tk"), i - 1).as("u"),
              element_at(col("_tk"), i).as("v"))))
        .otherwise(array().cast("array<struct<u:string,v:string>>"))).as("b"))
      .select(col("doc_id"), col("b.u").as("u"), col("b.v").as("v"))

  /** Frozen KN bigram model: the count frames [[knBigramLogProb]]'s
    * estimate reads. Train once on a reference corpus, score any
    * corpus/stream ([[scoreWithKnModel]], [[graft.streaming
    * .StreamingLm]]) — the tokenizer-artifact lifecycle for the LM
    * quality gate. */
  final case class KnModel(biCounts: DataFrame, ctx: DataFrame,
      cont: DataFrame, tot: DataFrame, discount: Double)

  def knBigramModel(docs: DataFrame, discount: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): KnModel = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val biCounts = Dedup.persistTracked(
      bigramStream(docs, idCol, textCol)
        .groupBy("u", "v").agg(count(lit(1)).cast("double").as("cuv")))
    KnModel(
      biCounts,
      biCounts.groupBy("u")
        .agg(sum(col("cuv")).as("cu"), count(lit(1)).cast("double").as("n1u")),
      biCounts.groupBy("v").agg(count(lit(1)).cast("double").as("n1v")),
      biCounts.agg(count(lit(1)).cast("double").as("n1tot")),
      discount)
  }

  /** Score docs under a FROZEN KN model. Self-scoring the training
    * corpus reduces exactly to the closed formula (every event was
    * counted); for unseen text the out-of-model semantics are defined,
    * not accidental: an unseen bigram under a seen context keeps the
    * interpolated backoff with c(u,v) = 0 (and continuation floor 1
    * for an unseen word), an unseen CONTEXT falls back to the pure
    * continuation unigram — the standard "back off as far as needed"
    * ladder, every branch > 0 so log10 is total. */
  def scoreWithKnModel(docs: DataFrame, model: KnModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val d = model.discount
    val scored = bigramStream(docs, idCol, textCol)
      .join(model.biCounts, Seq("u", "v"), "left")
      .join(model.ctx, Seq("u"), "left")
      .join(model.cont, Seq("v"), "left")
      .crossJoin(broadcast(model.tot))
      .select(col("doc_id"),
        log10(when(col("cu").isNull,
            coalesce(col("n1v"), lit(1.0)) / col("n1tot"))
          .otherwise(
            greatest(coalesce(col("cuv"), lit(0.0)) - d, lit(0.0)) / col("cu") +
              lit(d) * col("n1u") / col("cu") *
              coalesce(col("n1v"), lit(1.0)) / col("n1tot"))).as("lp"))
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 4).as("kn_log10p"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("kn_log10p"))
  }

  // --- DSIR data selection --------------------------------------------
  // Data Selection via Importance Resampling (Xie et al. 2023,
  // arXiv:2302.03169): score raw documents by their importance weight
  // under hashed n-gram bucket models of a TARGET distribution vs the
  // raw corpus, then keep the high-weight docs — "select crawl text
  // that looks like the high-quality subset" without training a
  // classifier. The published method uses hashed n-gram features
  // exactly because they need no model artifact; that also makes the
  // whole op in-engine computable and oracle-replayable.

  /** Per-document DSIR score: the mean (per token) log-likelihood
    * ratio log p̂_target(b) − log p̂_raw(b) over the doc's hashed
    * unigram buckets, add-one smoothed. `targetPred` marks the target
    * rows (a trusted source, a language, a quality gate — any doc
    * predicate); the raw model is the whole corpus. Positive score =
    * looks more like the target than the average raw doc.
    *
    * Scale shape: ONE corpus tokenize pass persisted narrow
    * (id, target-flag, bucket); both bucket models come from a single
    * `numBuckets`-row partial aggregation of it (the target counts
    * ride as a conditional sum — no second pass); the ratio frame is
    * ≤ numBuckets rows and BROADCASTS, so scoring is a map-side join
    * plus one per-doc agg. Nothing scales with corpus size except the
    * two linear scans. `numBuckets` must be a power of two: the
    * oracle recomputes the bucket as an UNSIGNED md5 mod, the engine
    * as a SIGNED pmod — equal exactly when the modulus divides 2^64.
    *
    * Docs with null text score as the empty-string token (the row is
    * never lost, matching [[graft.ops.Dedup.lineDedup]]'s contract). */
  def dsirScore(docs: DataFrame, targetPred: Column, numBuckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")
    val tok = Dedup.persistTracked(docs.select(
        col(idCol).as("doc_id"), targetPred.as("_tgt"),
        explode(tokens(coalesce(col(textCol), lit("")))).as("_t"))
      .select(col("doc_id"), col("_tgt"),
        pmod(md5Low64(col("_t")), lit(numBuckets.toLong)).as("_b")))
    val counts = tok.groupBy("_b").agg(
      count(lit(1)).cast("double").as("_cr"),
      sum(when(col("_tgt"), 1.0).otherwise(0.0)).as("_ct"))
    val totals = counts.agg(sum(col("_cr")).as("_tr"), sum(col("_ct")).as("_tt"))
    val smooth = lit(numBuckets.toDouble)
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("_b"),
        (log((col("_ct") + 1.0) / (col("_tt") + smooth)) -
          log((col("_cr") + 1.0) / (col("_tr") + smooth))).as("_lr"))
    tok.join(broadcast(ratios), Seq("_b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("_lr")), 4).as("dsir_score"))
  }

  // --- Trained quality classifier -------------------------------------
  // The CCNet/fastText-style quality filter (Wenzek et al. 2020,
  // arXiv:1911.00359 use a trained linear classifier where DSIR uses
  // closed-form importance ratios): logistic regression over hashed
  // unigram term-frequency features, trained IN the engine by
  // deterministic full-batch gradient descent. This is the canonical
  // distributed-ML shape — broadcast the (tiny) weight vector, compute
  // per-partition partial gradients map-side, reduce to one
  // buckets-sized frame, update on the driver, repeat — the same loop
  // MLlib's own LogisticRegression runs via treeAggregate. The corpus
  // is featurized ONCE into a persisted one-row-per-doc frame of
  // parallel sorted (bucket, tf) arrays; each iteration is then a
  // single scan of that frame — margins and residuals compute
  // scan-side against the weight map riding as a broadcast literal —
  // plus one partial-aggregated gradient shuffle of ≤ numBuckets+1
  // rows per task. Nothing per-epoch shuffles or joins the corpus,
  // and the model state crossing the driver is `numBuckets + 1`
  // doubles per iteration (allowed driver-sized model parameters, the
  // k-means-seed precedent).
  //
  // Everything is closed-form deterministic (w₀ = 0, fixed learning
  // rate and iteration count, no sampling), so the DuckDB oracle can
  // replay the entire training run as a generated CTE chain — a
  // *trained* model with an exact SQL oracle.

  /** A trained logistic model: the weight map (hashed buckets plus
    * the bucket −1 intercept) and the hash width it was trained
    * under, INSEPARABLE. Scoring under any other width is silently
    * wrong in BOTH directions — a wider scorer leaves the narrow
    * model's upper buckets weightless, a narrower scorer folds
    * distinct trained buckets together — so the pair travels as one
    * value and the constructor proves every bucket fits the width.
    * The persisted artifact ([[TextAnalysis.saveClfModel]]) carries
    * the width for the same reason. */
  final case class ClfModel(weights: Map[Long, Double], numBuckets: Int) {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")
    require(weights.nonEmpty, "empty classifier weight map")
    require(weights.keys.forall(b => b >= -1L && b < numBuckets),
      s"weight buckets out of range for numBuckets=$numBuckets — " +
        "model trained under a different hash width")
  }

  /** Per-document probability that the doc belongs to the positive
    * class (`labelPred`), under a logistic model trained here by
    * `iterations` full-batch GD steps on hashed-unigram TF features.
    * Emits `(doc_id, clf_score)`, score rounded to 4 places. Null-text
    * docs tokenize as the empty-string token, so every input row
    * appears in the output (the [[dsirScore]] contract).
    *
    * Features: x_b = (count of tokens hashing to bucket b) / n_tokens —
    * the per-doc TF vector has L1 norm 1, which bounds every margin by
    * max|w| and keeps fixed-η GD stable without per-feature scaling.
    * The intercept is an always-on feature at bucket −1 (md5 buckets
    * are non-negative, so −1 cannot collide), appended to each doc's
    * feature arrays so the bias update rides the SAME partial-
    * aggregated gradient job — one action per iteration, not two.
    * `numBuckets` must be a power of two (signed pmod ≡ the oracle's
    * unsigned md5 mod, as in [[dsirScore]]). */
  def logisticScore(docs: DataFrame, labelPred: Column,
      numBuckets: Int = 256, iterations: Int = 5, learningRate: Double = 2.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (feat, model) = logisticCore(docs, labelPred, numBuckets, iterations,
      learningRate, idCol, textCol)
    scoredFrom(feat, model.weights)
  }

  /** Train only — returns the [[ClfModel]] (weights + hash width) that
    * [[saveClfModel]] persists and [[scoreWithClfModel]] / the
    * streaming scorer consume. */
  def trainLogistic(docs: DataFrame, labelPred: Column,
      numBuckets: Int = 256, iterations: Int = 5, learningRate: Double = 2.0,
      idCol: String = "doc_id", textCol: String = "text"): ClfModel =
    logisticCore(docs, labelPred, numBuckets, iterations, learningRate,
      idCol, textCol)._2

  /** Score ANY docs frame under a FROZEN model — no labels, no
    * training scans: one featurize pass, then a pure projection (the
    * weight map rides as a broadcast literal). This is the inference
    * half of the train-once / score-forever lifecycle (the
    * [[graft.ops.Ivf]] encode-with-frozen-model contract), and the
    * body the streaming twin runs per micro-batch. The hash width
    * comes FROM the model — there is no way to score under a
    * mismatched width through this API. */
  def scoreWithClfModel(docs: DataFrame, model: ClfModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoredFrom(clfFeatureArrays(docs, model.numBuckets, idCol, textCol),
      model.weights)

  private def scoredFrom(feat: DataFrame, w: Map[Long, Double]): DataFrame =
    feat.select(col("doc_id"),
      round(lit(1.0) / (lit(1.0) + exp(-marginCol(w))), 4).as("clf_score"))

  /** One row per document: `(doc_id, [_y,] _bs, _xs)` — the sparse
    * hashed-TF vector as PARALLEL SORTED ARRAYS (buckets ascending,
    * then the always-on bucket −1 intercept appended; `_y` rides only
    * when a label predicate is given). Built with two shuffles, once;
    * every later pass — per-epoch gradients, margins, final scoring —
    * is a pure scan of this frame. Sorted buckets also make the
    * per-doc margin summation order deterministic, which the
    * exploded-rows + weight-join form never was. Per-doc array length
    * is ≤ min(distinct tokens, numBuckets) + 1, so rows stay small at
    * any corpus scale. */
  private def clfFeatureArrays(docs: DataFrame, numBuckets: Int,
      idCol: String, textCol: String,
      labelPred: Option[Column] = None): DataFrame = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")
    val lbl = labelPred.map(p => Seq(p.cast("double").as("_y")))
      .getOrElse(Nil)
    val yCols = if (lbl.isEmpty) Nil else Seq(col("_y"))
    val tk = docs.select(col(idCol).as("doc_id") +: lbl :+
      tokens(coalesce(col(textCol), lit(""))).as("_tk"): _*)
    tk.select(Seq(col("doc_id")) ++ yCols ++ Seq(
        size(col("_tk")).cast("double").as("_n"), explode(col("_tk")).as("_t")): _*)
      .select(Seq(col("doc_id")) ++ yCols ++ Seq(col("_n"),
        pmod(md5Low64(col("_t")), lit(numBuckets.toLong)).as("_b")): _*)
      .groupBy((Seq(col("doc_id")) ++ yCols ++ Seq(col("_n"), col("_b"))): _*)
      .agg((count(lit(1)) / col("_n")).as("_x"))
      .groupBy((Seq(col("doc_id")) ++ yCols): _*)
      .agg(sort_array(collect_list(struct(col("_b"), col("_x")))).as("_f"))
      .select(Seq(col("doc_id")) ++ yCols ++ Seq(
        concat(transform(col("_f"), s => s("_b")), array(lit(-1L))).as("_bs"),
        concat(transform(col("_f"), s => s("_x")), array(lit(1.0))).as("_xs")): _*)
  }

  /** Scan-side margin Σ w[b]·x over the parallel feature arrays — the
    * weights ride as a broadcast map LITERAL (≤ numBuckets+1 doubles),
    * so a margin pass is a projection: no join, no shuffle, summation
    * in sorted-bucket order. Absent buckets contribute 0, matching the
    * oracle's LEFT JOIN + coalesce. */
  /** Codegen'd sparse margin over the per-doc feature arrays
    * ([[graft.etl.expressions.SparseMargin]]) — replaced the r13
    * interpreted `aggregate(zip_with(...))` form, which re-walked an
    * interpreted lambda per array element per class per epoch.
    * Bit-identical accumulation (array order, missing-bucket ≡ +0.0),
    * so every training oracle replays unchanged. */
  private def marginCol(w: Map[Long, Double]): Column =
    if (w.isEmpty) lit(0.0)
    else {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.etl.expressions.SparseMargin(
        Bridge.expression(col("_bs")), Bridge.expression(col("_xs")),
        graft.etl.expressions.SparseMargin.build(w)))
    }

  private def logisticCore(docs: DataFrame, labelPred: Column,
      numBuckets: Int, iterations: Int, learningRate: Double,
      idCol: String, textCol: String): (DataFrame, ClfModel) = {
    require(iterations >= 1, s"need at least one GD step, got $iterations")
    val spark = docs.sparkSession
    import spark.implicits._
    // one tokenize+featurize pass persisted as per-doc arrays; every
    // epoch below is a scan of this frame, never a corpus shuffle
    val feat = Dedup.persistTracked(
      clfFeatureArrays(docs, numBuckets, idCol, textCol, Some(labelPred)))
    // raw count, not a precomputed eta: the oracle's update is
    // `lr * CAST(sum(..) AS DOUBLE) / n` — ONE float rounding; lr/n
    // precomputed would round twice (same fix as lidCore)
    val cnt = docs.count().toDouble
    var w = Map.empty[Long, Double]
    for (_ <- 1 to iterations) {
      // residual r = y − σ(m) computes scan-side; the only shuffle is
      // the partial-aggregated gradient — ≤ numBuckets+1 rows per task
      // each term rounds to DECIMAL(38,12) before the distributed sum
      // (the calibrationBins s4 trick, widened): decimal summation is
      // EXACT and order-free, so the gradient is identical under any
      // partitioning and equals the oracle's replay by arithmetic, not
      // by summation-order luck (the last open r9 ADVICE item).
      // |x·r| ≤ 1 ⇒ 38-12 = 26 integer digits absorb ~10^26 terms.
      val grad = feat
        .select(col("_bs"), col("_xs"),
          (col("_y") - lit(1.0) / (lit(1.0) + exp(-marginCol(w)))).as("_r"))
        .select(explode(zip_with(col("_bs"), col("_xs"),
          (b, x) => struct(b.as("_b"), x.as("_x")))).as("_z"), col("_r"))
        .groupBy(col("_z._b").as("_b"))
        .agg(sum((col("_z._x") * col("_r")).cast("decimal(38,12)"))
          .cast("double").as("_g"))
        .as[(Long, Double)].collect()
      w = w ++ grad.map { case (b, g) =>
        b -> (w.getOrElse(b, 0.0) + learningRate * g / cnt) }
    }
    (feat, ClfModel(w, numBuckets))
  }

  /** Classifier model → parquet `(b, w, nb)`; parquet round-trips
    * IEEE doubles exactly, so a loaded model scores BYTE-IDENTICALLY
    * (the [[graft.ops.AnnModels]] contract, asserted in OpsSpec). The
    * hash width rides IN the artifact: a model is meaningless without
    * it, and [[ClfModel]]'s constructor re-proves the pair consistent
    * on load. */
  def saveClfModel(spark: org.apache.spark.sql.SparkSession,
      model: ClfModel, path: String): Unit =
    clfModelFrame(spark, model).coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** The model as its artifact FRAME `(b, w, nb)` — shared by
    * [[saveClfModel]] and the [[graft.ops.ArtifactStore]] families so
    * the persisted shape cannot fork between the two stores. */
  def clfModelFrame(spark: org.apache.spark.sql.SparkSession,
      model: ClfModel): DataFrame = {
    import spark.implicits._
    model.weights.toSeq.sortBy(_._1)
      .map { case (b, w) => (b, w, model.numBuckets) }
      .toDF("b", "w", "nb")
  }

  /** Artifact frame → [[ClfModel]]; fails loudly on an empty frame
    * (a zero-row parquet is a broken write, not a model). */
  def clfModelOf(frame: DataFrame): ClfModel = {
    val rows = frame.select("b", "w", "nb").collect()
    require(rows.nonEmpty, "empty classifier artifact frame")
    ClfModel(rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap,
      rows.head.getInt(2))
  }

  /** Parquet artifact → [[ClfModel]]. */
  def loadClfModel(spark: org.apache.spark.sql.SparkSession,
      path: String): ClfModel =
    try clfModelOf(spark.read.parquet(path))
    catch { case e: IllegalArgumentException =>
      throw new IllegalArgumentException(
        s"classifier artifact at $path: ${e.getMessage}") }

  /** LID model → parquet `(k, b, w, nb, n)` — one row per (class,
    * bucket) weight; the hash width AND the char-gram size ride in
    * the artifact ([[saveClfModel]] contract: a model is meaningless
    * without its featurizer parameters, and [[LidModel]]'s
    * constructor re-proves the tuple consistent on load). Parquet
    * round-trips IEEE doubles exactly, so a loaded model scores
    * byte-identically. */
  def saveLidModel(spark: org.apache.spark.sql.SparkSession,
      model: LidModel, path: String): Unit =
    lidModelFrame(spark, model).coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** The model as its artifact FRAME `(k, b, w, nb, n)` — shared by
    * [[saveLidModel]] and the [[graft.ops.ArtifactStore]] `lid_docs`
    * family so the persisted shape cannot fork. */
  def lidModelFrame(spark: org.apache.spark.sql.SparkSession,
      model: LidModel): DataFrame = {
    import spark.implicits._
    model.classes.flatMap { k =>
      model.weights(k).toSeq.sortBy(_._1)
        .map { case (b, w) => (k, b, w, model.numBuckets, model.n) }
    }.toDF("k", "b", "w", "nb", "n")
  }

  /** Artifact frame → [[LidModel]]; fails loudly on an empty frame.
    * Classes are recovered from the rows (sorted — the [[LidModel]]
    * tie-break invariant re-proves itself). */
  def lidModelOf(frame: DataFrame): LidModel = {
    val rows = frame.select("k", "b", "w", "nb", "n").collect()
    require(rows.nonEmpty, "empty LID artifact frame")
    val classes = rows.map(_.getString(0)).distinct.sorted.toSeq
    val w = rows.groupBy(_.getString(0)).map { case (k, rs) =>
      k -> rs.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    }
    LidModel(classes, w, rows.head.getInt(3), rows.head.getInt(4))
  }

  /** Parquet artifact → [[LidModel]]. */
  def loadLidModel(spark: org.apache.spark.sql.SparkSession,
      path: String): LidModel =
    try lidModelOf(spark.read.parquet(path))
    catch { case e: IllegalArgumentException =>
      throw new IllegalArgumentException(
        s"LID artifact at $path: ${e.getMessage}") }

  /** Persist a [[KnModel]] — ONLY the bigram count frame travels (the
    * context/continuation/total frames are derived views, rebuilt on
    * load from the same counts, so the artifact cannot carry an
    * inconsistent model); the discount rides as a column so scoring
    * cannot silently use a different smoothing than training. At crawl
    * scale the counts frame is vocabulary-sized — written distributed,
    * no coalesce. */
  def saveKnModel(model: KnModel, path: String): Unit =
    model.biCounts
      .select(col("u"), col("v"), col("cuv"),
        lit(model.discount).as("discount"))
      .write.mode("overwrite").parquet(path)

  /** Parquet artifact → [[KnModel]]. Fails loudly on an empty or
    * corrupt artifact (zero rows, non-positive counts, or an
    * out-of-range discount would silently mis-score every document). */
  def loadKnModel(spark: org.apache.spark.sql.SparkSession,
      path: String): KnModel = {
    val raw = spark.read.parquet(path)
    val head = raw.select(min(col("cuv")).as("minc"),
      min(col("discount")).as("dlo"), max(col("discount")).as("dhi")).head()
    require(!head.isNullAt(0), s"empty KN model artifact at $path")
    require(head.getDouble(0) >= 1.0,
      s"KN artifact at $path has non-positive counts (min ${head.getDouble(0)})")
    val (dlo, dhi) = (head.getDouble(1), head.getDouble(2))
    require(dlo == dhi && dlo > 0 && dlo < 1,
      s"KN artifact at $path has inconsistent/out-of-range discount [$dlo,$dhi]")
    val biCounts = Dedup.persistTracked(raw.select("u", "v", "cuv"))
    KnModel(
      biCounts,
      biCounts.groupBy("u")
        .agg(sum(col("cuv")).as("cu"), count(lit(1)).cast("double").as("n1u")),
      biCounts.groupBy("v").agg(count(lit(1)).cast("double").as("n1v")),
      biCounts.agg(count(lit(1)).cast("double").as("n1tot")),
      dlo)
  }

  // --- Retrieval chunking ---------------------------------------------
  // The RAG-prep counterpart of sequence packing: split each document
  // into overlapping fixed-size token windows (overlap preserves
  // context across chunk boundaries for retrieval; packing's split
  // mode deliberately has none — training shards must not duplicate
  // tokens). Scan-fused explode, zero shuffle: chunk counts derive
  // from per-row arithmetic, never from corpus state.

  /** Sliding token windows: chunks start at 0, stride, 2·stride, …;
    * each takes `chunkSize` tokens (the last may be shorter); every
    * doc — including an empty one — emits at least one chunk, and
    * emits no chunk that merely re-covers the previous one (the last
    * start is the smallest multiple of stride reaching the doc's
    * tail). Output `(doc_id, chunk_idx, chunk_text, n_tokens)`. */
  def chunkSliding(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val tk = docs.select(col(idCol).as("doc_id"),
      tokens(coalesce(col(textCol), lit(""))).as("_tk"))
    val numChunks = lit(1) + floor(
      (greatest(size(col("_tk")) - chunkSize, lit(0)) + (stride - 1))
        .cast("double") / stride).cast("int")
    tk.select(col("doc_id"), col("_tk"),
        explode(sequence(lit(0), numChunks - 1)).as("_i"))
      .select(col("doc_id"), col("_i").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_tk"), col("_i") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("_tk"), col("_i") * stride + 1, lit(chunkSize))).cast("long")
          .as("n_tokens"))
  }

  /** Rolling (Rabin-Karp-style) fingerprint over tokens —
    * order-sensitive, cheap to maintain incrementally at ingest. Spark
    * `aggregate` keeps it sequential per document (deterministic). The
    * accumulator is bounded by a Mersenne-prime modulus so the chained
    * multiply can't overflow (Spark 4 ANSI mode errors on long
    * overflow). */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 1000003L + crc32(t.cast("binary")).cast("long"),
        lit(2305843009213693951L / 1000003L)))

  /** Token n-grams (space-joined) from a HOISTED token-array column.
    * Callers must materialize the tokens as a real column first —
    * expressions inside the lambda body re-evaluate per element, so an
    * inline `split()` here would cost O(len²) per document. */
  def ngramsFromTokens(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", slice(tk, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  // Repetition signals (the Gopher/RefinedWeb-style quality gates for
  // pretraining data): documents dominated by repeated n-grams are
  // boilerplate/spam and get filtered before training. Both operate on
  // a hoisted n-gram array column, are scan-fused, and shuffle nothing.
  /** Fraction of n-gram occurrences that repeat an earlier occurrence
    * (0 = no internal repetition, → 1 as the doc degenerates into one
    * repeated phrase). */
  def dupNgramFraction(grams: Column): Column =
    when(size(grams) > 0,
      round((size(grams) - size(array_distinct(grams))).cast("double") /
        size(grams), 4))
      .otherwise(lit(0.0))

  /** Fraction of occurrences taken by the single most frequent n-gram.
    * The modal count is ONE codegen hash pass per document
    * ([[graft.etl.expressions.ModalCount]]) — O(n) in document length;
    * the nested higher-order column form it replaces was
    * O(distinct × total), i.e. quadratic per row, which turns one
    * pathological long document into a task-pinning straggler. */
  def topNgramFraction(grams: Column): Column = {
    val top = org.apache.spark.sql.graft.Bridge.column(
      graft.etl.expressions.ModalCount(
        org.apache.spark.sql.graft.Bridge.expression(grams)))
    when(size(grams) > 0,
      round(top.cast("double") / size(grams), 4)).otherwise(lit(0.0))
  }

  /** Deterministic feature-hashing text embedder (the "hashing trick"):
    * tokens hash into `dim` buckets (md5 low-64 — the same cross-engine
    * recomputable hash as SimHash), each token contributes ±1 by an
    * independent hash bit, and the bucket sums are L2-normalized. The
    * classical no-model text-vectorization baseline — closes the
    * text → vector loop IN-ENGINE, so documents can flow straight into
    * the vec_* similarity/dedup/ANN operators without an external
    * embedding model. Signed-hash cancellation makes the estimator
    * unbiased (Weinberger et al., feature hashing).
    *
    * Sparse form (doc_id, b, v): one row per OCCUPIED bucket with the
    * normalized component — exploded scalars, exactly hash-checkable
    * cross-engine. Two narrow shuffles (bucket sums, per-doc norm). */
  def hashEmbedSparse(docs: DataFrame, dim: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("t_h", md5Low64(col("tok")))
    val w = tok.select(col("doc_id"), pmod(col("t_h"), lit(dim)).as("b"),
        when(shiftrightunsigned(col("t_h"), 62).bitwiseAND(lit(1L)) === 1L,
          lit(1.0)).otherwise(lit(-1.0)).as("s"))
      .groupBy("doc_id", "b").agg(sum("s").as("w"))
    val nrm = sqrt(sum(col("w") * col("w"))
      .over(Window.partitionBy(col("doc_id"))))
    w.select(col("doc_id"), col("b"),
      round(when(nrm > 0, col("w") / nrm).otherwise(lit(0.0)), 4).as("v"))
  }

  /** Dense form (doc_id, embedding: array<float>) — schema-compatible
    * with the `embeddings` table, so the output feeds
    * [[Similarity]] / [[Dedup.embeddingNearDupPairs]] / [[Ivf]] / [[Pq]]
    * directly. Assembled from the sparse rows (scatter into a
    * zero-array per doc). */
  def hashEmbedDense(docs: DataFrame, dim: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    hashEmbedSparse(docs, dim, idCol, textCol)
      .groupBy(col("doc_id").as(idCol))
      .agg(collect_list(struct(col("b"), col("v"))).as("es"))
      .select(col(idCol),
        aggregate(col("es"),
          array_repeat(lit(0.0f), dim),
          (acc, e) => transform(acc, (x, i) =>
            when(i === e.getField("b").cast("int"),
              x + e.getField("v").cast("float")).otherwise(x)))
          .as("embedding"))

  /** One-pass document profile. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_chars", length(t))
      .withColumn("ttr", round(size(array_distinct(tokens(t))).cast("double") /
        tokenCount(t), 4))
      .withColumn("stop_ratio", round(stopwordCount(t).cast("double") /
        tokenCount(t), 4))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", md5Fingerprint(t))
  }
}
