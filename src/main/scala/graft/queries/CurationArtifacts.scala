package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{ArtifactStore, Eval, TextAnalysis, UnigramLm}

/** The build/consume artifact split applied to the model-driven
  * curation family (r15, verdict #2) — the [[graft.ops.SuffixIndex]]
  * pattern (its measured payoff: `tx_repeated_seqs` 23.5 → 1.2 s)
  * for the trained gates: at 100 TB a lab trains its quality
  * classifier, calibration map and tokenizer ONCE per corpus release
  * and every selection run applies the frozen models; retraining
  * inside every query was the r14 verdict's top cost finding
  * (tx_curation12 13.6 s, tx_curation17 9.1, tx_clf_gate_holdout
  * 8.1 — each dominated by an in-query training pass).
  *
  * Families (all stored through [[graft.ops.ArtifactStore]], corpus
  * fingerprint + config guarded, newest-N swept):
  *   - `pool`: the curated v6 pool itself — (doc_id, source, lang,
  *     text) survivors of extract → encoding gate → line dedup →
  *     decon → gates → keeper → bigram floor → tempered mix. The
  *     pool is the "corpus release" every model below trains on and
  *     every selection row consumes. Build line: `tx_pool_build`.
  *   - `clf_pool`: logistic quality gate + isotonic calibration
  *     trained ON the pool (curation12's gate). Build line:
  *     `tx_clf_pool_build`.
  *   - `clf_holdout`: corpus-split classifier + holdout-fitted
  *     calibration GRID (tx_clf_gate_holdout's model). Build line:
  *     `tx_clf_build`.
  *   - `unigram_pool`: the pool-trained unigram-LM segmentation
  *     table (curation17's tokenizer). Build line:
  *     `tx_unigram_pool_build`.
  *
  * Every consumer keeps its FULL-REPLAY DuckDB oracle unchanged:
  * parquet round-trips the model frames exactly, so a loaded model
  * scores byte-identically to in-query training — a wrong byte in a
  * saved artifact breaks the same driver hashes that pinned the
  * in-query form through r14. Version strings below bump whenever
  * the producing chain changes shape, so a warehouse surviving a
  * code change cannot silently serve a stale model. */
object CurationArtifacts {

  /** Bump when the v6 chain ([[TextQueries.curation6Frames]]) or the
    * pool projection changes. */
  val PoolVersion = "v6pool:1"

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The pool frame computed FRESH (the expensive path — the whole
    * v6 chain runs): v6 survivors with source and lang. */
  private def buildPool(spark: SparkSession, dir: String)
      : Map[String, DataFrame] = {
    val f = TextQueries.curation6Frames(spark, dir)
    Map("pool" -> f("keeper")
      .join(f("sampled").select("doc_id"), Seq("doc_id"), "left_semi")
      .join(docs(spark, dir).select("doc_id", "lang"), Seq("doc_id"))
      .select("doc_id", "source", "lang", "text"))
  }

  /** The curated pool as a leaf scan — loads the saved artifact when
    * fresh, runs the v6 chain and saves on miss/staleness. */
  def pool(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.loadOrBuild(spark, dir, "pool", PoolVersion,
      Seq("pool"))(buildPool(spark, dir))("pool")

  /** Force-rebuild the pool (the `tx_pool_build` semantics). */
  def poolRebuild(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.rebuild(spark, dir, "pool", PoolVersion,
      Seq("pool"))(buildPool(spark, dir))("pool")

  // ------------------------------------------------ pool classifier

  private def clfPoolConfig =
    s"b=${TextQueries.ClfBuckets},it=${TextQueries.ClfIters}," +
      s"lr=${TextQueries.ClfLr},lbl=lang_en,$PoolVersion"

  private def clfPoolFrames(spark: SparkSession, dir: String)
      : Map[String, DataFrame] = {
    val p = pool(spark, dir)
    val model = TextAnalysis.trainLogistic(p, col("lang") === "en",
      numBuckets = TextQueries.ClfBuckets,
      iterations = TextQueries.ClfIters,
      learningRate = TextQueries.ClfLr)
    val scored = TextAnalysis.scoreWithClfModel(p, model)
    val iso = Eval.isotonicFit(
      scored.join(p.select("doc_id", "lang"), Seq("doc_id")),
      col("lang") === "en")
    Map("model" -> TextAnalysis.clfModelFrame(spark, model), "iso" -> iso)
  }

  /** Pool-trained gate: (frozen classifier, isotonic frame). */
  def clfPool(spark: SparkSession, dir: String)
      : (TextAnalysis.ClfModel, DataFrame) = {
    val f = ArtifactStore.loadOrBuild(spark, dir, "clf_pool",
      clfPoolConfig, Seq("model", "iso"))(clfPoolFrames(spark, dir))
    (TextAnalysis.clfModelOf(f("model")), f("iso"))
  }

  /** Force-retrain the pool gate (the `tx_clf_pool_build`
    * semantics); returns the weight frame. */
  def clfPoolRebuild(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.rebuild(spark, dir, "clf_pool", clfPoolConfig,
      Seq("model", "iso"))(clfPoolFrames(spark, dir))("model")

  // --------------------------------------------- holdout classifier

  private def clfHoldoutConfig =
    s"b=${TextQueries.ClfBuckets},it=${TextQueries.ClfIters}," +
      s"lr=${TextQueries.ClfLr},frac=${TextQueries.ClfTrainFrac},grid=10001"

  private def clfHoldoutFrames(spark: SparkSession, dir: String)
      : Map[String, DataFrame] = {
    // spread the per-row CPU-heavy training stages across cores — the
    // small-SF scan is one file split (the spreadById lesson)
    val d = QueryUtil.spreadById(docs(spark, dir))
    val isTrain = graft.ops.Sampling.unitHash(col("doc_id")) <
      TextQueries.ClfTrainFrac
    val model = TextAnalysis.trainLogistic(d.filter(isTrain),
      col("lang") === "en", numBuckets = TextQueries.ClfBuckets,
      iterations = TextQueries.ClfIters,
      learningRate = TextQueries.ClfLr)
    val hold = d.filter(!isTrain)
    val iso = Eval.isotonicFit(
      TextAnalysis.scoreWithClfModel(hold, model)
        .join(hold.select(col("doc_id"), col("lang")), Seq("doc_id")),
      col("lang") === "en")
    // isotonic step extension materialized on the 4-dp score GRID
    // (10001 rows) — pool-side lookups stay broadcast EQUI-joins.
    // The below-the-smallest-knot prefix takes the WHOLE-partition
    // first non-null fitted value, not a shrinking
    // [currentRow, unboundedFollowing) frame: Spark re-evaluates a
    // shrinking frame from its start for every row — O(n²) over the
    // grid, measured 2.4 s of tx_clf_build's 8 s (r18) — while the
    // whole-partition frame is computed once (O(n)). Identical
    // values: the following-first is only ever consulted where ALL
    // preceding fitted are null (the prefix below the first knot),
    // and there it equals the partition-wide first non-null.
    val iso4 = iso.select(
      round(col("score") * 10000).cast("long").as("s4"), col("fitted"))
    val wDown = Window.orderBy("s4")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("s4")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val calGrid = spark.range(0, 10001).select(col("id").as("s4"))
      .join(iso4, Seq("s4"), "left")
      .select(col("s4"), coalesce(
        last(col("fitted"), ignoreNulls = true).over(wDown),
        first(col("fitted"), ignoreNulls = true).over(wAll))
        .as("calibrated"))
    Map("model" -> TextAnalysis.clfModelFrame(spark, model),
      "grid" -> calGrid)
  }

  /** Holdout-trained gate: (frozen classifier, 10001-row calibration
    * grid `(s4, calibrated)`). */
  def clfHoldout(spark: SparkSession, dir: String)
      : (TextAnalysis.ClfModel, DataFrame) = {
    val f = ArtifactStore.loadOrBuild(spark, dir, "clf_holdout",
      clfHoldoutConfig, Seq("model", "grid"))(clfHoldoutFrames(spark, dir))
    (TextAnalysis.clfModelOf(f("model")), f("grid"))
  }

  /** Force-retrain the holdout gate (the `tx_clf_build` semantics);
    * returns the weight frame. */
  def clfHoldoutRebuild(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.rebuild(spark, dir, "clf_holdout", clfHoldoutConfig,
      Seq("model", "grid"))(clfHoldoutFrames(spark, dir))("model")

  // ----------------------------------------------------- LID model

  private def lidConfig =
    s"b=${TextQueries.LidBuckets},it=${TextQueries.LidIters}," +
      s"lr=${TextQueries.LidLr},n=${TextQueries.LidN}," +
      s"cls=${TextAnalysis.LidClasses.mkString("+")}"

  private def lidFrames(spark: SparkSession, dir: String)
      : Map[String, DataFrame] = {
    val d = QueryUtil.spreadById(docs(spark, dir))
    val model = TextAnalysis.trainLid(d, TextAnalysis.LidClasses,
      numBuckets = TextQueries.LidBuckets,
      iterations = TextQueries.LidIters,
      learningRate = TextQueries.LidLr, n = TextQueries.LidN)
    Map("model" -> TextAnalysis.lidModelFrame(spark, model))
  }

  /** Corpus-trained LID as a frozen model — tx_langid is the
    * always-retrain build line (it trains in-query AND saves here);
    * tx_langid_confusion and curation14's language gate consume. */
  def lid(spark: SparkSession, dir: String): TextAnalysis.LidModel =
    TextAnalysis.lidModelOf(ArtifactStore.loadOrBuild(spark, dir,
      "lid_docs", lidConfig, Seq("model"))(lidFrames(spark, dir))("model"))

  /** Save a just-trained LID model under the family key (called by
    * the build line so training runs ONCE in-query — the scored
    * output and the artifact come from the same weights). */
  def lidSave(spark: SparkSession, dir: String,
      model: TextAnalysis.LidModel): Unit = {
    ArtifactStore.rebuild(spark, dir, "lid_docs", lidConfig,
      Seq("model"))(Map("model" -> TextAnalysis.lidModelFrame(spark,
      model)))
    ()
  }

  // ------------------------------------------------- pool tokenizer

  private def unigramPoolConfig =
    s"em=${UnigramLm.EmRounds},$PoolVersion"

  private def unigramPoolFrames(spark: SparkSession, dir: String)
      : Map[String, DataFrame] =
    Map("seg" -> UnigramLm.learn(pool(spark, dir))._3)

  /** Pool-trained unigram-LM segmentation table (word, cnt, n_uni,
    * uni_pieces) — the frozen tokenizer curation17 budgets under. */
  def unigramPool(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.loadOrBuild(spark, dir, "unigram_pool",
      unigramPoolConfig, Seq("seg"))(unigramPoolFrames(spark, dir))("seg")

  /** Force-retrain the pool tokenizer (the `tx_unigram_pool_build`
    * semantics); returns the segmentation table. */
  def unigramPoolRebuild(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.rebuild(spark, dir, "unigram_pool",
      unigramPoolConfig, Seq("seg"))(unigramPoolFrames(spark, dir))("seg")
}
