package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven curation: declare the crawl pipeline as a stage list
  * instead of hand-chaining operators — the scaled-up analog of the
  * reference's transform plugin registry (`internal/plugins/
  * registry.go:1-51`: named transforms, case-insensitive lookup, hard
  * error on an unknown name), applied to the corpus-curation surface.
  *
  * The pipeline frame contract: `doc_id` + `textCol`, with any other
  * columns riding along untouched (gates filter rows, rewrites replace
  * the text column in place, dedup stages join their cleaned text back
  * by id so passthrough columns survive). Every stage here is a thin
  * binding to an operator that already has its own oracle-checked
  * query — the registry adds composition, never new semantics.
  *
  * Config shape (the reference's limited-YAML spirit):
  * {{{
  * stages:
  *   - html_extract
  *   - encoding_gate max_bad_ratio=0.01
  *   - line_dedup max_occurrences=1
  *   - quality_gate min_quality=0.6
  *   - exact_keeper
  * }}}
  */
object CurationPipeline {

  /** A stage: (frame, params) → frame. */
  type Stage = (DataFrame, Map[String, String]) => DataFrame

  private def p(params: Map[String, String], key: String,
      default: String): String = params.getOrElse(key, default)

  private def textRewrite(d: DataFrame, c: Column => Column): DataFrame =
    d.withColumn("text", c(col("text")))

  /** Dedup stages emit (doc_id, clean_text, …); join the cleaned text
    * back so passthrough columns survive. */
  private def rejoinClean(d: DataFrame, cleaned: DataFrame): DataFrame =
    d.drop("text").join(
      cleaned.select(col("doc_id"), col("clean_text").as("text")), Seq("doc_id"))

  val registry: Map[String, Stage] = Map(
    "html_extract" -> ((d, _) => textRewrite(d, t =>
      when(t.contains("<html"), TextAnalysis.htmlToText(t)).otherwise(t))),
    "encoding_gate" -> ((d, prm) => {
      val (_, _, _, keep) = TextAnalysis.encodingQuality(col("text"),
        p(prm, "max_bad_ratio", "0.01").toDouble)
      d.filter(keep)
    }),
    "canonicalize" -> ((d, _) => textRewrite(d, TextAnalysis.canonicalText)),
    "pii_scrub" -> ((d, _) => textRewrite(d, TextAnalysis.scrubPii)),
    "line_dedup" -> ((d, prm) => rejoinClean(d,
      Dedup.lineDedup(d, p(prm, "max_occurrences", "1").toLong))),
    "para_dedup" -> ((d, prm) => rejoinClean(d,
      Dedup.paragraphDedup(d, p(prm, "max_occurrences", "1").toLong))),
    "substr_dedup" -> ((d, prm) => rejoinClean(d,
      Dedup.exactSubstringDedup(d, p(prm, "k", "8").toInt,
        p(prm, "max_occurrences", "1").toLong))),
    "quality_gate" -> ((d, prm) => d.filter(
      TextAnalysis.qualityScore(col("text")) >=
        p(prm, "min_quality", "0.5").toDouble)),
    "lang_gate" -> ((d, prm) => d.filter(
      col("lang").isInCollection(p(prm, "langs", "en").split('|').toSeq))),
    "length_gate" -> ((d, prm) => {
      val n = TextAnalysis.tokenCount(col("text"))
      d.filter(n >= p(prm, "min_tokens", "1").toInt &&
        n <= p(prm, "max_tokens", Int.MaxValue.toString).toInt)
    }),
    "exact_keeper" -> ((d, _) => {
      val keep = d
        .select(TextAnalysis.md5Fingerprint(col("text")).as("_fp"),
          col("doc_id"))
        .groupBy("_fp").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      d.join(keep, Seq("doc_id"), "left_semi")
    }))

  /** Apply stages in order. Unknown stage = hard error naming the
    * registry (the reference registry's contract, `registry.go:34-38`);
    * lookup is case-insensitive like the reference's. */
  def apply(docs: DataFrame,
      stages: Seq[(String, Map[String, String])]): DataFrame =
    stages.foldLeft(docs) { case (d, (name, params)) =>
      registry.get(name.toLowerCase) match {
        case Some(stage) => stage(d, params)
        case None => throw new IllegalArgumentException(
          s"unknown curation stage '$name'; known: " +
            registry.keys.toSeq.sorted.mkString(", "))
      }
    }

  /** Parse the stages config: a `stages:` key followed by `- name
    * [k=v ...]` items (the reference's limited-YAML shape). Blank
    * lines and `#` comments skipped. */
  def parseStages(text: String)
      : Either[String, Seq[(String, Map[String, String])]] = {
    val lines = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    if (!lines.headOption.contains("stages:"))
      return Left("config must start with 'stages:'")
    val items = lines.drop(1)
    val bad = items.filterNot(_.startsWith("- "))
    if (bad.nonEmpty) return Left(s"not a '- stage' item: '${bad.head}'")
    val parsed = items.map { l =>
      val tokens = l.drop(2).trim.split("\\s+").toSeq
      val (kvs, names) = tokens.partition(_.contains("="))
      if (names.size != 1)
        return Left(s"stage item needs exactly one name: '$l'")
      val params = kvs.map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> v
      }.toMap
      names.head -> params
    }
    Right(parsed)
  }

  /** Load + apply from a config string. */
  def fromConfig(docs: DataFrame, configText: String): DataFrame =
    parseStages(configText).fold(
      err => throw new IllegalArgumentException(s"curation config: $err"),
      stages => apply(docs, stages))
}
