package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-owned second-decade scaling corpus (r11 verdict #1): the
  * driver's testdata stops at sf0.1, so every 100 TB claim rested on
  * ONE measured decade (sf0.01 → sf0.1) plus design audit. This tool
  * synthesizes a ~10× sf0.1 `documents` + `embeddings` corpus under
  * `scaledata/` (never touching /root/testdata) so the heavy families
  * can be measured across a SECOND decade.
  *
  * Construction — 10 copies of the source, each under a deterministic
  * per-copy transform chosen so the workload SHAPE scales linearly
  * (what a 10× crawl actually looks like) instead of degenerating:
  *
  *  - documents: copy k applies a BIJECTIVE vocabulary rotation
  *    (token → vocab[(rank + k) mod V], identity for k = 0). A
  *    bijection preserves every within-copy similarity relation
  *    EXACTLY — exact-dup groups, n-gram Jaccard, MinHash signatures,
  *    connected components — so duplicate-group COUNT scales 10× while
  *    group SIZES stay constant. Cross-copy shingle overlap collapses
  *    to the ~1% random-coincidence floor (a shifted 5-gram must
  *    pre-exist in the source to collide), so copies do NOT become one
  *    giant near-dup family — which would have made the candidate
  *    graph grow quadratically and measured a workload no real 10×
  *    corpus has.
  *  - embeddings: copy k applies a cyclic DIMENSION rotation — an
  *    orthogonal transform, so all within-copy inner products, norms
  *    and neighbor ranks are preserved exactly; cross-copy geometry
  *    scrambles. Vector count scales 10×, per-copy ANN structure is
  *    invariant.
  *  - ids offset by k·1,000,000 (source ids are < 10^4), lang/source
  *    strata carried through, n_chars recomputed post-remap.
  *
  * Zero RNG, zero wall-clock: every choice is (k, rank) arithmetic,
  * so the corpus is reproducible bit-for-bit.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> [copies]
  *          [tables]
  * `tables` = `all` (default) or `documents` — the documents-only
  * mode exists because the vocabulary supports far more distinct
  * rotations (thousands) than the embedding dimension (64), so a
  * THIRD-decade documents corpus (copies = 100) is constructible
  * while embeddings stop at the second decade.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val tables = if (args.length > 3) args(3) else "all"
    require(tables == "all" || tables == "documents",
      s"tables must be 'all' or 'documents', got '$tables'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").distinct()
      .orderBy("t").as[String].collect()
    val v = vocab.length
    // copy transforms beyond the v distinct rank rotations compose the
    // rotation with a per-LEVEL digit suffix (level = k / v): the
    // vocabulary is digit-free, so suffixed tokens collide with
    // nothing, and the composed map stays a per-copy BIJECTION — every
    // within-copy similarity relation is preserved exactly, same as
    // the pure rotation. The two quality-stopwords ('the', 'a') keep
    // their surface form at every level so stopword-dependent gates
    // stay exercised at the same per-copy rates pure rotation already
    // gives (rotation moves stopword identity between copies anyway).
    // This unlocks a THIRD-decade documents corpus (copies = 100 over
    // a 31-token vocabulary) — levels 0..9 cap the tool at 10·v copies
    require(copies <= 10 * v,
      s"need copies <= 10x vocab size for distinct transforms ($copies > ${10 * v})")
    val rankMap = typedlit(vocab.zipWithIndex.toMap)
    val vocabArr = typedlit(vocab)
    val ks = spark.range(0, copies).select(col("id").cast("int").as("_k"))

    val lvl = (col("_k") / v).cast("int")
    val outDocs = docs.crossJoin(broadcast(ks))
      .select(
        (col("_k") * 1000000L + col("doc_id")).as("doc_id"),
        array_join(transform(split(col("text"), " "), t => {
          val rot = element_at(vocabArr,
            pmod(element_at(rankMap, t) + col("_k"), lit(v)) + 1)
          coalesce(
            when(lvl === 0 || rot.isin("the", "a"), rot)
              .otherwise(concat(rot, lvl.cast("string"))),
            t)
        }), " ").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    outDocs.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    val ne = if (tables == "all") {
      val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
      val dim = embs.select(size(col("embedding"))).head().getInt(0)
      // k ranges over copies: k >= dim would repeat rotations (breaking
      // the cross-copy geometry-scrambling invariant) and make the
      // first slice length negative (runtime failure)
      require(copies <= dim,
        s"need copies <= embedding dim for distinct rotations ($copies > $dim)")
      val outEmbs = embs.crossJoin(broadcast(ks))
        .select(
          (col("_k") * 1000000L + col("vec_id")).as("vec_id"),
          concat(
            slice(col("embedding"), col("_k") + 1, lit(dim) - col("_k")),
            slice(col("embedding"), lit(1), col("_k"))).as("embedding"),
          col("label"))
      outEmbs.repartition(8).write.mode("overwrite")
        .parquet(s"$outDir/embeddings.parquet")
      spark.read.parquet(s"$outDir/embeddings.parquet").count()
    } else 0L

    val out = spark.read.parquet(s"$outDir/documents.parquet")
    val nd = out.count()
    // self-check the bijection invariant the whole corpus design rests
    // on: duplicate-group count must scale EXACTLY linearly in copies
    // (group sizes constant). The stopword carve-out makes this
    // non-obvious — a doc whose every token rotates into a preserved
    // stopword would be byte-identical across suffix levels and inject
    // cross-copy duplicates pure rotation never produced (latent: the
    // current corpus has no 1-2-distinct-token docs) — so the tool
    // PROVES the invariant on its own output instead of assuming it
    def dupGroups(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(md5(col("text"))).count()
        .filter(col("count") > 1).count()
    val (srcDup, outDup) = (dupGroups(docs), dupGroups(out))
    require(outDup == srcDup * copies,
      s"cross-copy duplicate leak: $srcDup source dup groups x $copies " +
        s"copies should give ${srcDup * copies}, measured $outDup — " +
        "a copy transform collided (check the stopword carve-out)")
    println(s"[scalegen] wrote $nd docs, $ne embeddings to $outDir " +
      s"(vocab $v, $copies copies, dup groups $srcDup -> $outDup)")
    spark.stop()
  }
}
