package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fingerprint-guarded artifact store — the [[SuffixIndex]] pattern
  * generalized (r15, verdict #2): at 100 TB the expensive step of a
  * model-driven curation stage is TRAINING (classifier gradient
  * epochs, isotonic fits, unigram EM, BPE merge rounds), so a
  * pipeline trains ONCE per corpus release, persists the model next
  * to the corpus, and every downstream query scores/applies under the
  * frozen artifact. The measured precedent is the suffix family:
  * `tx_suffix_build` 15.4 s / consumer `tx_repeated_seqs` 1.2 s.
  *
  * Layout under `spark-warehouse/graft_artifacts/<family>/<key>`
  * (key = md5 of corpus dir + config — two corpora or two configs
  * never share a key). r16 (verdict #4): each key is VERSIONED for
  * cross-process safety — `this.synchronized` only serializes one
  * JVM, and two processes sharing the warehouse (Verify + Bench, two
  * driver runs) could race a rebuild against a reader mid-overwrite:
  *   - `CURRENT`: a one-line pointer file naming the live version,
  *     replaced by ATOMIC RENAME — a reader sees the old version or
  *     the new one, never a mixture;
  *   - `v<nonce>/`: one immutable directory per build, holding one
  *     parquet dir per named frame (the model payload — classifier
  *     weights, isotonic table, unigram seg counts, BPE merge table,
  *     or the curated pool itself) plus `meta`: one row carrying the
  *     corpus FINGERPRINT and the config string, written LAST inside
  *     the version, so a crash mid-build leaves an unpublished
  *     version that no reader ever resolves. A consumer
  *     re-fingerprints the corpus on every load and rebuilds on
  *     mismatch, so a stale artifact can never serve a changed
  *     corpus.
  * Published versions are never modified in place; concurrent
  * builders race benignly (each writes its own version, the last
  * CURRENT flip wins, both are valid for the same fingerprint).
  * Non-current versions sweep after a grace period long enough for
  * any in-flight reader's leaf scans to finish.
  *
  * Fingerprint = (row count, order-insensitive XOR of per-doc
  * hashes, order-insensitive exact DECIMAL sum of the same hashes) —
  * one column-pruned scan; the sum closes XOR's self-cancelling
  * blind spot (the r15 [[SuffixIndex]] ADVICE fix, shared here).
  *
  * Parquet round-trips IEEE doubles and integer/string columns
  * exactly, so a loaded artifact scores BYTE-IDENTICALLY to the
  * build that wrote it — consumer queries keep their full-replay
  * DuckDB oracles unchanged, which makes the artifact path
  * verifiable end-to-end: a wrong byte in a saved model breaks the
  * same driver hashes that pinned in-query training.
  */
object ArtifactStore {

  /** Corpus fingerprint over `<dir>/documents.parquet`: (row count,
    * bit-XOR of per-doc md5-low64, exact DECIMAL(38,0) sum of the
    * same hashes as a string). Any added/removed/edited doc flips at
    * least one component; a delta multiset would have to cancel under
    * BOTH xor and exact integer addition. */
  def corpusFingerprint(spark: SparkSession, dir: String)
      : (Long, Long, String) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val r = docs.select(TextAnalysis.md5Low64(concat_ws("|",
        col("doc_id").cast("string"), col("text"))).as("_h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(_h)").as("x"),
        sum(col("_h").cast("decimal(38,0)")).as("s"))
      .collect()(0)
    val s = Option(r.getDecimal(2)).map(_.toBigInteger.toString)
      .getOrElse("0")
    (r.getLong(0), r.getLong(1), s)
  }

  private def root(family: String, dir: String, config: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$config".getBytes("UTF-8")).take(8)
      .map("%02x".format(_)).mkString
    java.nio.file.Paths.get(sys.props("user.dir"), "spark-warehouse",
      "graft_artifacts", family, md).toString
  }

  /** Load the named frames of `family`'s artifact for (`dir`,
    * `config`), building and saving them first if absent or stale
    * (corpus fingerprint or config mismatch). The build thunk runs at
    * most once per miss; returned frames are parquet leaf scans
    * either way, so a consumer query's plan shape is identical on
    * hit and on fresh build. Thread-safe within a JVM via the lock;
    * safe ACROSS processes via the immutable-version + atomic-CURRENT
    * protocol (see the object scaladoc). */
  def loadOrBuild(spark: SparkSession, dir: String, family: String,
      config: String, names: Seq[String])(
      build: => Map[String, DataFrame]): Map[String, DataFrame] =
    this.synchronized {
      val (fpN, fpXor, fpSum) = corpusFingerprint(spark, dir)
      val p = root(family, dir, config)
      // resolve CURRENT first: a cold key is the NORMAL first-call
      // path, and probing it through spark.read would log a
      // FileNotFoundException stack at every fresh build (r15 noise
      // fix) — the try/catch stays for torn/corrupt meta frames
      val cur = currentVersion(p).filter { v =>
        try {
          val m = spark.read.parquet(s"$p/$v/meta").collect()(0)
          m.getAs[Long]("fp_n") == fpN &&
            m.getAs[Long]("fp_xor") == fpXor &&
            m.getAs[String]("fp_sum") == fpSum &&
            m.getAs[String]("config") == config
        } catch { case _: Exception => false }
      }
      val ver = cur.getOrElse(saveFrames(spark, p, config,
        (fpN, fpXor, fpSum), names, build))
      names.map(n => n -> spark.read.parquet(s"$p/$ver/$n")).toMap
    }

  /** Force a rebuild (the BUILD is a `*_build` bench line's
    * semantics — it must measure training every round, never an
    * artifact hit), save, and return the freshly-written frames as
    * leaf scans. */
  def rebuild(spark: SparkSession, dir: String, family: String,
      config: String, names: Seq[String])(
      build: => Map[String, DataFrame]): Map[String, DataFrame] =
    this.synchronized {
      val fp = corpusFingerprint(spark, dir)
      val p = root(family, dir, config)
      val ver = saveFrames(spark, p, config, fp, names, build)
      names.map(n => n -> spark.read.parquet(s"$p/$ver/$n")).toMap
    }

  private def saveFrames(spark: SparkSession, p: String, config: String,
      fp: (Long, Long, String), names: Seq[String],
      build: => Map[String, DataFrame]): String = {
    val frames = build
    require(names.forall(frames.contains),
      s"artifact build produced ${frames.keys.toSeq.sorted}, " +
        s"expected $names")
    val ver = newVersionDir(p)
    names.foreach { n =>
      frames(n).write.mode("overwrite").parquet(s"$p/$ver/$n")
    }
    import spark.implicits._
    // meta LAST inside the version: a crash before this point leaves
    // an unpublished version; a crash after it but before publish()
    // leaves a complete-but-unreferenced version — either sweeps later
    Seq((fp._1, fp._2, fp._3, config))
      .toDF("fp_n", "fp_xor", "fp_sum", "config")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/$ver/meta")
    publish(p, ver)
    SuffixIndex.sweepStale(new java.io.File(p))
    ver
  }

  /** Grace before a non-current version (or a pre-r16 legacy layout
    * dir) is swept: long enough for any in-flight reader's leaf scans
    * of the superseded version to finish. */
  val VersionSweepGraceMs: Long = 15L * 60 * 1000

  /** Resolve the live version under key dir `p`: the name in the
    * CURRENT pointer, if it names an existing directory. A missing or
    * torn pointer (crash between version write and publish) reads as
    * a miss — never as a partial artifact. */
  private[ops] def currentVersion(p: String): Option[String] = {
    val f = new java.io.File(p, "CURRENT")
    if (!f.isFile) None
    else try {
      val s = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      if (s.nonEmpty && new java.io.File(p, s).isDirectory) Some(s)
      else None
    } catch { case _: Exception => None }
  }

  /** Create a fresh immutable version directory under `p`. The nonce
    * only names a directory — it never influences query results. */
  private[ops] def newVersionDir(p: String): String = {
    val v = "v" + java.util.UUID.randomUUID.toString.replace("-", "")
      .take(12)
    new java.io.File(p, v).mkdirs()
    v
  }

  /** Flip CURRENT to `ver` by atomic rename of a sibling temp file —
    * the one mutation a reader can ever observe, and it is all-or-
    * nothing — then sweep superseded versions past the grace period. */
  private[ops] def publish(p: String, ver: String): Unit = {
    val tmp = new java.io.File(p, s".CURRENT.$ver.tmp")
    java.nio.file.Files.write(tmp.toPath, ver.getBytes("UTF-8"))
    val dst = new java.io.File(p, "CURRENT").toPath
    try
      java.nio.file.Files.move(tmp.toPath, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // some filesystems reject ATOMIC_MOVE onto an existing target;
      // REPLACE_EXISTING keeps the pointer flip a single rename there
      case _: Exception =>
        java.nio.file.Files.move(tmp.toPath, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    sweepVersions(p, keep = ver)
  }

  /** Best-effort sweep of superseded content under key dir `p`:
    * every child that is not CURRENT, not the just-published version,
    * and older than [[VersionSweepGraceMs]] (covers stale versions,
    * torn temp pointers AND pre-r16 legacy frame dirs). A torn delete
    * leaves content the resolver never serves. */
  private def sweepVersions(p: String, keep: String): Unit = {
    val now = System.currentTimeMillis()
    Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName != "CURRENT" && f.getName != keep)
      .filter(f => now - f.lastModified() > VersionSweepGraceMs)
      .foreach(SuffixIndex.deleteRecursively)
  }
}
