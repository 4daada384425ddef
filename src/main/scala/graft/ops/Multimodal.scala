package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side contract (schema, partition-iterator batching, feature
  * schema) is real and tested; the actual codec call is STUBBED behind
  * [[MediaDecoder]] (no image/audio libraries in this container) with a
  * deterministic fake so every downstream op is exercisable. Swapping in
  * a real decoder is a one-class change and touches no plan logic.
  *
  * Scale notes: binaries stay columnar in parquet; decode runs
  * per-partition (one decoder instance per task, amortized init —
  * the Scala analogue of `mapInPandas` batch semantics); feature
  * vectors come back as narrow typed columns so downstream joins/aggs
  * never carry the blob.
  */
object Multimodal {

  case class MediaFeatures(
      media_id: Long,
      mime: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Decoder boundary. Real implementations (JPEG via ImageIO, audio
    * via javax.sound, frames via jcodec/ffmpeg) plug in here. */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, mime: String, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decoder: dimensions and features derived purely
    * from the payload (content-addressed — same bytes, same features).
    * Marks the stubbed codec path per the build contract. */
  object DeterministicFakeDecoder extends MediaDecoder {
    def decode(id: Long, mime: String, bytes: Array[Byte]): MediaFeatures = {
      val len = bytes.length
      // ??? real codec goes here; the fake derives everything from bytes
      val crc = new java.util.zip.CRC32
      crc.update(bytes)
      val h = crc.getValue
      val feat = Array.tabulate(8) { i =>
        (((h >>> (i * 8)) & 0xff).toFloat / 255f) * 2f - 1f
      }
      MediaFeatures(id, mime,
        byte_len = len.toLong,
        width = ((h % 16) + 1).toInt * 64,
        height = (((h >> 4) % 16) + 1).toInt * 64,
        n_frames = len / 256 + 1,
        feature = feat)
    }
  }

  /** Attach a synthetic media column to any (id, text) frame — binary
    * payload + typed metadata struct — standing in for real blob
    * ingestion (at scale: parquet binary column or object-store refs). */
  def withSyntheticMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        when(col(idCol) % 3 === 0, "image/png")
          .when(col(idCol) % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        octet_length(col(textCol).cast("binary")).cast("long").as("byte_len"))
        .as("meta"))

  /** Split each blob into fixed-size chunk rows (chunk_idx, chunk,
    * chunk_len) — the sharding step before parallel decode / upload /
    * rolling-hash dedup of large media: a 4 GB video becomes
    * independently-schedulable chunk tasks instead of one task pinned
    * to one executor. Pure column expressions (sequence + explode +
    * substring on binary) — scan-fused, no shuffle; the blob never
    * travels beyond its own chunk rows. */
  def chunked(media: DataFrame, chunkBytes: Int = 262144): DataFrame = {
    require(chunkBytes > 0, "chunkBytes must be positive")
    val nChunks = ceil(octet_length(col("payload")).cast("double") /
      chunkBytes).cast("int")
    media.select(col("media_id"), col("payload"),
        explode(sequence(lit(0), greatest(nChunks, lit(1)) - 1))
          .as("chunk_idx"))
      .select(col("media_id"), col("chunk_idx"),
        col("payload").substr(col("chunk_idx") * chunkBytes + 1,
          lit(chunkBytes)).as("chunk"))
      .withColumn("chunk_len", octet_length(col("chunk")))
  }

  /** Per-partition decode → typed features. One decoder per task. */
  def extractFeatures(media: DataFrame,
      decoder: MediaDecoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        val d = decoder // one instance per partition/task
        rows.map { case (id, bytes, mime) => d.decode(id, mime, bytes) }
      }
  }
}
