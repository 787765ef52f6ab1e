package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling: media content is an opaque `binary` column plus
 * a typed metadata struct; decode / feature-extract / frame-sample run as
 * typed `mapPartitions` stages (one decoder instantiation per partition, the
 * Spark-idiomatic shape for per-row native-library calls at scale — no
 * driver-side materialization, no per-row decoder setup).
 *
 * The byte-level decoders are STUBBED with deterministic fakes (this
 * container has no image/audio codecs); the Spark-side plumbing — schema,
 * batch shape, partitioning, typed pipeline — is real and tested, and a real
 * codec drops into `StubCodec` without touching any query.
 */
object Multimodal {

  /** An ingested media object: opaque payload + source-asserted metadata. */
  case class MediaRow(media_id: Long, content: Array[Byte], format: String, source: String)

  /** Decoded media metadata + a small fixed-width feature vector. */
  case class DecodedMedia(
      media_id: Long,
      format: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double])

  /**
   * Deterministic fake decoder: derives plausible dimensions and an 8-bin
   * byte-histogram "feature vector" from the payload alone, so every test
   * and query is reproducible. A real implementation replaces `decode` with
   * a codec call; the signature is the contract.
   */
  object StubCodec {
    def decode(media_id: Long, content: Array[Byte], format: String): DecodedMedia = {
      val len = content.length
      val h = {
        var acc = 0xcbf29ce484222325L
        var i = 0
        while (i < len) { acc ^= (content(i) & 0xffL); acc *= 0x100000001b3L; i += 1 }
        acc
      }
      val width = 16 + math.floorMod(h, 240).toInt
      val height = 16 + math.floorMod(h >>> 8, 240).toInt
      val frames = if (format == "video") 1 + math.floorMod(h >>> 16, 120).toInt else 1
      val hist = new Array[Double](8)
      var i = 0
      while (i < len) { hist((content(i) & 0xff) >>> 5) += 1.0; i += 1 }
      if (len > 0) { var j = 0; while (j < 8) { hist(j) /= len; j += 1 } }
      DecodedMedia(media_id, format, len, width, height, frames, hist)
    }
  }

  /** Decode a media table: one decoder per partition, streamed rows. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (native lib handle, etc.)
      rows.map(r => StubCodec.decode(r.media_id, r.content, r.format))
    }
  }

  /** Sample every `stride`-th frame of video media as (media_id, frame_no,
    * frame payload slice) — the frame extraction shape for vision pipelines. */
  case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val d = StubCodec.decode(r.media_id, r.content, r.format)
        val chunk = math.max(1, r.content.length / math.max(1, d.n_frames))
        (0 until d.n_frames by stride).map { f =>
          val from = f * chunk
          val until = math.min(r.content.length, from + chunk)
          Frame(r.media_id, f, r.content.slice(from, math.max(from, until)))
        }
      }
    }
  }

  /** Build a MediaRow table from the documents corpus (text bytes standing in
    * for media payloads — deterministic, keeps the pipeline testable). */
  def mediaFromDocuments(spark: SparkSession, docsPath: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(docsPath)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        // deterministic pseudo-format assignment
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("format"),
        col("source"))
      .as[MediaRow]
  }

  /** Metadata summary used by the oracle-checked query (byte length and md5
    * are engine-agnostic, so this one IS DuckDB-verifiable). */
  def metadataSummary(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("format"),
      length(col("content")).as("byte_len"),
      md5(col("content")).as("content_md5"))
}
