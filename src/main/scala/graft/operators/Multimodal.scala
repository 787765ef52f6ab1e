package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/**
 * Multimodal column handling: media content is an opaque `binary` column plus
 * a typed metadata struct; decode / feature-extract / frame-sample run as
 * typed `mapPartitions` stages (one decoder instantiation per partition, the
 * Spark-idiomatic shape for per-row native-library calls at scale — no
 * driver-side materialization, no per-row decoder setup).
 *
 * The byte-level decoder is pluggable behind [[Multimodal.MediaCodec]]; this
 * container has no image/audio codecs, so the default [[Multimodal.StubCodec]]
 * is a deterministic fake, but the Spark-side plumbing — schema, batch shape,
 * partitioning, typed pipeline, per-partition `open()`/`close()` lifecycle,
 * per-row error surfacing — is real and tested (a fault-injecting codec
 * exercises the seam in MultimodalSpec).
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

  /** One decode attempt: the decoded columns on success, or zeroed columns
    * plus a non-null `error` when the codec rejected the payload. A corrupt
    * row never fails the task — at 100 TB a one-in-a-billion malformed file
    * must surface as a row, not a job abort. */
  case class DecodeAttempt(
      media_id: Long,
      format: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double],
      error: String)

  /**
   * The codec contract. Implementations are shipped to executors by closure
   * serialization; `open()` runs once per partition-task before the first
   * row (native-library handles, model weights), `close()` runs at task
   * completion (success OR failure — registered as a TaskContext listener).
   * `decode` may throw for a malformed payload; [[decodeSafe]] turns that
   * into a per-row error while [[decode]] propagates it (fail-fast).
   */
  trait MediaCodec extends Serializable {
    def open(): Unit = ()
    def close(): Unit = ()
    def decode(mediaId: Long, content: Array[Byte], format: String): DecodedMedia

    /** Decode to a gray-intensity raster of exactly `cols` x `rows` cells
      * (row-major) — the grid a perceptual hash is computed over. The
      * default is the deterministic stub raster: cell value = the exact
      * mean byte value of the payload's proportional slice
      * (integer-exact sum / count, so every engine computing it agrees
      * bit-for-bit; empty slices — payloads shorter than the grid — read
      * 0). A REAL image codec overrides this with the decoded, resampled,
      * gamma-corrected grayscale raster; everything downstream
      * ([[perceptualHash]], [[perceptualDedupPairs]]) is raster-agnostic. */
    def rasterize(mediaId: Long, content: Array[Byte], format: String,
        cols: Int, rows: Int): Array[Double] = {
      val n = cols * rows
      val len = if (content == null) 0 else content.length
      val out = new Array[Double](n)
      var c = 0
      while (c < n) {
        val from = (c.toLong * len / n).toInt
        val until = ((c + 1).toLong * len / n).toInt
        if (until > from) {
          var s = 0L
          var i = from
          while (i < until) { s += (content(i) & 0xff); i += 1 }
          out(c) = s.toDouble / (until - from)
        }
        c += 1
      }
      out
    }
  }

  /**
   * Deterministic fake decoder: derives plausible dimensions and an 8-bin
   * byte-histogram "feature vector" from the payload alone, so every test
   * and query is reproducible. A real implementation replaces `decode` with
   * a codec call; the signature is the contract.
   */
  object StubCodec extends MediaCodec {
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

  /** Run `codec.open()` once for this partition and register `close()` on
    * task completion (fires on success, failure, and cancellation alike).
    * Outside a task (driver-local evaluation) there is no completion hook;
    * the codec stays open — a leak in that exotic path beats handing the
    * mapper a closed codec. */
  private def openForPartition(codec: MediaCodec): Unit = {
    codec.open()
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => codec.close())
  }

  /** Decode a media table, fail-fast: a codec exception fails the task.
    * Use [[decodeSafe]] when corrupt payloads must become rows instead. */
  def decode(media: Dataset[MediaRow], codec: MediaCodec = StubCodec): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      openForPartition(codec)
      rows.map(r => codec.decode(r.media_id, r.content, r.format))
    }
  }

  /** Decode with per-row error containment: a payload the codec rejects
    * yields a row with zeroed decode columns and the exception in `error`;
    * every other row decodes normally. Downstream splits on
    * `error IS NULL`. */
  def decodeSafe(media: Dataset[MediaRow], codec: MediaCodec = StubCodec)
      : Dataset[DecodeAttempt] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      openForPartition(codec)
      rows.map { r =>
        try {
          val d = codec.decode(r.media_id, r.content, r.format)
          DecodeAttempt(d.media_id, d.format, d.byte_len, d.width, d.height,
            d.n_frames, d.features, null)
        } catch {
          case NonFatal(e) =>
            DecodeAttempt(r.media_id, r.format,
              if (r.content == null) 0 else r.content.length,
              0, 0, 0, Array.empty[Double],
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }

  /** Sample every `stride`-th frame of video media as (media_id, frame_no,
    * frame payload slice) — the frame extraction shape for vision pipelines.
    * A payload the codec rejects contributes no frames (skip, don't abort):
    * frame extraction is a best-effort fan-out, and the decode-stage gate
    * ([[decodeSafe]]) is where per-row errors are accounted. */
  case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      codec: MediaCodec = StubCodec): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "video").mapPartitions { rows =>
      openForPartition(codec)
      rows.flatMap { r =>
        val decoded =
          try Some(codec.decode(r.media_id, r.content, r.format))
          catch { case NonFatal(_) => None }
        decoded.toSeq.flatMap { d =>
          val chunk = math.max(1, r.content.length / math.max(1, d.n_frames))
          (0 until d.n_frames by stride).map { f =>
            val from = f * chunk
            val until = math.min(r.content.length, from + chunk)
            Frame(r.media_id, f, r.content.slice(from, math.max(from, until)))
          }
        }
      }
    }
  }

  /**
   * dHash-style 64-bit perceptual hash per media row — the multimodal twin
   * of [[Dedup.simHashPairs]]' text fingerprint: a RE-ENCODED copy of the
   * same image (different bytes, same picture) hashes within a small
   * Hamming distance, where any content-hash sees a brand-new payload.
   * Computed through the [[MediaCodec]] raster seam (one codec per
   * partition task, [[decode]]'s lifecycle): a 9 x 8 gray raster, one bit
   * per horizontally-adjacent cell pair (`left > right`), 64 bits total —
   * the classic dHash recipe, gradient-based so uniform brightness/scale
   * shifts cancel. Payloads the codec rejects yield no hash row (the
   * decode-stage gate is where per-row errors are accounted,
   * [[sampleFrames]]' contract).
   */
  def perceptualHash(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      openForPartition(codec)
      rows.flatMap { r =>
        try {
          val g = codec.rasterize(r.media_id, r.content, r.format, 9, 8)
          require(g.length == 72, s"rasterize returned ${g.length} cells")
          var h = 0L
          var bit = 0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (g(y * 9 + x) > g(y * 9 + x + 1)) h |= (1L << bit)
              bit += 1; x += 1
            }
            y += 1
          }
          Some((r.media_id, h))
        } catch { case NonFatal(_) => None }
      }
    }.toDF("media_id", "phash")
  }

  /**
   * Near-duplicate media pairs within Hamming distance `maxHamming` of
   * their perceptual hashes: (media_a, media_b, hamming), media_a <
   * media_b. Candidates come from [[Dedup.hammingBandedPairs]] — the
   * SimHash chunk machinery verbatim: `maxHamming + 1` hash chunks,
   * pigeonhole-complete equi-join on (band, chunk), hot buckets capped by
   * `maxBucketSize` with counted drops (tag `"perceptualHash"`), exact
   * popcount verify. Never all-pairs: at 100 TB the only quadratic term
   * is the OUTPUT (true near-dup clusters), the standard banded-dedup
   * contract.
   */
  def perceptualDedupPairs(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec, maxHamming: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    Dedup.hammingBandedPairs(
        perceptualHash(media, codec)
          .select(col("media_id").as("doc_id"), col("phash").as("simhash")),
        maxHamming, maxBucketSize, "perceptualHash")
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Keep-one perceptual dedup: connected components over the
    * [[perceptualDedupPairs]] edge set, smallest media_id survives each
    * component — [[Dedup.dedupByNearDup]]'s exact policy (transitive: a
    * chain of re-encodes collapses to ONE kept copy, not one per edge). */
  def dedupByPerceptual(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec, maxHamming: Int = 4,
      maxBucketSize: Int = 1000): Dataset[MediaRow] = {
    val cl = Dedup.clusters(
      perceptualDedupPairs(media, codec, maxHamming, maxBucketSize),
      "media_a", "media_b")
    import media.sparkSession.implicits._
    media.join(cl, media("media_id") === cl("doc_id"), "left")
      .withColumn("__cluster", coalesce(cl("cluster"), media("media_id")))
      .filter(media("media_id") === col("__cluster"))
      .drop(cl("doc_id")).drop(cl("cluster")).drop(col("__cluster"))
      .as[MediaRow]
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
