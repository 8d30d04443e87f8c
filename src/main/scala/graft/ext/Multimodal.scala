package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition (the Scala analog of a
  * pandas-UDF-over-mapInPandas stage).
  *
  * The container has no image/audio codecs, so `decodeStub` derives a
  * DETERMINISTIC FAKE (width/height from the content hash) — the Spark
  * plumbing (binary schema, partition-batched processing, metadata
  * struct shape) is real and oracle-tested; swap `decodeStub` for a real
  * codec in production.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, sha: String,
      width: Int, height: Int)

  // JDK-native hex encoding: ~10x cheaper per row than per-byte
  // "%02x".format on the hot 100-TB digest path
  private val Hex = java.util.HexFormat.of()

  /** STUB decode: fake dimensions derived from the sha256 hex digest. */
  def decodeStub(sha: String): (Int, Int) = {
    def hex2(s: String) = Integer.parseInt(s, 16)
    (64 + hex2(sha.substring(0, 2)), 64 + hex2(sha.substring(2, 4)))
  }

  /** Attach an opaque binary media column (here: utf-8 of the text —
    * stands in for image/audio bytes). */
  def withMedia(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("media", col(textCol).cast("binary"))

  case class FrameRow(doc_id: Long, frame_no: Long, frame_sha: String)

  /** Frame sampling (the video path): treat the payload as a fake
    * nFrames = max(bytes/16, 1) frame clip and emit every `every`-th
    * frame index with a STUB frame digest (sha256 of payload ++
    * "#frameNo" — a real decoder would put decoded frame bytes here).
    * Per-partition digest reuse, per-row fan-out via flatMap: the
    * linear, shuffle-free shape frame extraction keeps at 100 TB. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      every: Int): Dataset[FrameRow] = {
    import spark.implicits._
    require(every >= 1)
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { r =>
        val n = math.max(r.media.length / 16, 1)
        (0 until n by every).iterator.map { fn =>
          md.reset()
          md.update(r.media)
          md.update(s"#$fn".getBytes("UTF-8"))
          FrameRow(r.doc_id, fn.toLong, Hex.formatHex(md.digest()))
        }
      }
    }
  }

  /** Audio windowing (the audio path): the payload stands in for PCM —
    * each code point plays one 16-bit sample — cut into fixed
    * `winSamples`-sample windows (400 = 25 ms @ 16 kHz) with a
    * deterministic STUB energy per window (first 8 sha-256 hex digits
    * of the window as a BIGINT; a real decoder would put
    * sum-of-squares of decoded samples here). Unlike the mapPartitions
    * paths above this stays entirely inside built-in codegen'd
    * functions (sequence/explode/substring/sha2/conv) — the same
    * linear shuffle-free fan-out, with whole-stage codegen kept. */
  def audioWindows(docs: DataFrame, payloadCol: String,
      winSamples: Int = 400, idCol: String = "doc_id"): DataFrame = {
    require(winSamples >= 1)
    docs
      .withColumn("n_wins", expr(
        s"greatest((length($payloadCol) + ${winSamples - 1}) " +
          s"div $winSamples, 1)"))
      .select(col(idCol).as("doc_id"),
        expr("explode(sequence(0L, n_wins - 1))").as("win_no"),
        col(payloadCol).as("payload"))
      .withColumn("win", expr(
        s"substring(payload, cast(win_no * $winSamples + 1 as int), " +
          s"$winSamples)"))
      .select(col("doc_id"), col("win_no").cast("long").as("win_no"),
        length(col("win")).cast("long").as("win_len"),
        expr("cast(conv(substring(sha2(win, 256), 1, 8), 16, 10) " +
          "as bigint)").as("energy_stub"))
  }

  /** Batched per-partition metadata extraction: one MessageDigest per
    * partition (not per row) — the batch-shape that matters for real
    * codecs too. */
  def extractMeta(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        md.reset()
        val sha = Hex.formatHex(md.digest(r.media))
        val (w, h) = decodeStub(sha)
        MediaMeta(r.doc_id, r.media.length.toLong, sha, w, h)
      }
    }
  }
}
