package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a partition-wise decode /
  * feature-extract stage.
  *
  * The decode itself is STUBBED (this container has no image/audio
  * codecs): `FakeCodec` derives deterministic pseudo-metadata from the
  * bytes. Everything around it — the schema, the `Dataset[MediaFile]`
  * typed API, the mapPartitions batch shape (one codec instance per
  * partition, streamed iterator, no per-row setup), and the column
  * plumbing — is the real 100 TB design: binary payloads never hit the
  * driver, decode parallelism = partition count, and the expensive stage
  * sits AFTER cheap metadata filters so pushdown prunes payload reads.
  */
object Multimodal {
  case class MediaFile(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           sha: String, width: Int, height: Int,
                           n_frames: Int, brightness: Double)

  /** Deterministic stand-in for a real image/audio decoder. Replace with
    * a JNI/codec call in production; signature and batch shape stay. */
  object FakeCodec {
    def decode(f: MediaFile): MediaFeatures = {
      val n = f.payload.length
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(f.payload).map("%02x".format(_)).mkString
      // Pseudo-dimensions derived from content length — deterministic.
      val w = n % 512 + 16
      val h = n % 384 + 16
      val frames = if (f.kind == "video") n % 30 + 1 else 1
      val brightness = if (n == 0) 0.0
        else f.payload.iterator.map(b => (b & 0xff).toDouble).sum / n / 255.0
      MediaFeatures(f.media_id, f.kind, n.toLong, digest, w, h, frames,
        math.rint(brightness * 1e6) / 1e6)
    }
  }

  /** Documents table → fake media files (text bytes as payload), the
    * container-friendly stand-in for a real binary source. */
  def asMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        (when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaFile]
  }

  /** Partition-wise decode: one codec per partition, iterator-streamed —
    * the mapPartitions shape a real decoder needs (expensive init
    * amortized, constant memory). */
  def decodeFeatures(files: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      // per-partition setup would go here (load codec, alloc buffers)
      it.map(FakeCodec.decode)
    }
  }

  case class Frame(media_id: Long, frame_idx: Int, data: Array[Byte])

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * stands in for a decoded video frame. The plumbing is the real
    * shape — one flatMap per file, frames inherit the file's
    * partitioning, no driver round-trip — only the chunk-decode is
    * fake. */
  def sampleFrames(files: Dataset[MediaFile], frameBytes: Int = 16,
                   stride: Int = 2): Dataset[Frame] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      val nFrames = math.max(1, f.payload.length / frameBytes)
      (0 until nFrames by stride).map { i =>
        Frame(f.media_id, i,
          f.payload.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** Resize stub: stride-sample the payload down to exactly w×h bytes
    * (zero-padded), the byte-grid shape a real resampler would emit.
    * Deterministic; batch shape identical to a codec-backed version. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** Decode+resize in one partition pass (what the real pipeline runs:
    * decode → thumbnail → feature row, never materializing full-size
    * frames outside the partition). */
  def thumbnails(files: Dataset[MediaFile], w: Int, h: Int): DataFrame = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map(f => (f.media_id, f.kind, resizeStub(f.payload, w, h)))
    }.toDF("media_id", "kind", "thumb")
  }

  /** Pure-column metadata path (no decode): cheap filters that should
    * run BEFORE the decode stage at scale. Oracle-checkable. */
  def metadata(docs: DataFrame): DataFrame =
    // byte lengths (octet_length), not character counts — FakeCodec
    // derives its values from payload BYTES, and the two paths must
    // agree for non-ASCII text
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("sha"),
      (octet_length(col("text")) % 512 + 16).cast("long").as("fake_width"),
      (octet_length(col("text")) % 384 + 16).cast("long").as("fake_height"))
}
