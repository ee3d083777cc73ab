package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a partition-wise decode /
  * feature-extract stage.
  *
  * Decode has two backends sharing one signature and batch shape:
  *  - [[JvmCodec]] — REAL decoders from the JDK: `javax.imageio`
  *    (PNG/JPEG/BMP/GIF) and `javax.sound.sampled` (WAV PCM). No
  *    external libraries. Video stays stubbed (the JDK has no video
  *    codec); payloads neither backend can parse fall back to
  *    [[FakeCodec]] so a mixed/corrupt corpus never kills a 100 TB job
  *    mid-stage.
  *  - [[FakeCodec]] — deterministic pseudo-metadata from the raw bytes,
  *    used by the oracle-checked queries over the synthetic text-byte
  *    corpus (whose payloads are not real media).
  * Everything around the codec — the schema, the `Dataset[MediaFile]`
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

  /** Hex SHA-256 of the payload — ONE definition shared by both codecs:
    * the fallback contract requires the real and stub paths to emit the
    * same `sha` for the same bytes. */
  private def sha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Deterministic stand-in for a real image/audio decoder. Replace with
    * a JNI/codec call in production; signature and batch shape stay. */
  object FakeCodec {
    def decode(f: MediaFile): MediaFeatures = {
      val n = f.payload.length
      val digest = sha256(f.payload)
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

  /** Real JDK-backed decoders. Feature mapping per modality:
    * images — width/height are the pixel dimensions, brightness is the
    * mean ITU-R BT.601 luma over all pixels in [0,1]; audio (WAV PCM) —
    * width = channels, height = bits per sample, n_frames = PCM frame
    * count, brightness = normalized RMS amplitude of the first channel.
    * All values are pure functions of the payload bytes (area-average
    * resampling, integer-weighted luma) — no Graphics2D filtering whose
    * output could differ across JVM versions — so re-runs and retries
    * produce byte-identical feature rows. */
  object JvmCodec {
    import java.io.ByteArrayInputStream

    /** 0..255 integer luma (BT.601 weights, integer arithmetic). */
    @inline private def luma(rgb: Int): Int = {
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      (299 * r + 587 * g + 114 * b) / 1000
    }

    def decodeImage(f: MediaFile): Option[MediaFeatures] = {
      val img = try javax.imageio.ImageIO.read(new ByteArrayInputStream(f.payload))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        // bulk row fetch: per-pixel getRGB does a ColorModel conversion
        // per call — one reusable row buffer is several times faster and
        // byte-identical
        val row = new Array[Int](w)
        var sum = 0L
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) { sum += luma(row(x)); x += 1 }
          y += 1
        }
        val brightness = if (w * h == 0) 0.0 else sum.toDouble / (w.toLong * h) / 255.0
        Some(MediaFeatures(f.media_id, f.kind, f.payload.length.toLong,
          sha256(f.payload), w, h, 1, math.rint(brightness * 1e6) / 1e6))
      }
    }

    def decodeAudio(f: MediaFile): Option[MediaFeatures] = {
      import javax.sound.sampled.AudioSystem
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(f.payload))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          // RMS over the first channel of 16-bit little-endian PCM; other
          // encodings report amplitude 0 (metadata still real).
          val rms = if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian && frames > 0) {
            val buf = in.readAllBytes()
            val stride = fmt.getFrameSize
            var acc = 0.0; var n = 0L; var i = 0
            while (i + 1 < buf.length) {
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
              acc += s.toDouble * s; n += 1; i += stride
            }
            if (n == 0) 0.0 else math.sqrt(acc / n) / 32768.0
          } else 0.0
          Some(MediaFeatures(f.media_id, f.kind, f.payload.length.toLong,
            sha256(f.payload), fmt.getChannels, fmt.getSampleSizeInBits,
            if (frames < 0) 0 else frames.toInt, math.rint(rms * 1e6) / 1e6))
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** Real decode where the payload allows it, FakeCodec otherwise —
      * one total function per partition, robust to mixed corpora. */
    def decode(f: MediaFile): MediaFeatures = (f.kind match {
      case "image" => decodeImage(f)
      case "audio" => decodeAudio(f)
      case _       => None // no JDK video codec — stub path
    }).getOrElse(FakeCodec.decode(f))

    /** Decode + deterministic area-average downsample to a w×h LUMA
      * grid (the same byte-grid contract as [[resizeStub]]): target
      * cell = integer mean of its source-pixel box. */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      val img = try javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val sw = img.getWidth; val sh = img.getHeight
        val out = new Array[Byte](w * h)
        // one bulk row fetch per source row visit (per-pixel getRGB pays
        // a ColorModel conversion per call); accumulation order per cell
        // is unchanged, so output bytes are identical
        val rowBuf = new Array[Int](sw)
        val sums = new Array[Long](w)
        var ty = 0
        while (ty < h) {
          val y0 = ty.toLong * sh / h; val y1 = math.max(y0 + 1, (ty + 1).toLong * sh / h)
          java.util.Arrays.fill(sums, 0L)
          var y = y0
          while (y < y1) {
            img.getRGB(0, y.toInt, sw, 1, rowBuf, 0, sw)
            var tx = 0
            while (tx < w) {
              val x0 = tx.toLong * sw / w; val x1 = math.max(x0 + 1, (tx + 1).toLong * sw / w)
              var x = x0
              while (x < x1) { sums(tx) += luma(rowBuf(x.toInt)); x += 1 }
              tx += 1
            }
            y += 1
          }
          var tx = 0
          while (tx < w) {
            val x0 = tx.toLong * sw / w; val x1 = math.max(x0 + 1, (tx + 1).toLong * sw / w)
            out(ty * w + tx) = (sums(tx) / ((y1 - y0) * (x1 - x0))).toByte
            tx += 1
          }
          ty += 1
        }
        Some(out)
      }
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
    * amortized, constant memory). `codec` defaults to the deterministic
    * stub (the synthetic corpus is not real media); pass
    * `JvmCodec.decode` for real payloads. */
  def decodeFeatures(files: Dataset[MediaFile],
                     codec: MediaFile => MediaFeatures = FakeCodec.decode)
      : Dataset[MediaFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      // per-partition setup would go here (load codec, alloc buffers)
      it.map(codec)
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
    * frames outside the partition). Real image payloads go through
    * [[JvmCodec.resizeImage]] when `real` is set; anything undecodable
    * (and the stub mode) uses [[resizeStub]] — same w×h byte grid
    * either way. */
  def thumbnails(files: Dataset[MediaFile], w: Int, h: Int,
                 real: Boolean = false): DataFrame = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map { f =>
        // dispatch on kind like JvmCodec.decode: only image payloads may
        // take the ImageIO path — anything else would pay a reader probe
        // per row and could silently decode a mislabeled payload
        val thumb =
          if (real && f.kind == "image") JvmCodec.resizeImage(f.payload, w, h)
            .getOrElse(resizeStub(f.payload, w, h))
          else resizeStub(f.payload, w, h)
        (f.media_id, f.kind, thumb)
      }
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
