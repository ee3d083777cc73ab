package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a partition-wise decode /
  * feature-extract stage.
  *
  * Decode has two backends sharing one signature and batch shape:
  *  - [[JvmCodec]] — REAL decoders from the JDK: `javax.imageio`
  *    (PNG/JPEG/BMP/GIF), `javax.sound.sampled` (WAV PCM), and a
  *    pure-JDK [[Y4M]] parser for uncompressed YUV4MPEG2 video (the
  *    one video container parseable without a codec library — the JDK
  *    has no compressed-video codec). Payloads no backend can parse
  *    fall back to [[FakeCodec]] so a mixed/corrupt corpus never kills
  *    a 100 TB job mid-stage.
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
  case class AudioFeatures(media_id: Long, sample_rate: Double, n_fft: Int,
                           zcr: Double, centroid_hz: Double)

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

    /** Spectral features of a PCM WAV payload — zero-crossing rate and
      * FFT spectral centroid over the first channel's leading
      * power-of-two window (≤ `maxWindow` samples): the
      * content/quality signals an audio gate filters on (speech vs
      * tone vs noise separate cleanly on these two axes). Pure-JDK
      * radix-2 FFT, O(n log n) per file, embarrassingly parallel
      * across the corpus. None for payloads the PCM reader rejects. */
    def audioSpectral(f: MediaFile, maxWindow: Int = 4096): Option[AudioFeatures] = {
      import javax.sound.sampled.AudioSystem
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(f.payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return None
          val buf = in.readAllBytes()
          val stride = fmt.getFrameSize
          val total = buf.length / stride
          var n = 1
          while (n * 2 <= math.min(total, maxWindow)) n *= 2
          if (n < 2) return None
          val re = new Array[Double](n)
          val im = new Array[Double](n)
          var crossings = 0L
          var i = 0
          while (i < n) {
            val o = i * stride
            val s = ((buf(o + 1) << 8) | (buf(o) & 0xff)).toShort
            re(i) = s.toDouble / 32768.0
            if (i > 0 && (re(i) >= 0) != (re(i - 1) >= 0)) crossings += 1
            i += 1
          }
          val zcr = crossings.toDouble / (n - 1)
          fft(re, im)
          val sr = fmt.getSampleRate.toDouble
          var num = 0.0; var den = 0.0
          var k = 1
          while (k <= n / 2) {
            val mag = math.sqrt(re(k) * re(k) + im(k) * im(k))
            num += (k * sr / n) * mag; den += mag
            k += 1
          }
          val centroid = if (den == 0.0) 0.0 else num / den
          Some(AudioFeatures(f.media_id, sr, n,
            math.rint(zcr * 1e6) / 1e6, math.rint(centroid * 1e3) / 1e3))
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** In-place iterative radix-2 FFT (n a power of two). */
    private def fft(re: Array[Double], im: Array[Double]): Unit = {
      val n = re.length
      var i = 1; var j = 0
      while (i < n) {
        var bit = n >> 1
        while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
        j |= bit
        if (i < j) {
          val tr = re(i); re(i) = re(j); re(j) = tr
          val ti = im(i); im(i) = im(j); im(j) = ti
        }
        i += 1
      }
      var len = 2
      while (len <= n) {
        val ang = -2.0 * math.Pi / len
        val wr = math.cos(ang); val wi = math.sin(ang)
        var i0 = 0
        while (i0 < n) {
          var cr = 1.0; var ci = 0.0
          var k = 0
          while (k < len / 2) {
            val ur = re(i0 + k); val ui = im(i0 + k)
            val xr = re(i0 + k + len / 2); val xi = im(i0 + k + len / 2)
            val vr = xr * cr - xi * ci
            val vi = xr * ci + xi * cr
            re(i0 + k) = ur + vr; im(i0 + k) = ui + vi
            re(i0 + k + len / 2) = ur - vr; im(i0 + k + len / 2) = ui - vi
            val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
            k += 1
          }
          i0 += len
        }
        len <<= 1
      }
    }

    /** Real Y4M video decode: width/height from the stream header,
      * n_frames = parsed FRAME count, brightness = mean luma over every
      * frame's Y plane in [0,1] — the video analogue of the image path,
      * byte-deterministic by construction. */
    def decodeVideo(f: MediaFile): Option[MediaFeatures] =
      Y4M.frameOffsets(f.payload).map { case (info, offs) =>
        val y = info.width * info.height
        var sum = 0L
        offs.foreach { o =>
          var i = o; val end = o + y
          while (i < end) { sum += f.payload(i) & 0xff; i += 1 }
        }
        val brightness =
          if (offs.isEmpty || y == 0) 0.0
          else sum.toDouble / (offs.size.toLong * y) / 255.0
        MediaFeatures(f.media_id, f.kind, f.payload.length.toLong,
          sha256(f.payload), info.width, info.height, offs.size,
          math.rint(brightness * 1e6) / 1e6)
      }

    /** Decode a single image payload slice (JPEG/PNG/BMP/GIF) to its
      * native-size 0..255 luma grid. The unit of MJPEG frame decode:
      * each AVI '##dc' chunk of an MJPEG stream is a standalone JPEG. */
    def imageLuma(b: Array[Byte], off: Int,
                  len: Int): Option[(Int, Int, Array[Byte])] = {
      val img = try javax.imageio.ImageIO.read(new ByteArrayInputStream(b, off, len))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Byte](w * h)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) { out(y * w + x) = luma(row(x)).toByte; x += 1 }
          y += 1
        }
        Some((w, h, out))
      }
    }

    /** Real MJPEG-in-AVI pixel decode: every movi video chunk is fed to
      * ImageIO (MJPEG frames are standalone JPEGs); n_frames = actual
      * chunk count, brightness = mean luma over ALL decoded frames.
      * All-or-nothing: a stream in a codec the JDK lacks (H.264 etc.)
      * fails on its first chunk and None routes the caller to the
      * header-metadata path instead. */
    def decodeAviVideo(f: MediaFile): Option[MediaFeatures] =
      Avi.info(f.payload).flatMap { a =>
        val chunks = Avi.videoChunks(f.payload)
        if (chunks.isEmpty) None
        else {
          var lumaSum = 0L; var pixels = 0L; var ok = true
          val it = chunks.iterator
          while (ok && it.hasNext) {
            val (off, len) = it.next()
            imageLuma(f.payload, off, len) match {
              case Some((w, h, g)) =>
                var i = 0
                while (i < g.length) { lumaSum += g(i) & 0xff; i += 1 }
                pixels += w.toLong * h
              case None => ok = false
            }
          }
          if (!ok || pixels == 0L) None
          else Some(MediaFeatures(f.media_id, f.kind, f.payload.length.toLong,
            sha256(f.payload), a.width, a.height, chunks.size,
            math.rint(lumaSum.toDouble / pixels / 255.0 * 1e6) / 1e6))
        }
      }

    /** Real animated-GIF decode (pure JDK: ImageIO's GIF reader walks
      * every image in the stream): n_frames = actual frame count,
      * brightness = mean luma over all decoded frames. Static (1-frame)
      * GIFs return None so the image path keeps owning them; a
      * non-GIF payload returns None on the magic check. GIF is the one
      * multi-frame format the JDK decodes natively end-to-end, so the
      * video chain gets a full-fidelity tier that needs no external
      * codec. */
    def decodeGifVideo(f: MediaFile): Option[MediaFeatures] = {
      val b = f.payload
      if (b.length < 6 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F') return None
      val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          if (n <= 1) return None
          var lumaSum = 0L; var pixels = 0L
          var w = 0; var h = 0
          var i = 0
          while (i < n) {
            val img = r.read(i)
            if (i == 0) { w = img.getWidth; h = img.getHeight }
            val iw = img.getWidth; val ih = img.getHeight
            val row = new Array[Int](iw)
            var y = 0
            while (y < ih) {
              img.getRGB(0, y, iw, 1, row, 0, iw)
              var x = 0
              while (x < iw) { lumaSum += luma(row(x)); x += 1 }
              y += 1
            }
            pixels += iw.toLong * ih
            i += 1
          }
          if (pixels == 0L) None
          else Some(MediaFeatures(f.media_id, f.kind, b.length.toLong,
            sha256(b), w, h, n,
            math.rint(lumaSum.toDouble / pixels / 255.0 * 1e6) / 1e6))
        } finally r.dispose()
      } catch { case _: Exception => None }
      finally iis.close()
    }

    /** Sampled MJPEG-in-AVI frames decoded to native-size luma grids —
      * the frame-sampling analogue of [[decodeAviVideo]], same
      * all-or-nothing rule over the SAMPLED chunks. */
    def aviLumaFrames(f: MediaFile, stride: Int): Option[IndexedSeq[Frame]] =
      Avi.info(f.payload).flatMap { _ =>
        val chunks = Avi.videoChunks(f.payload)
        if (chunks.isEmpty) None
        else {
          val sampled = (0 until chunks.size by stride).map { i =>
            val (off, len) = chunks(i)
            imageLuma(f.payload, off, len).map(t => Frame(f.media_id, i, t._3))
          }
          if (sampled.forall(_.isDefined)) Some(sampled.map(_.get)) else None
        }
      }

    /** Real decode where the payload allows it, FakeCodec otherwise —
      * one total function per partition, robust to mixed corpora.
      * Video, in decreasing fidelity: full Y4M decode (frames + luma),
      * else MJPEG-in-AVI pixel decode (frames + luma via per-chunk
      * JPEG), else animated-GIF pixel decode (ImageIO multi-image
      * walk), else real AVI header METADATA (width/height/frame count
      * from the RIFF avih chunk — frame pixels stay compressed in a
      * codec the JDK lacks, so brightness reports 0.0), else real MP4
      * box-parse METADATA ([[Mp4]]: tkhd dims + stts frame count, same
      * brightness-0.0 rule), else the stub. */
    def decode(f: MediaFile): MediaFeatures = (f.kind match {
      case "image" => decodeImage(f)
      case "audio" => decodeAudio(f)
      case "video" => decodeVideo(f)
        .orElse(decodeAviVideo(f))
        .orElse(decodeGifVideo(f))
        .orElse(Avi.info(f.payload).map { a =>
          MediaFeatures(f.media_id, f.kind, f.payload.length.toLong,
            sha256(f.payload), a.width, a.height, a.totalFrames, 0.0)
        })
        .orElse(Mp4.info(f.payload).map { m =>
          // real ISO-BMFF metadata (dims, stts frame count); pixels
          // need an inter-frame codec the JDK lacks → brightness 0.0
          MediaFeatures(f.media_id, f.kind, f.payload.length.toLong,
            sha256(f.payload), m.width, m.height, m.frames, 0.0)
        })
      case _       => None
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

  /** Per-partition spectral pass over audio payloads (see
    * JvmCodec.audioSpectral); non-audio / non-PCM rows drop out. */
  def spectralFeatures(files: Dataset[MediaFile],
                       maxWindow: Int = 4096): Dataset[AudioFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.flatMap(f => JvmCodec.audioSpectral(f, maxWindow)))
  }

  case class Frame(media_id: Long, frame_idx: Int, data: Array[Byte])

  /** Frame sampling: every `stride`-th frame. A video payload that
    * parses as YUV4MPEG2 (when `decodeY4M` is set) emits its REAL
    * decoded frames — the w×h luma plane per sampled frame — and an
    * MJPEG-in-AVI payload emits its sampled chunks' JPEG-decoded luma
    * grids; anything else falls back to the fixed-size byte-chunk
    * stub, so a mixed corpus streams through one total function (the
    * JvmCodec fallback contract). The plumbing is the 100 TB shape
    * either way — one flatMap per file, frames inherit the file's
    * partitioning, no driver round-trip. */
  def sampleFrames(files: Dataset[MediaFile], frameBytes: Int = 16,
                   stride: Int = 2, decodeY4M: Boolean = false): Dataset[Frame] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      val real: Option[Seq[Frame]] =
        if (decodeY4M && f.kind == "video")
          Y4M.frameOffsets(f.payload).map { case (info, offs) =>
            val y = info.width * info.height
            (0 until offs.size by stride).map { i =>
              Frame(f.media_id, i,
                java.util.Arrays.copyOfRange(f.payload, offs(i), offs(i) + y))
            }
          }.orElse(JvmCodec.aviLumaFrames(f, stride))
        else None
      real.getOrElse {
        val nFrames = math.max(1, f.payload.length / frameBytes)
        (0 until nFrames by stride).map { i =>
          Frame(f.media_id, i,
            f.payload.slice(i * frameBytes, (i + 1) * frameBytes))
        }
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

  /** Pure-JDK YUV4MPEG2 (Y4M) container parsing — uncompressed planar
    * YUV, the standard interchange format of the reference encoders
    * (ffmpeg/x264 pipelines): an ASCII header line
    * `YUV4MPEG2 W<w> H<h> ...\n`, then per frame an ASCII `FRAME...\n`
    * marker followed by raw planes (Y then Cb then Cr at the header's
    * chroma subsampling). Strict: a malformed marker or truncated
    * frame fails the WHOLE parse (None) rather than half-decoding —
    * the caller's FakeCodec fallback keeps mixed corpora streaming. */
  object Y4M {
    private val Magic = "YUV4MPEG2 ".getBytes("US-ASCII")

    /** Stream parameters + offset of the first byte after the header. */
    final case class Info(width: Int, height: Int, colorspace: String,
                          dataStart: Int)

    /** Parse the stream header; None unless the magic matches and
      * positive W/H tags are present within the first 512 bytes. */
    def info(b: Array[Byte]): Option[Info] = {
      if (b.length < Magic.length) return None
      var i = 0
      while (i < Magic.length) { if (b(i) != Magic(i)) return None; i += 1 }
      val nl = b.indexOf('\n'.toByte)
      if (nl < 0 || nl > 512) return None
      val tags = new String(b, Magic.length, nl - Magic.length, "US-ASCII")
        .split(' ')
      var w = -1; var h = -1; var cs = "C420" // Y4M default when untagged
      tags.foreach { t =>
        if (t.nonEmpty) t.head match {
          case 'W' => w = t.tail.toIntOption.getOrElse(-1)
          case 'H' => h = t.tail.toIntOption.getOrElse(-1)
          case 'C' => cs = t
          case _   => () // F/I/A/X tags don't affect frame geometry
        }
      }
      if (w <= 0 || h <= 0) None else Some(Info(w, h, cs, nl + 1))
    }

    /** Bytes per frame for the supported colorspaces (chroma planes
      * ceil-divided for odd dimensions, per the spec). */
    def frameSize(i: Info): Option[Int] = {
      val y = i.width * i.height
      val cw = (i.width + 1) / 2; val ch = (i.height + 1) / 2
      i.colorspace match {
        case s if s.startsWith("C420") => Some(y + 2 * cw * ch)
        case "C422"                    => Some(y + 2 * cw * i.height)
        case "C444"                    => Some(3 * y)
        case "Cmono"                   => Some(y)
        case _                         => None
      }
    }

    /** Header info + the offset of every frame's data section (the
      * first Y-plane byte). None on any malformed/truncated frame. */
    def frameOffsets(b: Array[Byte]): Option[(Info, IndexedSeq[Int])] =
      info(b).flatMap { inf =>
        frameSize(inf).flatMap { fs =>
          val offs = IndexedSeq.newBuilder[Int]
          var pos = inf.dataStart
          var bad = false
          val marker = "FRAME".getBytes("US-ASCII")
          while (pos < b.length && !bad) {
            var i = 0
            while (i < marker.length && !bad) {
              if (pos + i >= b.length || b(pos + i) != marker(i)) bad = true
              i += 1
            }
            if (!bad) {
              // frame-level params (interlacing etc.) run to the newline
              var nl = pos + marker.length
              while (nl < b.length && b(nl) != '\n'.toByte) nl += 1
              val dataStart = nl + 1
              if (nl >= b.length || dataStart + fs > b.length) bad = true
              else { offs += dataStart; pos = dataStart + fs }
            }
          }
          if (bad) None else Some((inf, offs.result()))
        }
      }
  }

  /** Pure-JDK RIFF/AVI container parsing: 'RIFF'<size>'AVI ', a
    * LIST/hdrl whose `avih` MainAVIHeader chunk carries dwTotalFrames
    * (+16), dwWidth (+32), dwHeight (+36) — all little-endian u32 —
    * and a LIST/movi holding the per-frame data chunks ('##dc'/'##db').
    * [[info]] reads header metadata only; [[videoChunks]] walks movi so
    * MJPEG streams (each chunk a standalone JPEG) can be pixel-decoded
    * by [[JvmCodec]]. Other codecs' chunks won't decode and fall back
    * to metadata-only. */
  object Avi {
    final case class Info(width: Int, height: Int, totalFrames: Int)

    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    private def fourcc(b: Array[Byte], o: Int, s: String): Boolean =
      o + 4 <= b.length && (0 until 4).forall(i => b(o + i) == s.charAt(i).toByte)

    def info(b: Array[Byte]): Option[Info] = {
      if (b.length < 64 || !fourcc(b, 0, "RIFF") || !fourcc(b, 8, "AVI "))
        return None
      // require the LIST/'hdrl' wrapper before trusting an 'avih'
      // fourcc — a bare pattern scan can false-positive on arbitrary
      // bytes. Then walk hdrl's child chunks (writers pad differently,
      // but children are well-formed fourcc+size records).
      if (!fourcc(b, 12, "LIST") || !fourcc(b, 20, "hdrl")) return None
      val hdrlEnd = math.min(b.length.toLong - 8, 20L + le32(b, 16)).toInt
      var o = 24
      while (o + 8 <= hdrlEnd && !fourcc(b, o, "avih")) {
        val sz = le32(b, o + 4)
        // child must fit inside hdrl (also keeps the Int cursor from
        // wrapping on a hostile u32 size — same guard as videoChunks)
        if (sz > hdrlEnd - o - 8) return None
        o += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
      if (o + 8 > hdrlEnd || !fourcc(b, o, "avih")) return None
      val data = o + 8 // fourcc + chunk size
      if (data + 40 > b.length) return None
      val frames = le32(b, data + 16)
      val w = le32(b, data + 32)
      val h = le32(b, data + 36)
      // u32 fields above Int.MaxValue (or zero dims) are corrupt, not
      // clampable — reject like the audio path does for frame counts
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
          frames < 0 || frames > Int.MaxValue) None
      else Some(Info(w.toInt, h.toInt, frames.toInt))
    }

    /** (offset, length) of every video data chunk ('##dc' compressed /
      * '##db' bitmap) inside the first LIST/movi, in stream order.
      * Empty on truncation or malformed sizes — all-or-nothing like
      * [[Y4M]], so a half-parsed file never yields partial frames. */
    def videoChunks(b: Array[Byte]): IndexedSeq[(Int, Int)] = {
      val none = IndexedSeq.empty[(Int, Int)]
      if (!fourcc(b, 0, "RIFF") || !fourcc(b, 8, "AVI ")) return none
      var o = 12
      while (o + 12 <= b.length) {
        val size = le32(b, o + 4)
        if (fourcc(b, o, "LIST") && fourcc(b, o + 8, "movi")) {
          val end = math.min(b.length.toLong, o + 8 + size).toInt
          val out = IndexedSeq.newBuilder[(Int, Int)]
          var p = o + 12
          while (p + 8 <= end) {
            val csize = le32(b, p + 4)
            if (csize < 0 || p + 8 + csize > end) return none // truncated
            if (isVideoChunk(b, p)) out += ((p + 8, csize.toInt))
            p += 8 + csize.toInt + (csize.toInt & 1)
          }
          return out.result()
        }
        // Skipping a non-movi chunk: its declared size must fit in the
        // remaining buffer, or the Int cursor below could wrap negative
        // (a hostile u32 size near 2^31 made `o += 8 + size.toInt`
        // overflow and the next le32 threw on a negative index). The
        // Long comparison can't overflow, and a chunk that doesn't fit
        // means the file is truncated/corrupt — all-or-nothing, like
        // the movi walk's truncation check.
        if (size > b.length - o - 8) return none
        o += 8 + size.toInt + (size.toInt & 1)
      }
      none
    }

    /** '##dc' / '##db' — two stream-number digits + data-chunk type. */
    private def isVideoChunk(b: Array[Byte], o: Int): Boolean =
      b(o) >= '0' && b(o) <= '9' && b(o + 1) >= '0' && b(o + 1) <= '9' &&
        b(o + 2) == 'd' && (b(o + 3) == 'c' || b(o + 3) == 'b')
  }

  /** Pure-JDK ISO-BMFF (MP4/MOV) box-structure metadata: mvhd movie
    * duration, the first visual track's tkhd dims (16.16 fixed point),
    * and that track's stts sample count — the MP4 analogue of the AVI
    * header path. Frame PIXELS stay undecodable without an inter-frame
    * codec (H.264/H.265/AV1, which the JDK lacks), so decode() reports
    * brightness 0.0 from this path, like the non-MJPEG AVI fallback.
    * All-or-nothing on malformed structure: any size that lies about
    * its enclosure yields None, never a throw (same totality contract
    * as [[Avi]]/[[Y4M]], fuzz-asserted in PropertySpec). Box offsets
    * are walked as Longs so hostile u32/u64 sizes cannot wrap. */
  object Mp4 {
    final case class Info(width: Int, height: Int, durationMs: Long, frames: Int)

    private final class Corrupt extends RuntimeException

    private def be32(b: Array[Byte], o: Long): Long = {
      val i = o.toInt
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }
    private def be64(b: Array[Byte], o: Long): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def typOf(b: Array[Byte], o: Long): String =
      new String(b, o.toInt + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    /** Visit each child box of [start, end): f(type, payloadStart,
      * payloadEnd). size==1 → 64-bit largesize; size==0 → to enclosure
      * end; anything not fitting its enclosure aborts the whole parse. */
    private def children(b: Array[Byte], start: Long, end: Long)(
        f: (String, Long, Long) => Unit): Unit = {
      var o = start
      while (o + 8 <= end) {
        var size = be32(b, o)
        var hdr = 8L
        if (size == 1L) {
          if (o + 16 > end) throw new Corrupt
          size = be64(b, o + 8); hdr = 16L
        } else if (size == 0L) size = end - o
        if (size < hdr || size > end - o) throw new Corrupt
        f(typOf(b, o), o + hdr, o + size)
        o += size
      }
      if (o != end) throw new Corrupt // trailing partial header
    }

    def info(b: Array[Byte]): Option[Info] = {
      if (b.length < 16 || be32(b, 0) < 8 || typOf(b, 0) != "ftyp") return None
      try {
        var timescale = 0L; var duration = 0L
        var w = 0; var h = 0; var frames = 0L
        children(b, 0, b.length) { (t, s, e) =>
          if (t == "moov") children(b, s, e) { (t2, s2, e2) =>
            if (t2 == "mvhd" && e2 - s2 >= 20) {
              val v = b(s2.toInt) & 0xff
              if (v == 1 && e2 - s2 >= 32) {
                timescale = be32(b, s2 + 20); duration = be64(b, s2 + 24)
              } else if (v == 0) {
                timescale = be32(b, s2 + 12); duration = be32(b, s2 + 16)
              }
            } else if (t2 == "trak") {
              var tw = 0; var th = 0; var tf = 0L
              def scan(ss: Long, ee: Long): Unit = children(b, ss, ee) { (t3, s3, e3) =>
                t3 match {
                  case "tkhd" =>
                    val v = b(s3.toInt) & 0xff
                    val wOff = if (v == 1) s3 + 88 else s3 + 76
                    if (e3 - s3 >= (if (v == 1) 96L else 84L)) {
                      tw = (be32(b, wOff) >> 16).toInt // 16.16 fixed
                      th = (be32(b, wOff + 4) >> 16).toInt
                    }
                  case "stts" if e3 - s3 >= 8 =>
                    val n = be32(b, s3 + 4)
                    var i = 0L
                    while (i < n && s3 + 16 + i * 8 <= e3) {
                      tf += be32(b, s3 + 8 + i * 8); i += 1
                    }
                  case "mdia" | "minf" | "stbl" => scan(s3, e3)
                  case _                        =>
                }
              }
              scan(s2, e2)
              if (tw > 0 && th > 0 && w == 0) { w = tw; h = th; frames = tf }
            }
          }
        }
        if (w <= 0 || h <= 0 || timescale <= 0) None
        else Some(Info(w, h, duration * 1000 / timescale,
          math.min(frames, Int.MaxValue.toLong).toInt))
      } catch {
        // Corrupt is the structured abort; AIOOBE is belt-and-braces
        // for any fixed-layout read a size check above didn't cover
        case _: Corrupt | _: ArrayIndexOutOfBoundsException => None
      }
    }
  }

  /** 64-bit average-hash (aHash) of an image payload: real JDK decode,
    * area-average downsample to an 8×8 luma grid ([[JvmCodec.resizeImage]]),
    * each cell thresholded at the integer grid mean, packed row-major
    * MSB-first. The standard cheap perceptual fingerprint: stable under
    * re-encoding (PNG↔JPEG), format conversion, and uniform brightness
    * shifts; Hamming distance between hashes ≈ visual difference.
    * None for payloads ImageIO cannot decode. */
  def aHash64(payload: Array[Byte]): Option[Long] =
    JvmCodec.resizeImage(payload, 8, 8).map { g =>
      var sum = 0L
      var i = 0
      while (i < 64) { sum += (g(i) & 0xff); i += 1 }
      val mean = sum / 64
      var acc = 0L
      i = 0
      while (i < 64) {
        if ((g(i) & 0xff) >= mean) acc |= (1L << (63 - i))
        i += 1
      }
      acc
    }

  /** Perceptual near-duplicate image pairs: decode → [[aHash64]] →
    * banded candidate join → exact Hamming verify. The image twin of
    * the d03 MinHash pipeline: the hash splits into four 16-bit bands
    * and candidates are pairs agreeing on ANY band — a hash-shuffle
    * equi-join on (band, key), never an all-pairs comparison. By
    * pigeonhole, a pair within Hamming distance 3 differs in at most 3
    * of 4 bands, so one band always matches: recall is exactly 1 for
    * `maxHamming` ≤ 3 (the useful near-dup range; larger thresholds
    * trade recall like wider LSH everywhere else in the engine).
    *
    * 100 TB shape: decode is partition-streamed (mapPartitions, one
    * codec per task); the join key space is 4 × 2^16 buckets whose
    * occupancy mirrors visual-content frequency — boilerplate images
    * (logos, spacers) concentrate, which is exactly the dup mass the
    * operator exists to find. Output is pair-bound, not corpus². */
  def perceptualDupPairs(files: Dataset[MediaFile], maxHamming: Int = 3)
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hashed = files
      .mapPartitions(it =>
        it.flatMap(f => aHash64(f.payload).map(h => (f.media_id, h))))
      .toDF("media_id", "phash")
    val bands = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
    }
    val banded = hashed
      .select(col("media_id"), col("phash"), explode(array(bands: _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct() // pairs agreeing on several bands collapse to one row
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
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
