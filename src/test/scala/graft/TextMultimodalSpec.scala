package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, TextAnalysis}

class TextMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId scores marker occurrences and argmaxes deterministically") {
    val docs = Seq(
      (0L, "the cat and the dog"),      // en: the,and → 3
      (1L, "der hund und die katze"),   // de: der,und,die → 3
      (2L, "zzz yyy xxx")               // all zero → first lang wins
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs, "doc_id", "text")
      .select("doc_id", "s_en", "s_de", "predicted")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == (0L, 3L, 0L, "en"))
    assert(got(1) == (1L, 0L, 3L, "de"))
    assert(got(2)._4 == "en") // tie → first in marker order
  }

  test("quality metrics on a known string") {
    val docs = Seq((0L, "a b b c")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(docs, "doc_id", "text")
      .select("n_tok", "n_uniq", "uniq_ratio", "avg_tok_len", "is_quality")
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(r._1 == 4L && r._2 == 3L)
    assert(r._3 == 0.75)
    assert(r._4 == 1.0)
    assert(!r._5) // only 4 tokens, below the 10-token gate
  }

  test("fingerprints are stable across whitespace/case variants") {
    val docs = Seq((0L, "Hello  World"), (1L, "hello world")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(docs, "doc_id", "text")
      .select("fp").as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0).length == 16)
  }

  test("multimodal decode: deterministic fake features through mapPartitions") {
    implicit val s = spark
    val docs = Seq((0L, "abc"), (1L, "a much longer payload body here"), (2L, "xy"))
      .toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(Multimodal.asMedia(docs))
      .collect().sortBy(_.media_id)
    assert(feats.length == 3)
    val f0 = feats(0)
    assert(f0.kind == "image" && f0.n_bytes == 3L)
    assert(f0.sha == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(f0.width == 3 % 512 + 16 && f0.height == 3 % 384 + 16)
    // video kind gets multi-frame
    assert(feats(2).kind == "video" && feats(2).n_frames == 2 % 30 + 1)
    // brightness in [0,1]
    assert(feats.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    // running twice yields identical results (determinism)
    val again = Multimodal.decodeFeatures(Multimodal.asMedia(docs))
      .collect().sortBy(_.media_id)
    assert(feats.toSeq == again.toSeq)
  }

  test("frame sampling and resize keep shapes and determinism") {
    implicit val s = spark
    val docs = Seq((0L, "0123456789abcdef0123456789abcdef0123456789abcdef"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
      .collect().sortBy(_.frame_idx)
    // 48 bytes / 16 = 3 frames, stride 2 → indices 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.forall(_.data.length == 16))
    val thumb = Multimodal.thumbnails(media, 4, 4).collect().head
    assert(thumb.getAs[Array[Byte]]("thumb").length == 16)
    val again = Multimodal.thumbnails(media, 4, 4).collect().head
    assert(thumb.getAs[Array[Byte]]("thumb").toSeq ==
      again.getAs[Array[Byte]]("thumb").toSeq)
  }

  test("metadata path matches FakeCodec on byte length and sha") {
    implicit val s = spark
    val docs = Seq((7L, "payload")).toDF("doc_id", "text")
    val meta = Multimodal.metadata(docs).as[(Long, Long, String, Long, Long)].head()
    val feat = Multimodal.decodeFeatures(Multimodal.asMedia(docs)).head()
    assert(meta._2 == feat.n_bytes && meta._3 == feat.sha)
  }

  // --- real JDK codecs ---

  /** PNG bytes of a w×h image whose pixel (x,y) = rgb(x,y). */
  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** WAV bytes of 16-bit little-endian mono PCM samples. */
  private def wav(samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("JvmCodec decodes real PNG dimensions and exact mean luma") {
    implicit val s = spark
    // left half white, right half black → brightness exactly 0.5
    val bytes = png(4, 2)((x, _) => if (x < 2) 0xffffff else 0x000000)
    val files = Seq(Multimodal.MediaFile(7L, "image", bytes)).toDS()
    val f = Multimodal.decodeFeatures(files, Multimodal.JvmCodec.decode).head()
    assert(f.width == 4 && f.height == 2 && f.n_frames == 1)
    assert(f.brightness == 0.5)
    assert(f.sha.length == 64)
  }

  test("audioSpectral recovers a sine's frequency and zero-crossing rate") {
    implicit val s = spark
    // 1000 Hz sine at 8 kHz over 4096 samples: exactly bin 512, no
    // spectral leakage -> centroid lands on 1000 Hz
    val sine = Array.tabulate(4096)(i =>
      (math.sin(2 * math.Pi * 1000.0 * i / 8000.0) * 16384).toShort)
    // 1 kHz square wave: same ZCR, centroid pulled UP by odd harmonics
    val square = Array.tabulate(4096)(i =>
      (if ((i / 4) % 2 == 0) 16384 else -16384).toShort)
    val files = Seq(Multimodal.MediaFile(31L, "audio", wav(sine)),
      Multimodal.MediaFile(32L, "audio", wav(square)),
      Multimodal.MediaFile(33L, "audio", "junk".getBytes)).toDS()
    val got = Multimodal.spectralFeatures(files).collect()
      .map(a => a.media_id -> a).toMap
    assert(got.size == 2) // junk payload dropped
    val sin = got(31L)
    assert(sin.sample_rate == 8000.0 && sin.n_fft == 4096)
    assert(math.abs(sin.centroid_hz - 1000.0) < 1.0, s"centroid ${sin.centroid_hz}")
    // sine crosses zero twice per period: 2 * f / sr = 0.25 per sample
    assert(math.abs(sin.zcr - 0.25) < 0.01, s"zcr ${sin.zcr}")
    val sq = got(32L)
    assert(math.abs(sq.zcr - 0.25) < 0.01)
    assert(sq.centroid_hz > 1500.0, s"square harmonics must raise centroid, got ${sq.centroid_hz}")
  }

  test("JvmCodec decodes real WAV format, frame count, and RMS") {
    implicit val s = spark
    val bytes = wav(Array[Short](16384, -16384, 16384, -16384))
    val files = Seq(Multimodal.MediaFile(8L, "audio", bytes)).toDS()
    val f = Multimodal.decodeFeatures(files, Multimodal.JvmCodec.decode).head()
    assert(f.width == 1)      // channels
    assert(f.height == 16)    // bits per sample
    assert(f.n_frames == 4)   // PCM frames
    assert(f.brightness == 0.5) // RMS 16384/32768
  }

  test("JvmCodec area-average resize emits the exact luma grid") {
    // 4×2, left white right black → 2×1 thumb = [avg(white box), avg(black box)]
    val bytes = png(4, 2)((x, _) => if (x < 2) 0xffffff else 0x000000)
    val thumb = Multimodal.JvmCodec.resizeImage(bytes, 2, 1).get
    assert(thumb.toSeq == Seq((-1).toByte /* 255 */, 0.toByte))
    // thumbnails(real=true) routes image payloads through the same path
    implicit val s = spark
    val files = Seq(Multimodal.MediaFile(9L, "image", bytes)).toDS()
    val viaDs = Multimodal.thumbnails(files, 2, 1, real = true)
      .select("thumb").as[Array[Byte]].head()
    assert(viaDs.toSeq == thumb.toSeq)
  }

  test("JvmCodec falls back to FakeCodec on undecodable payloads") {
    implicit val s = spark
    val junk = Multimodal.MediaFile(10L, "image", "not an image".getBytes)
    val vid = Multimodal.MediaFile(11L, "video", "clip-bytes".getBytes)
    val files = Seq(junk, vid).toDS()
    val got = Multimodal.decodeFeatures(files, Multimodal.JvmCodec.decode)
      .collect().sortBy(_.media_id)
    assert(got(0) == Multimodal.FakeCodec.decode(junk))
    assert(got(1) == Multimodal.FakeCodec.decode(vid))
  }

  test("dropBoilerplateLines drops cross-doc boilerplate, keeps order, empties all-boiler docs") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nalpha\nbeta"),
      (2L, "COOKIE BANNER\ngamma"),
      (3L, "COOKIE BANNER\ndelta\nCOOKIE BANNER"),
      (4L, "COOKIE BANNER")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.dropBoilerplateLines(
        docs, "doc_id", graft.operators.TextAnalysis.newlineLines(col("text")),
        maxDocs = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // the banner occurs in 4 distinct docs (twice in doc 3 counts once)
    assert(got == Seq(
      (1L, 2L, 1L, "alpha\nbeta"),
      (2L, 1L, 1L, "gamma"),
      (3L, 1L, 2L, "delta"),
      (4L, 0L, 1L, "")))
    // below the doc-frequency threshold nothing is dropped
    val loose = graft.operators.TextAnalysis.dropBoilerplateLines(
        docs, "doc_id", graft.operators.TextAnalysis.newlineLines(col("text")),
        maxDocs = 4)
      .as[(Long, Long, Long, String)].collect()
    assert(loose.forall(_._3 == 0L))
  }

  // --- Y4M (real video container) -----------------------------------

  /** Build a YUV4MPEG2 clip: `nFrames` frames of `w`x`h` C420, frame i's
    * Y plane filled with `yFill(i)`, chroma planes 0x80. */
  private def y4mClip(w: Int, h: Int, nFrames: Int, yFill: Int => Byte,
                      frameParams: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F30:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    (0 until nFrames).foreach { i =>
      out.write(s"FRAME$frameParams\n".getBytes("US-ASCII"))
      val y = Array.fill[Byte](w * h)(yFill(i))
      val c = Array.fill[Byte](2 * cw * ch)(0x80.toByte)
      out.write(y); out.write(c)
    }
    out.toByteArray
  }

  test("JvmCodec decodes Y4M video dimensions, frame count, exact mean luma") {
    val clip = y4mClip(8, 4, 3, i => (10 * i + 5).toByte)
    val f = Multimodal.MediaFile(7L, "video", clip)
    val feats = Multimodal.JvmCodec.decode(f)
    assert(feats.width == 8 && feats.height == 4 && feats.n_frames == 3)
    // mean Y over frames = (5 + 15 + 25) / 3 = 15
    assert(feats.brightness == math.rint(15.0 / 255.0 * 1e6) / 1e6)
    // frame-level params after the FRAME marker must parse too
    val withParams = Multimodal.MediaFile(8L, "video",
      y4mClip(8, 4, 2, _ => 20, frameParams = " Xtag"))
    assert(Multimodal.JvmCodec.decode(withParams).n_frames == 2)
  }

  test("JvmCodec decodes animated GIF frame count and exact mean luma") {
    // build a real 3-frame animated GIF with the JDK's own GIF writer
    def grayFrame(v: Int, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, w, h); g.dispose()
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    Seq(50, 100, 150).foreach(v =>
      w.writeToSequence(new javax.imageio.IIOImage(grayFrame(v, 6, 4), null, null), null))
    w.endWriteSequence(); w.dispose(); ios.close()
    val gif = bos.toByteArray

    val feats = Multimodal.JvmCodec.decode(Multimodal.MediaFile(21L, "video", gif))
    assert(feats.width == 6 && feats.height == 4 && feats.n_frames == 3)
    // GIF palettes are lossless for gray fills: mean luma = (50+100+150)/3
    assert(feats.brightness == math.rint(100.0 / 255.0 * 1e6) / 1e6)
    // a single-frame GIF under kind "video" is NOT claimed by the
    // animated tier (image semantics); it falls through to the stub
    val bos1 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(grayFrame(80, 3, 3), "gif", bos1)
    assert(Multimodal.JvmCodec.decodeGifVideo(
      Multimodal.MediaFile(22L, "video", bos1.toByteArray)).isEmpty)
  }

  test("Y4M chroma planes ceil-divide on odd dimensions") {
    val clip = y4mClip(5, 3, 2, _ => 1)
    val Some((info, offs)) = Multimodal.Y4M.frameOffsets(clip)
    assert(info.width == 5 && info.height == 3)
    // frame = 15 luma + 2 * (3 * 2) chroma = 27 bytes
    assert(Multimodal.Y4M.frameSize(info).contains(27))
    assert(offs.size == 2)
  }

  test("truncated or corrupt Y4M falls back to FakeCodec, never half-parses") {
    val clip = y4mClip(8, 4, 3, _ => 50)
    val truncated = clip.take(clip.length - 5)
    val f = Multimodal.MediaFile(9L, "video", truncated)
    assert(Multimodal.Y4M.frameOffsets(truncated).isEmpty)
    // JvmCodec.decode still returns a row (FakeCodec path), same sha rule
    val feats = Multimodal.JvmCodec.decode(f)
    assert(feats.n_bytes == truncated.length.toLong)
    assert(feats == Multimodal.FakeCodec.decode(f))
    assert(Multimodal.Y4M.frameOffsets("not a video".getBytes).isEmpty)
  }

  test("AVI RIFF headers yield real width/height/frame metadata, corrupt ones fall back") {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(le32(200)); out.write("AVI ".getBytes)
    out.write("LIST".getBytes); out.write(le32(160)); out.write("hdrl".getBytes)
    out.write("avih".getBytes); out.write(le32(56))
    out.write(le32(33367))             // dwMicroSecPerFrame
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
    out.write(le32(240))               // dwTotalFrames
    out.write(le32(0)); out.write(le32(1)); out.write(le32(0))
    out.write(le32(640)); out.write(le32(360))  // dwWidth, dwHeight
    out.write(new Array[Byte](16))
    val avi = out.toByteArray
    val f = Multimodal.MediaFile(20L, "video", avi)
    val feats = Multimodal.JvmCodec.decode(f)
    assert(feats.width == 640 && feats.height == 360 && feats.n_frames == 240)
    assert(feats.brightness == 0.0) // compressed frames: metadata only
    // corrupt magic falls back to the stub, whole-parse-or-nothing
    val bad = avi.clone(); bad(9) = 'X'.toByte
    assert(Multimodal.Avi.info(bad).isEmpty)
    assert(Multimodal.JvmCodec.decode(Multimodal.MediaFile(21L, "video", bad))
      == Multimodal.FakeCodec.decode(Multimodal.MediaFile(21L, "video", bad)))
  }

  // --- MP4 (ISO-BMFF) box-parse metadata ------------------------------

  private def be32b(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32b(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }

  /** Minimal ISO-BMFF: ftyp + moov{mvhd + trak{tkhd + mdia{minf{stbl{stts}}}}}
    * — v0 boxes, 16.16 fixed-point tkhd dims, one stts run. */
  private def mp4Fixture(w: Int, h: Int, timescale: Int, duration: Int,
                         frames: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32b(512), "isomiso2".getBytes)
    val mvhd = box("mvhd", new Array[Byte](4), be32b(0), be32b(0),
      be32b(timescale.toLong), be32b(duration.toLong))
    val tkhd = box("tkhd", new Array[Byte](4), be32b(0), be32b(0), be32b(1),
      be32b(0), be32b(duration.toLong), new Array[Byte](8 + 2 + 2 + 2 + 2 + 36),
      be32b(w.toLong << 16), be32b(h.toLong << 16))
    val stts = box("stts", new Array[Byte](4), be32b(1),
      be32b(frames.toLong), be32b(512))
    val trak = box("trak", tkhd, box("mdia", box("minf", box("stbl", stts))))
    ftyp ++ box("moov", mvhd, trak)
  }

  test("MP4 boxes yield real dims, duration, and stts frame count; pixels stay stubbed") {
    val mp4 = mp4Fixture(320, 240, timescale = 600, duration = 1200, frames = 48)
    assert(Multimodal.Mp4.info(mp4)
      .contains(Multimodal.Mp4.Info(320, 240, 2000L, 48)))
    val feats = Multimodal.JvmCodec.decode(Multimodal.MediaFile(50L, "video", mp4))
    assert(feats.width == 320 && feats.height == 240 && feats.n_frames == 48)
    assert(feats.brightness == 0.0) // no JDK inter-frame codec: metadata only
    // truncation → whole-parse-or-nothing → FakeCodec fallback
    val trunc = mp4.take(mp4.length - 6)
    assert(Multimodal.Mp4.info(trunc).isEmpty)
    assert(Multimodal.JvmCodec.decode(Multimodal.MediaFile(51L, "video", trunc))
      == Multimodal.FakeCodec.decode(Multimodal.MediaFile(51L, "video", trunc)))
    // a child size lying about its enclosure aborts the parse (mvhd is
    // the first box inside moov; moov starts right after the 24B ftyp)
    val lying = mp4.clone()
    System.arraycopy(be32b(0xfffffff0L), 0, lying, 32, 4)
    assert(Multimodal.Mp4.info(lying).isEmpty)
    // non-MP4 leading box type is rejected before any walk
    assert(Multimodal.Mp4.info(box("junk", be32b(0))).isEmpty)
  }

  // --- MJPEG-in-AVI (real compressed-video frames) -------------------

  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** One JPEG frame: w×h RGB filled with gray level `g`. */
  private def jpegFrame(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Minimal MJPEG AVI: RIFF(AVI ) > LIST(hdrl){avih} + LIST(movi){00dc*}. */
  private def mjpegAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val hdrl = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("hdrl".getBytes); o.write("avih".getBytes); o.write(le32b(56))
      o.write(le32b(33367)) // dwMicroSecPerFrame
      o.write(le32b(0)); o.write(le32b(0)); o.write(le32b(0))
      o.write(le32b(frames.size)) // dwTotalFrames
      o.write(le32b(0)); o.write(le32b(1)); o.write(le32b(0))
      o.write(le32b(w)); o.write(le32b(h))
      o.write(new Array[Byte](16))
      o.toByteArray
    }
    val movi = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("movi".getBytes)
      frames.foreach { jpg =>
        o.write("00dc".getBytes); o.write(le32b(jpg.length)); o.write(jpg)
        if ((jpg.length & 1) == 1) o.write(0) // word-align
      }
      o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes)
    out.write(le32b(4 + 8 + hdrl.length + 8 + movi.length))
    out.write("AVI ".getBytes)
    out.write("LIST".getBytes); out.write(le32b(hdrl.length)); out.write(hdrl)
    out.write("LIST".getBytes); out.write(le32b(movi.length)); out.write(movi)
    out.toByteArray
  }

  test("MJPEG-in-AVI frames decode for real: luma from actual JPEG decode") {
    val jpegs = Seq(jpegFrame(8, 6, 40), jpegFrame(8, 6, 120), jpegFrame(8, 6, 200))
    val avi = mjpegAvi(8, 6, jpegs)
    val f = Multimodal.MediaFile(30L, "video", avi)
    val feats = Multimodal.JvmCodec.decode(f)
    assert(feats.width == 8 && feats.height == 6 && feats.n_frames == 3)
    // expected brightness = mean luma of the SAME JPEGs decoded directly
    // (JPEG is lossy: compare against a reference decode, not the fill)
    val expected = {
      val sums = jpegs.map { j =>
        val Some((w, h, g)) = Multimodal.JvmCodec.imageLuma(j, 0, j.length)
        (g.map(_ & 0xff).map(_.toLong).sum, w.toLong * h)
      }
      math.rint(sums.map(_._1).sum.toDouble / sums.map(_._2).sum / 255.0 * 1e6) / 1e6
    }
    assert(feats.brightness == expected && feats.brightness > 0.0)
    // a non-JPEG payload in the video chunks (a codec the JDK lacks)
    // degrades to header metadata, not FakeCodec
    val opaque = mjpegAvi(8, 6, Seq(Array[Byte](1, 2, 3, 4, 5, 6)))
    val metaOnly = Multimodal.JvmCodec.decode(Multimodal.MediaFile(31L, "video", opaque))
    assert(metaOnly.width == 8 && metaOnly.height == 6 &&
      metaOnly.n_frames == 1 && metaOnly.brightness == 0.0)
  }

  test("sampleFrames emits JPEG-decoded luma grids for MJPEG AVI under stride") {
    val jpegs = (0 until 5).map(i => jpegFrame(4, 4, 30 + 40 * i))
    val avi = mjpegAvi(4, 4, jpegs)
    val files = Seq(Multimodal.MediaFile(40L, "video", avi)).toDS()
    val frames = Multimodal.sampleFrames(files, stride = 2, decodeY4M = true)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    frames.foreach { fr =>
      val Some((_, _, g)) = Multimodal.JvmCodec.imageLuma(
        jpegs(fr.frame_idx), 0, jpegs(fr.frame_idx).length)
      assert(fr.data.toSeq == g.toSeq, s"frame ${fr.frame_idx} luma mismatch")
    }
  }

  test("Avi.info rejects u32 overflow frame counts and bare avih without hdrl") {
    val good = mjpegAvi(8, 6, Seq(jpegFrame(8, 6, 99)))
    assert(Multimodal.Avi.info(good).exists(_.totalFrames == 1))
    // dwTotalFrames = 0xFFFFFFFF would wrap negative via .toInt
    val overflow = good.clone()
    val avihData = 32 // RIFF(12) + LIST hdr(8) + 'hdrl'(4) + 'avih'+size(8)
    (0 until 4).foreach(i => overflow(avihData + 16 + i) = 0xff.toByte)
    assert(Multimodal.Avi.info(overflow).isEmpty)
    // an 'avih' fourcc in random bytes, with no LIST/hdrl, is not a header
    val fake = new java.io.ByteArrayOutputStream()
    fake.write("RIFF".getBytes); fake.write(le32b(200)); fake.write("AVI ".getBytes)
    fake.write("junk".getBytes); fake.write(le32b(0))
    fake.write("avih".getBytes); fake.write(le32b(56))
    fake.write(new Array[Byte](100))
    assert(Multimodal.Avi.info(fake.toByteArray).isEmpty)
  }

  test("sampleFrames decodes real Y4M luma planes under stride") {
    val clip = y4mClip(4, 2, 5, i => (7 * i).toByte)
    val files = Seq(
      Multimodal.MediaFile(1L, "video", clip),
      Multimodal.MediaFile(2L, "audio", Array[Byte](1, 2, 3, 4))).toDS()
    val frames = Multimodal.sampleFrames(files, frameBytes = 2, stride = 2,
        decodeY4M = true)
      .collect().groupBy(_.media_id)
    // video: frames 0, 2, 4 — each the full 4x2=8-byte Y plane
    val v = frames(1L).sortBy(_.frame_idx)
    assert(v.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(v.forall(_.data.length == 8))
    assert(v(1).data.forall(_ == (14).toByte))
    // non-video keeps the stub chunk path: 2 chunks at stride 2 -> idx 0
    val a = frames(2L)
    assert(a.map(_.frame_idx).toSeq == Seq(0) && a.head.data.toSeq == Seq[Byte](1, 2))
  }

  test("packSequences fills packs greedily in id order within shards") {
    // all docs land in shard 0 (even ids, shards=2); token counts
    // 3,2,4,1 → first-token offsets 0,3,5,9 → packs 0,0,1,2 at cap 4
    val docs = Seq((0L, "a b c"), (2L, "d e"), (4L, "f g h i"), (6L, "j"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text",
        capacity = 4, shards = 2)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 2L -> 0L, 4L -> 1L, 6L -> 2L))
    // partitioning-independent: same assignment after a repartition
    val re = TextAnalysis.packSequences(docs.repartition(7), "doc_id", "text",
        capacity = 4, shards = 2)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(re == got)
  }

  test("shardAssign is a partitioning-independent permutation with dense per-shard ordinals") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = TextAnalysis.shardAssign(docs, "doc_id", shards = 4)
      .select("doc_id", "shard", "seq").as[(Long, Long, Long)].collect()
    assert(got.map(_._1).distinct.length == 200) // every doc exactly once
    assert(got.forall(r => r._2 >= 0 && r._2 < 4))
    for ((_, rs) <- got.groupBy(_._2)) // seq dense 1..n within each shard
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    // content-independent determinism: same assignment regardless of
    // input partitioning
    val re = TextAnalysis.shardAssign(docs.repartition(13), "doc_id", 4)
      .select("doc_id", "shard", "seq").as[(Long, Long, Long)].collect()
    assert(re.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("compressionRatio separates repetitive from natural from random text") {
    val rnd = new scala.util.Random(5)
    val natural = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across a wide field looking for interesting things to eat " +
      "while birds circle overhead in the warm afternoon sunlight"
    val docs = Seq(
      (0L, "spam " * 400),                                    // repetitive
      (1L, natural),                                          // prose
      (2L, Seq.fill(600)(rnd.nextPrintableChar()).mkString),  // near-random
      (3L, "")                                                // empty edge
    ).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .select("doc_id", "n_raw", "ratio", "keep")
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(0L)._3 < 0.05 && !got(0L)._4)      // boilerplate: gated out
    assert(got(1L)._3 > 0.25 && got(1L)._3 < 0.8 && got(1L)._4)
    assert(got(2L)._3 > 0.8 && got(2L)._4)        // random stays under 1.1
    assert(got(3L)._2 == 0L && got(3L)._3 == 1.0) // empty: defined, kept
    // deterministic across partitionings (thread-local deflaters)
    val re = TextAnalysis.compressionRatio(docs.repartition(5), "doc_id", "text")
      .select("doc_id", "ratio").as[(Long, Double)].collect().toMap
    assert(re == got.view.mapValues(_._3).toMap)
  }

  test("exportShards writes one seq-ordered file tree per shard") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    TextAnalysis.exportShards(docs, "doc_id", shards = 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    // directory partitioning: shard is a partition column with 4 values
    assert(back.select("shard").distinct().count() == 4)
    // rows within each shard's files come back in seq order
    for (sh <- 0 until 4) {
      val seqs = spark.read.parquet(s"$dir/shard=$sh")
        .select("seq").as[Long].collect()
      assert(seqs.toSeq == seqs.sorted.toSeq, s"shard $sh not seq-ordered")
    }
  }

  test("hashedLinearScore: lambda path equals the explode+groupBy spelling") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one"),              // single token: bigram guard, 1 feature
      (3L, ""),                 // split('',' ') -> [""]: still 1 feature
      (4L, "a b a b a")).toDF("doc_id", "text")
    val fast = TextAnalysis.hashedLinearScore(docs, "doc_id", "text")
    // reference spelling: explode features to rows, hash/weight per row,
    // sum — the shape the zero-shuffle lambda must reproduce exactly
    val toks = split(col("text"), " ")
    val bigrams = expr(
      """CASE WHEN size(__t) < 2 THEN array()
        | ELSE transform(sequence(1, size(__t) - 1),
        |   i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))
        |END""".stripMargin)
    val slow = docs.select(col("doc_id"), toks.as("__t"))
      .select(col("doc_id"), explode(concat(col("__t"), bigrams)).as("f"))
      .withColumn("b", pmod(conv(substring(md5(col("f")), 1, 13), 16, 10)
        .cast("long"), lit(4096L)))
      .withColumn("w", pmod(conv(substring(md5(col("b").cast("string")), 1, 13),
        16, 10).cast("long"), lit(2001L)) - lit(1000L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("w").as("score"))
    val f = fast.select("doc_id", "n_feats", "score")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val g = slow.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(f == g, s"lambda=$f explode=$g")
    // 9 tokens + 8 bigrams
    assert(f.head == f.head.copy(_2 = 17L))
  }

  test("stratifiedSample: partition-invariant, rate-monotone, per-stratum rates") {
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", s"doc $i")).toDF("doc_id", "src", "text")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    val s10 = ids(TextAnalysis.stratifiedSample(docs, "doc_id", "src",
      Map("a" -> 1000), defaultBp = 1000))
    // repartitioning must not change membership (hash of id only)
    val s10r = ids(TextAnalysis.stratifiedSample(docs.repartition(7),
      "doc_id", "src", Map("a" -> 1000), defaultBp = 1000))
    assert(s10 == s10r)
    // raising a rate only ADDS rows (nested samples)
    val s30 = ids(TextAnalysis.stratifiedSample(docs, "doc_id", "src",
      Map("a" -> 3000), defaultBp = 1000))
    assert(s10.subsetOf(s30) && s30.size > s10.size)
    // per-stratum rates apply independently; ~10% of 1000 per stratum
    val mixed = TextAnalysis.stratifiedSample(docs, "doc_id", "src",
      Map("a" -> 2000, "b" -> 500), defaultBp = 0)
    val byStratum = mixed.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(byStratum("a") > byStratum("b") * 2,
      s"stratum rates must differentiate: $byStratum")
    assert(math.abs(byStratum("a") - 200L) < 60 &&
      math.abs(byStratum("b") - 50L) < 30, s"rates off: $byStratum")
  }

  test("packSequences: stream offsets and chunk spans, boundary-straddling doc") {
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text", contextLen = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 3L, 0L, 0L, 0L, 1L)))
    // tokens 3..6 straddle the 5-token boundary → spans chunks 0 and 1
    assert(got(1) == ((2L, 4L, 3L, 0L, 1L, 2L)))
    assert(got(2) == ((3L, 2L, 7L, 1L, 1L, 1L)))
  }

  test("tokenBudgetSelect distributed prefix sum equals the global-window spelling") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val got = TextAnalysis.tokenBudgetSelect(docs, "doc_id", "text", 10000L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // naive single-partition global window — the reference semantics
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = docs.select(col("doc_id"),
        split(col("text"), " ").as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("n_tok"),
        graft.plans.TextHash.classifierScore(col("__t")).as("score"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= 10000L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.nonEmpty && got.size < docs.count(),
      s"budget must select a strict subset, got ${got.size}")
    assert(got == naive, s"two-pass=${got.size} naive=${naive.size}")
  }

  test("tokenBudgetSelect: corpus windows key on __pid; single-partition work is summary-only") {
    val dir = "/root/testdata/sf0.001"
    val p = TextAnalysis.tokenBudgetSelect(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text", 10000L)
      .queryExecution.executedPlan.toString
    // (the range exchange lives inside the checkpoint lineage, so it
    // doesn't print here; the equivalence test proves its semantics)
    // corpus-side window must be per-partition parallel, keyed on __pid
    assert(p.contains("windowspecdefinition(__pid"),
      s"corpus cumsum must partition by __pid:\n$p")
    // exactly one SinglePartition exchange — the ≤`partitions`-row
    // offsets summary — and the offsets ride a broadcast join back
    assert("Exchange SinglePartition".r.findAllMatchIn(p).size == 1,
      s"only the tiny offsets summary may single-partition:\n$p")
    assert(p.contains("BroadcastExchange"), s"offsets must broadcast:\n$p")
  }

  test("packSequences: offset windows key on __pid; single-partition work is summary-only") {
    val dir = "/root/testdata/sf0.001"
    val p = TextAnalysis.packSequences(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text", 1024L)
      .queryExecution.executedPlan.toString
    // the t22 distributed-prefix-sum shape: per-partition cumsum keyed
    // on __pid, ONE tiny single-partition offsets summary, broadcast
    // back — never a global unpartitioned window over the corpus
    assert(p.contains("windowspecdefinition(__pid"),
      s"stream-offset cumsum must partition by __pid:\n$p")
    assert("Exchange SinglePartition".r.findAllMatchIn(p).size == 1,
      s"only the tiny offsets summary may single-partition:\n$p")
    assert(p.contains("BroadcastExchange"), s"offsets must broadcast:\n$p")
  }

  test("native symbolCount equals the regex length-difference spelling") {
    import spark.implicits._
    val docs = Seq(
      "plain words only",
      "symbols! and, punct. 50% #tags",
      "",
      "unicode éüñ — and emoji 😀 mix",
      "   leading & trailing!   ",
      "tabs\tand\nnewlines").toDF("text")
    val both = docs.select(
      graft.plans.SetExprs.symbolCount(col("text")).as("native"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")))
        .cast("long").as("regex"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, r) => assert(n == r, s"native=$n regex=$r") }
    // null text -> null count, matching the regex spelling
    val nulls = Seq(Option.empty[String]).toDF("text")
      .select(graft.plans.SetExprs.symbolCount(col("text"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("native rollingTokenHash equals the transform+aggregate spelling") {
    import spark.implicits._
    val docs = Seq(
      Seq("hello", "world", "!"),
      Seq(),
      Seq(""),
      Seq("é", "中文", "😀", "a"),
      Seq("same", "words"), Seq("words", "same")  // order-sensitive
    ).map(Tuple1(_)).toDF("toks")
    val both = docs.select(
      graft.plans.TextHash.rollingTokenHash(col("toks")).as("native"),
      aggregate(transform(col("toks"), t => (ascii(t) + length(t)).cast("long")),
        lit(0L), (h, v) => pmod(h * 131 + v, lit(1000000007L))).as("interp"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, i) => assert(n == i, s"native=$n interp=$i") }
    // the two permuted docs must hash differently (order sensitivity)
    assert(both(4)._1 != both(5)._1)
  }

  test("native classifierScore is bit-identical to the interpreted HOF spelling") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("the quick brown fox jumps over the lazy dog")),
      (2L, Option("one")),
      (3L, Option("")),
      (4L, Option("a b a b a éüñ unicode tōken")),
      (5L, None)).toDF("doc_id", "text")
    val staged = docs.select(col("doc_id"), split(col("text"), " ").as("__t"))
    val both = staged.select(col("doc_id"),
      graft.plans.TextHash.classifierScore(col("__t")).as("native"),
      TextAnalysis.hashedScoreOf(TextAnalysis.ngramFeatures(col("__t")))
        .as("interp"))
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    both.foreach { case (id, n, i) =>
      assert(n == i, s"doc $id: native=$n interpreted=$i") }
    assert(both.find(_._1 == 5L).exists(_._2.isEmpty), "null text -> null score")
  }

  test("profile handles null-bearing and empty frames") {
    import spark.implicits._
    val df = Seq((Some(1L), Some("a")), (None, Some("b")), (Some(3L), None))
      .toDF("k", "v")
    val p = graft.operators.Relational.profile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("k") == ((3L, 1L, 2L)))   // 3 rows, 1 null, 2 distinct
    assert(p("v") == ((3L, 1L, 2L)))
    // empty frame: profile rows still exist, zeros and null min/max
    val e = graft.operators.Relational.profile(
      spark.emptyDataset[(Long, String)].toDF("k", "v"), Seq("k"))
      .collect()
    assert(e.length == 1 && e.head.getLong(1) == 0L && e.head.isNullAt(4))
  }

  test("tokenDrift: one-sided vocabulary still scores (add-one smoothing)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha beta", "a"),
      (2L, "gamma delta", "b")).toDF("doc_id", "text", "source")
    val drift = TextAnalysis.tokenDrift(docs, "text", "source", "a", "b", k = 10)
      .as[(String, Long, Long, Double)].collect()
    assert(drift.length == 4) // union vocab
    // a term absent from B still gets a finite positive contribution
    val alpha = drift.find(_._1 == "alpha").get
    assert(alpha._2 == 2L && alpha._3 == 0L && alpha._4 > 0.0)
    // A-absent terms contribute negatively or ~zero, never NaN/Inf
    drift.foreach { case (_, _, _, klt) =>
      assert(!klt.isNaN && !klt.isInfinite) }
  }

  test("encodeDocs preserves token order, drops OOV, keeps empty-coverage docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a b c a"),   // c is OOV below
      (2L, "zzz qqq"),     // fully OOV
      (3L, "a a a")).toDF("doc_id", "text")
    val vocab = Seq(("a", 1L), ("b", 2L)).toDF("term", "id")
    val got = TextAnalysis.encodeDocs(docs, "doc_id", "text", vocab)
      .select("doc_id", "n_tok", "n_in_vocab", "ids")
      .as[(Long, Long, Long, Seq[Long])].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 4L, Seq(2L, 1L, 2L, 1L))), s"${got(1L)}")
    assert(got(2L) == ((2L, 2L, 0L, Seq())), "fully-OOV doc must survive")
    assert(got(3L) == ((3L, 3L, 3L, Seq(1L, 1L, 1L))))
    // vocab rank: most frequent first, term tiebreak, dense ids from 1
    val v = TextAnalysis.buildVocab(docs, "text", size = 2)
      .select("term", "id").as[(String, Long)].collect().toSet
    assert(v == Set(("a", 1L), ("b", 2L)), s"$v") // a:6, b:2 > c:1
  }

  test("sourceQuotaSelect caps every source at the quota, greedy by score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "a"), (2L, "one two", "a"),
      (3L, "x y z w q r s t u v", "a"),
      (4L, "lone doc here", "b")).toDF("doc_id", "text", "source")
    val kept = TextAnalysis.sourceQuotaSelect(docs, "doc_id", "text", "source", quota = 6L)
    val bySource = kept.groupBy("source").agg(sum("n_tok").as("tot"))
      .as[(String, Long)].collect().toMap
    bySource.values.foreach(t => assert(t <= 6L, s"quota exceeded: $bySource"))
    // within a source, selection order is score desc (doc_id tiebreak):
    // every kept doc's score must be >= every dropped doc's score
    val a = docs.filter(col("source") === "a")
    val scored = TextAnalysis.sourceQuotaSelect(a, "doc_id", "text", "source", quota = 1000L)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val keptA = kept.filter(col("source") === "a").select("doc_id")
      .as[Long].collect().toSet
    val dropped = scored.keySet -- keptA
    for (k <- keptA; d <- dropped)
      assert(scored(k) > scored(d) || (scored(k) == scored(d) && k < d),
        s"non-greedy pick: kept $k (${scored(k)}) over $d (${scored(d)})")
  }

  test("decontaminatedSplit keeps every near-dup cluster whole in one split") {
    import spark.implicits._
    // doc ids picked so a naive per-doc hashSplit WOULD separate some
    // cluster members; the cluster-keyed split must not
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusters = Seq(
      (1L, 1L), (7L, 1L), (13L, 1L),     // cluster 1
      (20L, 20L), (21L, 20L),            // cluster 20
      (50L, 50L), (99L, 50L), (150L, 50L)).toDF("doc_id", "cluster_id")
    val split = TextAnalysis.decontaminatedSplit(docs, clusters, "doc_id")
    val perCluster = split.filter(col("clustered"))
      .groupBy("split_key").agg(countDistinct(col("split")).as("n_splits"))
      .as[(Long, Long)].collect()
    assert(perCluster.nonEmpty && perCluster.forall(_._2 == 1L),
      s"cluster straddles splits: ${perCluster.mkString(",")}")
    // singletons fall back to the plain per-doc hash split rule
    val single = split.filter(!col("clustered"))
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    val plain = TextAnalysis.hashSplit(docs, "doc_id")
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    single.foreach { case (id, sp) => assert(plain(id) == sp, s"doc $id") }
    // every doc assigned exactly one of the three splits
    assert(split.count() == 200L)
    assert(split.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
  }

  test("dupNgramProfile: exact char-mass accounting, deterministic top, short-doc collapse") {
    val docs = Seq(
      (1L, "a b a b a"),   // 2-grams: "a b" x2, "b a" x2 -> all duplicated
      (2L, "solo"))        // 1 token: whole-doc shingle at every n
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .dupNgramProfile(docs, "doc_id", "text", Seq(2))
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    // doc 1: 4 shingles, dup_mass = (2+2) x len("a b")=3 = 12;
    // top = tie on c=2 -> "b a" (desc text) x len 3 = 6
    assert(got(1L) == ((4L, 12L, 6L)))
    // doc 2: the whole-doc shingle, once — nothing duplicated
    assert(got(2L) == ((1L, 0L, 4L)))
  }

  test("tokenRarity: df-exact fold per doc") {
    val docs = Seq((1L, "x y x"), (2L, "x z")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.tokenRarity(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // df: x->2 (distinct per doc!), y->1, z->1
    assert(got(1L) == ((2L, 3L, 1L))) // {x,y}: sum 2+1, min 1
    assert(got(2L) == ((2L, 3L, 1L))) // {x,z}
  }

  test("native hash exprs codegen-compile on NON-nullable input (no fallback)") {
    // nullable=false means ev.isNull is never declared; the generated
    // null-check must not reference it (janino error -> silent
    // interpreted fallback). CODEGEN_ONLY turns that fallback into a
    // hard failure so this spec catches it.
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import spark.implicits._
      val df = spark.range(3).select(
        split(concat(col("id").cast("string"), lit(" x y")), " ").as("toks"))
      val out = df.select(
        graft.plans.TextHash.rollingTokenHash(col("toks")).as("r"),
        graft.plans.TextHash.classifierScore(col("toks")).as("c"))
        .as[(Long, Long)].collect()
      assert(out.length == 3 && out.forall(_._1 != 0L))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null array ELEMENTS yield null from both native hash exprs") {
    import spark.implicits._
    // split() never emits null elements, but the parity claim is with
    // the interpreted HOFs, which propagate a null element to a null
    // result — the native exprs must match on ALL inputs, not just
    // split() outputs (and must not NPE).
    val docs = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq[String](null)),
      (3L, Seq[String]("a", "b"))).toDF("doc_id", "toks")
    val rows = docs.select(col("doc_id"),
      graft.plans.TextHash.rollingTokenHash(col("toks")).as("roll"),
      graft.plans.TextHash.classifierScore(col("toks")).as("clf"),
      aggregate(transform(col("toks"), t => (ascii(t) + length(t)).cast("long")),
        lit(0L), (h, v) => pmod(h * 131 + v, lit(1000000007L))).as("interpRoll"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(rows(0)._2.isEmpty && rows(0)._3.isEmpty)
    assert(rows(1)._2.isEmpty && rows(1)._3.isEmpty)
    assert(rows(2)._2.nonEmpty && rows(2)._3.nonEmpty)
    // interpreted HOF agrees on the null-element rows
    rows.foreach { case (id, roll, _, interp) =>
      assert(roll == interp, s"doc $id: native=$roll interpreted=$interp") }
  }

  test("hashedLinearScore plan is shuffle-free") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.hashedLinearScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier must be map-only:\n$plan")
  }

  private def encodeImg(img: java.awt.image.BufferedImage,
                        fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  private def halfImage(dark: Int, light: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = if (x < 32) dark else light
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("aHash64 survives re-encode and brightness shift, separates content") {
    val base = Multimodal.aHash64(encodeImg(halfImage(0, 255), "png")).get
    // JPEG re-encode of the SAME pixels: lossy, but cell averages stay
    // far from the mean -> identical or near-identical hash
    val jpeg = Multimodal.aHash64(encodeImg(halfImage(0, 255), "jpg")).get
    assert(java.lang.Long.bitCount(base ^ jpeg) <= 3,
      s"png-vs-jpeg hamming ${java.lang.Long.bitCount(base ^ jpeg)}")
    // uniform brightness shift moves every cell AND the mean together
    val bright = Multimodal.aHash64(encodeImg(halfImage(40, 215), "png")).get
    assert(base == bright, "aHash must be brightness-shift invariant")
    // opposite content (halves swapped) -> far hash
    val flipped = Multimodal.aHash64(encodeImg(halfImage(255, 0), "png")).get
    assert(java.lang.Long.bitCount(base ^ flipped) >= 32,
      "swapped halves must be distant")
    // undecodable payload -> None, not a crash
    assert(Multimodal.aHash64("not an image".getBytes).isEmpty)
  }

  test("perceptualDupPairs finds cross-codec dups via band join, no cartesian") {
    implicit val sp = spark
    import spark.implicits._
    val files = Seq(
      Multimodal.MediaFile(1L, "image", encodeImg(halfImage(0, 255), "png")),
      Multimodal.MediaFile(2L, "image", encodeImg(halfImage(0, 255), "jpg")),
      Multimodal.MediaFile(3L, "image", encodeImg(halfImage(255, 0), "png")),
      Multimodal.MediaFile(4L, "image", encodeImg(halfImage(255, 0), "bmp")),
      Multimodal.MediaFile(5L, "image", "garbage".getBytes)).toDS()
    val pairs = Multimodal.perceptualDupPairs(files, maxHamming = 3)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the band equi-join:\n$plan")
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"png/jpeg dup missed: $got")
    assert(got.contains((3L, 4L)), s"png/bmp dup missed: $got")
    assert(!got.exists(p => p._1 <= 2 && p._2 >= 3),
      s"opposite-content pair must not match: $got")
  }

  test("trigramBackoffHeldOut: each backoff leg fires with the exact Stupid-Backoff score") {
    // train counts: tokens N=7 (a b c d | b c x); trigrams {a b c,
    // b c d, b c x}; bigrams {a b, b c(x2), c d, c x}; c1(b)=2, c1(d)=1
    val train = Seq((10L, "a b c d"), (11L, "b c x")).toDF("doc_id", "text")
    val eval = Seq(
      (0L, "a b c"), // trigram hit: ln(c3/c12) = ln(1/1) = 0
      (1L, "z b c"), // bigram backoff: ln(0.4 * c(b c)/c(b)) = ln(0.4*2/2)
      (2L, "z z d"), // unigram backoff: ln(0.16 * c(d)/N) = ln(0.16*1/7)
      (3L, "z z z"), // OOV floor: ln(0.16/7)
      (4L, "u v") // < 3 tokens: zero trigram mass, still reported
    ).toDF("doc_id", "text")
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.trigramBackoffHeldOut(train, eval, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 1L, 1L, 0L, 0L, 0L, r6(math.log(1.0 / 1)))),
      got(0L).toString)
    assert(got(1L) == ((1L, 1L, 0L, 1L, 0L, 0L, r6(math.log(0.4 * 2 / 2L)))),
      got(1L).toString)
    assert(got(2L) == ((2L, 1L, 0L, 0L, 1L, 0L,
      r6(math.log(0.4 * 0.4 * 1 / 7L)))), got(2L).toString)
    assert(got(3L) == ((3L, 1L, 0L, 0L, 0L, 1L,
      r6(math.log(0.4 * 0.4 / 7L)))), got(3L).toString)
    assert(got(4L) == ((4L, 0L, 0L, 0L, 0L, 0L, 0.0)), got(4L).toString)
  }

  test("repetitionProfile: top-bigram mass, once-counted dup-5-gram coverage, integer gates") {
    val corpus = Seq(
      // "a b" occurs 3x (6 chars: 3 x 2) out of 13 token chars; no
      // 5-gram repeats -> dup zeros; 30 > 13 so the top gate FAILS
      (1L, "a b a b a b x"),
      // one repeated 5-gram "p q r s t": windows at 0 and 5 touch
      // (gap 5 = dupN) -> ONE merged span covering all 10 tokens
      (2L, "p q r s t p q r s t"),
      // no repetition at all, long enough that a single top-bigram
      // occurrence (2 chars) clears the 20% gate: 10 <= 12
      (3L, "a b c d e f g h i j k l"),
      // shorter than both gram widths: zeros, passes
      (4L, "k")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(corpus, "doc_id", "text")
      .as[(Long, Long, Long, String, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 7L, 7L, "a b", 3L, 6L, 0L, 0L, false)),
      got(1L).toString)
    // doc 2: top bigram "p q" (2 occurrences, 4 chars of 10); all 10
    // tokens covered by the merged dup span -> dup gate fails
    assert(got(2L) == ((2L, 10L, 10L, "p q", 2L, 4L, 10L, 10L, false)),
      got(2L).toString)
    assert(got(3L) == ((3L, 12L, 12L, "a b", 1L, 2L, 0L, 0L, true)),
      got(3L).toString)
    assert(got(4L) == ((4L, 1L, 1L, "", 0L, 0L, 0L, 0L, true)),
      got(4L).toString)
  }

  test("logisticTrain converges on a separable toy corpus and generalizes to held-out docs") {
    val goodW = Seq("wonderful", "excellent", "great", "superb")
    val badW = Seq("awful", "terrible", "poor", "nasty")
    // 20 docs per class, each 6 tokens drawn deterministically from its
    // class vocabulary — linearly separable in unigram space
    def doc(ws: Seq[String], i: Int): String =
      (0 until 6).map(j => ws((i + j) % ws.length)).mkString(" ")
    val train = ((0 until 20).map(i => (i.toLong, doc(goodW, i), 1L)) ++
      (0 until 20).map(i => (i + 100L, doc(badW, i), 0L)))
      .toDF("doc_id", "text", "y")
    val eval = ((0 until 5).map(i => (i + 200L, doc(goodW, i + 2), 1L)) ++
      (0 until 5).map(i => (i + 300L, doc(badW, i + 3), 0L)))
      .toDF("doc_id", "text", "y")
    val model = TextAnalysis.logisticTrain(train, "doc_id", "text",
      col("y") === 1L, nBuckets = 4096, rounds = 8, lr = 256.0)
    // the learner must separate: every held-out doc classified right
    val got = TextAnalysis.logisticApply(eval, "doc_id", "text",
      col("y") === 1L, model)
      .select("doc_id", "pred", "correct")
      .as[(Long, Boolean, Boolean)].collect()
    assert(got.length == 10 && got.forall(_._3),
      s"held-out toy docs must all classify correctly: ${got.mkString(", ")}")
    // and the weights carry the signal, not just the bias: a pure-good
    // unigram bucket ends positive, a pure-bad one negative
    def bucketOf(wrd: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(wrd.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(13), 16) % 4096L
    }
    assert(model.weights(bucketOf("wonderful")) > 0.0 &&
      model.weights(bucketOf("awful")) < 0.0,
      s"class-marker weights must carry sign: ${model.weights(bucketOf("wonderful"))} / ${model.weights(bucketOf("awful"))}")
    // convergence, not a lucky init: more rounds keep it correct and
    // grow the margin (|sum_w| of the top doc)
    val m2 = TextAnalysis.logisticTrain(train, "doc_id", "text",
      col("y") === 1L, nBuckets = 4096, rounds = 2, lr = 256.0)
    val margin2 = TextAnalysis.logisticApply(eval, "doc_id", "text",
      col("y") === 1L, m2).agg(avg(abs(col("sum_w")))).collect().head.getDouble(0)
    val margin8 = TextAnalysis.logisticApply(eval, "doc_id", "text",
      col("y") === 1L, model).agg(avg(abs(col("sum_w")))).collect().head.getDouble(0)
    assert(margin8 > margin2,
      s"margin must grow with rounds: $margin2 -> $margin8")
  }
}
