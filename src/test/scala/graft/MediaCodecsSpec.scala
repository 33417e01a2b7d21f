package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import graft.ops.{MediaCodecs, Multimodal}

/** Real-decoder coverage: WAV/PCM and Netpbm payloads are synthesized
  * byte-by-byte here (no fixtures, no codec libs) and every decoded
  * value is checked against independent arithmetic; PNG/JPEG/GIF/BMP
  * payloads are synthesized through the JDK's ImageIO writer and
  * checked against the hand-rolled Netpbm parser and exact Rec.601
  * arithmetic. */
class MediaCodecsSpec extends SparkSpec {

  // ------------------------------------------------------ synthesizers

  /** Standard RIFF/WAVE with integer PCM interleaved samples; optional
    * extra chunk before `data` to exercise chunk skipping/padding. */
  private def wav(rate: Int, bits: Int, channels: Seq[Array[Int]],
      extraChunk: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val n = channels.head.length
    val bytesPer = bits / 8
    val data = ByteBuffer.allocate(n * channels.size * bytesPer)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n; ch <- channels) {
      if (bits == 16) data.putShort(ch(i).toShort)
      else data.put((ch(i) & 0xff).toByte) // 8-bit: unsigned 0..255
    }
    val out = new ByteArrayOutputStream()
    def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int) = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def tag(s: String) = out.write(s.getBytes(US_ASCII))
    val blockAlign = channels.size * bytesPer
    val extraBytes = extraChunk.map { case (_, b) =>
      8 + b.length + (b.length & 1) }.getOrElse(0)
    tag("RIFF"); le32(4 + 24 + extraBytes + 8 + data.capacity()); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(channels.size); le32(rate)
    le32(rate * blockAlign); le16(blockAlign); le16(bits)
    extraChunk.foreach { case (id, b) =>
      tag(id); le32(b.length); out.write(b)
      if ((b.length & 1) == 1) out.write(0) // RIFF word-align pad
    }
    tag("data"); le32(data.capacity()); out.write(data.array())
    out.toByteArray
  }

  private def netpbm(magic: String, w: Int, h: Int, maxval: Int,
      samples: Seq[Int], comment: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(magic.getBytes(US_ASCII))
    out.write((if (comment) "\n# a header comment\n" else "\n").getBytes(US_ASCII))
    out.write(s"$w $h\n$maxval\n".getBytes(US_ASCII))
    samples.foreach { s =>
      if (maxval > 255) { out.write((s >> 8) & 0xff); out.write(s & 0xff) }
      else out.write(s & 0xff)
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- WAV

  test("WAV 16-bit mono: exact samples, rate, and frame features") {
    // alternating +/-8192 → samples ±0.25, rms 0.25, zcr 1.0
    val sq = Array.tabulate(2048)(i => if (i % 2 == 0) 8192 else -8192)
    val pcm = MediaCodecs.decodeWav(wav(44100, 16, Seq(sq))).get
    assert(pcm.sampleRate == 44100 && pcm.channels == 1)
    assert(pcm.mono.length == 2048)
    assert(pcm.mono(0) == 0.25f && pcm.mono(1) == -0.25f)
    val frames = MediaCodecs.wavFrames(pcm).toSeq
    assert(frames.length == 2) // 2048 / 1024
    val f = frames.head
    assert(math.abs(f(0)) < 1e-6, "mean of a symmetric square wave is 0")
    assert(math.abs(f(1) - 0.25f) < 1e-6, "rms")
    assert(f(2) == 0.25f, "peak")
    assert(math.abs(f(3) - 1.0f) < 1e-6, "zcr: every adjacent pair flips")
    (4 to 7).foreach(q => assert(math.abs(f(q) - 0.25f) < 1e-6, s"quarter rms $q"))
  }

  test("WAV stereo mixdown averages channels") {
    val left = Array.fill(1024)(16384)   // +0.5
    val right = Array.fill(1024)(-16384) // -0.5
    val pcm = MediaCodecs.decodeWav(wav(8000, 16, Seq(left, right))).get
    assert(pcm.channels == 2)
    assert(pcm.mono.forall(_ == 0.0f), "L+R average to silence")
  }

  test("WAV 8-bit is unsigned with 128 as zero") {
    val pcm = MediaCodecs.decodeWav(
      wav(8000, 8, Seq(Array(128, 255, 0, 192)))).get
    assert(pcm.mono(0) == 0.0f)
    assert(math.abs(pcm.mono(1) - 127f / 128f) < 1e-6)
    assert(pcm.mono(2) == -1.0f)
    assert(pcm.mono(3) == 0.5f)
  }

  test("WAV chunk walk: odd-sized unknown chunk before data is skipped") {
    val sq = Array.fill(100)(8192)
    val bytes = wav(8000, 16, Seq(sq),
      extraChunk = Some(("LIST", Array[Byte](1, 2, 3)))) // odd size → pad
    val pcm = MediaCodecs.decodeWav(bytes).get
    assert(pcm.mono.length == 100 && pcm.mono.forall(_ == 0.25f))
  }

  test("WAV rejects non-PCM, truncation, and foreign bytes") {
    val good = wav(8000, 16, Seq(Array.fill(64)(1000)))
    // format code 3 (IEEE float) lives at fmt body offset 0
    val float = good.clone(); float(20) = 3
    assert(MediaCodecs.decodeWav(float).isEmpty)
    assert(MediaCodecs.decodeWav(good.take(16)).isEmpty)
    assert(MediaCodecs.decodeWav("not a riff at all".getBytes).isEmpty)
    // truncated data chunk decodes the samples actually present
    val cut = MediaCodecs.decodeWav(good.dropRight(20)).get
    assert(cut.mono.length == 54)
  }

  // ----------------------------------------------------------- Netpbm

  test("PGM P5: header comments, exact stats and quadrant means") {
    // 2x2: TL=0, TR=255, BL=255, BR=0 (checkerboard)
    val img = netpbm("P5", 2, 2, 255, Seq(0, 255, 255, 0), comment = true)
    val r = MediaCodecs.decodeNetpbm(img).get
    assert(r.width == 2 && r.height == 2)
    assert(r.lum.toSeq == Seq(0f, 1f, 1f, 0f))
    val f = MediaCodecs.imageFeature(r)
    assert(f(0) == 0.5f && math.abs(f(1) - 0.5f) < 1e-6) // mean, std
    assert(f(2) == 0.0f && f(3) == 1.0f)                 // min, max
    assert(f.slice(4, 8).toSeq == Seq(0f, 1f, 1f, 0f))   // quadrants
  }

  test("PPM P6: Rec.601 luminance weights") {
    val red = netpbm("P6", 1, 1, 255, Seq(255, 0, 0))
    assert(math.abs(MediaCodecs.decodeNetpbm(red).get.lum(0) - 0.299f) < 1e-6)
    val grey = netpbm("P6", 1, 1, 255, Seq(100, 100, 100))
    assert(math.abs(MediaCodecs.decodeNetpbm(grey).get.lum(0) - 100f / 255f) < 1e-4)
  }

  test("PGM 16-bit (maxval > 255) reads big-endian samples") {
    val img = netpbm("P5", 2, 1, 65535, Seq(0, 65535))
    val r = MediaCodecs.decodeNetpbm(img).get
    assert(r.lum.toSeq == Seq(0f, 1f))
  }

  test("Netpbm rejects malformed headers and short payloads") {
    assert(MediaCodecs.decodeNetpbm("P5\n0 2\n255\n".getBytes).isEmpty)
    assert(MediaCodecs.decodeNetpbm(
      netpbm("P5", 4, 4, 255, Seq.fill(7)(1))).isEmpty, "7 of 16 samples")
    assert(MediaCodecs.decodeNetpbm("P5 looks like a doc".getBytes).isEmpty)
  }

  // --------------------------------------- ImageIO (PNG/JPEG/GIF/BMP)

  /** Encode pixels through the JDK's own ImageIO writer — the same
    * library family the decoder under test uses, but the assertion
    * target is independent arithmetic (and the hand-rolled Netpbm
    * parser), not ImageIO round-tripping itself. */
  private def imageIoBytes(format: String, w: Int, h: Int,
      rgb: Seq[(Int, Int, Int)]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(i)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  test("PNG decodes via JDK ImageIO, bit-identical to a PPM of the same pixels") {
    val px = Seq((0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255))
    val png = imageIoBytes("png", 2, 2, px)
    assert(MediaCodecs.isImageIO(png), "PNG magic bytes recognized")
    assert(MediaCodecs.sniff(png).contains("image"))
    val r = MediaCodecs.decodeImage(png).get
    assert(r.width == 2 && r.height == 2)
    // PNG is lossless: the raster must equal the Netpbm parser's output
    // for the SAME pixels bit-for-bit (shared Rec.601 float-op order)
    val ppm = netpbm("P6", 2, 2, 255, px.flatMap { case (a, b, c) => Seq(a, b, c) })
    val rp = MediaCodecs.decodeNetpbm(ppm).get
    assert(r.lum.toSeq == rp.lum.toSeq,
      "PNG and PPM of identical pixels must decode bit-identically")
    assert(MediaCodecs.imageFeature(r).toSeq ==
      MediaCodecs.imageFeature(rp).toSeq)
    // and the red pixel carries the exact Rec.601 red weight
    assert(r.lum(2) == 0.299f * (255f / 255f))
  }

  test("JPEG, GIF, and BMP payloads decode with correct dimensions and tone") {
    val grey = Seq.fill(16)((128, 128, 128))
    Seq("jpg", "gif", "bmp").foreach { fmt =>
      val bytes = imageIoBytes(fmt, 4, 4, grey)
      assert(MediaCodecs.isImageIO(bytes), s"$fmt magic recognized")
      val r = MediaCodecs.decodeImage(bytes).get
      assert(r.width == 4 && r.height == 4, s"$fmt dimensions")
      // jpg is lossy, gif quantizes — a flat grey field still lands
      // within a hair of 128/255 in every format
      val f = MediaCodecs.imageFeature(r)
      assert(math.abs(f(0) - 128f / 255f) < 0.02, s"$fmt mean ${f(0)}")
    }
  }

  test("corrupt compressed payloads return None, never throw") {
    // PNG magic followed by garbage: sniffs as image, fails to parse
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G') ++
      Array.fill[Byte](64)(42)
    assert(MediaCodecs.sniff(fake).contains("image"))
    assert(MediaCodecs.decodeImage(fake).isEmpty)
    // a JPEG truncated mid-stream must also fail cleanly
    val jpg = imageIoBytes("jpg", 8, 8, Seq.fill(64)((200, 10, 10)))
    assert(MediaCodecs.decodeImage(jpg.take(jpg.length / 2)).isEmpty)
  }

  // ------------------------------------------------------------ resize

  test("area-average resize: exact averages on integer ratios") {
    // 4x4 checkerboard of 0/1 -> 2x2: every 2x2 block averages to 0.5
    val lum = Array.tabulate(16)(i => ((i / 4 + i % 4) % 2).toFloat)
    val r = MediaCodecs.resize(MediaCodecs.Raster(4, 4, lum), 2, 2)
    assert(r.width == 2 && r.height == 2)
    assert(r.lum.forall(_ == 0.5f))
    // and a flat field stays flat at any target size
    val flat = MediaCodecs.resize(
      MediaCodecs.Raster(4, 4, Array.fill(16)(0.25f)), 3, 5)
    assert(flat.lum.forall(v => math.abs(v - 0.25f) < 1e-6))
  }

  test("area-average resize: fractional ratios preserve mean luminance") {
    val rnd = new scala.util.Random(11)
    val src = MediaCodecs.Raster(7, 5, Array.fill(35)(rnd.nextFloat()))
    val dst = MediaCodecs.resize(src, 3, 2)
    def mean(r: MediaCodecs.Raster): Double =
      r.lum.map(_.toDouble).sum / r.lum.length
    // every source pixel's area is accounted exactly once across the
    // target cells, so the (area-weighted = plain, cells are equal-
    // sized) mean is preserved
    assert(math.abs(mean(src) - mean(dst)) < 1e-6)
    // identity resize returns the raster unchanged
    assert(MediaCodecs.resize(src, 7, 5) eq src)
    // upscale is the same machinery: a 2x upscale of a flat image is flat
    val up = MediaCodecs.resize(src, 14, 10)
    assert(math.abs(mean(up) - mean(src)) < 1e-6)
  }

  test("resize composes with the decoders: PNG -> thumbnail features") {
    // a PNG whose left half is black and right half is white: the 2x1
    // thumbnail must be (0, 1) regardless of the source resolution
    val px = (0 until 64).map { i =>
      if (i % 8 < 4) (0, 0, 0) else (255, 255, 255)
    }
    val png = imageIoBytes("png", 8, 8, px)
    val r = MediaCodecs.decodeImage(png).get
    val thumb = MediaCodecs.resize(r, 2, 1)
    assert(thumb.lum(0) == 0f && thumb.lum(1) == 1f)
  }

  // ----------------------------------------- Spark dispatch end-to-end

  test("decodeFrames dispatches per payload: real codecs + stub fallback") {
    import spark.implicits._
    val wavBytes = wav(8000, 16, Seq(Array.fill(3000)(8192))) // 3 windows
    val imgBytes = netpbm("P6", 2, 2, 255, Seq.fill(12)(128))
    val pngBytes = imageIoBytes("png", 2, 2, Seq.fill(4)((128, 128, 128)))
    val opaque = Array.fill[Byte](600)(7) // no magic → stub, 3 chunks
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "audio", wavBytes),
      Multimodal.MediaBlob(2L, "image", imgBytes),
      Multimodal.MediaBlob(3L, "video", opaque),
      Multimodal.MediaBlob(4L, "image", pngBytes)).toDS()
    val frames = Multimodal.decodeFrames(blobs).collect().groupBy(_.doc_id)
    assert(frames(1L).length == 3, "ceil(3000 / 1024) audio windows")
    assert(math.abs(frames(1L).head.feature(1) - 0.25f) < 1e-6, "audio rms")
    assert(frames(2L).length == 1, "one frame per still image")
    assert(math.abs(frames(2L).head.feature(0) - 128f / 255f) < 1e-4)
    assert(frames(3L).length == 3, "ceil(600 / 256) stub chunks")
    // the compressed still went through ImageIO, not the stub: one
    // frame, identical features to the PPM of the same pixels
    assert(frames(4L).length == 1, "one frame per PNG still")
    assert(frames(4L).head.feature.toSeq == frames(2L).head.feature.toSeq,
      "PNG and PPM of the same pixels decode to the same features")
    frames.values.flatten.foreach(f =>
      assert(f.feature.length == Multimodal.FeatureDim))
    // a recognized-but-corrupt payload must stub, not throw
    val broken = Seq(Multimodal.MediaBlob(4L, "audio",
      "RIFFxxxxWAVEgarbage-no-chunks".getBytes)).toDS()
    assert(Multimodal.decodeFrames(broken).count() == 1)
  }

  // ------------------------------------------------------------- dHash

  /** Independent integer recompute of the 72×64 dHash: exact 8×8 box
    * byte sums, bit set iff left sum < right sum — no shared code with
    * [[MediaCodecs.resize]]/[[MediaCodecs.dHash]]. */
  private def dhashByHand(bytes: Seq[Int]): Long = {
    val sums = Array.ofDim[Long](8, 9)
    for (y <- 0 until 64; x <- 0 until 72)
      sums(y / 8)(x / 8) += bytes(y * 72 + x)
    var h = 0L
    for (cy <- 0 until 8; cx <- 0 until 8)
      if (sums(cy)(cx) < sums(cy)(cx + 1)) h |= 1L << (cy * 8 + cx)
    h
  }

  test("dHash 72x64 equals an exact integer-arithmetic recompute") {
    // deterministic pseudo-random bytes spanning the full 0..255 range
    val px = Seq.tabulate(72 * 64)(i => (i * 2654435761L >>> 7).toInt & 0xff)
    val r = MediaCodecs.decodeNetpbm(netpbm("P5", 72, 64, 255, px)).get
    // box-area × maxval quantization recovers exact integer byte sums
    assert(MediaCodecs.dHash(r, 64 * 255.0) == dhashByHand(px))
    // a gradient image (every right neighbor brighter) is all-ones
    val grad = Seq.tabulate(72 * 64)(i => (i % 72) * 3)
    val rg = MediaCodecs.decodeNetpbm(netpbm("P5", 72, 64, 255, grad)).get
    assert(MediaCodecs.dHash(rg, 64 * 255.0) == -1L, "all 64 bits set")
  }

  test("dHash is perceptual: PNG == PGM of same pixels; small edits stay near") {
    val px = Seq.tabulate(72 * 64)(i => (i * 40503 >>> 4) & 0xff)
    val pgm = MediaCodecs.decodeNetpbm(netpbm("P5", 72, 64, 255, px)).get
    val png = MediaCodecs.decodeImage(
      imageIoBytes("png", 72, 64, px.map(v => (v, v, v)))).get
    // lossless grey PNG → identical luminance plane → identical hash
    assert(MediaCodecs.dHash(pgm) == MediaCodecs.dHash(png))
    // one edited pixel perturbs ONE 8x8 cell → at most 2 bits differ
    val edited = px.updated(0, (px.head + 200) % 256)
    val re = MediaCodecs.decodeNetpbm(netpbm("P5", 72, 64, 255, edited)).get
    val ham = java.lang.Long.bitCount(
      MediaCodecs.dHash(pgm, 64 * 255.0) ^ MediaCodecs.dHash(re, 64 * 255.0))
    assert(ham <= 2, s"single-pixel edit moved $ham bits")
  }

  test("audioDHash: exact integer recompute through a real 8-bit WAV roundtrip") {
    // deterministic pseudo-random bytes as 8-bit unsigned PCM
    val bytes = Array.tabulate(4096)(i => ((i * 2654435761L >>> 9) & 0xff).toInt)
    val wav = Multimodal.wavHeader8BitMono(4096) ++ bytes.map(_.toByte)
    val pcm = MediaCodecs.decodeWav(wav).get
    assert(pcm.mono.length == 4096 && pcm.channels == 1)
    // independent recompute: exact |b-128| window sums, no shared code
    val sums = Array.tabulate(64)(w =>
      (w * 64 until (w + 1) * 64).map(i => math.abs(bytes(i) - 128).toLong).sum)
    var expect = 0L
    for (b <- 0 until 63) if (sums(b) < sums(b + 1)) expect |= 1L << b
    assert(MediaCodecs.audioDHash(pcm.mono, 128.0) == expect)
    assert(expect >= 0L, "63-bit hash stays positive")
    // a crescendo (every window louder than the last) sets all 63 bits
    val up = Array.tabulate(4096)(i => 128 + (i / 64) * 2)
    val pcmUp = MediaCodecs.decodeWav(
      Multimodal.wavHeader8BitMono(4096) ++ up.map(_.toByte)).get
    assert(MediaCodecs.audioDHash(pcmUp.mono, 128.0) == (1L << 63) - 1)
  }

  // ------------------------------------------------------- MP3 headers

  /** One MPEG audio frame of EXPLICIT total length — the length is
    * passed in by the test (from public reference values or spelled-out
    * arithmetic), NOT computed with the parser's own formula, so a
    * frame-length bug cannot cancel out. */
  private def mp3Frame(ver: Int, layer: Int, brIdx: Int, srIdx: Int,
      pad: Int, totalLen: Int): Array[Byte] = {
    val f = new Array[Byte](totalLen)
    f(0) = 0xff.toByte
    f(1) = (0xe0 | (ver << 3) | (layer << 1) | 1).toByte
    f(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    f(3) = 0x44
    f
  }

  test("parseMp3: public reference frame lengths (44.1 kHz 128 kbps " +
      "MPEG1-L3 = 417/418 bytes) and multi-frame stepping") {
    // the canonical spec example: floor(144*128000/44100)=417, pad→418
    val noPad = mp3Frame(3, 1, 9, 0, 0, 417)
    val pad = mp3Frame(3, 1, 9, 0, 1, 418)
    val m1 = MediaCodecs.parseMp3(noPad).get
    assert(m1 == MediaCodecs.Mp3Meta(1, 44100, 128, 1152, cbr = true))
    // stepping: exact lengths back-to-back parse as separate frames —
    // and a fake sync planted INSIDE a body must not be counted
    val body = pad.clone(); body(4) = 0xff.toByte; body(5) = 0xfb.toByte
    val two = noPad ++ body
    val m2 = MediaCodecs.parseMp3(two).get
    assert(m2.frames == 2 && m2.samples == 2304 && m2.cbr)
    // one byte short: the truncated final frame is not counted
    val m3 = MediaCodecs.parseMp3(two.dropRight(1)).get
    assert(m3.frames == 1)
  }

  test("parseMp3: ID3v2 syncsafe skip, VBR flag, stop conditions") {
    // ID3v2 tag with a MULTI-BYTE syncsafe size (300 = 2<<7 | 44)
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 2, 44) ++
      new Array[Byte](300)
    val frame = mp3Frame(3, 1, 9, 0, 0, 417)
    assert(MediaCodecs.isMp3(tag ++ frame))
    assert(MediaCodecs.parseMp3(tag ++ frame).get.frames == 1)
    // VBR: 128 kbps then 192 kbps (idx 11; floor(144*192000/44100)=626)
    val vbr = MediaCodecs.parseMp3(frame ++ mp3Frame(3, 1, 11, 0, 0, 626)).get
    assert(!vbr.cbr && vbr.firstBitrateKbps == 128 && vbr.frames == 2)
    // free-form (brIdx 0) and reserved (15) headers parse no frame
    assert(MediaCodecs.parseMp3(mp3Frame(3, 1, 0, 0, 0, 417)).isEmpty)
    assert(MediaCodecs.parseMp3(mp3Frame(3, 1, 15, 0, 0, 417)).isEmpty)
    // trailing garbage after a good frame stops the walk cleanly
    val m = MediaCodecs.parseMp3(frame ++ Array[Byte](0x12, 0x34, 0x56, 0x78)).get
    assert(m.frames == 1)
    assert(!MediaCodecs.isMp3(Multimodal.wavHeader8BitMono(64)))
  }

  test("parseMp3: MPEG2 Layer III (576 samples) and Layer I slot formula") {
    // MPEG2 (ver bits 10) L3 at 22.05 kHz, idx 10 → 96 kbps:
    // floor(72*96000/22050) = 313 bytes, 576 samples/frame
    val v2 = MediaCodecs.parseMp3(mp3Frame(2, 1, 10, 0, 0, 313)).get
    assert(v2 == MediaCodecs.Mp3Meta(1, 22050, 96, 576, cbr = true))
    // MPEG1 Layer I (layer bits 11) at 44.1 kHz, idx 2 → 64 kbps:
    // (floor(12*64000/44100) + 0) * 4 = 68 bytes, 384 samples/frame
    val l1 = MediaCodecs.parseMp3(mp3Frame(3, 3, 2, 0, 0, 68)).get
    assert(l1 == MediaCodecs.Mp3Meta(1, 44100, 64, 384, cbr = true))
  }

  test("d139 synthesis round-trips to the closed-form metadata the " +
      "oracle predicts, for every id residue class") {
    for (id <- 0L until 60L) {
      val m = MediaCodecs.parseMp3(Multimodal.mp3Payload(id)).get
      assert(m.frames == 1 + (id % 4).toInt, s"id=$id frames")
      val rate = Array(44100, 48000, 32000)((id % 3).toInt)
      assert(m.sampleRate == rate, s"id=$id rate")
      assert(m.firstBitrateKbps ==
        Array(64, 96, 128, 192, 256)((id % 5).toInt), s"id=$id kbps")
      assert(m.samples == (1 + id % 4) * 1152L, s"id=$id samples")
      assert(m.cbr, s"id=$id cbr")
    }
  }
}
