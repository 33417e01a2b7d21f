package graft.ops

/** Pure-JVM decoders for media containers — the part of the multimodal
  * decode step that does NOT need an external codec library.
  *
  * [[Multimodal.decodeFrames]] dispatches on magic bytes: RIFF/WAVE
  * PCM audio and binary Netpbm (P5 grayscale / P6 RGB) images decode
  * with the hand-rolled parsers here — sample-accurate,
  * header-tolerant, no dependencies — and compressed STILL images
  * (PNG/JPEG/GIF/BMP) decode through `javax.imageio.ImageIO`, which
  * ships in the JDK (java.desktop) and is headless-safe for decoding.
  * Only formats that genuinely require codecs absent from the JDK —
  * compressed audio SAMPLES (MP3/FLAC/AAC) and video
  * (MP4/AVI/MKV/WebM) — fall through to the labeled byte-statistics
  * stub; MPEG-audio frame-header METADATA (frame count, duration,
  * bitrate, CBR/VBR) is parsed for real by [[parseMp3]], since the
  * header layout and tables are pure public spec. Everything is
  * allocation-lean and partition-local: these run inside
  * `mapPartitions` over blob iterators, so no method here may touch
  * Spark or retain state.
  *
  * All formats parsed by hand are public specifications: RIFF/WAVE
  * chunk layout (Microsoft/IBM WAVE format, 1991) and the netpbm P5/P6
  * headers (pgm(5)/ppm(5) man pages); the PNG/JPEG/GIF/BMP magic bytes
  * are from their respective public specs (PNG RFC 2083 §12.11, JPEG
  * ISO/IEC 10918 SOI marker, GIF87a/89a signature, BMP "BM" header).
  * Luminance uses the Rec.601 weights (0.299 R + 0.587 G + 0.114 B).
  */
object MediaCodecs {

  /** Samples per audio analysis frame (mono, after channel mix-down).
    * ~23 ms at 44.1 kHz — the usual short-time analysis window. */
  val AudioFrameSamples = 1024

  // ------------------------------------------------------------- sniff

  /** Modality actually decodable from the payload's own magic bytes —
    * `Some("audio"|"image")` for the real decoders, `None` → stub. */
  def sniff(data: Array[Byte]): Option[String] =
    if (isWav(data)) Some("audio")
    else if (isNetpbm(data) || isImageIO(data)) Some("image")
    else None

  def isWav(d: Array[Byte]): Boolean =
    d.length >= 12 &&
      d(0) == 'R' && d(1) == 'I' && d(2) == 'F' && d(3) == 'F' &&
      d(8) == 'W' && d(9) == 'A' && d(10) == 'V' && d(11) == 'E'

  def isNetpbm(d: Array[Byte]): Boolean =
    d.length >= 2 && d(0) == 'P' && (d(1) == '5' || d(1) == '6')

  /** Compressed still formats the JDK's own ImageIO decodes: PNG
    * (\x89PNG), JPEG (FF D8 FF SOI), GIF ("GIF8"), BMP ("BM"). */
  def isImageIO(d: Array[Byte]): Boolean =
    (d.length >= 4 &&
      (d(0) & 0xff) == 0x89 && d(1) == 'P' && d(2) == 'N' && d(3) == 'G') ||
    (d.length >= 3 &&
      (d(0) & 0xff) == 0xff && (d(1) & 0xff) == 0xd8 && (d(2) & 0xff) == 0xff) ||
    (d.length >= 4 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F' && d(3) == '8') ||
    (d.length >= 2 && d(0) == 'B' && d(1) == 'M')

  // --------------------------------------------------------- WAV / PCM

  /** Decoded PCM stream: normalized mono samples in [-1, 1]. */
  final case class Pcm(sampleRate: Int, channels: Int, mono: Array[Float])

  private def u16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
  private def u32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
      ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24)

  /** Parse a RIFF/WAVE container holding integer PCM (format code 1;
    * 8-bit unsigned or 16-bit signed little-endian, any channel count).
    * Channels mix down to mono by averaging — frame features describe
    * the program material, not the channel layout. Returns None for
    * non-PCM encodings (float, ADPCM, extensible), truncated headers,
    * or a missing fmt/data chunk — the caller falls back to the stub
    * rather than throwing mid-partition. A data chunk longer than the
    * remaining bytes (truncated upload) decodes the bytes present. */
  def decodeWav(d: Array[Byte]): Option[Pcm] = {
    if (!isWav(d)) return None
    var off = 12
    var fmtCode = -1; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= d.length) {
      val size = u32(d, off + 4).toInt
      val body = off + 8
      val id = new String(d, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      id match {
        case "fmt " if body + 16 <= d.length =>
          fmtCode = u16(d, body)
          channels = u16(d, body + 2)
          rate = u32(d, body + 4).toInt
          bits = u16(d, body + 14)
        case "data" =>
          dataOff = body
          dataLen = math.max(0, math.min(size, d.length - body))
        case _ => // skip unknown chunks (LIST, fact, …)
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off = body + size + (size & 1)
    }
    if (fmtCode != 1 || channels <= 0 || rate <= 0 || dataOff < 0 ||
        (bits != 8 && bits != 16)) return None
    val bytesPerSample = bits / 8
    val frameStride = bytesPerSample * channels
    val nFrames = dataLen / frameStride
    val mono = new Array[Float](nFrames)
    var i = 0
    while (i < nFrames) {
      var acc = 0f
      var c = 0
      while (c < channels) {
        val o = dataOff + i * frameStride + c * bytesPerSample
        acc +=
          (if (bits == 16) (u16(d, o).toShort.toInt / 32768.0f)
           else (((d(o) & 0xff) - 128) / 128.0f)) // 8-bit WAV is unsigned
        c += 1
      }
      mono(i) = acc / channels
      i += 1
    }
    Some(Pcm(rate, channels, mono))
  }

  /** Short-time features of one mono frame — [mean, rms, peak, zero-
    * crossing rate, rms of each temporal quarter]. Exactly
    * [[Multimodal.FeatureDim]] wide so the decoded frames drop into the
    * same `Frame` rows the stub produces. */
  def audioFeature(s: Array[Float], from: Int, until: Int): Array[Float] = {
    val n = until - from
    val f = new Array[Float](8)
    if (n <= 0) return f
    var sum = 0.0; var sq = 0.0; var peak = 0.0; var zc = 0
    var i = from
    while (i < until) {
      val x = s(i)
      sum += x; sq += x * x
      if (math.abs(x) > peak) peak = math.abs(x)
      if (i > from && (s(i - 1) >= 0) != (x >= 0)) zc += 1
      i += 1
    }
    f(0) = (sum / n).toFloat
    f(1) = math.sqrt(sq / n).toFloat
    f(2) = peak.toFloat
    f(3) = if (n > 1) zc.toFloat / (n - 1) else 0f
    var q = 0
    while (q < 4) {
      val a = from + (n.toLong * q / 4).toInt
      val b = from + (n.toLong * (q + 1) / 4).toInt
      var e = 0.0; var j = a
      while (j < b) { e += s(j) * s(j); j += 1 }
      f(4 + q) = if (b > a) math.sqrt(e / (b - a)).toFloat else 0f
      q += 1
    }
    f
  }

  /** All analysis frames of a decoded WAV: tumbling
    * [[AudioFrameSamples]]-sample windows (a short trailing window is
    * kept — silence-padding would bias its rms). */
  def wavFrames(pcm: Pcm): Iterator[Array[Float]] = {
    val n = pcm.mono.length
    if (n == 0) Iterator.empty
    else (0 until n by AudioFrameSamples).iterator.map { a =>
      audioFeature(pcm.mono, a, math.min(a + AudioFrameSamples, n))
    }
  }

  // ------------------------------------------------------------ images

  /** Decoded raster: luminance plane in [0, 1], row-major. */
  final case class Raster(width: Int, height: Int, lum: Array[Float])

  /** Decode any supported still-image payload to a luminance raster:
    * Netpbm by the hand-rolled parser, PNG/JPEG/GIF/BMP via the JDK's
    * ImageIO. None when the payload is neither (caller stubs). */
  def decodeImage(d: Array[Byte]): Option[Raster] =
    if (isNetpbm(d)) decodeNetpbm(d)
    else if (isImageIO(d)) decodeImageIO(d)
    else None

  /** PNG/JPEG/GIF/BMP via `javax.imageio.ImageIO` — pure JDK
    * (java.desktop), headless-safe for DEcoding (no display or AWT
    * event thread is touched reading pixels). The ARGB pixels ImageIO
    * exposes reduce to the same Rec.601 luminance plane as the Netpbm
    * path, so a PNG and a PPM of identical pixels produce identical
    * [[imageFeature]] rows. None on malformed/truncated payloads or a
    * magic-byte match ImageIO cannot actually parse — the caller falls
    * back to the stub rather than throwing mid-partition. */
  def decodeImageIO(d: Array[Byte]): Option[Raster] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        // one bulk getRGB: ImageIO converts whatever the file's native
        // layout is (palette, gray, CMYK…) to packed sRGB ARGB ints
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val lum = new Array[Float](w * h)
        var i = 0
        while (i < lum.length) {
          val p = px(i)
          // same float-op ORDER as the Netpbm path (weight × normalized
          // sample), so a PNG and a PPM of the same pixels are
          // bit-identical, not merely close
          lum(i) = 0.299f * (((p >> 16) & 0xff) / 255.0f) +
            0.587f * (((p >> 8) & 0xff) / 255.0f) +
            0.114f * ((p & 0xff) / 255.0f)
          i += 1
        }
        Some(Raster(w, h, lum))
      }
    } catch {
      case _: java.io.IOException | _: RuntimeException => None
    }

  // ------------------------------------------------------ Netpbm P5/P6

  /** Parse binary PGM (P5) / PPM (P6): header of magic, width, height,
    * maxval separated by whitespace with `#` comments, then raw
    * samples — 1 byte each for maxval < 256, 2 bytes big-endian up to
    * 65535 (per the netpbm spec). P6 triples reduce to Rec.601
    * luminance. None on malformed/truncated input (caller stubs). */
  def decodeNetpbm(d: Array[Byte]): Option[Raster] = {
    if (!isNetpbm(d)) return None
    val rgb = d(1) == '6'
    var off = 2

    // netpbm header tokens: fields separated by whitespace; '#' starts
    // a comment running to end-of-line, legal between any two fields
    def nextInt(): Int = {
      while (off < d.length &&
          (d(off) == ' ' || d(off) == '\t' || d(off) == '\n' ||
           d(off) == '\r' || d(off) == '#')) {
        if (d(off) == '#') {
          while (off < d.length && d(off) != '\n') off += 1
        } else off += 1
      }
      var v = -1
      while (off < d.length && d(off) >= '0' && d(off) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (d(off) - '0')
        off += 1
      }
      v
    }

    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535) return None
    off += 1 // exactly ONE whitespace byte after maxval, per spec
    val wide = maxval > 255
    val bytesPerSample = if (wide) 2 else 1
    val samplesPerPx = if (rgb) 3 else 1
    val need = w.toLong * h * samplesPerPx * bytesPerSample
    if (off + need > d.length) return None

    def sample(o: Int): Float = {
      val raw =
        if (wide) ((d(o) & 0xff) << 8) | (d(o + 1) & 0xff)
        else d(o) & 0xff
      raw.toFloat / maxval
    }

    val lum = new Array[Float](w * h)
    var p = 0
    while (p < w * h) {
      val o = off + p * samplesPerPx * bytesPerSample
      lum(p) =
        if (rgb)
          0.299f * sample(o) + 0.587f * sample(o + bytesPerSample) +
            0.114f * sample(o + 2 * bytesPerSample)
        else sample(o)
      p += 1
    }
    Some(Raster(w, h, lum))
  }

  /** AREA-AVERAGE resize of a luminance raster (the standard
    * thumbnail/downsample filter): every target pixel is the
    * area-weighted mean of the source pixels its back-projected cell
    * overlaps, with exact fractional edge weights — deterministic
    * double arithmetic, no kernel taps to disagree about, correct for
    * any ratio (down or up). Mean luminance is preserved exactly up to
    * float rounding, which keeps [[imageFeature]] stats of a thumbnail
    * comparable to the original's. Partition-local like every decoder
    * here; the target is typically a fixed model-input size (224², or
    * 8² for cheap perceptual features). */
  def resize(r: Raster, w2: Int, h2: Int): Raster = {
    require(w2 > 0 && h2 > 0, s"resize target must be positive, got ${w2}x$h2")
    if (w2 == r.width && h2 == r.height) return r
    val out = new Array[Float](w2 * h2)
    val sx = r.width.toDouble / w2
    val sy = r.height.toDouble / h2
    var ty = 0
    while (ty < h2) {
      val y0 = ty * sy
      val y1 = (ty + 1) * sy
      var tx = 0
      while (tx < w2) {
        val x0 = tx * sx
        val x1 = (tx + 1) * sx
        var acc = 0.0
        var area = 0.0
        var py = math.floor(y0).toInt
        while (py < y1 && py < r.height) {
          // overlap of source row py with the target cell's y-span
          val wy = math.min(py + 1.0, y1) - math.max(py.toDouble, y0)
          if (wy > 0) {
            var px = math.floor(x0).toInt
            while (px < x1 && px < r.width) {
              val wx = math.min(px + 1.0, x1) - math.max(px.toDouble, x0)
              if (wx > 0) {
                acc += r.lum(py * r.width + px) * wx * wy
                area += wx * wy
              }
              px += 1
            }
          }
          py += 1
        }
        out(ty * w2 + tx) = if (area > 0) (acc / area).toFloat else 0f
        tx += 1
      }
      ty += 1
    }
    Raster(w2, h2, out)
  }

  /** 64-bit DIFFERENCE HASH (dHash) — the standard cheap perceptual
    * fingerprint for image near-dup detection: area-average the
    * luminance plane to 9×8 ([[resize]]), quantize each cell to
    * `round(cell * quantScale)`, and set bit `row*8+col` iff the cell
    * is darker than its right neighbor. Horizontally adjacent cells of
    * a re-encoded / slightly-edited image keep their relative order, so
    * near-duplicate images land within a few bits of Hamming distance —
    * which makes the hash LSH-bandable exactly like SimHash (d16's
    * 4×16-bit pigeonhole banding applies verbatim).
    *
    * `quantScale` sets the comparison granularity. 255 (default) is
    * the classic 8-bit perceptual quantization. The d70 gate passes
    * the source box area × maxval instead, which makes each quantized
    * cell the EXACT integer sum of its source bytes (integer-aligned
    * boxes only) — bit-for-bit reproducible by an independent engine
    * with no float-tie hazard. */
  def dHash(r: Raster, quantScale: Double = 255.0): Long = {
    val t = resize(r, 9, 8)
    val q = new Array[Long](72)
    var i = 0
    while (i < 72) { q(i) = Math.round(t.lum(i) * quantScale); i += 1 }
    var h = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (q(cy * 9 + cx) < q(cy * 9 + cx + 1)) h |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    h
  }

  /** 63-bit AUDIO ENVELOPE difference hash — the audio sibling of
    * [[dHash]]: the mono signal splits into 64 equal tumbling windows,
    * each quantized to `round(Σ|sample| · quantScale)` (sum of absolute
    * amplitudes — the loudness envelope), and bit `w` is set iff window
    * `w` is quieter than window `w+1`. Loudness CONTOUR survives
    * re-encoding, gain riding, and codec noise far better than raw
    * samples, which makes the hash LSH-bandable for near-dup audio
    * exactly like [[dHash]] for stills. 63 bits — the hash stays
    * positive, which spares the sign-bit reconstruction an independent
    * engine would otherwise need.
    *
    * For 8-bit PCM, `quantScale = 128` makes each quantized window the
    * EXACT integer sum of `|byte − 128|` (8-bit samples are the dyadic
    * `(b−128)/128`, summed exactly in float at any order) — the same
    * zero-float-hazard reproducibility trick as the d70 image gate. */
  def audioDHash(mono: Array[Float], quantScale: Double): Long = {
    val windows = 64
    val wlen = mono.length / windows
    if (wlen == 0) return 0L
    val q = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var acc = 0.0
      var i = w * wlen
      val end = i + wlen
      while (i < end) { acc += math.abs(mono(i)); i += 1 }
      q(w) = Math.round(acc * quantScale)
      w += 1
    }
    var h = 0L
    var b = 0
    while (b < 63) {
      if (q(b) < q(b + 1)) h |= 1L << b
      b += 1
    }
    h
  }

  // ------------------------------------------------------- MP3 headers
  // Frame-header METADATA parsing for MPEG audio (MP3 and friends) —
  // the compressed-audio half-step that IS possible pure-JVM: the
  // frame header layout, bitrate/sample-rate tables, and frame-length
  // arithmetic are the public ISO/IEC 11172-3 / 13818-3 specification,
  // so frame count, duration, bitrate, and CBR/VBR-ness are exactly
  // computable without any codec. SAMPLE decode (Huffman + IMDCT +
  // synthesis filterbank) still genuinely needs a non-JDK codec and
  // remains the labeled stub — see SURVEY §8 compressed-codec note.

  /** MPEG audio stream metadata from a frame-header walk. `samples` is
    * the exact PCM sample count the frames would decode to; `cbr` is
    * false if any two frames declare different bitrates. */
  final case class Mp3Meta(frames: Int, sampleRate: Int,
      firstBitrateKbps: Int, samples: Long, cbr: Boolean)

  /** An MPEG audio payload: optional ID3v2 tag followed by a frame
    * sync (0xFF Ex). */
  def isMp3(d: Array[Byte]): Boolean = {
    val off = id3v2End(d)
    (d.length >= 3 && d(0) == 'I' && d(1) == 'D' && d(2) == '3') ||
      (d.length >= off + 2 && (d(off) & 0xff) == 0xff &&
        (d(off + 1) & 0xe0) == 0xe0)
  }

  /** Byte offset just past an ID3v2 tag (0 when absent): 10-byte
    * header "ID3" + version(2) + flags(1) + 28-bit SYNCSAFE size. */
  private def id3v2End(d: Array[Byte]): Int =
    if (d.length >= 10 && d(0) == 'I' && d(1) == 'D' && d(2) == '3')
      10 + (((d(6) & 0x7f) << 21) | ((d(7) & 0x7f) << 14) |
        ((d(8) & 0x7f) << 7) | (d(9) & 0x7f))
    else 0

  // bitrate tables (kbps), indexed 1..14; index 0 = free-form and
  // index 15 = reserved, both rejected. Rows: MPEG1 L1/L2/L3, then
  // MPEG2/2.5 L1 and L2+L3 (which share a table).
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  // sample rates by version (MPEG1 / MPEG2 / MPEG2.5), index 0..2
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Walk MPEG audio frames from the first sync: per frame, decode
    * version/layer/bitrate-index/sample-rate-index/padding and step by
    * the spec frame length (Layer I: `(12·bit/rate + pad)·4` slots;
    * Layers II/III: `spf/8·bit/rate + pad` where spf is the samples
    * per frame — 384 for L1, 1152 for L2, 1152/576 for L3 in
    * MPEG1/MPEG2). The walk STOPS (keeping frames so far) at lost
    * sync, a reserved/free-form header, or a truncated final frame —
    * trailing garbage and cut-off uploads yield the parsed prefix, not
    * a throw mid-partition. None when no complete frame parses. */
  def parseMp3(d: Array[Byte]): Option[Mp3Meta] = {
    var off = id3v2End(d)
    var frames = 0
    var rate = 0
    var firstKbps = 0
    var cbr = true
    var samples = 0L
    var done = false
    while (!done && off + 4 <= d.length) {
      val b1 = d(off) & 0xff
      val b2 = d(off + 1) & 0xff
      val b3 = d(off + 2) & 0xff
      val verBits = (b2 >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
      val layerBits = (b2 >> 1) & 3 // 3=L1, 2=L2, 1=L3, 0=reserved
      val brIdx = (b3 >> 4) & 0xf
      val srIdx = (b3 >> 2) & 3
      val pad = (b3 >> 1) & 1
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0 || verBits == 1 ||
          layerBits == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3) {
        done = true
      } else {
        val v1 = verBits == 3
        val kbps = (layerBits match {
          case 3 => if (v1) BrV1L1 else BrV2L1
          case 2 => if (v1) BrV1L2 else BrV2L23
          case _ => if (v1) BrV1L3 else BrV2L23
        })(brIdx)
        val sr = (if (v1) SrV1 else if (verBits == 2) SrV2 else SrV25)(srIdx)
        val spf = layerBits match {
          case 3 => 384
          case 2 => 1152
          case _ => if (v1) 1152 else 576
        }
        val flen =
          if (layerBits == 3) (12 * kbps * 1000 / sr + pad) * 4
          else spf / 8 * kbps * 1000 / sr + pad
        if (frames > 0 && (sr != rate)) done = true // rate change: stop
        else if (off + flen > d.length) done = true // truncated frame
        else {
          if (frames == 0) { rate = sr; firstKbps = kbps }
          else if (kbps != firstKbps) cbr = false
          frames += 1
          samples += spf
          off += flen
        }
      }
    }
    if (frames == 0) None
    else Some(Mp3Meta(frames, rate, firstKbps, samples, cbr))
  }

  /** Whole-image feature — [mean, stddev, min, max, quadrant means
    * (TL, TR, BL, BR)]. One frame per still image. */
  def imageFeature(r: Raster): Array[Float] = {
    val f = new Array[Float](8)
    val n = r.lum.length
    if (n == 0) return f
    var sum = 0.0; var sq = 0.0
    var mn = Float.MaxValue; var mx = Float.MinValue
    val qSum = new Array[Double](4)
    val qN = new Array[Int](4)
    var i = 0
    while (i < n) {
      val x = r.lum(i)
      sum += x; sq += x * x
      if (x < mn) mn = x
      if (x > mx) mx = x
      val q = (if ((i / r.width) * 2 >= r.height) 2 else 0) +
        (if ((i % r.width) * 2 >= r.width) 1 else 0)
      qSum(q) += x; qN(q) += 1
      i += 1
    }
    val mean = sum / n
    f(0) = mean.toFloat
    f(1) = math.sqrt(math.max(0.0, sq / n - mean * mean)).toFloat
    f(2) = mn; f(3) = mx
    var q = 0
    while (q < 4) {
      f(4 + q) = if (qN(q) > 0) (qSum(q) / qN(q)).toFloat else 0f
      q += 1
    }
    f
  }
}
