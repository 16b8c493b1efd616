package graft.operators

/** Real pure-JVM decoders for media payloads — the concrete end of
  * [[Multimodal]]'s pluggable codec story. Three tiers:
  *
  *  - Hand-rolled byte-layout decoders for the fully specified
  *    uncompressed formats:
  *    - PPM P6 (binary RGB): ASCII header `P6 <w> <h> <maxval>` with
  *      `#` comments, then `w*h*3` bytes. Features: dims + mean luma
  *      (ITU-R 601 weights).
  *    - WAV (RIFF/WAVE, PCM 16-bit LE): chunked container; `fmt ` carries
  *      channels/sample-rate/bit-depth, `data` the samples. Features:
  *      sample count, duration, RMS amplitude (normalized to [0,1]).
  *  - [[decodeImage]]: the compressed raster formats the JDK itself
  *    ships readers for — PNG, JPEG, BMP, GIF (and TIFF on JDK 9+) via
  *    pure-JDK `javax.imageio.ImageIO`, which works headless with no
  *    native libraries. Same feature set as the PPM path (dims,
  *    channels, ITU-R 601 mean luma over the decoded raster).
  *  - Formats that genuinely need native codecs (H.264 video, MP3
  *    audio) have no JDK decoder and stay behind [[Multimodal]]'s
  *    clearly-marked deterministic stub.
  *
  * All decoders are row-local — exactly what runs inside the
  * mapPartitions batch loop at corpus scale.
  */
object Codecs {

  /** Uniform decoded-media record across modalities; unused fields are
    * zero (e.g. sample_rate for images, width for audio). */
  case class Decoded(format: String, width: Int, height: Int, channels: Int,
      sampleRate: Int, nSamples: Long, meanLevel: Double)

  def decode(bytes: Array[Byte]): Option[Decoded] =
    decodePpm(bytes).orElse(decodeWav(bytes)).orElse(decodeImage(bytes))

  // ImageIO's default reader cache spills to temp FILES per decode —
  // per-row disk I/O inside a hot mapPartitions loop. Keep it in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** PNG / JPEG / BMP / GIF decode via pure-JDK `javax.imageio` (no
    * native libraries, headless-safe). Features mirror [[decodePpm]]:
    * dims, channel count, and ITU-R 601 mean luma over the decoded
    * raster in row-major order (sRGB via `getRGB`, so the luma of a
    * losslessly-coded image — PNG/BMP/GIF — replays exactly from the
    * source pixels; JPEG luma is deterministic for a given JDK but not
    * arithmetic-replayable, being DCT-lossy). Returns None on any
    * malformed/unsupported payload — never throws. */
  def decodeImage(bytes: Array[Byte]): Option[Decoded] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = reader.read(0)
            val w = img.getWidth
            val h = img.getHeight
            val channels = img.getColorModel.getNumComponents
            var luma = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                luma += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            Some(Decoded(fmt, w, h, channels, 0, w.toLong * h,
              luma / (w.toLong * h)))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Nearest-neighbor resize for the ImageIO raster formats — the
    * compressed-format sibling of [[resizePpmNearest]], same NN mapping
    * (src pixel = floor(dst·src/out)). The input is decoded by the JDK
    * reader; the resampled raster is re-encoded as PNG regardless of
    * input format, so downstream decode sees exactly the sampled pixels
    * (PNG is lossless — re-encoding as JPEG would corrupt the samples
    * it just picked). None for undecodable payloads, non-positive or
    * output-buffer-overflowing target dims; never throws. Row-local,
    * allocation = output raster. */
  def resizeImageNearest(bytes: Array[Byte], outW: Int,
      outH: Int): Option[Array[Byte]] = {
    if (outW <= 0 || outH <= 0) return None
    if (outW.toLong * outH > Int.MaxValue / 8) return None // 2 ints/px + slack
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val out = new java.awt.image.BufferedImage(outW, outH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * img.getHeight / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * img.getWidth / outW).toInt
          out.setRGB(x, y, img.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      Some(baos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic test-image builder: encode a w×h raster whose pixel
    * (x,y) is the 24-bit RGB `pixel(x, y)` with the JDK's own `format`
    * writer ("png", "jpeg", "bmp", "gif"). Used by the decode oracles
    * and specs — PNG being lossless, `decodeImage(encodeImage("png",…))`
    * returns exactly the source pixels. */
  def encodeImage(format: String, w: Int, h: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, baos))
      throw new IllegalArgumentException(s"no JDK writer for format $format")
    baos.toByteArray
  }

  /** P6 header scan: (width, height, pixel-data offset), with the full
    * pixel payload verified present. None on anything malformed. */
  private def ppmHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    // read 3 whitespace-separated ASCII ints, skipping '#' comments
    def nextInt(): Option[Int] = {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t' ||
          b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      if (i == start) None
      else scala.util.Try(new String(b, start, i - start, "US-ASCII").toInt).toOption
    }
    for {
      w <- nextInt(); h <- nextInt(); maxv <- nextInt()
      if w > 0 && h > 0 && maxv == 255 && i < b.length
      _ = { i += 1 } // single whitespace after maxval, then pixel data
      if b.length - i >= w.toLong * h * 3
    } yield (w, h, i)
  }

  /** PPM P6. Returns None on anything malformed — never throws. */
  def decodePpm(b: Array[Byte]): Option[Decoded] =
    ppmHeader(b).map { case (w, h, off) =>
      var luma = 0.0
      var p = off
      val end = off + w * h * 3
      while (p < end) {
        luma += 0.299 * (b(p) & 0xff) + 0.587 * (b(p + 1) & 0xff) +
          0.114 * (b(p + 2) & 0xff)
        p += 3
      }
      Decoded("ppm", w, h, 3, 0, w.toLong * h, luma / (w.toLong * h))
    }

  /** Nearest-neighbor resize of a P6 payload to outW×outH — the REAL
    * pixel resample for the image format the pure-JVM codec fully
    * decodes (src pixel = floor(dst·src/out), the standard NN mapping).
    * Emits a well-formed P6; None for non-PPM/malformed input or
    * non-positive target dims. Row-local; allocation = output size. */
  def resizePpmNearest(b: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    if (outW <= 0 || outH <= 0) return None
    // the output buffer is Int-indexed: reject dims whose pixel payload
    // would overflow (total-None contract, never a NegativeArraySize)
    if (outW.toLong * outH * 3 > Int.MaxValue - 64) return None
    ppmHeader(b).map { case (w, h, off) =>
      val header = s"P6\n$outW $outH\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + outW * outH * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var p = header.length
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * h / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * w / outW).toInt
          val src = off + (sy * w + sx) * 3
          out(p) = b(src); out(p + 1) = b(src + 1); out(p + 2) = b(src + 2)
          p += 3
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** RIFF/WAVE chunk scan shared by [[decodeWav]] and [[audioFeatures]]:
    * (channels, sampleRate, dataOffset, dataLen) for PCM 16-bit payloads
    * (format tag 1), None on anything else. */
  private def wavPcm16(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= b.length && s.indices.forall(k => b(off + k) == s(k))
    def u32(off: Int): Long =
      (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
        (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24
    def u16(off: Int): Int = (b(off) & 0xff) | (b(off + 1) & 0xff) << 8
    if (b.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    // chunk offsets as Long: a corrupt 32-bit length near 2^32 must move
    // the cursor FORWARD past the end (loop exits, decode -> None), never
    // wrap negative via toInt and wedge the scan — decode is total
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, len (both sane Ints)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val o = off.toInt
      val len = u32(o + 4) // 0 .. 2^32-1, non-negative by construction
      // the fmt fields are only read if the chunk DECLARES the full
      // 16-byte PCM layout (len >= 16) — a truncated fmt chunk must not
      // silently read bytes belonging to the next chunk
      if (ascii(o, "fmt ") && len >= 16 && o + 24 <= b.length &&
          u16(o + 8) == 1)
        fmt = Some((u16(o + 10), u32(o + 12).toInt, u16(o + 22)))
      else if (ascii(o, "data"))
        data = Some((o + 8, math.min(len, (b.length - o - 8).toLong).toInt))
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    for {
      (channels, rate, bits) <- fmt
      if bits == 16 && channels > 0 && rate > 0
      (dOff, dLen) <- data
    } yield (channels, rate, dOff, dLen)
  }

  /** WAV, PCM 16-bit only (format tag 1). None on anything else. */
  def decodeWav(b: Array[Byte]): Option[Decoded] =
    wavPcm16(b).map { case (channels, rate, dOff, dLen) =>
      val nSamples = dLen / (2 * channels)
      var sumSq = 0.0
      var p = dOff
      val end = dOff + nSamples * 2 * channels
      while (p + 1 < end) {
        val s = ((b(p) & 0xff) | (b(p + 1) << 8)).toShort / 32768.0
        sumSq += s * s
        p += 2
      }
      val n = (end - dOff) / 2
      Decoded("wav", 0, 0, channels, rate, nSamples.toLong,
        if (n == 0) 0.0 else math.sqrt(sumSq / n))
    }

  /** Audio feature record beyond RMS: peak amplitude (max |s|/32768,
    * exact division) and zero-crossing count (sign flips between
    * consecutive samples, frame-major across interleaved channels;
    * s >= 0 counts as non-negative) — the cheap time-domain screens a
    * speech/music corpus pipeline runs to drop silence (peak ≈ 0),
    * clipped takes (peak at 1.0 = |−32768|/32768), and noise (ZCR near
    * Nyquist). Integer sample reads + one exact division per sample:
    * every field replays exactly on another engine. */
  case class AudioFeatures(channels: Int, sampleRate: Int, nSamples: Long,
      rms: Double, peak: Double, zeroCrossings: Long)

  /** Time-domain features of a PCM-16 WAV payload; None when the bytes
    * aren't one ([[wavPcm16]]). Total — never throws. */
  def audioFeatures(b: Array[Byte]): Option[AudioFeatures] =
    wavPcm16(b).map { case (channels, rate, dOff, dLen) =>
      val nSamples = dLen / (2 * channels)
      val end = dOff + nSamples * 2 * channels
      var sumSq = 0.0
      var peak = 0.0
      var zc = 0L
      var prevNonNeg = true
      var first = true
      var p = dOff
      while (p + 1 < end) {
        val raw = ((b(p) & 0xff) | (b(p + 1) << 8)).toShort
        val s = raw / 32768.0
        sumSq += s * s
        val a = if (s < 0) -s else s
        if (a > peak) peak = a
        val nonNeg = raw >= 0
        if (!first && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        first = false
        p += 2
      }
      val n = (end - dOff) / 2
      AudioFeatures(channels, rate, nSamples.toLong,
        if (n == 0) 0.0 else math.sqrt(sumSq / n), peak, zc)
    }

  /** Minimal PCM-16 mono/stereo WAV builder (44-byte canonical header +
    * little-endian samples) — the audio sibling of [[encodeImage]],
    * used by oracles and specs to synthesize deterministic payloads. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad WAV params")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put(off: Int, s: String): Unit =
      s.indices.foreach(i => out(off + i) = s.charAt(i).toByte)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    put(0, "RIFF"); le32(4, 36 + dataLen); put(8, "WAVE")
    put(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, channels)
    le32(24, sampleRate); le32(28, sampleRate * channels * 2)
    le16(32, channels * 2); le16(34, 16)
    put(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) { le16(44 + i * 2, samples(i)); i += 1 }
    out
  }

  /** Per-channel mean of an ImageIO raster (r_mean, g_mean, b_mean) —
    * the color-distribution feature the luma in [[decodeImage]] folds
    * away; row-major accumulation, exact for lossless formats. None on
    * undecodable payloads. */
  def imageChannelMeans(bytes: Array[Byte]): Option[(Double, Double, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var r = 0.0; var g = 0.0; var bl = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; bl += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        if (n == 0) None else Some((r / n, g / n, bl / n))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic multi-frame (animated) GIF builder: `frames` frames
    * of w×h pixels, each pixel the PALETTE INDEX `pixelIdx(f, x, y)`
    * (0..255), with `palette(i)` giving index i's 24-bit RGB. Two
    * choices make the roundtrip pixel-exact (probed, and pinned in
    * MultimodalSpec): frames are TYPE_BYTE_INDEXED on one shared
    * IndexColorModel (the default RGB path re-quantizes per frame —
    * lossy), and interlace is explicitly DISABLED (the JDK writer
    * defaults to interlaced output whose row order the JDK reader then
    * scrambles on small rasters — rows came back permuted with one row
    * dropped until `setProgressiveMode(MODE_DISABLED)`). */
  def encodeGifFrames(w: Int, h: Int, frames: Int, palette: Int => Int,
      pixelIdx: (Int, Int, Int) => Int): Array[Byte] = {
    val rr = new Array[Byte](256); val gg = new Array[Byte](256)
    val bb = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      val p = palette(i) & 0xffffff
      rr(i) = ((p >> 16) & 0xff).toByte
      gg(i) = ((p >> 8) & 0xff).toByte
      bb(i) = (p & 0xff).toByte
      i += 1
    }
    val icm = new java.awt.image.IndexColorModel(8, 256, rr, gg, bb)
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0, pixelIdx(f, x, y) & 0xff)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    baos.toByteArray
  }

  case class GifFrame(index: Int, width: Int, height: Int, meanLevel: Double)

  /** REAL multi-frame GIF decode: per frame, dims and the same ITU-R
    * 601 mean luma as [[decodeImage]] (row-major accumulation —
    * arithmetic-replayable for palettes the writer preserves exactly).
    * None for non-GIF or malformed payloads; never throws. The frame
    * WORK-LIST stage of a video pipeline, with the per-frame decode
    * real instead of stubbed. */
  def gifFrameFeatures(bytes: Array[Byte]): Option[Seq[GifFrame]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            if (!reader.getFormatName.equalsIgnoreCase("gif")) None
            else {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              if (n <= 0) None
              else Some((0 until n).map { f =>
                val img = reader.read(f)
                val w = img.getWidth; val h = img.getHeight
                var luma = 0.0
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    luma += 0.299 * ((rgb >> 16) & 0xff) +
                      0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
                GifFrame(f, w, h, luma / (w.toLong * h))
              })
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Integer gray raster of an ImageIO payload: (width, height,
    * row-major per-pixel r+g+b sums). The channel SUM (not /3) keeps the
    * value in exact integer space — downstream perceptual hashing
    * compares `n·sᵢ > Σs` so no division ever happens, and for lossless
    * formats (PNG/BMP/GIF) the raster replays exactly from the encoded
    * pixels. None on undecodable/empty payloads; never throws. */
  def grayRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w.toLong * h == 0 || w.toLong * h > Int.MaxValue / 4) None
        else {
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              px(y * w + x) =
                ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, px))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
