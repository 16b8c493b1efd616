package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    Multimodal.MediaRow(1L, "image", Array.fill(100)(7.toByte)),
    Multimodal.MediaRow(2L, "video", Array.tabulate(10000)(i => (i % 256).toByte)),
    Multimodal.MediaRow(3L, "audio", Array[Byte]())
  ).toDS()

  test("withMediaMeta derives byte length and content hash") {
    val out = Multimodal.withMediaMeta(media.toDF(), "payload")
    val m = out.select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 100L, 2L -> 10000L, 3L -> 0L))
  }

  test("decodeAndFeaturize is deterministic and batch-shaped") {
    val d1 = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    assert(d1.map(_.checksum).toSeq == d2.map(_.checksum).toSeq)
    val row1 = d1.head
    assert(row1.n_bytes == 100 && row1.histogram.sum == 100)
    assert(row1.histogram(0) == 100) // all bytes 0x07 → bin 0
    assert(d1(1).histogram.sum == 10000)
  }

  test("resized caps the longer side and keeps aspect") {
    val out = Multimodal.resized(Multimodal.decodeAndFeaturize(media), 256)
    out.select("width", "height", "out_width", "out_height")
      .as[(Int, Int, Int, Int)].collect().foreach { case (w, h, ow, oh) =>
        assert(ow <= 256 + 1 && oh <= 256 + 1)
        if (w >= h) assert(ow >= oh) else assert(oh >= ow)
      }
  }

  test("sampleFrames emits strided frame indices for video rows only") {
    val out = Multimodal.sampleFrames(media.toDF(), stride = 2)
    val frames = out.as[(Long, Int)].collect().toSet
    assert(frames.forall(_._1 == 2L))
    assert(frames.map(_._2) == Set(0)) // 10000 bytes → 2 frames → idx 0 (stride 2)
  }

  test("real PPM decode: dims, channels, exact mean luma, comment header") {
    // 2x1 P6 image: white pixel + black pixel, with a header comment
    val header = "P6\n# test image\n2 1\n255\n".getBytes("US-ASCII")
    val pixels = Array[Byte](-1, -1, -1, 0, 0, 0) // 255,255,255, 0,0,0
    val d = graft.operators.Codecs.decodePpm(header ++ pixels).get
    assert((d.width, d.height, d.channels, d.format) == ((2, 1, 3, "ppm")))
    // luma(white)=255*(.299+.587+.114)=255, luma(black)=0 -> mean 127.5
    assert(math.abs(d.meanLevel - 127.5) < 1e-9)
    // truncated pixel data -> clean None, never a throw
    assert(graft.operators.Codecs.decodePpm(header ++ pixels.take(3)).isEmpty)
  }

  test("real WAV decode: PCM samples, rate, channels, exact RMS") {
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val samples = Seq(16384, -16384, 0, 32767) // mono 16-bit
    val data = samples.flatMap(le16).toArray
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    val d = graft.operators.Codecs.decodeWav(wav).get
    assert((d.format, d.channels, d.sampleRate, d.nSamples) ==
      (("wav", 1, 8000, 4L)))
    val expectRms = math.sqrt(samples.map(s => math.pow(s / 32768.0, 2)).sum / 4)
    assert(math.abs(d.meanLevel - expectRms) < 1e-12)
  }

  test("corrupt WAV chunk lengths terminate cleanly as None, never hang") {
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // chunk length 0xFFFFFFF8: as a signed Int this is -8 (zero advance —
    // the infinite-scan shape); as unsigned it steps past the end -> None
    val evil = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xFFFFFFF8L) ++ Array.fill[Byte](32)(0)
    assert(graft.operators.Codecs.decodeWav(evil).isEmpty)
    // corrupt DATA length on an otherwise-valid file: clamps to the real
    // remaining bytes instead of surfacing negative sample counts
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val data = le16(1000) ++ le16(-1000)
    val badLen = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(0xFFFFFF00L) ++ data
    val d = graft.operators.Codecs.decodeWav(badLen)
    assert(d.forall(_.nSamples >= 0))
    // truncated fmt chunk (declared len 4 < 16): the channels/rate/bits
    // positions hold the NEXT chunk's bytes — must not fabricate fmt
    // values from them; the decode rejects the chunk and returns None
    val truncFmt = "RIFF".getBytes ++ le32(28 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(4) ++ le16(1) ++ le16(1) ++
      "data".getBytes ++ le32(data.length) ++ data ++ Array.fill[Byte](16)(0)
    assert(graft.operators.Codecs.decodeWav(truncFmt).isEmpty)
  }

  test("resizePpmNearest: exact NN sampling, upscale replication, totality") {
    import graft.operators.Codecs
    // 2x2 with four distinct pixels
    val px = Array[Byte](
      10, 11, 12,  20, 21, 22, // row 0: (0,0) (1,0)
      30, 31, 32,  40, 41, 42) // row 1: (0,1) (1,1)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ px
    // downscale to 1x1 keeps exactly the top-left pixel
    val down = Codecs.resizePpmNearest(ppm, 1, 1).get
    val dDown = Codecs.decodePpm(down).get
    assert((dDown.width, dDown.height) == ((1, 1)))
    assert(down.takeRight(3).toSeq == Seq[Byte](10, 11, 12))
    // upscale 2x2 -> 4x4 replicates each source pixel into a 2x2 block
    val up = Codecs.resizePpmNearest(ppm, 4, 4).get
    val dUp = Codecs.decodePpm(up).get
    assert((dUp.width, dUp.height) == ((4, 4)))
    val body = up.drop(up.length - 48)
    // first output row: (0,0) (0,0) (1,0) (1,0)
    assert(body.take(12).toSeq ==
      Seq[Byte](10, 11, 12, 10, 11, 12, 20, 21, 22, 20, 21, 22))
    // last output row: (0,1) (0,1) (1,1) (1,1)
    assert(body.takeRight(12).toSeq ==
      Seq[Byte](30, 31, 32, 30, 31, 32, 40, 41, 42, 40, 41, 42))
    // totality: non-PPM bytes, non-positive and overflowing dims are
    // clean Nones (46341^2*3 overflows Int)
    assert(Codecs.resizePpmNearest("not a ppm".getBytes, 2, 2).isEmpty)
    assert(Codecs.resizePpmNearest(ppm, 0, 2).isEmpty)
    assert(Codecs.resizePpmNearest(ppm, 46341, 46341).isEmpty)
    // resize of a truncated payload is rejected by the header check
    assert(Codecs.resizePpmNearest(ppm.dropRight(1), 1, 1).isEmpty)
  }

  test("codecs are total on arbitrary bytes: no throw, no hang") {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic CI
    val prefixes = Seq(Array.empty[Byte], "P6".getBytes, "P6\n99999999 99999999\n255\n".getBytes,
      "RIFF".getBytes, ("RIFF" + "\u0000" * 4 + "WAVE").getBytes,
      // PNG and JPEG magics: random tails must die inside ImageIO, not throw
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8, 0xff).map(_.toByte))
    (0 until 200).foreach { i =>
      val body = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      val bytes = prefixes(i % prefixes.length) ++ body
      // must return (quickly) with Some or None — never throw/hang
      val out = graft.operators.Codecs.decode(bytes)
      out.foreach { d =>
        assert(d.nSamples >= 0 && d.width >= 0 && d.height >= 0)
      }
    }
  }

  test("ImageIO PNG decode: pixel-exact roundtrip (dims, channels, luma)") {
    import graft.operators.Codecs
    // 2x2 with four distinct pixels
    def pix(x: Int, y: Int): Int = {
      val i = y * 2 + x
      ((10 + i) << 16) | ((20 + i) << 8) | (30 + i)
    }
    val png = Codecs.encodeImage("png", 2, 2, pix)
    val d = Codecs.decodeImage(png).get
    assert((d.format, d.width, d.height, d.channels) == (("png", 2, 2, 3)))
    // PNG is lossless: ITU-R 601 mean luma replays exactly from source
    val want = (0 until 4).map { i =>
      0.299 * (10 + i) + 0.587 * (20 + i) + 0.114 * (30 + i)
    }.sum / 4
    assert(math.abs(d.meanLevel - want) < 1e-9)
    // the general decode() chain routes image bytes too
    assert(Codecs.decode(png).get.format == "png")
  }

  test("ImageIO JPEG/BMP/GIF decode: exact dims; lossy luma stays near source") {
    import graft.operators.Codecs
    // uniform color: JPEG's DCT reconstructs a flat block near-exactly
    val flat = (100 << 16) | (150 << 8) | 200
    val srcLuma = 0.299 * 100 + 0.587 * 150 + 0.114 * 200
    val jpg = Codecs.decodeImage(Codecs.encodeImage("jpeg", 8, 8, (_, _) => flat)).get
    assert((jpg.format, jpg.width, jpg.height, jpg.channels) == (("jpeg", 8, 8, 3)))
    assert(math.abs(jpg.meanLevel - srcLuma) < 3.0)
    // BMP is lossless 24-bit: luma exact
    val bmp = Codecs.decodeImage(Codecs.encodeImage("bmp", 3, 5, (_, _) => flat)).get
    assert((bmp.format, bmp.width, bmp.height, bmp.channels) == (("bmp", 3, 5, 3)))
    assert(math.abs(bmp.meanLevel - srcLuma) < 1e-9)
    // GIF palettizes: dims always survive, pin those
    val gif = Codecs.decodeImage(Codecs.encodeImage("gif", 4, 2, (_, _) => flat)).get
    assert((gif.format, gif.width, gif.height) == (("gif", 4, 2)))
  }

  test("ImageIO totality: truncated/corrupt/alien bytes are clean Nones") {
    import graft.operators.Codecs
    val png = Codecs.encodeImage("png", 4, 4, (x, y) => (x * 40) << 16 | (y * 50))
    assert(Codecs.decodeImage(png.take(8)).isEmpty) // magic only, no chunks
    assert(Codecs.decodeImage(png.take(png.length / 2)).isEmpty) // cut IDAT
    assert(Codecs.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Codecs.decodeImage("not an image at all".getBytes).isEmpty)
    // PPM/WAV payloads have no ImageIO reader: None here, handled upstream
    val ppm = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Codecs.decodeImage(ppm).isEmpty)
  }

  test("resizeImageNearest: exact NN through PNG re-encode, totality") {
    import graft.operators.Codecs
    def pix(x: Int, y: Int): Int = {
      val i = y * 2 + x
      ((50 + i) << 16) | ((80 + i) << 8) | (120 + i)
    }
    val png = Codecs.encodeImage("png", 2, 2, pix)
    // downscale to 1x1 keeps exactly the top-left pixel, losslessly
    val down = Codecs.decodeImage(Codecs.resizeImageNearest(png, 1, 1).get).get
    assert((down.format, down.width, down.height) == (("png", 1, 1)))
    val wantTL = 0.299 * 50 + 0.587 * 80 + 0.114 * 120
    assert(math.abs(down.meanLevel - wantTL) < 1e-9)
    // upscale 2x2 -> 4x4 replicates pixels: mean luma is invariant
    val up = Codecs.decodeImage(Codecs.resizeImageNearest(png, 4, 4).get).get
    assert((up.width, up.height) == ((4, 4)))
    val srcMean = (0 until 4).map { i =>
      0.299 * (50 + i) + 0.587 * (80 + i) + 0.114 * (120 + i)
    }.sum / 4
    assert(math.abs(up.meanLevel - srcMean) < 1e-9)
    // JPEG input resamples too (output is still lossless PNG)
    val jpg = Codecs.encodeImage("jpeg", 8, 8, (_, _) => 0x6496c8)
    val rj = Codecs.decodeImage(Codecs.resizeImageNearest(jpg, 2, 2).get).get
    assert((rj.format, rj.width, rj.height) == (("png", 2, 2)))
    // totality: junk bytes, non-positive and overflowing dims
    assert(Codecs.resizeImageNearest("junk".getBytes, 2, 2).isEmpty)
    assert(Codecs.resizeImageNearest(png, 0, 1).isEmpty)
    assert(Codecs.resizeImageNearest(png, 1 << 16, 1 << 16).isEmpty)
    // PPM payloads are the hand-rolled codec's job, not ImageIO's
    val ppm = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Codecs.resizeImageNearest(ppm, 1, 1).isEmpty)
  }

  test("audioFeatures: exact RMS/peak/ZCR on a synthesized WAV") {
    import graft.operators.Codecs
    val samples = Array[Short](16384, -16384, 0, -32768, 32767)
    val wav = Codecs.encodeWav(8000, 1, samples)
    val f = Codecs.audioFeatures(wav).get
    assert(f.channels == 1 && f.sampleRate == 8000 && f.nSamples == 5L)
    assert(f.peak == 1.0) // |-32768| / 32768
    // sign flips: +16384->-16384, -16384->0 (zero is non-negative),
    // 0->-32768, -32768->32767
    assert(f.zeroCrossings == 4L)
    // power-of-two scalings keep every term exactly representable, so
    // the RMS is bit-equal to the direct formula, not just close
    val want = math.sqrt(
      samples.map(s => (s / 32768.0) * (s / 32768.0)).sum / 5)
    assert(f.rms == want)
    // decodeWav's RMS agrees (same sample walk)
    assert(Codecs.decodeWav(wav).get.meanLevel == f.rms)
    assert(Codecs.audioFeatures("junk".getBytes).isEmpty)
    assert(Codecs.audioFeatures(Array.empty[Byte]).isEmpty)
  }

  test("imageChannelMeans: exact per-channel means on lossless rasters") {
    import graft.operators.Codecs
    val png = Codecs.encodeImage("png", 2, 1,
      (x, _) => if (x == 0) 0xff0000 else 0x000040)
    val (r, g, b) = Codecs.imageChannelMeans(png).get
    assert(r == 127.5 && g == 0.0 && b == 32.0)
    assert(Codecs.imageChannelMeans("nope".getBytes).isEmpty)
  }

  test("decodeReal routes real formats and flags the rest undecoded") {
    val ppm = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30)
    val png = graft.operators.Codecs.encodeImage("png", 3, 2, (x, y) => x << 16 | y)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", ppm),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3, 4)), // junk
      Multimodal.MediaRow(3L, "image", png))
    val out = Multimodal.decodeReal(rows.toDS())
      .collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).format == "ppm" && out(0).width == 1)
    assert(!out(1).decoded && out(1).format == "unknown")
    assert(out(2).decoded && out(2).format == "png" &&
      out(2).width == 3 && out(2).height == 2)
  }

  test("multi-frame GIF roundtrip is pixel-exact; strided sampling and totality") {
    import graft.operators.Codecs
    // 4 frames of 3x2; palette index = gray level; frame f pixel (x,y)
    // carries index (f*50 + y*10 + x) — all distinct, all recoverable
    val gif = Codecs.encodeGifFrames(3, 2, 4, i => i * 0x010101,
      (f, x, y) => f * 50 + y * 10 + x)
    val frames = Codecs.gifFrameFeatures(gif).get
    assert(frames.size == 4)
    assert(frames.forall(f => f.width == 3 && f.height == 2))
    // mean luma of frame f replays: pixels f*50 + {0,1,2,10,11,12}
    for (f <- 0 until 4) {
      val want = (Seq(0, 1, 2, 10, 11, 12).map(d => f * 50 + d)
        .map(v => 0.299 * v + 0.587 * v + 0.114 * v)).sum / 6
      assert(frames(f).meanLevel == want, s"frame $f")
    }
    // strided sampling keeps frames 0 and 2 of 4
    val rows = Seq(Multimodal.MediaRow(1L, "video", gif),
      Multimodal.MediaRow(2L, "video", Array[Byte](1, 2, 3)),
      Multimodal.MediaRow(3L, "video",
        graft.operators.Codecs.encodeImage("png", 2, 2, (_, _) => 0)))
    val out = Multimodal.sampleFramesReal(rows.toDS(), stride = 2)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    val ours = out.filter(_.media_id == 1L)
    assert(ours.map(_.frame_idx).toSeq == Seq(0, 2) &&
      ours.forall(_.n_frames == 4))
    // junk and non-GIF (PNG is single-frame ImageIO but not a frame
    // stream) come back as clean undecoded rows, never a throw
    assert(out.filter(_.media_id == 2L).map(_.decoded).toSeq == Seq(false))
    assert(out.filter(_.media_id == 3L).map(_.decoded).toSeq == Seq(false))
  }

  test("perceptualHash: exact hand-computed bits, corrupt bytes flagged") {
    // 2x2 raster, r+g+b sums: (0,0)->30, (1,0)->300, (0,1)->60, (1,1)->90
    // total=480; bit_i = 4*s_i > 480 → only pixel (1,0) = cell index 1
    val px = Map((0, 0) -> (10, 10, 10), (1, 0) -> (100, 100, 100),
      (0, 1) -> (20, 20, 20), (1, 1) -> (30, 30, 30))
    val png = graft.operators.Codecs.encodeImage("png", 2, 2, (x, y) => {
      val (r, g, b) = px((x, y)); (r << 16) | (g << 8) | b
    })
    val rows = Seq(Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", Array[Byte](9, 9, 9)))
    val out = Multimodal.perceptualHash(rows.toDS(), 2, 2)
      .collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).phash == 2L &&
      out(0).width == 2 && out(0).height == 2)
    assert(!out(1).decoded && out(1).phash == 0L)
  }

  test("perceptualHash: NN downsample floor-maps grid cells to source pixels") {
    // 4x4 image, bright only at the floor-mapped positions of a 2x2 grid:
    // grid (gx,gy) samples source (gx*4/2, gy*4/2) = (0,0),(2,0),(0,2),(2,2).
    // Make (2,0) and (2,2) bright → hash bits 1 and 3 → 0b1010 = 10
    val png = graft.operators.Codecs.encodeImage("png", 4, 4, (x, y) =>
      if ((x, y) == (2, 0) || (x, y) == (2, 2)) 0xffffff else 0)
    val out = Multimodal.perceptualHash(
      Seq(Multimodal.MediaRow(7L, "image", png)).toDS(), 2, 2).head()
    assert(out.decoded && out.phash == 10L)
  }
}
