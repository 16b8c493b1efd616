package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real (schema, batch shape, partitioning),
  * and so is the decode for every format the JVM can handle without
  * native libraries: PPM/WAV via hand-rolled byte readers and PNG/JPEG/
  * BMP/GIF via pure-JDK `javax.imageio` (see [[Codecs]] — all handled by
  * [[decodeReal]]). Only formats that genuinely need native codecs
  * (H.264 video, MP3 audio) go through the clearly-marked deterministic
  * stub ([[decodeAndFeaturize]]); swap it for a JNI decoder without
  * touching the pipeline around it.
  *
  * Batch shape: per-partition iterator processing via `mapPartitions` on a
  * typed Dataset — the Scala analogue of `mapInPandas` (one batch in, one
  * batch out, no per-row setup cost). Decode is embarrassingly parallel;
  * the only cross-row op (feature aggregation) happens afterwards in
  * DataFrame land.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Long, checksum: Long, histogram: Array[Long])

  /** Attach media metadata columns derivable without decoding. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("content_md5", md5(col(binCol)))

  /** Decode + feature-extract, batched per partition.
    *
    * STUB: real decode would parse the container format here; instead the
    * "raster" dims come deterministically from the byte length and the
    * features are a 16-bin byte histogram + xor checksum — real work over
    * the real bytes, exercising the same data movement a codec would.
    */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.payload
        val hist = new Array[Long](16)
        var checksum = 0L
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) >> 4) += 1
          checksum = checksum * 31 + (bytes(i) & 0xff)
          i += 1
        }
        // STUB dimensions — a real decoder reads these from the header
        val width = 16 + (math.abs(checksum) % 1024).toInt
        val height = 16 + (math.abs(checksum / 7) % 1024).toInt
        DecodedRow(r.media_id, r.kind, width, height, bytes.length.toLong, checksum, hist)
      }
    }
  }

  case class RealDecodedRow(media_id: Long, kind: String, decoded: Boolean,
      format: String, width: Int, height: Int, channels: Int,
      sample_rate: Int, n_samples: Long, mean_level: Double)

  /** Decode with the REAL codecs ([[Codecs]]: PPM images and PCM WAV
    * audio via hand-rolled byte readers; PNG/JPEG/BMP/GIF via pure-JDK
    * `javax.imageio`); rows in formats needing native libraries (H.264,
    * MP3) come back with `decoded = false` (route them to the stub path
    * or an external decode service). Same mapPartitions batch shape as
    * the stub path. */
  def decodeReal(media: Dataset[MediaRow]): Dataset[RealDecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codecs.decode(r.payload) match {
        case Some(d) => RealDecodedRow(r.media_id, r.kind, decoded = true,
          d.format, d.width, d.height, d.channels, d.sampleRate,
          d.nSamples, d.meanLevel)
        case None => RealDecodedRow(r.media_id, r.kind, decoded = false,
          "unknown", 0, 0, 0, 0, 0L, 0.0)
      }
    })
  }

  case class ResizedRow(media_id: Long, resized: Boolean, width: Int,
      height: Int, payload: Array[Byte])

  /** REAL pixel resample (nearest neighbor) for PPM payloads
    * ([[Codecs.resizePpmNearest]]) and the ImageIO formats
    * ([[Codecs.resizeImageNearest]] — PNG/JPEG/BMP/GIF in, PNG out),
    * batched per partition like the other codec stages. Rows whose
    * payload no pure-JVM codec can resample come back with
    * `resized = false` and the original bytes (route them to the
    * metadata-only [[resized]] path or an external service). */
  def resizeReal(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codecs.resizePpmNearest(r.payload, outW, outH)
        .orElse(Codecs.resizeImageNearest(r.payload, outW, outH)) match {
        case Some(p) => ResizedRow(r.media_id, resized = true, outW, outH, p)
        case None => ResizedRow(r.media_id, resized = false, 0, 0, r.payload)
      }
    })
  }

  case class AudioRow(media_id: Long, decoded: Boolean, channels: Int,
      sample_rate: Int, n_samples: Long, rms: Double, peak: Double,
      zero_crossings: Long)

  /** Time-domain audio screen over PCM WAV payloads
    * ([[Codecs.audioFeatures]]: RMS, peak amplitude, zero-crossing
    * count) — the silence/clipping/noise triage stage of an audio
    * corpus pipeline, batched per partition like every codec stage.
    * Non-WAV rows come back `decoded = false`. */
  def audioFeaturesReal(media: Dataset[MediaRow]): Dataset[AudioRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codecs.audioFeatures(r.payload) match {
        case Some(f) => AudioRow(r.media_id, decoded = true, f.channels,
          f.sampleRate, f.nSamples, f.rms, f.peak, f.zeroCrossings)
        case None =>
          AudioRow(r.media_id, decoded = false, 0, 0, 0L, 0.0, 0.0, 0L)
      }
    })
  }

  case class ChannelRow(media_id: Long, decoded: Boolean, r_mean: Double,
      g_mean: Double, b_mean: Double)

  /** Per-channel color means over ImageIO payloads
    * ([[Codecs.imageChannelMeans]]) — the color-distribution feature
    * (sepia/grayscale/tint detection) the luma decode folds away.
    * Undecodable rows come back `decoded = false`. */
  def imageChannelsReal(media: Dataset[MediaRow]): Dataset[ChannelRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codecs.imageChannelMeans(r.payload) match {
        case Some((rm, gm, bm)) =>
          ChannelRow(r.media_id, decoded = true, rm, gm, bm)
        case None => ChannelRow(r.media_id, decoded = false, 0.0, 0.0, 0.0)
      }
    })
  }

  /** Resize metadata transform (pure arithmetic on decoded dims — the
    * real pixel resample for PPM is [[resizeReal]]; this is the
    * plan-only path for formats the pure-JVM codec can't resample). */
  def resized(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame =
    decoded.toDF().withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame-sampling plan for video-kind rows: every `stride`-th frame
    * index up to a deterministic fake frame count (bytes/4096). The
    * explode produces the (media, frame_idx) work-list a real frame
    * extractor would consume. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("n_frames", greatest(lit(1), (length(col("payload")) / 4096).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx")

  case class FrameFeatureRow(media_id: Long, decoded: Boolean,
      frame_idx: Int, n_frames: Int, width: Int, height: Int,
      mean_level: Double)

  /** REAL strided frame sampling over multi-frame GIF payloads — the
    * video-pipeline stage [[sampleFrames]] plans by metadata, with the
    * per-frame decode actually performed ([[Codecs.gifFrameFeatures]]):
    * every `stride`-th frame comes back with dims + mean luma. Payloads
    * no pure-JVM codec can frame-split (H.264 etc.) yield one
    * `decoded = false` row — route those to the metadata-only plan or
    * an external decode service. Same mapPartitions batch shape as the
    * other codec stages; output size is frames/stride per row, bounded
    * by the payload itself. */
  def sampleFramesReal(media: Dataset[MediaRow],
      stride: Int): Dataset[FrameFeatureRow] = {
    require(stride >= 1, s"need stride >= 1, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Codecs.gifFrameFeatures(r.payload) match {
        case Some(frames) =>
          frames.indices.by(stride).map { i =>
            val f = frames(i)
            FrameFeatureRow(r.media_id, decoded = true, f.index,
              frames.size, f.width, f.height, f.meanLevel)
          }
        case None =>
          Seq(FrameFeatureRow(r.media_id, decoded = false, -1, 0, 0, 0, 0.0))
      }
    })
  }

  case class PHashRow(media_id: Long, decoded: Boolean, phash: Long,
      width: Int, height: Int)

  /** Perceptual average-hash (aHash) over decoded rasters — the image
    * analogue of SimHash for near-duplicate detection in a multimodal
    * corpus (re-encoded/resampled copies keep their hash; unrelated
    * images don't collide).
    *
    * Per image: gray raster ([[Codecs.grayRaster]], integer r+g+b
    * sums), nearest-neighbor sample down to a `gridW`×`gridH` grid
    * (same `src = floor(dst·srcDim/outDim)` mapping as the resize
    * codec), then bit i = 1 iff `n·sᵢ > Σs` (n = grid cells) — the
    * classic above-average-brightness test kept in EXACT integer
    * arithmetic (no division, no doubles), so for lossless formats the
    * hash replays bit-for-bit from the source pixels and an external
    * engine can oracle it. Bits are row-major, bit i of the result
    * long. `gridW·gridH` ≤ 64. Pair search over the hashes is
    * [[Dedup.hammingPairs]] — banded, never all-pairs. */
  def perceptualHash(media: Dataset[MediaRow], gridW: Int = 8,
      gridH: Int = 8): Dataset[PHashRow] = {
    require(gridW > 0 && gridH > 0 && gridW * gridH <= 64,
      s"grid must fit a 64-bit hash, got ${gridW}x$gridH")
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      Codecs.grayRaster(r.payload) match {
        case Some((w, h, px)) =>
          val n = gridW * gridH
          val cells = new Array[Long](n)
          var gy = 0
          while (gy < gridH) {
            val sy = (gy.toLong * h / gridH).toInt
            var gx = 0
            while (gx < gridW) {
              val sx = (gx.toLong * w / gridW).toInt
              cells(gy * gridW + gx) = px(sy * w + sx).toLong
              gx += 1
            }
            gy += 1
          }
          var total = 0L
          var i = 0
          while (i < n) { total += cells(i); i += 1 }
          var hash = 0L
          i = 0
          while (i < n) {
            if (n * cells(i) > total) hash |= 1L << i
            i += 1
          }
          PHashRow(r.media_id, decoded = true, hash, w, h)
        case None => PHashRow(r.media_id, decoded = false, 0L, 0, 0)
      }
    })
  }
}
