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
}
