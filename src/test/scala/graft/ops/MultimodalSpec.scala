package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "hello world"), (1L, "abc"), (2L, "a longer text payload here"))
    .toDF("doc_id", "text")

  test("assets carry opaque bytes with a modality tag cycling image/audio/video") {
    val a = Multimodal.assetsFromDocuments(docs).orderBy("asset_id").collect()
    assert(a.map(_.getString(1)).toSeq == Seq("image", "audio", "video"))
    assert(new String(a(0).getAs[Array[Byte]](2), "UTF-8") == "hello world")
  }

  test("decodeMeta derives deterministic metadata via partition-batched decode") {
    val m = Multimodal.decodeMeta(spark, Multimodal.assetsFromDocuments(docs))
      .orderBy("asset_id").collect()
    val len = "hello world".length.toLong
    assert(m(0).byte_len == len)
    assert(m(0).width == (64 + len % 577).toInt)
    assert(m(0).height == (64 + (len * 31) % 353).toInt)
    assert(m(0).n_frames == (1 + len % 24).toInt)
    assert(m(0).checksum == // md5("hello world")
      "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("frame sampling emits stride-spaced offsets within the payload") {
    val f = Multimodal.sampleFrames(
      Multimodal.assetsFromDocuments(docs.filter(col("doc_id") === 2)), stride = 10)
      .select("frame_offset").as[Long].collect().toSeq
    assert(f == Seq(0L, 10L, 20L)) // 26-byte payload
  }

  test("feature extraction: 8 dims in [-1,1], deterministic from content") {
    val f = Multimodal.extractFeatures(spark, Multimodal.assetsFromDocuments(docs))
      .orderBy("asset_id").collect()
    assert(f.forall(_.features.length == 8))
    assert(f.flatMap(_.features).forall(v => v >= -1.0 && v <= 1.0))
    // deterministic: md5("hello world") = 5eb63bbb... -> dim0 = 0x5eb6
    val expected0 = (Integer.parseInt("5eb6", 16) / 65535.0 - 0.5) * 2.0
    assert(f(0).features.head == expected0)
  }

  test("resize plan fits into the box preserving aspect, never below 1px") {
    val m = Multimodal.decodeMeta(spark, Multimodal.assetsFromDocuments(docs)).toDF()
    val r = Multimodal.resizePlan(m, box = 256).collect()
    r.foreach { row =>
      val (w, h, ow, oh) = (row.getInt(1), row.getInt(2), row.getLong(3), row.getLong(4))
      assert(ow <= 256 && oh <= 256 && ow >= 1 && oh >= 1)
      // aspect preserved within the floor rounding
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.1)
    }
  }

  test("frame sampling survives empty payloads (no rows, no crash)") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    assert(Multimodal.sampleFrames(
      Multimodal.assetsFromDocuments(empty), stride = 10).count() == 0)
  }
}
