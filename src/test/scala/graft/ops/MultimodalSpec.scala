package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text"), "doc_id", "text")

  test("asMedia produces the canonical media schema") {
    assert(media.schema("media_id").dataType == LongType)
    assert(media.schema("payload").dataType == BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "width", "height", "duration_ms"))
    val r = media.filter($"media_id" === 1).collect().head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("featurize emits a normalized fixed-width histogram") {
    val out = Multimodal.featurize(media, bins = 16)
    val feats = out.filter($"media_id" === 1)
      .select($"features").collect().head.getSeq[Float](0)
    assert(feats.length == 16)
    assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-5)
  }

  test("featurizePartitions matches the expression-based featurize") {
    val expected = Multimodal.featurize(media, bins = 16)
      .select($"media_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(f => math.round(f * 1e5f))).toMap
    val viaPartitions = Multimodal.featurizePartitions(media, bins = 16)
      .collect().map(m => m.media_id -> m.features.toSeq.map(f => math.round(f * 1e5f))).toMap
    assert(viaPartitions == expected)
  }

  test("frameSample explodes stride-sized byte windows") {
    val frames = Multimodal.frameSample(media.filter($"media_id" === 1), stride = 4)
      .collect()
    // 11 bytes / stride 4 -> 2 frames
    assert(frames.length == 2)
    assert(new String(frames.head.getAs[Array[Byte]]("frame"), "UTF-8") == "hell")
  }

  test("resize truncates or zero-pads to the target width") {
    val out = Multimodal.resize(media, targetBytes = 5)
      .select($"media_id", $"payload_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(1L).length == 5 && new String(out(1L), "UTF-8") == "hello")
    assert(out(2L).length == 5 && out(2L).drop(3).forall(_ == 0))
  }
}
