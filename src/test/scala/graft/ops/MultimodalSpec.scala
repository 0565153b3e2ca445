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

  test("synthesized PNGs decode back to the analytic width/height/pixel sum") {
    val rows = Seq((3L, 40L), (17L, 7L), (255L, 300L)).toDF("doc_id", "n_chars")
    val decoded = Multimodal.decodeImages(Multimodal.synthesizeImages(
        rows, "doc_id", lit(1) + col("n_chars") % 16, lit(1) + col("doc_id") % 8))
      .collect().map(d => d.media_id -> d).toMap
    for ((id, nChars) <- Seq((3L, 40L), (17L, 7L), (255L, 300L))) {
      val w = (1 + nChars % 16).toInt; val h = (1 + id % 8).toInt
      val expected = (0 until h).map(y => w * ((id + y) % 256)).sum +
        w.toLong * h * ((id * 7) % 256 + (id * 13) % 256)
      assert(decoded(id).width == w && decoded(id).height == h)
      assert(decoded(id).pixel_sum == expected,
        s"id=$id: got ${decoded(id).pixel_sum}, want $expected")
    }
  }

  test("resizeImages nearest-neighbor downsample keeps the sampled gradient exactly") {
    val rows = Seq((9L, 13L), (250L, 40L)).toDF("doc_id", "n_chars")
    val resized = Multimodal.decodeImages(Multimodal.resizeImages(
        Multimodal.synthesizeImages(
          rows, "doc_id", lit(1) + col("n_chars") % 16, lit(1) + col("doc_id") % 8),
        factor = 2))
      .collect().map(d => d.media_id -> d).toMap
    for ((id, nChars) <- Seq((9L, 13L), (250L, 40L))) {
      val w = (1 + nChars % 16).toInt; val h = (1 + id % 8).toInt
      val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
      val expected = (0 until h2).map(y => w2.toLong * ((id + 2 * y) % 256)).sum +
        w2.toLong * h2 * ((id * 7) % 256 + (id * 13) % 256)
      assert(resized(id).width == w2 && resized(id).height == h2)
      assert(resized(id).pixel_sum == expected,
        s"id=$id: got ${resized(id).pixel_sum}, want $expected")
    }
  }

  test("decodeImages reads real JPEG bytes too (dimensions survive lossy roundtrip)") {
    // payload produced by a DIFFERENT encoder path than synthesizeImages:
    // the decoder is format-agnostic ImageIO, not a PNG-only shortcut
    val img = new java.awt.image.BufferedImage(9, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val ds = Seq(Multimodal.EncodedImage(42L, out.toByteArray, "image/jpeg")).toDS()
    val d = Multimodal.decodeImages(ds).collect().head
    assert(d.media_id == 42L && d.width == 9 && d.height == 4)
    assert(d.pixel_sum == 0L) // black stays black under JPEG
  }

  test("resize truncates or zero-pads to the target width") {
    val out = Multimodal.resize(media, targetBytes = 5)
      .select($"media_id", $"payload_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(1L).length == 5 && new String(out(1L), "UTF-8") == "hello")
    assert(out(2L).length == 5 && out(2L).drop(3).forall(_ == 0))
  }

  test("synthesized WAVs are real RIFF files and decode to the analytic sample sum") {
    // id 2100 is chosen so the 16-bit ramp WRAPS inside the clip (a =
    // 31·2100 = 65100; wrap at i = ceil(436/7) = 63 < 300) — the wrap
    // branch of the closed-form oracle is exercised, not just the ramp
    val cases = Seq((1L, 50), (2L, 200), (3L, 1), (2100L, 300))
    val enc = Multimodal.synthesizeAudio(cases.toDF("id", "n"), "id", $"n")
    enc.collect().foreach { e =>
      assert(new String(e.payload.take(4), "US-ASCII") == "RIFF",
        s"media ${e.media_id} is not a RIFF/WAVE file")
    }
    val dec = Multimodal.decodeAudio(enc).collect().map(a => a.media_id -> a).toMap
    for ((id, n) <- cases) {
      val expect = (0 until n).map(i => ((id * 31 + 7L * i) % 65536) - 32768).sum
      assert(dec(id).sample_rate == 8000)
      assert(dec(id).n_samples == n, s"id $id: ${dec(id).n_samples} != $n")
      assert(dec(id).sample_sum == expect, s"id $id sum")
    }
  }

  test("audio frame features match the analytic ramp per frame (sum_sq, zero crossings, short tail)") {
    // n=350 spans two full 160-sample frames + a 30-sample tail;
    // id=1054 starts at (1054·31 mod 65536) = 32674, 94 below the sign
    // boundary, so frame 0 contains the negative→positive flip at i=14
    val cases = Seq((1L, 350), (1054L, 400), (42L, 100))
    val enc = Multimodal.synthesizeAudio(cases.toDF("id", "n"), "id", $"n")
    val got = Multimodal.audioFrameFeatures(enc, frameSize = 160).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    var sawCrossing = false
    for ((id, n) <- cases) {
      def v(i: Int): Long = ((id * 31 + 7L * i) % 65536) - 32768
      val nFrames = (n + 159) / 160
      for (f <- 0 until nFrames) {
        val idx = (f * 160) until math.min(n, f * 160 + 160)
        val expSq = idx.map(i => v(i) * v(i)).sum
        val expZc = idx.drop(1).count(i => (v(i) >= 0) != (v(i - 1) >= 0))
        val a = got((id, f))
        assert(a.n == idx.size, s"($id,$f) n")
        assert(a.sum_sq == expSq, s"($id,$f) sum_sq ${a.sum_sq} != $expSq")
        assert(a.zero_crossings == expZc, s"($id,$f) zc ${a.zero_crossings} != $expZc")
        if (expZc > 0) sawCrossing = true
      }
    }
    assert(sawCrossing, "no frame exercised the zero-crossing branch")
  }
}
