package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads as opaque `binary` columns + typed metadata structs. IMAGE
  * decode is REAL (JDK `javax.imageio`: [[synthesizeImages]] /
  * [[decodeImages]], oracle-checked) and so is AUDIO (JDK
  * `javax.sound.sampled` WAV/PCM: [[synthesizeAudio]] /
  * [[decodeAudio]], closed-form oracle); VIDEO frame extraction remains
  * a deterministic fake (no video codec in the JDK) — there the
  * Spark-side contract (schema, batch shape, partition-parallel
  * execution, spill-free projection) is the tested part.
  *
  * At 100 TB the rules this module encodes: payloads travel as `binary`
  * inside the row (never driver-collected), per-item work is a map-side
  * projection or `mapPartitions` (no shuffle), and derived features are
  * small fixed-width arrays so downstream shuffles carry KBs not MBs.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = false)
  ))

  /** Wrap any (id, text) table into the media shape — payload = UTF-8
    * bytes standing in for an encoded image/audio blob. */
  def asMedia(df: DataFrame, idCol: String, textCol: String, mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(mime).as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).as("width"),
        lit(1).as("height"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("duration_ms")
      ).as("meta")
    )

  /** STUB decode→feature-extract: a real pipeline would decode the codec
    * and emit model features; the deterministic fake is a 16-bin byte
    * histogram, normalized — same shape (fixed-width float array), same
    * execution profile (pure projection, codegen, no shuffle). The hot
    * loop is the [[graft.functions.ByteHistogram]] codegen expression
    * (the HOF formulation interpreted hex-decode per byte × filter per
    * bin — 40× slower under the noop bench, PERF.md finding 9). */
  def featurize(df: DataFrame, payloadCol: String = "payload", bins: Int = 16): DataFrame =
    df.withColumn("features",
      graft.functions.MediaFunctions.byteHistogram(col(payloadCol), bins))

  /** Decoder handle stub: a real pipeline holds a codec/model handle that
    * is EXPENSIVE to open (native lib, GPU context) — the contract this
    * stub preserves is per-partition initialization, not per-row. */
  private class StubDecoder {
    def decode(payload: Array[Byte], bins: Int): Array[Float] = {
      val hist = new Array[Float](bins)
      if (payload == null || payload.isEmpty) return hist
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) * bins / 256) += 1f
        i += 1
      }
      var b = 0
      while (b < bins) { hist(b) /= payload.length; b += 1 }
      hist
    }
  }

  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** The `mapPartitions` shape for multimodal work (the Scala analog of a
    * pandas batch UDF): the decoder is constructed ONCE per partition and
    * amortized over its rows, rows stream through an iterator (no
    * partition-wide materialization), and the output is a typed Dataset.
    * This is the pattern to swap a real image/audio codec into — only
    * `StubDecoder.decode` changes. */
  def featurizePartitions(df: DataFrame, bins: Int = 16): Dataset[MediaFeatures] = {
    val session = df.sparkSession
    import session.implicits._
    df.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val decoder = new StubDecoder // per-partition init (expensive IRL)
        rows.map { r =>
          MediaFeatures(r.getLong(0), decoder.decode(r.getAs[Array[Byte]](1), bins))
        }
      }
  }

  final case class EncodedImage(media_id: Long, payload: Array[Byte], mime: String)
  final case class DecodedImage(media_id: Long, width: Int, height: Int, pixel_sum: Long)

  /** Deterministic PNG synthesis: one real encoded image per row, sized
    * by `widthCol`/`heightCol`, filled with a vertical gradient keyed on
    * the id — red = (id + y) mod 256 per pixel row, green = 7·id mod 256,
    * blue = 13·id mod 256. The POINT of the gradient: every decoded
    * property (width, height, Σ(r+g+b) over pixels) has a closed form,
    * so a SQL oracle can check a REAL ImageIO decode without being able
    * to decode PNG itself. `ImageIO.write` runs per row inside
    * `mapPartitions` — encoded bytes never touch the driver. */
  def synthesizeImages(df: DataFrame, idCol: String,
                       widthCol: Column, heightCol: Column): Dataset[EncodedImage] = {
    val session = df.sparkSession
    import session.implicits._
    df.select(col(idCol).cast("long"), widthCol.cast("int"), heightCol.cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = ((id * 7) % 256).toInt; val b = ((id * 13) % 256).toInt
          var y = 0
          while (y < h) {
            val red = ((id + y) % 256).toInt
            val rgb = (red << 16) | (g << 8) | b
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          EncodedImage(id, out.toByteArray, "image/png")
        }
      }
  }

  /** REAL image decode (JDK `javax.imageio` — PNG/JPEG/GIF/BMP, no extra
    * deps): bytes → pixels → oracle-checkable scalars (width, height,
    * Σ(r+g+b)). Same batch shape as [[featurizePartitions]]: stream rows
    * through `mapPartitions`, emit small fixed-width outputs so anything
    * downstream shuffles KBs. PNG is lossless, so the pixel sum is exact
    * — the DuckDB oracle predicts it in closed form for the
    * [[synthesizeImages]] gradient. */
  def decodeImages(ds: Dataset[EncodedImage]): Dataset[DecodedImage] = {
    val session = ds.sparkSession
    import session.implicits._
    ds.mapPartitions { imgs =>
      imgs.map { e =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(e.payload))
        require(img != null, s"undecodable payload for media_id=${e.media_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        DecodedImage(e.media_id, w, h, sum)
      }
    }
  }

  /** REAL image resize: decode, nearest-neighbor downsample by integer
    * `factor` (sample pixel (fx, fy) — deterministic, unlike area
    * filters, so the [[synthesizeImages]] gradient keeps a closed-form
    * oracle after resizing), re-encode PNG. Same mapPartitions batch
    * shape as [[decodeImages]]; output dims are ⌈w/f⌉ × ⌈h/f⌉. */
  def resizeImages(ds: Dataset[EncodedImage], factor: Int): Dataset[EncodedImage] = {
    require(factor >= 1, "factor must be >= 1")
    val session = ds.sparkSession
    import session.implicits._
    ds.mapPartitions { imgs =>
      imgs.map { e =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(e.payload))
        require(src != null, s"undecodable payload for media_id=${e.media_id}")
        val (w2, h2) = ((src.getWidth + factor - 1) / factor,
          (src.getHeight + factor - 1) / factor)
        val dst = new java.awt.image.BufferedImage(
          w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) { dst.setRGB(x, y, src.getRGB(x * factor, y * factor)); x += 1 }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        EncodedImage(e.media_id, out.toByteArray, e.mime)
      }
    }
  }

  final case class EncodedAudio(media_id: Long, payload: Array[Byte], mime: String)
  final case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Int,
                                sample_sum: Long)

  /** Deterministic WAV synthesis (the audio analog of
    * [[synthesizeImages]]): one REAL RIFF/WAVE file per row — PCM-16
    * mono 8 kHz little-endian, written by JDK `javax.sound.sampled`
    * (no external codec needed for WAV). Sample i of media `id` is
    * `((id·31 + 7·i) mod 65536) − 32768`, so every decoded property
    * (sample count, Σ samples) has a closed form a SQL oracle can
    * predict without parsing WAV. Encoded bytes never touch the
    * driver. */
  def synthesizeAudio(df: DataFrame, idCol: String, nSamplesCol: Column,
                      sampleRate: Int = 8000): Dataset[EncodedAudio] = {
    val session = df.sparkSession
    import session.implicits._
    df.select(col(idCol).cast("long"), nSamplesCol.cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, n) = (r.getLong(0), r.getInt(1))
          val bytes = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (((id * 31 + 7L * i) % 65536) - 32768).toShort
            bytes(2 * i) = (s & 0xff).toByte          // little-endian lo
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            sampleRate.toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          EncodedAudio(id, out.toByteArray, "audio/wav")
        }
      }
  }

  /** REAL audio decode (JDK `javax.sound.sampled`): WAV bytes → PCM
    * frames → oracle-checkable scalars (rate, count, Σ signed samples).
    * Same mapPartitions batch shape as [[decodeImages]]; PCM is
    * lossless, so the sample sum is exact for the [[synthesizeAudio]]
    * ramp and the DuckDB oracle predicts it in closed form. */
  /** Shared WAV-decode preamble: one place owns the format contract
    * (PCM-16 mono little-endian) and returns (sampleRate, raw PCM
    * bytes) — [[decodeAudio]] and [[audioFrameFeatures]] both read
    * through it, so a format change can't silently diverge. */
  private def readPcm16(e: EncodedAudio): (Int, Array[Byte]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(e.payload))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"unexpected format $fmt for media_id=${e.media_id}")
    val data = in.readAllBytes()
    in.close()
    (fmt.getSampleRate.toInt, data)
  }

  /** Sample i of a little-endian PCM-16 buffer, sign-extended. */
  private def pcm16Sample(data: Array[Byte], i: Int): Int =
    (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff))).toShort.toInt

  def decodeAudio(ds: Dataset[EncodedAudio]): Dataset[DecodedAudio] = {
    val session = ds.sparkSession
    import session.implicits._
    ds.mapPartitions { auds =>
      auds.map { e =>
        val (rate, data) = readPcm16(e)
        val n = data.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          sum += pcm16Sample(data, i)
          i += 1
        }
        DecodedAudio(e.media_id, rate, n, sum)
      }
    }
  }

  final case class AudioFrameFeatures(media_id: Long, frame_idx: Int,
                                      n: Int, sum_sq: Long, zero_crossings: Int)

  /** REAL audio frame features (the standard VAD/speech front-end pass):
    * decode WAV → PCM, cut into `frameSize`-sample frames, and emit per
    * frame the sample count, Σ sample² (integer-exact — RMS derives as
    * √(sum_sq/n) without any engine-dependent float aggregation), and
    * the within-frame zero-crossing count (sign flips between adjacent
    * samples; frame-boundary pairs belong to no frame). Same
    * mapPartitions batch shape as [[decodeAudio]] — one decoded buffer
    * per row, frames emitted as rows, bytes never on the driver. For the
    * [[synthesizeAudio]] ramp every output is closed-form, so the DuckDB
    * oracle regenerates the PCM arithmetically and hash-checks all four
    * columns. */
  def audioFrameFeatures(ds: Dataset[EncodedAudio],
                         frameSize: Int = 160): Dataset[AudioFrameFeatures] = {
    val session = ds.sparkSession
    import session.implicits._
    ds.mapPartitions { auds =>
      auds.flatMap { e =>
        val (_, data) = readPcm16(e)
        val n = data.length / 2
        val nFrames = (n + frameSize - 1) / frameSize
        (0 until nFrames).map { f =>
          val start = f * frameSize
          val end = math.min(n, start + frameSize)
          var sumSq = 0L
          var zc = 0
          var prev = 0 // rolling previous sample — no per-iteration re-decode
          var i = start
          while (i < end) {
            val v = pcm16Sample(data, i)
            sumSq += v.toLong * v
            if (i > start && ((v >= 0) != (prev >= 0))) zc += 1
            prev = v
            i += 1
          }
          AudioFrameFeatures(e.media_id, f, end - start, sumSq, zc)
        }
      }
    }
  }

  /** STUB frame-sample: take every `stride`-th byte as a stand-in for
    * frame extraction from a video payload; emits (media_id, frame_idx,
    * frame) rows via posexplode — the real op has the same generator
    * shape with a codec call in the lambda. */
  def frameSample(df: DataFrame, stride: Int): DataFrame = {
    val n = octet_length(col("payload"))
    val frames = transform(
      sequence(lit(1), greatest((n / stride).cast("int"), lit(1))),
      k => substring(col("payload"), ((k - 1) * stride + 1).cast("int"), lit(stride))
    )
    df.select(col("media_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
  }

  /** STUB resize: truncate/pad the payload to `targetBytes` — stands in
    * for image resize; preserves the binary-in/binary-out contract. */
  def resize(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("payload_resized",
      rpad(substring(col("payload"), 1, targetBytes), targetBytes, Array[Byte](0)))

  private def rpad(c: Column, len: Int, pad: Array[Byte]): Column =
    org.apache.spark.sql.functions.rpad(c, len, pad)
}
