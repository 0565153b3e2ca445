package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads as opaque `binary` columns + typed metadata structs, with the
  * decode/feature steps STUBBED (no codec libraries in this environment)
  * behind deterministic fakes — the Spark-side contract (schema, batch
  * shape, partition-parallel execution, spill-free projection) is real.
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
