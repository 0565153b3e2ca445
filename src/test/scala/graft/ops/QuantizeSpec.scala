package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: 4x smaller element type, bounded reconstruction error") {
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    val q = Quantize.toInt8(emb, "embedding")
    assert(q.schema("qvec").dataType.simpleString == "array<tinyint>")
    val err = q.select(
      max(abs(
        Similarity.cosine(col("embedding"), col("embedding")) -
          Similarity.cosine(Quantize.dequantize(col("qvec"), col("qscale")), col("embedding"))
      )).as("max_err")
    ).collect().head.getDouble(0)
    assert(err < 0.02, s"cosine drift after int8 roundtrip: $err")
  }

  test("cosine top-k on quantized vectors matches exact top-k almost everywhere") {
    val emb = Quantize.toInt8(graft.engine.Tables.read(spark, sf0001, "embeddings"), "embedding")
    val query = emb.filter($"vec_id" === 0)
    val exact = Similarity.bruteForceTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding",
      query, "embedding", k = 10).collect().map(_.getLong(0)).toSet
    val dq = emb.withColumn("deq", Quantize.dequantize(col("qvec"), col("qscale")))
    val approx = Similarity.bruteForceTopK(
      dq.filter($"vec_id" =!= 0), "vec_id", "deq",
      dq.filter($"vec_id" === 0), "deq", k = 10).collect().map(_.getLong(0)).toSet
    assert((exact intersect approx).size >= 8, s"top-10 overlap too low: $exact vs $approx")
  }

  test("zero vector quantizes without division blowup") {
    val df = Seq((1L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val row = Quantize.toInt8(df, "embedding").select("qvec", "qscale").collect().head
    assert(row.getSeq[Byte](0).forall(_ == 0) && row.getFloat(1) == 0f)
  }
}
