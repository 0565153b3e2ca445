package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization (LLM-pipeline memory lever): symmetric int8
  * per-vector quantization — 4× smaller embedding columns, which at
  * 100 TB is the difference between an in-memory ANN index and a
  * spilled one. `q = round(x * 127 / max|x|)`, scale kept alongside for
  * dequantization; cosine on dequantized vectors approximates the
  * original to ~1e-2 (spec-pinned).
  *
  * Pure `functions._` projections: the array passes (max|x|, transform)
  * are row-level and codegen-friendly; no shuffle. */
object Quantize {

  /** Adds `qvec: array<tinyint>` and `qscale: float` columns. */
  def toInt8(df: DataFrame, vecCol: String): DataFrame = {
    val absMax = array_max(transform(col(vecCol), x => abs(x)))
    df
      .withColumn("qscale", (absMax / lit(127.0)).cast("float"))
      .withColumn("qvec",
        transform(col(vecCol), x =>
          when(col("qscale") === 0f, lit(0))
            .otherwise(round(x / col("qscale")).cast("int"))
            .cast("tinyint")))
  }

  /** Reconstruct an approximate float vector from (qvec, qscale). */
  def dequantize(qvec: Column, qscale: Column): Column =
    transform(qvec, q => (q.cast("float") * qscale))
}
