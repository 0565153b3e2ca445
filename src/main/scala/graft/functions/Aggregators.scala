package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** C22: typed UDAF surface — custom aggregations as `Aggregator[IN, BUF,
  * OUT]`, registered for untyped DataFrame use via `functions.udaf`.
  * The buffer is a flat case class, so partial aggregation (map-side
  * combine) works exactly like a built-in: BUF flows through the shuffle,
  * not rows. */
object Aggregators {

  final case class GeoMeanBuf(var sumLn: Double, var n: Long)

  /** Geometric mean of positive values (NaN on empty input) — the classic
    * "not built into SQL engines" aggregate. */
  object GeometricMean extends Aggregator[Double, GeoMeanBuf, Double] {
    override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
    override def reduce(b: GeoMeanBuf, a: Double): GeoMeanBuf = {
      if (a > 0) { b.sumLn += math.log(a); b.n += 1 }
      b
    }
    override def merge(x: GeoMeanBuf, y: GeoMeanBuf): GeoMeanBuf = {
      x.sumLn += y.sumLn; x.n += y.n; x
    }
    override def finish(b: GeoMeanBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
    override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped column form usable in `df.groupBy(...).agg(...)`. */
  def geoMean(c: Column): Column = udaf(GeometricMean).apply(c)
}
