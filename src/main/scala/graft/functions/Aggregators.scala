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

  final case class MgBuf(var counters: Map[String, Long])
  final case class MgOut(items: Seq[String], counts: Seq[Long])

  /** C8: Misra-Gries heavy-hitters sketch (Misra & Gries 1982; merge rule
    * from Agarwal et al., "Mergeability of Summaries", PODS'12) — the
    * frequent-items companion to HLL (distincts) and GK (quantiles): at
    * most `m` counters, O(m) driver-held state per group, MERGEABLE, so
    * partial aggregation folds map-side like any built-in.
    *
    * Guarantees (n = stream length): every item with true frequency
    * > n/(m+1) is present, and for any tracked item
    * `true − n/(m+1) ≤ est ≤ true`. Estimates depend on merge order
    * (partitioning), so the registered query is rows-only; SketchSpec
    * pins the guarantees, which hold under EVERY merge order. */
  final case class MisraGries(m: Int) extends Aggregator[String, MgBuf, MgOut] {
    override def zero: MgBuf = MgBuf(Map.empty)

    private def decrement(c: Map[String, Long], by: Long): Map[String, Long] =
      c.view.mapValues(_ - by).filter(_._2 > 0).toMap

    override def reduce(b: MgBuf, a: String): MgBuf = {
      val c = b.counters
      b.counters =
        if (c.contains(a)) c.updated(a, c(a) + 1L)
        else if (c.size < m) c.updated(a, 1L)
        else decrement(c, 1L) // the classic all-counter decrement
      b
    }

    override def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val summed = y.counters.foldLeft(x.counters) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      x.counters =
        if (summed.size <= m) summed
        else {
          // keep the m largest; subtract the (m+1)-th largest count from
          // every survivor (the PODS'12 merge — error adds, never resets)
          val cut = summed.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(m)
          decrement(summed, cut)
        }
      x
    }

    override def finish(b: MgBuf): MgOut = {
      // (count desc, item) order: stable output for a given sketch state
      val sorted = b.counters.toSeq.sortBy { case (k, v) => (-v, k) }
      MgOut(sorted.map(_._1), sorted.map(_._2))
    }
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgOut] = Encoders.product[MgOut]
  }

  /** Untyped column form: heavy-hitter sketch of a string column. */
  def heavyHitters(c: Column, m: Int): Column =
    udaf(MisraGries(m), Encoders.STRING).apply(c)
}
