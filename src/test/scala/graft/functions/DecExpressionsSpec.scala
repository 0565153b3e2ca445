package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-identity pin for [[DecDot]] against the LITERAL HOF fold it
  * replaces (r19 verdict #3 / PERF finding 40): same quantization, same
  * null propagation, same ANSI error surface — on adversarial inputs
  * (quantization ties, mixed magnitudes, null elements, length
  * mismatches, float inputs, empties). The production wiring
  * (Similarity.dotDec/normDec) is only allowed to switch because this
  * equivalence holds VALUE-FOR-VALUE. */
class DecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y).cast("decimal(18,6)")),
      lit(BigDecimal(0)).cast("decimal(28,6)"),
      (acc, z) => (acc + z).cast("decimal(28,6)"))
      .cast("double")

  private def hofNorm(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(a, x => (x.cast("double") * x.cast("double")).cast("decimal(18,6)")),
      lit(BigDecimal(0)).cast("decimal(28,6)"),
      (acc, z) => (acc + z).cast("decimal(28,6)"))
      .cast("double")

  private def compareAll(rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])],
                         tag: String): Unit = {
    val df = rows.toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val out = df.select(
      DecFunctions.decDot(col("a"), col("b")).as("fast_dot"),
      hofDot(col("a"), col("b")).as("hof_dot"),
      DecFunctions.decNorm(col("a")).as("fast_norm"),
      hofNorm(col("a")).as("hof_norm")).collect()
    out.zip(rows).zipWithIndex.foreach { case ((r, in), i) =>
      def v(j: Int): Any = if (r.isNullAt(j)) null else r.getDouble(j)
      assert(v(0) == v(1),
        s"[$tag] row $i dot diverged: fast=${v(0)} hof=${v(1)} in=$in")
      assert(v(2) == v(3),
        s"[$tag] row $i norm diverged: fast=${v(2)} hof=${v(3)} in=$in")
    }
  }

  test("random sweep across magnitude regimes matches the HOF fold value-for-value") {
    val rnd = new scala.util.Random(42)
    def arr(n: Int, scale: Double): Seq[java.lang.Double] =
      Seq.fill(n)(java.lang.Double.valueOf((rnd.nextDouble() * 2 - 1) * scale))
    val rows = (1 to 60).flatMap { _ =>
      Seq(1e-8, 1e-3, 1.0, 1e3, 1e5).map { s =>
        val n = 1 + rnd.nextInt(64)
        (arr(n, s), arr(n, s))
      }
    }
    compareAll(rows, "random")
  }

  test("quantization ties (shortest-repr .5 at the 7th decimal) round identically") {
    // products whose scaled value sits EXACTLY on .5 in shortest decimal
    // representation — the case primitive rounding must hand to the
    // exact path (positive and negative, plus near-ties a hair off)
    val ties = Seq[(Seq[java.lang.Double], Seq[java.lang.Double])](
      (Seq(1.5e-6), Seq(1.0)),
      (Seq(-1.5e-6), Seq(1.0)),
      (Seq(2.5e-6, 3.5e-6, -4.5e-6), Seq(1.0, 1.0, 1.0)),
      (Seq(0.0000015), Seq(1.0)),
      (Seq(1.4999999e-6), Seq(1.0)),
      (Seq(1.5000001e-6), Seq(1.0)),
      (Seq(12.3456785), Seq(1.0)),
      (Seq(-12.3456785), Seq(1.0)),
      (Seq(0.5e-6), Seq(1.0)),
      (Seq(-0.5e-6), Seq(1.0)))
    compareAll(ties, "ties")
  }

  test("null propagation: null elements, length mismatch, empty arrays, null arrays") {
    val rows = Seq[(Seq[java.lang.Double], Seq[java.lang.Double])](
      (Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)), // null element left
      (Seq(1.0, 2.0, 3.0), Seq(1.0, null, 3.0)), // null element right
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),       // length mismatch (zip pads null)
      (Seq(1.0, 2.0, 3.0), Seq(1.0)),            // mismatch the other way
      (Seq.empty, Seq.empty),                    // empty: fold seed → 0.0
      (Seq(0.25, -0.125), Seq(4.0, 8.0)))        // plain control
    compareAll(rows, "nulls")
    // null ARRAY inputs: both forms yield NULL
    val df = Seq((Option.empty[Seq[Double]], Option(Seq(1.0, 2.0))))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val r = df.select(
      DecFunctions.decDot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("hof")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("float input arrays widen identically on both forms") {
    val df = Seq((Seq(0.1f, 0.2f, 0.30000001f), Seq(0.3f, 0.1f, 0.7f)))
      .toDF("af", "bf")
    val cast = df.select(col("af").cast("array<double>").as("a"),
      col("bf").cast("array<double>").as("b"))
    val r = cast.select(
      DecFunctions.decDot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("hof"),
      DecFunctions.decNorm(col("a")).as("fastn"),
      hofNorm(col("a")).as("hofn")).head()
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(2) == r.getDouble(3))
  }

  test("ANSI overflow surface: a decimal(18,6)-overflowing product errors on BOTH forms") {
    assume(spark.conf.get("spark.sql.ansi.enabled", "true") == "true")
    val df = Seq((Seq(1e12), Seq(1e3))).toDF("a", "b")
    val fastBoom = intercept[Exception] {
      df.select(DecFunctions.decDot(col("a"), col("b"))).collect()
    }
    val hofBoom = intercept[Exception] {
      df.select(hofDot(col("a"), col("b"))).collect()
    }
    // both throw (ArithmeticException family, possibly wrapped by Spark)
    def isArith(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .exists(e => e.isInstanceOf[ArithmeticException] ||
          String.valueOf(e.getMessage).contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
          String.valueOf(e.getMessage).contains("DECIMAL"))
    assert(isArith(fastBoom), s"fast path error shape: $fastBoom")
    assert(isArith(hofBoom), s"hof error shape: $hofBoom")
  }
}
