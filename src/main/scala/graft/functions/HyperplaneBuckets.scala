package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All LSH table buckets of a vector in ONE pass: for each of `tables`
  * hash tables, the packed sign-bit signature against `planesPerTable`
  * hyperplanes (bit p set ⟺ vec·plane[t][p] > 0).
  *
  * Why one expression rather than `planesPerTable × tables` dot-product
  * expressions: 48+ independent VecDot instances each re-cast the vector
  * and emit their own loop — measured 2.5× slower than the HOF baseline
  * from codegen bloat alone. Here the plane matrix is a single flat
  * `double[]` reference object and the vector is traversed float-native
  * (no array<double> cast, no per-plane allocation); the generated code
  * is one 3-deep loop nest per row.
  *
  * `planes` layout: `[(t*planesPerTable + p)*dim + i]`.
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Double],
                             tables: Int, planesPerTable: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = math.min(dim, x.numElements())
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var s = 0.0
        var i = 0
        while (i < m) {
          val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          s += xi * planes(base + i)
          i += 1
        }
        if (s > 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      // every local gets a fresh name: two instances of this expression in
      // one whole-stage-codegen method must not redeclare the same variable
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p"); val base = ctx.freshName("base")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $m = java.lang.Math.min($dim, $x.numElements());
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $planesPerTable; $p++) {
         |    int $base = ($t * $planesPerTable + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $m; $i++) $s += ((double) $x.$getter($i)) * $mat[$base + $i];
         |    if ($s > 0) $bucket |= (1 << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column wrapper: per-table packed bucket ids as array<int>. */
  def buckets(vec: Column, planes: Array[Double], tables: Int,
              planesPerTable: Int, dim: Int): Column =
    ColumnShim.column(HyperplaneBuckets(ColumnShim.expression(vec),
      planes, tables, planesPerTable, dim))
}
