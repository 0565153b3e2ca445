package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** IVF cell assignment: the `nprobe` nearest centroids (squared-L2) of a
  * vector, in one pass over the centroid matrix — the coarse-quantizer
  * step of an IVF ANN index as a single codegen'd expression (same
  * pattern as [[HyperplaneBuckets]]: flat matrix reference object, float-
  * native vector reads, no per-centroid expression objects).
  *
  * `centroids` layout: `[c*dim + i]`; returns array<int> of cell ids,
  * nearest first.
  */
case class NearestCells(child: Expression, centroids: Array[Double],
                        cells: Int, dim: Int, nprobe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = math.min(dim, x.numElements())
    val np = math.min(nprobe, cells)
    val bestId = Array.fill(np)(-1)
    val bestD = Array.fill(np)(Double.MaxValue)
    var c = 0
    while (c < cells) {
      var d = 0.0
      var i = 0
      val base = c * dim
      while (i < m) {
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xi - centroids(base + i)
        d += diff * diff
        i += 1
      }
      // insertion into the nprobe-sized best list
      var j = np - 1
      if (d < bestD(j)) {
        while (j > 0 && bestD(j - 1) > d) {
          bestD(j) = bestD(j - 1); bestId(j) = bestId(j - 1); j -= 1
        }
        bestD(j) = d; bestId(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      // every local gets a fresh name: two instances of this expression in
      // one whole-stage-codegen method must not redeclare the same variable
      val m = ctx.freshName("m"); val np = ctx.freshName("np")
      val bestId = ctx.freshName("bestId"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val base = ctx.freshName("base"); val i = ctx.freshName("i")
      val diff = ctx.freshName("diff"); val j = ctx.freshName("j")
      s"""
         |int $m = java.lang.Math.min($dim, $x.numElements());
         |int $np = java.lang.Math.min($nprobe, $cells);
         |int[] $bestId = new int[$np];
         |double[] $bestD = new double[$np];
         |java.util.Arrays.fill($bestId, -1);
         |java.util.Arrays.fill($bestD, Double.MAX_VALUE);
         |for (int $c = 0; $c < $cells; $c++) {
         |  double $d = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $diff = ((double) $x.$getter($i)) - $mat[$base + $i];
         |    $d += $diff * $diff;
         |  }
         |  int $j = $np - 1;
         |  if ($d < $bestD[$j]) {
         |    while ($j > 0 && $bestD[$j - 1] > $d) {
         |      $bestD[$j] = $bestD[$j - 1]; $bestId[$j] = $bestId[$j - 1]; $j--;
         |    }
         |    $bestD[$j] = $d; $bestId[$j] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestId);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def nearestCells(vec: Column, centroids: Array[Double], cells: Int,
                   dim: Int, nprobe: Int): Column =
    ColumnShim.column(NearestCells(ColumnShim.expression(vec),
      centroids, cells, dim, nprobe))
}
