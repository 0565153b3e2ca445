package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Multi-probe LSH buckets of a vector in one pass (Lv et al., VLDB'07,
  * restricted to SINGLE-bit perturbations): for each of `tables` hash
  * tables, the exact packed signature followed by the `extra` buckets
  * reached by flipping the lowest-|margin| sign bits — the planes whose
  * dot product sits nearest zero, i.e. where a true neighbor most
  * likely landed on the other side. Output is a flat
  * `tables * (1 + extra)` int array; element `e` belongs to table
  * `e / (1 + extra)` (the in-plan analog of [[HyperplaneBuckets]]'
  * posexplode-position-is-table contract).
  *
  * Deliberately NOT the full perturbation-set heap the single-query
  * serve probe runs on driver margins ([[graft.ops.Similarity
  * .perturbationSets]]): multi-bit sets need a priority queue per row,
  * which has no codegen shape — while the q cheapest SINGLE flips are a
  * bounded selection loop. The sets agree exactly until the heap's
  * cheapest multi-bit set (|m₁|+|m₂|) undercuts the (q+1)-th single
  * margin, which at the small `extra` the occupancy sizing wants makes
  * the single-bit form the right in-plan trade. Ties on |margin| break
  * by LOWEST plane index (strict `<` selection), so the output is
  * deterministic and spec-comparable against the driver arithmetic.
  *
  * `extra` is clamped to `planesPerTable` (there are only that many
  * single flips); `extra = 0` degenerates to [[HyperplaneBuckets]] with
  * a stride-1 layout. One expression, not tables×extra dot products —
  * the same codegen-bloat argument as [[HyperplaneBuckets]].
  *
  * `planes` layout: `[(t*planesPerTable + p)*dim + i]`.
  */
case class HyperplaneBucketsMulti(child: Expression, planes: Array[Double],
                                  tables: Int, planesPerTable: Int, dim: Int,
                                  extra: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets_multi"

  private def q: Int = math.min(extra, planesPerTable)
  private def stride: Int = 1 + q

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = math.min(dim, x.numElements())
    val out = new Array[Int](tables * stride)
    val margin = new Array[Double](planesPerTable)
    val used = new Array[Boolean](planesPerTable)
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
        margin(p) = if (s < 0) -s else s
        used(p) = false
        p += 1
      }
      out(t * stride) = bucket
      var j = 0
      while (j < q) {
        var best = -1
        var p2 = 0
        while (p2 < planesPerTable) {
          if (!used(p2) && (best < 0 || margin(p2) < margin(best))) best = p2
          p2 += 1
        }
        used(best) = true
        out(t * stride + 1 + j) = bucket ^ (1 << best)
        j += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val qv = q; val strideV = stride
    nullSafeCodeGen(ctx, ev, x => {
      // every local gets a fresh name: two instances of this expression in
      // one whole-stage-codegen method must not redeclare the same variable
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val margin = ctx.freshName("margin"); val used = ctx.freshName("used")
      val t = ctx.freshName("t"); val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p"); val base = ctx.freshName("base")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val best = ctx.freshName("best")
      val p2 = ctx.freshName("p2")
      s"""
         |int $m = java.lang.Math.min($dim, $x.numElements());
         |int[] $out = new int[${tables * strideV}];
         |double[] $margin = new double[$planesPerTable];
         |boolean[] $used = new boolean[$planesPerTable];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $planesPerTable; $p++) {
         |    int $base = ($t * $planesPerTable + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $m; $i++) $s += ((double) $x.$getter($i)) * $mat[$base + $i];
         |    if ($s > 0) $bucket |= (1 << $p);
         |    $margin[$p] = ($s < 0) ? -$s : $s;
         |    $used[$p] = false;
         |  }
         |  $out[$t * $strideV] = $bucket;
         |  for (int $j = 0; $j < $qv; $j++) {
         |    int $best = -1;
         |    for (int $p2 = 0; $p2 < $planesPerTable; $p2++) {
         |      if (!$used[$p2] && ($best < 0 || $margin[$p2] < $margin[$best])) $best = $p2;
         |    }
         |    $used[$best] = true;
         |    $out[$t * $strideV + 1 + $j] = $bucket ^ (1 << $best);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsMulti =
    copy(child = newChild)
}

object HyperplaneBucketsMulti {
  /** Column wrapper: flat `tables * (1 + min(extra, planesPerTable))`
    * bucket array; element `e` belongs to table `e / (1 + extra)`. */
  def buckets(vec: Column, planes: Array[Double], tables: Int,
              planesPerTable: Int, dim: Int, extra: Int): Column =
    ColumnShim.column(HyperplaneBucketsMulti(ColumnShim.expression(vec),
      planes, tables, planesPerTable, dim, extra))
}
