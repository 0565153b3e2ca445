package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Normalized `bins`-bin histogram of a binary payload's byte values —
  * the hot loop of [[graft.ops.Multimodal.featurize]] as a single codegen
  * pass over the bytes.
  *
  * Why not HOFs: the `transform(sequence(1, n), …)` formulation decodes
  * each byte through hex/conv interpretively and then runs `bins` filter
  * lambdas over the decoded array — measured 14.7s for the sf0.1 corpus
  * under the noop bench (PERF.md finding 9). This expression is one tight
  * loop per row inside whole-stage codegen, identical in semantics to the
  * per-partition [[graft.ops.Multimodal]] StubDecoder (`(b & 0xff) * bins
  * / 256`, float-normalized), so the two featurize paths stay
  * bit-for-bit interchangeable.
  */
case class ByteHistogram(child: Expression, bins: Int) extends UnaryExpression {

  // input must be binary: the MediaFunctions wrapper casts
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val h = new Array[Float](bins)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) * bins / 256) += 1f; i += 1 }
      var b = 0
      while (b < bins) { h(b) /= bytes.length; b += 1 }
    }
    new GenericArrayData(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val h = ctx.freshName("hist")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |float[] $h = new float[$bins];
         |int $n = $bytes.length;
         |if ($n > 0) {
         |  for (int $i = 0; $i < $n; $i++) { $h[(($bytes[$i]) & 0xff) * $bins / 256] += 1f; }
         |  for (int $i = 0; $i < $bins; $i++) { $h[$i] /= $n; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

/** Column-level entry point. */
object MediaFunctions {
  def byteHistogram(payload: Column, bins: Int): Column =
    ColumnShim.column(ByteHistogram(ColumnShim.expression(payload.cast("binary")), bins))
}
