package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash of a token array in one row-level pass: each token's
  * 64-bit hash votes ±1 per bit position; output bit b is set iff the
  * bit-b vote sum is positive.
  *
  * Structural win: the aggregate formulation (explode tokens → groupBy
  * doc with 64 conditional sums) shuffles the whole token stream; this is
  * a pure projection — ZERO shuffles for signature computation at any
  * corpus size. Bit-identical to the aggregate version: both hash tokens
  * with XXH64(bytes, seed 42) (Spark's `xxhash64` default seed) and use
  * the same sum>0 vote rule. */
case class SimhashBits(child: Expression) extends UnaryExpression {

  // input must be array<string> (the wrapper casts)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(v: Any): Any =
    SimhashBits.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimhashBits.simhash($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhashBits(tokens: Column): Column =
    ColumnShim.column(SimhashBits(ColumnShim.expression(tokens.cast("array<string>"))))
}
