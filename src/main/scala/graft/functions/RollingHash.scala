package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-sensitive 64-bit rolling hash of a token array — the document
  * fingerprint — fused into one codegen loop.
  *
  * Bit-for-bit equivalent to the HOF chain
  * `aggregate(tokens, 0L, (acc, w) => xxhash64(acc, w))` (pinned by
  * TextSpec "rolling hash matches the HOF xxhash64 chain"), but the HOF
  * form evaluates its lambda interpretively per token with closure
  * allocation (PERF.md finding 1; measured 0.20 → 0.98 s on
  * `c15_fingerprint` when it slipped in). Spark's `xxhash64(acc, w)`
  * folds seed 42 → hashLong(acc) → hashUTF8String(w); this loop chains
  * the same two static calls per token, so existing fingerprints are
  * unchanged. */
case class RollingTokenHash(child: Expression) extends UnaryExpression {

  // input must be array<string> (the Text.fingerprint wrapper casts)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_token_hash"

  override def nullSafeEval(input: Any): Any =
    RollingTokenHash.roll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.RollingTokenHash.roll($arr);")

  override protected def withNewChildInternal(newChild: Expression): RollingTokenHash =
    copy(child = newChild)
}

object RollingTokenHash {
  // xxhash64's default seed (Spark XxHash64 expression)
  private val Seed = 42L

  /** acc' = xxhash64(acc, token): seed 42 hashes the long acc, the result
    * seeds the token-bytes hash. A null token is skipped by Spark's
    * xxhash64 (the acc half still folds) — mirrored here, though
    * `split()` never yields nulls. Static so generated code is one JVM
    * call per row. */
  def roll(tokens: ArrayData): Long = {
    val len = tokens.numElements()
    var acc = 0L
    var i = 0
    while (i < len) {
      val seeded = XXH64.hashLong(acc, Seed)
      val t = tokens.getUTF8String(i)
      acc = if (t == null) seeded else XXH64.hashUTF8String(t, seeded)
      i += 1
    }
    acc
  }

  /** Column wrapper: rolling fingerprint of a token array. */
  def rollingTokenHash(tokens: Column): Column =
    ColumnShim.column(RollingTokenHash(ColumnShim.expression(tokens.cast("array<string>"))))
}
