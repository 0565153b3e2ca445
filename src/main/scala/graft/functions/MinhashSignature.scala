package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Full k-permutation MinHash signature of a shingle set in ONE row-level
  * pass: for each string element, one xxhash64 of its bytes, then k
  * cheap long-rehashes (`XXH64.hashLong(h, perm)`), tracking k minima.
  *
  * Structural win over the aggregate formulation (explode → shuffle →
  * groupBy with k min-aggregates): the signature becomes a pure
  * projection — no posting-list materialization, no shuffle at all until
  * the LSH band join. At 100 TB that's the difference between shuffling
  * the corpus×shingles posting list and shuffling one signature row per
  * document. */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  // input: array<string> (shingles); output: array<bigint> length k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var p = 0
      while (p < k) {
        val hp = XXH64.hashLong(h, p)
        if (hp < sig(p)) sig(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // every local gets a fresh name: two instances of this expression in
      // one whole-stage-codegen method must not redeclare the same variable
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val p = ctx.freshName("p")
      val hp = ctx.freshName("hp")
      s"""
         |int $n = $x.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $x.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $p = 0; $p < $k; $p++) {
         |    long $hp = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, (long) $p);
         |    if ($hp < $sig[$p]) $sig[$p] = $hp;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** MinHash signature from PRE-HASHED shingles (the [[ShingleHashes]]
  * output): same k-permutation scheme, minus the per-string hashing —
  * bit-identical to [[MinhashSignature]] over the same shingle strings
  * because both use XXH64(bytes, seed 42) as the base hash. */
case class MinhashFromHashes(child: Expression, k: Int)
    extends UnaryExpression {

  // input: array<bigint> (shingle hashes); output: array<bigint> length k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var p = 0
      while (p < k) {
        val hp = XXH64.hashLong(h, p)
        if (hp < sig(p)) sig(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val h = ctx.freshName("h"); val hp = ctx.freshName("hp")
      s"""
         |int $n = $x.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $x.getLong($i);
         |  for (int $p = 0; $p < $k; $p++) {
         |    long $hp = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, (long) $p);
         |    if ($hp < $sig[$p]) $sig[$p] = $hp;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashFromHashes =
    copy(child = newChild)
}

object MinhashSignature {
  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnShim.column(MinhashSignature(ColumnShim.expression(shingles), k))
  def minhashFromHashes(hashes: Column, k: Int): Column =
    ColumnShim.column(MinhashFromHashes(ColumnShim.expression(hashes), k))
}
