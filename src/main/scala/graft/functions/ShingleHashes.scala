package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The Jaccard signature build — word n-gram shingles of a token array,
  * 64-bit-hashed, DEDUPED and SORTED ascending — fused into one pass.
  *
  * Replaces a 4-stage HOF chain (`arrays_zip` of slices → `concat_ws`
  * lambda → `xxhash64` lambda → `sort_array` → `array_distinct`) whose
  * lambdas evaluate interpretively per element (PERF.md finding 1). The
  * hash value is internal to the similarity join (query outputs carry
  * only doc ids and Jaccard values; the DuckDB oracle shingles strings),
  * so only distinctness matters, not which 64-bit hash function — XXH64
  * over the space-joined token bytes, seed 42.
  *
  * The sorted-ascending output contract is what
  * [[SortedIntersectCount]] and the prefix-filter join rely on. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  // input must be array<string> (the tokens wrapper casts)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.sortedHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.ShingleHashes.sortedHashes($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L

  /** One pass per row: for each of the (len−n+1) shingles, hash the
    * space-joined token bytes; sort; dedup in place. Static so generated
    * code calls it with one JVM invocation per row. */
  def sortedHashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val count = len - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    // materialize token bytes once (each token participates in up to n shingles)
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      val t = tokens.getUTF8String(i)
      toks(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    val out = new Array[Long](count)
    var s = 0
    while (s < count) {
      var size = n - 1 // separators
      var j = 0
      while (j < n) { size += toks(s + j).length; j += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val t = toks(s + j)
        System.arraycopy(t, 0, buf, pos, t.length)
        pos += t.length
        j += 1
      }
      out(s) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, size, Seed)
      s += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place (sorted): distinct shingle SET semantics
    var w = 1
    i = 1
    while (i < count) {
      if (out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == count) out else java.util.Arrays.copyOf(out, w))
  }

  /** Column wrapper: sorted distinct 64-bit shingle hashes of a token
    * array. */
  def sortedShingleHashes(tokens: Column, n: Int): Column =
    ColumnShim.column(ShingleHashes(ColumnShim.expression(tokens.cast("array<string>")), n))
}
