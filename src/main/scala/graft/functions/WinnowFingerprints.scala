package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MOSS winnowing fingerprint selection (Schleimer et al., SIGMOD'03)
  * fused into one compiled pass: md5-prefix hash per k-char gram, sliding
  * minimum over every w-hash window (monotone deque, O(len) comparisons),
  * distinct selected minima out.
  *
  * Replaces a two-stage HOF chain (`transform(sequence…)` of md5 grams →
  * `transform` of `array_min(slice(…))` windows) that evaluated
  * interpretively per element — measured 75 s for 500 docs at sf0.01
  * (PERF.md finding 23): higher-order lambdas run outside whole-stage
  * codegen, and the inlined gram-hash array re-evaluates under the window
  * lambda, turning O(len·w) into O(len²) md5 calls.
  *
  * The hash is the FIRST 16 HEX CHARS OF MD5 — not XXH64 like the other
  * signature expressions — deliberately: the window minimum is an order
  * statistic over the hash values, so the DuckDB oracle can only mirror
  * the selection if both engines order the same hashes; md5 hex is the
  * total order both share. Internally the comparisons run on the
  * digest's first 8 bytes as ONE unsigned long (hex lexicographic order
  * IS big-endian digest order — the nibble→char map is monotone and the
  * strings are equal-length), hex materializing only for the emitted
  * fingerprints; the text's UTF-8 bytes encode once and each gram
  * digests a byte range (r19 verdict #2 — the per-gram hex String was
  * measured as v5's x400 GC tail). One MessageDigest instance per
  * thread, reused across grams and rows. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  // input must be a string column (the wrapper casts)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.WinnowFingerprints.fingerprints($str, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** The emitted format: 16 lowercase hex chars of the digest's first 8
    * bytes — the same value as `substring(md5(s), 1, 16)` in Spark SQL
    * and DuckDB, materialized from the compared LONG only for SELECTED
    * fingerprints (r19 verdict #2: the per-gram hex String was the v5
    * x400 GC tail — nGrams × (char[16] + String) allocations whose only
    * job was an order comparison the long already answers). */
  private def hex16(h: Long): String = {
    val out = new Array[Char](16)
    var i = 0
    while (i < 16) {
      out(i) = HexChars(((h >>> ((15 - i) * 4)) & 0xfL).toInt)
      i += 1
    }
    new String(out)
  }

  /** Per-gram hash as the digest's first 8 bytes, big-endian, compared
    * UNSIGNED: 16-char lowercase hex strings order exactly like their
    * big-endian byte values (the nibble→hex-char map is monotone and all
    * compared strings are equal-length), so the window minimum over
    * longs selects the SAME gram the hex comparison selected — oracle
    * format and selection unchanged, zero per-gram allocation. The
    * text's UTF-8 bytes encode ONCE; per-gram work is one digest over a
    * byte range (gram boundaries are codepoint boundaries, so the range
    * bytes equal the substring's bytes). */
  private def gramHashes(s: String, k: Int, nCp: Int, nGrams: Int): Array[Long] = {
    // byte offset of each codepoint boundary: one linear scan; after
    // String decode the text holds only valid code points (malformed
    // input already replaced), so the arithmetic length matches getBytes
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bAt = new Array[Int](nCp + 1)
    var ci = 0
    var cp = 0
    var bo = 0
    while (cp < nCp) {
      bAt(cp) = bo
      val c = s.codePointAt(ci)
      bo += (if (c < 0x80) 1 else if (c < 0x800) 2
             else if (c < 0x10000) 3 else 4)
      ci += Character.charCount(c)
      cp += 1
    }
    bAt(nCp) = bo
    val md = digest.get()
    val d = new Array[Byte](16)
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, bAt(i), bAt(i + k) - bAt(i))
      md.digest(d, 0, 16)
      hs(i) =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      i += 1
    }
    hs
  }

  /** One pass per row: gram hashes over CODEPOINT-based substrings —
    * matching SQL substr semantics on both engines (Spark `substr` and
    * DuckDB `substr` count codepoints; Java's String.substring counts
    * UTF-16 code units, which splits surrogate pairs on non-BMP text and
    * would silently diverge from the oracle) — then sliding-window minima
    * via a monotone deque, set dedup. Static so generated code calls it
    * with one JVM invocation per row. */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val nCp = s.codePointCount(0, s.length)
    val nGrams = nCp - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val hs = gramHashes(s, k, nCp, nGrams)
    // monotone deque of candidate-minimum indices, ascending hash order
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nGrams) {
      while (tail > head &&
        java.lang.Long.compareUnsigned(hs(deque(tail - 1)), hs(i)) >= 0) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1 // left edge fell out of window
      if (i >= w - 1) selected.add(hs(deque(head)))
      i += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = UTF8String.fromString(hex16(it.next().longValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: distinct winnowed fingerprints of a text column. */
  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowFingerprints(ColumnShim.expression(text.cast("string")), k, w))

  /** Selected fingerprint OCCURRENCES: the same deque walk as
    * [[fingerprints]], but keeping the distinct selected gram INDICES
    * (1-based codepoint start positions) instead of the distinct hash
    * set — the input span-level dedup needs (a fingerprint's extent is
    * the k codepoints starting at its position). The deque pops equal
    * hashes on arrival, so the selected index of a window is the
    * RIGHTMOST minimal gram — mirrored in SQL as max(i) over the grams
    * attaining the window min. */
  def positionedFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val nCp = s.codePointCount(0, s.length)
    val nGrams = nCp - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val hs = gramHashes(s, k, nCp, nGrams)
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    val selected = new java.util.LinkedHashSet[Integer]()
    var i = 0
    while (i < nGrams) {
      while (tail > head &&
        java.lang.Long.compareUnsigned(hs(deque(tail - 1)), hs(i)) >= 0) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(deque(head))
      i += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) {
      val idx = it.next().intValue()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(hex16(hs(idx))), idx + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: selected (fp, pos) occurrences of a text column. */
  def winnowPos(text: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowPositions(ColumnShim.expression(text.cast("string")), k, w))
}

/** [[WinnowFingerprints]] with positions: array<struct<fp:string,pos:int>>
  * of the distinct selected window-minimum gram occurrences (pos = the
  * 1-based codepoint start of the k-gram, so its extent is
  * [pos, pos + k)). Same compiled single pass. */
case class WinnowPositions(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_positions"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.positionedFingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.WinnowFingerprints.positionedFingerprints($str, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowPositions =
    copy(child = newChild)
}
