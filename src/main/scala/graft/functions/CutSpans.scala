package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Remove constant-width spans from a string in one compiled pass:
  * given SORTED 1-based codepoint start positions, cut every extent
  * [pos, pos + k) (overlapping extents merge implicitly via the cursor)
  * and return the concatenation of what remains — the reassembly half of
  * span-level exact-substring dedup (Lee et al., ACL'22 §4.1).
  *
  * A HOF `aggregate` spelling concatenates the accumulated string once
  * per cut position — O(cuts · len) per document, quadratic on a
  * boilerplate-heavy doc where cut density tracks fingerprint density
  * (~2/(w+1) per char). This single pass is O(len): one StringBuilder,
  * codepoint-aware cursor arithmetic (Java char indices would shear
  * supplementary chars; positions are codepoint-based to match SQL
  * `substr` on both engines). */
case class CutSpans(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "cut_spans"

  override def nullSafeEval(text: Any, starts: Any): Any =
    CutSpans.cut(text.asInstanceOf[UTF8String], starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.CutSpans.cut($t, $s, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpans =
    copy(left = newLeft, right = newRight)
}

object CutSpans {

  /** One pass: walk the sorted cut starts, copying kept codepoint runs.
    * `starts` may contain overlapping or duplicate positions (the cursor
    * merges them); every extent start is within the text by construction
    * (a selected k-gram at pos spans pos..pos+k-1 ≤ len), and the skip
    * clamps at end-of-string regardless. */
  def cut(text: UTF8String, starts: ArrayData, k: Int): UTF8String = {
    val n = starts.numElements()
    if (n == 0) return text
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var cur = 1 // 1-based codepoint cursor
    var curChar = 0 // char index of `cur`
    var i = 0
    while (i < n) {
      val p = starts.getInt(i)
      if (p > cur) { // copy the kept run [cur, p)
        val endChar = s.offsetByCodePoints(curChar, p - cur)
        sb.append(s, curChar, endChar)
        curChar = endChar
        cur = p
      }
      val skipTo = p + k
      if (skipTo > cur) { // advance past the cut extent, clamped at end
        var cps = skipTo - cur
        var c = curChar
        while (cps > 0 && c < s.length) { c = s.offsetByCodePoints(c, 1); cps -= 1 }
        curChar = c
        cur = skipTo
      }
      i += 1
    }
    sb.append(s, curChar, s.length)
    UTF8String.fromString(sb.toString)
  }

  /** Column wrapper: cut sorted k-wide codepoint spans from `text`. */
  def cutSpans(text: Column, sortedStarts: Column, k: Int): Column =
    ColumnShim.column(CutSpans(ColumnShim.expression(text.cast("string")),
      ColumnShim.expression(sortedStarts), k))
}
