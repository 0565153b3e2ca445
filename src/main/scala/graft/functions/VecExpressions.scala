package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding arithmetic (SURVEY.md §4.3
  * item 2: "cosine/dot-product Expression with codegen, if UDF proves
  * slow" — it did).
  *
  * Why not `aggregate(zip_with(...))`: Spark evaluates higher-order-
  * function lambdas interpretively, per element, with closure allocation —
  * a 64-dim cosine via HOFs costs ~3 lambda chains × 64 elements per row.
  * These expressions compile to a tight `for` loop over `ArrayData`
  * inside whole-stage codegen: one virtual call per array, not per
  * element. Inputs implicitly cast to array<double>, so float embeddings
  * are widened BEFORE multiplication — bit-identical to the DuckDB oracle
  * (`CAST(unnest(embedding) AS DOUBLE)`), which a float-multiply fast
  * path would not be.
  *
  * Array-element nulls are not expected in embedding data and read as 0.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double>: the VecFunctions wrappers cast
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // every local gets a fresh name: two instances of this expression in
      // one whole-stage-codegen method must not redeclare the same variable
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $x.getDouble($i) * $y.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** One-pass cosine similarity: dot, |a|², |b|² in a single loop — replaces
  * three HOF aggregates per comparison. NaN when either norm is zero
  * (matching `dot/(sqrt(na)*sqrt(nb))`). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double>: the VecFunctions wrappers cast
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // every local gets a fresh name (see SortedIntersectCount) — two
      // CosineSim instances in one codegen method redeclared `i`/`n` and
      // dropped c14_ann_topk's stage to interpreted mode (caught round 5)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two long-array signatures agree (MinHash
  * signature agreement) — one codegen loop instead of
  * `size(filter(zip_with(...)))`, which interprets three lambda chains
  * per comparison. */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<bigint> (minhash signatures)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "array_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // every local gets a fresh name (see SortedIntersectCount)
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) { if ($x.getLong($i) == $y.getLong($i)) $c++; }
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED long arrays (shingle-hash signatures)
  * via a two-pointer merge — one codegen loop per pair, replacing the
  * posting-list pair groupBy that shuffled every co-posting row. Inputs
  * MUST be sorted ascending (the jaccard pipeline sorts at signature
  * build time). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements(); val n2 = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n1 && j < n2) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // every local gets a fresh name: two instances of this expression in
      // one whole-stage-codegen method must not redeclare the same variable
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $n1 = $x.numElements(), $n2 = $y.numElements();
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VecFunctions {
  private def d(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnShim.expression(c.cast("array<double>"))
  def vecDot(a: Column, b: Column): Column = ColumnShim.column(VecDot(d(a), d(b)))
  def cosineSim(a: Column, b: Column): Column = ColumnShim.column(CosineSim(d(a), d(b)))
  def arrayEqCount(a: Column, b: Column): Column =
    ColumnShim.column(ArrayEqCount(ColumnShim.expression(a), ColumnShim.expression(b)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnShim.column(SortedIntersectCount(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Make the native expressions callable from SQL text
    * (`SELECT cosine_sim(a, b) FROM ...`). */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def asD(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
    ColumnShim.registerFunction(spark, "vec_dot",
      args => VecDot(asD(args(0)), asD(args(1))))
    ColumnShim.registerFunction(spark, "cosine_sim",
      args => CosineSim(asD(args(0)), asD(args(1))))
    ColumnShim.registerFunction(spark, "array_eq_count",
      args => ArrayEqCount(args(0), args(1)))
    ColumnShim.registerFunction(spark, "sorted_intersect_count",
      args => SortedIntersectCount(args(0), args(1)))
    // text-signature expressions: SQL callers pass token arrays
    // (split(text, ' ')); integer literals fold to Int via eval
    def asStrArr(e: Expression): Expression =
      Cast(e, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    def litInt(e: Expression): Int = {
      // foldable check mirrors date_parse's: a non-literal arg would
      // otherwise surface as an NPE/ClassCastException at plan time
      require(e.foldable, "integer argument must be a literal")
      e.eval(null).asInstanceOf[Number].intValue()
    }
    ColumnShim.registerFunction(spark, "shingle_hashes",
      args => ShingleHashes(asStrArr(args(0)), litInt(args(1))))
    ColumnShim.registerFunction(spark, "rolling_token_hash",
      args => RollingTokenHash(asStrArr(args(0))))
    ColumnShim.registerFunction(spark, "simhash_bits",
      args => SimhashBits(asStrArr(args(0))))
    ColumnShim.registerFunction(spark, "minhash_from_hashes",
      args => MinhashFromHashes(args(0), litInt(args(1))))
    ColumnShim.registerFunction(spark, "winnow_fingerprints",
      args => WinnowFingerprints(
        Cast(args(0), org.apache.spark.sql.types.StringType),
        litInt(args(1)), litInt(args(2))))
  }
}
