package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Property tests for the plan-hash cache key (SURVEY.md §5.2 item 3).
  * The reference canonicalized SQL text by lowercasing unquoted tokens and
  * SORTING whitespace-split condition tokens (`app/main.py:78-86`) — which
  * collides distinct queries sharing a token multiset. Catalyst plan
  * canonicalization must honor the sound equivalences (AND commutativity,
  * keyword/identifier case) and reject the unsound one. */
class CanonicalizationSpec extends SparkSpec {

  private lazy val lineitem = Tables.read(spark, sf0001, "lineitem")

  private def planHash(df: DataFrame): Int =
    df.queryExecution.analyzed.canonicalized.semanticHash()

  private val predicates = Seq(
    "l_quantity > 30", "l_returnflag = 'R'", "l_discount <= 0.05",
    "l_partkey % 10 = 3", "l_shipdate >= TIMESTAMP '1995-06-01'"
  )

  test("AND-permutations of the same predicates produce the same plan hash") {
    (2 to predicates.length).foreach { k =>
      val preds = predicates.take(k)
      val base = planHash(lineitem.filter(expr(preds.mkString(" AND "))))
      preds.permutations.take(6).foreach { p =>
        assert(planHash(lineitem.filter(expr(p.mkString(" AND ")))) == base,
          s"permutation ${p.mkString(" AND ")} hashed differently")
      }
    }
  }

  test("keyword/identifier case does not change the hash; literal case does") {
    val a = planHash(lineitem.filter(expr("l_returnflag = 'R' AND l_quantity > 30")))
    val b = planHash(lineitem.filter(expr("L_RETURNFLAG = 'R' and L_QUANTITY > 30")))
    val c = planHash(lineitem.filter(expr("l_returnflag = 'r' AND l_quantity > 30")))
    assert(a == b)
    assert(a != c)
  }

  test("the reference's token-sort collision is NOT reproduced (distinct literals differ)") {
    // 'a=1 AND b=2' vs 'a=2 AND b=1' sort to the same token multiset in
    // the reference; semantically they differ and must hash differently
    val x = planHash(lineitem.filter(expr("l_partkey = 1 AND l_suppkey = 2")))
    val y = planHash(lineitem.filter(expr("l_partkey = 2 AND l_suppkey = 1")))
    assert(x != y)
  }

  test("projection column order is semantic: different order => different plan") {
    val p = planHash(lineitem.selectExpr("l_orderkey", "l_quantity"))
    val q = planHash(lineitem.selectExpr("l_quantity", "l_orderkey"))
    assert(p != q)
  }
}
