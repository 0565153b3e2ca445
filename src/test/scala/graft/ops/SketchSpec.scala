package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C8: HLL++ estimates are implementation-specific (no SQL oracle), so
  * accuracy is pinned here against exact counts. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct lands within the configured rsd of exact") {
    val li = graft.engine.Tables.read(spark, sf0001, "lineitem")
    val rows = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx02"),
      approx_count_distinct(col("l_partkey"), 0.1).as("approx10")
    ).collect().head
    val exact = rows.getLong(0).toDouble
    assert(math.abs(rows.getLong(1) - exact) / exact < 0.05,
      s"rsd=0.02 estimate ${rows.getLong(1)} vs exact $exact")
    assert(math.abs(rows.getLong(2) - exact) / exact < 0.25,
      s"rsd=0.1 estimate ${rows.getLong(2)} vs exact $exact")
  }

  test("approx_percentile lands within the accuracy bound of exact") {
    // GK sketch guarantee: rank error <= n/accuracy. At accuracy=1000 the
    // estimate's RANK is within 0.1% of target — compare by rank, not
    // value (value distance depends on the local density)
    val orders = graft.engine.Tables.read(spark, sf0001, "orders")
    val n = orders.count().toDouble
    for (q <- Seq(0.5, 0.9)) {
      val row = orders.agg(
        expr(s"approx_percentile(o_totalprice, $q, 1000)").as("approx"),
        expr(s"percentile(o_totalprice, $q)").as("exact")).collect().head
      val approx = row.getDouble(0)
      // rank of the approximate answer in the real distribution
      val rank = orders.filter(col("o_totalprice") <= approx).count() / n
      assert(math.abs(rank - q) <= 0.01 + 1000.0 / n,
        s"q=$q: approx=$approx sits at rank $rank")
    }
  }

  test("estimates are deterministic (same input => same sketch)") {
    val li = graft.engine.Tables.read(spark, sf0001, "lineitem")
    def est() = li.agg(approx_count_distinct(col("l_suppkey")).as("e"))
      .collect().head.getLong(0)
    assert(est() == est())
  }

  test("misra-gries guarantees hold under distributed merges (skewed stream)") {
    import spark.implicits._
    // 3000 "hot" + 1000 "warm" + 6000 distinct singletons: n = 10000,
    // m = 10 => error bound n/(m+1) = 909, so hot (3000) and warm (1000)
    // MUST survive any merge order; estimates never exceed the truth and
    // never undershoot by more than the bound. repartition(7) forces
    // partial sketches + merges.
    val items = Seq.fill(3000)("hot") ++ Seq.fill(1000)("warm") ++
      (1 to 6000).map(i => s"rare_$i")
    val df = items.toDF("word").repartition(7)
    val out = df
      .agg(graft.functions.Aggregators.heavyHitters(col("word"), 10).as("hh"))
      .select(explode(expr("arrays_zip(hh.items, hh.counts)")).as("z"))
      .select(col("z.items"), col("z.counts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = 10000L / 11
    assert(out.size <= 10, s"more than m counters survived: ${out.size}")
    for ((item, truth) <- Seq("hot" -> 3000L, "warm" -> 1000L)) {
      assert(out.contains(item), s"$item (freq $truth > $bound) missing: $out")
      assert(out(item) <= truth, s"$item overestimated: ${out(item)} > $truth")
      assert(out(item) >= truth - bound,
        s"$item undershot the MG bound: ${out(item)} < ${truth - bound}")
    }
    // no singleton can out-survive the error bound
    out.keys.foreach(k => assert(k == "hot" || k == "warm" || out(k) <= bound,
      s"rare item $k kept an estimate above the bound: ${out(k)}"))
  }
}
