package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks most recent right row at/before left time") {
    val events = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, 1L, ts("2024-01-01 09:30:00")),
      (8L, 1L, ts("2024-01-01 11:00:00")),
      (9L, 1L, ts("2024-01-01 13:00:00")), // after both events
      (10L, 2L, ts("2024-01-01 09:30:00")) // after event 102
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Relational.asOfJoin(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate", "event_id", "o_orderkey")
      .select("event_id", "o_orderkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(100L -> 7L, 101L -> 8L)) // 102 has no order at/before
  }

  test("as-of join tie-break is deterministic on rightTieBreak desc") {
    val ev = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val or = Seq(
      (5L, 1L, ts("2024-01-01 09:00:00")),
      (6L, 1L, ts("2024-01-01 09:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Relational.asOfJoin(ev, or, "user_id", "o_custkey",
      "ts", "o_orderdate", "event_id", "o_orderkey")
      .select("o_orderkey").as[Long].collect()
    assert(out.toSeq == Seq(6L))
  }

  test("topKPerGroup keeps exactly k rows per group in order") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0),
      ("b", 4, 5.0)
    ).toDF("g", "id", "v")
    val out = Relational.topKPerGroup(df, Seq("g"), Seq($"v".desc, $"id"), k = 2)
      .select("g", "id").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 2), ("a", 3), ("b", 4)))
  }

  test("saltedAgg equals the direct aggregation (decomposable aggregates)") {
    val li = graft.engine.Tables.read(spark, sf0001, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"), max("l_extendedprice").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    val salted = Relational.saltedAgg(
      li, Seq("l_returnflag"), saltBuckets = 16,
      aggs = Seq(
        ("sq", sum, (c: org.apache.spark.sql.Column) => sum(c)),
        ("n", (c: org.apache.spark.sql.Column) => count(c), (c: org.apache.spark.sql.Column) => sum(c)),
        ("mx", (c: org.apache.spark.sql.Column) => max(c), (c: org.apache.spark.sql.Column) => max(c))
      ),
      valueCols = Seq("l_quantity", "l_quantity", "l_extendedprice")
    ).collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    assert(salted == direct)
  }

  test("topKPerGroup plans a WindowGroupLimit (no full per-group materialization)") {
    val li = graft.engine.Tables.read(spark, sf0001, "lineitem")
    val plan = Relational.topKPerGroup(li, Seq("l_returnflag"),
      Seq($"l_extendedprice".desc, $"l_orderkey"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"missing WindowGroupLimit:\n$plan")
  }

  test("distributed prefix sum equals the naive global-window running sum") {
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val naive = docs.withColumn("cum",
      sum($"n").over(org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val dist = Relational.prefixSum(docs, "doc_id", "n", "cum", numPartitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dist == naive)
  }

  test("prefix sum windows on partition ids, never a full-data single partition") {
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
      .select($"doc_id", lit(1L).as("n"))
    val plan = Relational.prefixSum(docs, "doc_id", "n", "cum")
      .queryExecution.executedPlan.toString
    // the big window must be partitioned by __pid (parallel scan); the
    // only unpartitioned window runs over the numPartitions-row totals
    assert(plan.contains("windowspecdefinition(__pid"),
      s"per-partition scan window missing:\n$plan")
  }

  test("distributed global rank equals the naive global-window row_number") {
    // ties in the leading key across range boundaries: n_chars has heavy
    // collisions, so the doc_id tie-break is load-bearing
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars")
    val naive = docs.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy($"n_chars", $"doc_id")))
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val dist = Relational.globalRank(docs, Seq($"n_chars", $"doc_id"), "r",
      numPartitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dist == naive)
  }

  test("global rank windows on partition ids, never a full-data single partition") {
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars")
    val plan = Relational.globalRank(docs, Seq($"n_chars", $"doc_id"), "r")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"),
      s"per-partition rank window missing:\n$plan")
  }

  test("grouped rank equals the naive per-group window row_number") {
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val naive = docs.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"n_chars", $"doc_id")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("r").toLong).toMap
    val dist = Relational.groupedRank(docs, Seq("lang"),
      Seq($"n_chars", $"doc_id"), "r", numPartitions = 7)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("r")).toMap
    assert(dist == naive)
    // both offset arms agree: the default (r22) collects the per-(pid,
    // group) counts and computes driver-side integer offsets into a local
    // relation; offsetBroadcastLimit = 0 forces the distributed
    // checkpoint + window + SHUFFLE_HASH arm — same ranks bit-for-bit
    val shuffledArm = Relational.groupedRank(docs, Seq("lang"),
      Seq($"n_chars", $"doc_id"), "r", numPartitions = 7,
      offsetBroadcastLimit = 0L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("r")).toMap
    assert(shuffledArm == naive, "offset gate arms diverge")
  }

  test("intervalJoin matches brute-force overlap on random intervals (property)") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      // lengths straddle the bin width: some intervals span many bins,
      // some none-boundary cases (end exactly on a boundary, adjacency)
      val as = (1L to 60L).map(i => (i, rnd.nextInt(2000).toLong,
        1L + rnd.nextInt(300))).map { case (i, s, len) => (i, s, s + len) }
      val bs = (1L to 40L).map(i => (i, rnd.nextInt(2000).toLong,
        1L + rnd.nextInt(150))).map { case (i, s, len) => (i, s, s + len) }
      val expected = (for {
        (ai, as1, ae) <- as; (bi, bs1, be) <- bs
        if as1 < be && bs1 < ae
      } yield (ai, bi) -> (math.min(ae, be) - math.max(as1, bs1))).toMap
      val got = Relational.intervalJoin(
          as.toDF("id", "s", "e"), bs.toDF("id", "s", "e"),
          "id", "s", "e", "id", "s", "e", binWidth = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected,
        s"trial $trial: ${got.size} vs ${expected.size}; " +
          s"missing=${(expected.keySet -- got.keySet).take(3)} " +
          s"extra=${(got.keySet -- expected.keySet).take(3)}")
    }
  }

  test("nearestIntervalJoin matches brute-force closest-within on random intervals (property)") {
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 3) {
      val as = (1L to 50L).map(i => { val s = rnd.nextInt(3000).toLong; (i, s, s + 1 + rnd.nextInt(50)) })
      val bs = (1L to 30L).map(i => { val s = rnd.nextInt(3000).toLong; (i, s, s + 1 + rnd.nextInt(200)) })
      val maxDist = 400L
      def dist(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
        math.max(0L, math.max(b._2 - a._3, a._2 - b._3))
      val expected = as.flatMap { a =>
        val cands = bs.map(b => (b._1, dist(a, b))).filter(_._2 <= maxDist)
        if (cands.isEmpty) None
        else Some(a._1 -> cands.minBy(c => (c._2, c._1)))
      }.toMap
      val got = Relational.nearestIntervalJoin(
          as.toDF("id", "s", "e"), bs.toDF("id", "s", "e"),
          "id", "s", "e", "id", "s", "e", maxDist, binWidth = 128)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expected,
        s"trial $trial: ${got.size} vs ${expected.size}; " +
          s"diff=${(expected.toSet diff got.toSet).take(3)} | ${(got.toSet diff expected.toSet).take(3)}")
    }
  }

  test("intervalJoin plans a hash join on bins, never a nested loop") {
    val a = spark.range(100).selectExpr("id", "id * 10 AS s", "id * 10 + 25 AS e")
    val b = spark.range(50).selectExpr("id", "id * 17 AS s", "id * 17 + 40 AS e")
    val plan = Relational.intervalJoin(a, b, "id", "s", "e", "id", "s", "e", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"bin join not shuffled-hash:\n$plan")
  }

  test("datasetMix is invariant to upstream partitioning (unique order column)") {
    // the two-phase ranged rank must produce the SAME mix no matter how
    // the input happens to be partitioned — the reproducibility contract
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
    val quotas = Map("src0" -> 17, "src1" -> 9, "src2" -> 23)
    def mix(parts: Int) = Relational.datasetMix(
        docs.repartition(parts), "source", "doc_id", quotas)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = mix(3); val b = mix(7); val c = mix(32)
    assert(a == b && b == c, s"mix depends on partitioning: ${a.size}/${b.size}/${c.size}")
    assert(a.size == quotas.values.sum)
  }

  test("sequence packing: contiguous offsets, budget respected at chunk starts") {
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 500L))
      .toDF("doc_id", "n")
    val out = Relational.packSequences(docs, "doc_id", $"n", budget = 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // cumulative starts: 0, 300, 600, 700 with budget 512
    assert(out == Map(
      1L -> (0L, 0L),     // starts at token 0   -> seq 0 offset 0
      2L -> (0L, 300L),   // starts at token 300 -> seq 0 offset 300
      3L -> (1L, 88L),    // starts at token 600 -> seq 1 offset 88
      4L -> (1L, 188L)))  // starts at token 700 -> seq 1 offset 188
  }

  test("hashSplit: fraction honored, content-stable, edges exact") {
    val ids = (1L to 4000L).toDF("doc_id")
    val split = Relational.hashSplit(ids, "doc_id", trainFrac = 0.75)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val frac = split.values.count(_ == "train").toDouble / split.size
    assert(math.abs(frac - 0.75) < 0.03, s"train fraction $frac")
    // content-stable: the assignment is a function of the id alone —
    // shuffled order, different partitioning, and a grown corpus all
    // reproduce it (the property seeded rand() lacks)
    val grown = (1L to 8000L).toDF("doc_id").repartition(7)
    val again = Relational.hashSplit(grown, "doc_id", trainFrac = 0.75)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    split.foreach { case (id, s) => assert(again(id) == s, s"id $id flipped") }
    // edges: 1.0 -> everything train (the 5-hex-digit threshold corner),
    // 0.0 -> everything val
    assert(Relational.hashSplit(ids, "doc_id", 1.0)
      .filter($"split" =!= "train").count() == 0)
    assert(Relational.hashSplit(ids, "doc_id", 0.0)
      .filter($"split" =!= "val").count() == 0)
  }

  test("temperatureSample: α=0.5 rates per stratum, cap branch, gate paths equal") {
    // skewed strata: a dominates, b is mid, c is rare enough that its
    // rate caps at 1.0 (the thr >= 65536 literal-true branch)
    val rows = (1L to 8000L).map(i => (i, "a")) ++
      (8001L to 11000L).map(i => (i, "b")) ++
      (11001L to 11050L).map(i => (i, "c"))
    val df = rows.toDF("doc_id", "stratum")
    val kept = Relational.temperatureSample(df, "stratum", "doc_id", baseFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byS = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // expected rates: a = 0.5 (anchor), b = 0.5*sqrt(8000/3000) ≈ 0.8165,
    // c = min(1, 0.5*sqrt(160)) = 1.0 — every c row survives
    assert(math.abs(byS("a").toDouble / 8000 - 0.5) < 0.03, s"a kept ${byS("a")}")
    assert(math.abs(byS("b").toDouble / 3000 - 0.8165) < 0.03, s"b kept ${byS("b")}")
    assert(byS("c") == 50, s"capped stratum lost rows: ${byS("c")}")
    // the rare stratum is RELATIVELY upweighted — that's the point of
    // temperature sampling: kept share ∝ √count, not count
    assert(byS("c").toDouble / 50 > byS("a").toDouble / 8000)
    // both gate paths produce the identical kept set
    val shuffled = Relational.temperatureSample(df, "stratum", "doc_id",
        baseFrac = 0.5, rateBroadcastLimit = 0L)
      .collect().map(r => r.getLong(0)).toSet
    assert(shuffled == kept.map(_._1).toSet, "broadcast vs SHUFFLE_HASH paths differ")
    // column order is preserved through the rate join-back
    assert(Relational.temperatureSample(df, "stratum", "doc_id")
      .columns.toSeq == Seq("doc_id", "stratum"))
  }

  test("epochShuffle: partition-independent total order, seed-reshuffled permutation, heap-planned head") {
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
      .select("doc_id").localCheckpoint(true)
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      Relational.epochShuffle(df, "doc_id", seed)
        .orderBy(col("epoch_key"), col("doc_id"))
        .collect().map(_.getLong(0)).toSeq
    val base = order(docs, 42L)
    // the property rand(seed) lacks: the SAME order from any partitioning
    assert(order(docs.repartition(7), 42L) == base,
      "epoch order changed with the partition layout")
    assert(order(docs.coalesce(1), 42L) == base,
      "epoch order changed with the partition count")
    // an epoch is a permutation: every row exactly once
    assert(base.sorted == docs.collect().map(_.getLong(0)).toSeq.sorted)
    // another seed is a DIFFERENT permutation of the same rows
    val other = order(docs, 43L)
    assert(other != base && other.sorted == base.sorted,
      "seed change must reshuffle, not resample")
    // the epoch head must plan as per-partition heaps, not a global sort
    val headPlan = Relational.epochShuffle(docs, "doc_id", 42L)
      .orderBy(col("epoch_key"), col("doc_id")).limit(50)
      .queryExecution.executedPlan.toString
    assert(headPlan.contains("TakeOrderedAndProject"),
      s"epoch head lost the heap plan:\n$headPlan")
  }
}
