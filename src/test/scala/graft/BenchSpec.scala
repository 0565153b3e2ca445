package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness-honesty spec (round-3 verdict, wrong #1): a query that throws
  * must surface in the bench JSON as an error, never be recorded as a
  * suspiciously fast timing. */
class BenchSpec extends SparkSpec {

  test("bench reports a broken query as an error, not a fast timing") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok" -> ((s, _) => s.range(100).toDF("v")),
      "broken" -> ((_, _) => sys.error("boom: deliberately failing query"))
    )
    val (json, failed) = Bench.runAll(spark, "unused", qs)
    assert(failed == 1, s"expected 1 failure, got $failed in $json")
    assert(json.contains(""""failed":1"""), json)
    assert(json.contains(""""broken":"RuntimeException: boom"""), json)
    // the healthy query still gets a numeric timing
    assert("\"ok\":\\d+\\.\\d+".r.findFirstIn(json).isDefined, json)
    // the JSON line must stay machine-parseable despite the error message
    assert(json.count(_ == '{') == json.count(_ == '}'), s"unbalanced: $json")
  }

  test("all-green run reports failed=0 and sums query times") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "a" -> ((s, _) => s.range(10).toDF("v")),
      "b" -> ((s, _) => s.range(10).selectExpr("id * 2 as w"))
    )
    val (json, failed) = Bench.runAll(spark, "unused", qs)
    assert(failed == 0)
    assert(json.contains(""""errors":{}"""), json)
    assert(json.contains(""""metric":"total""""), json)
  }

  test("driver contract: every oracle has a query, names are driver-safe, entry smokes") {
    // the driver joins oracleSql to queries BY NAME and embeds names in
    // file paths / JSON keys — an orphaned oracle or an exotic name fails
    // silently out there, so pin the contract here
    val qs = SparkEntry.queries
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val badNames = qs.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(badNames.isEmpty, s"non-driver-safe query names: $badNames")
    assert(qs.size >= 90, s"query surface shrank to ${qs.size}")
    assert(SparkEntry.entry(spark).limit(1).count() == 1, "flagship entry returned no rows")
  }
}
