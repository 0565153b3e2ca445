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
}
