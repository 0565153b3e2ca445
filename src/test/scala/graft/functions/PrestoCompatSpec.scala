package graft.functions

import graft.SparkSpec

class PrestoCompatSpec extends SparkSpec {

  test("Presto aliases resolve in SQL with Presto semantics") {
    PrestoCompat.register(spark)
    val row = spark.sql(
      """SELECT strpos('hello world', 'o w') AS p,
                strpos('hello', 'zz') AS missing,
                json_extract_scalar('{"k": 87, "s": "x"}', '$.k') AS k,
                cardinality(array(1, 2, 3)) AS card""").collect().head
    assert(row.getInt(0) == 5)
    assert(row.getInt(1) == 0)
    assert(row.getString(2) == "87")
    assert(row.getInt(3) == 3)
  }

  test("approx_distinct aggregates like approx_count_distinct") {
    PrestoCompat.register(spark)
    graft.engine.Tables.read(spark, sf0001, "lineitem")
      .createOrReplaceTempView("li_presto")
    val Array(a, b) = spark.sql(
      """SELECT approx_distinct(l_partkey), approx_count_distinct(l_partkey)
         FROM li_presto""").collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(a == b)
  }

  test("date_parse translates MySQL %-formats and parses like Presto") {
    PrestoCompat.register(spark)
    val r = spark.sql(
      """SELECT CAST(date_parse('2013-01-05', '%Y-%m-%d') AS STRING) AS d,
                CAST(date_parse('05/01/13 14:30:59', '%d/%m/%y %H:%i:%s') AS STRING) AS dt""")
      .collect().head
    assert(r.getString(0) == "2013-01-05 00:00:00")
    assert(r.getString(1) == "2013-01-05 14:30:59")
    // %i means MINUTES (the MySQL trap); an unknown token fails loudly
    assert(PrestoCompat.translateMySqlFormat("%H:%i:%s") == "HH:mm:ss")
    intercept[IllegalArgumentException] { PrestoCompat.translateMySqlFormat("%Q") }
    // literal letters are QUOTED for java.time: MySQL treats non-% chars
    // as literals, Java reserves all letters — an unquoted 'T' throws
    // "Unknown pattern letter", a 'D' silently parses day-of-year
    assert(PrestoCompat.translateMySqlFormat("%Y-%m-%dT%H:%i:%s") ==
      "yyyy-MM-dd'T'HH:mm:ss")
    assert(PrestoCompat.translateMySqlFormat("%Y%%D") == "yyyy'%D'")
    val iso = spark.sql(
      """SELECT CAST(date_parse('2013-01-05T14:30:59',
                                '%Y-%m-%dT%H:%i:%s') AS STRING) AS t""")
      .collect().head.getString(0)
    assert(iso == "2013-01-05 14:30:59")
    // non-literal format is rejected at plan time, not silently mis-parsed
    val err = intercept[Exception] {
      spark.sql("SELECT date_parse('x', concat('%Y', rand())) ").collect()
    }
    assert(err.getMessage != null)
  }

  test("date_diff Presto spelling works through the dialect rewrite; native form untouched") {
    // SURVEY §2 B7 (round-6 verdict #6 closed): Presto's quoted unit
    // ('day') is a PARSER delta — Spark 4's grammar owns 3-arg date_diff
    // with an unquoted unit and the same truncated-elapsed semantics, and
    // rejects a string literal before the function registry is consulted,
    // so no registered shim can catch it. rewriteDialect unquotes the
    // unit lexically; QueryBuilder applies it to every raw fragment.
    assert(PrestoCompat.rewriteDialect(
      "date_diff('day', a, b) > 3 AND date_diff('HOUR', c, d) = 0") ==
      "date_diff(day, a, b) > 3 AND date_diff(HOUR, c, d) = 0")
    // whitespace before the paren is legal Presto — still rewritten
    assert(PrestoCompat.rewriteDialect("date_diff ('day', a, b)") ==
      "date_diff(day, a, b)")
    // the native 2-arg form's quoted DATE first arg never matches
    assert(PrestoCompat.rewriteDialect("date_diff('2024-03-01', d)") ==
      "date_diff('2024-03-01', d)")
    // idempotent (already-unquoted stays put)
    assert(PrestoCompat.rewriteDialect("date_diff(day, a, b)") ==
      "date_diff(day, a, b)")
    // quote-aware (round-7 advisor): a date_diff SPELLING inside a string
    // literal is content — only the real call outside the literal rewrites
    assert(PrestoCompat.rewriteDialect(
      "note = 'see date_diff(''day'', x) docs' AND date_diff('day', a, b) > 1") ==
      "note = 'see date_diff(''day'', x) docs' AND date_diff(day, a, b) > 1")
    assert(PrestoCompat.rewriteDialect("msg LIKE '%date_diff(''hour'', t)%'") ==
      "msg LIKE '%date_diff(''hour'', t)%'")
    // Spark's backslash escape must not flip the literal parity: the
    // genuine call AFTER the \'-carrying literal still rewrites
    assert(PrestoCompat.rewriteDialect(
      "note = 'don\\'t' AND date_diff('day', a, b) > 1") ==
      "note = 'don\\'t' AND date_diff(day, a, b) > 1")
    val r = spark.sql(PrestoCompat.rewriteDialect(
      """SELECT date_diff(DATE'2024-03-01', DATE'2024-02-01') AS native_days,
                date_diff('day', DATE'2024-02-01', DATE'2024-03-01') AS presto_days,
                date_diff('hour', TIMESTAMP'2024-02-01 06:30:00',
                          TIMESTAMP'2024-02-01 09:15:00') AS presto_hours"""))
      .collect().head
    assert(r.getInt(0) == 29)
    assert(r.getLong(1) == 29L)
    // elapsed COMPLETE hours, truncated — 2h45m -> 2 (Presto semantics)
    assert(r.getLong(2) == 2L)
  }

  test("the reference's documented condition runs verbatim through the builder") {
    // postman_collection.json:180-199 shape, transposed to testdata columns
    val g = graft.engine.Graft(spark, sf0001,
      java.nio.file.Files.createTempDirectory("graft-pc").toString,
      partitionColumn = "l_returnflag")
    try {
      PrestoCompat.register(spark)
      val id = g.submit("lineitem", "R", "l_orderkey, l_partkey",
        Some("l_orderkey = 5 AND l_linenumber = 2"))
      assert(g.awaitQuery(id) == graft.engine.QueryService.Succeeded)
    } finally g.close()
  }
}
