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

  test("date_add Presto spelling and bare VARCHAR casts rewrite; Spark-native forms untouched") {
    // B7 closure audit (r19): date_add/dateadd/timestampadd are the same
    // parser delta as date_diff — quoted unit rejected before function
    // resolution — and ride the same unquoting rewrite
    assert(PrestoCompat.rewriteDialect("date_add('day', 5, ts) > x") ==
      "date_add(day, 5, ts) > x")
    assert(PrestoCompat.rewriteDialect("dateadd('HOUR', 2, ts)") ==
      "dateadd(HOUR, 2, ts)")
    // Spark's native 2-arg form: quoted first arg is a date string —
    // digits/dashes never match the alpha-only unit pattern
    assert(PrestoCompat.rewriteDialect("date_add('2024-01-01', 5)") ==
      "date_add('2024-01-01', 5)")
    // bare VARCHAR (Presto's unbounded) -> STRING; VARCHAR(n) parses in
    // Spark and stays; occurrences inside literals are content
    assert(PrestoCompat.rewriteDialect("CAST(x AS VARCHAR) = 'y'") ==
      "CAST(x AS STRING) = 'y'")
    assert(PrestoCompat.rewriteDialect("CAST(x AS varchar )") ==
      "CAST(x AS STRING)")
    assert(PrestoCompat.rewriteDialect("CAST(x AS VARCHAR(10))") ==
      "CAST(x AS VARCHAR(10))")
    assert(PrestoCompat.rewriteDialect("note = 'CAST(x AS VARCHAR)'") ==
      "note = 'CAST(x AS VARCHAR)'")
    // both passes chain on one fragment (the first pass shifts offsets —
    // the second must still be literal-aware on the REWRITTEN string)
    assert(PrestoCompat.rewriteDialect(
      "date_add('day', 1, ts) > t AND CAST(id AS VARCHAR) <> 'n'") ==
      "date_add(day, 1, ts) > t AND CAST(id AS STRING) <> 'n'")
    // end-to-end through Catalyst: Presto add semantics == interval add
    val r = spark.sql(PrestoCompat.rewriteDialect(
      """SELECT CAST(date_add('day', 29, TIMESTAMP'2024-02-01 06:30:00') AS STRING) AS d,
                CAST(dateadd('minute', 45, TIMESTAMP'2024-02-01 06:30:00') AS STRING) AS m,
                CAST(17 AS VARCHAR) AS s""")).collect().head
    assert(r.getString(0) == "2024-03-01 06:30:00")
    assert(r.getString(1) == "2024-02-01 07:15:00")
    assert(r.getString(2) == "17")
  }

  test("B7 closure: identical-semantics names resolve natively; element_at gets Presto OOB; '/' stays the documented delta") {
    PrestoCompat.register(spark)
    // the names SURVEY B7 lists that need NO shim — same name, same
    // semantics in Spark's registry (the COVERAGE.md closure table's
    // "native" rows, pinned here so the table can't decay):
    val r = spark.sql(
      """SELECT upper('ab') u, lower('AB') l, substr('hello', 2, 3) s,
                concat('a', 'b') c, concat('a', CAST(NULL AS STRING)) cn,
                length('abc') len, trim('  x  ') t,
                replace('hello', 'l') r2, replace('hello', 'l', 'L') r3,
                abs(-2) ab, round(2.567, 2) rd, floor(2.7) fl, ceil(2.1) ce,
                sqrt(4.0) sq, ln(exp(1.0)) lnx, pow(2, 10) pw,
                coalesce(NULL, 'x') co, nullif('a', 'a') nf,
                CAST('1.5' AS REAL) re, 7 % 4 md""").collect().head
    assert(r.getString(0) == "AB" && r.getString(1) == "ab")
    assert(r.getString(2) == "ell")
    assert(r.getString(3) == "ab" && r.isNullAt(4)) // concat null-propagates, like Presto
    assert(r.getInt(5) == 3 && r.getString(6) == "x")
    assert(r.getString(7) == "heo" && r.getString(8) == "heLLo") // 2-arg replace deletes
    assert(r.getInt(9) == 2 && r.getDouble(13) == 2.0)
    assert(r.getDouble(15) == 1024.0)
    assert(r.getString(16) == "x" && r.isNullAt(17))
    assert(r.getFloat(18) == 1.5f) // Presto REAL parses natively
    assert(r.getInt(19) == 3)
    // ANSI mode (the 4.x default, on here) MATCHES Presto's posture on
    // bad input — both throw on malformed casts and division by zero —
    // so the pass-through surface keeps it:
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    intercept[Exception] { spark.sql("SELECT CAST('xx' AS INTEGER)").collect() }
    intercept[Exception] { spark.sql("SELECT 7/0").collect() }
    // ...EXCEPT element_at past the array end (Presto: NULL; Spark ANSI:
    // throw) — the registered shim restores Presto's contract for
    // SQL-parsed fragments:
    val e = spark.sql(
      """SELECT element_at(array(1, 2), 5) oob,
                element_at(array(1, 2), 2) ok,
                element_at(map('a', 1), 'z') mmiss""").collect().head
    assert(e.isNullAt(0) && e.getInt(1) == 2 && e.isNullAt(2))
    // the ONE unshimmable semantic delta, pinned so the closure table's
    // claim stays true: Presto's int/int '/' truncates (7/2 = 3), Spark's
    // always divides as double (7/2 = 3.5; the remedy is DIV). A lexical
    // rewrite can't fix it — operand types are unknowable pre-analysis.
    assert(spark.sql("SELECT 7/2 AS d").collect().head.getDouble(0) == 3.5)
    assert(spark.sql("SELECT 7 DIV 2 AS d").collect().head.getLong(0) == 3L)
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
