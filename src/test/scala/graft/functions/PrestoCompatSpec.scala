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

  test("date_diff delta documented: native 2-arg form preserved, Presto 3-arg = timestampdiff") {
    // SURVEY §2 B7: Presto's date_diff(unit, start, end) is deliberately
    // NOT shimmed — Spark 4 ships a native 2-arg date_diff(end, start)
    // and shadowing it would silently change native queries. The
    // documented migration for Presto callers is timestampdiff(unit,
    // start, end); pin that both forms agree on the same interval.
    PrestoCompat.register(spark)
    val r = spark.sql(
      """SELECT date_diff(DATE'2024-03-01', DATE'2024-02-01') AS native_days,
                timestampdiff(DAY, DATE'2024-02-01', DATE'2024-03-01') AS presto_equiv""")
      .collect().head
    assert(r.getInt(0) == 29)
    assert(r.getLong(1) == 29L)
    // and the Presto 3-arg spelling fails loudly instead of mis-binding
    intercept[Exception] {
      spark.sql("SELECT date_diff('day', DATE'2024-02-01', DATE'2024-03-01')").collect()
    }
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
