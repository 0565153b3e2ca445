package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.types.TimestampType

class CatalogSpec extends SparkSpec {

  test("listTables enumerates the testdata star schema") {
    val c = new Catalog(spark, sf0001)
    assert(c.listTables() == Seq("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier"))
  }

  test("describe returns [name, sqlType] pairs") {
    val c = new Catalog(spark, sf0001)
    val cols = c.describe("region").toMap
    assert(cols("r_regionkey") == "int")
    assert(cols("r_name") == "string")
  }

  test("distinctValues caches and sorts") {
    val c = new Catalog(spark, sf0001)
    val v1 = c.distinctValues("lineitem", "l_returnflag")
    assert(v1 == Seq("A", "N", "R"))
    assert(c.distinctValues("lineitem", "l_returnflag") eq v1) // memoized
  }

  test("events ts reads as microsecond timestamp despite TIMESTAMP(NANOS) storage") {
    val ev = Tables.read(spark, sf0001, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() == 1000)
  }
}
