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

  test("ORC tables register beside parquet: listing, schema, scan parity (registry round-trip)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cat-orc").toString
    val nation = Tables.read(spark, sf0001, "nation")
    nation.write.parquet(s"$root/nation.parquet")
    nation.write.orc(s"$root/nation_orc.orc")
    val c = new Catalog(spark, root)
    assert(c.listTables() == Seq("nation", "nation_orc"))
    assert(c.exists("nation_orc") && !c.exists("missing"))
    assert(c.path("nation_orc").endsWith(".orc") && c.path("nation").endsWith(".parquet"))
    // identical schema and rows through the registry, whichever format backs it
    assert(c.describe("nation_orc") == c.describe("nation"))
    val viaParquet = c.table("nation").orderBy("n_nationkey").collect().map(_.toSeq)
    val viaOrc = c.table("nation_orc").orderBy("n_nationkey").collect().map(_.toSeq)
    assert(viaOrc.sameElements(viaParquet), "orc-backed table diverged through the registry")
  }

  test("events ts reads as microsecond timestamp despite TIMESTAMP(NANOS) storage") {
    val ev = Tables.read(spark, sf0001, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() == 1000)
  }
}
