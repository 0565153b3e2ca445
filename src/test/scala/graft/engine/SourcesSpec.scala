package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink coverage beyond parquet (SURVEY.md §2 "Sources/sinks"):
  * csv (A1), json-lines, orc, text — engine-side distributed readers/
  * writers (the single-file delivery formats live in export.Exporters). */
class SourcesSpec extends SparkSpec {

  private def nation = Tables.read(spark, sf0001, "nation")

  private def roundtrip(format: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft-src-$format").toString + "/data"
    nation.write.options(opts).format(format).save(dir)
    val back = spark.read.options(opts)
      .schema(nation.schema) // csv/json: explicit schema, as a real pipeline would
      .format(format).load(dir)
    assert(back.count() == 25)
    val orig = nation.orderBy("n_nationkey").collect().map(_.toSeq)
    val rt = back.orderBy("n_nationkey").collect().map(_.toSeq)
    assert(rt.sameElements(orig), s"$format roundtrip mismatch")
  }

  test("csv source/sink roundtrip (distributed, header)") {
    roundtrip("csv", Map("header" -> "true"))
  }

  test("json-lines source/sink roundtrip") { roundtrip("json") }

  test("orc source/sink roundtrip") { roundtrip("orc") }

  test("csv with inferSchema recovers numeric types (A1 semantics)") {
    val dir = Files.createTempDirectory("graft-csv-infer").toString + "/data"
    nation.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.schema("n_nationkey").dataType.typeName == "integer")
    assert(back.schema("n_name").dataType.typeName == "string")
  }

  test("xml source/sink roundtrip (Spark 4 native xml)") {
    val dir = Files.createTempDirectory("graft-xml").toString + "/data"
    nation.write.option("rowTag", "row").format("xml").save(dir)
    val back = spark.read.option("rowTag", "row").schema(nation.schema).format("xml").load(dir)
    assert(back.count() == 25)
  }
}
