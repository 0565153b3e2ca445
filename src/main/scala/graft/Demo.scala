package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{Catalog, QueryService}
import graft.engine.export.{ExportService, Exporters}

/** End-to-end lifecycle demo: submit → status → preview → export to all
  * seven formats. Usage: runMain graft.Demo <sfDir> <outDir> */
object Demo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val catalog = new Catalog(spark, sfDir)
    println(s"tables: ${catalog.listTables().mkString(",")}")
    println(s"schema(orders): ${catalog.describe("orders").map(c => s"${c._1}:${c._2}").mkString(",")}")

    val queries = new QueryService(spark, catalog, s"$outDir/results")
    val exports = new ExportService(spark, id => s"$outDir/results/$id", s"$outDir/exports")

    val qid = queries.submit("orders", "o_orderstatus", "F",
      fields = "o_orderkey, o_custkey, o_totalprice, o_orderdate",
      condition = Some("o_totalprice > 100000 AND o_orderpriority LIKE '1%'"))
    println(s"query_id: $qid")
    println(s"final_state: ${queries.await(qid)}")
    println(s"status: ${queries.status(qid)}")

    val preview = queries.preview(qid, 5).toOption.get
    println("preview:")
    preview.foreach(r => println("  " + r.mkString("|")))

    for (f <- Exporters.SupportedFormats) {
      exports.export(qid, f)
      println(s"export $f: ${exports.await(qid, f)}")
    }
    // cache-hit check: semantically identical query returns the same id
    val qid2 = queries.submit("orders", "o_orderstatus", "F",
      fields = "o_orderkey, o_custkey, o_totalprice, o_orderdate",
      condition = Some("o_orderpriority LIKE '1%' AND o_totalprice > 100000"))
    println(s"cache_hit: ${qid2 == qid}")
    spark.stop()
  }
}
