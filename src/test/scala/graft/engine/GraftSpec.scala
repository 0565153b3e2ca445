package graft.engine

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end facade spec: the full reference workflow through one
  * object (what a migrating user of the reference service would call). */
class GraftSpec extends SparkSpec {

  test("catalog -> submit -> status -> preview -> export, one facade") {
    val g = Graft(spark, sf0001, Files.createTempDirectory("graft-work").toString,
      partitionColumn = "l_returnflag")
    try {
      assert(g.tables().contains("lineitem"))
      assert(g.schema("lineitem").toMap.apply("l_quantity") == "double")
      assert(g.filterValues("lineitem", "l_returnflag") == Seq("A", "N", "R"))
      assert(g.formats() == Seq("csv", "tsv", "xlsx", "json", "xml", "feather", "parquet"))

      val id = g.submit("lineitem", "R", "l_orderkey, l_extendedprice",
        Some("l_quantity > 45"))
      assert(g.awaitQuery(id) == QueryService.Succeeded)
      val pv = g.preview(id, 5).toOption.get
      assert(pv.head == Seq("l_orderkey", "l_extendedprice") && pv.length <= 5)

      // HAL _links on the submitted query (reference app/main.py:492-500)
      assert(g.links(id) == Map(
        "self" -> s"/query/$id",
        "status" -> s"/query/$id/status",
        "preview" -> s"/query/$id/preview",
        "export" -> s"/query/$id/export"))

      g.export(id, "json")
      val done = g.awaitExport(id, "json")
      assert(done.isInstanceOf[export.ExportService.Done])

      // the analytics surface the reference never parameterized
      val agg = g.sql(
        """SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag""")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(agg.values.sum == 6000L)

      // native expressions callable from SQL text
      val sim = g.sql(
        """SELECT vec_id, round(cosine_sim(embedding, embedding), 4) AS self_sim
           FROM embeddings LIMIT 3""")
        .collect().map(_.getDouble(1))
      assert(sim.forall(_ == 1.0))

      // text-signature expressions too, and they match the Column API
      val row = g.sql(
        """SELECT rolling_token_hash(split(text, ' ')) AS fp,
                  size(shingle_hashes(split(text, ' '), 3)) AS n_sh,
                  simhash_bits(split(text, ' ')) AS sh,
                  size(minhash_from_hashes(shingle_hashes(split(text, ' '), 3), 8)) AS k
           FROM documents ORDER BY doc_id LIMIT 1""").collect().head
      val viaCols = g.sql("SELECT text FROM documents ORDER BY doc_id LIMIT 1")
        .select(
          graft.ops.Text.fingerprint(org.apache.spark.sql.functions.col("text")).as("fp"),
          org.apache.spark.sql.functions.size(graft.functions.ShingleHashes
            .sortedShingleHashes(graft.ops.Text.tokens(
              org.apache.spark.sql.functions.col("text")), 3)).as("n_sh"))
        .collect().head
      assert(row.getLong(0) == viaCols.getLong(0), "SQL fingerprint != Column fingerprint")
      assert(row.getInt(1) == viaCols.getInt(1))
      assert(row.getInt(3) == 8)

      // winnowing callable from SQL text, matching the Column API
      val winRow = g.sql(
        """SELECT size(winnow_fingerprints(text, 16, 8)) AS n_fp
           FROM documents ORDER BY doc_id LIMIT 1""").collect().head
      val winCol = g.sql("SELECT text FROM documents ORDER BY doc_id LIMIT 1")
        .select(org.apache.spark.sql.functions.size(
          graft.functions.WinnowFingerprints.winnow(
            org.apache.spark.sql.functions.col("text"), 16, 8)).as("n_fp"))
        .collect().head
      assert(winRow.getInt(0) == winCol.getInt(0) && winRow.getInt(0) > 0,
        "SQL winnow != Column winnow")
    } finally g.close()
  }
}
