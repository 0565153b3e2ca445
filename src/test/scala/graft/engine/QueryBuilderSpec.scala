package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QueryBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def gene = Seq(
    (554L, "ENSG00000210049", "homo_sapiens", "protein_coding"),
    (555L, "ENSG00000211459", "homo_sapiens", "lncRNA"),
    (556L, "ENSG00000210077", "mus_musculus", "protein_coding")
  ).toDF("gene_id", "gene_stable_id", "species", "gene_biotype")

  test("reference shape: mandatory filter + condition + projection") {
    val out = QueryBuilder.build(gene, "species", "homo_sapiens",
      fields = "gene_id, gene_stable_id",
      condition = Some("gene_id=554 AND gene_stable_id='ENSG00000210049'"))
    assert(out.columns.toSeq == Seq("gene_id", "gene_stable_id"))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(554L))
  }

  test("fields='*' keeps all columns; no condition keeps all species rows") {
    val out = QueryBuilder.build(gene, "species", "homo_sapiens")
    assert(out.columns.length == 4)
    assert(out.count() == 2)
  }

  test("empty / whitespace condition is a no-op filter") {
    assert(QueryBuilder.build(gene, "species", "homo_sapiens",
      condition = Some("  ")).count() == 2)
  }

  test("partition value never interpolated: quoted value with SQL metachars is safe") {
    // the reference string-interpolates (app/main.py:479) making this an
    // injection; our Column comparison treats it as a literal value
    val out = QueryBuilder.build(gene, "species", "x' OR '1'='1")
    assert(out.count() == 0)
  }

  test("distinct and limit") {
    assert(QueryBuilder.distinct(gene, "species").count() == 2)
    assert(QueryBuilder.limit(gene, 2).count() == 2)
  }

  test("fields list with function-call commas splits on top-level commas only") {
    val out = QueryBuilder.build(gene, "species", "homo_sapiens",
      fields = "gene_id, concat(gene_stable_id, ',', gene_biotype) AS tagged, round(gene_id / 7, 2) AS r")
    assert(out.columns.toSeq == Seq("gene_id", "tagged", "r"))
    assert(out.count() == 2)
    assert(QueryBuilder.splitTopLevel("a, f(b, g(c, d)) AS x, 'lit,eral' AS s") ==
      Seq("a", "f(b, g(c, d)) AS x", "'lit,eral' AS s"))
  }

  test("filter + projection are pushed into the parquet scan") {
    val li = Tables.read(spark, sf0001, "lineitem")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val plan = li.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"pushdown missing in:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning missing in:\n$plan")
  }
}
