// scratch profiler for the in-query ANN paths (r21 opt round): times the
// stages of c14_ann_ivfpq / c14_pq_topk / c13_semantic_dedup separately so
// the wall attributes to count/train/index/probe instead of one lump.
// Lives in package graft.ops to reach the private[ops] probe internals —
// a measurement harness, not API surface.
//   sbt "runMain graft.ops.AnnProfile [sfDir]"
package graft.ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object AnnProfile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[annprofile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val emb = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0)

    for (round <- 1 to 2) {
      println(s"── round $round ─────────────────────────────")
      val n = time("ivfpq: count")(corpus.count())
      val cells = Ivf.clampK(Ivf.cellsForSearch(n, 4), n)
      val model = time(s"ivfpq: trainModel(coarse) cells=$cells")(
        Ivf.trainModel(corpus, "embedding", cells, 42L))
      val indexed = model.indexOf(corpus, "vec_id", "embedding")
      val trainBase = time("ivfpq: residual sample checkpoint")(
        indexed.select(model.residualOf(col("embedding")).as("__res"))
          .localCheckpoint(true))
      val cb = time("ivfpq: trainPq (8 concurrent fits)")(
        Quantize.trainPq(trainBase, "__res", 8, 16, 42L))
      // ── probe sub-stages (replicating ivfPqWithModel's body) ──
      val q = time("probe: query.head()")(
        query.select(col("embedding").cast("array<double>").as("__q"))
          .head().getSeq[Double](0).toArray)
      val shortlist = indexed
        .filter(col("cell").isin(model.probedCells(q, 4).map(Integer.valueOf): _*))
        .select(col("vec_id"), col("embedding"),
          (model.cellDot(q) +
            Quantize.pqAdcScore(
              Quantize.pqCode(model.residualOf(col("embedding")), cb), cb, q))
            .as("__adc"))
        .orderBy(col("__adc").desc, col("vec_id"))
        .limit(100)
      time("probe: shortlist planning")(shortlist.queryExecution.executedPlan)
      time("probe: shortlist.collect #1")(shortlist.collect())
      time("probe: shortlist.collect #2")(shortlist.collect())
      val rerank = Similarity.bruteForceTopK(shortlist, "vec_id", "embedding",
        query, "embedding", 10)
      time("probe: rerank planning")(rerank.queryExecution.executedPlan)
      time("probe: rerank.collect")(rerank.collect())
      time("probe: neverShort(full)")(
        Similarity.neverShort(rerank, corpus, "vec_id", "embedding",
          query, "embedding", 10))
      time("ivfpq: full query end-to-end")(
        noop(Quantize.ivfPqSized(corpus, "vec_id", "embedding",
          query, "embedding", 10)))
      time("pq_topk: full query")(
        noop(Quantize.pqTopK(corpus, "vec_id", "embedding",
          query, "embedding", 10)))
      val n2 = time("semdedup: count")(emb.count())
      val k = Dedup.cellsFor(n2)
      time(s"semdedup: trainCentroids k=$k")(
        Ivf.trainCentroids(emb, "embedding", k, 42L))
      time("semdedup: full query")(
        noop(Dedup.semanticDedupSized(emb, "vec_id", "embedding", 0.85)
          .select(col("vec_id"), col("label"))))
    }
    spark.stop()
  }
}
