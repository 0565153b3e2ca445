package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Stage attribution for the multi-probe LSH serve wall (PERF.md finding
  * 30): times the probe end-to-end at multiProbe 0/2/8 on the persisted
  * 25× ScaleBench index, then replays the internals — driver
  * bucket+perturbation arithmetic, the candidate `hits` job as an OR
  * disjunction vs as a broadcast (table, bucket) equi-join — so a wall
  * regression attributes to a STAGE, not a guess. This is the harness
  * that caught the 126-term Or tree leaving whole-stage codegen (8.6 s
  * interpreted vs 0.5 s joined) and motivated [[graft.ops.Similarity]]'s
  * `OrPairCap` routing. Requires a prior `ScaleBench` run (reads
  * /tmp/graft_scale_lsh_x25). */
object MpProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val dir = "/tmp/graft_scale_lsh_x25"
    val emb = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    val q = emb.filter(col("vec_id") === 0).localCheckpoint(true)
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[mp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    // warm
    t("warm single") { Similarity.probeLshIndex(spark, dir, "vec_id", "embedding",
      q, "embedding", k = 10).collect() }
    for (r <- 1 to 2) {
      t(s"r$r single (mp=0)") { Similarity.probeLshIndex(spark, dir, "vec_id",
        "embedding", q, "embedding", k = 10).collect() }
      t(s"r$r mp=2") { Similarity.probeLshIndex(spark, dir, "vec_id",
        "embedding", q, "embedding", k = 10, multiProbe = 2).collect() }
      t(s"r$r mp=8") { Similarity.probeLshIndex(spark, dir, "vec_id",
        "embedding", q, "embedding", k = 10, multiProbe = 8).collect() }
      t(s"r$r mp=8 limit0 (shuffle)") { Similarity.probeLshIndex(spark, dir,
        "vec_id", "embedding", q, "embedding", k = 10, multiProbe = 8,
        candidateIdLimit = 0L).collect() }
    }
    // stage attribution for mp=8: replicate the internals
    val meta = spark.read.parquet(s"$dir/meta.parquet").head()
    val (planes, tables, dim, seed) =
      (meta.getAs[Int]("planes"), meta.getAs[Int]("tables"),
        meta.getAs[Int]("dim"), meta.getAs[Long]("seed"))
    println(s"[mp] planes=$planes tables=$tables")
    val qv = q.select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    var qPairs: Seq[(Int, Int)] = Nil
    t("driver buckets+perturb") {
      val (buckets, margins) = Similarity.bucketsAndMarginsLocal(qv, tables, planes, dim, seed)
      qPairs = (0 until tables).flatMap { tt =>
        (tt, buckets(tt)) +: Similarity.perturbationSets(margins(tt).map(math.abs), 8)
          .map(ps => (tt, ps.foldLeft(buckets(tt))((b, p) => b ^ (1 << p))))
      }.distinct
    }
    println(s"[mp] qPairs=${qPairs.length}")
    val postings = spark.read.parquet(s"$dir/postings.parquet")
    val hits = postings
      .filter(qPairs.foldLeft(lit(false)) { case (acc, (tt, b)) =>
        acc || (col("table") === tt && col("bucket") === b) })
      .select(col("vec_id")).distinct()
    var nIds = 0
    t("hits take (OR filter)") { nIds = hits.take(10001).length }
    println(s"[mp] candidates=$nIds")
    // same hits via a broadcast join on (table,bucket) instead of the OR
    val pairsDf = spark.createDataFrame(qPairs).toDF("table", "bucket")
    val hitsJ = postings.join(broadcast(pairsDf), Seq("table", "bucket"))
      .select(col("vec_id")).distinct()
    t("hits take (bcast join)") { hitsJ.take(10001) }
    t("hits plan only (OR)") { hits.queryExecution.executedPlan }
    spark.stop()
  }
}
