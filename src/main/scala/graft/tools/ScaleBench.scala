package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scaling evidence for the two hottest operators (round-3 verdict #8):
  * run the Jaccard near-dup family and connected components on 1×/2×/5×
  * the sf0.1 documents corpus and verify sublinear-to-linear growth —
  * the 100 TB posture argued from plan shape, now measured over one more
  * decade.
  *
  * The scaled corpora are derived (not driver data): each replica of the
  * sf0.1 corpus gets ~25% of its tokens rewritten with a replica tag, so
  * replicas are NOT near-duplicates of each other (cross-replica Jaccard
  * ≪ 0.6) and the shingle-frequency shape stays realistic. Written to
  * /tmp — /root/testdata stays untouched.
  *
  * Run: sbt "runMain graft.tools.ScaleBench"
  */
object ScaleBench {

  /** Replicate docs `k`× with per-replica token perturbation. */
  def scaled(docs: DataFrame, k: Int): DataFrame = {
    val n = docs.count()
    (0 until k).map { r =>
      if (r == 0) docs
      else docs.select(
        (col("doc_id") + lit(r * n)).as("doc_id"),
        // every token tagged per replica: replicas are DISJOINT in shingle
        // space, modeling corpus growth as new content (df per shingle
        // constant, postings grow k×). A partial rewrite instead leaves
        // replicas sharing shingles, which multiplies per-shingle df by
        // the replica count — a self-similarity artifact that inflates
        // candidate volume quadratically and measures the corpus model,
        // not the operator
        array_join(transform(split(col("text"), " "), t =>
          concat(t, lit("_"), lit(r))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val base = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "documents")

    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val out = body
      ((System.nanoTime() - t0) / 1e9, out)
    }

    // warm codegen/shuffle paths untimed so x1 doesn't absorb JVM startup
    Dedup.jaccardNearDup(base.limit(1000), "doc_id", "text",
      n = 3, threshold = 0.6, maxDf = Some(100)).count()

    for (round <- 1 to 2; k <- Seq(1, 2, 5)) {
      val dir = s"/tmp/graft_scale_x$k"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        scaled(base, k).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      // equalized parallelism + checkpoint: time the operators, not the
      // scan or the partition-count accident of how /tmp was written
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(cpus.toInt).localCheckpoint(true)
      val nDocs = docs.count()

      val (tJac, _) = timeIt {
        Dedup.jaccardNearDup(docs, "doc_id", "text",
          n = 3, threshold = 0.6, maxDf = Some(100))
          .write.format("noop").mode("overwrite").save(); 0L
      }
      // pairs pre-materialized so CC / remove timings isolate THEIR cost
      val pairs = Dedup.jaccardNearDup(docs, "doc_id", "text",
        n = 3, threshold = 0.6, maxDf = Some(100)).localCheckpoint(true)
      val nPairs = pairs.count()
      val (tCc, nNodes) = timeIt {
        val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs, maxIter = 20)
        labels.write.format("noop").mode("overwrite").save()
        rounds.toLong
      }
      val (tRm, nKept) = timeIt {
        val kept = Dedup.removeNearDups(docs, "doc_id", pairs)
        kept.write.format("noop").mode("overwrite").save()
        kept.count()
      }
      println(f"[scale] r$round x$k docs=$nDocs%7d pairs=$nPairs%6d jaccard=$tJac%6.2fs " +
        f"cc=$tCc%6.2fs (rounds=$nNodes) remove=$tRm%6.2fs kept=$nKept%7d")
    }
    spark.stop()
  }
}
