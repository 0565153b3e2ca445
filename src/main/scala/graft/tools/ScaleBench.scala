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
        // deterministic ~25% token rewrite: kills enough shingles that
        // replicas never pair (3 consecutive survivors needed per shingle)
        array_join(transform(split(col("text"), " "), (t, i) =>
          when(pmod(xxhash64(t, i, lit(r)), lit(4)) === 0,
            concat(t, lit("_"), lit(r))).otherwise(t)), " ").as("text"),
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

    for (k <- Seq(1, 2, 5)) {
      val dir = s"/tmp/graft_scale_x$k"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        scaled(base, k).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .localCheckpoint(true) // exclude scan/gen cost; time the operators
      val nDocs = docs.count()

      def pairs = Dedup.jaccardNearDup(docs, "doc_id", "text",
        n = 3, threshold = 0.6, maxDf = Some(100))

      val (tJac, nPairs) = timeIt {
        val p = pairs.localCheckpoint(true); p.count()
      }
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
      println(f"[scale] x$k docs=$nDocs%7d pairs=$nPairs%6d jaccard=$tJac%6.2fs " +
        f"cc=$tCc%6.2fs (rounds=$nNodes) remove=$tRm%6.2fs kept=$nKept%7d")
    }
    spark.stop()
  }
}
