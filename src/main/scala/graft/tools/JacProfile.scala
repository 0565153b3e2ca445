package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged isolation for the jaccard x100 wall (the CompactProfile
  * pattern): Scale100's per-stage attribution shows the FINAL stage of
  * [[graft.ops.Dedup.jaccardNearDup]] growing 32x in task time for 4x
  * data (66 -> 2,144 task-seconds x25 -> x100) while the signature /
  * prune stages stay near-linear — but that stage fuses the prefix
  * candidate join, the pair dropDuplicates, and both signature
  * join-backs, so wall alone cannot say whether the term is VOLUME
  * (candidate pairs growing superlinearly) or STRATEGY (a join flipping
  * plan shape at the bigger rung). This tool re-runs the operator's
  * phases one materialization at a time and prints each phase's row
  * count and wall, x25 vs x100.
  *
  * Run: sbt "runMain graft.tools.JacProfile"   (SPARK_GRAFT_KS=25,100)
  */
object JacProfile {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ks = sys.env.getOrElse("SPARK_GRAFT_KS", "25,100")
      .split(",").map(_.trim.toInt).toSeq
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val n = 3; val threshold = 0.6; val maxDf = 100

    def timeIt[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val out = body
      ((System.nanoTime() - t0) / 1e9, out)
    }

    for (k <- ks) {
      val dir = s"/tmp/graft_scale_x$k"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        val base = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "documents")
        ScaleBench.scaled(base, k).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(cpus.toInt).localCheckpoint(true)
      val nDocs = docs.count()

      // phase 1: signatures (tokenize -> shingle-hash, pure projection)
      val base = docs
        .select(col("doc_id").as("doc"), graft.ops.Text.tokens(col("text")).as("__ws"))
        .select(col("doc"),
          graft.functions.ShingleHashes.sortedShingleHashes(col("__ws"), n).as("sig"))
      val (tSig, sigCk) = timeIt(base.localCheckpoint(true))

      // phase 2: hot-shingle df (the maxDf cut input)
      val (tHot, hot) = timeIt {
        val h = sigCk.select(explode(col("sig")).as("sh"))
          .groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
          .select("sh").localCheckpoint(true)
        h.count(); h
      }
      val nHot = hot.count()
      val postings = sigCk.select(explode(col("sig")).as("sh")).count()

      // phase 3: prune (broadcast array_except) + sets materialization
      val hotArr = hot.agg(collect_list(col("sh")).as("hot"))
      val (tSets, sets) = timeIt {
        val s = sigCk.crossJoin(broadcast(hotArr))
          .select(col("doc"), array_except(col("sig"), col("hot")).as("sig"))
          .select(col("doc"), col("sig"), size(col("sig")).as("n_sh"))
          .filter(col("n_sh") > 0)
          .localCheckpoint(true)
        s.count(); s
      }
      val nSets = sets.count()

      // phase 4: prefix explode volume
      val prefixLen = (col("n_sh") -
        ceil(col("n_sh") * lit(threshold) - lit(1e-9)) + 1).cast("int")
      val (tPre, pre) = timeIt {
        val p = sets.select(col("doc"),
          explode(slice(col("sig"), lit(1), prefixLen)).as("sh"))
          .localCheckpoint(true)
        p.count(); p
      }
      val nPre = pre.count()
      // prefix-key df profile: the join's per-key fan-out upper bound
      val dfProf = pre.groupBy("sh").agg(count(lit(1)).as("df"))
        .agg(max(col("df")).as("mx"),
          sum(col("df") * col("df")).as("sumSq")).head()
      val maxPreDf = dfProf.getAs[Long]("mx")
      val pairUpper = dfProf.getAs[Long]("sumSq")

      // phase 5: candidate self-join (pre-dedup volume) — SHUFFLE_HASH
      // exactly as the operator pins it
      val a = pre.select(col("sh"), col("doc").as("doc_a"))
      val b = pre.select(col("sh"), col("doc").as("doc_b"))
      // checkpoint so phase 6 times ONLY the dedup exchange — without
      // it the dropDuplicates would re-run this whole join and the
      // "dedup=" column would conflate the two (the exact confound
      // this tool exists to resolve)
      val (tJoin, joined) = timeIt {
        val j = a.join(b.hint("SHUFFLE_HASH"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b")
          .localCheckpoint(true)
        j.count(); j
      }
      val nJoined = joined.count()

      // phase 6: pair dedup
      val (tDedup, cand) = timeIt {
        val c = joined.dropDuplicates("doc_a", "doc_b").localCheckpoint(true)
        c.count(); c
      }
      val nCand = cand.count()

      // phase 7: verify join-backs + intersect (the operator's tail)
      val sa = sets.select(col("doc").as("doc_a"), col("sig").as("sig_a"), col("n_sh").as("n_a"))
      val sb = sets.select(col("doc").as("doc_b"), col("sig").as("sig_b"), col("n_sh").as("n_b"))
      val (tVerify, nOut) = timeIt {
        cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
          .withColumn("common",
            graft.functions.VecFunctions.sortedIntersectCount(col("sig_a"), col("sig_b")))
          .withColumn("jaccard", col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common")))
          .filter(col("jaccard") >= threshold)
          .count()
      }

      // phase 8: the kernel alternative (Vernica/Carey/Li SIGMOD'10):
      // carry the signatures THROUGH the prefix join and verify inline —
      // one linear shuffle of prefix postings with sig payload, no
      // join-backs of the signature table, pair-dedup on the tiny
      // survivor set only
      val aF = sets.select(col("doc").as("doc_a"), col("sig").as("sig_a"),
        col("n_sh").as("n_a"), explode(slice(col("sig"), lit(1), prefixLen)).as("sh"))
      val bF = sets.select(col("doc").as("doc_b"), col("sig").as("sig_b"),
        col("n_sh").as("n_b"), explode(slice(col("sig"), lit(1), prefixLen)).as("sh"))
      val (tKernel, nKernelOut) = timeIt {
        aF.join(bF.hint("MERGE"), Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .withColumn("common",
            graft.functions.VecFunctions.sortedIntersectCount(col("sig_a"), col("sig_b")))
          .withColumn("jaccard", col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common")))
          .filter(col("jaccard") >= threshold)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
          .dropDuplicates("doc_a", "doc_b")
          .count()
      }

      println(f"[jacprof] x$k%-3d docs=$nDocs%7d hot=$nHot%8d postings=$postings%10d " +
        f"sets=$nSets%7d prefix=$nPre%10d maxPreDf=$maxPreDf%6d pairUB=$pairUpper%12d")
      println(f"[jacprof] x$k%-3d joined=$nJoined%11d cand=$nCand%10d out=$nOut%8d | " +
        f"sig=$tSig%6.2fs hot=$tHot%6.2fs sets=$tSets%6.2fs pre=$tPre%6.2fs " +
        f"join=$tJoin%7.2fs dedup=$tDedup%7.2fs verify=$tVerify%7.2fs | " +
        f"kernel=$tKernel%7.2fs out=$nKernelOut%8d")
    }
    spark.stop()
  }
}
