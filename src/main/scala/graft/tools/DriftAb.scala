package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, Quantize, Similarity}

/** Append-lifecycle recall drift, measured (r13 verdict #2): `appendIndex`
  * and `appendPqIndex` assign new rows under the STALE quantizer (FAISS
  * add() semantics) — correct by contract, but how far recall degrades as
  * the appended fraction grows was unquantified. This harness builds at
  * 1×, appends to 2×/5× total (50% / 80% appended fraction), and measures
  * serve-probe recall@10 against the exact brute-force truth, vs a FRESH
  * build on the same union — on both trained layouts (IVF-flat exact
  * cosine, IVFADC). `appendLshIndex` is exempt: hyperplanes are seeded
  * constants, no training exists to go stale.
  *
  * The appended replicas are [[ScaleBench.scaledEmb]] sign-flips —
  * deliberately a DIFFERENT distribution than the build corpus (within a
  * replica dot products are preserved, across replicas they scramble), so
  * this measures the worst drift regime: every appended row lands in
  * cells fit to a distribution it never came from, and the fresh build
  * additionally gets the cell count sized for the grown corpus. Recall
  * splits by query origin (built rows vs appended rows): appended-origin
  * queries probe FOR neighbors that all live in stale-assigned cells,
  * which is where degradation concentrates if it exists.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.DriftAb"
  */
object DriftAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val baseEmb = graft.engine.Tables.read(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val n0 = baseEmb.count()
    val nQ = 15

    for (total <- Seq(2, 5)) {
      val full = ScaleBench.scaledEmb(
          graft.engine.Tables.read(spark, sfDir, "embeddings"), total)
        .select("vec_id", "embedding")
        .repartition(cpus.toInt).localCheckpoint(true)
      val base = full.filter(col("vec_id") < n0).localCheckpoint(true)
      val appended = full.filter(col("vec_id") >= n0).localCheckpoint(true)

      val staleIvf = s"/tmp/graft_drift_ivf_stale_x$total"
      val freshIvf = s"/tmp/graft_drift_ivf_fresh_x$total"
      val stalePq = s"/tmp/graft_drift_pq_stale_x$total"
      val freshPq = s"/tmp/graft_drift_pq_fresh_x$total"
      // stale = built at 1x, appended to total; fresh = built on the union
      Ivf.buildIndex(base, "vec_id", "embedding", staleIvf)
      Ivf.appendIndex(appended, "vec_id", "embedding", staleIvf)
      Ivf.buildIndex(full, "vec_id", "embedding", freshIvf)
      Quantize.buildPqIndex(base, "vec_id", "embedding", stalePq)
      Quantize.appendPqIndex(appended, "vec_id", "embedding", stalePq)
      Quantize.buildPqIndex(full, "vec_id", "embedding", freshPq)

      // nQ built-origin + nQ appended-origin query ids (the latter from
      // the LAST replica — maximally far from the build distribution)
      val qIds = (1L to nQ.toLong) ++
        ((total - 1) * n0 + 1L to (total - 1) * n0 + nQ.toLong)
      val queries = full.filter(col("vec_id").isin(qIds.map(java.lang.Long.valueOf): _*))
        .select(col("vec_id").as("qid"), col("embedding")).localCheckpoint(true)
      val truth: Map[Long, Set[Long]] =
        Similarity.bruteForceTopKBatch(full, "vec_id", "embedding",
            queries, "qid", "embedding", 10)
          .collect().groupBy(_.getLong(0))
          .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

      def recallSplit(byQuery: Map[Long, Set[Long]]): (Double, Double) = {
        def avg(ids: Seq[Long]) =
          ids.map(q => byQuery.getOrElse(q, Set.empty)
            .intersect(truth(q)).size / 10.0).sum / ids.length
        (avg(qIds.filter(_ < n0)), avg(qIds.filter(_ >= n0)))
      }
      def ivfRecall(dir: String, nprobe: Int = 4): (Double, Double) = recallSplit(
        Ivf.probeIndexBatch(spark, dir, "vec_id", "embedding",
            queries, "qid", "embedding", k = 10, nprobe = nprobe)
          .collect().groupBy(_.getLong(0))
          .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet })
      def pqRecall(dir: String): (Double, Double) = recallSplit(
        qIds.map { q =>
          q -> Quantize.probePqIndex(spark, dir, "vec_id", "embedding",
              full.filter(col("vec_id") === q), "embedding", k = 10)
            .collect().map(_.getLong(0)).toSet
        }.toMap)

      val (ivfStaleB, ivfStaleA) = ivfRecall(staleIvf)
      val (ivfFreshB, ivfFreshA) = ivfRecall(freshIvf)
      // equal-scan-fraction control: the fresh build has MORE cells
      // (sized for the grown corpus), so fixed nprobe scans a smaller
      // fraction — scale its nprobe to match the stale index's fraction
      // and the residual difference is pure quantizer-fit drift
      val cellsStale = Ivf.loadIndexModel(spark, staleIvf).cells
      val cellsFresh = Ivf.loadIndexModel(spark, freshIvf).cells
      val npEq = math.max(1, math.round(4.0 * cellsFresh / cellsStale).toInt)
      val (ivfEqB, ivfEqA) = ivfRecall(freshIvf, nprobe = npEq)
      val (pqStaleB, pqStaleA) = pqRecall(stalePq)
      val (pqFreshB, pqFreshA) = pqRecall(freshPq)
      // the remedy, measured: rebuild the drifted dirs from their own
      // rows (IndexLifecycle.rebuildIndex — what maintainIndex fires at
      // the threshold) and re-probe. Recall must land at the fresh-build
      // level: the rebuild IS a fresh train on the same union, with the
      // cell count re-sized for the grown corpus.
      graft.ops.IndexLifecycle.rebuildIndex(spark, staleIvf)
      graft.ops.IndexLifecycle.rebuildIndex(spark, stalePq)
      val (ivfRbB, ivfRbA) = ivfRecall(staleIvf)
      val (pqRbB, pqRbA) = pqRecall(stalePq)
      val appendedPct = 100 * (total - 1) / total
      println(f"[drift] x$total ($appendedPct%d%% appended, n=${n0 * total}, " +
        f"cells=$cellsStale stale/$cellsFresh fresh) | " +
        f"ivf stale=$ivfStaleB%.3f/$ivfStaleA%.3f fresh=$ivfFreshB%.3f/$ivfFreshA%.3f " +
        f"fresh@np=$npEq=$ivfEqB%.3f/$ivfEqA%.3f rebuilt=$ivfRbB%.3f/$ivfRbA%.3f | " +
        f"pq stale=$pqStaleB%.3f/$pqStaleA%.3f fresh=$pqFreshB%.3f/$pqFreshA%.3f " +
        f"rebuilt=$pqRbB%.3f/$pqRbA%.3f " +
        f"(recall@10 built-origin/appended-origin queries, $nQ each)")

      // LSH drift is OCCUPANCY, not assignment: hyperplanes are seeded
      // constants (recall cannot go stale), but appends under the
      // PERSISTED sizing grow candidates-per-bucket linearly with the
      // appended fraction — the probe pays the bloat on every call.
      // Rebuild is the one step allowed to re-run the occupancy sizing;
      // measure the candidate volume it buys back (and the recall it
      // trades: the bloated index scanned more, so its recall is a
      // ceiling the re-sized index deliberately does not chase — bounded
      // cost is the contract, nprobe-style levers buy recall back).
      val staleLsh = s"/tmp/graft_drift_lsh_stale_x$total"
      Similarity.buildLshIndex(base, "vec_id", "embedding", staleLsh)
      Similarity.appendLshIndex(appended, "vec_id", "embedding", staleLsh)
      def lshPlanes(dir: String): Int =
        spark.read.parquet(s"$dir/meta.parquet").head().getAs[Int]("planes")
      def lshCandVolume(dir: String): Long = {
        val meta = spark.read.parquet(s"$dir/meta.parquet").head()
        val (p, tb, dm, sd) = (meta.getAs[Int]("planes"),
          meta.getAs[Int]("tables"), meta.getAs[Int]("dim"),
          meta.getAs[Long]("seed"))
        spark.read.parquet(s"$dir/postings.parquet")
          .join(broadcast(Similarity.lshIndex(queries, "qid", "embedding",
            tb, p, dm, sd).select(col("table"), col("bucket"), col("qid"))),
            Seq("table", "bucket"))
          .select(col("qid"), col("vec_id")).distinct().count()
      }
      def lshRecall(dir: String): (Double, Double) = recallSplit(
        Similarity.probeLshIndexBatch(spark, dir, "vec_id", "embedding",
            queries, "qid", "embedding", k = 10,
            candidateIdLimit = 1000000L)
          .collect().groupBy(_.getAs[Long]("query_id"))
          .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet })
      val planesStale = lshPlanes(staleLsh)
      val volStale = lshCandVolume(staleLsh)
      val (lshStaleB, lshStaleA) = lshRecall(staleLsh)
      graft.ops.IndexLifecycle.rebuildIndex(spark, staleLsh)
      val planesRb = lshPlanes(staleLsh)
      val volRb = lshCandVolume(staleLsh)
      val (lshRbB, lshRbA) = lshRecall(staleLsh)
      println(f"[drift] x$total lsh occupancy: planes $planesStale->$planesRb, " +
        f"probe candidates (2x$nQ queries) $volStale->$volRb, " +
        f"recall stale=$lshStaleB%.3f/$lshStaleA%.3f " +
        f"rebuilt=$lshRbB%.3f/$lshRbA%.3f")
    }
    spark.stop()
  }
}
