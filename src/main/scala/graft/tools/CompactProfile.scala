package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, IndexLifecycle, Ivf}

/** Stage attribution for the one superlinear column the 100× rung
  * surfaced ([[Scale100]]): compaction of a tombstone backlog that
  * touches ALL cells (scattered 5600 ids over 900 cells at x100) is a
  * full-index rewrite by design — but its wall grew 9.3× for 4× data
  * (3.8 → 35.8 s) while the build writes the same volume in ~8.6 s, so
  * some stage is paying more than the data. This tool re-creates the
  * backlog on the Scale100 index dirs and times compactIndex's stages
  * separately (mirroring compactIndexInner's plan): tombstone load,
  * affected-cell discovery (semi-join + collect), survivor anti-join +
  * repartition + checkpoint, the dynamic-partition overwrite, and the
  * kept-cell collect — so PERF.md's x100 row carries a per-stage
  * attribution instead of a guess.
  *
  * Run AFTER Scale100 (reuses /tmp/graft_s100_ivf_x{25,100}; rebuilds
  * them if missing).
  */
object CompactProfile {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ks = sys.env.getOrElse("SPARK_GRAFT_KS", "25,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val baseEmb = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "embeddings")
    def timeIt(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    for (k <- ks) {
      val dir = s"/tmp/graft_scale_x$k"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists())
        ScaleBench.scaledEmb(baseEmb, k).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .repartition(cpus.toInt).localCheckpoint(true)
      val nVecs = emb.count()
      // the backlog ids below are FIXED ranges through 35099; a smaller
      // rung would silently empty them — fail with the real reason
      require(nVecs >= 36000,
        s"CompactProfile needs vec_id range through 35099 (k >= 18, got $nVecs at x$k)")
      val ivfDir = s"/tmp/graft_s100_ivf_x$k"
      if (!new java.io.File(s"$ivfDir/invfile.parquet").exists()) {
        IndexLifecycle.clearLock(spark, ivfDir)
        Ivf.buildIndex(emb, "vec_id", "embedding", ivfDir,
          sampleFraction = 0.25, maxIter = 5, hierarchicalThreshold = 64)
      }
      // fresh scattered backlog (Scale100's shape: 5600 ids)
      val batch = emb.filter(
          (col("vec_id") >= 20001 && col("vec_id") <= 20500) ||
          (col("vec_id") >= 30000 && col("vec_id") <= 35099))
        .select("vec_id").localCheckpoint(true)
      IndexLifecycle.removeIds(spark, ivfDir, batch, "vec_id", tombstone = true)

      // ── the stages, mirroring compactIndexInner's cell arm — under
      //    the single-writer lease (CLAUDE.md: every mutating verb
      //    serializes through it; this tool's manual rewrite is one),
      //    and with the verb's emptied-cell delete step, without which
      //    a fully-tombstoned cell's stale files would survive the
      //    overwrite and the clear would resurrect its ids in the
      //    REUSED /tmp index later sessions share ─────────────────────────
      IndexLifecycle.withIndexLock(spark, ivfDir, "compactProfile") {
      val file = "invfile.parquet"
      var del: DataFrame = null; var n = 0L
      val tLoad = timeIt {
        del = IndexLifecycle.loadTombstones(spark, ivfDir).get
        n = del.count()
      }
      val table = spark.read.parquet(s"$ivfDir/$file")
      var affected: Seq[Int] = Nil
      val tDiscover = timeIt {
        affected = table.join(broadcast(del), Seq("vec_id"), "left_semi")
          .select("cell").distinct().collect().map(_.getInt(0)).toSeq
      }
      var rows: DataFrame = null
      val tSurvivors = timeIt {
        rows = table
          .filter(col("cell").isin(affected.map(Integer.valueOf): _*))
          .join(broadcast(del), Seq("vec_id"), "left_anti")
          .repartition(col("cell"))
          .localCheckpoint(true)
        rows.count()
      }
      val tWrite = timeIt {
        // the verb's own fences, mirrored (the staged jobs here ARE the
        // minutes-long takeover windows the fences exist for, and the
        // /tmp index is shared with later sessions)
        IndexLifecycle.requireLeaseStillHeld(spark, "cell overwrite (compaction)")
        rows.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cell").parquet(s"$ivfDir/$file")
      }
      var kept: Set[Int] = Set.empty
      val tKept = timeIt {
        kept = rows.select("cell").distinct().collect().map(_.getInt(0)).toSet
      }
      val tEmptied = timeIt {
        IndexLifecycle.requireLeaseStillHeld(spark, "emptied-cell dir delete (compaction)")
        val root = new org.apache.hadoop.fs.Path(ivfDir)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        affected.filterNot(kept).foreach { c =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$ivfDir/$file/cell=$c"), true)
        }
      }
      IndexLifecycle.requireLeaseStillHeld(spark, "tombstone clear (compaction)")
      IndexLifecycle.clearTombstones(spark, ivfDir)
      val total = tLoad + tDiscover + tSurvivors + tWrite + tKept + tEmptied
      println(f"[cprof] x$k%-3d vecs=$nVecs%7d backlog=$n%5d " +
        f"affected=${affected.length}%4d | load=$tLoad%5.2fs " +
        f"discover=$tDiscover%5.2fs survivors=$tSurvivors%6.2fs " +
        f"write=$tWrite%6.2fs kept=$tKept%5.2fs emptied=$tEmptied%5.2fs | " +
        f"total=$total%6.2fs")
      }
    }
    spark.stop()
  }
}
