package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted hot-shingle skew row for the finding-35 kernel tail (r17
  * verdict #6). The MERGE kernel join's unit of work is the
  * prefix-shingle posting list: a shingle with prefix-df d lands ~d²/2
  * candidate pairs — all verified inline — under ONE sort-merge key,
  * and AQE's skew split keys on map-output partition BYTES, while this
  * skew is join FAN-OUT from a few-KB input partition, so nothing
  * splits it. `maxDf` bounds d (the documented operating mode at
  * scale); this tool measures what each regime actually costs at x100:
  *
  *  - a triple-token shingle engineered to the corpus-minimum hash (so
  *    it sorts FIRST in every planted doc's signature and always enters
  *    the prefix — worst case by construction, not by luck);
  *  - planted at df just under / at `maxDf` (survives the cut — the
  *    bounded regime), far past it (the cut prunes it — cost must
  *    return to baseline), and far past it WITHOUT maxDf (the exposure
  *    regime: quadratic pair mass in one SMJ partition);
  *  - per variant: operator wall (kernel tail forced via
  *    `sigBroadcastBytes = -1`, noop sink), max/median task duration
  *    of the run (the partition-boundedness signal), prefix max-df,
  *    and the planted key's staged pre-dedup pair count.
  *
  * Run: sbt "runMain graft.tools.SkewProfile"   (SPARK_GRAFT_K=100)
  */
object SkewProfile {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "100").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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

    val dir = s"/tmp/graft_scale_x$k"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      val base = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "documents")
      ScaleBench.scaled(base, k).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(cpus.toInt).localCheckpoint(true)
    val nDocs = docs.count()

    // engineer the planted shingle: 200k candidate 3-token texts, each
    // hashing to exactly ONE shingle through the SAME fused pipeline the
    // operator uses; take the minimum-hash candidate. With ~10M distinct
    // corpus shingles uniform in 64 bits, the 200k-candidate minimum
    // sits below a given doc's own minimum w.p. ~1 − sigLen/200k — the
    // plant lands in prefix position 1 for ~99.9% of planted docs.
    val plant = spark.range(200000L)
      .select(concat(lit("skewa"), col("id"), lit(" skewb"), col("id"),
        lit(" skewc"), col("id")).as("text"))
      .select(col("text"), graft.functions.ShingleHashes.sortedShingleHashes(
        graft.ops.Text.tokens(col("text")), n).getItem(0).as("h"))
      .orderBy("h").head()
    val plantText = plant.getString(0)
    println(s"[skew] planted shingle '$plantText' hash=${plant.getLong(1)}")

    val listener = new org.apache.spark.scheduler.SparkListener {
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val stageMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val stageSum = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      val topTasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long, Long)]()
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        durations.add(te.taskInfo.duration)
        stageMax.merge(te.stageId, te.taskInfo.duration, math.max(_, _))
        stageSum.merge(te.stageId, te.taskInfo.duration, Long.box(_) + _)
        val m = te.taskMetrics
        if (m != null && te.taskInfo.duration > 5000)
          topTasks.add((te.stageId, te.taskInfo.duration,
            m.shuffleReadMetrics.recordsRead, m.diskBytesSpilled >> 20,
            m.jvmGCTime))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageName.put(sc.stageInfo.stageId, sc.stageInfo.name)
      def clearAll(): Unit = {
        durations.clear(); stageMax.clear(); stageSum.clear(); stageName.clear()
        topTasks.clear()
      }
    }

    // (label, planted-df, maxDf). SPARK_GRAFT_VARIANT picks one for a
    // LEAN session (PERF.md reading (b): each variant checkpoints a
    // 500k-doc planted corpus, so an all-in-one session measures the
    // earlier variants' driver-block pressure, not the plant)
    val only = sys.env.get("SPARK_GRAFT_VARIANT")
    val variants = Seq(
      ("baseline ", 0, Some(maxDf)),
      ("under-cut", maxDf - 5, Some(maxDf)),
      ("at-cut   ", maxDf, Some(maxDf)),
      ("pruned   ", 5000, Some(maxDf)),
      ("no-maxDf ", 5000, None))
      .filter { case (l, _, _) => only.forall(l.trim == _.trim) }

    for ((label, dPlant, mdf) <- variants) {
      val planted =
        if (dPlant == 0) docs
        else docs.withColumn("text",
          when(col("doc_id") < dPlant,
            concat(col("text"), lit(" "), lit(plantText)))
            .otherwise(col("text")))
          .localCheckpoint(true)
      // staged prefix profile (JacProfile's phases 1-4 condensed): did
      // the plant reach the prefix, and what pair mass does it carry?
      val base = planted
        .select(col("doc_id").as("doc"),
          graft.ops.Text.tokens(col("text")).as("__ws"))
        .select(col("doc"), graft.functions.ShingleHashes
          .sortedShingleHashes(col("__ws"), n).as("sig"))
      val sigPruned = mdf match {
        case Some(m) =>
          val hot = base.select(explode(col("sig")).as("sh"))
            .groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") > m)
            .select("sh")
          val hotArr = hot.agg(collect_list(col("sh")).as("hot"))
          base.crossJoin(broadcast(hotArr))
            .select(col("doc"), array_except(col("sig"), col("hot")).as("sig"))
        case None => base
      }
      val sets = sigPruned
        .select(col("doc"), col("sig"), size(col("sig")).as("n_sh"))
        .filter(col("n_sh") > 0).localCheckpoint(true)
      val prefixLen = (col("n_sh") -
        ceil(col("n_sh") * lit(threshold) - lit(1e-9)) + 1).cast("int")
      val pre = sets.select(col("doc"),
        explode(slice(col("sig"), lit(1), prefixLen)).as("sh"))
      val prof = pre.groupBy("sh").agg(count(lit(1)).as("df"))
        .agg(max(col("df")).as("mx"),
          coalesce(sum(when(col("sh") === plant.getLong(1), col("df"))), lit(0L))
            .as("plantDf")).head()
      val maxPreDf = prof.getAs[Long]("mx")
      val plantDf = prof.getAs[Long]("plantDf")

      // the operator itself, kernel tail forced, task durations captured.
      // For the exposure variant (no maxDf) the raw and salted tails run
      // BACK TO BACK on the same planted checkpoint, then raw repeats —
      // the within-session controlled triple this host's x100 noise
      // demands (PERF.md reading (b): cross-session walls swing 3–4×;
      // only same-session deltas and task SHAPE are trustworthy here)
      def runOnce(tag: String, budget: Long): Unit = {
        listener.clearAll()
        spark.sparkContext.addSparkListener(listener)
        val (wall, _) = timeIt {
          graft.ops.Dedup.jaccardNearDup(planted, "doc_id", "text", n,
              threshold, mdf, sigBroadcastBytes = -1L, hotPairBudget = budget)
            .write.format("noop").mode("overwrite").save()
        }
        Thread.sleep(1500) // listener bus is async — drain before reading
        spark.sparkContext.removeSparkListener(listener)
        val ds = listener.durations.toArray(Array.empty[java.lang.Long])
          .map(_.longValue).sorted
        val maxTask = if (ds.isEmpty) 0L else ds.last
        val p50Task = if (ds.isEmpty) 0L else ds(ds.length / 2)
        println(f"[skew] x$k%-3d $label$tag dPlant=$dPlant%5d maxDf=${mdf.getOrElse(-1)}%4d | " +
          f"prefixMaxDf=$maxPreDf%6d plantPrefixDf=$plantDf%6d " +
          f"pairMass~${plantDf * math.max(plantDf - 1, 0) / 2}%10d | " +
          f"wall=$wall%7.2fs maxTask=${maxTask / 1000.0}%6.2fs p50Task=${p50Task / 1000.0}%5.2fs " +
          f"tasks=${ds.length}%5d")
        import scala.jdk.CollectionConverters._
        listener.stageMax.asScala.toSeq.sortBy(-_._2).take(5)
          .foreach { case (sid, mx) =>
            println(f"[skew-stage] $label$tag s$sid%-4d max=${mx / 1000.0}%7.2fs " +
              f"sum=${listener.stageSum.getOrDefault(sid, 0L) / 1000.0}%8.1fs  " +
              listener.stageName.getOrDefault(sid, "?").take(90))
          }
        listener.topTasks.asScala.toSeq.sortBy(-_._2).take(8)
          .foreach { case (sid, dur, recs, spillMb, gc) =>
            println(f"[skew-task]  $label$tag s$sid%-4d ${dur / 1000.0}%7.2fs " +
              f"recsIn=$recs%10d spill=${spillMb}MB gc=${gc / 1000.0}%5.1fs")
          }
      }
      if (mdf.isEmpty) {
        // SPARK_GRAFT_RUNS trims/reorders the triple (e.g. "salt" for a
        // lean single-measurement session — within-session run order
        // contaminates sums via GC at this rung)
        val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "raw,salt,raw2")
          .split(",").map(_.trim).toSeq
        runs.foreach {
          case "raw"  => runOnce(" raw ", Long.MaxValue)
          case "salt" => runOnce(" salt", graft.ops.Dedup.HotPrefixPairBudget)
          case "raw2" => runOnce(" raw2", Long.MaxValue)
          case other  => sys.error(s"unknown run '$other'")
        }
      } else runOnce("", graft.ops.Dedup.HotPrefixPairBudget)
    }
    spark.stop()
  }
}
