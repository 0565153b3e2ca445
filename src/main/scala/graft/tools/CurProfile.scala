// scratch profiler for the c24 curation compositions (r21 opt): times each
// stage of curation_v7 and counts the Spark JOBS each stage launches — at
// sf0.1 the wall is sequential driver actions (gates, checkpoints, rank
// boundaries), so the job count IS the cost model.
//   sbt "runMain graft.ops.CurProfile [sfDir]"
package graft.ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

object CurProfile {
  private val jobs = new AtomicInteger(0)
  private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
  private val jobMs = new AtomicLong(0L)

  private def time[A](label: String)(f: => A): A = {
    val j0 = jobs.get(); val m0 = jobMs.get()
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(50) // let listener drain
    println(f"[curprofile] $label%-46s ${dt}%7.3f s  jobs=${jobs.get() - j0}%3d  jobtime=${(jobMs.get() - m0) / 1e3}%7.2f s")
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
    // experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").fold(b0)(s =>
      s.split(";").filter(_.contains("=")).foldLeft(b0) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2); bb.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verbose = sys.env.contains("SPARK_GRAFT_JOBLOG")
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts.put(js.jobId, js.time)
        if (verbose) names.put(js.jobId,
          js.stageInfos.map(si => si.name.take(60) + s"(${si.numTasks}t)").mkString(" | ").take(200))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(starts.remove(je.jobId)).foreach { s =>
          jobMs.addAndGet(je.time - s)
          if (verbose) println(f"[joblog] job=${je.jobId}%3d ${(je.time - s) / 1e3}%7.3f s  ${names.getOrDefault(je.jobId, "")}")
        }
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val docs = graft.engine.Tables.read(spark, sfDir, "documents")
    // interleaved same-session A/B of the AQE small-partition coalescing
    // (runtime SQL confs): default (parallelismFirst=true) vs coalesced
    def v7full(): Unit = noop {
      val clean2 = Dedup.decontaminate(docs.filter(col("doc_id") >= 50),
        docs.filter(col("doc_id") < 50), "doc_id", "text", n = 8)
        .localCheckpoint(true)
      val b2 = Text.perplexityBucketsByLang(clean2, "doc_id", "text", "lang")
        .filter(col("bucket") =!= "tail")
      val k2 = clean2.select("doc_id", "lang")
        .join(b2.select(col("doc").as("doc_id"), col("bucket")), Seq("doc_id"))
      Relational.temperatureSample(k2, "lang", "doc_id", baseFrac = 0.5)
    }
    if (sys.env.contains("SPARK_GRAFT_AB")) {
      v7full() // warm
      for (i <- 1 to 4; mode <- Seq("default", "coalesce")) {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst",
          if (mode == "coalesce") "false" else "true")
        // advisory size is Spark's 64m default on both arms — the A/B
        // varies parallelismFirst only (r21 review: the earlier
        // conditional selected "64m" on both branches, a dead knob)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        time(s"v7 full [$mode] rep$i")(v7full())
      }
      spark.stop(); return
    }
    for (round <- 1 to 2) {
      println(s"── round $round ─────────────────────────────")
      val corpus = docs.filter(col("doc_id") >= 50)
      val bench = docs.filter(col("doc_id") < 50)
      val ids = time("v7: contaminatedIds (lazy build+noop)")(
        { val i = Dedup.contaminatedIds(corpus, bench, "doc_id", "text", 8); noop(i); i })
      val cleanRaw = time("v7: decontaminate (removeIds, noop)")(
        { val c = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8); noop(c); c })
      val clean = time("v7: clean.localCheckpoint(true)")(
        Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8).localCheckpoint(true))
      val buckets = time("v7: perplexityBucketsByLang (noop)")(
        { val b = Text.perplexityBucketsByLang(clean, "doc_id", "text", "lang")
            .filter(col("bucket") =!= "tail"); noop(b); b })
      val kept = clean.select("doc_id", "lang")
        .join(buckets.select(col("doc").as("doc_id"), col("bucket")), Seq("doc_id"))
      time("v7: temperatureSample (noop)")(
        noop(Relational.temperatureSample(kept, "lang", "doc_id", baseFrac = 0.5)))
      time("v7: FULL query (fresh, end-to-end)")(
        noop {
          val clean2 = Dedup.decontaminate(docs.filter(col("doc_id") >= 50),
            docs.filter(col("doc_id") < 50), "doc_id", "text", n = 8)
            .localCheckpoint(true)
          val b2 = Text.perplexityBucketsByLang(clean2, "doc_id", "text", "lang")
            .filter(col("bucket") =!= "tail")
          val k2 = clean2.select("doc_id", "lang")
            .join(b2.select(col("doc").as("doc_id"), col("bucket")), Seq("doc_id"))
          Relational.temperatureSample(k2, "lang", "doc_id", baseFrac = 0.5)
        })
    }
    spark.stop()
  }
}
