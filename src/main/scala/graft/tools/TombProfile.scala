// scratch profiler for c14_ann_index_tombstone (r22): per-verb wall and
// Spark-job counts for the mutating lifecycle chain the query times —
// clearLock, removeIds(tombstone), probe+checkpoint, compactIndex,
// indexStats — at bench scale the wall is sequential driver actions, so
// the job count is the cost model (the CurProfile pattern).
//   sbt "runMain graft.tools.TombProfile [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import graft.ops.{IndexLifecycle, Ivf}

object TombProfile {
  private val jobs = new AtomicInteger(0)
  private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
  private val jobMs = new AtomicLong(0L)

  private def time[A](label: String)(f: => A): A = {
    val j0 = jobs.get(); val m0 = jobMs.get()
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(50)
    println(f"[tombprofile] $label%-44s ${dt}%7.3f s  jobs=${jobs.get() - j0}%3d  jobtime=${(jobMs.get() - m0) / 1e3}%7.2f s")
    r
  }

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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(starts.remove(je.jobId)).foreach(s => jobMs.addAndGet(je.time - s))
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()

    graft.queries.QueryDefs.warmServeFixtures(spark, sfDir)
    val emb = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val victims = Seq(2L, 3L, 4L)
    for (round <- 1 to 3) {
      println(s"── round $round ─────────────────────────────")
      val dir = time("ensureTombIndex (fixture, warm)")(
        graft.queries.QueryDefs.ensureTombIndex(spark, sfDir))
      time("clearLock")(IndexLifecycle.clearLock(spark, dir))
      time("removeIds(tombstone=true)")(
        IndexLifecycle.removeIds(spark, dir,
          emb.filter(col("vec_id").isin(victims.map(java.lang.Long.valueOf): _*))
            .select("vec_id"),
          "vec_id", tombstone = true))
      time("probe + 1-row checkpoint")(
        Ivf.probeIndex(spark, dir, "vec_id", "embedding",
          emb.filter(col("vec_id") === 0), "embedding", k = 10)
          .agg(count(lit(1)).as("k_rows"),
            sum(when(col("vec_id").isin(victims.map(java.lang.Long.valueOf): _*), 1)
              .otherwise(0)).as("victim_hits"))
          .localCheckpoint(true))
      time("compactIndex")(IndexLifecycle.compactIndex(spark, dir))
      time("indexStats (noop)")(
        IndexLifecycle.indexStats(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
