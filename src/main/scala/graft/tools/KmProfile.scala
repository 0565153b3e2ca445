// scratch profiler: job-level attribution of one mllib KMeans fit at bench
// scale (r21 opt) — the in-query ANN paths are pinned to per-call training
// (honest-training rule), so the only legitimate lever is fit overhead that
// does not change the trained centroids.
//   sbt "runMain graft.ops.KmProfile [sfDir]"
package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

object KmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var log = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts.put(js.jobId, js.time)
        names.put(js.jobId, js.stageInfos.map(si =>
          si.name.takeWhile(_ != '(').take(40) + s"[${si.numTasks}t]").mkString("|").take(150))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (log) Option(starts.remove(je.jobId)).foreach { s =>
          println(f"[kmjob] job=${je.jobId}%3d ${(je.time - s) / 1e3}%7.3f s  ${names.getOrDefault(je.jobId, "")}")
        }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val emb = graft.engine.Tables.read(spark, sfDir, "embeddings")
    // warm fit (codegen, classloading)
    Ivf.trainCentroids(emb, "embedding", 32, 42L)
    Thread.sleep(200)
    log = true
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      Ivf.trainCentroids(emb, "embedding", 32, 42L)
      println(f"[kmprofile] warm fit k=32 round $r total ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    log = false
    spark.stop()
  }
}
