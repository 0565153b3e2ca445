package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scale rung for the COMPOSITION pipelines (r18 verdict #4): the c24
  * curation family composes primitives that each carry 100–400× direct
  * evidence, but the compositions themselves were measured only to 25× —
  * and compositions are where checkpoint pressure and repeated eager
  * gates could stack nonlinearly (the CompactProfile session-composition
  * precedent: 35.8 s for stages summing to 5.2 s under sibling
  * checkpoint pressure).
  *
  * Runs the three deepest compositions EXACTLY as the bench/driver run
  * them — through `SparkEntry.queries` on a scaled table dir, so the
  * measured plan is the product plan, not a re-derivation:
  *  - c24_curation_v5: 3-rule decontamination union (n-gram + semantic
  *    + winnow substring) → one count-gated removal → quality filter;
  *  - c24_curation_v7: decon → per-lang LM NLL terciles (drop tail) →
  *    temperature rebalance;
  *  - c24_curation_v9: decon → per-lang prototype scores → grouped
  *    rank tercile → rebalance.
  * Per-stage attribution via the Scale100 listener discipline (top
  * stages by executor run time, plus GC fraction and spill), so any
  * bending rung names its stage.
  *
  * Also measures the EAGER-GATE COMPOSE cost (r18 verdict #6):
  * [[Dedup.jaccardNearDup]] runs 2–4 Spark jobs at plan-COMPOSE time
  * (the sig checkpoint + stats agg; + the prefix-df pass when maxDf is
  * absent). A caller building N variant plans pays N× that before any
  * execution. Timed here compose-ONLY (the returned frame is dropped
  * unexecuted), 3 composes per shape per rung.
  *
  * Scaled corpora: [[ScaleBench.scaled]]/[[ScaleBench.scaledEmb]] under
  * /tmp/graft_scale_x{k} (shared with Scale100; built if missing).
  * Replica 0 keeps the original ids, so the `doc_id < 50` bench window
  * the c24 queries split on stays FIXED while the corpus grows — the
  * decontamination scaling story a real pipeline has.
  *
  * Run: sbt "runMain graft.tools.CurationScale"
  * (SPARK_GRAFT_KS default "25,100"; SPARK_GRAFT_CPUS default 32)
  */
object CurationScale {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ks = sys.env.getOrElse("SPARK_GRAFT_KS", "25,100")
      .split(",").map(_.trim.toInt).toSeq
    // shuffle partitions scale with the rung (Scale100's rule: size
    // partitions to fit executor memory at the target SF)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val base = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "documents")
    val baseEmb = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "embeddings")

    def timeIt[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val out = body
      ((System.nanoTime() - t0) / 1e9, out)
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Scale100's listener: per-stage run time (top stages), GC, spill —
    // the attribution that lets a bending rung name its stage
    def attributed(tag: String)(body: => Unit): (Double, Long, Long) = {
      val gc = new java.util.concurrent.atomic.AtomicLong(0L)
      val run = new java.util.concurrent.atomic.AtomicLong(0L)
      val spillD = new java.util.concurrent.atomic.AtomicLong(0L)
      val stageRun = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            gc.addAndGet(m.jvmGCTime); run.addAndGet(m.executorRunTime)
            spillD.addAndGet(m.diskBytesSpilled)
            stageRun.merge(te.stageId, m.executorRunTime, Long.box(_) + _)
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stageName.put(sc.stageInfo.stageId, sc.stageInfo.name)
      }
      spark.sparkContext.addSparkListener(l)
      try body
      finally { Thread.sleep(1500); spark.sparkContext.removeSparkListener(l) }
      import scala.jdk.CollectionConverters._
      stageRun.asScala.toSeq.sortBy(-_._2).take(6).foreach { case (sid, ms) =>
        println(f"[cur-stage] $tag s$sid%-4d ${ms / 1000.0}%8.1fs  " +
          stageName.getOrDefault(sid, "?"))
      }
      (gc.get() / math.max(run.get(), 1L).toDouble,
        run.get() / 1000L, spillD.get() >> 20)
    }

    val queries = graft.SparkEntry.queries
    // SPARK_GRAFT_CUR=v9 runs ONE composition lean (the Scale100 family
    // sections' lesson: sibling checkpoints contaminate the deepest rung
    // — v9's first x100 read 58% GC in the shared session); "compose"
    // runs only the compose-cost rows
    val sel = sys.env.getOrElse("SPARK_GRAFT_CUR", "all")
    val family = Seq("c24_curation_v5", "c24_curation_v7", "c24_curation_v9")
      .filter(n => sel == "all" || n.endsWith(sel))
    val doCompose = sel == "all" || sel == "compose"

    // warm codegen untimed on the base dir (ScaleBench's rule)
    family.foreach(n => noop(queries(n)(spark, "/root/testdata/sf0.01")))

    for (k <- ks) {
      val dir = s"/tmp/graft_scale_x$k"
      if (!new java.io.File(s"$dir/documents.parquet").exists())
        ScaleBench.scaled(base, k).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      if (!new java.io.File(s"$dir/embeddings.parquet").exists())
        ScaleBench.scaledEmb(baseEmb, k).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()

      for (name <- family) {
        var wall = 0.0
        val (gcFrac, runS, spillMb) = attributed(s"x$k $name") {
          val (t, _) = timeIt(noop(queries(name)(spark, dir)))
          wall = t
        }
        println(f"[cur] x$k%-3d docs=$nDocs%7d $name%-18s " +
          f"wall=$wall%7.2fs gc=${gcFrac * 100}%4.1f%% run=${runS}s " +
          f"spill=${spillMb}MB")
      }

      // eager-gate compose-ONLY cost (verdict #6): plan built, never
      // executed. maxDf present = 2 eager jobs (sig checkpoint + stats
      // agg); absent = +prefix-df pass + hot-key count
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      for (shape <- Seq("maxDf" -> Some(100), "noMaxDf" -> None) if doCompose) {
        val walls = (1 to 3).map { _ =>
          timeIt(Dedup.jaccardNearDup(docs, "doc_id", "text",
            n = 3, threshold = 0.6, maxDf = shape._2))._1
        }
        println(f"[cur] x$k%-3d composeOnly jaccardNearDup(${shape._1}%-7s) " +
          walls.map(w => f"$w%6.2fs").mkString(" "))
      }
    }
    spark.stop()
  }
}
