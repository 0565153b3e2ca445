package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The r19-verdict-#3 measurement: v9's x400 rung read 104.8 s / 30% GC
  * attributed to "GC-inflated decimal-HOF scoring"
  * ([[graft.ops.Similarity.dotDec]]/[[graft.ops.Similarity.normDec]] —
  * `aggregate(zip_with(...))` folds with per-element decimal casts).
  * Before writing a codegen decimal-fold expression (the measured-need
  * rule, PERF findings 1–3), attribute the stage: is the cost the HOF
  * evaluation (interpreted per element — finding 1/16) or the decimal
  * boxing specifically?
  *
  * Three variants of the SAME broadcast-path scoring projection, on the
  * same scaled embeddings, isolating one term each:
  *  - `decHof`   — the production shape: decimal(18,6) per-element cast,
  *    decimal(28,6) fold, both HOFs (dot + self-norm);
  *  - `dblHof`   — identical HOF structure, DOUBLE arithmetic (isolates
  *    the decimal term; result not oracle-reproducible, measurement only);
  *  - `codegen`  — [[graft.functions.VecFunctions.vecDot]] for dot and
  *    self-norm (isolates the HOF-interpretation term; the double
  *    codegen floor a decimal codegen expression could approach).
  *
  * Run: sbt "runMain graft.tools.DecProfile"
  * (SPARK_GRAFT_KS default "100,400"; SPARK_GRAFT_CPUS default 32) */
object DecProfile {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ks = sys.env.getOrElse("SPARK_GRAFT_KS", "100,400")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.ops.Similarity

    val baseEmb = graft.engine.Tables.read(spark, "/root/testdata/sf0.1", "embeddings")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def gcAttributed(body: => Unit): (Double, Double) = {
      val gc = new java.util.concurrent.atomic.AtomicLong(0L)
      val run = new java.util.concurrent.atomic.AtomicLong(0L)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) { gc.addAndGet(m.jvmGCTime); run.addAndGet(m.executorRunTime) }
        }
      }
      spark.sparkContext.addSparkListener(l)
      val w = try timed(body)
      finally { Thread.sleep(1000); spark.sparkContext.removeSparkListener(l) }
      (w, gc.get() / math.max(run.get(), 1L).toDouble)
    }

    // the double-HOF twin of dotDec/normDec: same lambda structure, no
    // decimal — the isolation arm, never a production path
    def dotDbl(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, z) => acc + z)
    def normDbl(a: org.apache.spark.sql.Column) =
      aggregate(transform(a, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, z) => acc + z)
    // the LITERAL HOF fold (pre-r20 production shape) — measured as its
    // own arm so the matrix outlives the Similarity wiring, which now
    // points at the codegen DecDot this measurement justified
    def dotDecHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) => (x.cast("double") * y).cast("decimal(18,6)")),
        lit(BigDecimal(0)).cast("decimal(28,6)"),
        (acc, z) => (acc + z).cast("decimal(28,6)")).cast("double")
    def normDecHof(a: org.apache.spark.sql.Column) =
      aggregate(
        transform(a, x => (x.cast("double") * x.cast("double")).cast("decimal(18,6)")),
        lit(BigDecimal(0)).cast("decimal(28,6)"),
        (acc, z) => (acc + z).cast("decimal(28,6)")).cast("double")

    for (k <- ks) {
      val dir = s"/tmp/graft_scale_x$k"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists())
        ScaleBench.scaledEmb(baseEmb, k).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      // v9's shape: per-group centroids broadcast as arrays, every row
      // scores in one projection — group count lang-like (12)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("grp", pmod(col("vec_id"), lit(12)))
        .localCheckpoint(true)
      val n = emb.count()
      val protos = Similarity.prototypes(emb, "embedding", "grp")
        .withColumnRenamed("grp", "pgrp").localCheckpoint(true)
      val joined = emb.join(broadcast(protos), col("grp") === col("pgrp"))

      val variants: Seq[(String, DataFrame)] = Seq(
        "decHof" -> joined.select(col("vec_id"),
          dotDecHof(col("embedding"), col("__cen")).as("dot"),
          normDecHof(col("embedding")).as("ne")),
        "dblHof" -> joined.select(col("vec_id"),
          dotDbl(col("embedding"), col("__cen")).as("dot"),
          normDbl(col("embedding")).as("ne")),
        "codegen" -> joined.select(col("vec_id"),
          graft.functions.VecFunctions.vecDot(col("embedding"), col("__cen")).as("dot"),
          graft.functions.VecFunctions.vecDot(col("embedding"), col("embedding")).as("ne")),
        // the shipped form: Similarity.dotDec/normDec → codegen DecDot
        "decDot" -> joined.select(col("vec_id"),
          Similarity.dotDec(col("embedding"), col("__cen")).as("dot"),
          Similarity.normDec(col("embedding")).as("ne")))

      variants.foreach { case (tag, df) => noop(df.limit(1000)) } // warm codegen
      for ((tag, df) <- variants) {
        val runs = (1 to 2).map(_ => gcAttributed(noop(df)))
        val best = runs.minBy(_._1)
        println(f"[dec] x$k%-3d rows=$n%8d $tag%-8s wall=${best._1}%7.2fs " +
          f"gc=${best._2 * 100}%4.1f%%  (runs: ${runs.map(r => f"${r._1}%.2f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
