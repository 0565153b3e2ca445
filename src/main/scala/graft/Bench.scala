package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.control.NonFatal

object Bench {

  /** One timed run through the noop sink. Returns (seconds, error). A
    * failure is REPORTED, never swallowed: a query that starts throwing
    * must not bench as a ~0.1 s "speedup" (round-3 verdict, harness
    * honesty). */
  def once(spark: SparkSession, sfDir: String,
           fn: (SparkSession, String) => DataFrame): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    try {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, None)
    } catch {
      case NonFatal(e) =>
        ((System.nanoTime() - t0) / 1e9,
          Some(e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r\t]", " ").take(120)))
    }
  }

  /** Run every query best-of-2 and emit ONE compact JSON line. Returns
    * (jsonLine, failedCount) so the main can exit nonzero on failures and
    * specs can exercise the error path without a process exit. */
  def runAll(spark: SparkSession, sfDir: String,
             queries: Map[String, (SparkSession, String) => DataFrame]): (String, Int) = {
    // best-of-2 per query: single-shot timings on this box swing 2-3x
    // from background noise; the min measures the plan, not the noise.
    // noop sink, not count(): count() lets Catalyst prune projections the
    // count never reads (PERF.md finding 9); noop materializes every column.
    val results = queries.map { case (name, fn) =>
      val (t1, e1) = once(spark, sfDir, fn)
      val (sec, err) =
        if (e1.isDefined) (t1, e1) // broken: don't re-run, report
        else { val (t2, e2) = once(spark, sfDir, fn); (math.min(t1, t2), e2) }
      name -> (sec, err)
    }
    // 3 significant figures, always with a decimal point (parseable, and
    // shorter entries keep the one-line JSON inside the driver's bounded
    // stdout tail window — round-6 verdict #5). Sub-second timings keep
    // 3 decimals: rounding 0.047 to "0.05" would put fast-query A/B
    // deltas on a 0.01 s grid coarser than the real movement.
    def r3(v: Double): String =
      BigDecimal(v).setScale(if (v < 1) 3 else if (v < 10) 2 else 1,
        BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (v, _)) => s"\"$k\":${r3(v)}" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) => s"\"$k\":\"$e\"" }
    val total = results.values.map(_._1).sum
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,""" +
      s""""errors":${errs.mkString("{", ",", "}")},"failed":${errs.size},"sf":"$sfDir"}"""
    (json, errs.size)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // 60+ queries in one session: without frequent cleaner GC the
      // accumulated broadcast/shuffle blocks from earlier queries choke
      // the memory store (default periodicGC is 30min — never fires here)
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec's "No Partition Defined" warning fires on prefixSum's
    // OFFSETS window — a ≤ shuffle-partitions-row frame by construction
    // (Relational.prefixSum phase 2), not a data-sized funnel. Silence it
    // so bench logs don't cry wolf; a REAL single-partition data window
    // would be caught by PlanShapeSpec, not by log scraping.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // warm the JVM/codegen/parquet-reader paths so the first timed query
    // doesn't absorb session startup
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case NonFatal(_) => () }
    val (json, failed) = runAll(spark, sfDir, SparkEntry.queries)
    // durable copy first: the driver captures stdout through a bounded
    // TAIL window, which head-truncated the JSON line in rounds 5 AND 6
    // — the file can never lose data, and the pointer line says where
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes("UTF-8"))
      println(s"bench: wrote $out")
    } catch { case NonFatal(e) => System.err.println(s"[bench] file write failed: $e") }
    // stop BEFORE printing the payload: shutdown chatter must not land
    // between the JSON and end-of-stream — the line is the FINAL stdout
    // this main emits, maximizing what survives the tail window
    try spark.stop() catch { case NonFatal(_) => () }
    println(json)
    System.out.flush()
    if (failed > 0) sys.exit(1)
  }
}
