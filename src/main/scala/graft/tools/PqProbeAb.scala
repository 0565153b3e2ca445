// scratch A/B for the IVFADC probe's per-row expression cost (r21 opt):
// where does a warm shortlist execution's ~1.4 s go on 2000 rows?
//   base   — scan + cell assignment only (the floor)
//   orig   — the registered shape: pqCode(residualOf(vec)) duplicates the
//            zip_with residual subtree into all 8 subspace slices
//   resCol — residual computed ONCE into a column, pqCode reads it
//   adcNoRes — pqCode over the raw vector (wrong result, isolates the
//            zip_with residual's cost from the NearestCells+ADC cost)
// 7 reps each, min + all times printed.
//   sbt "runMain graft.ops.PqProbeAb [sfDir]"
package graft.ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PqProbeAb {
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
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val emb = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0)
    val n = corpus.count()
    val cells = Ivf.clampK(Ivf.cellsForSearch(n, 4), n)
    val model = Ivf.trainModel(corpus, "embedding", cells, 42L)
    val indexed = model.indexOf(corpus, "vec_id", "embedding")
    val trainBase = indexed
      .select(model.residualOf(col("embedding")).as("__res")).localCheckpoint(true)
    val cb = Quantize.trainPq(trainBase, "__res", 8, 16, 42L)
    val q = query.select(col("embedding").cast("array<double>").as("__q"))
      .head().getSeq[Double](0).toArray
    val probed = model.probedCells(q, 4).map(Integer.valueOf)

    def shortlistOf(adc: DataFrame => DataFrame): DataFrame =
      adc(indexed.filter(col("cell").isin(probed: _*)))
        .orderBy(col("__adc").desc, col("vec_id"))
        .limit(100)

    val variants: Seq[(String, DataFrame)] = Seq(
      "base(scan+cell only)" -> indexed.filter(col("cell").isin(probed: _*))
        .select(col("vec_id"), col("embedding"), col("cell").cast("double").as("__adc"))
        .orderBy(col("__adc").desc, col("vec_id")).limit(100),
      "orig(dup residual)" -> shortlistOf(df => df.select(
        col("vec_id"), col("embedding"),
        (model.cellDot(q) + Quantize.pqAdcScore(
          Quantize.pqCode(model.residualOf(col("embedding")), cb), cb, q)).as("__adc"))),
      "resCol(residual once)" -> shortlistOf(df => df
        .withColumn("__res0", model.residualOf(col("embedding")))
        .select(col("vec_id"), col("embedding"),
          (model.cellDot(q) + Quantize.pqAdcScore(
            Quantize.pqCode(col("__res0"), cb), cb, q)).as("__adc"))),
      "adcNoRes(raw vec)" -> shortlistOf(df => df.select(
        col("vec_id"), col("embedding"),
        (model.cellDot(q) + Quantize.pqAdcScore(
          Quantize.pqCode(col("embedding").cast("array<double>"), cb), cb, q)).as("__adc")))
    )
    // results-equal check for the bit-identity claim (orig vs resCol)
    val a = variants(1)._2.collect().map(_.toString).toSeq
    val b = variants(2)._2.collect().map(_.toString).toSeq
    println(s"[pqab] orig==resCol rows: ${a == b} (${a.size} rows)")

    for ((label, df) <- variants) {
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[pqab] $label%-24s min=${times.min}%7.3f  all=${times.map(t => f"$t%5.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
