package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Text

/** A/B harness for the fingerprint rolling hash (measured:
  * c15_fingerprint regressed 0.20 → 0.98 s when the HOF
  * `aggregate(tokens, 0L, (acc, w) => xxhash64(acc, w))` form landed —
  * measure the interpreted-lambda chain against the fused codegen
  * [[graft.functions.RollingTokenHash]] loop on the same corpus).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.FingerprintAb"
  */
object FingerprintAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // no checkpoint: the registered query scans parquet, so the A/B should too
    def docs = graft.engine.Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    def timeIt(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[fpab] $label%-24s $s%7.2f s"); s
    }

    def hof = docs.select(col("doc_id"),
      aggregate(Text.tokens(col("text")), lit(0L), (acc, w) => xxhash64(acc, w)).as("fingerprint"))
    def fused = docs.select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))

    for (round <- 1 to 3) {
      println(s"=== round $round ===")
      timeIt("hof (r4)") { hof.write.format("noop").mode("overwrite").save() }
      timeIt("fused codegen (r5)") { fused.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
