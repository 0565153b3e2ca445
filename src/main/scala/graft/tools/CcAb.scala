package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** A/B harness for the connected-components pointer-jumping gate
  * (c13_dedup_components once regressed 6.6→9.6 s in the
  * driver bench while the operator gained pointer jumping — measure
  * whether the per-round self-join pays for itself at realistic shallow
  * component diameters, and where the crossover sits on deep chains).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.CcAb"
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = graft.engine.Tables.read(spark, sfDir, "documents")

    def timeIt(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ccab] $label%-28s $s%7.2f s"); s
    }

    // realistic shape: CC over the actual jaccard near-dup pair graph
    def realPairs = Dedup.jaccardNearDup(docs, "doc_id", "text",
      n = 3, threshold = 0.6, maxDf = Some(100))
    // deep shape: a synthetic diameter-1000 chain, where jumping must win
    def chain = spark.range(1, 1001).select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))

    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      for ((label, jumpFrom) <- Seq(("real jump=always(r3)", 1),
                                    ("real jump=gated(r4)", 3),
                                    ("real jump=never", Int.MaxValue))) {
        timeIt(label) {
          val (labels, rounds) = Dedup.connectedComponentsWithRounds(
            realPairs, maxIter = 20, jumpFromRound = jumpFrom)
          labels.write.format("noop").mode("overwrite").save()
          println(s"[ccab]   rounds=$rounds")
        }
      }
      // the round-13 large-star/small-star core on the same frames — the
      // shallow-graph comparison lives in ScaleBench's ccStar column;
      // this adds the deep-chain side the sweep can't show
      timeIt("real star") {
        val (labels, rounds) = Dedup.connectedComponentsStarWithRounds(
          realPairs, maxIter = 20)
        labels.write.format("noop").mode("overwrite").save()
        println(s"[ccab]   rounds=$rounds")
      }
      // never-jump on the chain is O(d) = 1000 rounds — analytically hopeless,
      // not worth 10 minutes of wall clock to confirm; measure the two
      // O(log d) variants only
      for ((label, jumpFrom) <- Seq(("chain jump=always", 1),
                                    ("chain jump=gated", 3))) {
        timeIt(label) {
          val (labels, rounds) = Dedup.connectedComponentsWithRounds(
            chain, maxIter = 30, jumpFromRound = jumpFrom)
          labels.write.format("noop").mode("overwrite").save()
          println(s"[ccab]   rounds=$rounds")
        }
      }
      timeIt("chain star") {
        val (labels, rounds) = Dedup.connectedComponentsStarWithRounds(
          chain, maxIter = 30)
        labels.write.format("noop").mode("overwrite").save()
        println(s"[ccab]   rounds=$rounds")
      }
    }
    spark.stop()
  }
}
