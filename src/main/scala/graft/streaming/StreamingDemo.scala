package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable streaming evidence: stream the events table through a
  * watermarked tumbling-window aggregation and show the result equals
  * the batch run of the SAME expression (Spark's unified model).
  * Usage: runMain graft.streaming.StreamingDemo <sfDir> */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the nanos-converted events as a file-source stream input
    val stageDir = java.nio.file.Files.createTempDirectory("events-stream").toString
    val events = graft.engine.Tables.read(spark, sfDir, "events")
    events.write.mode("overwrite").parquet(stageDir)

    val q = Streaming.tumblingCounts(
      Streaming.readEventsStream(spark, stageDir), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("demo_sink")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("demo_sink")
    val batch = Streaming.tumblingCounts(events, "1 hour", "10 minutes")
    val sRows = streamed.orderBy("w_start", "event_type").collect().map(_.toSeq)
    val bRows = batch.orderBy("w_start", "event_type").collect().map(_.toSeq)

    println(s"streamed_windows: ${sRows.length}")
    println(s"batch_windows:    ${bRows.length}")
    println(s"identical: ${sRows.sameElements(bRows)}")
    streamed.orderBy(col("n").desc).limit(5).collect()
      .foreach(r => println(s"  ${r.mkString(" | ")}"))
    spark.stop()
  }
}
