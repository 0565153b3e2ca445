// scratch: piecewise timing of the jaccard pipeline
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    time("tokens only") {
      docs.select(col("doc_id"), Text.tokens(col("text")).as("ws"))
        .select(count(lit(1))).collect().head.getLong(0)
    }
    time("shingle arrays") {
      Dedup.shingleArrays(docs, "doc_id", "text", 3).select(count(lit(1))).collect().head.getLong(0)
    }
    time("postings (explode)") {
      Dedup.postings(docs, "doc_id", "text", 3).select(count(lit(1))).collect().head.getLong(0)
    }
    time("hashed postings agg") {
      Dedup.hashedPostings(docs, "doc_id", "text", 3)
        .groupBy("sh").count().select(count(lit(1))).collect().head.getLong(0)
    }
    val post = Dedup.hashedPostings(docs, "doc_id", "text", 3).cache()
    time("postings cached") { post.count() }
    time("pair join (cached input)") {
      val a = post.select(col("sh"), col("doc").as("doc_a"))
      val b = post.select(col("sh"), col("doc").as("doc_b"))
      a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)))
        .select(count(lit(1))).collect().head.getLong(0)
    }
    time("full jaccardNearDup") {
      Dedup.jaccardNearDup(docs, "doc_id", "text", 3, 0.6).count()
    }
    spark.stop()
  }
}
