package graft.engine.export

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

class ExportersSpec extends SparkSpec {
  import spark.implicits._

  /** Fixed 5-row golden frame (FIXTURES.md §3): mixed types, a NULL, and
    * delimiter/quote/xml metacharacters. */
  private def golden = Seq(
    (1L, "alpha", 10.5, true, Timestamp.valueOf("2024-01-01 00:00:00")),
    (2L, "be,ta", 20.0, false, Timestamp.valueOf("2024-02-02 12:30:00")),
    (3L, "ga\"mma", 30.25, true, Timestamp.valueOf("2024-03-03 23:59:59")),
    (4L, null.asInstanceOf[String], 40.75, false, Timestamp.valueOf("2024-04-04 06:15:00")),
    (5L, "ep<si>lon&", 50.0, true, Timestamp.valueOf("2024-05-05 18:45:30"))
  ).toDF("id", "name", "score", "flag", "created")

  private def tmp(ext: String): String =
    Files.createTempFile("graft-export", s".$ext").toString

  test("csv: header, minimal quoting, empty for null") {
    val p = tmp("csv")
    Exporters.write(golden, "csv", p)
    val lines = Files.readAllLines(Paths.get(p))
    assert(lines.get(0) == "id,name,score,flag,created")
    assert(lines.get(2) == "2,\"be,ta\",20.0,false,2024-02-02 12:30:00.0")
    assert(lines.get(3).startsWith("3,\"ga\"\"mma\""))
    assert(lines.get(4).startsWith("4,,"))
    assert(lines.size == 6)
  }

  test("tsv: tab-separated, commas unquoted") {
    val p = tmp("tsv")
    Exporters.write(golden, "tsv", p)
    val lines = Files.readAllLines(Paths.get(p))
    assert(lines.get(0) == "id\tname\tscore\tflag\tcreated")
    assert(lines.get(2).startsWith("2\tbe,ta\t20.0"))
  }

  test("json orient=split: pandas key order and null handling") {
    val p = tmp("json")
    Exporters.write(golden, "json", p)
    val s = Files.readString(Paths.get(p))
    assert(s.startsWith("""{"columns":["id","name","score","flag","created"],"data":[["""))
    assert(s.contains("""[1,"alpha",10.5,true,"""))
    assert(s.contains("""[4,null,40.75,false,"""))
    assert(s.endsWith("]}"))
  }

  test("xml: data/row shape, escaped entities, null column omitted") {
    val p = tmp("xml")
    Exporters.write(golden, "xml", p)
    val s = Files.readString(Paths.get(p))
    assert(s.startsWith("<?xml version='1.0' encoding='utf-8'?>\n<data>"))
    assert(s.contains("<name>ep&lt;si&gt;lon&amp;</name>"))
    // row 4's name is null -> no <name> element between its id and score
    val row4 = s.split("<row>")(4)
    assert(row4.contains("<id>4</id>") && !row4.contains("<name>"))
    assert(s.endsWith("</data>"))
  }

  test("parquet: single file, types preserved, roundtrips") {
    val p = tmp("parquet")
    Exporters.write(golden, "parquet", p)
    assert(new java.io.File(p).isFile)
    val back = spark.read.parquet(p)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      golden.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 5)
    assert(back.filter($"id" === 4).select("name").collect().head.isNullAt(0))
  }

  test("feather: valid Arrow IPC file, readable with correct values") {
    val p = tmp("feather")
    Exporters.write(golden, "feather", p)
    // read back via Arrow's own reader
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val ch = java.nio.channels.FileChannel.open(Paths.get(p))
    val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
    try {
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      assert(root.getRowCount == 5)
      assert(root.getSchema.getFields.size() == 5)
      val ids = root.getVector("id").asInstanceOf[org.apache.arrow.vector.BigIntVector]
      assert((0 until 5).map(ids.get) == Seq(1L, 2L, 3L, 4L, 5L))
      val names = root.getVector("name").asInstanceOf[org.apache.arrow.vector.VarCharVector]
      assert(names.isNull(3))
      assert(new String(names.get(0), "UTF-8") == "alpha")
    } finally { reader.close(); ch.close(); alloc.close() }
  }

  test("xlsx: valid zip with the 5 OOXML parts and inline-string cells") {
    val p = tmp("xlsx")
    Exporters.write(golden, "xlsx", p)
    val zf = new java.util.zip.ZipFile(p)
    try {
      val names = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      assert(names.toSet == Set("[Content_Types].xml", "_rels/.rels",
        "xl/workbook.xml", "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
      val sheet = new String(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
      assert(sheet.contains("""<c r="A1" t="inlineStr"><is><t>id</t></is></c>"""))
      assert(sheet.contains("""<c r="A2"><v>1</v></c>"""))         // numeric cell
      assert(sheet.contains("ga&quot;mma"))                        // escaped
      assert(sheet.count(_ == '<') > 10 && sheet.contains("</sheetData>"))
    } finally zf.close()
  }

  test("unsupported format raises") {
    intercept[IllegalArgumentException] {
      Exporters.write(golden, "pdf", tmp("pdf"))
    }
  }

  test("exporters stream toLocalIterator: bytes hit disk before the last partition is produced") {
    // round-5 verdict #6: the O(1-row)-driver-memory contract was only a
    // code comment. Pin it behaviorally: every source partition records
    // the output file's on-disk size at the moment it STARTS producing
    // rows (local-mode tasks share the JVM, so a static probe sees them
    // all). The streaming writer consumes partition k before the job for
    // partition k+1 runs, so by the later partitions megabytes are
    // already flushed. A refactor to collect() materializes all
    // partitions before the first write — every observation becomes
    // ~0 bytes and the size assertion fails.
    val n = 300000L
    val threshold = n / 10 // >> any header/magic bytes, << the flushed MBs
    for (fmt <- Seq("csv", "json", "xml", "feather")) {
      val p = tmp(fmt)
      ExportStreamProbe.reset(p)
      val ds = spark.range(0, n, 1, 8).mapPartitions { it =>
        ExportStreamProbe.sizesAtPartitionStart.add(
          new java.io.File(ExportStreamProbe.path).length())
        it.map(i => (i, s"row_value_$i"))
      }.toDF("id", "name")
      Exporters.write(ds, fmt, p)
      val sizes = {
        val b = Seq.newBuilder[Long]
        ExportStreamProbe.sizesAtPartitionStart.forEach(s => b += s)
        b.result()
      }
      assert(sizes.length == 8, s"$fmt: expected 8 partition starts, got $sizes")
      assert(sizes.max > threshold,
        s"$fmt accumulated instead of streaming: sizes at partition start = $sizes")
      assert(new java.io.File(p).length() > 0)
    }
  }
}

/** Probe for the streaming-export contract: records the export file's
  * on-disk size when each partition starts producing (shared-JVM static —
  * valid in local mode only, which is where specs run). */
object ExportStreamProbe {
  @volatile var path: String = ""
  val sizesAtPartitionStart = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  def reset(p: String): Unit = { path = p; sizesAtPartitionStart.clear() }
}
