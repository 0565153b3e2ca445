package graft.engine.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import java.io.{BufferedOutputStream, BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Multi-format result export (reference `app/tasks.py:19-26`: the Celery
  * converter reads the result CSV with pandas and re-encodes to
  * tsv/xlsx/json/xml/feather/parquet).
  *
  * Every writer here produces ONE file, like the reference's pandas
  * `to_*` calls. Single-file emission is inherently a funnel, so all
  * text writers stream through `df.toLocalIterator` — O(1 row) driver
  * memory, never `collect()` — and the parquet path writes
  * partition-parallel first and renames the (single) part. The
  * distributed engine-side sinks remain Spark's own `df.write.*`; these
  * exporters are the user-delivery tail, not the analytics path.
  */
object Exporters {

  val SupportedFormats: Seq[String] =
    Seq("csv", "tsv", "xlsx", "json", "xml", "feather", "parquet")

  /** Dispatch on format name (reference `SupportedFileFormats`,
    * `app/constants.py:3-10`). */
  def write(df: DataFrame, format: String, outPath: String): Unit = format match {
    case "csv"     => writeDelimited(df, outPath, ',')
    case "tsv"     => writeDelimited(df, outPath, '\t')
    case "json"    => writeJsonSplit(df, outPath)
    case "xml"     => writeXml(df, outPath)
    case "xlsx"    => writeXlsx(df, outPath)
    case "feather" => Feather.write(df, outPath)
    case "parquet" => writeParquetSingle(df, outPath)
    case other     => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  private def stringify(v: Any): String = v match {
    case null => ""
    case b: Array[Byte] => new String(b, StandardCharsets.UTF_8)
    case other => String.valueOf(other)
  }

  /** A2/A8: csv/tsv, RFC-4180 quoting (quote only when needed — pandas'
    * QUOTE_MINIMAL), header row, \n line endings, no index column. */
  def writeDelimited(df: DataFrame, outPath: String, sep: Char): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(outPath), StandardCharsets.UTF_8), 1 << 20)
    try {
      def field(s: String): String =
        if (s.indexOf(sep) >= 0 || s.indexOf('"') >= 0 || s.indexOf('\n') >= 0 || s.indexOf('\r') >= 0)
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      w.write(df.columns.map(field).mkString(sep.toString)); w.write("\n")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        var i = 0
        while (i < r.length) {
          if (i > 0) w.write(sep.toInt)
          w.write(field(stringify(r.get(i))))
          i += 1
        }
        w.write("\n")
      }
    } finally w.close()
  }

  /** A4: pandas `to_json(orient="split", index=False)` byte format:
    * `{"columns":[...],"data":[[...],...]}` — numbers unquoted, strings
    * JSON-escaped, null for missing. */
  def writeJsonSplit(df: DataFrame, outPath: String): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(outPath), StandardCharsets.UTF_8), 1 << 20)
    try {
      def jstr(s: String): String = {
        val sb = new StringBuilder("\"")
        s.foreach {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
          case c => sb.append(c)
        }
        sb.append('"').toString
      }
      def jval(v: Any): String = v match {
        case null => "null"
        case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
             _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float |
             _: java.math.BigDecimal => String.valueOf(v)
        case b: java.lang.Boolean => String.valueOf(b)
        case other => jstr(stringify(other))
      }
      w.write("{\"columns\":[")
      w.write(df.columns.map(jstr).mkString(","))
      w.write("],\"data\":[")
      val it = df.toLocalIterator()
      var first = true
      while (it.hasNext) {
        val r = it.next()
        if (!first) w.write(",")
        first = false
        w.write((0 until r.length).map(i => jval(r.get(i))).mkString("[", ",", "]"))
      }
      w.write("]}")
    } finally w.close()
  }

  /** A5: pandas `to_xml(index=False)` shape: `<data><row><col>v</col>…
    * </row>…</data>`; null columns omitted from the row element. */
  def writeXml(df: DataFrame, outPath: String): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(outPath), StandardCharsets.UTF_8), 1 << 20)
    try {
      def esc(s: String): String = s.flatMap {
        case '&' => "&amp;"
        case '<' => "&lt;"
        case '>' => "&gt;"
        case c => c.toString
      }
      w.write("<?xml version='1.0' encoding='utf-8'?>\n<data>\n")
      val cols = df.columns
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        w.write("  <row>\n")
        var i = 0
        while (i < r.length) {
          if (!r.isNullAt(i))
            w.write(s"    <${cols(i)}>${esc(stringify(r.get(i)))}</${cols(i)}>\n")
          i += 1
        }
        w.write("  </row>\n")
      }
      w.write("</data>")
    } finally w.close()
  }

  /** A7: single-file parquet — write partition-parallel to a temp dir,
    * then move the coalesced part. Keeps types (unlike the text formats). */
  def writeParquetSingle(df: DataFrame, outPath: String): Unit = {
    val tmp = outPath + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
    Files.deleteIfExists(Paths.get(outPath))
    Files.move(part.toPath, Paths.get(outPath))
    deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** A3: minimal OOXML workbook (no POI offline — hand-rolled zip of the
    * five required XML parts, inline strings; opens in Excel/pandas).
    * Streams rows; numeric cells typed as numbers, everything else as
    * inline strings. */
  def writeXlsx(df: DataFrame, outPath: String): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(outPath), 1 << 20))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      def raw(s: String): Unit = zos.write(s.getBytes(StandardCharsets.UTF_8))
      def esc(s: String): String = s.flatMap {
        case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
        case '"' => "&quot;"; case c => c.toString
      }
      raw("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      raw("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      def colRef(i: Int): String = { // 0 -> A, 25 -> Z, 26 -> AA ...
        var n = i + 1; val sb = new StringBuilder
        while (n > 0) { val rem = (n - 1) % 26; sb.insert(0, ('A' + rem).toChar); n = (n - 1) / 26 }
        sb.toString
      }
      val isNumeric: Array[Boolean] = df.schema.fields.map(_.dataType match {
        case _: NumericType => true; case _ => false
      })
      var rowIdx = 1
      def cell(i: Int, v: Any): String = {
        val ref = s"${colRef(i)}$rowIdx"
        if (v == null) ""
        else if (isNumeric(i)) s"""<c r="$ref"><v>${stringify(v)}</v></c>"""
        else s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(stringify(v))}</t></is></c>"""
      }
      raw(s"""<row r="1">""" + df.columns.zipWithIndex.map { case (c, i) =>
        s"""<c r="${colRef(i)}1" t="inlineStr"><is><t>${esc(c)}</t></is></c>"""
      }.mkString + "</row>")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        rowIdx += 1
        raw(s"""<row r="$rowIdx">""")
        var i = 0
        while (i < r.length) { raw(cell(i, r.get(i))); i += 1 }
        raw("</row>")
      }
      raw("</sheetData></worksheet>")
      zos.closeEntry()
    } finally zos.close()
  }
}
