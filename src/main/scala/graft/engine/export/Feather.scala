package graft.engine.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** A6: Feather (= Arrow IPC file format) single-file writer on the
  * arrow-vector 18.3 jars shipped with Spark (reference `app/tasks.py:25`
  * used `pd.DataFrame.to_feather`). Streams `toLocalIterator` in
  * fixed-size record batches — O(batch) driver memory. Readable by
  * `pandas.read_feather` / `pyarrow.ipc.open_file`. */
object Feather {

  private val BatchRows = 4096

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case ByteType | ShortType | IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
      case _ => ArrowType.Utf8.INSTANCE // strings, decimals, dates, etc. as text
    }
    new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList())
  }

  def write(df: DataFrame, outPath: String): Unit = {
    val sparkSchema = df.schema
    val schema = new ArrowSchema(sparkSchema.fields.map(arrowField).toList.asJava)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, allocator)
    val out = new FileOutputStream(outPath)
    val writer = new ArrowFileWriter(root, null, out.getChannel)
    try {
      writer.start()
      val it = df.toLocalIterator()
      val buf = new Array[org.apache.spark.sql.Row](BatchRows)
      while (it.hasNext) {
        var n = 0
        while (n < BatchRows && it.hasNext) { buf(n) = it.next(); n += 1 }
        root.allocateNew()
        var c = 0
        while (c < sparkSchema.length) {
          val vec = root.getVector(c)
          val dt = sparkSchema.fields(c).dataType
          var r = 0
          while (r < n) {
            val row = buf(r)
            if (row.isNullAt(c)) () // vectors default to null
            else (vec, dt) match {
              case (v: IntVector, _) => v.setSafe(r, row.get(c) match {
                case b: Byte => b.toInt; case s: Short => s.toInt; case i: Int => i
                case other => String.valueOf(other).toInt
              })
              case (v: BigIntVector, _) => v.setSafe(r, row.getLong(c))
              case (v: Float4Vector, _) => v.setSafe(r, row.getFloat(c))
              case (v: Float8Vector, _) => v.setSafe(r, row.getDouble(c))
              case (v: BitVector, _) => v.setSafe(r, if (row.getBoolean(c)) 1 else 0)
              case (v: TimeStampMicroTZVector, _) =>
                val ts = row.getAs[java.sql.Timestamp](c)
                v.setSafe(r, ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
              case (v: VarCharVector, _) =>
                v.setSafe(r, String.valueOf(row.get(c)).getBytes(StandardCharsets.UTF_8))
              case (v, t) => throw new IllegalStateException(s"unhandled $t -> ${v.getClass}")
            }
            r += 1
          }
          c += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } finally {
      writer.close(); out.close(); root.close(); allocator.close()
    }
  }
}
