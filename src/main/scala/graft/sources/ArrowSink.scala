package graft.sources

import java.nio.file.{Files, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC file sink — the reference's alternate output format
  * (/root/reference/pkg/ingestor/batch_writer.go:200-222: one Arrow
  * file per record batch, same path contract as the parquet writer).
  *
  * Spark has no built-in Arrow-IPC writer, so this drives the Arrow
  * Java API directly inside `foreachPartition`: fully distributed (one
  * .arrow file per partition, executors never funnel data through the
  * driver), chunked into record batches of `batchRows` so memory per
  * task is bounded regardless of partition size. For streaming parity
  * with the reference's ingest loop, call from `foreachBatch` with a
  * per-batch directory.
  *
  * Supported column types: boolean, byte, short, int, long, float,
  * double, string, binary, date, timestamp — the reference's own
  * conversion matrix (pkg/utils/schema_conversion.go) minus nesting;
  * anything else fails loudly at plan time rather than writing a file
  * other engines can't read.
  */
object ArrowSink {

  def toArrowSchema(schema: StructType): ArrowSchema = {
    val fields = schema.fields.map { f =>
      val t: ArrowType = f.dataType match {
        case BooleanType => ArrowType.Bool.INSTANCE
        case ByteType => new ArrowType.Int(8, true)
        case ShortType => new ArrowType.Int(16, true)
        case IntegerType => new ArrowType.Int(32, true)
        case LongType => new ArrowType.Int(64, true)
        case FloatType =>
          new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case DoubleType =>
          new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case StringType => ArrowType.Utf8.INSTANCE
        case BinaryType => ArrowType.Binary.INSTANCE
        case DateType => new ArrowType.Date(DateUnit.DAY)
        case TimestampType =>
          new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
        case TimestampNTZType =>
          new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, null)
        case other => throw new IllegalArgumentException(
          s"arrow sink: unsupported type ${other.sql} for column ${f.name}")
      }
      new Field(f.name, new FieldType(f.nullable, t, null),
        java.util.Collections.emptyList[Field]())
    }
    new ArrowSchema(fields.toSeq.asJava)
  }

  /** Write `df` as Arrow IPC files under `dir`, one file per non-empty
    * partition. Returns the written file names (driver-side metadata
    * only — a small strings collect, not data). */
  def write(df: DataFrame, dir: String, batchRows: Int = 4096)
      : Seq[String] = {
    val schema = df.schema
    toArrowSchema(schema) // validate types at plan time, on the driver
    Files.createDirectories(Paths.get(dir))
    // each task writes its own immutable UUID-named file (the
    // reference's path contract, batch_writer.go:127-156) and reports
    // the name; name collection is the only driver traffic
    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else Iterator(writePartition(rows, schema, dir, batchRows))
    }(org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq.sorted
  }

  private def writePartition(rows: Iterator[Row], schema: StructType,
                             dir: String, batchRows: Int): String = {
    val name = s"${UUID.randomUUID()}.arrow"
    val arrowSchema = toArrowSchema(schema)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val out = Files.newOutputStream(Paths.get(dir, name))
    val writer = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(out))
    try {
      writer.start()
      val vectors = root.getFieldVectors.asScala.toArray
      while (rows.hasNext) {
        var n = 0
        while (n < batchRows && rows.hasNext) {
          val row = rows.next()
          var c = 0
          while (c < vectors.length) {
            setValue(vectors(c), schema.fields(c).dataType, n, row, c)
            c += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        root.allocateNew() // reset vectors for the next chunk
      }
      writer.end()
    } finally {
      writer.close(); root.close(); allocator.close(); out.close()
    }
    name
  }

  private def setValue(v: FieldVector, t: DataType, i: Int,
                       row: Row, c: Int): Unit = {
    if (row.isNullAt(c)) {
      v match {
        case x: BaseFixedWidthVector => x.setNull(i)
        case x: BaseVariableWidthVector => x.setNull(i)
        case x => throw new IllegalStateException(
          s"arrow sink: cannot null ${x.getClass.getSimpleName}")
      }
      return
    }
    (v, t) match {
      case (x: BitVector, _) => x.setSafe(i, if (row.getBoolean(c)) 1 else 0)
      case (x: TinyIntVector, _) => x.setSafe(i, row.getByte(c))
      case (x: SmallIntVector, _) => x.setSafe(i, row.getShort(c))
      case (x: IntVector, _) => x.setSafe(i, row.getInt(c))
      case (x: BigIntVector, _) => x.setSafe(i, row.getLong(c))
      case (x: Float4Vector, _) => x.setSafe(i, row.getFloat(c))
      case (x: Float8Vector, _) => x.setSafe(i, row.getDouble(c))
      case (x: VarCharVector, _) =>
        x.setSafe(i, row.getString(c).getBytes("UTF-8"))
      case (x: VarBinaryVector, _) =>
        x.setSafe(i, row.getAs[Array[Byte]](c))
      case (x: DateDayVector, _) =>
        x.setSafe(i, row.getDate(c).toLocalDate.toEpochDay.toInt)
      case (x: TimeStampMicroTZVector, _) =>
        val ts = row.getTimestamp(c)
        x.setSafe(i, ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L)
      case (x: TimeStampMicroVector, _) =>
        // TIMESTAMP_NTZ surfaces as LocalDateTime; micros since epoch at
        // UTC is exactly Spark's internal representation for NTZ
        val ldt = row.getAs[java.time.LocalDateTime](c)
        x.setSafe(i, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
      case other => throw new IllegalStateException(
        s"arrow sink: vector/type mismatch $other")
    }
  }
}
