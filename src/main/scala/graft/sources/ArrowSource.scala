package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.pojo.{ArrowType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Arrow IPC file SOURCE — the read half of [[ArrowSink]], closing the
  * loop on the reference's native interchange format: its entire
  * ingress is Arrow RecordBatches (flight_reader.go DoGet) and its
  * alternate sink is Arrow IPC files (batch_writer.go:200-222). With
  * this source, `spark.read.format("graft-arrow").load(dir)` ingests
  * those files — Flight minus the gRPC transport, which the frozen
  * classpath cannot provide (no flight/grpc jars).
  *
  * Scale shape: one InputPartition per .arrow FILE, so a directory of
  * batch files fans out across executors; each reader streams record
  * batches through one reusable VectorSchemaRoot (memory bounded by
  * batch size, not file size). Directories are walked recursively so an
  * [[graft.streaming.MVManager.startToArrow]] output tree (batch-<id>/
  * subdirs) reads as one table; dot-prefixed staging dirs are ignored.
  * Every file's schema is validated against the table schema — a
  * mismatched file fails loudly, never silently mis-reads.
  */
class ArrowSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-arrow"
  // .schema(...) override allowed (e.g. reading a not-yet-written dir)
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowSource.readSchema(Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-arrow requires a path")))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-arrow requires a path"))
    new ArrowTable(path, schema)
  }
}

object ArrowSource {

  /** All .arrow files under `dir` (recursive), skipping dot-prefixed
    * path components (in-flight staging dirs). Sorted for determinism. */
  def listFiles(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) throw new IllegalArgumentException(
      s"graft-arrow: not a directory: $dir")
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".arrow") && Files.isRegularFile(p))
      .filterNot(p => root.relativize(p).iterator().asScala
        .exists(_.toString.startsWith(".")))
      .map(_.toString).toVector.sorted
    finally s.close()
  }

  def readSchema(dir: String): StructType = {
    val files = listFiles(dir)
    if (files.isEmpty) throw new IllegalArgumentException(
      s"graft-arrow: no .arrow files under $dir (pass an explicit " +
        ".schema(...) to read an empty dataset)")
    fileSchema(files.head)
  }

  def fileSchema(file: String): StructType = {
    val allocator = new RootAllocator()
    val ch = FileChannel.open(Paths.get(file))
    val reader = new ArrowFileReader(ch, allocator)
    try fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
    finally { reader.close(); allocator.close(); ch.close() }
  }

  /** Reverse of [[ArrowSink.toArrowSchema]] — same supported matrix,
    * unsupported Arrow types fail loudly at schema time. */
  def fromArrowSchema(schema: ArrowSchema): StructType =
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val t: DataType = f.getType match {
        case _: ArrowType.Bool => BooleanType
        case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
          case 8 => ByteType
          case 16 => ShortType
          case 32 => IntegerType
          case 64 => LongType
          case w => throw new IllegalArgumentException(
            s"graft-arrow: unsupported int width $w for column ${f.getName}")
        }
        case fp: ArrowType.FloatingPoint =>
          fp.getPrecision match {
            case FloatingPointPrecision.SINGLE => FloatType
            case FloatingPointPrecision.DOUBLE => DoubleType
            case p => throw new IllegalArgumentException(
              s"graft-arrow: unsupported float precision $p for ${f.getName}")
          }
        case _: ArrowType.Utf8 => StringType
        case _: ArrowType.Binary => BinaryType
        case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
        case ts: ArrowType.Timestamp
            if ts.getUnit == ArrowTimeUnit.MICROSECOND =>
          // zone-tagged -> TIMESTAMP (LTZ); zoneless -> TIMESTAMP_NTZ.
          // Both store micros-since-epoch, so the value path is shared.
          if (ts.getTimezone == null) TimestampNTZType else TimestampType
        case other => throw new IllegalArgumentException(
          s"graft-arrow: unsupported arrow type $other for column ${f.getName}")
      }
      StructField(f.getName, t, f.isNullable)
    })
}

class ArrowTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-arrow(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      // column pruning: Arrow IPC is columnar, so a projection needs
      // only its own vectors decoded into rows — the rest of the batch
      // is skipped entirely
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            ArrowSource.listFiles(path)
              .map(f => ArrowFilePartition(f): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new ArrowReaderFactory(tableSchema, required)
        }
        override def toMicroBatchStream(checkpointLocation: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
          new ArrowBatchDirStream(path, tableSchema, required)
      }
    }
}

/** Streaming half of the Arrow loop: continuously ingest an
  * [[graft.streaming.MVManager.startToArrow]]-shaped export tree
  * (`dir/batch-<id>/…`, each dir published by atomic rename, ids
  * contiguous from 0 — the exactly-once batch contract). Offsets are
  * the highest CONTIGUOUS batch id present, so a batch becomes visible
  * only when every predecessor is also complete, and each is delivered
  * exactly once via the checkpoint. This closes the engine-to-engine
  * handoff the reference performs over Flight: one engine streams
  * Arrow batches out, another streams them in. */
class ArrowBatchDirStream(path: String, fileSchema: StructType,
                          required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def highestContiguous(): Int = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) return -1
    val s = Files.list(root)
    val ids =
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("batch-") =>
          n.stripPrefix("batch-").toIntOption
        }.flatten.toSet
      finally s.close()
    Iterator.from(0).takeWhile(ids.contains).foldLeft(-1)((_, i) => i)
  }

  @volatile private var frozen: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    frozen = Some(highestContiguous())

  override def latestOffset(): Offset =
    LakeLogOffset(frozen.getOrElse(highestContiguous()))
  // Spark 4: SupportsTriggerAvailableNow extends SupportsAdmissionControl
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = latestOffset()
  override def initialOffset(): Offset = LakeLogOffset(-1)
  override def deserializeOffset(json: String): Offset =
    LakeLogOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[LakeLogOffset].version
    val e = end.asInstanceOf[LakeLogOffset].version
    ((s + 1) to e).flatMap { id =>
      ArrowSource.listFiles(s"$path/batch-$id")
        .map(f => ArrowFilePartition(f): InputPartition)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(fileSchema, required)
}

case class ArrowFilePartition(file: String) extends InputPartition

class ArrowReaderFactory(fileSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ArrowFilePartitionReader(
      p.asInstanceOf[ArrowFilePartition].file, fileSchema, required)
}

class ArrowFilePartitionReader(file: String, fileSchema: StructType,
                               required: StructType)
    extends PartitionReader[InternalRow] {
  private val allocator = new RootAllocator()
  private val ch = FileChannel.open(Paths.get(file))
  private val reader = new ArrowFileReader(ch, allocator)
  private val root =
    try {
      val r = reader.getVectorSchemaRoot
      // names+types must match; nullability may be user-relaxed
      val got = ArrowSource.fromArrowSchema(r.getSchema)
      require(got.fields.toSeq.map(f => (f.name, f.dataType)) ==
          fileSchema.fields.toSeq.map(f => (f.name, f.dataType)),
        s"graft-arrow: $file schema ${got.simpleString} does not match " +
          s"table schema ${fileSchema.simpleString}")
      r
    } catch { case e: Throwable =>
      // constructor failure: Spark never calls close(), so release here
      reader.close(); allocator.close(); ch.close()
      throw e
    }
  // only the pruned columns' vectors are ever touched
  private val vectors: Array[FieldVector] =
    required.fields.map(f => root.getVector(f.name))
  private var idx = -1
  private var count = 0

  override def next(): Boolean = {
    idx += 1
    while (idx >= count) {
      if (!reader.loadNextBatch()) return false
      count = root.getRowCount
      idx = 0
      if (count == 0) idx = 1 // empty batch: keep looping
    }
    true
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](vectors.length)
    var c = 0
    while (c < vals.length) {
      vals(c) = value(vectors(c), idx)
      c += 1
    }
    new GenericInternalRow(vals)
  }

  private def value(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BitVector => x.get(i) == 1
      case x: TinyIntVector => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: BigIntVector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: VarCharVector => UTF8String.fromBytes(x.get(i))
      case x: VarBinaryVector => x.get(i)
      case x: DateDayVector => x.get(i)
      case x: TimeStampMicroTZVector => x.get(i) // micros, as Spark stores
      case x: TimeStampMicroVector => x.get(i)   // NTZ micros, same layout
      case x => throw new IllegalStateException(
        s"graft-arrow: unsupported vector ${x.getClass.getSimpleName}")
    }

  override def close(): Unit = {
    reader.close(); allocator.close(); ch.close()
  }
}
