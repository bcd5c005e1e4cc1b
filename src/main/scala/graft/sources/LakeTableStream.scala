package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.LakeTable

/** `spark.readStream.table("graft.ns.t")` — MICRO_BATCH_READ on the
  * SQL catalog's lake tables. Offsets are SNAPSHOT VERSIONS (the same
  * currency as [[LakeLogSource]] and the engine's own MV loops):
  * checkpointed version ranges give exactly-once delivery of each
  * commit's rows across restarts, `Trigger.AvailableNow` freezes the
  * target version so backfills terminate, and `maxRowsPerBatch` paces
  * admission by ACTUAL added rows per commit (manifest row counts —
  * no file opened for planning).
  *
  * Execution reuses Spark's OWN DSv2 parquet reader
  * ([[ParquetPartitionReaderFactory]]) over the manifest's file
  * entries — one [[FilePartition]] per data file, partition-dir values
  * recovered from the manifest's per-file constants, columns
  * re-projected to the table's visible order. Nothing is rebuilt: the
  * planning half is the lake's metadata
  * ([[LakeTable.addedEntriesBetween]]), the reading half is stock
  * Spark.
  *
  * SEMANTICS — append-stream, the Delta contract:
  *  - the INITIAL batch (fresh checkpoint) is the current snapshot's
  *    content; it refuses to start while merge-on-read delete entries
  *    are live (the file-level reader cannot apply them — compact
  *    first, `LakeTable.compact()`, which absorbs deletes);
  *  - each later batch is the files ADDED by commits in (lo, hi];
  *    compactions are skipped (rewrites, no new rows); a commit that
  *    REMOVES rows (row-level DELETE/UPDATE/MERGE, overwrite) FAILS
  *    the stream by default — `skipChangeCommits=true` skips such
  *    commits wholesale instead (their appended half too, matching
  *    Delta's option of the same name);
  *  - schema stability is guarded by FIELD IDS: every streamed file's
  *    (name, id) pairs must match the current schema (files from
  *    before an ADD COLUMN pass — the reader serves nulls; files from
  *    before a RENAME fail loudly with restart guidance, never serve
  *    stale names as nulls).
  */
class GraftLakeMicroBatchStream(lake: LakeTable, pruned: StructType,
                                options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val skipChangeCommits =
    options.get("skipchangecommits").exists(_.toBoolean)
  private val maxRows = options.get("maxrowsperbatch").map(_.toLong)

  // schema split, pinned at stream construction (one per run):
  // partition-dir columns come back from manifest constants, the rest
  // from the files; hidden physical columns never stream
  private val snapSchema = lake.schema
  private val partCols = lake.partitionBy.toSet
  private val readPartSchema =
    StructType(pruned.fields.filter(f => partCols.contains(f.name)))
  private val readDataSchema =
    StructType(pruned.fields.filterNot(f => partCols.contains(f.name)))
  private val fileSchema =
    StructType(snapSchema.fields.filterNot(f => partCols.contains(f.name)))
  private val currentIds = lake.fieldIds

  @volatile private var frozen: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    frozen = Some(lake.mainVersion)

  /** Offsets resolve against [[LakeTable.mainVersion]] — the WAP-PINNED
    * head, never the staged one: while a write-audit-publish branch
    * stages commits (every audited MV batch does), a streaming reader
    * must not deliver rows that were never published — an abandoned
    * branch would have already leaked them downstream, silently under
    * `skipChangeCommits=true`. Same pin contract as `read()`/
    * `readAsOf`; `publishBranch` moves the pin and the stream advances
    * over the published commits on its next trigger. */
  override def latestOffset(): Offset =
    LakeLogOffset(frozen.getOrElse(lake.mainVersion))

  override def getDefaultReadLimit: ReadLimit =
    maxRows.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Version-granular admission: advance until the accumulated ADDED
    * rows of the admitted commits reach the cap (always at least one
    * version — a single commit larger than the cap still ships whole;
    * the initial snapshot batch is likewise indivisible). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = latestOffset().asInstanceOf[LakeLogOffset].version
    val from = start.asInstanceOf[LakeLogOffset].version
    limit match {
      case mr: ReadMaxRows if from >= 0 && target > from =>
        var acc = 0L
        var v = from
        val steps = lake.addedEntriesBetween(from, target)
        val it = steps.iterator
        var done = false
        while (it.hasNext && !done) {
          val (ver, added, _) = it.next()
          acc += added.map(_.rows).sum
          v = ver
          if (acc >= mr.maxRows() && v > from) done = true
        }
        LakeLogOffset(v)
      case _ => LakeLogOffset(target)
    }
  }

  override def initialOffset(): Offset = LakeLogOffset(-1)
  override def deserializeOffset(json: String): Offset =
    LakeLogOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[LakeLogOffset].version
    val hi = end.asInstanceOf[LakeLogOffset].version
    if (hi <= lo) return Array.empty
    val entries: Seq[LakeTable.FileEntry] =
      if (lo < 0) {
        val (files, delCount) = lake.snapshotEntries(hi)
        require(delCount == 0,
          s"cannot start streaming ${lake.root} at version $hi: " +
            s"$delCount live merge-on-read delete file(s) — the " +
            "streaming file reader cannot apply them; run compact() " +
            "to absorb the deletes first")
        files
      } else {
        lake.addedEntriesBetween(lo, hi).flatMap {
          case (_, added, false) => added
          case (_, _, true) if skipChangeCommits => Nil
          case (v, _, true) => throw new IllegalStateException(
            s"streaming ${lake.root}: version $v removed or rewrote " +
              "rows (row-level DELETE/UPDATE/MERGE or overwrite) — an " +
              "append stream cannot represent it; set " +
              "skipChangeCommits=true to skip such commits, or consume " +
              "the changelog (LakeTable.readChangelog) instead")
        }
      }
    // field-ID stability: a renamed column's old files would otherwise
    // silently serve nulls under the new name
    entries.foreach(e => e.cols.foreach { case (n, id) =>
      require(currentIds.get(n).contains(id),
        s"streaming ${lake.root}: file ${e.path} was written under a " +
          s"schema where '$n' had field id $id, which no longer " +
          "matches the current schema (a column was renamed/dropped). " +
          "Restart the stream from a fresh checkpoint.")
    })
    entries.zipWithIndex.map { case (e, i) =>
      FilePartition(i, Array(PartitionedFile(
        partitionValuesOf(e),
        org.apache.spark.paths.SparkPath.fromPathString(
          s"${lake.root}/${e.path}"),
        0L, if (e.sizeBytes > 0) e.sizeBytes else Long.MaxValue, Array.empty,
        e.modTimeMs, e.sizeBytes,
        Map.empty))): InputPartition
    }.toArray
  }

  /** Partition-dir values from the manifest's per-file constants
    * (recorded as [v, v] stats at write time) — no path parsing, no
    * file listing. */
  private def partitionValuesOf(e: LakeTable.FileEntry): InternalRow = {
    val values = readPartSchema.fields.map { f =>
      val isNull = e.nullCounts.get(f.name).exists(_ > 0L)
      if (isNull) null
      else {
        val stat = e.stats.getOrElse(f.name,
          throw new IllegalStateException(
            s"streaming ${lake.root}: file ${e.path} carries no " +
              s"recorded value for partition column '${f.name}' " +
              "(legacy entry or unsupported partition type)"))
        (f.dataType, stat.lo) match {
          case (LongType, v: Long)       => v
          case (IntegerType, v: Long)    => v.toInt
          case (ShortType, v: Long)      => v.toShort
          case (ByteType, v: Long)       => v.toByte
          case (DoubleType, v: Double)   => v
          case (FloatType, v: Double)    => v.toFloat
          case (StringType, v: String)   => UTF8String.fromString(v)
          case (BooleanType, v: Boolean) => v
          case (t, v) => throw new IllegalStateException(
            s"streaming ${lake.root}: partition column '${f.name}' " +
              s"of type $t cannot be served from recorded value $v")
        }
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val session = SparkSession.active
    val broadcast = org.apache.spark.sql.graft.SparkInternalBridge
      .broadcastParquetReadConf(session, readDataSchema)
    val delegate = ParquetPartitionReaderFactory(
      session.sessionState.conf, broadcast, fileSchema, readDataSchema,
      readPartSchema, Array.empty,
      Option.empty[org.apache.spark.sql.connector.expressions.aggregate.Aggregation],
      new ParquetOptions(Map.empty[String, String],
        session.sessionState.conf))
    GraftLakeStreamReaderFactory(delegate,
      StructType(readDataSchema.fields ++ readPartSchema.fields), pruned)
  }
}

/** Wraps the stock parquet reader to re-project its (data ++
  * partition) column order back to the table's visible order — the
  * streaming relation's output is the TABLE schema, not the reader's
  * layout. Projection built lazily on the executor. */
case class GraftLakeStreamReaderFactory(
    delegate: ParquetPartitionReaderFactory,
    readerOrder: StructType, targetOrder: StructType)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    if (readerOrder == targetOrder) inner
    else new PartitionReader[InternalRow] {
      private val attrs = DataTypeUtils.toAttributes(readerOrder)
      private val proj = UnsafeProjection.create(
        targetOrder.fieldNames.toSeq.map(n =>
          attrs.find(_.name == n).getOrElse(
            throw new IllegalStateException(
              s"stream projection lost column $n"))),
        attrs)
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = proj(inner.get())
      override def close(): Unit = inner.close()
    }
  }
}
