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
  *    content WITH live merge-on-read deletes applied at the reader
  *    (position skip-lists + equality key maps, driver-bounded by
  *    `maxMorRowsInitialBatch`, broadcast once) — a table that just
  *    ran a SQL DELETE/UPDATE/MERGE streams immediately and never
  *    serves a deleted row; above the bound it refuses with
  *    compaction guidance instead of materializing unbounded state;
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

  /** Delta-parity `startingVersion`: a FRESH checkpoint can skip the
    * initial snapshot and begin at a commit boundary — every commit
    * with version >= startingVersion streams, nothing earlier.
    * Version 0 is not accepted (that IS the snapshot — use a fresh
    * checkpoint without the option); an expired startingVersion fails
    * at planning with the retention error, never silently skips. */
  private val startingVersion = options.get("startingversion").map { v =>
    val n = v.toInt
    require(n >= 1,
      s"startingVersion must be >= 1 (got $n): version 0 is the " +
        "initial snapshot — omit the option to stream it")
    n
  }

  override def initialOffset(): Offset =
    LakeLogOffset(startingVersion.map(_ - 1).getOrElse(-1))
  override def deserializeOffset(json: String): Offset =
    LakeLogOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Driver-side bound on the merge-on-read state the INITIAL batch
    * may carry (delete positions + equality keys): beyond it, refuse
    * with compaction guidance instead of materializing an unbounded
    * set on the driver. */
  private val maxMorRows = options.get("maxmorrowsinitialbatch")
    .map(_.toLong).getOrElse(4_000_000L)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[LakeLogOffset].version
    val hi = end.asInstanceOf[LakeLogOffset].version
    if (hi <= lo) return Array.empty
    var mor: Option[(org.apache.spark.broadcast.Broadcast[MorState],
      Set[String], Long)] = None
    val entries: Seq[LakeTable.FileEntry] =
      if (lo < 0) {
        // the INITIAL snapshot batch applies live merge-on-read
        // deletes at the READER (position skip-lists + equality key
        // sets, bounded, broadcast) — a table that just ran a SQL
        // DELETE/UPDATE/MERGE streams immediately, no compact-first
        // speed bump, and never serves a deleted row
        val (files, dels) = lake.snapshotWithDeletes(hi)
        if (dels.nonEmpty) {
          val state = buildMorState(files, dels)
          val touched = state.posByName.keySet
          val maxEqSeq =
            if (state.eqGroups.isEmpty) Long.MinValue
            else state.eqGroups.flatMap(_.keys.values).max
          mor = Some((SparkSession.active.sparkContext.broadcast(state),
            touched, maxEqSeq))
        }
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
      val fp = FilePartition(i, Array(PartitionedFile(
        partitionValuesOf(e),
        org.apache.spark.paths.SparkPath.fromPathString(
          s"${lake.root}/${e.path}"),
        0L, if (e.sizeBytes > 0) e.sizeBytes else Long.MaxValue, Array.empty,
        e.modTimeMs, e.sizeBytes,
        Map.empty)))
      val name = e.path.split("/").last
      mor match {
        // wrap only files some delete can actually touch: position
        // skip-list present, or an equality delete newer than the file
        case Some((bc, posTouched, maxEqSeq))
            if posTouched.contains(name) || maxEqSeq > e.seq =>
          GraftMorInputPartition(fp, name, e.seq, bc): InputPartition
        case _ => fp: InputPartition
      }
    }.toArray
  }

  /** Load the snapshot's live delete state onto the driver, bounded by
    * [[maxMorRows]]: position deletes become per-file sorted
    * skip-lists (keyed by terminal UUID file name — the same
    * encoding-invariant key the batch read joins on), equality deletes
    * become per-keyset maps of key tuple -> newest delete sequence
    * (null-SAFE tuple equality, Iceberg semantics — exactly the
    * `<=>` anti-join `readVersion` runs; a row is deleted iff its file
    * PREDATES the delete). */
  private def buildMorState(files: Seq[LakeTable.FileEntry],
                            dels: Seq[LakeTable.DeleteEntry]): MorState = {
    val session = SparkSession.active
    val filePaths = files.map(_.path).toSet
    val pos = dels.filter(e =>
      e.kind != "eq" && e.covers.exists(filePaths.contains))
    val minSeq = if (files.isEmpty) Long.MaxValue else files.map(_.seq).min
    val eq = dels.filter(e => e.kind == "eq" && e.seq > minSeq)
    val total = pos.map(_.rows).sum + eq.map(_.rows).sum
    require(total <= maxMorRows,
      s"cannot start streaming ${lake.root}: the snapshot carries " +
        s"$total live merge-on-read delete rows, above the " +
        s"$maxMorRows driver-side bound for the initial batch — run " +
        "compact() to absorb the deletes first, or raise the " +
        "maxMorRowsInitialBatch stream option")
    eq.flatMap(_.keyCols).distinct.foreach { c =>
      require(pruned.fieldNames.contains(c),
        s"cannot start streaming ${lake.root}: live equality deletes " +
          s"key on column '$c', which the streamed schema does not " +
          "include — select it, or compact() to absorb the deletes")
      // the reader matches key tuples by catalyst-value equality,
      // which is content-based only for atomic types (string/number/
      // boolean/date/time); nested keys would compare by identity and
      // silently resurrect rows — refuse instead
      val atomic = snapSchema(c).dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      }
      require(atomic,
        s"cannot start streaming ${lake.root}: live equality deletes " +
          s"key on non-atomic column '$c' " +
          s"(${snapSchema(c).dataType.sql}) — run compact() to absorb " +
          "the deletes first")
    }
    val posByName: Map[String, Array[Long]] =
      if (pos.isEmpty) Map.empty
      else session.read.schema(LakeTable.deleteSchema)
        .parquet(pos.map(e => s"${lake.root}/${e.path}"): _*)
        .collect()
        .groupBy(_.getString(0).split("/").last)
        .map { case (n, rows) => n -> rows.map(_.getLong(1)).sorted }
    val eqGroups = eq.groupBy(_.keyCols).toSeq.map { case (cols, es) =>
      val keySchema = StructType(cols.map(c => snapSchema(c)).toSeq)
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(keySchema)
      val m = scala.collection.mutable.HashMap[Vector[Any], Long]()
      es.foreach { e =>
        session.read.schema(keySchema)
          .parquet(s"${lake.root}/${e.path}").collect().foreach { r =>
            val ir = conv(r).asInstanceOf[InternalRow]
            val tuple = keySchema.fields.indices
              .map(i => ir.get(i, keySchema(i).dataType)).toVector
            if (e.seq > m.getOrElse(tuple, Long.MinValue))
              m(tuple) = e.seq
          }
      }
      MorEqGroup(cols.toVector, m.toMap)
    }
    MorState(posByName, eqGroups)
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

/** Merge-on-read state of the initial snapshot batch, broadcast once:
  * per-file position skip-lists and per-keyset equality maps (key
  * tuple -> newest delete sequence). */
private[sources] case class MorEqGroup(keyCols: Vector[String],
                                       keys: Map[Vector[Any], Long])
private[sources] case class MorState(posByName: Map[String, Array[Long]],
                                     eqGroups: Seq[MorEqGroup])

/** A data file of the initial batch that live deletes may touch: the
  * stock [[FilePartition]] plus its UUID name, its data sequence
  * number, and the broadcast MOR state. */
case class GraftMorInputPartition(
    inner: FilePartition, fileName: String, fileSeq: Long,
    state: org.apache.spark.broadcast.Broadcast[MorState])
    extends InputPartition

/** Wraps the stock parquet reader to re-project its (data ++
  * partition) column order back to the table's visible order — the
  * streaming relation's output is the TABLE schema, not the reader's
  * layout — and, for initial-batch partitions carrying MOR state, to
  * apply the deletes row-by-row BEFORE projection: the reader's
  * sequential row index within a whole-file partition IS the parquet
  * `row_index` position deletes name, and equality deletes match by
  * null-safe key-tuple lookup scoped to files older than the delete.
  * Projection built lazily on the executor. */
case class GraftLakeStreamReaderFactory(
    delegate: ParquetPartitionReaderFactory,
    readerOrder: StructType, targetOrder: StructType)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val (filePart, morFilter) = p match {
      case m: GraftMorInputPartition =>
        val st = m.state.value
        val positions = st.posByName.getOrElse(m.fileName,
          Array.empty[Long])
        val eqFilters = st.eqGroups.map { g =>
          val ords = g.keyCols.map(c => readerOrder.fieldIndex(c)).toArray
          val dts = g.keyCols
            .map(c => readerOrder(readerOrder.fieldIndex(c)).dataType)
            .toArray
          (ords, dts, g.keys)
        }.filter(_._3.nonEmpty)
        (m.inner, Some((positions, eqFilters, m.fileSeq)))
      case fp: FilePartition => (fp, None)
    }
    val base = delegate.createReader(filePart)
    val filtered = morFilter match {
      case None => base
      case Some((positions, eqFilters, fileSeq)) =>
        new PartitionReader[InternalRow] {
          private var idx = -1L
          private var cur: InternalRow = _
          private def deleted(r: InternalRow, pos: Long): Boolean =
            (positions.length > 0 &&
              java.util.Arrays.binarySearch(positions, pos) >= 0) ||
            eqFilters.exists { case (ords, dts, keys) =>
              val tuple = ords.indices
                .map(i => r.get(ords(i), dts(i))).toVector
              keys.get(tuple).exists(_ > fileSeq)
            }
          override def next(): Boolean = {
            while (base.next()) {
              idx += 1
              val r = base.get()
              if (!deleted(r, idx)) { cur = r; return true }
            }
            false
          }
          override def get(): InternalRow = cur
          override def close(): Unit = base.close()
        }
    }
    if (readerOrder == targetOrder) filtered
    else new PartitionReader[InternalRow] {
      private val attrs = DataTypeUtils.toAttributes(readerOrder)
      private val proj = UnsafeProjection.create(
        targetOrder.fieldNames.toSeq.map(n =>
          attrs.find(_.name == n).getOrElse(
            throw new IllegalStateException(
              s"stream projection lost column $n"))),
        attrs)
      override def next(): Boolean = filtered.next()
      override def get(): InternalRow = proj(filtered.get())
      override def close(): Unit = filtered.close()
    }
  }
}
