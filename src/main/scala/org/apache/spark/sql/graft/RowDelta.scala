package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, WriteDelta}
import org.apache.spark.sql.catalyst.util.{RowDeltaUtils, WriteDeltaProjections}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.V2CommandExec

import graft.lake.{GraftDeltaWrite, GraftSqlTable, GraftStreamingWrite, GraftTableWrite, LakeTable}

/** Package-access bridge for `private[spark]` utilities the streaming
  * catalog read needs (see [[graft.sources.GraftLakeMicroBatchStream]]
  * — the parquet reader factory takes a broadcast hadoop conf). */
object SparkInternalBridge {
  /** The hadoop conf [[org.apache.spark.sql.execution.datasources.v2
    * .parquet.ParquetPartitionReaderFactory]] expects — the exact
    * setup `ParquetScan.createReaderFactory` performs (read-support
    * class + requested schema + session parquet flags), broadcast for
    * the executors. */
  def broadcastParquetReadConf(session: SparkSession,
                               readDataSchema: org.apache.spark.sql
                                 .types.StructType)
      : org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.SerializableConfiguration] = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val conf = session.sessionState.newHadoopConf()
    val sqlConf = session.sessionState.conf
    val json = readDataSchema.json
    conf.set("parquet.read.support.class",
      classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, json)
    conf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, json)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key,
      sqlConf.sessionLocalTimeZone)
    conf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key,
      sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(readDataSchema, conf)
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    conf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlConf.parquetFieldIdReadEnabled)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    org.apache.spark.util.SerializableConfiguration.broadcast(
      session.sparkContext, conf)
  }
}

/** Planner strategy executing SQL UPDATE / MERGE INTO / DELETE on graft
  * catalog tables — the V1-DELEGATION half of the engine's
  * `SupportsRowLevelOperations` implementation, injected by
  * [[graft.GraftExtensions]].
  *
  * The division of labor: Spark's analyzer rewrites
  * (`RewriteUpdateTable` / `RewriteMergeIntoTable` /
  * `RewriteDeleteFromTable`) own the SQL SEMANTICS — assignment
  * alignment, every MERGE clause type (matched / not-matched /
  * not-matched-by-source, conditional, multiple), the
  * multiple-matches cardinality check — and produce a [[WriteDelta]]
  * plan whose query emits one row per change, tagged by
  * `__row_operation` (1 = delete, 2 = update, 3 = insert) and carrying
  * the engine's rowId pair (`_file`, `_pos` — see
  * [[graft.lake.LakeTable.readWithRowCoords]]). This strategy claims
  * that plan when the write is the engine's marker
  * ([[graft.lake.GraftDeltaWrite]]) and lands the delta through
  * [[graft.lake.LakeTable.applyRowDelta]] in ONE transactional commit
  * — merge-on-read position deletes + appended data files by default,
  * or exact affected-file rewrites under `update.mode` / `merge.mode`
  * / `delete.mode` = `copy-on-write` — instead of rebuilding a DSv2
  * parquet writer for what the V1 write path already does
  * (constraints, hidden-partition derivation, bucket layout,
  * rename-free task commits, optimistic concurrency with the
  * strict-replace / covers guards).
  *
  * Injected strategies run BEFORE the built-in `DataSourceV2Strategy`,
  * so the marker write's `toBatch` (which fails with an install
  * instruction) is never reached on an extensions session. */
case class GraftRowDeltaStrategy(session: SparkSession)
    extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case WriteDelta(_, _, query, _, projections, Some(w: GraftDeltaWrite)) =>
      GraftRowDeltaExec(session, w.table, w.cmd, projections, query) :: Nil
    case _ => Nil
  }
}

/** Planner strategy executing `df.writeStream.toTable("graft.ns.t")` —
  * the WRITE half of the streaming catalog surface (the read half is
  * [[graft.sources.GraftLakeMicroBatchStream]]), injected by
  * [[graft.GraftExtensions]].
  *
  * The division of labor mirrors [[GraftRowDeltaStrategy]]: Spark's
  * stock micro-batch machinery owns the STREAMING semantics — the
  * per-batch plan rewrite (`V2Writes` wraps the table's marker
  * [[graft.lake.GraftStreamingWrite]] in a
  * [[org.apache.spark.sql.execution.streaming.sources.MicroBatchWrite]]
  * carrying the epoch id), checkpointing, trigger pacing, restart
  * replay — and this strategy claims the resulting
  * [[WriteToDataSourceV2]] and lands each epoch through the engine's
  * V1 write path: ONE transactional `appendExactlyOnce(queryId,
  * epochId)` commit per epoch (complete mode: `overwriteAllExactlyOnce`
  * — Spark asked the builder to truncate), the same idempotence
  * machinery the engine's own MV loops ride, so a replayed epoch after
  * a checkpoint restart is suppressed atomically with the commit. The
  * epoch id reaches the engine through the PROTOCOL'S OWN delivery —
  * the exec stages the batch on the marker and drives
  * `MicroBatchWrite.commit`, which calls back `marker.commit(epochId,
  * _)` — no writer-factory rebuild, no reflection into Spark
  * internals. This is the crest ingestion loop itself (wire ->
  * transactional table commit, /root/reference/pkg/ingestor/
  * ingestor.go:58-102, iceberg_committer.go:122-147) expressed the way
  * a Spark user writes it. */
case class GraftStreamingTableWriteStrategy(session: SparkSession)
    extends SparkStrategy {
  import org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2
  import org.apache.spark.sql.execution.streaming.sources.MicroBatchWrite
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case WriteToDataSourceV2(_, mbw: MicroBatchWrite, query, _)
        if mbw.writeSupport.isInstanceOf[GraftStreamingWrite] =>
      GraftStreamingTableWriteExec(session,
        mbw.writeSupport.asInstanceOf[GraftStreamingWrite], mbw,
        query.schema, planLater(query)) :: Nil
    case _ => Nil
  }
}

/** Planner strategy executing DYNAMIC `INSERT OVERWRITE` on graft
  * catalog tables (`spark.sql.sources.partitionOverwriteMode=dynamic`),
  * injected by [[graft.GraftExtensions]]. Spark's analyzer owns the
  * SQL semantics (`ResolveInsertInto` plans
  * `OverwritePartitionsDynamic`, `TableOutputResolver` aligns the
  * query to the table's columns) and `V2Writes` stamps the table's
  * [[graft.lake.GraftTableWrite]] marker; this strategy claims the
  * plan and lands it through
  * [[graft.lake.LakeTable.overwritePartitionsDynamic]] — ONE
  * transactional commit replacing exactly the partitions the incoming
  * rows touch (Spark 4 ships no V1 fallback exec for dynamic
  * overwrite, so without this strategy the marker's `toBatch` fails
  * with an install instruction — honest, never wrong). */
case class GraftDynamicOverwriteStrategy(session: SparkSession)
    extends SparkStrategy {
  import org.apache.spark.sql.catalyst.plans.logical.OverwritePartitionsDynamic
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case OverwritePartitionsDynamic(_, query, _, _,
        Some(w: GraftTableWrite)) if w.dynamic =>
      GraftDynamicOverwriteExec(session, w.table, query.schema,
        planLater(query)) :: Nil
    case _ => Nil
  }
}

/** Executes one dynamic partition overwrite: the aligned query is a
  * planned child (TableOutputResolver already named/cast its output to
  * the table's visible columns); its rows land through
  * [[graft.lake.LakeTable.overwritePartitionsDynamic]] in one commit. */
case class GraftDynamicOverwriteExec(
    spark: SparkSession, table: GraftSqlTable,
    querySchema: org.apache.spark.sql.types.StructType,
    child: SparkPlan) extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(child = newChildren.head)
  override def simpleString(maxFields: Int): String =
    s"GraftDynamicOverwrite ${table.name()}"

  override protected def run(): Seq[InternalRow] = {
    import org.apache.spark.sql.functions.col
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val df = classic.internalCreateDataFrame(child.execute(), querySchema)
    val visible = table.schema
    val missing = visible.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"dynamic overwrite of ${table.name()} is missing column(s) " +
        s"${missing.mkString(", ")} (query columns: " +
        df.columns.mkString(", ") + ")")
    val aligned = df.select(visible.fields.map(f =>
      col(f.name).cast(f.dataType)).toSeq: _*)
    table.lake.overwritePartitionsDynamic(aligned)
    Nil
  }
}

/** Executes one streaming epoch into a catalog table: the batch query
  * is a PLANNED CHILD (Spark's own physical plan for the micro-batch,
  * exactly what the stock write exec would run), its rows re-wrapped
  * as a batch DataFrame (the streaming leaves' `isStreaming` flag must
  * not leak into the lake's V1 write, which rightly refuses streaming
  * plans), aligned by NAME to the table's visible columns (a missing
  * column is a loud error, not a silent null; derived bucket/transform
  * columns stay the writer's job), staged on the marker, and committed
  * by driving [[org.apache.spark.sql.execution.streaming.sources
  * .MicroBatchWrite]] — so the engine receives the epoch id from the
  * write protocol itself. */
case class GraftStreamingTableWriteExec(
    spark: SparkSession, marker: GraftStreamingWrite,
    mbw: org.apache.spark.sql.execution.streaming.sources.MicroBatchWrite,
    querySchema: org.apache.spark.sql.types.StructType,
    child: SparkPlan) extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(child = newChildren.head)
  override def simpleString(maxFields: Int): String =
    s"GraftStreamingTableWrite ${marker.table.name()}"

  override protected def run(): Seq[InternalRow] = {
    import org.apache.spark.sql.functions.col
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // rows are consumed exactly once by the write job below; the write
    // path serializes each row on receipt (parquet writer / shuffle
    // writer), so no defensive per-row copy is needed
    val df = classic.internalCreateDataFrame(child.execute(), querySchema)
    val visible = marker.table.schema
    val missing = visible.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"streaming write to ${marker.table.name()} is missing " +
        s"column(s) ${missing.mkString(", ")} (query columns: " +
        df.columns.mkString(", ") + ")")
    // already-aligned batches (the overwhelmingly common case: Spark
    // resolved the stream against the table) skip the extra projection
    val aligned =
      if (df.columns.toSeq == visible.fieldNames.toSeq &&
          df.schema.fields.map(_.dataType).toSeq ==
            visible.fields.map(_.dataType).toSeq) df
      else df.select(visible.fields.map(f =>
        col(f.name).cast(f.dataType)).toSeq: _*)
    marker.stage(aligned)
    mbw.commit(Array.empty)
    Nil
  }
}

/** Executes one row-level delta: materializes the rewrite's delta rows
  * ONCE (localCheckpoint — delete side and insert side must agree even
  * under a non-deterministic MERGE source), splits by operation using
  * the rewrite's OWN projections (column ordinals, never name
  * guessing), and commits through the engine. O(delta) end to end; the
  * table scan underneath was manifest-pruned by the pushed condition
  * like every other read. Honesty note on the constant: the
  * materialization is executor-storage-sized in the DELTA (either
  * mode) — a MERGE whose delta approaches the whole table (an
  * unconditioned rewrite of every row) pays a table-sized checkpoint;
  * that shape is better served by `INSERT OVERWRITE ... SELECT` (one
  * streaming-write overwrite commit) or the programmatic `upsert`,
  * while keyed CDC-apply deltas — the shape this path exists for —
  * stay O(changed rows) (measured flat across 16x table growth,
  * BENCH_NOTES RowDeltaScale). */
case class GraftRowDeltaExec(spark: SparkSession, table: GraftSqlTable,
                             cmd: Command,
                             projections: WriteDeltaProjections,
                             query: LogicalPlan) extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this
  override def simpleString(maxFields: Int): String =
    s"GraftRowDelta $cmd ${table.name()}"

  override protected def run(): Seq[InternalRow] = {
    import org.apache.spark.sql.functions.lit
    val delta = org.apache.spark.sql.classic.Dataset
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        query)
      .localCheckpoint()
    val attrs = delta.queryExecution.analyzed.output
    def colAt(i: Int) = ExpressionUtils.column(attrs(i))
    val opOrd = attrs.indexWhere(_.name == RowDeltaUtils.OPERATION_COLUMN)
    require(opOrd >= 0, s"row-delta plan lost its operation column: " +
      attrs.map(_.name).mkString(", "))
    val op = colAt(opOrd)

    // rowId ordinals come from the rewrite's projection, and WHICH
    // ordinal is the file vs the position is resolved by the
    // projection's own schema FIELD NAMES — never by assuming the
    // rowId() declaration order survived the rewrite. If Spark ever
    // reordered them, a positional mapping would cast file names to
    // long (all null) and silently drop every delete position.
    val rowIdOrds = projections.rowIdProjection.colOrdinals
    val rowIdSchema = projections.rowIdProjection.schema
    require(rowIdOrds.size == 2 && rowIdSchema.size == 2,
      s"expected a (_file, _pos) rowId, got ${rowIdOrds.size} columns")
    val fileOrd = rowIdOrds(rowIdSchema.fieldIndex(LakeTable.RowFileCol))
    val posOrd = rowIdOrds(rowIdSchema.fieldIndex(LakeTable.RowPosCol))
    require(attrs(fileOrd).dataType ==
        org.apache.spark.sql.types.StringType &&
      attrs(posOrd).dataType == org.apache.spark.sql.types.LongType,
      s"rowId columns carry unexpected types: ${LakeTable.RowFileCol}=" +
        s"${attrs(fileOrd).dataType}, ${LakeTable.RowPosCol}=" +
        s"${attrs(posOrd).dataType}")
    val deletes = delta
      .filter(op === lit(RowDeltaUtils.DELETE_OPERATION) ||
        op === lit(RowDeltaUtils.UPDATE_OPERATION))
      .select(colAt(fileOrd).as(LakeTable.RowFileCol),
        colAt(posOrd).as(LakeTable.RowPosCol))

    // a pure DELETE rewrite carries no row projection — the insert
    // side is an empty frame in the table's visible columns
    val inserts = projections.rowProjection match {
      case Some(p) =>
        val cols = p.colOrdinals.zip(p.schema.fields).map {
          case (i, f) => colAt(i).as(f.name)
        }
        delta.filter(op === lit(RowDeltaUtils.UPDATE_OPERATION) ||
            op === lit(RowDeltaUtils.INSERT_OPERATION))
          .select(cols.toSeq: _*)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          table.schema)
    }

    val modeKey = cmd match {
      case Command.UPDATE => "update.mode"
      case Command.MERGE  => "merge.mode"
      case _              => "delete.mode"
    }
    val cow =
      table.lake.properties.get(modeKey).contains("copy-on-write")
    // CDF typing stamp: a MERGE-ON-READ commit whose delta is PURE
    // UPDATE rows (every SQL UPDATE; a MERGE with only
    // when-matched-update matches) has an exact change-feed reading —
    // its delete events are the updated rows' pre-images and its
    // insert events their post-images — so the changelog faces emit
    // Delta's `update_preimage`/`update_postimage` types for it. A
    // mixed MERGE (inserts or deletes alongside updates) stays
    // untyped: the commit's added files blend update-postimages with
    // plain inserts, and file-grained emission cannot split them —
    // `insert`/`delete` is the honest (and apply-equivalent) fallback.
    // Copy-on-write rewrites likewise: their churn includes untouched
    // survivor rows. One O(delta) agg over the checkpointed delta.
    val pureUpdate = !cow && {
      val ops = delta.select(op.as("__op")).distinct().collect()
        .map(_.getInt(0)).toSet
      ops == Set(RowDeltaUtils.UPDATE_OPERATION)
    }
    val cdfMeta =
      if (pureUpdate) Map("cdf.op" -> "update") else Map.empty[String, String]
    table.lake.applyRowDelta(deletes, inserts, copyOnWrite = cow,
      extraMeta = Map("sql.rowlevel" -> cmd.toString.toLowerCase) ++
        cdfMeta)
    Nil
  }
}
