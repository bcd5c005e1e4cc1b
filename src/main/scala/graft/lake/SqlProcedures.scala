package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` faces for the lake's maintenance and ref operations —
  * Iceberg's procedure surface (`CALL cat.system.proc(...)`) on the
  * graft catalog, completing the pure-SQL operations story: every
  * programmatic maintenance call a crest operator runs (compaction,
  * retention, vacuum, tags, write-audit-publish branches, partition
  * spec evolution) becomes one SQL statement.
  *
  *   CALL graft.system.compact('ns.t', num_files => 4)
  *   CALL graft.system.expire_snapshots('ns.t', keep_last => 3)
  *   CALL graft.system.vacuum('ns.t')
  *   CALL graft.system.create_tag('ns.t', 'audited-v7')
  *   CALL graft.system.create_branch('ns.t', 'wap-1')
  *   CALL graft.system.publish_branch('ns.t', 'wap-1')
  *   CALL graft.system.set_partition_spec('ns.t', 'hours(ts)')
  *
  * Spark 4's analyzer owns argument semantics — name/position binding,
  * defaults, type coercion (`BindProcedures`) — and invokes the bound
  * procedure at analysis; each procedure delegates to the LakeTable
  * method of the same name (one transactional commit where the
  * operation commits at all) and returns a one-row [[LocalScan]]
  * result the user can see. All side effects, so every procedure
  * reports non-deterministic. */
object SqlProcedures {

  /** Procedure names under the `system` namespace, for listProcedures
    * and error messages. */
  val Names: Seq[String] = Seq("compact", "expire_snapshots", "vacuum",
    "create_tag", "drop_tag", "create_branch", "publish_branch",
    "abandon_branch", "set_partition_spec")

  def load(name: String, lakeCat: => LakeCatalog)
      : Option[UnboundProcedure] = {
    def table(row: InternalRow): LakeTable = {
      val ident = row.getUTF8String(0).toString
      // full split, not split-on-first: 'a.b.t' must be REJECTED with
      // a clear message, not silently resolved as namespace 'a' /
      // table 'b.t' (which fails later with a confusing lookup error)
      val parts = ident.split("\\.")
      require(parts.length == 2,
        s"procedure table argument must be 'namespace.table' " +
          s"(single-level namespaces only), got '$ident'")
      lakeCat.tableOrAlias(parts(0), parts(1))
    }
    val TableParam =
      ProcedureParameter.in("table", StringType).build()
    def row(values: Any*): Array[InternalRow] =
      Array(new GenericInternalRow(values.toArray))
    def utf8(s: String) = UTF8String.fromString(s)

    name match {
      case "compact" => Some(proc(name,
        "rewrite the current snapshot's files into num_files " +
          "(sort_by: comma-separated range-clustering columns)",
        Seq(TableParam,
          ProcedureParameter.in("num_files", IntegerType)
            .defaultValue("4").build(),
          ProcedureParameter.in("sort_by", StringType)
            .defaultValue("''").build()),
        StructType(Seq(StructField("version", IntegerType))),
        in => {
          val sortBy = in.getUTF8String(2).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val v =
            if (sortBy.isEmpty) table(in).compact(in.getInt(1))
            else table(in).compactSorted(in.getInt(1), sortBy)
          row(v)
        }))
      case "expire_snapshots" => Some(proc(name,
        "drop snapshot metadata beyond keep_last and reclaim files " +
          "only they referenced (older than min_age_ms)",
        Seq(TableParam,
          ProcedureParameter.in("keep_last", IntegerType).build(),
          ProcedureParameter.in("min_age_ms", LongType)
            .defaultValue("0").build()),
        StructType(Seq(StructField("expired_snapshots", IntegerType),
          StructField("reclaimed_files", IntegerType))),
        in => {
          val (exp, files) =
            table(in).expireSnapshots(in.getInt(1), in.getLong(2))
          row(exp, files)
        }))
      case "vacuum" => Some(proc(name,
        "reclaim unreferenced files older than min_age_ms",
        Seq(TableParam,
          ProcedureParameter.in("min_age_ms", LongType)
            .defaultValue("0").build()),
        StructType(Seq(StructField("reclaimed_files", IntegerType))),
        in => row(table(in).vacuum(in.getLong(1)))))
      case "create_tag" => Some(proc(name,
        "name a snapshot version (default: the current main version); " +
          "read it back with VERSION AS OF 'name'",
        Seq(TableParam,
          ProcedureParameter.in("tag", StringType).build(),
          ProcedureParameter.in("version", IntegerType)
            .defaultValue("-1").build()),
        StructType(Seq(StructField("tag", StringType),
          StructField("version", IntegerType))),
        in => {
          val t = table(in)
          val tag = in.getUTF8String(1).toString
          val v = if (in.getInt(2) >= 0) in.getInt(2) else t.mainVersion
          t.createTag(tag, v)
          row(utf8(tag), v)
        }))
      case "drop_tag" => Some(proc(name, "remove a snapshot tag",
        Seq(TableParam,
          ProcedureParameter.in("tag", StringType).build()),
        StructType(Seq(StructField("dropped", StringType))),
        in => {
          val tag = in.getUTF8String(1).toString
          table(in).dropTag(tag)
          row(utf8(tag))
        }))
      case "create_branch" => Some(proc(name,
        "open a write-audit-publish branch: main pins at the current " +
          "version, later commits stage until publish/abandon",
        Seq(TableParam,
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(StructField("branch", StringType),
          StructField("pinned_version", IntegerType))),
        in => {
          val t = table(in)
          val br = in.getUTF8String(1).toString
          t.createBranch(br)
          row(utf8(br), t.mainVersion)
        }))
      case "publish_branch" => Some(proc(name,
        "atomically adopt a WAP branch's staged commits on main",
        Seq(TableParam,
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(StructField("version", IntegerType))),
        in => row(table(in).publishBranch(
          in.getUTF8String(1).toString))))
      case "abandon_branch" => Some(proc(name,
        "discard a WAP branch's staged commits; main stays at its pin",
        Seq(TableParam,
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(StructField("version", IntegerType))),
        in => row(table(in).abandonBranch(
          in.getUTF8String(1).toString))))
      case "set_partition_spec" => Some(proc(name,
        "evolve the partition spec for FUTURE writes (';'-separated " +
          "transforms, e.g. 'hours(ts)' or 'region;days(ts)'); " +
          "existing files keep their layout and keep pruning via " +
          "their own epoch's transforms",
        Seq(TableParam,
          ProcedureParameter.in("spec", StringType).build()),
        StructType(Seq(StructField("version", IntegerType))),
        in => row(table(in).alterPartitionSpec(
          in.getUTF8String(1).toString.split(";").map(_.trim)
            .filter(_.nonEmpty).toSeq))))
      case _ => None
    }
  }

  /** Assemble an (unbound -> bound) procedure pair: binding is
    * type-driven by the analyzer, so bind() just returns the bound
    * form with the declared parameters. */
  private def proc(procName: String, procDescription: String,
                   params: Seq[ProcedureParameter],
                   resultSchema: StructType,
                   body: InternalRow => Array[InternalRow])
      : UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = procDescription
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = procDescription
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] =
            java.util.Collections.singletonList(new LocalScan {
              private val out = body(input)
              override def rows(): Array[InternalRow] = out
              override def readSchema(): StructType = resultSchema
              override def description(): String =
                s"graft.system.$procName result"
            }: Scan).iterator()
        }
    }
}
