package graft.lake

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Iceberg-style transactional table: immutable parquet data files + an
  * atomically-committed JSON snapshot log.
  *
  * Supersedes the reference's committer/catalog/schema-conversion trio
  * (iceberg_committer.go:54-147, schema_conversion.go:11-254 in
  * /root/reference) with three deliberate upgrades the reference lacks:
  * real field-ID assignment (globally unique, monotone — the reference
  * hardcodes colliding positional IDs), additive schema evolution (the
  * reference's "evolution handling" is a README claim with no code), and
  * optimistic-concurrency commits (the reference loses batches on
  * write/commit races).
  *
  * Layout under `root/`:
  *   data/batch-<uuid>/part-*.parquet   -- immutable data files
  *   metadata/v%08d.json                -- snapshot log, one file per commit
  *
  * Commit protocol: serialize the snapshot to a temp file, then
  * hard-link it to its version slot — link(2) fails atomically if the
  * version already exists, which is the whole concurrency story: losers
  * re-read the latest snapshot, rebase their (already-written, immutable)
  * files on top, and retry. No locks, no coordinator; works on any
  * POSIX filesystem and maps to putIfAbsent on object stores.
  */
class LakeTable private (
    val spark: SparkSession, val root: String) {

  import LakeTable._

  private def metaDir = Paths.get(root, "metadata")

  // ---- snapshot state ------------------------------------------------

  /** Latest committed snapshot (version, parsed JSON). */
  private def latest(): (Int, JsonNode) = {
    val v = currentVersion
    require(v >= 0, s"no snapshots at $root")
    (v, mapper.readTree(Files.readString(versionPath(metaDir, v))))
  }

  def currentVersion: Int = {
    if (!Files.isDirectory(metaDir)) return -1
    Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case VersionRe(n) => n.toInt }
      .foldLeft(-1)(math.max)
  }

  def schema: StructType =
    DataTypeBridge.fromJson(latest()._2.get("schemaJson").asText())

  def properties: Map[String, String] =
    latest()._2.get("properties").properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap

  def fieldIds: Map[String, Int] =
    latest()._2.get("fieldIds").properties().asScala
      .map(e => e.getKey -> e.getValue.asInt()).toMap

  private def filesOf(node: JsonNode): Seq[FileEntry] =
    node.get("files").elements().asScala.map { f =>
      FileEntry(f.get("path").asText(), f.get("rows").asLong())
    }.toSeq

  def dataFiles: Seq[FileEntry] = filesOf(latest()._2)

  def appMeta(key: String): Option[String] = {
    val m = latest()._2.get("appMeta")
    Option(m.get(key)).map(_.asText())
  }

  /** appMeta of a specific historical snapshot. */
  def appMetaAt(version: Int, key: String): Option[String] = {
    val n = mapper.readTree(Files.readString(versionPath(metaDir, version)))
    Option(n.get("appMeta")).flatMap(m => Option(m.get(key))).map(_.asText())
  }

  def partitionBy: Seq[String] = {
    val n = latest()._2.get("partitionBy")
    if (n == null) Seq.empty
    else n.elements().asScala.map(_.asText()).toSeq
  }

  /** Retained snapshots only (expired versions are absent). */
  def snapshots: Seq[SnapshotInfo] =
    (0 to currentVersion)
      .filter(v => Files.exists(versionPath(metaDir, v)))
      .map { v =>
        val n = mapper.readTree(Files.readString(versionPath(metaDir, v)))
        SnapshotInfo(v, n.get("committedAtMs").asLong(),
          filesOf(n).size, filesOf(n).map(_.rows).sum)
      }

  // ---- read ----------------------------------------------------------

  def read(): DataFrame = readVersion(currentVersion)

  /** Time travel: read the file set of any committed snapshot, under the
    * CURRENT schema of that snapshot (old files missing later-added
    * columns surface them as null — additive evolution semantics). */
  def readVersion(v: Int): DataFrame = {
    val node = mapper.readTree(Files.readString(versionPath(metaDir, v)))
    val snapSchema = DataTypeBridge.fromJson(node.get("schemaJson").asText())
    val paths = filesOf(node).map(f => s"$root/${f.path}")
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snapSchema)
    else if (partitionBy.isEmpty)
      spark.read.schema(snapSchema).parquet(paths: _*)
    else
      // hive-style partition dirs live directly under data/ — basePath
      // lets Spark recover partition columns AND prune partitions from
      // filters before touching any file
      spark.read.option("basePath", s"$root/data")
        .schema(snapSchema).parquet(paths: _*)
  }

  /** Incremental read: only rows in files committed AFTER `fromVersion`
    * (CDC-style append diff — the snapshot log makes this a file-list
    * set difference, no data diffing). */
  def changesSince(fromVersion: Int): DataFrame = {
    val from =
      if (fromVersion < 0) Set.empty[String]
      else {
        val node = mapper.readTree(
          Files.readString(versionPath(metaDir, fromVersion)))
        filesOf(node).map(_.path).toSet
      }
    val added = dataFiles.map(_.path).filterNot(from.contains)
    val snapSchema = schema
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snapSchema)
    else if (partitionBy.isEmpty)
      spark.read.schema(snapSchema).parquet(added.map(p => s"$root/$p"): _*)
    else
      spark.read.option("basePath", s"$root/data")
        .schema(snapSchema).parquet(added.map(p => s"$root/$p"): _*)
  }

  // ---- write ---------------------------------------------------------

  /** Transactional append. Returns the committed version. Thread/process
    * safe via the optimistic hard-link protocol. Schema handling:
    * df columns missing from the table must exist nullable in df's place
    * (filled with null); new df columns are added to the table schema
    * (additive evolution) with fresh field IDs. */
  def append(df: DataFrame, appMeta: Map[String, String] = Map.empty): Int =
    commit(writeData(df), replacedFiles = Set.empty, appMeta)

  /** Idempotent append keyed by a streaming micro-batch id: commits at
    * most once per distinct batchId (exactly-once sink contract for
    * foreachBatch under retries/restarts). The high-water mark is
    * carried through EVERY snapshot (`lastBatchId`), so interleaved
    * plain appends or compactions cannot blind the dedup check, and the
    * check is re-evaluated inside the commit loop — atomic with the
    * commit itself. */
  def appendExactlyOnce(df: DataFrame, batchId: Long): Int = {
    if (batchId <= lastBatchId) currentVersion
    else append(df, Map(BatchIdKey -> batchId.toString))
  }

  /** Highest streaming batch id ever committed (-1 if none). */
  def lastBatchId: Long = {
    val n = latest()._2.get("lastBatchId")
    if (n == null) -1L else n.asLong()
  }

  /** Compaction: rewrite snapshot `currentVersion`'s file set into
    * `numFiles` files and commit a snapshot where those files are
    * REPLACED — but any files appended concurrently (after the
    * compaction read) are rebased on top, so compaction never loses a
    * racing append (see `compactFrom`). Partitioned tables stay
    * partitioned. */
  def compact(numFiles: Int): Int = compactFrom(currentVersion, numFiles)

  /** Compact the file set of a specific snapshot; files added by commits
    * after `baseVersion` survive untouched (append-vs-compact races are
    * safe: replaced set = exactly the files the rewrite covered). */
  def compactFrom(baseVersion: Int, numFiles: Int): Int = {
    val baseNode = mapper.readTree(
      Files.readString(versionPath(metaDir, baseVersion)))
    val replaced = filesOf(baseNode).map(_.path).toSet
    val rewritten = readVersion(baseVersion).repartition(numFiles)
    commit(writeData(rewritten), replacedFiles = replaced,
      Map("compaction" -> "true"))
  }

  /** Write df as immutable parquet files; returns entries + df schema.
    * Unpartitioned: one immutable batch dir. Partitioned: write through
    * a staging dir, then hard-rename each part file into its hive-style
    * `data/<k=v>/...` slot under a fresh UUID name (renames are O(1)
    * metadata ops; the partition dirs are shared across batches so
    * basePath partition discovery sees one consistent layout). */
  private def writeData(df: DataFrame): PendingWrite = {
    val rows = df.count()
    val parts = partitionBy
    if (parts.isEmpty) {
      val batchDir = s"data/batch-${UUID.randomUUID()}"
      df.write.mode("errorifexists").parquet(s"$root/$batchDir")
      val names = Files.list(Paths.get(root, batchDir)).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .toSeq.sorted
      // rows recorded per-batch (cheap metadata; per-file split not needed)
      val entries = names.zipWithIndex.map { case (p, i) =>
        FileEntry(s"$batchDir/$p", if (i == 0) rows else 0L)
      }
      PendingWrite(entries, df.schema)
    } else {
      val staging = Paths.get(root, s".staging-${UUID.randomUUID()}")
      df.write.partitionBy(parts: _*).parquet(staging.toString)
      val moved = Files.walk(staging).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString)
        .map { p =>
          val partRel = staging.relativize(p.getParent).toString
          val destDir = Paths.get(root, "data", partRel)
          Files.createDirectories(destDir)
          val name = s"${UUID.randomUUID()}.parquet"
          Files.move(p, destDir.resolve(name))
          if (partRel.isEmpty) s"data/$name" else s"data/$partRel/$name"
        }
      // clear staging leftovers (_SUCCESS, empty partition dirs)
      Files.walk(staging).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
      val entries = moved.zipWithIndex.map { case (p, i) =>
        FileEntry(p, if (i == 0) rows else 0L)
      }
      PendingWrite(entries, df.schema)
    }
  }

  /** Optimistic-concurrency metadata commit. `replacedFiles` names the
    * exact files this commit supersedes (empty for plain appends): on
    * every retry the base is re-read, so files added by concurrent
    * committers are carried forward instead of dropped. */
  private def commit(pending: PendingWrite, replacedFiles: Set[String],
                     meta: Map[String, String]): Int = {
    var attempt = 0
    val myBatchId = meta.get(BatchIdKey).map(_.toLong)
    while (true) {
      val (v, cur) = latest()
      val curLastBatch = Option(cur.get("lastBatchId"))
        .map(_.asLong()).getOrElse(-1L)
      // a racer already committed this (or a later) micro-batch: the
      // write becomes a no-op instead of a duplicate
      if (myBatchId.exists(_ <= curLastBatch)) return v
      val curSchema = DataTypeBridge.fromJson(cur.get("schemaJson").asText())
      val curIds = fieldIds
      val (newSchema, newIds) = evolve(curSchema, curIds, pending.schema)
      val baseFiles = filesOf(cur).filterNot(f => replacedFiles.contains(f.path))
      val node = snapshotJson(
        version = v + 1, parent = v, schema = newSchema, ids = newIds,
        props = cur.get("properties"),
        files = baseFiles ++ pending.files, meta = meta,
        partitionBy = partitionBy,
        lastBatchId = math.max(curLastBatch, myBatchId.getOrElse(-1L)))
      if (tryCommit(metaDir, v + 1, node)) return v + 1
      attempt += 1
      require(attempt < 100, s"commit contention at $root, giving up")
    }
    -1 // unreachable
  }

  /** Iceberg-style snapshot retention: delete snapshot metadata older
    * than the newest `keepLast` versions, then vacuum data files that
    * only those expired snapshots referenced. Time travel remains valid
    * for every retained version; the contiguous version numbering the
    * commit protocol relies on is preserved (only a lower bound moves).
    * Returns (expired snapshots, deleted data files). */
  def expireSnapshots(keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val cur = currentVersion
    val cutoff = cur - keepLast + 1
    val expired = (0 until cutoff).filter(v =>
      Files.exists(versionPath(metaDir, v)))
    expired.foreach(v => Files.delete(versionPath(metaDir, v)))
    val removedFiles = vacuumAgainst(
      (math.max(0, cutoff) to cur).filter(v =>
        Files.exists(versionPath(metaDir, v))))
    (expired.size, removedFiles)
  }

  /** Garbage-collect files no snapshot references: leftovers from
    * crashed writers (written but never committed — the failure mode the
    * reference silently leaks on every write/commit error) and staging
    * dirs. Never touches referenced files, so it is safe concurrent with
    * readers of any committed snapshot — but NOT with in-flight writers
    * (their pre-commit files look orphaned; production would add an age
    * threshold, as Iceberg's orphan-file removal does). Returns deleted
    * file count. */
  def vacuum(): Int =
    vacuumAgainst((0 to currentVersion).filter(v =>
      Files.exists(versionPath(metaDir, v))))

  private def vacuumAgainst(versions: Seq[Int]): Int = {
    val referenced: Set[Path] =
      versions.flatMap { v =>
        val n = mapper.readTree(Files.readString(versionPath(metaDir, v)))
        filesOf(n).map(f => Paths.get(root, f.path).normalize())
      }.toSet
    var deleted = 0
    val dataDir = Paths.get(root, "data")
    if (Files.isDirectory(dataDir)) {
      Files.walk(dataDir).iterator().asScala.toSeq.reverse.foreach { p =>
        if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet")
            && !referenced.contains(p.normalize())) {
          Files.delete(p); deleted += 1
        } else if (Files.isDirectory(p) &&
            !Files.list(p).iterator().hasNext && p != dataDir) {
          Files.delete(p)
        }
      }
    }
    // stale staging dirs from crashed partitioned writes
    Files.list(Paths.get(root)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(".staging-"))
      .toSeq.foreach { st =>
        Files.walk(st).iterator().asScala.toSeq.reverse.foreach { p =>
          if (Files.isRegularFile(p)) deleted += 1
          Files.deleteIfExists(p)
        }
      }
    deleted
  }

  /** Additive evolution: union of table and incoming columns; incoming
    * types must match existing ones exactly; new columns become nullable
    * and get fresh, never-reused field IDs. */
  private def evolve(cur: StructType, ids: Map[String, Int],
                     incoming: StructType): (StructType, Map[String, Int]) = {
    val curByName = cur.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      curByName.get(f.name).foreach { existing =>
        require(existing.dataType == f.dataType,
          s"type mismatch for ${f.name}: table ${existing.dataType} " +
            s"vs append ${f.dataType} (promotion unsupported)")
      }
    }
    val added = incoming.fields.filterNot(f => curByName.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    var maxId = if (ids.isEmpty) 0 else ids.values.max
    val newIds = ids ++ added.map { f => maxId += 1; f.name -> maxId }
    (StructType(cur.fields ++ added), newIds)
  }
}

object LakeTable {
  private[lake] val mapper = new ObjectMapper()
  private val VersionRe = "v(\\d{8})\\.json".r
  val BatchIdKey = "streaming.batchId"

  case class FileEntry(path: String, rows: Long)
  case class SnapshotInfo(version: Int, committedAtMs: Long,
                          numFiles: Int, rows: Long)
  private[lake] case class PendingWrite(files: Seq[FileEntry],
                                        schema: StructType)

  private def versionPath(metaDir: Path, v: Int): Path =
    metaDir.resolve(f"v$v%08d.json")

  def exists(root: String): Boolean =
    Files.isDirectory(Paths.get(root, "metadata"))

  /** Create an empty table (snapshot v0) with field IDs 1..n assigned in
    * declaration order. Fails if the table already exists. */
  def create(spark: SparkSession, root: String, schema: StructType,
             properties: Map[String, String] = Map.empty,
             partitionBy: Seq[String] = Seq.empty): LakeTable = {
    partitionBy.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not in schema"))
    val metaDir = Paths.get(root, "metadata")
    Files.createDirectories(metaDir)
    val ids = schema.fields.zipWithIndex.map { case (f, i) => f.name -> (i + 1) }.toMap
    val propsNode = mapper.createObjectNode()
    (Map("write.format.default" -> "parquet") ++ properties)
      .foreach { case (k, v) => propsNode.put(k, v) }
    val node = snapshotJson(0, -1, schema, ids, propsNode, Nil, Map.empty,
      partitionBy)
    require(tryCommit(metaDir, 0, node), s"table already exists at $root")
    new LakeTable(spark, root)
  }

  def load(spark: SparkSession, root: String): LakeTable = {
    require(exists(root), s"no lake table at $root")
    new LakeTable(spark, root)
  }

  def createOrLoad(spark: SparkSession, root: String,
                   schema: StructType): LakeTable =
    if (exists(root)) load(spark, root) else create(spark, root, schema)

  private[lake] def snapshotJson(
      version: Int, parent: Int, schema: StructType,
      ids: Map[String, Int], props: JsonNode,
      files: Seq[FileEntry], meta: Map[String, String],
      partitionBy: Seq[String] = Seq.empty,
      lastBatchId: Long = -1L): JsonNode = {
    val n = mapper.createObjectNode()
    n.put("version", version)
    n.put("parent", parent)
    n.put("lastBatchId", lastBatchId)
    val pb = n.putArray("partitionBy")
    partitionBy.foreach(pb.add)
    n.put("committedAtMs", System.currentTimeMillis())
    n.put("schemaJson", DataTypeBridge.toJson(schema))
    val idNode = n.putObject("fieldIds")
    ids.toSeq.sortBy(_._2).foreach { case (k, v) => idNode.put(k, v) }
    n.set[JsonNode]("properties", props)
    val fileArr = n.putArray("files")
    files.foreach { f =>
      val fn = fileArr.addObject(); fn.put("path", f.path); fn.put("rows", f.rows)
    }
    val metaNode = n.putObject("appMeta")
    meta.foreach { case (k, v) => metaNode.put(k, v) }
    n
  }

  /** Atomic create-if-absent of a version file: write a temp sibling,
    * hard-link into the version slot (atomic, fails if present), unlink
    * the temp. Returns false when the version was taken by a racer. */
  private[lake] def tryCommit(metaDir: Path, version: Int,
                              node: JsonNode): Boolean = {
    val tmp = metaDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(node))
    try {
      Files.createLink(versionPath(metaDir, version), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }
}

/** StructType <-> JSON via Spark's own stable wire format. */
object DataTypeBridge {
  def toJson(s: StructType): String = s.json
  def fromJson(j: String): StructType =
    org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType]
}
