package graft.lake

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Namespace -> table registry over a warehouse directory: the
  * Spark-native stand-in for the reference's REST catalog client
  * (iceberg_committer.go:40-51 + 84-119 in /root/reference — create
  * namespace tolerant of exists, create table with format property).
  * Layout: `<warehouse>/<namespace>/<table>/{data,metadata}`.
  * Every table the catalog creates or loads commits through the
  * catalog's [[CommitStore]], so one seam choice covers the whole
  * warehouse (Engine -> catalog -> tables).
  */
class LakeCatalog(spark: SparkSession, warehouseDir: String,
                  store: CommitStore = PosixCommitStore) {

  private def nsPath(ns: String) = Paths.get(warehouseDir, ns)
  private def tablePath(ns: String, name: String) =
    s"$warehouseDir/$ns/$name"

  /** Idempotent, like the reference's exists-tolerant CreateNamespace. */
  def createNamespace(ns: String): Unit =
    Files.createDirectories(nsPath(ns))

  def listNamespaces(): Seq[String] =
    LakeTable.listDir(Paths.get(warehouseDir))
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filterNot(_.startsWith("_")).sorted

  def listTables(ns: String): Seq[String] =
    LakeTable.listDir(nsPath(ns))
      .filter(p => LakeTable.exists(p.toString))
      .map(_.getFileName.toString).sorted

  def tableExists(ns: String, name: String): Boolean =
    LakeTable.exists(tablePath(ns, name))

  def createTable(ns: String, name: String, schema: StructType,
                  properties: Map[String, String] = Map.empty,
                  partitionBy: Seq[String] = Seq.empty,
                  bucketBy: Option[(String, Int)] = None): LakeTable = {
    createNamespace(ns)
    // mirror of setAlias's no-shadow check: a table created under an
    // existing alias's name would make tableOrAlias silently prefer
    // the new table over the published pointer — the blue-green
    // consumer's reads would flip to an unrelated table
    require(!aliasExists(ns, name),
      s"$ns.$name is an alias (-> ${resolveAlias(ns, name)}); " +
        "tables cannot shadow aliases")
    LakeTable.create(spark, tablePath(ns, name), schema, properties,
      partitionBy, bucketBy, store)
  }

  def createOrLoadTable(ns: String, name: String,
                        schema: StructType): LakeTable = {
    createNamespace(ns)
    if (LakeTable.exists(tablePath(ns, name))) table(ns, name)
    else createTable(ns, name, schema)
  }

  def table(ns: String, name: String): LakeTable =
    LakeTable.load(spark, tablePath(ns, name), store)

  /** Drop a table: data, metadata, and the catalog entry (the directory)
    * are removed together — there is no half-dropped state a subsequent
    * create could trip over. Fails if the table doesn't exist, like the
    * reference catalog's delete. Also fails while any alias in the
    * namespace still points at the table — dropping an alias target
    * would leave the published pointer dangling, failing blue-green
    * consumers at RESOLVE time instead of at this (retargetable)
    * decision point. Retarget or remove the alias first.
    *
    * These guards (and setAlias's) are best-effort: a drop racing a
    * concurrent setAlias can still interleave past both checks. The
    * catalog's atomicity unit is the single CommitStore slot; cross-
    * object invariants are advisory, same as Iceberg's REST catalog. */
  def dropTable(ns: String, name: String): Unit = {
    require(tableExists(ns, name), s"no table $ns.$name")
    val pointing = listAliases(ns).filter(resolveAlias(ns, _) == name)
    require(pointing.isEmpty,
      s"cannot drop $ns.$name: alias(es) ${pointing.mkString(", ")} " +
        "still point at it; retarget them first")
    LakeTable.walkDir(Paths.get(tablePath(ns, name))).reverse
      .foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(Paths.get(tablePath(ns, name)))
  }

  /** Remove an EMPTY namespace (no tables, no aliases) — the SQL
    * catalog's DROP NAMESPACE lands here so directory removal goes
    * through the same walk/delete machinery as dropTable rather than
    * ad-hoc filesystem calls at the DSv2 layer. */
  def dropNamespace(ns: String): Unit = {
    require(listTables(ns).isEmpty && listAliases(ns).isEmpty,
      s"namespace $ns is not empty")
    LakeTable.walkDir(nsPath(ns)).reverse
      .foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(nsPath(ns))
  }

  // ---- atomic table ALIASES: the blue-green publish pointer ----------
  //
  // A pipeline that rebuilds a table (re-dedupe the corpus, recompact
  // an index under new geometry) needs an atomic cutover that never
  // renames data. On an object store, renaming a table directory is an
  // O(files) copy — the anti-pattern this lake's rename-free writes
  // exist to avoid — so the publish primitive is a POINTER: an alias
  // is its own tiny version log (the exact mechanism table metadata
  // uses), each retarget is one CommitStore.putIfAbsent of a new
  // version file, and readers resolve the latest. Concurrent
  // retargets serialize per version (one winner, losers retry with a
  // fresh read); a reader sees the old or the new target, never a
  // partial state. This is Iceberg's rename-is-a-catalog-pointer
  // insight, scoped to the one operation that needs it.

  private def aliasDir(ns: String, alias: String) =
    Paths.get(warehouseDir, ns, s"_alias_$alias")

  /** Point `alias` at table `target` (create or atomically retarget).
    * The target must exist — an alias can never dangle at creation. */
  def setAlias(ns: String, alias: String, target: String): Unit = {
    require(tableExists(ns, target), s"no table $ns.$target")
    require(!tableExists(ns, alias),
      s"$ns.$alias is a real table; aliases cannot shadow tables")
    val dir = aliasDir(ns, alias)
    Files.createDirectories(dir)
    var attempts = 0
    while (true) {
      val next = currentAliasVersion(ns, alias) + 1
      if (store.putIfAbsent(dir.resolve(s"v$next.txt"), target)) return
      attempts += 1
      require(attempts < 100,
        s"alias contention at $ns.$alias: no progress after $attempts")
    }
  }

  private def currentAliasVersion(ns: String, alias: String): Int =
    LakeTable.listDir(aliasDir(ns, alias))
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)

  def aliasExists(ns: String, alias: String): Boolean =
    currentAliasVersion(ns, alias) > 0

  /** Remove an alias (its pointer log; the target table is untouched).
    * The DROP TABLE surface for alias names. */
  def dropAlias(ns: String, alias: String): Unit = {
    require(aliasExists(ns, alias), s"no alias $ns.$alias")
    LakeTable.walkDir(aliasDir(ns, alias)).reverse
      .foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(aliasDir(ns, alias))
  }

  /** All aliases published in a namespace. */
  def listAliases(ns: String): Seq[String] =
    LakeTable.listDir(nsPath(ns))
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("_alias_") =>
        n.stripPrefix("_alias_") }
      .filter(aliasExists(ns, _)).sorted

  /** The table name an alias currently points at. */
  def resolveAlias(ns: String, alias: String): String = {
    val v = currentAliasVersion(ns, alias)
    require(v > 0, s"no alias $ns.$alias")
    store.read(aliasDir(ns, alias).resolve(s"v$v.txt"))
      .getOrElse(throw new IllegalStateException(
        s"alias $ns.$alias v$v won its slot but is not yet readable"))
      .trim
  }

  /** Load through an alias if one exists, else the table directly —
    * the read surface a blue-green consumer points at. */
  def tableOrAlias(ns: String, name: String): LakeTable =
    if (tableExists(ns, name)) table(ns, name)
    else table(ns, resolveAlias(ns, name))
}
