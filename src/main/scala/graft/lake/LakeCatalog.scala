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
    * reference catalog's delete. */
  def dropTable(ns: String, name: String): Unit = {
    require(tableExists(ns, name), s"no table $ns.$name")
    LakeTable.walkDir(Paths.get(tablePath(ns, name))).reverse
      .foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(Paths.get(tablePath(ns, name)))
  }
}
