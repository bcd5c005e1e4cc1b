package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.{LakeCatalog, LakeTable}
import graft.streaming.MVManager

/** Typed engine configuration. Mirrors the reference's YAML config
  * surface (pkg/config/config.go:12-57 in /root/reference) but every
  * knob is actually WIRED — the reference declares batching.maxRows /
  * maxTimeWindow / metrics and never reads them (config.go:72-77 are
  * defaults that no pipeline code consumes).
  *
  *  - batching.maxFilesPerTrigger -> file-source admission control
  *  - batching.triggerInterval    -> micro-batch trigger (the reference's
  *    hardcoded 500 ms ticker, ingestor.go:135, now configurable)
  *  - metrics.enabled             -> StreamingQueryListener wiring
  */
case class StorageConfig(
    warehouseDir: String,
    format: String = "parquet")

case class CatalogConfig(
    namespace: String = "default")

case class BatchingConfig(
    triggerInterval: String = "500 milliseconds",
    maxFilesPerTrigger: Option[Int] = None,
    availableNow: Boolean = false)

case class MetricsConfig(enabled: Boolean = true)

case class GraftConfig(
    storage: StorageConfig,
    catalog: CatalogConfig = CatalogConfig(),
    batching: BatchingConfig = BatchingConfig(),
    metrics: MetricsConfig = MetricsConfig()) {
  def trigger: Trigger =
    if (batching.availableNow) Trigger.AvailableNow()
    else Trigger.ProcessingTime(batching.triggerInterval)
}

/** The engine facade: session + catalog + MV manager in one object —
  * the API surface a user of the reference system (RisingWave MVs +
  * ingestion + Iceberg commit) programs against, re-expressed
  * Spark-native. Batch queries go through `sql`/DataFrames as usual;
  * continuous MVs go through `startMaterializedView`.
  */
class GraftEngine(val spark: SparkSession, val config: GraftConfig) {

  GraftFunctions.register(spark) // cosine_sim & friends available in SQL

  val catalog = new LakeCatalog(spark, config.storage.warehouseDir)
  val mvs = new MVManager(
    spark, s"${config.storage.warehouseDir}/_checkpoints")

  def sql(query: String): DataFrame = spark.sql(query)

  /** Source half of the reference pipeline: a continuously-discovered
    * directory of files as a stream (stands in for the Flight DoGet
    * poll loop; a DataSource-V2 Flight source slots in here later). */
  def fileStream(path: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val r = spark.readStream.schema(schema)
    config.batching.maxFilesPerTrigger
      .foreach(m => r.option("maxFilesPerTrigger", m))
    r.parquet(path)
  }

  /** Register + run a materialized view: the streaming `transformed`
    * DataFrame is continuously committed into the lake table
    * `<namespace>.<name>` (created on first use from the stream schema),
    * one snapshot per micro-batch, exactly-once. */
  def startMaterializedView(name: String, transformed: DataFrame)
      : (LakeTable, StreamingQuery) = {
    val table = catalog.createOrLoadTable(
      config.catalog.namespace, name, transformed.schema)
    val q = mvs.startToLake(name, transformed, table, config.trigger)
    (table, q)
  }

  def table(name: String): LakeTable =
    catalog.table(config.catalog.namespace, name)

  def readTable(name: String): DataFrame = table(name).read()

  /** Reference lifecycle parity (main.go:31-48): block until MV
    * termination / stop everything. */
  def awaitAnyTermination(): Unit = spark.streams.awaitAnyTermination()
  def shutdown(): Unit = mvs.stopAll()
}

object GraftEngine {
  def apply(spark: SparkSession, warehouseDir: String): GraftEngine =
    new GraftEngine(spark, GraftConfig(StorageConfig(warehouseDir)))
}
