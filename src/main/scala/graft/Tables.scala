package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * driver-generated parquet directly; at cluster scale the same API points
  * at a warehouse path, so nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is physical TIMESTAMP(NANOS) parquet, which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long via the
    * legacy flag, then floor-truncate to microseconds — the same ns->us
    * truncation DuckDB applies, so oracle comparisons agree. Integer `div`
    * (not double division) because ns-since-epoch exceeds double's 2^53. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Register every fixture table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Ensure at least `defaultParallelism` partitions before CPU-heavy
    * per-row work (shingling, hashing, decoding). Small single-file
    * inputs otherwise pin an expensive narrow stage to one task; on a
    * many-partition production input this is a no-op.
    *
    * The decision uses only optimizer statistics — no physical plan or
    * RDD is built. The file source packs splits to `maxPartitionBytes`,
    * so an input of at least `target * maxPartitionBytes` bytes already
    * scans as >= target partitions and must NOT be reshuffled (at 100 TB
    * the repartition would dwarf the work it enables); anything smaller
    * is cheap to shuffle by definition. */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val perPartition = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(target.toLong) * perPartition) df.repartition(target)
    else df
  }
}
