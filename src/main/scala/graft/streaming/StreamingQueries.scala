package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.lake.LakeTable

/** Streaming query surface: the SURVEY §7 step-4 minimum slice (file
  * stream -> windowed MV -> sink -> read-back), exposed as batch-checkable
  * SparkEntry queries so the DuckDB oracle can grade streaming results.
  */
object StreamingQueries {

  /** events as a STREAMING DataFrame (same nanos handling as
    * Tables.load, which the file-stream source needs schema-first).
    * The file source requires a *directory*, so the single fixture file
    * is exposed through a staged symlink dir (read-only fixtures stay
    * untouched). */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Paths.get(
      s"/root/repo/target/stream-src/${dir.replaceAll("[^A-Za-z0-9.]", "_")}")
    java.nio.file.Files.createDirectories(stage)
    val link = stage.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream.schema(rawSchema).parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** documents as a STREAMING DataFrame (same staged-symlink-dir trick
    * as eventsStream: the file source needs a directory). */
  def docsStream(s: SparkSession, dir: String): DataFrame = {
    val stage = java.nio.file.Paths.get(
      s"/root/repo/target/stream-src-docs/${dir.replaceAll("[^A-Za-z0-9.]", "_")}")
    java.nio.file.Files.createDirectories(stage)
    val link = stage.resolve("documents.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    s.readStream.schema(schema).parquet(stage.toString)
  }

  /** Streaming corpus hygiene end-to-end: stream the documents table
    * through the q62 PII enrichment + redaction as an exactly-once MV
    * into the lake, then summarize what was scrubbed. The stateless
    * hygiene projection lifts to streaming unchanged — ingest-time
    * scrubbing, so raw PII never reaches storage. */
  def streamHygiene(s: SparkSession, dir: String): DataFrame = {
    import graft.{BatchingConfig, CatalogConfig, GraftConfig, GraftEngine, StorageConfig}
    val runId = UUID.randomUUID().toString.replace("-", "")
    val engine = new GraftEngine(s, GraftConfig(
      StorageConfig(s"/root/repo/target/lake/hyg-$runId"),
      CatalogConfig(namespace = "hygiene"),
      BatchingConfig(availableNow = true)))
    val enriched = docsStream(s, dir).selectExpr(
      "doc_id",
      "concat(text, ' contact user', CAST(doc_id AS STRING), " +
        "'@example.com or 555-', " +
        "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', " +
        "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), " +
        "' from 10.0.', CAST(doc_id % 256 AS STRING), '.7 end') AS text")
    val clean = graft.operators.CorpusOps.redactPii(enriched)
    val (table, q) = engine.startMaterializedView("clean_docs", clean)
    q.awaitTermination()
    table.read().agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_emails")).as("sum_emails"),
      sum(col("n_phones")).as("sum_phones"),
      sum(col("n_ips")).as("sum_ips"),
      sum(length(col("clean_text"))).as("sum_clean_chars"))
  }

  /** Tumbling-window MV driven as a real StreamingQuery (AvailableNow,
    * complete mode, memory sink), returned as a batch DataFrame. Matches
    * the plain GROUP BY date_trunc oracle because complete mode emits
    * every window and a single AvailableNow pass drops nothing. */
  def tumblingMv(s: SparkSession, dir: String): DataFrame = {
    val qname = "mv_" + UUID.randomUUID().toString.replace("-", "")
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qname)
      .option("checkpointLocation",
        s"/root/repo/target/ckpt/$qname")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(qname).select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
      col("event_type"), col("n"), col("sum_value"))
  }

  /** Full pipeline slice THROUGH THE ENGINE FACADE: stream events ->
    * transform -> MV registered in the catalog -> exactly-once commits
    * into its LakeTable (one snapshot per micro-batch) -> read the table
    * back and aggregate. This is the reference's whole dataflow
    * (source/write/commit, E1-E3) in one query. */
  def streamToLake(s: SparkSession, dir: String): DataFrame = {
    import graft.{BatchingConfig, CatalogConfig, GraftConfig, GraftEngine, StorageConfig}
    val runId = UUID.randomUUID().toString.replace("-", "")
    val engine = new GraftEngine(s, GraftConfig(
      StorageConfig(s"/root/repo/target/lake/run-$runId"),
      CatalogConfig(namespace = "mv"),
      BatchingConfig(availableNow = true)))
    val stream = eventsStream(s, dir)
      .withColumn("ingested_at", current_timestamp())
    val (table, q) = engine.startMaterializedView("events_mv", stream)
    q.awaitTermination()
    table.read()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Streaming dedup: the events stream unioned with itself (every row
    * duplicated) -> watermark -> dropDuplicatesWithinWatermark restores
    * exactly one copy; aggregate of the deduped output must equal the
    * plain batch aggregate. */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val qname = "dedup_" + UUID.randomUUID().toString.replace("-", "")
    val doubled = eventsStream(s, dir)
      .unionByName(eventsStream(s, dir))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = doubled.writeStream.outputMode("append")
      .format("memory").queryName(qname)
      .option("checkpointLocation", s"/root/repo/target/ckpt/$qname")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(qname)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
  }

  /** Partitioned LakeTable: hive-layout partitions by event_type, then a
    * partition-pruned read (only the `purchase` directory is scanned). */
  def lakePartitioned(s: SparkSession, dir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.replace("-", "")
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val table = LakeTable.create(s,
      s"/root/repo/target/lake/part-$runId/events", ev.schema,
      partitionBy = Seq("event_type"))
    table.append(ev)
    table.read()
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
  }

  /** Batch LakeTable roundtrip: create, two appends (two snapshots),
    * read back + aggregate — exercises create/append/read/commit-log. */
  def lakeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.replace("-", "")
    val ev = Tables.load(s, dir, "events")
    val table = LakeTable.create(s,
      s"/root/repo/target/lake/rt-$runId/events", ev.schema)
    table.append(ev.filter(col("event_id") % 2 === 0))
    table.append(ev.filter(col("event_id") % 2 === 1))
    table.read()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
  }
}
