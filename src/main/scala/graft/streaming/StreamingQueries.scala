package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Banding, Tables}
import graft.lake.LakeTable

/** Streaming query surface: the SURVEY §7 step-4 minimum slice (file
  * stream -> windowed MV -> sink -> read-back), exposed as batch-checkable
  * SparkEntry queries so the DuckDB oracle can grade streaming results.
  */
object StreamingQueries {

  /** Run `body` with the session shuffle-partition count pinned to `n`,
    * restoring the previous value after. Stateful streaming operators
    * materialize ONE state store per shuffle partition per operator,
    * and that count is checkpoint-pinned at first run — so a query
    * whose state is kilobytes should not pay 32 store
    * create/commit/finalize cycles per micro-batch just because the
    * session default suits terabyte batch shuffles. Sizing state-store
    * parallelism to state volume is the standard Structured Streaming
    * knob; at production state sizes this number goes UP, not down. */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T)
      : T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

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
    val raw = s.readStream.schema(rawSchema).parquet(stage.toString)
    if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else
      // TIMESTAMP_NTZ parquet: watermarks accept only TIMESTAMP (LTZ).
      // The session runs in UTC, so the cast is micros-identical.
      raw.withColumn("ts",
        expr("ts").cast(org.apache.spark.sql.types.TimestampType))
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

  /** Incrementally-MAINTAINED aggregate MV (q90): events paced through
    * 3 micro-batches; each update-mode batch merges only the changed
    * (event_type, uid_bucket) aggregates into the lake table by key —
    * the RisingWave half of the reference. Final state must hash-match
    * the plain batch GROUP BY. */
  def aggregateMv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft-aggmv")
    ev.repartition(6).write.parquet(s"$tmp/src")
    val stream = s.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(s"$tmp/src")
      .groupBy(col("event_type"),
        pmod(col("user_id"), lit(10)).as("uid_bucket"))
      .agg(count(lit(1)).as("n"), Banding.sum2(col("value")).as("sum_value"))
    // bucketed by the COMPOSITE MV key: a delta batch's upsert rewrite
    // touches only the bucket dirs holding its changed keys, so a
    // hot-key micro-batch can't scatter a rewrite across the table
    val table = graft.lake.LakeTable.create(s, s"$tmp/mv", StructType(Seq(
      StructField("event_type", StringType),
      StructField("uid_bucket", LongType),
      StructField("n", LongType),
      StructField("sum_value", DoubleType))),
      bucketBy = Some(("event_type,uid_bucket", 8)))
    val mv = new MVManager(s, s"$tmp/ckpt")
    withShufflePartitions(s, 8) {
      mv.startAggregateToLake("agg_mv", stream, table,
        Seq("event_type", "uid_bucket")).awaitTermination()
    }
    table.read()
      .select("event_type", "uid_bucket", "n", "sum_value")
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
      .agg(count(lit(1)).as("n"), Banding.sum2(col("value")).as("sum_value"))
    withShufflePartitions(s, 8) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname)
        .option("checkpointLocation",
          s"/root/repo/target/ckpt/$qname")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname).select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
      col("event_type"), col("n"), col("sum_value"))
  }

  /** Stream-STATIC join: streaming events enriched against a lake
    * dimension table (customer market segments). The static side is a
    * manifest-served LakeTable read whose file list is pinned at plan
    * time, so every micro-batch joins the SAME dim snapshot — commits
    * landing mid-query never bleed in (snapshot isolation, the
    * slowly-changing-dim contract you want at 100 TB; restart the
    * query to adopt a newer dim snapshot). The dim is broadcast, so
    * each micro-batch is a map-side hash join with no stream-side
    * shuffle before the aggregate. */
  def streamStaticEnrich(s: SparkSession, dir: String): DataFrame = {
    val qname = "sse_" + UUID.randomUUID().toString.replace("-", "")
    val dimRows = graft.Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val dim = graft.lake.LakeTable.create(s,
      s"/root/repo/target/lake/dim-$qname", dimRows.schema)
    dim.append(dimRows)
    val agg = eventsStream(s, dir)
      .join(org.apache.spark.sql.functions.broadcast(dim.read()),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), Banding.sum2(col("value")).as("sum_value"))
    withShufflePartitions(s, 8) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname)
        .option("checkpointLocation", s"/root/repo/target/ckpt/$qname")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname)
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
      .agg(count(lit(1)).as("n"), Banding.sum2(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Streaming dedup: the events stream unioned with itself (every row
    * duplicated) -> watermark -> dropDuplicatesWithinWatermark restores
    * exactly one copy; aggregate of the deduped output must equal the
    * plain batch aggregate. */
  /** Stream-stream interval join as a graded query: purchases joined to
    * the same user's clicks from the preceding hour, both sides
    * watermarked. INNER join matches emit eagerly as both sides arrive
    * (the watermark only bounds buffered state, it never gates inner
    * emission), so Trigger.AvailableNow drains the complete pair set —
    * unlike watermark-gated aggregations, nothing is held back at
    * stream end. The per-purchase rollup happens batch-side on the
    * drained result. At scale the join state is per-user-hour and
    * watermark-expired continuously — memory is bounded by stream rate
    * x interval, not history. */
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val qname = "ssj_" + UUID.randomUUID().toString.replace("-", "")
    val clicks = eventsStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    val joined = purchases.join(clicks, expr(
      """p_user = c_user AND
        |c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts""".stripMargin))
    // symmetric-hash-join state here is a few MB: 8 stores, not 32
    withShufflePartitions(s, 8) {
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(qname)
        .option("checkpointLocation", s"/root/repo/target/ckpt/$qname")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"), max(col("value")).as("value"))
  }

  /** Stream-stream LEFT OUTER interval join — the half of the
    * stream-join surface [[streamIntervalJoin]] (inner, q73) cannot
    * express: every purchase is answered, the click-less ones with a
    * NULL match. Outer emission is watermark-GATED (a null row may
    * only emit once the watermark proves no matching click can still
    * arrive) and Spark emits evicted results in a batch AFTER the
    * watermark advanced — under Trigger.AvailableNow the stream ends
    * with the last data file and the final unmatched rows would stay
    * in state forever. The deterministic fix is the TWO-SENTINEL
    * device: the source directory is staged as (events, sentinel-1,
    * sentinel-2) read one file per trigger; sentinel-1 (a far-future
    * purchase+click pair on an unmatchable negative user) advances
    * BOTH sides' watermarks past every real event, and sentinel-2's
    * batch performs the eviction that emits every remaining null row.
    * Sentinel rows filter out of the result by their negative user id
    * (their own unmatched state dies with the query, unemitted —
    * exactly the rows the device exists to sacrifice). At scale the
    * join state stays bounded by rate x interval like the inner
    * variant; the sentinels model the production practice of closing
    * an event-time window with a high-watermark heartbeat. */
  def streamOuterIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val qname = "ssoj_" + UUID.randomUUID().toString.replace("-", "")
    val stage = Paths.get(s"/root/repo/target/stream-src-oj/$qname")
    Files.createDirectories(stage)
    Files.createSymbolicLink(stage.resolve("events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = s.read.parquet(s"$dir/events.parquet")
    val rawSchema = base.schema
    val tsIsLong =
      rawSchema("ts").dataType == org.apache.spark.sql.types.LongType
    val maxTs = base.agg(max(col("ts"))).head().get(0)
    def sentinelFile(tag: Int): Unit = {
      val tsLit: org.apache.spark.sql.Column =
        if (tsIsLong) lit(maxTs.asInstanceOf[Long] +
          (30L + tag) * 86400L * 1000000000L)
        else maxTs match {
          case t: java.time.LocalDateTime => lit(t.plusDays(30L + tag))
          case t: java.sql.Timestamp => lit(java.sql.Timestamp.from(
            t.toInstant.plusSeconds((30L + tag) * 86400L)))
        }
      val rows = Seq("purchase", "click").zipWithIndex.map {
        case (et, i) =>
          base.limit(1).select(rawSchema.fieldNames.toIndexedSeq.map {
            case "event_id" => lit(-(tag * 10L + i + 1))
              .cast(rawSchema("event_id").dataType).as("event_id")
            case "user_id" => lit(-1L - tag)
              .cast(rawSchema("user_id").dataType).as("user_id")
            case "event_type" => lit(et).as("event_type")
            case "ts" => tsLit.as("ts")
            case other => col(other)
          }: _*)
      }.reduce(_ unionByName _)
      val tmp = stage.resolve(s"tmp$tag")
      rows.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = stage.resolve(f"zz-sentinel-$tag.parquet")
      Files.move(part, dest)
      // file-source ordering is by modification time: the symlinked
      // events file keeps its old fixture mtime, and the sentinels
      // are pushed apart so sentinel-1 always precedes sentinel-2
      Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() + tag * 60000L))
    }
    sentinelFile(1); sentinelFile(2)
    def side(): DataFrame = {
      val raw = s.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      if (tsIsLong) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw.withColumn("ts",
        expr("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
    val clicks = side().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = side().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    val joined = purchases.join(clicks, expr(
      """p_user = c_user AND
        |c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts""".stripMargin),
      "left_outer")
    withShufflePartitions(s, 8) {
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(qname)
        .option("checkpointLocation", s"/root/repo/target/ckpt/$qname")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname)
      .filter(col("p_user") >= 0)
      .groupBy(col("purchase_id"))
      .agg(count(col("c_user")).as("n_clicks"), max(col("value")).as("value"))
  }

  /** Streaming JOIN MV persisted into the lake — RisingWave's third MV
    * class alongside the append MV (q51) and the incrementally-
    * maintained aggregate MV (q90): the q73 stream-stream interval
    * join's matches land in a lake table via exactly-once per-batch
    * commits (one snapshot per micro-batch, replay-suppressed), so
    * downstream readers join-free serve the purchase↔click pairs with
    * full snapshot/time-travel semantics. INNER interval-join matches
    * emit eagerly (watermarks bound state, never gate emission), so
    * the AvailableNow drain is lossless and the batch-join oracle
    * must hash-match the table's final state. */
  def joinMv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-joinmv")
    val clicks = eventsStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    val joined = purchases.join(clicks, expr(
      """p_user = c_user AND
        |c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("value"), col("c_ts"))
    val table = graft.lake.LakeTable.create(s, s"$tmp/mv", StructType(Seq(
      StructField("purchase_id", LongType),
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("c_ts", TimestampType))))
    val mv = new MVManager(s, s"$tmp/ckpt")
    withShufflePartitions(s, 8) {
      mv.startToLake("join_mv", joined, table).awaitTermination()
    }
    table.read()
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"), max(col("value")).as("value"))
  }

  /** Native streaming sessionization: session_window(gap = 30 min) per
    * user with merging session state — the stateful-streaming twin of
    * the batch q47 sessionize. Gap semantics are session_window's
    * OVERLAP rule: an event extends the session iff its ts is strictly
    * inside predecessor ts + gap (an event landing exactly on the gap
    * boundary starts a NEW session), and the oracle replays exactly
    * that rule with a lag window. Complete mode is used because the
    * graded query must drain the bounded fixture losslessly under
    * AvailableNow (append mode would hold back every session whose
    * close falls inside the final watermark); a production MV over an
    * unbounded stream runs the same plan in append mode with a
    * watermark, which emits each session once on close and keeps state
    * bounded by (active users x gap). */
  def streamSessions(s: SparkSession, dir: String): DataFrame = {
    val qname = "sess_" + UUID.randomUUID().toString.replace("-", "")
    val agg = eventsStream(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Banding.sum2(col("value")).as("sum_value"))
    withShufflePartitions(s, 8) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname)
        .option("checkpointLocation", s"/root/repo/target/ckpt/$qname")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname).select(col("user_id"),
      date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("session_start"),
      col("n_events"), col("sum_value"))
  }

  /** Custom per-key streaming state machine as a graded query: a
    * click→purchase conversion funnel over flatMapGroupsWithState —
    * the API for state Spark's built-ins can't express (the reference
    * system's RisingWave MVs have no equivalent either). Per user the
    * state carries (events seen, conversions, last event type) across
    * micro-batches; a purchase converts iff the user's previous event
    * by (ts, event_id) order was a click. Batch rows are sorted
    * in-group (bounded by one user's per-batch volume); each batch
    * appends a superseding snapshot row per active user, and the
    * batch-side rollup keeps the latest via max_by on the monotone
    * event count. The oracle replays the same rule with a lag window. */
  def streamStateFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val qname = "fsm_" + UUID.randomUUID().toString.replace("-", "")
    val ev = eventsStream(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
    val folded = ev.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (Long, Long, Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val (n0, c0, prev0) =
            state.getOption.getOrElse((0L, 0L, null: String))
          var n = n0; var c = c0; var prev = prev0
          // micros-precision event-time order with event_id tie-break
          rows.toSeq
            .sortBy(r => (r._2.getTime / 1000, r._2.getNanos.toLong, r._3))
            .foreach { r =>
              n += 1
              if (prev == "click" && r._4 == "purchase") c += 1
              prev = r._4
            }
          state.update((n, c, prev))
          Iterator((user, n, c, prev))
      }
    withShufflePartitions(s, 8) {
      val q = folded.toDF("user_id", "n_events", "n_conversions", "last_type")
        .writeStream.outputMode("append")
        .format("memory").queryName(qname)
        .option("checkpointLocation", s"/root/repo/target/ckpt/$qname")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname).groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        expr("max_by(n_conversions, n_events)").as("n_conversions"),
        expr("max_by(last_type, n_events)").as("last_type"))
  }

  /** The full Arrow interchange loop as a graded query — the
    * engine-to-engine handoff the reference performs over Flight:
    * events stream OUT as exactly-once per-batch Arrow IPC dirs
    * (MVManager.startToArrow), then a second streaming query ingests
    * the export tree through the graft-arrow micro-batch source
    * (contiguous-batch offsets) and the drained rows aggregate. The
    * oracle on the original parquet proves no row is lost, duplicated
    * or corrupted across the double hop. */
  def arrowStreamLoop(s: SparkSession, dir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.replace("-", "")
    val outDir = s"/root/repo/target/arrow-loop/$runId"
    val mgr = new MVManager(s, s"/root/repo/target/ckpt/arrow-out-$runId")
    val ev = eventsStream(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    mgr.startToArrow(s"arrow_export_$runId", ev, outDir,
      Trigger.AvailableNow())
    mgr.awaitAll()
    mgr.stopAll()
    val qname = s"arrow_in_$runId"
    val q = s.readStream.format("graft-arrow").load(outDir)
      .writeStream.outputMode("append")
      .format("memory").queryName(qname)
      .option("checkpointLocation", s"/root/repo/target/ckpt/arrow-in-$runId")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(qname).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Banding.sum2(col("value")).as("sum_value"),
        count(col("event_id")).as("n_ids"))
  }

  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val qname = "dedup_" + UUID.randomUUID().toString.replace("-", "")
    val doubled = eventsStream(s, dir)
      .unionByName(eventsStream(s, dir))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    withShufflePartitions(s, 8) {
      val q = doubled.writeStream.outputMode("append")
        .format("memory").queryName(qname)
        .option("checkpointLocation", s"/root/repo/target/ckpt/$qname")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qname)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Banding.sum2(col("value")).as("sum_value"))
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
      .agg(count(lit(1)).as("n"), Banding.sum2(col("value")).as("sum_value"))
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
      .agg(count(lit(1)).as("n"), Banding.avg2(col("value")).as("avg_value"))
  }
}
