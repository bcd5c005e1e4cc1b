package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graded queries exercising the PURE-SQL surface of the lake: every
  * statement below goes through [[GraftCatalog]] (`spark.sql` only —
  * no programmatic LakeTable reads in the answer path), proving a SQL
  * user of the reference catalog (crest's `CREATE TABLE` + insert +
  * query flow, /root/reference/pkg/catalog/catalog.go) can live
  * entirely in `spark.sql` against this engine.
  *
  * Determinism across in-session reruns (bench min-of-3): a catalog
  * NAME binds its warehouse on first use and is then cached by the
  * session's CatalogManager — so each query DROPs and recreates its
  * tables inside whatever warehouse the cached catalog holds, making
  * every rerun rebuild identical state. */
object SqlQueries {

  /** One catalog per query name; the warehouse temp dir binds once per
    * session (conf re-sets after caching are ignored by design). */
  private def install(s: SparkSession, cat: String): Unit =
    if (!s.conf.getOption(s"spark.sql.catalog.$cat")
        .exists(_ == "graft.lake.GraftCatalog")) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft-$cat")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.lake.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    }

  /** Row-level DML (UPDATE / MERGE), streaming table writes, and
    * dynamic INSERT OVERWRITE execute through injected planner
    * strategies. On a LIVE session built without
    * [[graft.GraftExtensions]], they install through
    * `spark.experimental.extraStrategies` — the public no-rebuild
    * seam, consulted before every built-in strategy (what these
    * graded queries use; a session builder adds the same via
    * `.withExtensions(new GraftExtensions()(_))`, and `GraftEngine`
    * installs them whenever `catalog.sqlName` binds the SQL face). */
  private def installRowLevel(s: SparkSession): Unit =
    graft.GraftFunctions.installStrategies(s)

  /** q172: CTAS a lake table from lineitem and run a filtered banded
    * aggregate over it — CREATE/INSERT/SELECT all through SQL. */
  def catalogAgg(s: SparkSession, dir: String): DataFrame = {
    install(s, "g172")
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice")
      .createOrReplaceTempView("g172_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g172.q")
    s.sql("DROP TABLE IF EXISTS g172.q.lineitem")
    s.sql("CREATE TABLE g172.q.lineitem AS SELECT * FROM g172_src")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM g172.q.lineitem
        |WHERE l_quantity < 30
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** q173: q117's time-travel scenario driven purely through SQL —
    * three INSERTs build history, the `snapshots` METADATA TABLE
    * yields the mid version, and `VERSION AS OF` serves it next to the
    * current state in one result. */
  def sqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    install(s, "g173")
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g173_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g173.q")
    s.sql("DROP TABLE IF EXISTS g173.q.events")
    s.sql("""CREATE TABLE g173.q.events AS
             SELECT * FROM g173_src WHERE event_type = 'click'""")
    s.sql("""INSERT INTO g173.q.events
             SELECT * FROM g173_src WHERE event_type = 'view'""")
    s.sql("""INSERT INTO g173.q.events
             SELECT * FROM g173_src WHERE event_type = 'purchase'""")
    // snapshots meta table: current = last append, mid = one before
    val mid = s.sql(
      "SELECT max(version) - 1 AS v FROM g173.q.events.snapshots")
      .head.getInt(0)
    s.sql(
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_value, 'as_of' AS snapshot
         |FROM g173.q.events VERSION AS OF $mid GROUP BY event_type
         |UNION ALL
         |SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_value, 'current' AS snapshot
         |FROM g173.q.events GROUP BY event_type""".stripMargin)
  }

  /** The q175 forget set: a fixed roster of user ids (the GDPR shape —
    * named subjects, not a computed predicate; a computed predicate
    * would not translate to a source filter and Spark would refuse the
    * DELETE rather than half-apply it). Ids beyond a small SF's user
    * range simply match nothing — same algebra on both sides. */
  val ForgetUsers: String = (0 until 25).map(k => 13 + 97 * k)
    .mkString(", ")

  /** q175: GDPR forget through pure SQL — `DELETE FROM ... WHERE
    * user_id IN (...)` on a catalog table routes to a MERGE-ON-READ
    * position-delete commit (O(matched rows), zero data files
    * rewritten; the `delete.mode` property flips to copy-on-write),
    * then the surviving corpus is aggregated. The oracle replays the
    * algebra as an anti-filter over the raw events. */
  def sqlDelete(s: SparkSession, dir: String): DataFrame = {
    install(s, "g175")
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g175_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g175.q")
    s.sql("DROP TABLE IF EXISTS g175.q.events")
    s.sql("CREATE TABLE g175.q.events AS SELECT * FROM g175_src")
    s.sql(s"DELETE FROM g175.q.events WHERE user_id IN ($ForgetUsers)")
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g175.q.events GROUP BY event_type""".stripMargin)
  }

  /** q176: MERGE INTO through pure SQL — the upsert every lakehouse
    * user writes: a per-user click-profile table is merged with the
    * purchase totals (matched users get their count set, unseen
    * purchasers insert with zero click history). Spark's analyzer
    * rewrite supplies the MERGE semantics (clause routing, the
    * multiple-match cardinality check); the engine lands the delta as
    * ONE merge-on-read commit — position deletes for the matched rows'
    * old versions + appended rows, zero data files rewritten
    * (`merge.mode=copy-on-write` flips to exact file rewrites). The
    * oracle replays the algebra as a FULL OUTER JOIN of the two
    * aggregates. */
  def sqlMerge(s: SparkSession, dir: String): DataFrame = {
    install(s, "g176")
    installRowLevel(s)
    Tables.load(s, dir, "events").select("user_id", "event_type")
      .createOrReplaceTempView("g176_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g176.q")
    s.sql("DROP TABLE IF EXISTS g176.q.profiles")
    s.sql(
      """CREATE TABLE g176.q.profiles AS
        |SELECT user_id, count(*) AS n_events,
        |       CAST(0 AS BIGINT) AS purchases
        |FROM g176_src WHERE event_type = 'click' GROUP BY user_id
        |""".stripMargin)
    s.sql(
      """MERGE INTO g176.q.profiles t
        |USING (SELECT user_id, count(*) AS n_p FROM g176_src
        |       WHERE event_type = 'purchase' GROUP BY user_id) s
        |ON t.user_id = s.user_id
        |WHEN MATCHED THEN UPDATE SET purchases = s.n_p
        |WHEN NOT MATCHED THEN
        |  INSERT (user_id, n_events, purchases)
        |  VALUES (s.user_id, 0, s.n_p)""".stripMargin)
    s.sql(
      """SELECT user_id % 10 AS cohort, count(*) AS n_users,
        |  CAST(sum(n_events) AS BIGINT) AS total_events,
        |  CAST(sum(purchases) AS BIGINT) AS total_purchases
        |FROM g176.q.profiles GROUP BY user_id % 10""".stripMargin)
  }

  /** q177: UPDATE through pure SQL — a surgical reclassification
    * (`SET event_type = concat('priority_', event_type)` on a keyed
    * slice) lands as ONE merge-on-read commit: position deletes for
    * the old row versions + one appended file of updated rows, zero
    * data files rewritten; the survivor aggregate reads through the
    * (file, pos) anti-join. The oracle replays the update as a CASE
    * projection over the raw events. */
  def sqlUpdate(s: SparkSession, dir: String): DataFrame = {
    install(s, "g177")
    installRowLevel(s)
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g177_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g177.q")
    s.sql("DROP TABLE IF EXISTS g177.q.events")
    s.sql("CREATE TABLE g177.q.events AS SELECT * FROM g177_src")
    s.sql(
      """UPDATE g177.q.events
        |SET event_type = concat('priority_', event_type)
        |WHERE event_type = 'click' AND user_id % 7 = 3""".stripMargin)
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g177.q.events GROUP BY event_type""".stripMargin)
  }

  /** q178: STREAMING read of a catalog table —
    * `spark.readStream.table("g178.q.events")` (MICRO_BATCH_READ on
    * [[GraftSqlTable]]): the initial AvailableNow run aggregates the
    * table's snapshot through a checkpoint, a second commit lands, and
    * the RESTARTED run picks up exactly the new version's rows
    * (snapshot-version offsets — q50's exactly-once contract at the
    * SQL surface). The complete-mode result equals the batch aggregate
    * over everything iff every row was delivered exactly once, which
    * is precisely what the oracle checks. */
  def sqlStreamTable(s: SparkSession, dir: String): DataFrame = {
    install(s, "g178")
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g178_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g178.q")
    s.sql("DROP TABLE IF EXISTS g178.q.events")
    s.sql("""CREATE TABLE g178.q.events AS
             SELECT * FROM g178_src
             WHERE event_type IN ('click', 'view')""")
    val ckpt = java.nio.file.Files
      .createTempDirectory("g178-ckpt").toString
    val sink = "g178_sink"
    def run(): Unit = {
      val q = s.readStream.table("g178.q.events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // the snapshot batch: click + view
    s.sql("""INSERT INTO g178.q.events
             SELECT * FROM g178_src WHERE event_type = 'purchase'""")
    run() // checkpoint restart: exactly the purchase commit
    s.table(sink).select(col("event_type"), col("n"),
      col("sv").cast("double").as("sum_value"))
  }

  /** q179: STREAMING WRITE to a catalog table —
    * `df.writeStream.toTable("g179.q.sink")` (STREAMING_WRITE on
    * [[GraftSqlTable]], q178's write-side twin): a catalog-to-catalog
    * streaming loop reads `src` with snapshot-version offsets, filters
    * in flight, and lands each epoch as ONE transactional
    * `appendExactlyOnce(queryId, epochId)` commit into `sink`. The
    * first AvailableNow run ships the snapshot, a second commit lands
    * in `src`, and the RESTARTED run appends exactly the new version's
    * rows — the batch aggregate over `sink` equals the oracle's
    * replayed algebra iff every row was written exactly once across
    * the checkpoint restart. This is the crest ingestion loop (wire ->
    * transactional table commit) drivable end-to-end from the public
    * streaming API. */
  def sqlStreamToTable(s: SparkSession, dir: String): DataFrame = {
    install(s, "g179")
    installRowLevel(s) // the streaming-write strategy rides the same
                       // live-session seam as row-level DML
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g179_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g179.q")
    s.sql("DROP TABLE IF EXISTS g179.q.src")
    s.sql("DROP TABLE IF EXISTS g179.q.sink")
    s.sql("""CREATE TABLE g179.q.src AS
             SELECT * FROM g179_src
             WHERE event_type IN ('click', 'view')""")
    s.sql(
      """CREATE TABLE g179.q.sink
        |(event_id BIGINT, user_id BIGINT, event_type STRING,
        | value DOUBLE)""".stripMargin)
    val ckpt = java.nio.file.Files
      .createTempDirectory("g179-ckpt").toString
    def run(): Unit = {
      val q = s.readStream.table("g179.q.src")
        .filter(col("user_id") % 2 === 0)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("g179.q.sink")
      q.awaitTermination()
    }
    run() // the snapshot epoch: click + view
    s.sql("""INSERT INTO g179.q.src
             SELECT * FROM g179_src WHERE event_type = 'purchase'""")
    run() // checkpoint restart: exactly the purchase commit
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g179.q.sink GROUP BY event_type""".stripMargin)
  }

  /** q180: DYNAMIC `INSERT OVERWRITE` rebuilding ONE hidden `days(ts)`
    * partition through pure SQL — the "rebuild yesterday" operation at
    * 100 TB: under `partitionOverwriteMode=dynamic` the overwrite
    * replaces exactly the partitions the incoming rows land in (one
    * transactional commit, every other day's files byte-untouched),
    * and the SQL user never names the derived partition column. The
    * rebuild drops a user cohort from the table's FIRST day (a
    * targeted re-curation); the oracle replays the algebra as an
    * anti-filter scoped to that day. */
  def sqlDynamicOverwrite(s: SparkSession, dir: String): DataFrame = {
    install(s, "g180")
    installRowLevel(s) // dynamic overwrite rides the injected strategy
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("timestamp").as("ts"))
      .createOrReplaceTempView("g180_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g180.q")
    s.sql("DROP TABLE IF EXISTS g180.q.events")
    s.sql(
      """CREATE TABLE g180.q.events
        |(event_id BIGINT, user_id BIGINT, event_type STRING,
        | value DOUBLE, ts TIMESTAMP)
        |PARTITIONED BY (days(ts))""".stripMargin)
    s.sql("INSERT INTO g180.q.events SELECT * FROM g180_src")
    val prev = s.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // rebuild the first day: its partition is replaced with the
      // same rows MINUS the user_id % 5 = 2 cohort
      s.sql(
        """INSERT OVERWRITE g180.q.events
          |SELECT * FROM g180_src
          |WHERE CAST(ts AS DATE) =
          |    (SELECT CAST(min(ts) AS DATE) FROM g180_src)
          |  AND user_id % 5 <> 2""".stripMargin)
    } finally prev match {
      case Some(v) =>
        s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g180.q.events GROUP BY event_type""".stripMargin)
  }

  /** q181: maintenance + refs through `CALL` — the pure-SQL operations
    * story: `CALL g181.system.create_tag(...)` names the audited
    * snapshot, later INSERTs move the table on, `CALL
    * g181.system.compact(...)` rewrites the file set (a maintenance
    * commit that must not change ANY query answer), and the result
    * reads the tag by name (`VERSION AS OF 'clicks-only'`) next to the
    * post-compaction current state — q173's time-travel story with
    * both the ref creation AND the maintenance drivable from SQL. */
  def sqlCallProcedures(s: SparkSession, dir: String): DataFrame = {
    install(s, "g181")
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g181_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g181.q")
    s.sql("DROP TABLE IF EXISTS g181.q.events")
    s.sql("""CREATE TABLE g181.q.events AS
             SELECT * FROM g181_src WHERE event_type = 'click'""")
    s.sql("CALL g181.system.create_tag('q.events', 'clicks-only')")
    s.sql("""INSERT INTO g181.q.events
             SELECT * FROM g181_src
             WHERE event_type IN ('view', 'purchase')""")
    s.sql("CALL g181.system.compact('q.events', 2)")
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_value, 'tagged' AS snapshot
        |FROM g181.q.events VERSION AS OF 'clicks-only'
        |GROUP BY event_type
        |UNION ALL
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_value, 'current' AS snapshot
        |FROM g181.q.events GROUP BY event_type""".stripMargin)
  }

  /** q182: STATIC partition overwrite through pure SQL —
    * `INSERT OVERWRITE ... PARTITION (event_type = 'click')` routes
    * through `SupportsOverwrite` to [[LakeTable.overwriteWhere]]: ONE
    * commit that removes exactly the files PROVEN all-click by their
    * manifest partition constants (every other partition's files stay
    * byte-identical) and appends the rebuilt rows — and it runs on
    * the CONF-ONLY route (Spark's stock V1 fallback exec, no
    * extensions). The rebuild drops a user cohort from the click
    * partition; the oracle replays the anti-filter scoped to clicks. */
  def sqlStaticOverwrite(s: SparkSession, dir: String): DataFrame = {
    install(s, "g182")
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g182_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g182.q")
    s.sql("DROP TABLE IF EXISTS g182.q.events")
    s.sql(
      """CREATE TABLE g182.q.events
        |(event_id BIGINT, user_id BIGINT, value DOUBLE,
        | event_type STRING)
        |PARTITIONED BY (event_type)""".stripMargin)
    s.sql("""INSERT INTO g182.q.events
             SELECT event_id, user_id, value, event_type
             FROM g182_src""")
    s.sql(
      """INSERT OVERWRITE g182.q.events PARTITION (event_type = 'click')
        |SELECT event_id, user_id, value FROM g182_src
        |WHERE event_type = 'click' AND user_id % 3 <> 1""".stripMargin)
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g182.q.events GROUP BY event_type""".stripMargin)
  }

  /** q183: the LLM-dedup pipeline in PURE SQL — the reference's
    * SQL-first audience running MinHash-LSH near-dup detection with
    * zero Scala: the registered native functions (`shingle_hashes` ->
    * `minhash_sig` -> `band_hashes`, codegen-era kernels, not UDFs)
    * build the per-row sketch, a band-bucket self-join generates
    * candidates (O(colliding pairs), never all-pairs), and exact
    * Jaccard over the shingle-hash SETS verifies — the same
    * bucketed-then-verified shape as q33, whose all-pairs DuckDB
    * oracle doubles as the recall proof. */
  def sqlMinHashDedup(s: SparkSession, dir: String): DataFrame = {
    install(s, "g183")
    graft.GraftFunctions.register(s) // shingle_hashes & friends in SQL
    Tables.load(s, dir, "documents").select("doc_id", "text")
      .createOrReplaceTempView("g183_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g183.q")
    s.sql("DROP TABLE IF EXISTS g183.q.docs")
    s.sql("CREATE TABLE g183.q.docs AS SELECT * FROM g183_src")
    s.sql(
      """WITH sh AS (
        |  SELECT doc_id, shingle_hashes(text, 3) AS hs
        |  FROM g183.q.docs),
        |bexp AS (
        |  SELECT doc_id, hs, b.pos AS bi, b.col AS bh
        |  FROM sh
        |  LATERAL VIEW posexplode(band_hashes(minhash_sig(hs, 64), 16))
        |    b AS pos, col),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
        |         a.hs AS h1, b.hs AS h2
        |  FROM bexp a JOIN bexp b
        |    ON a.bi = b.bi AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |-- the verify filter in INTEGER form: i/(|h1|+|h2|-i) >= 0.5
        |-- <=> 3i >= |h1|+|h2| exactly (i <= min size << 2^52, so the
        |-- double division can never round across the threshold) —
        |-- keeps the array_intersect out of the WHERE/SELECT CSE gap:
        |-- the filter computes it once per candidate, the projection
        |-- once per survivor
        |sel AS (
        |  SELECT d1, d2, h1, h2,
        |         CAST(size(array_intersect(h1, h2)) AS BIGINT) AS inter
        |  FROM cand
        |  WHERE 3 * size(array_intersect(h1, h2))
        |        >= size(h1) + size(h2))
        |SELECT d1, d2, inter,
        |  CAST(inter AS DOUBLE) / (size(h1) + size(h2) - inter)
        |    AS jaccard
        |FROM sel""".stripMargin)
  }

  /** q184: similarity search in PURE SQL — q183's twin for the vector
    * family: embeddings CTAS'd into a catalog table, brute-force
    * cosine top-k against a query vector expressed entirely in
    * `spark.sql` with the native `cosine_sim` expression (the same
    * left-associative kernel every ANN operator verifies with, so the
    * q39 oracle grades this statement exactly). */
  def sqlCosineTopK(s: SparkSession, dir: String): DataFrame = {
    install(s, "g184")
    graft.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
      .createOrReplaceTempView("g184_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g184.q")
    s.sql("DROP TABLE IF EXISTS g184.q.emb")
    s.sql("CREATE TABLE g184.q.emb AS SELECT * FROM g184_src")
    s.sql(
      """SELECT e.vec_id, cosine_sim(e.embedding, q.embedding) AS cos
        |FROM g184.q.emb e
        |CROSS JOIN (SELECT embedding FROM g184.q.emb
        |            WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos DESC, e.vec_id
        |LIMIT 10""".stripMargin)
  }

  /** q185: partition-spec EVOLUTION through `CALL` — the headline
    * maintenance feature drivable without Scala: a `days(ts)` table
    * takes one load, `CALL g185.system.set_partition_spec('q.events',
    * 'hours(ts)')` evolves the layout for FUTURE writes (a metadata
    * commit; existing files keep their layout), a second load lands
    * hour-partitioned, and a ts-range aggregate reads BOTH epochs —
    * each pruned by its own epoch's transforms. The oracle replays
    * the filter algebra over raw events. */
  def sqlSpecEvolution(s: SparkSession, dir: String): DataFrame = {
    install(s, "g185")
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("timestamp").as("ts"))
      .createOrReplaceTempView("g185_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g185.q")
    s.sql("DROP TABLE IF EXISTS g185.q.events")
    s.sql(
      """CREATE TABLE g185.q.events
        |(event_id BIGINT, user_id BIGINT, event_type STRING,
        | value DOUBLE, ts TIMESTAMP)
        |PARTITIONED BY (days(ts))""".stripMargin)
    // a TWO-DAY slice: the hour layout fans out per distinct hour, so
    // the load is bounded (~48 dirs) while both epochs still coexist
    s.sql("""INSERT INTO g185.q.events
             SELECT * FROM g185_src WHERE event_id % 2 = 0
               AND ts < (SELECT min(ts) + INTERVAL 48 HOURS
                         FROM g185_src)""")
    s.sql(
      "CALL g185.system.set_partition_spec('q.events', 'hours(ts)')")
    s.sql("""INSERT INTO g185.q.events
             SELECT * FROM g185_src WHERE event_id % 2 = 1
               AND ts < (SELECT min(ts) + INTERVAL 48 HOURS
                         FROM g185_src)""")
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g185.q.events
        |WHERE ts >= (SELECT min(ts) FROM g185_src) AND
        |      ts < (SELECT min(ts) + INTERVAL 12 HOURS FROM g185_src)
        |GROUP BY event_type""".stripMargin)
  }

  /** q174: hidden partitioning through SQL — `PARTITIONED BY
    * (event_type, days(ts), bucket(8, user_id))` created and loaded by
    * statements that never mention a derived column, then a filtered
    * aggregate whose event_type/ts conjuncts prune at the manifest
    * (identity values + days-transform ranges are per-file stats). */
  def sqlHiddenPartitioning(s: SparkSession, dir: String): DataFrame = {
    install(s, "g174")
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("timestamp").as("ts"))
      .createOrReplaceTempView("g174_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g174.q")
    s.sql("DROP TABLE IF EXISTS g174.q.events")
    s.sql(
      """CREATE TABLE g174.q.events
        |(event_id BIGINT, user_id BIGINT, event_type STRING,
        | value DOUBLE, ts TIMESTAMP)
        |PARTITIONED BY (event_type, days(ts), bucket(8, user_id))
        |""".stripMargin)
    s.sql("INSERT INTO g174.q.events SELECT * FROM g174_src")
    s.sql(
      """SELECT user_id % 10 AS cohort, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g174.q.events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id % 10""".stripMargin)
  }

  /** q186: the STREAMING ROW-LEVEL CHANGELOG —
    * `spark.readStream.table("g186.q.events.changes")`
    * ([[GraftChangesTable]] MICRO_BATCH_READ, Delta's `readChangeFeed`
    * shape): a cross-engine consumer maintains an exact MIRROR of a
    * table that takes merge-on-read DML, applying each batch's (row,
    * `_change_type`, `_commit_version`) events in commit order — the
    * engine's own CDC-apply loop (O(keys) equality delete + append,
    * both one transactional commit) driven from the public streaming
    * API across a checkpoint restart. The first AvailableNow run
    * mirrors the snapshot; then a GDPR DELETE, a row-level UPDATE,
    * and an append land on the source, and the RESTARTED run carries
    * all three commits in ONE batch — per-version apply keeps the
    * UPDATE's delete half before its insert half. The mirror's
    * aggregate equals the oracle's replayed algebra iff every change
    * event arrived exactly once and applied in order. (This is the
    * raw stream face with a hand-rolled consumer; the PRODUCTIZED,
    * batch-replay-safe twin — every apply idempotent on the source
    * version — is [[graft.streaming.MVManager.startTableMirror]],
    * graded as q187.) */
  def sqlChangelogStream(s: SparkSession, dir: String): DataFrame = {
    install(s, "g186")
    installRowLevel(s)
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g186_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g186.q")
    s.sql("DROP TABLE IF EXISTS g186.q.events")
    s.sql("CREATE TABLE g186.q.events AS SELECT * FROM g186_src")
    val mirror = graft.lake.LakeTable.create(s,
      java.nio.file.Files.createTempDirectory("g186-mirror").toString,
      s.table("g186.q.events").schema)
    val ckpt = java.nio.file.Files
      .createTempDirectory("g186-ckpt").toString
    // the consumer: per _commit_version ascending, deletes land as ONE
    // O(keys) equality-delete commit (event_id is the row identity),
    // inserts as ONE append — fully distributed, nothing collected
    // Per-slice passes re-scan the batch source directly (whole-file
    // parquet partitions — a scan per slice of the commit-sized delta
    // beats caching the full snapshot batch just to read it twice)
    val apply: (DataFrame, Long) => Unit = (batch, _) => {
      // ONE metadata pass decides which (version, op) slices exist —
      // the per-version loop then runs only the needed commits, no
      // per-slice isEmpty round trips. CDF typing folds back onto the
      // apply algebra: update_preimage applies as delete,
      // update_postimage as insert (the UPDATE commit below arrives
      // typed — the writer stamps pure-update row deltas).
      val delTypes = Seq("delete", "update_preimage")
      val insTypes = Seq("insert", "update_postimage")
      val slices = batch.groupBy("_commit_version", "_change_type")
        .count().collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      slices.map(_._1).toSeq.sorted.foreach { v =>
        if (delTypes.exists(t => slices((v, t))))
          mirror.deleteWhereEqual(
            batch.filter(col("_commit_version") === v &&
              col("_change_type").isin(delTypes: _*))
              .select("event_id"),
            Seq("event_id"))
        if (insTypes.exists(t => slices((v, t))))
          mirror.append(
            batch.filter(col("_commit_version") === v &&
              col("_change_type").isin(insTypes: _*))
              .drop("_change_type", "_commit_version",
                "_commit_timestamp"))
      }
    }
    def run(): Unit = {
      val q = s.readStream.table("g186.q.events.changes")
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // the snapshot batch: the full corpus as inserts
    s.sql(s"DELETE FROM g186.q.events WHERE user_id IN ($ForgetUsers)")
    s.sql(
      """UPDATE g186.q.events
        |SET event_type = concat('cdc_', event_type)
        |WHERE event_type = 'click' AND user_id % 5 = 1""".stripMargin)
    s.sql("""INSERT INTO g186.q.events
             SELECT event_id + 10000000, user_id, 'replay', value
             FROM g186_src WHERE event_type = 'purchase'""")
    run() // checkpoint restart: three commits, one batch, in order
    mirror.read().createOrReplaceTempView("g186_mirror")
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g186_mirror GROUP BY event_type""".stripMargin)
  }

  /** q187: the TABLE MIRROR MV — q186's CDC-apply loop as the
    * first-class operator ([[graft.streaming.MVManager
    * .startTableMirror]]): a replica maintained ONLY by the source's
    * streaming changelog across THREE trigger runs (snapshot; then a
    * cohort DELETE + a keyed UPDATE in one restarted batch; then an
    * append), every per-version apply idempotent on the SOURCE
    * version (whole-batch replays are pure no-ops —
    * TableMirrorMVSpec forces one). The mirror's aggregate equals the
    * oracle's replayed algebra iff every change event applied exactly
    * once, in order, across all three lifecycles. */
  def sqlTableMirrorMv(s: SparkSession, dir: String): DataFrame = {
    install(s, "g187")
    installRowLevel(s)
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g187_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g187.q")
    s.sql("DROP TABLE IF EXISTS g187.q.src")
    s.sql("""CREATE TABLE g187.q.src AS
             SELECT * FROM g187_src
             WHERE event_type IN ('click', 'view')""")
    val mirror = graft.lake.LakeTable.create(s,
      java.nio.file.Files.createTempDirectory("g187-mirror").toString,
      s.table("g187.q.src").schema)
    val mv = new graft.streaming.MVManager(s,
      java.nio.file.Files.createTempDirectory("g187-ckpt").toString)
    def run(): Unit = mv.startTableMirror("g187_mir",
      s.readStream.table("g187.q.src.changes"), mirror,
      Seq("event_id")).awaitTermination()
    run() // snapshot
    s.sql("DELETE FROM g187.q.src WHERE user_id % 9 = 4")
    s.sql(
      """UPDATE g187.q.src SET value = value * 2
        |WHERE event_type = 'view' AND user_id % 3 = 0""".stripMargin)
    run() // both commits, one restarted batch
    s.sql("""INSERT INTO g187.q.src
             SELECT event_id + 20000000, user_id, 'purchase', value
             FROM g187_src WHERE event_type = 'purchase'""")
    run() // third lifecycle: the append flows
    mirror.read().createOrReplaceTempView("g187_mirror")
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g187_mirror GROUP BY event_type""".stripMargin)
  }

  /** q188: the SQL-ONLY batch change feed — `table_changes(...)`
    * ([[TableChanges]], Delta's TVF of the same name) over a table
    * that took the full DML algebra, aggregated BY EVENT TYPE so the
    * result grades the four-type CDF schema itself: the DELETE commit
    * emits `delete`, the pure-update UPDATE commit emits paired
    * `update_preimage`/`update_postimage` (old and new values), the
    * INSERT emits `insert` — all from `spark.sql` text alone, no
    * reader options, composable like a table. */
  def sqlTableChanges(s: SparkSession, dir: String): DataFrame = {
    install(s, "g188")
    installRowLevel(s)
    graft.GraftFunctions.register(s) // the TVF on a live session
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g188_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g188.q")
    s.sql("DROP TABLE IF EXISTS g188.q.events")
    s.sql("CREATE TABLE g188.q.events AS SELECT * FROM g188_src") // v1
    s.sql("DELETE FROM g188.q.events WHERE user_id % 7 = 3")      // v2
    s.sql("""UPDATE g188.q.events SET value = value + 5
             WHERE event_type = 'click' AND user_id % 4 = 1""")   // v3
    s.sql("""INSERT INTO g188.q.events
             SELECT event_id + 30000000, user_id, 'tvf_replay', value
             FROM g188_src WHERE event_type = 'view'""")          // v4
    s.sql(
      """SELECT _change_type, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM table_changes('g188.q.events', 2)
        |GROUP BY _change_type, event_type""".stripMargin)
  }

  /** q189: the q187 mirror loop FORCED THROUGH THE DISTRIBUTED delta
    * path — the changes stream consumed with `maxMorRowsPerBatch=1`,
    * so every delta batch's merge-on-read state exceeds the broadcast
    * bound and plans through the per-commit batch changelog into
    * checkpoint scratch (the over-bound shape of a bulk GDPR purge).
    * The mirror's aggregate equals the oracle's replayed algebra iff
    * the scratch-served events are exactly the broadcast path's:
    * typed, per-commit, exactly once across the three lifecycles. */
  def sqlMirrorDistributedDelta(s: SparkSession, dir: String)
      : DataFrame = {
    install(s, "g189")
    installRowLevel(s)
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("g189_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS g189.q")
    s.sql("DROP TABLE IF EXISTS g189.q.src")
    s.sql("""CREATE TABLE g189.q.src AS
             SELECT * FROM g189_src
             WHERE event_type IN ('view', 'purchase')""")
    val mirror = graft.lake.LakeTable.create(s,
      java.nio.file.Files.createTempDirectory("g189-mirror").toString,
      s.table("g189.q.src").schema)
    val mv = new graft.streaming.MVManager(s,
      java.nio.file.Files.createTempDirectory("g189-ckpt").toString)
    def run(): Unit = mv.startTableMirror("g189_mir",
      s.readStream.option("maxMorRowsPerBatch", "1")
        .table("g189.q.src.changes"), mirror,
      Seq("event_id")).awaitTermination()
    run() // snapshot (no live deletes yet — plain insert batch)
    s.sql("DELETE FROM g189.q.src WHERE user_id % 11 = 6")
    s.sql(
      """UPDATE g189.q.src SET value = value + 50
        |WHERE event_type = 'purchase' AND user_id % 2 = 0""".stripMargin)
    run() // both commits, one restarted batch, scratch path
    s.sql("""INSERT INTO g189.q.src
             SELECT event_id + 40000000, user_id, 'late', value
             FROM g189_src WHERE event_type = 'click' AND user_id % 5 = 0""")
    run() // third lifecycle
    mirror.read().createOrReplaceTempView("g189_mirror")
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g189_mirror GROUP BY event_type""".stripMargin)
  }
}
