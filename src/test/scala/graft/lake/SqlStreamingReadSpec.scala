package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** `spark.readStream.table("graft.ns.t")` — MICRO_BATCH_READ on the
  * SQL catalog (GraftLakeMicroBatchStream): snapshot-version offsets,
  * exactly-once across restarts, admission pacing, append-stream
  * semantics guards, partition-value recovery. */
class SqlStreamingReadSpec extends SparkSuite {

  private lazy val wh = tmpDir("sqlstream-wh")

  private def install(): Unit = {
    spark.conf.set("spark.sql.catalog.gst", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gst.warehouse", wh)
  }

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Unit = q.awaitTermination()

  test("readStream.table: initial snapshot, then exactly the new " +
    "commits across a checkpoint restart") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.s")
    spark.sql("DROP TABLE IF EXISTS gst.s.ev")
    spark.sql("CREATE TABLE gst.s.ev (id BIGINT, grp STRING, v DOUBLE)")
    spark.sql("""INSERT INTO gst.s.ev
      |SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END,
      |       CAST(id AS DOUBLE) FROM range(100)""".stripMargin)
    spark.sql("INSERT INTO gst.s.ev SELECT id + 100, 'c', 1.0 FROM range(20)")
    val ckpt = tmpDir("gst-ckpt")
    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.table("gst.s.ev")
        .groupBy("grp").count()
        .writeStream.format("memory").queryName("gst_sink")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      drain(q); q
    }
    run()
    def counts = spark.table("gst_sink").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 50L, "b" -> 50L, "c" -> 20L))
    // restart from the checkpoint: only the new commit's rows arrive
    // (no re-delivery — counts would double if the snapshot replayed)
    spark.sql("INSERT INTO gst.s.ev SELECT id + 200, 'd', 2.0 FROM range(10)")
    run()
    assert(counts == Map("a" -> 50L, "b" -> 50L, "c" -> 20L, "d" -> 10L))
    // nothing new: an AvailableNow run terminates with ZERO input
    // rows (a fresh complete-mode memory sink with no batch stays
    // empty — the offsets, not the sink, prove no re-delivery)
    val q3 = run()
    assert(q3.recentProgress.forall(_.numInputRows == 0),
      "quiet restart re-delivered rows: " +
        q3.recentProgress.map(_.numInputRows).mkString(", "))
  }

  test("maxRowsPerBatch paces admission version-granularly under " +
    "Trigger.AvailableNow without dropping rows") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.s")
    spark.sql("DROP TABLE IF EXISTS gst.s.paced")
    spark.sql("CREATE TABLE gst.s.paced (id BIGINT)")
    spark.sql("INSERT INTO gst.s.paced SELECT id FROM range(10)")
    // complete-mode count: the memory sink supports checkpoint
    // recovery only in complete mode, and the running total proves
    // exactly-once (re-delivery would overcount the state)
    val ckpt = tmpDir("gst-paced-ckpt")
    def run(cap: Option[String]) = {
      var r = spark.readStream
      cap.foreach(c => r = r.option("maxRowsPerBatch", c))
      val q = r.table("gst.s.paced").groupBy().count()
        .writeStream.format("memory").queryName("gst_paced")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      drain(q); q
    }
    run(None) // initial snapshot
    assert(spark.table("gst_paced").head.getLong(0) == 10)
    // five more single-commit inserts, then drain with a 25-row cap:
    // versions must arrive over >= 2 batches, all rows exactly once
    (0 until 5).foreach(i => spark.sql(
      s"INSERT INTO gst.s.paced SELECT id + ${100 * (i + 1)} FROM range(20)"))
    val q = run(Some("25"))
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2,
      s"100 rows under a 25-row cap must take multiple batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(", "))
    assert(q.recentProgress.map(_.numInputRows).sum == 100,
      "pacing dropped or re-delivered rows")
    assert(spark.table("gst_paced").head.getLong(0) == 110)
  }

  test("append-stream guards: a row-removing commit fails the stream " +
    "by default, skipChangeCommits skips it wholesale; an initial " +
    "snapshot with live MOR deletes serves the delete-applied rows") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.s")
    spark.sql("DROP TABLE IF EXISTS gst.s.mut")
    spark.sql("CREATE TABLE gst.s.mut (id BIGINT)")
    spark.sql("INSERT INTO gst.s.mut SELECT id FROM range(10)")
    val ckpt = tmpDir("gst-mut-ckpt")
    def run(opts: Map[String, String]): Unit = {
      var r = spark.readStream
      opts.foreach { case (k, v) => r = r.option(k, v) }
      drain(r.table("gst.s.mut").groupBy().count()
        .writeStream.format("memory").queryName("gst_mut")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start())
    }
    run(Map.empty) // initial snapshot: 10 rows
    assert(spark.table("gst_mut").head.getLong(0) == 10)
    // a MOR delete commit + an append commit land after the checkpoint
    spark.sql("DELETE FROM gst.s.mut WHERE id IN (1, 2)")
    spark.sql("INSERT INTO gst.s.mut SELECT id + 100 FROM range(5)")
    val ex = intercept[Exception] { run(Map.empty) }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(ex).contains("skipChangeCommits"), msgs(ex).take(400))
    // opt in: the delete commit is skipped wholesale, the append lands
    run(Map("skipChangeCommits" -> "true"))
    assert(spark.table("gst_mut").head.getLong(0) == 15)
    // fresh stream of a table with LIVE MOR deletes: the initial
    // batch applies them at the reader — counts match the batch read,
    // deleted rows never surface, no compact-first speed bump
    drain(spark.readStream.table("gst.s.mut")
      .writeStream.format("memory").queryName("gst_mut2")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("gst-mut2-ckpt"))
      .trigger(Trigger.AvailableNow()).start())
    assert(spark.table("gst_mut2").count() ==
      spark.sql("SELECT count(*) FROM gst.s.mut").head.getLong(0))
    assert(spark.table("gst_mut2").count() == 13)
    assert(spark.table("gst_mut2").filter(col("id").isin(1L, 2L))
      .count() == 0, "MOR-deleted rows resurrected by the stream")
    // ABOVE the driver-side bound: the initial batch plans through the
    // engine's DISTRIBUTED merge-on-read batch read (the executors'
    // anti-join, materialized once under the checkpoint's scratch
    // dir) — same rows, zero driver-side delete state; the scratch
    // dir is cleaned once the batch's offset commits
    val capCkpt = tmpDir("gst-mutcap-ckpt")
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    def runCap(): Unit = {
      val fn: (org.apache.spark.sql.DataFrame, Long) => Unit =
        (df, _) => got.synchronized {
          got ++= df.collect().map(_.getLong(0))
        }
      drain(spark.readStream
        .option("maxMorRowsInitialBatch", "1")
        .table("gst.s.mut")
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", capCkpt)
        .trigger(Trigger.AvailableNow()).start())
    }
    runCap()
    assert(got.size == 13)
    assert(!got.exists(Set(1L, 2L)),
      "MOR-deleted rows resurfaced through the distributed initial batch")
    def leftovers(): Long = {
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(capCkpt))
      try s.filter(
          _.getFileName.toString.startsWith("graft-init-snapshot"))
        .count()
      finally s.close()
    }
    assert(leftovers() == 1,
      "the distributed path was never taken (no scratch dir written)")
    // the restarted stream's first committed-offset planning sweeps
    // the prior run's scratch (batch 0 can never replay again)
    spark.sql("INSERT INTO gst.s.mut SELECT id + 500 FROM range(2)")
    runCap()
    assert(got.size == 15, s"restart delivered ${got.size} rows")
    assert(leftovers() == 0,
      "scratch dir survived past the batch-0 commit")
    // compaction absorbs the deletes; a fresh stream then serves the
    // exact surviving snapshot with no MOR state at all
    new LakeCatalog(spark, wh).table("s", "mut").compact(1)
    drain(spark.readStream.table("gst.s.mut")
      .writeStream.format("memory").queryName("gst_mut3")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("gst-mut3-ckpt"))
      .trigger(Trigger.AvailableNow()).start())
    assert(spark.table("gst_mut3").count() == 15)
    assert(spark.table("gst_mut3").filter(col("id").isin(1L, 2L))
      .count() == 0, "MOR-deleted rows resurrected by the stream")
  }

  test("initial batch over live position AND equality deletes matches " +
    "the batch read exactly (null-safe keys, file-seq scoping, " +
    "re-inserted keys survive)") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.s")
    spark.sql("DROP TABLE IF EXISTS gst.s.mor")
    spark.sql(
      "CREATE TABLE gst.s.mor (id BIGINT, k STRING, v DOUBLE)")
    spark.sql("""INSERT INTO gst.s.mor
      |SELECT id, concat('k', CAST(id % 10 AS STRING)),
      |       CAST(id AS DOUBLE) FROM range(50)""".stripMargin)
    val t = new LakeCatalog(spark, wh).table("s", "mor")
    val sp = spark
    import sp.implicits._
    // position deletes (SQL DELETE routes merge-on-read)
    spark.sql("DELETE FROM gst.s.mor WHERE id IN (3, 7, 11)")
    // equality deletes on k, then RE-INSERT one deleted key: rows
    // appended after the delete's sequence must survive
    t.deleteWhereEqual(Seq("k2", "k5").toDF("k"), Seq("k"))
    spark.sql(
      "INSERT INTO gst.s.mor SELECT 1000, 'k2', 1.5 FROM range(1)")
    val batch = spark.sql(
      "SELECT CAST(sum(id) AS BIGINT) AS s, count(*) AS n FROM gst.s.mor")
      .head
    drain(spark.readStream.table("gst.s.mor")
      .groupBy()
      .agg(sum(col("id")).cast("long").as("s"), count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("gst_mor")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("gst-mor-ckpt"))
      .trigger(Trigger.AvailableNow()).start())
    val streamed = spark.table("gst_mor").head
    assert(streamed.getLong(0) == batch.getLong(0) &&
      streamed.getLong(1) == batch.getLong(1),
      s"stream (${streamed.getLong(0)}, ${streamed.getLong(1)}) != " +
        s"batch (${batch.getLong(0)}, ${batch.getLong(1)})")
    // the re-inserted k2 row is present; original k2/k5 rows are not
    drain(spark.readStream.table("gst.s.mor")
      .filter(col("k").isin("k2", "k5"))
      .writeStream.format("memory").queryName("gst_mor2")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("gst-mor2-ckpt"))
      .trigger(Trigger.AvailableNow()).start())
    val kRows = spark.table("gst_mor2").collect()
    assert(kRows.length == 1 && kRows(0).getLong(0) == 1000L,
      kRows.mkString(", "))
  }

  test("startingVersion: a fresh checkpoint begins at a commit " +
    "boundary instead of the snapshot; version 0 is refused") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.s")
    spark.sql("DROP TABLE IF EXISTS gst.s.sv")
    spark.sql("CREATE TABLE gst.s.sv (id BIGINT)")           // v0
    spark.sql("INSERT INTO gst.s.sv SELECT id FROM range(10)")        // v1
    spark.sql("INSERT INTO gst.s.sv SELECT id + 100 FROM range(5)")   // v2
    spark.sql("INSERT INTO gst.s.sv SELECT id + 200 FROM range(3)")   // v3
    val ckpt = tmpDir("gst-sv-ckpt")
    // complete-mode running aggregate: the memory sink cannot RECOVER
    // a checkpoint in append mode, and the running count proves
    // exactly-once delivery across the restart anyway
    def run(): Unit =
      drain(spark.readStream.option("startingVersion", "2")
        .table("gst.s.sv")
        .groupBy()
        .agg(count(lit(1)).as("n"),
          sum(when(col("id") < 100, 1L).otherwise(0L)).as("early"))
        .writeStream.format("memory").queryName("gst_sv")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start())
    run()
    // only v2 + v3 rows (the v1 bulk never streams)
    assert(spark.table("gst_sv").head.getLong(0) == 8)
    assert(spark.table("gst_sv").head.getLong(1) == 0,
      "rows from before startingVersion leaked into the stream")
    // the option binds only a FRESH checkpoint: restarts continue
    spark.sql("INSERT INTO gst.s.sv SELECT id + 300 FROM range(2)")
    run()
    assert(spark.table("gst_sv").head.getLong(0) == 10)
    val ex = intercept[Exception] {
      drain(spark.readStream.option("startingVersion", "0")
        .table("gst.s.sv")
        .writeStream.format("memory").queryName("gst_sv0")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("gst-sv0-ckpt"))
        .trigger(Trigger.AvailableNow()).start())
    }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("snapshot"), m.take(300))
  }

  test("WAP isolation: a stream never serves staged branch commits — " +
    "offsets pin at mainVersion until publish") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.s")
    spark.sql("DROP TABLE IF EXISTS gst.s.wap")
    spark.sql("CREATE TABLE gst.s.wap (id BIGINT)")
    spark.sql("INSERT INTO gst.s.wap SELECT id FROM range(10)")
    val ckpt = tmpDir("gst-wap-ckpt")
    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.table("gst.s.wap").groupBy().count()
        .writeStream.format("memory").queryName("gst_wap")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      drain(q); q
    }
    run()
    assert(spark.table("gst_wap").head.getLong(0) == 10)
    // a WAP branch stages two commits: the stream must see NEITHER —
    // not under the default contract, and not under skipChangeCommits
    // (the staged rows may never be published; delivering them would
    // leak unaudited data downstream)
    val t = new LakeCatalog(spark, wh).table("s", "wap")
    t.createBranch("audit-1")
    val sp = spark
    import sp.implicits._
    t.append((100L until 105L).toDF("id"))
    t.append((200L until 203L).toDF("id"))
    val quiet = run()
    // NB: no-redelivery is asserted via numInputRows, not the sink — a
    // restarted complete-mode memory sink admitting zero batches
    // leaves an empty table by design
    assert(quiet.recentProgress.forall(_.numInputRows == 0),
      "stream served staged (unpublished) WAP commits: " +
        quiet.recentProgress.map(_.numInputRows).mkString(", "))
    // publish: the pin moves, the next trigger serves EXACTLY the
    // published commits (no loss, no duplication)
    t.publishBranch("audit-1")
    run()
    assert(spark.table("gst_wap").head.getLong(0) == 18)
  }

  test("hidden-partitioned tables stream with partition values " +
    "recovered from manifest constants; rename epochs refuse loudly") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.s")
    spark.sql("DROP TABLE IF EXISTS gst.s.part")
    spark.sql(
      """CREATE TABLE gst.s.part (id BIGINT, region STRING, v DOUBLE)
        |PARTITIONED BY (region, bucket(4, id))""".stripMargin)
    spark.sql("""INSERT INTO gst.s.part
      |SELECT id, CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END,
      |       CAST(id AS DOUBLE) FROM range(40)""".stripMargin)
    drain(spark.readStream.table("gst.s.part")
      .groupBy("region").count()
      .writeStream.format("memory").queryName("gst_part")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("gst-part-ckpt"))
      .trigger(Trigger.AvailableNow()).start())
    val counts = spark.table("gst_part").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("eu" -> 20L, "us" -> 20L))
    // the streamed schema is the VISIBLE one (no _bucket, no _p_*)
    assert(spark.readStream.table("gst.s.part").schema.fieldNames.toSeq
      == Seq("id", "region", "v"))
    // rename epoch: files written under the old name must refuse (a
    // name-based reader would silently serve nulls), not misread
    spark.sql("ALTER TABLE gst.s.part RENAME COLUMN v TO val")
    val ex = intercept[Exception] {
      drain(spark.readStream.table("gst.s.part")
        .writeStream.format("memory").queryName("gst_part2")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("gst-part2-ckpt"))
        .trigger(Trigger.AvailableNow()).start())
    }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("field id"), m.take(400))
  }
}
