package graft.lake

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** `spark.readStream.table("cat.ns.t.changes")` — the streaming
  * row-level changelog (GraftLakeChangesMicroBatchStream): every
  * commit mirrors as (row, _change_type, _commit_version) events;
  * applying them in commit order reproduces the table exactly across
  * checkpoint restarts, merge-on-read DML, overwrites, WAP staging,
  * and compactions. */
class SqlChangelogStreamSpec extends SparkSuite {

  private lazy val wh = tmpDir("gcl-wh")

  private def install(): Unit = {
    spark.conf.set("spark.sql.catalog.gcl", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcl.warehouse", wh)
    graft.GraftFunctions.installStrategies(spark)
  }

  /** Collect all events a changes stream delivers across triggers of
    * one checkpoint (foreachBatch — offsets prove exactly-once). */
  private class EventLog(table: String, ckpt: String,
                         options: Map[String, String] = Map.empty) {
    val events = scala.collection.mutable.ArrayBuffer[Row]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      var r = spark.readStream
      options.foreach { case (k, v) => r = r.option(k, v) }
      val fn: (DataFrame, Long) => Unit = (df, _) =>
        events.synchronized { events ++= df.collect() }
      val q = r.table(table).writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q
    }
  }

  /** Apply (op, row) events in _commit_version order — deletes before
    * inserts within a version — onto a multiset mirror. `nCols` is
    * the width of the data row (events carry _change_type at nCols
    * and _commit_version at nCols + 1). CDF update types fold onto
    * the apply algebra: update_preimage deletes, update_postimage
    * inserts. */
  private def mirrorOf(events: Seq[Row], nCols: Int): Seq[Seq[Any]] = {
    val mirror = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    events.groupBy(_.getLong(nCols + 1)).toSeq.sortBy(_._1)
      .foreach { case (_, evs) =>
        val (dels, ins) =
          evs.partition(r => r.getString(nCols) == "delete" ||
            r.getString(nCols) == "update_preimage")
        dels.foreach { d =>
          val row = d.toSeq.take(nCols)
          val i = mirror.indexOf(row)
          assert(i >= 0, s"changelog deleted a row absent from the " +
            s"mirror: $row")
          mirror.remove(i)
        }
        ins.foreach(r => mirror += r.toSeq.take(nCols))
      }
    mirror.toSeq
  }

  private def sortedRows(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.mkString("|")).sorted

  test("changes stream mirrors snapshot + DELETE + UPDATE + INSERT " +
    "exactly, in _commit_version order, across a checkpoint restart") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.t")
    spark.sql("CREATE TABLE gcl.s.t (id BIGINT, k STRING, v DOUBLE)")
    spark.sql("""INSERT INTO gcl.s.t
      |SELECT id, concat('k', CAST(id % 5 AS STRING)),
      |       CAST(id AS DOUBLE) FROM range(20)""".stripMargin)
    // the changes table's schema: visible columns + the full Delta
    // CDF column set
    assert(spark.readStream.table("gcl.s.t.changes").schema.fieldNames
      .toSeq == Seq("id", "k", "v", "_change_type", "_commit_version",
        "_commit_timestamp"))
    val log = new EventLog("gcl.s.t.changes", tmpDir("gcl-t-ckpt"))
    log.run() // batch 0: the snapshot as inserts
    assert(log.events.nonEmpty &&
      log.events.forall(_.getString(3) == "insert"))
    assert(log.events.size == 20)
    // three DML commits land; ONE restarted trigger carries all of
    // them (multi-version batch) — per-version apply must still be
    // exact: the UPDATE's delete half and insert half share a commit
    spark.sql("DELETE FROM gcl.s.t WHERE id IN (3, 7)")
    spark.sql(
      "UPDATE gcl.s.t SET v = v + 100 WHERE id < 5 AND id NOT IN (3)")
    spark.sql("INSERT INTO gcl.s.t SELECT id + 500, 'kx', -1.0 " +
      "FROM range(4)")
    log.run() // checkpoint restart, mid-history
    val expected = spark.sql("SELECT * FROM gcl.s.t").collect()
      .map(_.toSeq).toSeq
    assert(sortedRows(mirrorOf(log.events.toSeq, 3)) ==
      sortedRows(expected),
      "changelog mirror diverged from the table")
    // quiet restart: no re-delivery
    val before = log.events.size
    log.run()
    assert(log.events.size == before, "quiet restart re-delivered")
    // the UPDATE commit arrives TYPED (Delta CDF parity): its delete
    // half as update_preimage carrying the OLD row version, its
    // insert half as update_postimage with the new one, equal
    // _commit_version
    val updPre = log.events.filter(_.getString(3) == "update_preimage")
    val updPost = log.events.filter(_.getString(3) == "update_postimage")
    assert(updPre.nonEmpty && updPre.size == updPost.size,
      s"unpaired update images: ${updPre.size} pre, ${updPost.size} post")
    assert(updPre.map(_.getLong(4)).toSet ==
      updPost.map(_.getLong(4)).toSet,
      "pre/post images must share their commit version")
    assert(updPre.forall(r => r.getLong(0) < 5 && r.getLong(0) != 3L &&
      r.getDouble(2) < 100.0),
      "UPDATE's preimage events must carry the pre-image")
    assert(updPost.forall(_.getDouble(2) >= 100.0),
      "UPDATE's postimage events must carry the post-image")
    // the plain DELETE commit stays `delete`-typed
    assert(log.events.exists(r => r.getString(3) == "delete" &&
      Set(3L, 7L)(r.getLong(0))))
  }

  test("changes stream: delete + re-insert of the same key across " +
    "commits in ONE batch applies in order (no net loss)") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.ri")
    spark.sql("CREATE TABLE gcl.s.ri (id BIGINT, v DOUBLE)")
    spark.sql(
      "INSERT INTO gcl.s.ri SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    val log = new EventLog("gcl.s.ri.changes", tmpDir("gcl-ri-ckpt"))
    log.run()
    spark.sql("DELETE FROM gcl.s.ri WHERE id = 4")
    spark.sql("INSERT INTO gcl.s.ri SELECT 4, 99.0 FROM range(1)")
    log.run() // one batch, two versions
    val expected = spark.sql("SELECT * FROM gcl.s.ri").collect()
      .map(_.toSeq).toSeq
    assert(sortedRows(mirrorOf(log.events.toSeq, 2)) ==
      sortedRows(expected))
    assert(spark.sql("SELECT v FROM gcl.s.ri WHERE id = 4")
      .head.getDouble(0) == 99.0)
  }

  test("equality-delete commits stream as O(covered files) delete " +
    "events; -0.0/0.0 keys match SQL null-safe semantics on both " +
    "batch and changelog paths") {
    install()
    val sp = spark
    import sp.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.eq")
    spark.sql("CREATE TABLE gcl.s.eq (id BIGINT, key DOUBLE)")
    // one row keyed -0.0, one keyed +0.0, plus filler
    Seq((1L, -0.0d), (2L, 0.0d), (3L, 5.0d), (4L, 7.0d))
      .toDF("id", "key").createOrReplaceTempView("gcl_eq_src")
    spark.sql("INSERT INTO gcl.s.eq SELECT * FROM gcl_eq_src")
    val log = new EventLog("gcl.s.eq.changes", tmpDir("gcl-eq-ckpt"))
    log.run()
    val t = new LakeCatalog(spark, wh).table("s", "eq")
    t.deleteWhereEqual(Seq(0.0d).toDF("key"), Seq("key"))
    // the batch read kills BOTH zero rows (SQL: -0.0 <=> 0.0)
    assert(spark.sql("SELECT count(*) FROM gcl.s.eq").head.getLong(0)
      == 2)
    log.run()
    val expected = spark.sql("SELECT * FROM gcl.s.eq").collect()
      .map(_.toSeq).toSeq
    assert(sortedRows(mirrorOf(log.events.toSeq, 2)) ==
      sortedRows(expected),
      "-0.0 equality-delete key diverged between batch and changelog")
    val delIds = log.events.filter(_.getString(2) == "delete")
      .map(_.getLong(0)).sorted
    assert(delIds == Seq(1L, 2L), s"deletes were $delIds")
    // a fresh changes stream over the live-delete snapshot serves the
    // surviving rows as inserts (initial batch applies MOR state)
    val fresh = new EventLog("gcl.s.eq.changes", tmpDir("gcl-eq2-ckpt"))
    fresh.run()
    assert(sortedRows(fresh.events.map(_.toSeq.take(2)).toSeq) ==
      sortedRows(expected))
  }

  test("overwrite commits stream as full-churn delete+insert of the " +
    "touched partition; compactions stream nothing") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.ow")
    spark.sql(
      """CREATE TABLE gcl.s.ow (id BIGINT, grp STRING)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql("""INSERT INTO gcl.s.ow
      |SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END
      |FROM range(20)""".stripMargin)
    val log = new EventLog("gcl.s.ow.changes", tmpDir("gcl-ow-ckpt"))
    log.run()
    val t = new LakeCatalog(spark, wh).table("s", "ow")
    val sp = spark
    import sp.implicits._
    t.overwritePartitionsDynamic(
      Seq((100L, "a"), (101L, "a")).toDF("id", "grp"))
    log.run()
    val expected = spark.sql("SELECT * FROM gcl.s.ow").collect()
      .map(_.toSeq).toSeq
    assert(sortedRows(mirrorOf(log.events.toSeq, 2)) ==
      sortedRows(expected))
    // churn scoped to the touched partition: 10 deletes + 2 inserts
    val owEvents = log.events.filter(_.getLong(3) > 1L)
    assert(owEvents.count(_.getString(2) == "delete") == 10 &&
      owEvents.count(_.getString(2) == "insert") == 2,
      owEvents.map(r => (r.getString(2), r.getLong(0))).mkString(", "))
    assert(owEvents.forall(r => r.getString(1) == "a" ||
      r.getString(2) == "insert"), "churn leaked into partition b")
    // a compaction is row-preserving: the stream must deliver nothing
    t.compact(1)
    val before = log.events.size
    log.run()
    assert(log.events.size == before,
      "compaction leaked into the changelog stream")
  }

  test("changes stream honors the WAP pin (staged commits invisible " +
    "until publish) and startingVersion") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.wap")
    spark.sql("CREATE TABLE gcl.s.wap (id BIGINT)")
    spark.sql("INSERT INTO gcl.s.wap SELECT id FROM range(10)") // v1
    spark.sql("INSERT INTO gcl.s.wap SELECT id + 50 FROM range(5)") // v2
    // startingVersion=2: only v2 streams, as inserts, no snapshot
    val sv = new EventLog("gcl.s.wap.changes", tmpDir("gcl-sv-ckpt"),
      Map("startingVersion" -> "2"))
    sv.run()
    assert(sv.events.size == 5 &&
      sv.events.forall(r => r.getString(1) == "insert" &&
        r.getLong(2) == 2L && r.getLong(0) >= 50L),
      sv.events.mkString(", "))
    // WAP: staged commits must not stream; publish releases them
    val t = new LakeCatalog(spark, wh).table("s", "wap")
    t.createBranch("audit")
    val sp = spark
    import sp.implicits._
    t.append((100L until 103L).toDF("id"))
    val before = sv.events.size
    sv.run()
    assert(sv.events.size == before,
      "changes stream served staged WAP commits")
    t.publishBranch("audit")
    sv.run()
    assert(sv.events.size == before + 3)
  }

  test("startingTimestamp resolves to the first commit at or after " +
    "the timestamp on both stream faces; predating timestamps refuse") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.ts")
    spark.sql("CREATE TABLE gcl.s.ts (id BIGINT)")                  // v0
    spark.sql("INSERT INTO gcl.s.ts SELECT id FROM range(10)")      // v1
    Thread.sleep(15)
    spark.sql("INSERT INTO gcl.s.ts SELECT id + 100 FROM range(5)") // v2
    spark.sql("INSERT INTO gcl.s.ts SELECT id + 200 FROM range(3)") // v3
    val t = new LakeCatalog(spark, wh).table("s", "ts")
    val v2Time = t.snapshots.find(_.version == 2).get.committedAtMs
    // append stream from v2's commit time: v2 + v3 rows only
    def drainAppend(name: String, ts: String): Unit = {
      val q = spark.readStream.option("startingTimestamp", ts)
        .table("gcl.s.ts")
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tmpDir(s"gcl-ts-$name"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainAppend("gcl_ts_app", v2Time.toString)
    val ids = spark.table("gcl_ts_app").collect().map(_.getLong(0))
    assert(ids.length == 8 && ids.forall(_ >= 100L),
      s"got ${ids.sorted.mkString(",")}")
    // changes stream, same option currency
    val log = new EventLog("gcl.s.ts.changes", tmpDir("gcl-ts-ch"),
      Map("startingTimestamp" -> v2Time.toString))
    log.run()
    assert(log.events.size == 8 &&
      log.events.forall(r => r.getLong(2) >= 2L))
    // a timestamp after the last commit starts EMPTY at the head;
    // later commits stream
    val late = new EventLog("gcl.s.ts.changes", tmpDir("gcl-ts-late"),
      Map("startingTimestamp" ->
        (System.currentTimeMillis() + 60_000L).toString))
    late.run()
    assert(late.events.isEmpty)
    spark.sql("INSERT INTO gcl.s.ts SELECT id + 300 FROM range(2)")
    late.run()
    assert(late.events.size == 2)
    // predating the initial snapshot: refuse with guidance, never a
    // silent skip of version 0's content
    val ex = intercept[Exception] {
      drainAppend("gcl_ts_pre", "0")
    }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("snapshot"), m.take(300))
    // startingVersion + startingTimestamp together: refuse
    val ex2 = intercept[Exception] {
      val q = spark.readStream
        .option("startingTimestamp", v2Time.toString)
        .option("startingVersion", "2").table("gcl.s.ts")
        .writeStream.format("memory").queryName("gcl_ts_both")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("gcl-ts-both"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val m2 = Iterator.iterate(ex2: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m2.contains("mutually exclusive"), m2.take(300))
  }

  test("startingTimestamp accepts date-only and zone-offset forms " +
    "(Delta parity) alongside epoch/SQL/ISO") {
    import graft.sources.GraftVersionedStreamBase.parseTimestampMs
    assert(parseTimestampMs("1700000000000") == 1700000000000L)
    assert(parseTimestampMs("2024-01-01") ==
      java.sql.Date.valueOf("2024-01-01").getTime)
    assert(parseTimestampMs("2024-01-01 00:00:00") ==
      parseTimestampMs("2024-01-01"))
    assert(parseTimestampMs("2023-12-31T22:00:00Z") ==
      parseTimestampMs("2024-01-01T00:00:00+02:00"))
    assert(parseTimestampMs(" 2024-01-01 ") ==
      parseTimestampMs("2024-01-01"))
  }

  test("startingTimestamp is resolved only for FRESH checkpoints: a " +
    "restart survives the timestamp's predecessor expiring") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.ret")
    spark.sql("CREATE TABLE gcl.s.ret (id BIGINT)")                 // v0
    spark.sql("INSERT INTO gcl.s.ret SELECT id FROM range(3)")      // v1
    Thread.sleep(15)
    spark.sql("INSERT INTO gcl.s.ret SELECT id + 10 FROM range(3)") // v2
    spark.sql("INSERT INTO gcl.s.ret SELECT id + 20 FROM range(3)") // v3
    val t = new LakeCatalog(spark, wh).table("s", "ret")
    val v2Time = t.snapshots.find(_.version == 2).get.committedAtMs
    val log = new EventLog("gcl.s.ret.changes", tmpDir("gcl-ret-ckpt"),
      Map("startingTimestamp" -> v2Time.toString))
    log.run()
    assert(log.events.size == 6 &&
      log.events.forall(_.getLong(2) >= 2L))
    // retention expires v1 — the timestamp's PREDECESSOR. The stream's
    // checkpoint is already past the timestamp; an eager re-resolution
    // on restart would hit the proven-first refusal and brick it.
    spark.sql("INSERT INTO gcl.s.ret SELECT id + 30 FROM range(2)") // v4
    t.expireSnapshots(keepLast = 3)
    assert(!t.snapshots.exists(_.version == 1), "v1 should be expired")
    log.run() // restart, same checkpoint: must deliver v4, not throw
    assert(log.events.size == 8,
      s"restart past retention lost/failed: ${log.events.size}")
    // a FRESH checkpoint with the same timestamp still refuses — the
    // proven-first contract is about fresh starts, not restarts
    val fresh = new EventLog("gcl.s.ret.changes", tmpDir("gcl-ret-f"),
      Map("startingTimestamp" -> v2Time.toString))
    val ex = intercept[Exception] { fresh.run() }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("retention"), m.take(300))
  }

  test("changes stream initial batch above the MOR bound serves " +
    "through the distributed batch read — mirror still exact") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.big")
    spark.sql("CREATE TABLE gcl.s.big (id BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO gcl.s.big
      |SELECT id, CAST(id AS DOUBLE) FROM range(30)""".stripMargin)
    spark.sql("DELETE FROM gcl.s.big WHERE id IN (2, 4, 6, 8)")
    val log = new EventLog("gcl.s.big.changes", tmpDir("gcl-big-ckpt"),
      Map("maxMorRowsPerBatch" -> "1"))
    log.run()
    val expected = spark.sql("SELECT * FROM gcl.s.big").collect()
      .map(_.toSeq).toSeq
    assert(log.events.size == 26 &&
      log.events.forall(_.getString(2) == "insert"))
    assert(sortedRows(log.events.map(_.toSeq.take(2)).toSeq) ==
      sortedRows(expected))
    // a DELTA above the bound serves DISTRIBUTED too (the per-commit
    // batch changelog into checkpoint scratch): a bulk purge + an
    // UPDATE + an append all stream, typed, and the mirror stays
    // exact — the r15 refusal path is gone
    spark.sql("DELETE FROM gcl.s.big WHERE id IN (10, 12)")
    spark.sql("UPDATE gcl.s.big SET v = v + 1000 WHERE id IN (14, 16)")
    spark.sql("INSERT INTO gcl.s.big SELECT id + 900, -1.0 FROM range(2)")
    log.run()
    val expected2 = spark.sql("SELECT * FROM gcl.s.big").collect()
      .map(_.toSeq).toSeq
    assert(sortedRows(mirrorOf(log.events.toSeq, 2)) ==
      sortedRows(expected2),
      "over-bound delta batch diverged from the table")
    // typing survives the distributed path (one code path with the
    // batch face): the UPDATE commit's events arrive as image pairs
    val pre = log.events.filter(_.getString(2) == "update_preimage")
    val post = log.events.filter(_.getString(2) == "update_postimage")
    assert(pre.size == 2 && post.size == 2 &&
      pre.forall(_.getDouble(1) < 1000.0) &&
      post.forall(_.getDouble(1) >= 1000.0),
      log.events.map(r => (r.getLong(0), r.getString(2))).mkString(", "))
    // quiet restart after the scratch batch: no re-delivery, and the
    // committed scratch is swept by the next planning call
    val before = log.events.size
    spark.sql("INSERT INTO gcl.s.big SELECT id + 950, -2.0 FROM range(1)")
    log.run()
    assert(log.events.size == before + 1,
      s"scratch batch re-delivered or lost: ${log.events.size - before}")
  }

  test("table_changes TVF: the batch change feed from SQL text alone " +
    "— version and timestamp bounds, composable, errors delegated") {
    install()
    graft.GraftFunctions.register(spark) // the TVF on a live session
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.tvf")
    spark.sql("CREATE TABLE gcl.s.tvf (id BIGINT)")                // v0
    spark.sql("INSERT INTO gcl.s.tvf SELECT id FROM range(10)")    // v1
    Thread.sleep(15)
    spark.sql("DELETE FROM gcl.s.tvf WHERE id IN (3, 7)")          // v2
    spark.sql("INSERT INTO gcl.s.tvf SELECT id + 100 FROM range(3)") // v3
    // version bounds — identical to the reader-option face
    val rows = spark.sql(
      "SELECT * FROM table_changes('gcl.s.tvf', 2)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(rows.toSeq == Seq(
      (3L, "delete", 2L), (7L, "delete", 2L),
      (100L, "insert", 3L), (101L, "insert", 3L),
      (102L, "insert", 3L)), rows.mkString(", "))
    assert(spark.sql(
      "SELECT count(*) FROM table_changes('gcl.s.tvf', 2, 2)")
      .head.getLong(0) == 2)
    // composable like a table: aggregate over a typed change feed
    assert(spark.sql(
      """SELECT _change_type, count(*) AS n
        |FROM table_changes('gcl.s.tvf', 2, 3)
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("delete", 2L), ("insert", 3L)))
    // timestamp bound: v2's commit time resolves to commits >= v2
    val t = new LakeCatalog(spark, wh).table("s", "tvf")
    val v2Time = t.snapshots.find(_.version == 2).get.committedAtMs
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('gcl.s.tvf', '$v2Time')")
      .head.getLong(0) == 5)
    // validation is the reader face's: version 0 refuses with the
    // same guidance; a non-literal bound names the usage
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('gcl.s.tvf', 0)").collect()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      .contains("startingVersion"))
    val ex2 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM table_changes('gcl.s.tvf', id) ").collect()
    }
    assert(Option(ex2.getMessage).getOrElse("").nonEmpty)
  }

  test("mixed MERGE keeps the conservative insert/delete typing; a " +
    "pure-update MERGE and the batch face carry the image pair") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.mg")
    spark.sql("CREATE TABLE gcl.s.mg (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcl.s.mg SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(10)")                                           // v1
    // v2: MIXED merge — updates ids 0..4, inserts ids 20..22: the
    // added files blend postimages with plain inserts, so the commit
    // must NOT be stamped (file-grained emission cannot split them)
    spark.sql("""MERGE INTO gcl.s.mg t
      |USING (SELECT id, CAST(id + 500 AS DOUBLE) v FROM range(5)
      |       UNION ALL
      |       SELECT id + 20, CAST(0 AS DOUBLE) FROM range(3)) s
      |ON t.id = s.id
      |WHEN MATCHED THEN UPDATE SET v = s.v
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // v3: PURE-UPDATE merge — every source row matches: exact typing
    spark.sql("""MERGE INTO gcl.s.mg t
      |USING (SELECT id + 20 AS id, CAST(9 AS DOUBLE) v
      |       FROM range(3)) s
      |ON t.id = s.id
      |WHEN MATCHED THEN UPDATE SET v = s.v
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val cdf = spark.read.option("startingVersion", "2")
      .table("gcl.s.mg.changes").collect()
    val v2 = cdf.filter(_.getLong(3) == 2L)
    val v3 = cdf.filter(_.getLong(3) == 3L)
    assert(v2.map(_.getString(2)).toSet == Set("insert", "delete"),
      s"mixed MERGE must stay untyped: ${v2.map(_.getString(2)).toSet}")
    assert(v2.count(_.getString(2) == "delete") == 5 &&
      v2.count(_.getString(2) == "insert") == 8)
    assert(v3.map(_.getString(2)).toSet ==
      Set("update_preimage", "update_postimage"),
      s"pure-update MERGE must type: ${v3.map(_.getString(2)).toSet}")
    assert(v3.count(_.getString(2) == "update_preimage") == 3 &&
      v3.filter(_.getString(2) == "update_postimage")
        .forall(_.getDouble(1) == 9.0))
    // stream face agrees with the batch face event for event —
    // including the commit wall-clock column
    val log = new EventLog("gcl.s.mg.changes", tmpDir("gcl-mg-ckpt"),
      Map("startingVersion" -> "2"))
    log.run()
    def keyed(rs: Seq[Row]) = rs.map(r =>
      (r.getLong(0), r.getString(2), r.getLong(3),
        r.getTimestamp(4).getTime)).sorted
    assert(keyed(log.events.toSeq) == keyed(cdf.toSeq),
      "stream and batch faces diverged on typed events")
  }

  test("maxRowsPerBatch paces the changes stream version-granularly " +
    "by emitted rows, without loss or re-delivery") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.paced")
    spark.sql("CREATE TABLE gcl.s.paced (id BIGINT)")
    spark.sql("INSERT INTO gcl.s.paced SELECT id FROM range(10)")
    val log = new EventLog("gcl.s.paced.changes",
      tmpDir("gcl-paced-ckpt"), Map("maxRowsPerBatch" -> "25"))
    log.run() // snapshot (indivisible)
    assert(log.events.size == 10)
    // five 20-row appends + one delete commit; a 25-row cap must
    // split them across multiple batches, each at a commit boundary
    (0 until 5).foreach(i => spark.sql(
      s"INSERT INTO gcl.s.paced SELECT id + ${100 * (i + 1)} " +
        "FROM range(20)"))
    spark.sql("DELETE FROM gcl.s.paced WHERE id IN (2, 4)")
    val q = log.run()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2,
      s"102 emitted rows under a 25-row cap must take multiple " +
        s"batches: ${q.recentProgress.map(_.numInputRows).mkString(",")}")
    assert(log.events.size == 10 + 100 + 2,
      s"pacing lost or re-delivered events: ${log.events.size}")
    assert(log.events.count(_.getString(1) == "delete") == 2)
  }

  test("ADD COLUMN mid-history: pre-evolution files stream with the " +
    "new column null (field-id pass); a RENAME epoch refuses loudly") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.evo")
    spark.sql("CREATE TABLE gcl.s.evo (id BIGINT)")
    spark.sql("INSERT INTO gcl.s.evo SELECT id FROM range(5)")   // v1
    spark.sql("ALTER TABLE gcl.s.evo ADD COLUMN extra DOUBLE")   // v2
    spark.sql(
      "INSERT INTO gcl.s.evo SELECT id + 100, 1.5 FROM range(3)") // v3
    val log = new EventLog("gcl.s.evo.changes", tmpDir("gcl-evo-ckpt"))
    log.run() // snapshot: both epochs' files under the CURRENT schema
    assert(log.events.size == 8)
    val (old, young) = log.events.partition(_.getLong(0) < 100L)
    assert(old.size == 5 && old.forall(_.isNullAt(1)),
      "pre-evolution rows must surface the added column as null")
    assert(young.size == 3 && young.forall(_.getDouble(1) == 1.5))
    // the pure-metadata ALTER commit itself streams nothing: a fresh
    // startingVersion=2 stream sees only v3's rows
    val sv = new EventLog("gcl.s.evo.changes", tmpDir("gcl-evo2-ckpt"),
      Map("startingVersion" -> "2"))
    sv.run()
    assert(sv.events.size == 3 &&
      sv.events.forall(r => r.getLong(3) == 3L))
    // a rename epoch refuses (stale names must never serve as nulls)
    spark.sql("ALTER TABLE gcl.s.evo RENAME COLUMN extra TO bonus")
    val fresh = new EventLog("gcl.s.evo.changes",
      tmpDir("gcl-evo3-ckpt"))
    val ex = intercept[Exception] { fresh.run() }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("field id"), m.take(300))
  }

  test("batch change feed (Delta table_changes parity): per-commit " +
    "events for [startingVersion, endingVersion], range required, " +
    "DROP refuses") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.s")
    spark.sql("DROP TABLE IF EXISTS gcl.s.b")
    spark.sql("CREATE TABLE gcl.s.b (id BIGINT)")                // v0
    spark.sql("INSERT INTO gcl.s.b SELECT id FROM range(10)")    // v1
    spark.sql("DELETE FROM gcl.s.b WHERE id IN (3, 7)")          // v2
    spark.sql("INSERT INTO gcl.s.b SELECT id + 100 FROM range(3)") // v3
    val cdf = spark.read.option("startingVersion", "2")
      .table("gcl.s.b.changes")
    assert(cdf.schema.fieldNames.toSeq ==
      Seq("id", "_change_type", "_commit_version", "_commit_timestamp"))
    // _commit_timestamp is each commit's wall-clock — the same value
    // TIMESTAMP AS OF resolves against, on both faces
    val tb = new LakeCatalog(spark, wh).table("s", "b")
    cdf.collect().foreach { r =>
      val v = r.getLong(2).toInt
      assert(r.getTimestamp(3).getTime ==
        tb.snapshots.find(_.version == v).get.committedAtMs,
        s"_commit_timestamp diverged from the snapshot clock at v$v")
    }
    val events = cdf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(events.toSeq == Seq(
      (3L, "delete", 2L), (7L, "delete", 2L),
      (100L, "insert", 3L), (101L, "insert", 3L),
      (102L, "insert", 3L)), events.mkString(", "))
    // endingVersion bounds the range; batch events equal what the
    // STREAM delivers for the same commits (one contract, two faces)
    val only2 = spark.read.option("startingVersion", "2")
      .option("endingVersion", "2").table("gcl.s.b.changes").collect()
    assert(only2.length == 2 && only2.forall(_.getString(1) == "delete"))
    val log = new EventLog("gcl.s.b.changes", tmpDir("gcl-b-ckpt"),
      Map("startingVersion" -> "2"))
    log.run()
    assert(log.events.map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
      == events.toSeq, "batch and stream faces diverged")
    // a batch read WITHOUT a range is refused with guidance (a
    // changelog needs a range), the snapshot read is the table itself
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM gcl.s.b.changes").collect()
    }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("startingVersion"), m.take(300))
    intercept[Exception] {
      spark.sql("DROP TABLE gcl.s.b.changes")
    }
    assert(spark.sql("SELECT count(*) FROM gcl.s.b").head.getLong(0)
      == 11, "the real table must survive")
  }
}
