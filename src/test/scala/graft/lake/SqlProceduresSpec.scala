package graft.lake

import graft.SparkSuite

/** `CALL graft.system.<proc>(...)` — the SQL face of maintenance and
  * ref operations: compaction, retention, vacuum, tags (+ VERSION AS
  * OF by tag), the full WAP branch cycle, and partition-spec
  * evolution, all driven by pure SQL on the conf-only route (Spark's
  * own ResolveProcedures/BindProcedures/InvokeProcedures own the CALL
  * semantics — no extensions needed). */
class SqlProceduresSpec extends SparkSuite {

  private lazy val wh = tmpDir("sqlproc-wh")

  private def install(): Unit = {
    spark.conf.set("spark.sql.catalog.gpr", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpr.s")
  }

  private def lake(name: String): LakeTable =
    new LakeCatalog(spark, wh).table("s", name)

  test("compact: CALL rewrites the file set (named args honored) and " +
    "sort_by range-clusters") {
    install()
    spark.sql("DROP TABLE IF EXISTS gpr.s.c")
    spark.sql("CREATE TABLE gpr.s.c (id BIGINT, v DOUBLE)")
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO gpr.s.c SELECT id + ${100 * i}, CAST(id AS DOUBLE) " +
        "FROM range(50)"))
    assert(lake("c").dataFiles.size > 2)
    val r = spark.sql(
      "CALL gpr.system.compact('s.c', num_files => 1)").collect()
    assert(r.length == 1 && r(0).getInt(0) > 0, r.mkString)
    assert(lake("c").dataFiles.size == 1)
    assert(spark.sql("SELECT count(*) FROM gpr.s.c").head.getLong(0)
      == 200)
    // sorted variant: still one file, rows clustered by id
    spark.sql("CALL gpr.system.compact('s.c', 1, 'id')")
    assert(spark.sql("SELECT count(*) FROM gpr.s.c").head.getLong(0)
      == 200)
  }

  test("expire_snapshots + vacuum: CALL drops old versions and " +
    "reclaims their files") {
    install()
    spark.sql("DROP TABLE IF EXISTS gpr.s.e")
    spark.sql("CREATE TABLE gpr.s.e (id BIGINT)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO gpr.s.e SELECT id + ${10 * i} FROM range(5)"))
    spark.sql("CALL gpr.system.compact('s.e', 1)")
    val r = spark.sql(
      "CALL gpr.system.expire_snapshots('s.e', keep_last => 1)")
      .collect()(0)
    assert(r.getInt(0) > 0, s"expired ${r.getInt(0)} snapshots")
    val v = spark.sql("CALL gpr.system.vacuum('s.e')").collect()(0)
    assert(v.getInt(0) >= 0)
    assert(spark.sql("SELECT count(*) FROM gpr.s.e").head.getLong(0)
      == 15)
  }

  test("create_tag via CALL completes the pure-SQL tag story: " +
    "VERSION AS OF 'name' reads it back; drop_tag removes it") {
    install()
    spark.sql("DROP TABLE IF EXISTS gpr.s.t")
    spark.sql("CREATE TABLE gpr.s.t (id BIGINT)")
    spark.sql("INSERT INTO gpr.s.t SELECT id FROM range(10)")
    val tagged = spark.sql(
      "CALL gpr.system.create_tag('s.t', 'audited')").collect()(0)
    assert(tagged.getString(0) == "audited")
    spark.sql("INSERT INTO gpr.s.t SELECT id + 100 FROM range(5)")
    assert(spark.sql(
      "SELECT count(*) FROM gpr.s.t VERSION AS OF 'audited'")
      .head.getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM gpr.s.t").head.getLong(0)
      == 15)
    // explicit version argument
    spark.sql("CALL gpr.system.create_tag('s.t', 'v-explicit', " +
      s"version => ${tagged.getInt(1)})")
    assert(spark.sql(
      "SELECT count(*) FROM gpr.s.t VERSION AS OF 'v-explicit'")
      .head.getLong(0) == 10)
    spark.sql("CALL gpr.system.drop_tag('s.t', 'v-explicit')")
    val ex = intercept[Exception] {
      spark.sql("SELECT count(*) FROM gpr.s.t VERSION AS OF 'v-explicit'")
        .collect()
    }
    assert(ex.getMessage.contains("v-explicit"), ex.getMessage.take(300))
  }

  test("WAP cycle via CALL: create_branch pins main, staged INSERTs " +
    "stay invisible, publish adopts them; abandon discards") {
    install()
    spark.sql("DROP TABLE IF EXISTS gpr.s.w")
    spark.sql("CREATE TABLE gpr.s.w (id BIGINT)")
    spark.sql("INSERT INTO gpr.s.w SELECT id FROM range(10)")
    spark.sql("CALL gpr.system.create_branch('s.w', 'audit-a')")
    spark.sql("INSERT INTO gpr.s.w SELECT id + 100 FROM range(5)")
    // main pinned: SELECT serves the pre-branch state
    assert(spark.sql("SELECT count(*) FROM gpr.s.w").head.getLong(0)
      == 10, "staged commits leaked to main before publish")
    // the staged view is the branch read (audit surface)
    assert(lake("w").readBranch("audit-a").count() == 15)
    spark.sql("CALL gpr.system.publish_branch('s.w', 'audit-a')")
    assert(spark.sql("SELECT count(*) FROM gpr.s.w").head.getLong(0)
      == 15)
    // abandon: staged work discarded, main unchanged
    spark.sql("CALL gpr.system.create_branch('s.w', 'audit-b')")
    spark.sql("INSERT INTO gpr.s.w SELECT id + 200 FROM range(7)")
    spark.sql("CALL gpr.system.abandon_branch('s.w', 'audit-b')")
    assert(spark.sql("SELECT count(*) FROM gpr.s.w").head.getLong(0)
      == 15)
  }

  test("set_partition_spec via CALL: future writes land the new " +
    "layout, old files keep pruning through their own epoch") {
    install()
    spark.sql("DROP TABLE IF EXISTS gpr.s.p")
    spark.sql(
      """CREATE TABLE gpr.s.p (id BIGINT, ts TIMESTAMP, v DOUBLE)
        |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql("""INSERT INTO gpr.s.p
      |SELECT id, TIMESTAMP'2026-02-01 08:00:00', CAST(id AS DOUBLE)
      |FROM range(20)""".stripMargin)
    spark.sql("CALL gpr.system.set_partition_spec('s.p', 'hours(ts)')")
    assert(lake("p").partitionSpecs == Seq("hours(ts)"))
    spark.sql("""INSERT INTO gpr.s.p
      |SELECT id + 100, TIMESTAMP'2026-02-02 09:30:00',
      |       CAST(id AS DOUBLE) FROM range(10)""".stripMargin)
    val newFiles = lake("p").dataFiles.map(_.path)
      .filter(_.contains("_p_hours_ts="))
    assert(newFiles.nonEmpty,
      lake("p").dataFiles.map(_.path).mkString(", "))
    assert(spark.sql("SELECT count(*) FROM gpr.s.p").head.getLong(0)
      == 30)
    // both epochs prune on ts
    assert(spark.sql(
      """SELECT count(*) FROM gpr.s.p
        |WHERE ts >= TIMESTAMP'2026-02-02 00:00:00'""".stripMargin)
      .head.getLong(0) == 10)
  }

  test("unknown procedures and foreign namespaces fail loudly with " +
    "the available roster") {
    install()
    val ex = intercept[Exception] {
      spark.sql("CALL gpr.system.frobnicate('s.t')").collect()
    }
    // Spark wraps the loader error in FAILED_TO_LOAD_ROUTINE; the
    // roster rides in the cause
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("compact"), m.take(400))
  }

  test("a multi-part table identifier is rejected with a clear " +
    "message, never resolved as namespace-prefix + dotted table") {
    install()
    val ex = intercept[Exception] {
      spark.sql("CALL gpr.system.compact('a.b.t')").collect()
    }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("single-level namespaces"), m.take(400))
  }
}
