package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** INSERT OVERWRITE beyond the full-table replace: dynamic partition
  * overwrite (OverwritePartitionsDynamic -> overwritePartitionsDynamic,
  * one commit, untouched partitions byte-identical) and filter-scoped
  * overwrite (OverwriteByExpression -> overwriteWhere, whole files
  * proven from manifest stats, misaligned predicates refuse). */
class SqlOverwriteSpec extends SparkSuite {

  private lazy val wh = tmpDir("sqlow-wh")

  private def withExtSession[A](f: SparkSession => A): A = {
    val orig = spark
    orig.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.gow", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.gow.warehouse", wh)
      f(ext)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  private def withDynamicMode[A](s: SparkSession)(f: => A): A = {
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try f finally prev match {
      case Some(v) =>
        s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("dynamic INSERT OVERWRITE replaces exactly the touched " +
    "partitions in ONE commit; untouched partitions stay " +
    "byte-identical") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS gow.s")
      ext.sql("DROP TABLE IF EXISTS gow.s.days")
      ext.sql(
        """CREATE TABLE gow.s.days (id BIGINT, grp STRING, v DOUBLE)
          |PARTITIONED BY (grp)""".stripMargin)
      ext.sql("""INSERT INTO gow.s.days
        |SELECT id, CASE WHEN id % 3 = 0 THEN 'a'
        |                WHEN id % 3 = 1 THEN 'b' ELSE 'c' END,
        |       CAST(id AS DOUBLE) FROM range(90)""".stripMargin)
      val t = new LakeCatalog(ext, wh).table("s", "days")
      val before = t.dataFiles.map(e => e.path -> e.modTimeMs).toMap
      val v0 = t.currentVersion
      // rebuild ONLY partition 'b' with halved values
      withDynamicMode(ext) {
        ext.sql("""INSERT OVERWRITE gow.s.days
          |SELECT id, 'b', CAST(id AS DOUBLE) / 2
          |FROM range(90) WHERE id % 3 = 1""".stripMargin)
      }
      assert(t.currentVersion == v0 + 1, "dynamic overwrite must be " +
        s"ONE commit, saw ${t.currentVersion - v0}")
      val after = t.dataFiles.map(e => e.path -> e.modTimeMs).toMap
      // every a/c file survives untouched (same path, same mtime)
      val keptBefore = before.filterNot(_._1.contains("grp=b"))
      val keptAfter = after.filterNot(_._1.contains("grp=b"))
      assert(keptAfter == keptBefore,
        s"untouched partitions changed:\n$keptBefore\nvs\n$keptAfter")
      // b replaced wholesale
      assert(before.keys.exists(_.contains("grp=b")))
      assert(!after.keys.exists(k => before.contains(k) &&
        k.contains("grp=b")), "old b-files survived the overwrite")
      val rows = ext.sql(
        """SELECT grp, count(*) AS n,
          |  CAST(sum(v) AS BIGINT) AS sv
          |FROM gow.s.days GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val expB = (0 until 90).filter(_ % 3 == 1).map(_ / 2.0).sum.toLong
      val expA = (0 until 90).filter(_ % 3 == 0).sum.toLong
      val expC = (0 until 90).filter(_ % 3 == 2).sum.toLong
      assert(rows.toSeq == Seq(("a", 30L, expA), ("b", 30L, expB),
        ("c", 30L, expC)))
    }
  }

  test("dynamic overwrite on a hidden days(ts) layout: the SQL user " +
    "never names a derived column; empty input is a no-op") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS gow.s")
      ext.sql("DROP TABLE IF EXISTS gow.s.hid")
      ext.sql(
        """CREATE TABLE gow.s.hid (id BIGINT, ts TIMESTAMP, v DOUBLE)
          |PARTITIONED BY (days(ts))""".stripMargin)
      // two days of data
      ext.sql("""INSERT INTO gow.s.hid
        |SELECT id,
        |  CASE WHEN id < 50 THEN TIMESTAMP'2026-01-01 10:00:00'
        |       ELSE TIMESTAMP'2026-01-02 10:00:00' END,
        |  CAST(id AS DOUBLE)
        |FROM range(100)""".stripMargin)
      val t = new LakeCatalog(ext, wh).table("s", "hid")
      val day1Files = t.dataFiles.map(_.path)
        .filter(_.contains("_p_days_ts=20454")) // 2026-01-01
      assert(day1Files.nonEmpty, t.dataFiles.map(_.path).mkString(", "))
      withDynamicMode(ext) {
        // rebuild day 2 only: drop odd ids
        ext.sql("""INSERT OVERWRITE gow.s.hid
          |SELECT id, TIMESTAMP'2026-01-02 10:00:00',
          |       CAST(id AS DOUBLE)
          |FROM range(100) WHERE id >= 50 AND id % 2 = 0""".stripMargin)
        // empty incoming set: NO partitions touched, version unchanged
        val v1 = t.currentVersion
        ext.sql("""INSERT OVERWRITE gow.s.hid
          |SELECT id, TIMESTAMP'2026-01-02 10:00:00', 1.0
          |FROM range(10) WHERE 1 = 0""".stripMargin)
        assert(t.currentVersion == v1,
          "an empty dynamic overwrite must not commit")
      }
      assert(t.dataFiles.map(_.path).filter(_.contains("_p_days_ts=20454"))
        == day1Files, "day-1 files must survive a day-2 rebuild")
      assert(ext.sql("SELECT count(*) FROM gow.s.hid").head.getLong(0)
        == 50 + 25)
      assert(ext.sql(
        "SELECT count(*) FROM gow.s.hid WHERE id % 2 = 1 AND id >= 50")
        .head.getLong(0) == 0)
    }
  }

  test("static PARTITION (...) overwrite routes through overwriteWhere " +
    "and replaces exactly the proven files") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS gow.s")
      ext.sql("DROP TABLE IF EXISTS gow.s.stat")
      ext.sql(
        """CREATE TABLE gow.s.stat (id BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      ext.sql("""INSERT INTO gow.s.stat
        |SELECT id, CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END
        |FROM range(40)""".stripMargin)
      val t = new LakeCatalog(ext, wh).table("s", "stat")
      val usBefore = t.dataFiles.map(_.path).filter(_.contains("region=us"))
      val v0 = t.currentVersion
      // static partition clause: delete region='eu', insert the query
      ext.sql("""INSERT OVERWRITE gow.s.stat PARTITION (region = 'eu')
        |SELECT id + 1000 FROM range(3)""".stripMargin)
      assert(t.currentVersion == v0 + 1)
      assert(t.dataFiles.map(_.path).filter(_.contains("region=us"))
        == usBefore, "us partition must survive an eu overwrite")
      assert(ext.sql("SELECT count(*) FROM gow.s.stat WHERE region='eu'")
        .head.getLong(0) == 3)
      assert(ext.sql("SELECT count(*) FROM gow.s.stat WHERE region='us'")
        .head.getLong(0) == 20)
    }
  }

  test("overwriteWhere refuses a predicate that does not align with " +
    "file boundaries — never half-applies") {
    import spark.implicits._
    val t = LakeTable.create(spark, tmpDir("ow-refuse"),
      (0 until 100).map(i => (i.toLong, s"p-$i")).toDF("id", "s").schema)
    t.append((0 until 100).map(i => (i.toLong, s"p-$i")).toDF("id", "s")
      .coalesce(1))
    val ex = intercept[IllegalArgumentException] {
      t.overwriteWhere($"id" < 50L,
        Seq((1L, "x")).toDF("id", "s"))
    }
    assert(ex.getMessage.contains("align"), ex.getMessage.take(300))
    assert(t.read().count() == 100, "refusal must leave the table intact")
    // an aligned predicate on the same table succeeds: the single file
    // covers id in [0, 99], so "id <= 99" proves every row
    val v = t.overwriteWhere($"id" <= 99L, Seq((7L, "y")).toDF("id", "s"))
    assert(v > 0 && t.read().count() == 1)
  }

  test("dynamic overwrite refuses files written under a superseded " +
    "partition spec (compact first), and unpartitioned tables") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, i % 2)).toDF("id", "p")
    val t = LakeTable.create(spark, tmpDir("ow-spec"), df.schema,
      partitionBy = Seq("p"))
    t.append(df)
    t.alterPartitionSpec(Seq.empty) // evolve away from p
    t.append(df.limit(5))           // new files: unpartitioned layout
    val ex = intercept[IllegalArgumentException] {
      t.overwritePartitionsDynamic(df.limit(2))
    }
    assert(ex.getMessage.contains("partition"), ex.getMessage.take(300))
    val t2 = LakeTable.create(spark, tmpDir("ow-plain"),
      df.select("id").schema)
    t2.append(df.select("id"))
    val ex2 = intercept[IllegalArgumentException] {
      t2.overwritePartitionsDynamic(df.select("id").limit(2))
    }
    assert(ex2.getMessage.contains("overwriteAll"), ex2.getMessage)
  }

  test("INSERT OVERWRITE after merge-on-read deletes succeeds: " +
    "whole-file replacement never resurrects, deletes on untouched " +
    "files keep applying") {
    import spark.implicits._
    val df = (0 until 40)
      .map(i => (i.toLong, if (i % 2 == 0) "eu" else "us"))
      .toDF("id", "region")
    val t = LakeTable.create(spark, tmpDir("ow-mor"), df.schema,
      partitionBy = Seq("region"))
    t.append(df)
    // live MOR deletes: position (the SQL DELETE shape) + equality
    // (the GDPR shape) — previously these made any overwrite throw a
    // spurious ConcurrentModificationException
    t.deleteWherePositional($"id" === 2L)                    // eu row
    t.deleteWhereEqual(Seq(5L).toDF("id"), Seq("id"))        // us row
    assert(t.read().count() == 38)
    t.overwriteWhere($"region" === "eu",
      Seq((1000L, "eu"), (1001L, "eu"), (1002L, "eu"))
        .toDF("id", "region"))
    val after = t.read()
    assert(after.filter($"region" === "eu").count() == 3)
    assert(after.filter($"region" === "us").count() == 19)
    assert(after.filter($"id" === 5L).count() == 0,
      "equality-deleted row resurrected by the overwrite")
    // dynamic mode with another live equality delete also succeeds
    t.deleteWhereEqual(Seq(7L).toDF("id"), Seq("id"))        // us row
    t.overwritePartitionsDynamic(Seq((2000L, "eu")).toDF("id", "region"))
    assert(t.read().filter($"region" === "eu").count() == 1)
    assert(t.read().filter($"id" === 7L).count() == 0,
      "equality delete stopped applying after the dynamic overwrite")
    assert(t.read().count() == 19)
  }

  test("dynamic overwrite refuses a partition-spec REORDER of the " +
    "same columns (ordered key comparison, never silent duplication)") {
    import spark.implicits._
    val df = (0 until 20)
      .map(i => (i.toLong, (i % 2).toString, (i % 3).toString))
      .toDF("id", "a", "b")
    val t = LakeTable.create(spark, tmpDir("ow-reorder"), df.schema,
      partitionBy = Seq("a", "b"))
    t.append(df)
    t.alterPartitionSpec(Seq("b", "a")) // same columns, new ORDER
    val ex = intercept[IllegalArgumentException] {
      t.overwritePartitionsDynamic(
        Seq((100L, "0", "1")).toDF("id", "a", "b"))
    }
    assert(ex.getMessage.contains("superseded"), ex.getMessage.take(300))
    assert(t.read().count() == 20, "refusal must leave the table intact")
    // compaction rewrites into the new layout; the overwrite then
    // replaces exactly the (b, a) tuple the row lands in
    t.compact(2)
    t.overwritePartitionsDynamic(
      Seq((100L, "0", "1")).toDF("id", "a", "b"))
    // rows with a=0, b=1 were ids 4, 10, 16 — replaced by the one row
    assert(t.read().count() == 18)
    assert(t.read().filter($"a" === "0" && $"b" === "1").count() == 1)
  }

  test("without the extensions strategy, dynamic INSERT OVERWRITE " +
    "fails with an install instruction, never a wrong result") {
    // earlier suites may have installed the live-session strategies —
    // clear them for the duration, restore after
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    try runNoExtensions()
    finally spark.experimental.extraStrategies = saved
  }

  private def runNoExtensions(): Unit = {
    spark.conf.set("spark.sql.catalog.gowc", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gowc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gowc.s")
    spark.sql("DROP TABLE IF EXISTS gowc.s.nd")
    spark.sql(
      """CREATE TABLE gowc.s.nd (id BIGINT, grp STRING)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      "INSERT INTO gowc.s.nd SELECT id, 'a' FROM range(5)")
    withDynamicMode(spark) {
      val ex = intercept[Exception] {
        spark.sql(
          "INSERT OVERWRITE gowc.s.nd SELECT id, 'a' FROM range(2)")
      }
      val m = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      assert(m.contains("GraftExtensions"), m.take(500))
    }
    assert(spark.sql("SELECT count(*) FROM gowc.s.nd")
      .head.getLong(0) == 5)
  }
}
