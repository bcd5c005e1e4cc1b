package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.{LakeCatalog, LakeTable}

/** startTableMirror: a cross-engine replica maintained ONLY by the
  * source's streaming changelog — exact across merge-on-read DML,
  * checkpoint restarts, and whole-batch REPLAYS (the foreachBatch
  * at-least-once contract), because every per-version apply commit is
  * idempotent on the SOURCE VERSION. */
class TableMirrorMVSpec extends SparkSuite {

  private lazy val wh = tmpDir("mirror-wh")

  private def install(): Unit = {
    spark.conf.set("spark.sql.catalog.gmr", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmr.warehouse", wh)
    graft.GraftFunctions.installStrategies(spark)
  }

  private def rowsOf(t: LakeTable): Set[(Long, String, Double)] =
    t.read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  private def srcRows(): Set[(Long, String, Double)] =
    spark.sql("SELECT * FROM gmr.s.src").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("mirror equals source across snapshot, DELETE + UPDATE + " +
    "INSERT, a checkpoint restart, and a forced whole-batch replay") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmr.s")
    spark.sql("DROP TABLE IF EXISTS gmr.s.src")
    spark.sql("CREATE TABLE gmr.s.src (id BIGINT, k STRING, v DOUBLE)")
    spark.sql("""INSERT INTO gmr.s.src
      |SELECT id, concat('k', CAST(id % 4 AS STRING)),
      |       CAST(id AS DOUBLE) FROM range(30)""".stripMargin)
    val ckptRoot = tmpDir("mirror-ckpt")
    val mirror = LakeTable.create(spark, tmpDir("mirror-t"),
      spark.table("gmr.s.src").schema)
    val mv = new MVManager(spark, ckptRoot)
    def run(): Unit = mv.startTableMirror("mir",
      spark.readStream.table("gmr.s.src.changes"), mirror, Seq("id"))
      .awaitTermination()
    run() // snapshot
    assert(rowsOf(mirror) == srcRows())
    // three DML commits, one restarted trigger
    spark.sql("DELETE FROM gmr.s.src WHERE id IN (3, 7, 11)")
    spark.sql(
      "UPDATE gmr.s.src SET v = v + 500 WHERE k = 'k2' AND id < 20")
    spark.sql(
      "INSERT INTO gmr.s.src SELECT id + 900, 'kx', -1.0 FROM range(4)")
    run()
    assert(rowsOf(mirror) == srcRows())
    val vAfter = mirror.currentVersion
    // quiet restart: nothing re-applies
    run()
    assert(mirror.currentVersion == vAfter &&
      rowsOf(mirror) == srcRows())
    // FORCED whole-batch replay: drop the newest entry of the
    // checkpoint's commit log — Spark re-runs the last batch, and the
    // version-keyed guards must absorb every re-applied commit
    val commits = java.nio.file.Paths.get(s"$ckptRoot/mir/commits")
    val newest = java.nio.file.Files.list(commits)
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .max(java.util.Comparator.comparingLong(
        p => p.getFileName.toString.toLong)).get
    java.nio.file.Files.delete(newest)
    // ...and its checksum sibling (Spark 4's checkpoint manager), or
    // the re-written commit collides with the stale crc
    java.nio.file.Files.deleteIfExists(
      newest.resolveSibling(s".${newest.getFileName}.crc"))
    run()
    assert(rowsOf(mirror) == srcRows(),
      "a replayed batch duplicated or lost rows")
    // ...and the replay committed NOTHING new (every apply suppressed)
    assert(mirror.currentVersion == vAfter,
      s"replay advanced the mirror ${vAfter} -> ${mirror.currentVersion}")
    // later commits still flow after the replay
    spark.sql("DELETE FROM gmr.s.src WHERE id = 900")
    run()
    assert(rowsOf(mirror) == srcRows())
  }
}
