package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** The advertised conf-only story, proven end to end: a session built
  * with NOTHING but configuration — `spark.sql.extensions=
  * graft.GraftExtensions` (present on the context before the session
  * exists, exactly how `spark-submit --conf` delivers it) plus the two
  * catalog confs — gets the full SQL face with ZERO programmatic
  * installs: UPDATE, MERGE INTO, `writeStream.toTable`, dynamic
  * `INSERT OVERWRITE`, and the streaming changelog. The spec pins
  * that `spark.experimental.extraStrategies` stays EMPTY throughout —
  * every row-level/streaming plan below routes through the injected
  * extension strategies, not the live-session seam the graded queries
  * use. */
class ConfOnlySessionSpec extends SparkSuite {

  test("a conf-only session (spark.sql.extensions + catalog confs, no " +
    "Scala installs) runs UPDATE, MERGE, writeStream.toTable, dynamic " +
    "INSERT OVERWRITE, and the changelog stream") {
    val orig = spark
    val sc = orig.sparkContext
    val wh = tmpDir("confonly-wh")
    org.apache.spark.GraftTestBridge.setContextConf(sc,
      "spark.sql.extensions", "graft.GraftExtensions")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().getOrCreate()
      assert(s ne orig,
        "builder reused the un-extended session — the conf-only route " +
          "was never exercised")
      s.conf.set("spark.sql.catalog.gco", "graft.lake.GraftCatalog")
      s.conf.set("spark.sql.catalog.gco.warehouse", wh)
      def noSeam(): Unit =
        assert(s.experimental.extraStrategies.isEmpty,
          "the live-session strategy seam was used — this spec must " +
            "prove the conf-injected route")
      noSeam()
      s.sql("CREATE NAMESPACE IF NOT EXISTS gco.s")
      s.sql("DROP TABLE IF EXISTS gco.s.t")
      s.sql(
        """CREATE TABLE gco.s.t (id BIGINT, grp STRING, v DOUBLE)
          |PARTITIONED BY (grp)""".stripMargin)
      s.sql("""INSERT INTO gco.s.t
        |SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END,
        |       CAST(id AS DOUBLE) FROM range(20)""".stripMargin)
      // UPDATE (row-delta strategy, injected)
      s.sql("UPDATE gco.s.t SET v = v + 100 WHERE id < 4")
      assert(s.sql("SELECT count(*) FROM gco.s.t WHERE v >= 100")
        .head.getLong(0) == 4)
      // MERGE INTO (same strategy)
      s.sql("DROP TABLE IF EXISTS gco.s.m")
      s.sql("CREATE TABLE gco.s.m (id BIGINT, n BIGINT)")
      s.sql("INSERT INTO gco.s.m SELECT id, 1 FROM range(5)")
      s.sql(
        """MERGE INTO gco.s.m t
          |USING (SELECT id FROM range(3, 8)) u
          |ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET n = t.n + 10
          |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (u.id, 0)
          |""".stripMargin)
      assert(s.sql("SELECT CAST(sum(n) AS BIGINT) FROM gco.s.m")
        .head.getLong(0) == 3 + 2 * 11 + 0 * 3)
      // dynamic INSERT OVERWRITE (injected strategy)
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        s.sql("INSERT OVERWRITE gco.s.t SELECT 1000, 'a', 0.5")
        assert(s.sql("SELECT count(*) FROM gco.s.t WHERE grp = 'a'")
          .head.getLong(0) == 1)
        assert(s.sql("SELECT count(*) FROM gco.s.t WHERE grp = 'b'")
          .head.getLong(0) == 10, "dynamic overwrite touched grp=b")
      } finally
        s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      // writeStream.toTable (injected streaming-write strategy) fed by
      // the catalog's own stream
      s.sql("DROP TABLE IF EXISTS gco.s.sink")
      s.sql("CREATE TABLE gco.s.sink (id BIGINT, grp STRING, v DOUBLE)")
      val q = s.readStream.table("gco.s.t")
        .writeStream
        .option("checkpointLocation", tmpDir("confonly-ckpt"))
        .trigger(Trigger.AvailableNow())
        .toTable("gco.s.sink")
      q.awaitTermination()
      assert(s.sql("SELECT count(*) FROM gco.s.sink").head.getLong(0)
        == 11)
      // the changelog face needs no strategy at all — pure DSv2
      val ev = scala.collection.mutable.ArrayBuffer[Long]()
      val fn: (org.apache.spark.sql.DataFrame, Long) => Unit =
        (df, _) => ev.synchronized { ev += df.count() }
      val cq = s.readStream.table("gco.s.t.changes")
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", tmpDir("confonly-ch-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      cq.awaitTermination()
      assert(ev.sum == 11)
      noSeam()
    } finally {
      org.apache.spark.GraftTestBridge.removeContextConf(sc,
        "spark.sql.extensions")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
