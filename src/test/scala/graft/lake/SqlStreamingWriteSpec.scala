package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** `df.writeStream.toTable("graft.ns.t")` — STREAMING_WRITE on the SQL
  * catalog (GraftStreamingWrite + GraftStreamingTableWriteStrategy):
  * exactly-once epoch commits through appendExactlyOnce keyed
  * (queryId, epochId), complete-mode overwrite, hidden-partitioned
  * targets, honest failure without the extensions strategy. */
class SqlStreamingWriteSpec extends SparkSuite {

  private lazy val wh = tmpDir("sqlwrite-wh")

  /** Fresh extensions session over the shared context — the write
    * strategy is planner-injected, exactly like row-level DML. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val orig = spark
    orig.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.gsw", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.gsw.warehouse", wh)
      f(ext)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("writeStream.toTable (append): each epoch is ONE transactional " +
    "commit, exactly-once across a checkpoint restart, and a replayed " +
    "epoch is suppressed") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS gsw.s")
      ext.sql("DROP TABLE IF EXISTS gsw.s.sink")
      ext.sql("CREATE TABLE gsw.s.sink (id BIGINT, v DOUBLE)")
      implicit val sqlCtx = ext.sqlContext
      import ext.implicits._
      val mem = MemoryStream[Long]
      val ckpt = tmpDir("gsw-ckpt")
      def run(): Unit = {
        val q = mem.toDF().select(col("value").as("id"),
            (col("value") * 2.0).as("v"))
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .toTable("gsw.s.sink")
        q.awaitTermination()
      }
      mem.addData(0L until 10L: _*)
      run()
      assert(ext.sql("SELECT count(*) FROM gsw.s.sink")
        .head.getLong(0) == 10)
      // restart from the checkpoint with new data: only the new rows
      mem.addData(100L until 105L: _*)
      run()
      assert(ext.sql("SELECT count(*) FROM gsw.s.sink")
        .head.getLong(0) == 15)
      assert(ext.sql("SELECT CAST(sum(v) AS BIGINT) FROM gsw.s.sink")
        .head.getLong(0) == (0L until 10L).map(_ * 2).sum +
          (100L until 105L).map(_ * 2).sum)
      // quiet restart: zero input, zero commits (no re-delivery)
      val t = new LakeCatalog(ext, wh).table("s", "sink")
      val vBefore = t.currentVersion
      run()
      assert(t.currentVersion == vBefore,
        "a no-data restart must not commit")
      // the replay guard is the engine's own high-water contract:
      // re-committing an already-seen epoch id is a metadata no-op
      val before = t.read().count()
      t.appendExactlyOnce((900L until 950L).toSeq.toDF("id")
        .withColumn("v", lit(0.0)), t.highWaterMarks.keys
          .find(_.startsWith("writer."))
          .map(_.stripPrefix("writer.")).get, 0L)
      assert(t.read().count() == before, "epoch 0 replay landed twice")
    }
  }

  test("writeStream.toTable (complete mode): each epoch OVERWRITES — " +
    "the table converges to the aggregate, idempotently") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS gsw.s")
      ext.sql("DROP TABLE IF EXISTS gsw.s.agg")
      ext.sql("CREATE TABLE gsw.s.agg (grp STRING, n BIGINT)")
      implicit val sqlCtx = ext.sqlContext
      import ext.implicits._
      val mem = MemoryStream[Long]
      val ckpt = tmpDir("gsw-agg-ckpt")
      def run(): Unit = {
        val q = mem.toDF()
          .select(when(col("value") % 2 === 0, "even")
            .otherwise("odd").as("grp"))
          .groupBy("grp").agg(count(lit(1)).as("n"))
          .writeStream.outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .toTable("gsw.s.agg")
        q.awaitTermination()
      }
      mem.addData(0L until 10L: _*)
      run()
      def state = ext.sql("SELECT grp, n FROM gsw.s.agg ORDER BY grp")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(state == Seq(("even", 5L), ("odd", 5L)))
      // another epoch: the table is REPLACED, not appended
      mem.addData(10L until 16L: _*)
      run()
      assert(state == Seq(("even", 8L), ("odd", 8L)))
    }
  }

  test("writeStream.toTable lands hidden-partitioned layout: derived " +
    "partition columns are the writer's job, invisible to the stream") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS gsw.s")
      ext.sql("DROP TABLE IF EXISTS gsw.s.part")
      ext.sql(
        """CREATE TABLE gsw.s.part (id BIGINT, region STRING)
          |PARTITIONED BY (region, bucket(4, id))""".stripMargin)
      implicit val sqlCtx = ext.sqlContext
      import ext.implicits._
      val mem = MemoryStream[Long]
      mem.addData(0L until 40L: _*)
      val q = mem.toDF().select(col("value").as("id"),
          when(col("value") % 2 === 0, "eu").otherwise("us")
            .as("region"))
        .writeStream
        .option("checkpointLocation", tmpDir("gsw-part-ckpt"))
        .trigger(Trigger.AvailableNow())
        .toTable("gsw.s.part")
      q.awaitTermination()
      assert(ext.sql(
        "SELECT count(*) FROM gsw.s.part WHERE region = 'eu'")
        .head.getLong(0) == 20)
      // the files carry real partition dirs (manifest-prunable layout)
      val t = new LakeCatalog(ext, wh).table("s", "part")
      assert(t.dataFiles.nonEmpty &&
        t.dataFiles.forall(_.path.contains("region=")),
        t.dataFiles.map(_.path).take(3).mkString(", "))
      // column-order robustness: a reordered projection aligns by name
      val mem2 = MemoryStream[Long]
      mem2.addData(100L, 101L)
      val q2 = mem2.toDF().select(lit("apac").as("region"),
          col("value").as("id"))
        .writeStream
        .option("checkpointLocation", tmpDir("gsw-part2-ckpt"))
        .trigger(Trigger.AvailableNow())
        .toTable("gsw.s.part")
      q2.awaitTermination()
      assert(ext.sql(
        "SELECT CAST(sum(id) AS BIGINT) FROM gsw.s.part " +
          "WHERE region = 'apac'").head.getLong(0) == 201L)
    }
  }

  test("without the extensions strategy the write fails with an " +
    "install instruction, never a wrong result") {
    // the shared conf-only session: catalog installed, strategy absent
    // (earlier suites may have installed the live-session strategies —
    // clear them for the duration, restore after)
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    try runNoExtensions()
    finally spark.experimental.extraStrategies = saved
  }

  private def runNoExtensions(): Unit = {
    spark.conf.set("spark.sql.catalog.gswc", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gswc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gswc.s")
    spark.sql("DROP TABLE IF EXISTS gswc.s.plain")
    spark.sql("CREATE TABLE gswc.s.plain (id BIGINT)")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Long]
    mem.addData(1L, 2L)
    val ex = intercept[Exception] {
      val q = mem.toDF().select(col("value").as("id"))
        .writeStream
        .option("checkpointLocation", tmpDir("gswc-ckpt"))
        .trigger(Trigger.AvailableNow())
        .toTable("gswc.s.plain")
      q.awaitTermination()
    }
    val m = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(m.contains("GraftExtensions"), m.take(500))
    assert(spark.sql("SELECT count(*) FROM gswc.s.plain")
      .head.getLong(0) == 0)
  }
}
