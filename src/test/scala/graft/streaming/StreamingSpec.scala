package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.lake.LakeTable

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("MemoryStream MV commits exactly-once into LakeTable across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val stream = input.toDF().toDF("id", "kind", "v")

    val table = LakeTable.create(spark, tmpDir("mv-lake"), StructType(Seq(
      StructField("id", LongType), StructField("kind", StringType),
      StructField("v", DoubleType))))
    val mgr = new MVManager(spark, tmpDir("mv-ckpt"))
    val q = mgr.startToLake("mv_test", stream, table,
      Trigger.ProcessingTime("50 milliseconds"))

    input.addData((1L, "a", 1.0), (2L, "b", 2.0))
    q.processAllAvailable()
    assert(table.read().count() == 2)

    input.addData((3L, "a", 3.0))
    q.processAllAvailable()
    assert(table.read().count() == 3)

    // replaying an already-committed batch id UNDER THE QUERY'S OWN
    // writer identity must be a no-op...
    val v = table.currentVersion
    table.appendExactlyOnce(
      Seq((9L, "dup", 9.0)).toDF("id", "kind", "v"), q.id.toString, 0L)
    assert(table.currentVersion == v && table.read().count() == 3)
    // ...while a different writer's batch 0 is an independent sequence
    table.appendExactlyOnce(
      Seq((10L, "other", 1.0)).toDF("id", "kind", "v"), "other-query", 0L)
    assert(table.read().count() == 4)

    q.stop()
    // listener delivery is async; poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (!mgr.metrics("mv_test").exists(_.inputRows >= 3) &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(mgr.metrics("mv_test").exists(_.inputRows >= 3))
  }

  test("incrementally-maintained aggregate MV: table state converges " +
    "to the exact batch aggregate after EVERY micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val agg = input.toDF().toDF("k", "v")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
    val table = LakeTable.create(spark, tmpDir("agg-mv"), StructType(Seq(
      StructField("k", StringType), StructField("n", LongType),
      StructField("sum_v", DoubleType))))
    val mgr = new MVManager(spark, tmpDir("agg-mv-ckpt"))
    val q = mgr.startAggregateToLake("agg", agg, table, Seq("k"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))

    var fed = Seq.empty[(String, Double)]
    def check(): Unit = {
      val got = table.read().select("k", "n", "sum_v")
        .as[(String, Long, Double)].collect().toSet
      val want = fed.groupBy(_._1).map { case (k, rows) =>
        (k, rows.size.toLong, rows.map(_._2).sum) }.toSet
      assert(got == want, s"diverged after ${fed.size} rows")
    }
    for (batch <- Seq(
      Seq(("a", 1.0), ("b", 2.0)),
      Seq(("a", 3.0)),              // only 'a' changes: merge, not append
      Seq(("c", 5.0), ("b", 1.5)))) {
      input.addData(batch: _*)
      q.processAllAvailable()
      fed ++= batch
      check()
    }
    // the table holds ONE row per key (merged in place), not history
    assert(table.read().count() == 3)
    q.stop()
  }

  test("aggregate MV restarted from its checkpoint resumes the state " +
    "store and keeps converging (no double counts, no resets)") {
    val srcDir = tmpDir("aggr-src")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val ckpt = tmpDir("aggr-ckpt")
    val table = LakeTable.create(spark, tmpDir("aggr-mv"), StructType(Seq(
      StructField("k", StringType), StructField("n", LongType),
      StructField("sum_v", DoubleType))))
    val mgr = new MVManager(spark, ckpt)
    def runOnce(): Unit = {
      val agg = spark.readStream
        .schema(StructType(Seq(StructField("k", StringType),
          StructField("v", DoubleType))))
        .parquet(srcDir)
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      mgr.startAggregateToLake("aggr", agg, table, Seq("k"),
        Trigger.AvailableNow()).awaitTermination()
    }
    Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(table.read().filter($"k" === "a")
      .select("n", "sum_v").as[(Long, Double)].head() == ((1L, 1.0)))

    // stop (AvailableNow drained), add MORE rows for existing AND new
    // keys, restart from the SAME checkpoint: counts must continue
    // from restored state, not reset or double
    Seq(("a", 10.0), ("c", 5.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val got = table.read().select("k", "n", "sum_v")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 2L, 11.0), ("b", 1L, 2.0), ("c", 1L, 5.0)))

    // replaying the restart with nothing new changes nothing
    val v = table.currentVersion
    runOnce()
    assert(table.currentVersion == v)
    assert(table.read().count() == 3)
  }

  test("Arrow-batch publish: losing a rename race to a NON-EMPTY winner is benign") {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(tmpDir("arrow-race"))
    Files.createDirectories(root)
    // the winner already published batch-0 with real content
    val target = root.resolve("batch-0")
    Files.createDirectories(target)
    Files.writeString(target.resolve("data.arrow"), "winner")
    // our replay finished writing its own staging copy
    val staging = root.resolve(".staging-batch-0-x")
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("data.arrow"), "loser")
    // regression: rename onto a non-empty dir raises ENOTEMPTY
    // (DirectoryNotEmptyException), not FileAlreadyExists; the catch
    // must still treat it as "winner exists", clean staging, keep winner
    MVManager.publishStaging(staging, target)
    assert(!Files.exists(staging), "staging dir cleaned up")
    assert(Files.readString(target.resolve("data.arrow")) == "winner")

    // a genuine failure (no winner present) must still propagate
    val badStaging = root.resolve(".staging-batch-1-x")
    Files.createDirectories(badStaging)
    val badTarget = root.resolve("no-such-parent").resolve("batch-1")
    intercept[java.nio.file.FileSystemException] {
      MVManager.publishStaging(badStaging, badTarget)
    }
    assert(Files.exists(badStaging), "staging preserved on real failure")
  }

  test("restart from checkpoint: no duplicates, no loss (SURVEY §5.4)") {
    val srcDir = tmpDir("restart-src")
    val ckpt = tmpDir("restart-ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val table = LakeTable.create(spark, tmpDir("restart-lake"), StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType))))

    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("id", LongType),
          StructField("v", DoubleType))))
        .parquet(srcDir)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) => {
          table.appendExactlyOnce(b, id); ()
        })
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeBatch(0 until 10)
    runOnce() // first incarnation
    assert(table.read().count() == 10)
    writeBatch(10 until 25)
    runOnce() // "restarted" query, same checkpoint: only new files read
    val got = table.read()
    assert(got.count() == 25)
    assert(got.select("id").distinct().count() == 25) // no dup, no loss
  }

  test("windowed aggregation with watermark over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("ts", "kind")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"kind")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_test").start()
    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "a"))
    q.processAllAvailable()
    val got = spark.table("win_test")
      .select(date_format($"window.start", "HH:mm").as("h"), $"n")
      .as[(String, Long)].collect().toMap
    q.stop()
    assert(got == Map("10:00" -> 2L, "11:00" -> 1L))
  }

  test("corpus hygiene composes with streaming: PII-redacting MV " +
    "commits clean text exactly-once into the lake") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // redactPii is a stateless projection, so it lifts to a streaming
    // DataFrame unchanged — the ingest-time scrubbing shape a training
    // pipeline wants (raw PII never reaches storage)
    val clean = graft.operators.CorpusOps.redactPii(
      input.toDF().toDF("doc_id", "text"))

    val table = LakeTable.create(spark, tmpDir("pii-lake"), clean.schema)
    val mgr = new MVManager(spark, tmpDir("pii-ckpt"))
    val q = mgr.startToLake("pii_mv", clean,
      table, Trigger.ProcessingTime("50 milliseconds"))
    input.addData(
      (1L, "write to alice@example.com today"),
      (2L, "server 10.1.2.3 dialed 555-123-4567"))
    q.processAllAvailable()
    q.stop()
    val got = table.read().orderBy("doc_id")
      .select("clean_text", "n_emails", "n_phones", "n_ips")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("write to <EMAIL> today", 1L, 0L, 0L),
      ("server <IP> dialed <PHONE>", 0L, 1L, 1L)))
  }
}
