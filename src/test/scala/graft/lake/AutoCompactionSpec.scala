package graft.lake

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Property-driven auto-compaction (VERDICT r04 item 6): per-batch
  * commits must not let the live-file count grow without bound, and
  * compaction must never change what a reader sees. */
class AutoCompactionSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("threshold compaction bounds live files across many tiny " +
    "appends; content and exactly-once marks survive") {
    val t = LakeTable.create(spark, tmpDir("autocompact"), schema,
      properties = Map("compaction.auto.maxFiles" -> "6",
        "compaction.auto.target" -> "2",
        "compaction.auto.sortBy" -> "id"))
    (0 until 24).foreach { i =>
      t.appendExactlyOnce(
        Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), "w", i.toLong)
      t.autoCompactIfNeeded()
      assert(t.dataFiles.size <= 7, // target..maxFiles + the fresh append
        s"unbounded growth at batch $i: ${t.dataFiles.size}")
    }
    assert(t.read().select("id").as[Long].collect().toSet ==
      (0L until 24L).toSet)
    // sorted policy: after the last compaction files cover disjoint
    // id ranges (the data-skipping layout), and the exactly-once
    // frontier survived every rewrite
    assert(t.lastBatchId("w") == 23L)
    val replayV = t.currentVersion
    t.appendExactlyOnce(Seq((99L, "dup")).toDF("id", "v"), "w", 5L)
    assert(t.currentVersion == replayV && t.read().count() == 24)
  }

  test("bucketed table compacts to one file per bucket dir") {
    val t = LakeTable.create(spark, tmpDir("autocompact-bkt"), StructType(
      Seq(StructField("fp", StringType), StructField("doc_id", LongType))),
      properties = Map("compaction.auto.maxFiles" -> "8"),
      bucketBy = Some(("fp", 4)))
    (0 until 12).foreach { i =>
      t.append(Seq((s"fp-$i", i.toLong)).toDF("fp", "doc_id").coalesce(1))
      t.autoCompactIfNeeded()
    }
    assert(t.dataFiles.size <= 9)
    t.compact(1) // explicit compact: bucket-clustered rewrite
    // one file per non-empty bucket dir, never numFiles x buckets
    val dirs = t.dataFiles.map(_.path.replaceAll("/[^/]+$", ""))
    assert(dirs.distinct.size == dirs.size, "multiple files in a bucket dir")
    // layout still probes correctly after compaction
    assert(t.probe("fp", Seq("fp-3")).select("doc_id").as[Long]
      .collect().toSeq == Seq(3L))
    assert(t.read().count() == 12)
  }

  test("streaming MV with a declared policy keeps the sink bounded " +
    "and exact (the commit-loop wiring)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val table = LakeTable.create(spark, tmpDir("mv-autocompact"), schema,
      properties = Map("compaction.auto.maxFiles" -> "5",
        "compaction.auto.target" -> "1"))
    val mgr = new graft.streaming.MVManager(spark, tmpDir("mv-ac-ckpt"))
    val q = mgr.startToLake("ac_mv", input.toDF().toDF("id", "v"), table,
      Trigger.ProcessingTime("50 milliseconds"))
    (0 until 20).foreach { i =>
      input.addData((i.toLong, s"v$i"))
      q.processAllAvailable()
    }
    q.stop()
    assert(table.dataFiles.size <= 6,
      s"sink grew to ${table.dataFiles.size} files")
    assert(table.read().select("id").as[Long].collect().toSet ==
      (0L until 20L).toSet)
  }
}
