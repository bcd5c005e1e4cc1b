package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.lake.LakeTable

object LakeLogSourceSpec {
  // shared across foreachBatch invocations (driver-side in local mode)
  val seen = new ConcurrentLinkedQueue[Int]()
}

class LakeLogSourceSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  test("batch read of the commit log by short name") {
    val t = LakeTable.create(spark, tmpDir("log-batch"), schema)
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    t.appendExactlyOnce(Seq((3L, 3.0)).toDF("id", "v"), batchId = 7)
    val log = spark.read.format("graft-lake-log").load(t.root)
      .orderBy("version")
    val got = log.select($"version", $"total_rows", $"batch_id")
      .as[(Int, Long, Option[String])].collect().toSeq
    assert(got == Seq((0, 0L, None), (1, 2L, None), (2, 3L, Some("7"))))
  }

  test("CDC flow: commit-log stream triggers incremental pipe steps") {
    import graft.lake.IncrementalPipe
    val src = LakeTable.create(spark, tmpDir("cdc-src"), schema)
    val dst = LakeTable.create(spark, tmpDir("cdc-dst"), StructType(Seq(
      StructField("id", LongType), StructField("v2", DoubleType))))
    val ckpt = tmpDir("cdc-ckpt")

    def drain(): Unit = {
      // each commit event wakes the pipe, which consumes the data delta
      val sink: (Dataset[Row], Long) => Unit = (batch, _) =>
        if (!batch.isEmpty) {
          IncrementalPipe.step(src, dst,
            df => df.selectExpr("id", "v * 2 AS v2"))
          ()
        }
      val q = spark.readStream.format("graft-lake-log").load(src.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    src.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    drain()
    assert(dst.read().count() == 2)
    src.append(Seq((3L, 3.0)).toDF("id", "v"))
    drain()
    drain() // extra drain with no new commits must change nothing
    assert(dst.read().count() == 3)
    assert(dst.read().selectExpr("sum(v2)").as[Double].head() == 12.0)
  }

  test("micro-batch stream delivers each commit exactly once across runs") {
    val t = LakeTable.create(spark, tmpDir("log-stream"), schema)
    val ckpt = tmpDir("log-ckpt")
    LakeLogSourceSpec.seen.clear()

    def runOnce(): Unit = {
      val sink: (Dataset[Row], Long) => Unit = (batch, _) =>
        batch.select("version").collect()
          .foreach(r => LakeLogSourceSpec.seen.add(r.getInt(0)))
      val q = spark.readStream.format("graft-lake-log").load(t.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    t.append(Seq((1L, 1.0)).toDF("id", "v"))
    runOnce()
    assert(LakeLogSourceSpec.seen.toArray(Array.empty[Integer]).toSeq
      .map(_.toInt).sorted == Seq(0, 1))

    t.append(Seq((2L, 2.0)).toDF("id", "v"))
    t.append(Seq((3L, 3.0)).toDF("id", "v"))
    runOnce() // restart from checkpoint: only versions 2 and 3 arrive
    assert(LakeLogSourceSpec.seen.toArray(Array.empty[Integer]).toSeq
      .map(_.toInt).sorted == Seq(0, 1, 2, 3))
  }

  test("admission offset math saturates for maxRows near Long.MaxValue") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val t = LakeTable.create(spark, tmpDir("log-sat"), schema)
    t.append(Seq((1L, 1.0)).toDF("id", "v")) // versions 0, 1 exist
    val stream = new LakeLogMicroBatchStream(t.root, Some(Long.MaxValue))
    // regression: from + maxRows used to wrap negative and regress the
    // offset behind start; it must clamp to the current target version
    val next = stream.latestOffset(LakeLogOffset(1), ReadLimit.maxRows(Long.MaxValue))
    assert(next == LakeLogOffset(1))
    val fromZero = stream.latestOffset(LakeLogOffset(0), ReadLimit.maxRows(Long.MaxValue))
    assert(fromZero == LakeLogOffset(1))
  }

  test("maxRowsPerBatch paces admission without dropping commits") {
    val t = LakeTable.create(spark, tmpDir("log-paced"), schema)
    (1 to 5).foreach(i => t.append(Seq((i.toLong, i.toDouble)).toDF("id", "v")))
    // versions 0..5 committed (create + 5 appends) = 6 log rows

    val batchSizes = new ConcurrentLinkedQueue[Long]()
    val sink: (Dataset[Row], Long) => Unit = (batch, _) => {
      batchSizes.add(batch.count()); ()
    }
    val q = spark.readStream.format("graft-lake-log")
      .option("maxRowsPerBatch", 2)
      .load(t.root)
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", tmpDir("log-paced-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).toSeq
      .map(_.toLong).filter(_ > 0)
    assert(sizes.sum == 6, s"all commits delivered, got $sizes")
    assert(sizes.forall(_ <= 2), s"each batch capped at maxRows, got $sizes")
    assert(sizes.size >= 3, s"pacing split delivery across batches, got $sizes")
  }
}
