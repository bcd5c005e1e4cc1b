package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.functions._

import graft.SparkSuite

class ArrowSinkSpec extends SparkSuite {
  import spark.implicits._

  private def readAll(dir: String): Seq[Map[String, Any]] = {
    val files = Files.list(Paths.get(dir)).iterator().asScala.toList
      .filter(_.toString.endsWith(".arrow")).sortBy(_.toString)
    files.flatMap { f =>
      val alloc = new RootAllocator()
      val ch = Files.newByteChannel(f)
      val reader = new ArrowFileReader(ch.asInstanceOf[java.nio.channels.SeekableByteChannel], alloc)
      try {
        val root = reader.getVectorSchemaRoot
        val out = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]
        while (reader.loadNextBatch()) {
          (0 until root.getRowCount).foreach { i =>
            out += root.getFieldVectors.asScala.map { v =>
              v.getName -> (if (v.isNull(i)) null else v.getObject(i))
            }.toMap
          }
        }
        out.toSeq
      } finally { reader.close(); alloc.close() }
    }
  }

  test("mixed-type roundtrip through Arrow IPC files") {
    val dir = tmpDir("arrow-sink")
    val df = Seq(
      (1L, "alpha", 1.5, 10, true),
      (2L, "beta", 2.5, 20, false),
      (3L, null.asInstanceOf[String], 3.5, 30, true)
    ).toDF("id", "name", "score", "n", "flag")
      .withColumn("b", col("id").cast("byte"))
      .withColumn("s", col("id").cast("short"))
      .withColumn("f", col("score").cast("float"))
      .withColumn("bin", encode(coalesce(col("name"), lit("x")), "UTF-8"))
      .withColumn("ts", to_timestamp(lit("2026-01-02 03:04:05.123456")))
    val written = ArrowSink.write(df.repartition(2), dir)
    assert(written.nonEmpty && written.forall(_.endsWith(".arrow")))

    val rows = readAll(dir)
    assert(rows.size == 3)
    val byId = rows.map(r => r("id").asInstanceOf[Long] -> r).toMap
    assert(byId(1L)("name").toString == "alpha")
    assert(byId(3L)("name") == null)
    assert(byId(2L)("score") == 2.5)
    assert(byId(2L)("n") == 20)
    assert(byId(1L)("flag") == true)
    assert(byId(1L)("b") == 1.toByte && byId(1L)("s") == 1.toShort)
    assert(byId(1L)("f") == 1.5f)
    assert(new String(byId(2L)("bin").asInstanceOf[Array[Byte]], "UTF-8")
      == "beta")
    // micros precision survives (vector stores epoch micros UTC)
    val expectedMicros = java.time.LocalDateTime
      .parse("2026-01-02T03:04:05.123456")
      .toInstant(java.time.ZoneOffset.UTC)
    assert(byId(1L)("ts") ==
      expectedMicros.getEpochSecond * 1000000L +
        expectedMicros.getNano / 1000L)
  }

  test("one file per non-empty partition; chunked record batches") {
    val dir = tmpDir("arrow-parts")
    val df = spark.range(10000).toDF("id")
    val written = ArrowSink.write(df.repartition(4), dir, batchRows = 1000)
    assert(written.size == 4)
    val rows = readAll(dir)
    assert(rows.size == 10000)
    assert(rows.map(_("id").asInstanceOf[Long]).toSet == (0L until 10000L).toSet)
  }

  test("unsupported type fails at plan time, before writing anything") {
    val dir = tmpDir("arrow-reject")
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    intercept[IllegalArgumentException] { ArrowSink.write(df, dir) }
    // rejected on the driver before the output dir even exists
    assert(!Files.exists(Paths.get(dir)))
  }

  test("streaming export: foreachBatch writes per-batch Arrow dirs " +
    "(the reference's ingest contract)") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("arrow-stream")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", tmpDir("arrow-stream-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ArrowSink.write(batch, s"$base/batch-$id"); ()
      }
      .start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val dirs = Files.list(Paths.get(base)).iterator().asScala.toList
    assert(dirs.size == 2)
    assert(dirs.map(d => readAll(d.toString).size).sum == 3)
  }
}
