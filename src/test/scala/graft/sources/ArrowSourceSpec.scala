package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** graft-arrow DSv2 source: the read half of ArrowSink. */
class ArrowSourceSpec extends SparkSuite {
  import spark.implicits._

  test("sink -> source roundtrip preserves every supported type + nulls") {
    val dir = tmpDir("arrow-rt")
    val df = Seq(
      (1L, "alpha", 1.5, 10, true),
      (2L, "beta", 2.5, 20, false),
      (3L, null.asInstanceOf[String], 3.5, 30, true)
    ).toDF("id", "name", "score", "n", "flag")
      .withColumn("b", col("id").cast("byte"))
      .withColumn("s", col("id").cast("short"))
      .withColumn("f", col("score").cast("float"))
      .withColumn("bin", encode(coalesce(col("name"), lit("x")), "UTF-8"))
      .withColumn("d", to_date(lit("2026-03-04")))
      .withColumn("ts", to_timestamp(lit("2026-01-02 03:04:05.123456")))
    ArrowSink.write(df.repartition(2), dir)

    val back = spark.read.format("graft-arrow").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val got = back.orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(got.length == 3)
    got.zip(want).foreach { case (g, w) =>
      assert(g.toSeq.zip(w.toSeq).forall {
        case (a: Array[Byte], b: Array[Byte]) => a.sameElements(b)
        case (a, b) => a == b
      }, s"row mismatch: $g vs $w")
    }
    assert(got(2).isNullAt(got(2).fieldIndex("name")))
  }

  test("one partition per file; MV batch-dir trees read recursively; " +
    "staging dirs ignored") {
    val dir = tmpDir("arrow-tree")
    ArrowSink.write(spark.range(100).toDF("id"), s"$dir/batch-0")
    ArrowSink.write(spark.range(100, 250).toDF("id"), s"$dir/batch-1")
    // an in-flight staging dir must be invisible to readers
    ArrowSink.write(spark.range(9000, 9010).toDF("id"),
      s"$dir/.staging-batch-2-x")
    val back = spark.read.format("graft-arrow").load(dir)
    assert(back.rdd.getNumPartitions ==
      ArrowSource.listFiles(dir).size)
    assert(back.count() == 250)
    assert(back.agg(sum("id")).as[Long].head() == (0L until 250L).sum)
  }

  test("aggregation pushdown shape: source feeds ordinary Spark plans") {
    val dir = tmpDir("arrow-agg")
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "k", "v")
    ArrowSink.write(df, dir)
    val agg = spark.read.format("graft-arrow").load(dir)
      .groupBy("k").agg(sum("v").as("sv"))
      .as[(String, Double)].collect().toMap
    assert(agg == Map("a" -> 4.0, "b" -> 2.0))
  }

  test("column pruning reaches the scan (only projected vectors decoded)") {
    val dir = tmpDir("arrow-prune")
    ArrowSink.write(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("id", "k", "v"), dir)
    val df = spark.read.format("graft-arrow").load(dir).select("k")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("k"),
      "projection must prune the scan schema")
    assert(df.as[String].collect().sorted.toSeq == Seq("a", "b"))
    // zero-column scans (count(*)) also work
    assert(spark.read.format("graft-arrow").load(dir).count() == 2)
  }

  test("streaming ingestion of a batch-dir tree: exactly-once, gap-safe") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("arrow-stream-in")
    ArrowSink.write(spark.range(0, 10).toDF("id"), s"$dir/batch-0")
    ArrowSink.write(spark.range(10, 30).toDF("id"), s"$dir/batch-1")
    val ckpt = tmpDir("arrow-stream-in-ckpt")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    def drain(): Unit = {
      val q = spark.readStream.format("graft-arrow").load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => seen.add(r.getLong(0))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    drain()
    assert(seen.size == 30)
    // batch-3 exists but batch-2 does not: the gap gates visibility
    // (a racing writer's rename hasn't landed yet)
    ArrowSink.write(spark.range(90, 95).toDF("id"), s"$dir/batch-3")
    drain()
    assert(seen.size == 30, "a gapped batch must stay invisible")
    // the gap closes: both batches arrive, each exactly once
    ArrowSink.write(spark.range(30, 40).toDF("id"), s"$dir/batch-2")
    drain()
    assert(seen.size == 45)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet ==
      ((0L until 40L) ++ (90L until 95L)).toSet)
  }

  test("schema mismatch between files fails loudly, empty dir explains") {
    val dir = tmpDir("arrow-mismatch")
    ArrowSink.write(Seq((1L, "x")).toDF("id", "v"), dir)
    ArrowSink.write(Seq((2L, 3.0)).toDF("id", "v"), dir) // v: double now
    val ex = intercept[Exception] {
      spark.read.format("graft-arrow").load(dir).collect()
    }
    assert(ex.getMessage != null)

    val empty = tmpDir("arrow-empty")
    Files.createDirectories(Paths.get(empty))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-arrow").load(empty).collect()
    }
    assert(e2.getMessage.contains("no .arrow files"))
    // explicit schema unblocks the empty-dir read
    val viaSchema = spark.read.format("graft-arrow")
      .schema(StructType(Seq(StructField("id", LongType))))
      .load(empty)
    assert(viaSchema.count() == 0)
  }
}
