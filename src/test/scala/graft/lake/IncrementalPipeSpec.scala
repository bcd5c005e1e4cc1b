package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

class IncrementalPipeSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  test("pipe consumes each source snapshot exactly once") {
    val src = LakeTable.create(spark, tmpDir("pipe-src"), schema)
    val dst = LakeTable.create(spark, tmpDir("pipe-dst"), StructType(Seq(
      StructField("id", LongType), StructField("v2", DoubleType))))
    def xf(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", ($"v" * 2).as("v2"))

    src.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    assert(IncrementalPipe.step(src, dst, xf) == 1)
    assert(dst.read().count() == 2)

    // no new source data -> step is a no-op (no empty snapshots)
    val v = dst.currentVersion
    assert(IncrementalPipe.step(src, dst, xf) == 1)
    assert(dst.currentVersion == v)

    // two more source commits -> one delta covering both
    src.append(Seq((3L, 3.0)).toDF("id", "v"))
    src.append(Seq((4L, 4.0)).toDF("id", "v"))
    assert(IncrementalPipe.step(src, dst, xf) == 3)
    assert(dst.read().agg(sum("v2")).as[Double].head() == 20.0)
    assert(dst.read().select("id").distinct().count() == 4)
  }

  test("pipe offset survives interleaved sink commits (no re-append)") {
    val src = LakeTable.create(spark, tmpDir("pipe2-src"), schema)
    val dst = LakeTable.create(spark, tmpDir("pipe2-dst"), schema)
    src.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    assert(IncrementalPipe.step(src, dst, identity) == 1)
    assert(dst.read().count() == 2)
    // interleaved commits that do NOT carry the pipe offset in appMeta:
    // a plain append, an exactly-once append, and a compaction
    dst.append(Seq((100L, 100.0)).toDF("id", "v"))
    dst.appendExactlyOnce(Seq((101L, 101.0)).toDF("id", "v"), 0L)
    dst.compact(numFiles = 1)
    // next step must see the carried-forward offset and be a NO-OP —
    // not re-append the whole source (the silent-duplicate bug)
    val v = dst.currentVersion
    assert(IncrementalPipe.step(src, dst, identity) == 1)
    assert(dst.currentVersion == v)
    assert(dst.read().count() == 4)
    // new source data still flows
    src.append(Seq((3L, 3.0)).toDF("id", "v"))
    assert(IncrementalPipe.step(src, dst, identity) == 2)
    assert(dst.read().count() == 5)
    // and two pipes into one sink keep independent offsets
    val src2 = LakeTable.create(spark, tmpDir("pipe2-src2"), schema)
    src2.append(Seq((9L, 9.0)).toDF("id", "v"))
    assert(IncrementalPipe.step(src2, dst, identity, pipeId = "p2") == 1)
    assert(IncrementalPipe.consumedVersion(dst) == 2)
    assert(IncrementalPipe.consumedVersion(dst, "p2") == 1)
    assert(dst.read().count() == 6)
  }

  test("changesSince reads only the delta, full read sees everything") {
    val t = LakeTable.create(spark, tmpDir("delta"), schema)
    t.append(Seq((1L, 1.0)).toDF("id", "v"))
    val v1 = t.currentVersion
    t.append(Seq((2L, 2.0), (3L, 3.0)).toDF("id", "v"))
    assert(t.changesSince(v1).select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 3L))
    assert(t.changesSince(-1).count() == 3)
    assert(t.changesSince(t.currentVersion).count() == 0)
  }
}
