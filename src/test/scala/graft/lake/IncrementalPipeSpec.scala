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
