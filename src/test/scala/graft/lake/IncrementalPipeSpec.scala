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

  test("incremental corpus-hygiene pipeline: raw docs -> redact + " +
    "quality-gate -> clean table, exactly-once per delta") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val rawSchema = StructType(Seq(
      StructField("doc_id", org.apache.spark.sql.types.LongType),
      StructField("text", StringType)))
    val raw = LakeTable.create(spark, tmpDir("hyg-raw"), rawSchema)
    val clean = LakeTable.create(spark, tmpDir("hyg-clean"), StructType(Seq(
      StructField("doc_id", org.apache.spark.sql.types.LongType),
      StructField("clean_text", StringType),
      StructField("n_emails", org.apache.spark.sql.types.LongType),
      StructField("n_phones", org.apache.spark.sql.types.LongType),
      StructField("n_ips", org.apache.spark.sql.types.LongType))))
    // the hygiene transform: scrub PII, then drop empty/short docs —
    // stateless ops compose into one incremental step
    val hygiene: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => graft.operators.CorpusOps.redactPii(df)
        .filter(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("clean_text")) >= 10)

    raw.append(Seq(
      (1L, "reach me at a@b.io for details"),
      (2L, "short")).toDF("doc_id", "text"))
    IncrementalPipe.step(raw, clean, hygiene, pipeId = "hygiene")
    assert(clean.read().count() == 1) // short doc gated out
    assert(clean.read().select("clean_text").as[String].head()
      == "reach me at <EMAIL> for details")

    raw.append(Seq((3L, "call 555-000-1111 tonight")).toDF("doc_id", "text"))
    IncrementalPipe.step(raw, clean, hygiene, pipeId = "hygiene")
    IncrementalPipe.step(raw, clean, hygiene, pipeId = "hygiene") // no-op
    assert(clean.read().count() == 2)
    assert(clean.read().agg(org.apache.spark.sql.functions.sum("n_phones"))
      .as[Long].head() == 1L)
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

  test("changesBetween skips compaction-carried files: the delta stays " +
    "O(new rows), not O(table)") {
    val t = LakeTable.create(spark, tmpDir("delta-compact"), schema)
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val v0 = t.currentVersion
    t.append(Seq((3L, 3.0)).toDF("id", "v"))
    t.compact(numFiles = 1) // rewrites rows 1-3 into one file, adds none
    t.append(Seq((4L, 4.0)).toDF("id", "v"))
    val delta = t.changesBetween(v0, t.currentVersion)
    // set-difference semantics would re-present the compacted file and
    // return {1,2,3,4}; the per-version walk must return exactly {3,4}
    assert(delta.select("id").as[Long].collect().sorted.toSeq
      == Seq(3L, 4L))
    // a row-level rewrite in the range makes attribution ambiguous:
    // fall back to the re-emitting superset, never lose a new row
    val t2 = LakeTable.create(spark, tmpDir("delta-del"), schema)
    t2.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val w0 = t2.currentVersion
    t2.append(Seq((3L, 3.0)).toDF("id", "v"))
    t2.deleteWhere($"id" === 2L)
    val got = t2.changesBetween(w0, t2.currentVersion)
      .select("id").as[Long].collect().toSet
    assert(got.contains(3L) && !got.contains(2L))
  }

  test("an incremental read from an EXPIRED snapshot fails with the " +
    "retention contract, not a raw missing-file error") {
    val t = LakeTable.create(spark, tmpDir("delta-expired"), schema)
    (1 to 5).foreach(i => t.append(Seq((i.toLong, 1.0)).toDF("id", "v")))
    t.expireSnapshots(keepLast = 2)
    val ex = intercept[IllegalStateException](t.changesSince(0))
    assert(ex.getMessage.contains("expired") &&
      ex.getMessage.contains("retention"), ex.getMessage)
  }
}
