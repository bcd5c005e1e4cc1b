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

  test("dataCommitCount advances only on data commits, never on " +
    "compaction's own (the waitable batch frontier)") {
    val t = LakeTable.create(spark, tmpDir("data-commits"), schema,
      properties = Map("compaction.auto.maxFiles" -> "4",
        "compaction.auto.target" -> "2"))
    assert(t.dataCommitCount == 1) // the creation commit
    var compactions = 0
    (0 until 12).foreach { i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
      if (t.autoCompactIfNeeded().isDefined) compactions += 1
    }
    assert(compactions > 0, "policy never engaged — gate mis-sized")
    // raw versions advanced on every rewrite too; the data frontier
    // counts exactly creation + the 12 appends
    assert(t.currentVersion == 12 + compactions)
    assert(t.dataCommitCount == 13)
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

  test("chaos: concurrent writers + auto-compaction on a bucketed " +
    "table lose nothing and keep the layout invariant") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = LakeTable.create(spark, tmpDir("chaos-bkt"), StructType(Seq(
      StructField("fp", StringType), StructField("doc_id", LongType))),
      properties = Map("compaction.auto.maxFiles" -> "10"),
      bucketBy = Some(("fp", 4)))
    val writers = (0 until 4).map { w =>
      Future {
        (0 until 5).foreach { i =>
          val base = (w * 100 + i * 10).toLong
          t.append((base until base + 10)
            .map(id => (s"fp-$id", id)).toDF("fp", "doc_id").coalesce(1))
          // every writer enforces the shared policy; racing enforcers
          // must never duplicate rows (strict-replace compactions —
          // losers observe the winner and no-op)
          t.autoCompactIfNeeded()
        }
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    // nothing lost, nothing duplicated
    assert(t.read().select("doc_id").as[Long].collect().sorted.toSeq ==
      (0 until 4).flatMap(w => (0 until 5).flatMap(i =>
        (w * 100 + i * 10).toLong until (w * 100 + i * 10 + 10).toLong))
        .sorted)
    // layout invariant holds for every surviving file (new tables
    // stamp Spark's own bucket hash — see LakeTable.SparkBucketHash)
    assert(t.read().filter(col("_bucket") =!=
      pmod(hash(col("fp")), lit(4)).cast("int")).count() == 0)
    // and probes still route correctly
    assert(t.probe("fp", Seq("fp-105")).select("doc_id").as[Long]
      .collect().toSeq == Seq(105L))
  }

  test("snapshots.auto.keepLast bounds DISK under the policy: " +
    "expired history reclaimed, content + exactly-once marks intact") {
    import LakeTable.walkDir
    val t = LakeTable.create(spark, tmpDir("auto-expire"), schema,
      properties = Map("compaction.auto.maxFiles" -> "4",
        "compaction.auto.target" -> "1",
        "snapshots.auto.keepLast" -> "3",
        "vacuum.auto.minAgeMs" -> "0")) // test-only: reclaim immediately
    (0 until 20).foreach { i =>
      t.appendExactlyOnce(
        Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), "w", i.toLong)
      t.autoCompactIfNeeded()
    }
    // expiry runs on compaction rounds: retained <= keepLast + the
    // appends that accumulate before the next trigger (maxFiles)
    assert(t.snapshots.size <= 8, s"history unbounded: ${t.snapshots.size}")
    // on-disk parquet is bounded by what retained snapshots reference,
    // not by write history (20 appends + ~5 compaction rewrites)
    val onDisk = walkDir(java.nio.file.Paths.get(t.root, "data"))
      .count(_.toString.endsWith(".parquet"))
    assert(onDisk <= 12, s"disk unbounded: $onDisk parquet files")
    assert(t.read().select("id").as[Long].collect().toSet ==
      (0L until 20L).toSet)
    assert(t.lastBatchId("w") == 19L) // frontier survived expiry
  }

  test("a compaction whose base was superseded by a delete aborts " +
    "instead of resurrecting the deleted rows") {
    val t = LakeTable.create(spark, tmpDir("compact-vs-delete"), schema)
    t.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1))
    val base = t.currentVersion
    t.deleteWhere($"id" < 5L) // supersedes the only base file
    // a racer that planned its rewrite against the pre-delete snapshot
    // must NOT be able to commit those rows back
    intercept[java.util.ConcurrentModificationException] {
      t.compactFrom(base, 1)
    }
    assert(t.read().select("id").as[Long].collect().toSet ==
      (5L until 10L).toSet)
    // a fresh compaction against the current snapshot works fine
    t.compact(1)
    assert(t.read().count() == 5)
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

  test("tiered minor compaction: merging small files leaves the big " +
    "compacted files byte-untouched (LSM amortization, not full " +
    "rewrites)") {
    val t = LakeTable.create(spark, tmpDir("tiered"), schema,
      properties = Map("compaction.auto.maxFiles" -> "4",
        "compaction.auto.sortBy" -> "id"))
    // build one BIG file (class >= 2 at k=4): 64 rows
    t.append((0L until 64L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1))
    t.compact(1)
    val big = t.dataFiles.maxBy(_.rows)
    val bigPath = java.nio.file.Paths.get(t.root, big.path)
    val bigBytes = java.nio.file.Files.getLastModifiedTime(bigPath)
    // now stream 16 single-row appends with the policy enforced
    (100 until 116).foreach { i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
      t.autoCompactIfNeeded()
      assert(t.dataFiles.size <= 2 * 4 + 1,
        s"file count above the hard cap: ${t.dataFiles.size}")
    }
    // the 64-row file was NEVER rewritten by the small-file merges:
    // same live path, same mtime — the amortization property that a
    // full-rewrite policy (O(history) per trigger) cannot give
    assert(t.dataFiles.exists(_.path == big.path),
      "big file must survive minor compactions untouched")
    assert(java.nio.file.Files.getLastModifiedTime(bigPath) == bigBytes)
    // everything still readable, nothing lost
    assert(t.read().select("id").as[Long].collect().toSet ==
      ((0L until 64L) ++ (100L until 116L)).toSet)
    // and the merged small files escalated class: at least one live
    // file now holds >= 4 rows but is not the big file
    assert(t.dataFiles.exists(f => f.path != big.path && f.rows >= 4))
  }

  test("a frozen supergeometric chain past maxFilesPerDir collapses " +
    "to one file; under the cap it stays byte-untouched") {
    val t = LakeTable.create(spark, tmpDir("dir-cap"), StructType(
      Seq(StructField("id", LongType), StructField("_cluster", LongType))),
      // maxFiles=6 opens the gate at 8 files WITHOUT arming the
      // full-rewrite valve (8 <= 2x6), so what this test observes is
      // the per-dir cap alone, not the valve
      properties = Map("compaction.auto.maxFiles" -> "6",
        "compaction.auto.maxFilesPerDir" -> "8"),
      partitionBy = Seq("_cluster"))
    // powers of two are strictly supergeometric against the running
    // sum (2^k > 2^k - 1), so the ladder rule alone never merges them
    var lo = 0L
    (0 until 8).foreach { k =>
      val n = 1L << k
      t.append((lo until lo + n).map(i => (i, 0L)).toDF("id", "_cluster")
        .coalesce(1))
      lo += n
    }
    assert(t.dataFiles.size == 8)
    // 8 files = cap: no ladder prefix, no collapse — a no-op round
    val mtimes = t.dataFiles.map(f => f.path ->
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(t.root, f.path))).toMap
    assert(t.autoCompactIfNeeded().isEmpty)
    t.dataFiles.foreach(f => assert(
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(t.root, f.path)) == mtimes(f.path)))
    // the 9th chain element tips the dir over the cap: whole-dir merge
    t.append((lo until lo + 256L).map(i => (i, 0L)).toDF("id", "_cluster")
      .coalesce(1))
    assert(t.autoCompactIfNeeded().isDefined)
    assert(t.dataFiles.size == 1, s"expected one file: ${t.dataFiles}")
    assert(t.read().count() == lo + 256L)
  }

  test("more partition dirs than 2x maxFiles: the full-rewrite branch " +
    "is skipped (it could never reduce the count) instead of " +
    "rewriting the whole table every batch") {
    val t = LakeTable.create(spark, tmpDir("dir-floor"), StructType(
      Seq(StructField("id", LongType), StructField("_cluster", LongType))),
      properties = Map("compaction.auto.maxFiles" -> "2"),
      partitionBy = Seq("_cluster"))
    // 20 dirs, one file each: gate (2) is far exceeded, but a full
    // rewrite would land one file per dir = 20 files — useless
    t.append((0L until 20L).map(i => (i, i)).toDF("id", "_cluster"))
    val v = t.currentVersion
    val mtimes = t.dataFiles.map(f => f.path ->
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(t.root, f.path))).toMap
    // repeated enforcement must be a NO-OP: no commit, no rewrite —
    // the old policy committed a futile full rewrite on every call
    (0 until 3).foreach(_ => assert(t.autoCompactIfNeeded().isEmpty))
    assert(t.currentVersion == v, "no-op must not commit")
    t.dataFiles.foreach(f => assert(
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(t.root, f.path)) == mtimes(f.path),
      s"${f.path} was rewritten by a futile compaction"))
    // tier merging still works in this regime: pile 4 class-0 files
    // into ONE dir and only that dir's tier is merged
    (0 until 4).foreach(i => t.append(
      Seq((100L + i, 0L)).toDF("id", "_cluster").coalesce(1)))
    val before = t.dataFiles.size
    assert(t.autoCompactIfNeeded().isDefined)
    assert(t.dataFiles.size < before)
    val untouched = t.dataFiles.filter(f => mtimes.contains(f.path))
    assert(untouched.size == 19, "only dir 0's tier may be rewritten")
    assert(t.read().count() == 24)
  }

  test("partitioned (unbucketed) full compaction collapses to one " +
    "file per partition dir — never tasks x partitions") {
    val t = LakeTable.create(spark, tmpDir("part-compact"), StructType(
      Seq(StructField("id", LongType), StructField("_cluster", LongType))),
      properties = Map("compaction.auto.maxFiles" -> "4",
        "compaction.auto.target" -> "2"),
      partitionBy = Seq("_cluster"))
    // appends spread across 5 cluster dirs, several files each; the
    // full-rewrite cap honors the layout floor (a rewrite lands ~one
    // file per live dir), so the bound is max(2 x maxFiles, 2 x dirs)
    (0 until 12).foreach { i =>
      t.append(Seq((i.toLong, (i % 5).toLong)).toDF("id", "_cluster")
        .coalesce(1))
      t.autoCompactIfNeeded()
      assert(t.dataFiles.size <= math.max(2 * 4, 2 * 5) + 1,
        s"file count above the hard cap at $i: ${t.dataFiles.size}")
    }
    t.compact(1)
    val dirs = t.dataFiles.map(_.path.replaceAll("/[^/]+$", ""))
    assert(dirs.distinct.size == dirs.size,
      s"multiple files per partition dir after full compaction: $dirs")
    assert(t.read().select("id").as[Long].collect().toSet ==
      (0L until 12L).toSet)
  }
}
