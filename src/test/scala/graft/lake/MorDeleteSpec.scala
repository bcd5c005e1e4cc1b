package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Merge-on-read position deletes (Iceberg-v2 shape): O(deleted)
  * commits that rewrite NO data file, applied as a (file, pos)
  * anti-join on every read path, absorbed lazily by compaction, and
  * guarded both ways against concurrent rewrites. */
class MorDeleteSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", LongType),
    StructField("v", StringType)))

  private def freshTable(name: String, rows: Int, batches: Int = 3)
      : (LakeTable, String) = {
    val dir = tmpDir(name)
    val t = LakeTable.create(spark, dir, schema)
    (0 until batches).foreach { b =>
      val lo = b * rows / batches
      val hi = (b + 1) * rows / batches
      t.append((lo until hi).map(i =>
        (i.toLong, (i % 7).toLong, s"row-$i")).toDF("id", "grp", "v"))
    }
    (t, dir)
  }

  private def dataState(t: LakeTable): Seq[(String, Long)] =
    t.dataFiles.map(e => (e.path, e.modTimeMs)).sortBy(_._1)

  test("positional delete removes rows without touching any data file; " +
    "repeated and overlapping deletes accumulate; no-match is a no-op") {
    val (t, _) = freshTable("mor-basic", 300)
    val before = dataState(t)
    val v0 = t.currentVersion

    val v1 = t.deleteWherePositional($"id" % 10 === 3)
    assert(v1 == v0 + 1)
    assert(dataState(t) == before, "a data file was rewritten or touched")
    assert(t.read().count() == 270)
    assert(t.read().filter($"id" % 10 === 3).count() == 0)
    assert(t.deleteEntries.nonEmpty)
    assert(t.deleteEntries.map(_.rows).sum == 30)

    // overlapping second delete: already-deleted rows are NOT
    // re-recorded (the provenance scan applies live deletes)
    val v2 = t.deleteWherePositional($"id" % 5 === 3) // ids 3,8 mod 10
    assert(v2 == v1 + 1)
    assert(t.read().count() == 240)
    assert(t.deleteEntries.map(_.rows).sum == 60)
    assert(dataState(t) == before)

    // no-match: version unchanged, no delete entry added
    val dels = t.deleteEntries
    assert(t.deleteWherePositional($"id" === -1L) == v2)
    assert(t.deleteEntries == dels)

    // NULL predicate keeps the row (three-valued semantics)
    val keep = t.read().count()
    t.deleteWherePositional(when($"id" < 0, lit(true)))
    assert(t.read().count() == keep)
  }

  test("all read paths apply deletes: read, readWhere, probe, " +
    "time travel sees pre-delete state, rollback restores it") {
    val (t, _) = freshTable("mor-paths", 200)
    val vBefore = t.currentVersion
    t.deleteWherePositional($"grp" === 2L)
    val expect = (0 until 200).filterNot(_ % 7 == 2)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      expect.map(_.toLong))
    assert(t.readWhere($"grp" === 2L).count() == 0)
    assert(t.readWhere($"grp" <= 2L).count() ==
      expect.count(i => i % 7 <= 2))
    assert(t.probe("id", Seq(2L, 9L, 7L)).count() == 1) // 2,9 are grp 2
    // time travel: the pre-delete snapshot still has every row
    assert(t.readVersion(vBefore).count() == 200)
    // rollback across the delete restores the full row set
    val vAfter = t.currentVersion
    t.rollbackTo(vBefore)
    assert(t.read().count() == 200)
    // ...and rolling forward to the post-delete snapshot re-applies it
    t.rollbackTo(vAfter)
    assert(t.read().count() == expect.size)
  }

  test("plain appends after a positional delete neither apply to new " +
    "rows nor resurrect old ones; delete metadata rides untouched") {
    val (t, _) = freshTable("mor-append", 100)
    t.deleteWherePositional($"id" < 20L)
    val dels = t.deleteEntries
    t.append(Seq((5L, 5L, "new-5"), (200L, 1L, "new-200"))
      .toDF("id", "grp", "v"))
    assert(t.deleteEntries == dels,
      "append rewrote delete metadata it should only reference")
    val got = t.read().filter($"id" === 5L).select("v").as[String].collect()
    assert(got.toSeq == Seq("new-5"),
      "appended row with a previously-deleted id must be visible")
    assert(t.read().count() == 82)
  }

  test("copy-on-write delete and upsert do not resurrect MOR-deleted " +
    "rows; compaction absorbs delete files and vacuum reclaims them") {
    val (t, dir) = freshTable("mor-interplay", 150)
    t.deleteWherePositional($"id" % 3 === 0)
    assert(t.read().count() == 100)
    // upsert touching a file with MOR-deleted rows must not bring
    // them back
    t.upsert(Seq((1L, 1L, "upserted")).toDF("id", "grp", "v"), Seq("id"))
    assert(t.read().count() == 100)
    assert(t.read().filter($"id" % 3 === 0).count() == 0)
    // copy-on-write delete over the remaining rows
    t.deleteWhere($"id" % 3 === 1)
    assert(t.read().count() == 50)
    assert(t.read().filter($"id" % 3 =!= 2).count() == 0)
    // full compaction absorbs every remaining delete file
    t.compact(2)
    assert(t.deleteEntries.isEmpty,
      "compaction must drop fully-covered delete files")
    assert(t.read().count() == 50)
    // with history expired, vacuum reclaims the orphaned delete parquet
    t.expireSnapshots(keepLast = 1)
    val left = LakeTable.walkDir(
      java.nio.file.Paths.get(dir, "deletes"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
    assert(left.isEmpty, s"unreclaimed delete files: $left")
    assert(t.read().count() == 50)
  }

  test("tiered auto-compaction of a bucketed table carries deletes " +
    "covering untouched files and applies covered ones") {
    val dir = tmpDir("mor-bucketed")
    val t = LakeTable.create(spark, dir, schema,
      properties = LakeTable.autoCompactProps(4, Some("id")),
      bucketBy = Some(("id", 4)))
    (0 until 6).foreach { b =>
      t.append((b * 50 until (b + 1) * 50).map(i =>
        (i.toLong, (i % 7).toLong, s"row-$i")).toDF("id", "grp", "v"))
    }
    t.deleteWherePositional($"id" % 4 === 1)
    val expected = (0 until 300).filterNot(_ % 4 == 1).size
    assert(t.read().count() == expected)
    // force the ladder until it plateaus; deletes must keep applying
    (0 until 3).foreach(_ => t.autoCompactIfNeeded())
    assert(t.read().count() == expected)
    assert(t.read().filter($"id" % 4 === 1).count() == 0)
    // bucket probe path also honors deletes
    assert(t.probe("id", Seq(1L, 2L)).count() == 1)
  }

  test("conflict guards both ways: a positional delete loses to a " +
    "concurrent rewrite of a covered file, and a rewrite loses to a " +
    "positional delete that landed since its base") {
    // rewrite-side guard: deleteWhere computed against a base, then a
    // positional delete lands before its commit — simulated by
    // interleaving through the public API on two handles of one table
    val (t, dir) = freshTable("mor-conflict", 90)
    val t2 = LakeTable.load(spark, dir)
    // t starts a copy-on-write delete AFTER t2's positional delete
    // commits: fine (t reads the deletes). The conflicting order needs
    // the positional delete to land mid-flight, which the public API
    // can't pause — so drive the guard directly: a compaction whose
    // base predates the delete must abort.
    val vBase = t.currentVersion
    t2.deleteWherePositional($"id" === 7L)
    intercept[java.util.ConcurrentModificationException] {
      t.compactFrom(vBase, 1)
    }
    // ...and from the current base it succeeds and absorbs
    t.compact(1)
    assert(t.deleteEntries.isEmpty)
    assert(t.read().count() == 89)
    // delete-side guard: positions resolved against files a
    // concurrent compaction then replaced must abort, not silently
    // drop the delete. Race the other way: t2 re-reads AFTER the
    // compaction, so its delete commits cleanly — verify both.
    val t3 = LakeTable.load(spark, dir)
    t3.deleteWherePositional($"id" === 8L) // clean: current base
    assert(t3.read().count() == 88)
  }

  test("schema evolution interplay: deletes keep applying after a " +
    "rename (positions are name-independent)") {
    val (t, _) = freshTable("mor-rename", 60)
    t.deleteWherePositional($"id" < 10L)
    t.renameColumn("v", "val")
    assert(t.read().count() == 50)
    assert(t.read().filter($"id" < 10L).count() == 0)
    assert(t.read().columns.contains("val"))
    // and a positional delete on the renamed column's table works
    t.deleteWherePositional(col("val") === "row-59")
    assert(t.read().count() == 49)
  }

  test("changesBetween across a positional delete falls back safely " +
    "(append-only attribution unaffected: no data file changed)") {
    val (t, _) = freshTable("mor-cdc", 90)
    val v0 = t.currentVersion
    t.deleteWherePositional($"id" < 30L)
    t.append(Seq((500L, 0L, "late")).toDF("id", "grp", "v"))
    // the delete commit adds no data files; the append adds one — the
    // delta between v0 and now is exactly the appended row (positional
    // deletes are not CDC row-removals; consumers needing deletion
    // events read snapshots, as documented)
    val delta = t.changesSince(v0).select("id").as[Long].collect()
    assert(delta.toSeq == Seq(500L))
  }

  test("equality delete: O(keys) commit with no table scan, sequence " +
    "semantics let deleted keys be re-inserted, all read paths apply") {
    val (t, _) = freshTable("eq-basic", 210)
    val before = dataState(t)
    // delete three grp keys — no data file touched, no provenance scan
    val v1 = t.deleteWhereEqual(
      Seq(1L, 4L, 6L).toDF("grp"), Seq("grp"))
    assert(dataState(t) == before, "a data file was rewritten")
    val kept = (0 until 210).filterNot(i => Set(1, 4, 6)(i % 7))
    assert(t.read().count() == kept.size)
    assert(t.readWhere($"grp" === 4L).count() == 0)
    assert(t.probe("id", Seq(1L, 2L, 4L)).count() == 1) // grp 1,2,4 -> only 2
    assert(t.deleteEntries.exists(e =>
      e.kind == "eq" && e.seq == v1 && e.keyCols == Seq("grp")))
    // SEQUENCE semantics: a row with a deleted key appended AFTER the
    // delete is visible — its file's seq is above the delete's
    t.append(Seq((1000L, 4L, "reborn")).toDF("id", "grp", "v"))
    assert(t.read().filter($"grp" === 4L).count() == 1)
    assert(t.read().filter($"id" === 1000L).count() == 1)
    // ...and a SECOND eq delete of the same key removes the reborn row
    // too (it predates the new delete)
    t.deleteWhereEqual(Seq(4L).toDF("grp"), Seq("grp"))
    assert(t.read().filter($"grp" === 4L).count() == 0)
    // time travel sees the intermediate state
    assert(t.readVersion(v1 + 1).filter($"grp" === 4L).count() == 1)
    // empty keys: no-op
    val dels = t.deleteEntries
    assert(t.deleteWhereEqual(Seq.empty[Long].toDF("grp"), Seq("grp"))
      == t.currentVersion)
    assert(t.deleteEntries == dels)
  }

  test("equality + positional deletes compose; compaction absorbs " +
    "both kinds; rename of an eq key is blocked until absorption") {
    val (t, _) = freshTable("eq-compose", 140)
    t.deleteWherePositional($"id" < 20L)
    t.deleteWhereEqual(Seq(3L).toDF("grp"), Seq("grp"))
    val expect = (20 until 140).count(_ % 7 != 3)
    assert(t.read().count() == expect)
    // composite-key equality delete
    t.deleteWhereEqual(
      Seq((5L, "row-40")).toDF("grp", "v"), Seq("grp", "v"))
    assert(t.read().count() == expect - 1)
    assert(t.read().filter($"id" === 40L).count() == 0)
    // rename of a live eq-delete key column is blocked...
    intercept[IllegalArgumentException] { t.renameColumn("grp", "g2") }
    // ...compaction absorbs BOTH kinds (post-compact min file seq is
    // above every delete's seq) and unblocks the rename
    t.compact(2)
    assert(t.deleteEntries.isEmpty)
    assert(t.read().count() == expect - 1)
    t.renameColumn("grp", "g2")
    assert(t.read().columns.contains("g2"))
  }

  test("copy-on-write upsert after an equality delete does not " +
    "resurrect; its inserted rows sit above the delete's sequence") {
    val (t, _) = freshTable("eq-upsert", 70)
    t.deleteWhereEqual(Seq(2L).toDF("grp"), Seq("grp"))
    val n0 = t.read().count()
    // upsert touches a file that held deleted-grp rows: survivors are
    // re-stamped ABOVE the delete but were read with it applied
    t.upsert(Seq((0L, 0L, "upserted")).toDF("id", "grp", "v"), Seq("id"))
    assert(t.read().count() == n0)
    assert(t.read().filter($"grp" === 2L).count() == 0)
    // an upsert INSERTING a deleted-key row is a post-delete write:
    // visible (MERGE semantics)
    t.upsert(Seq((2000L, 2L, "back")).toDF("id", "grp", "v"), Seq("id"))
    assert(t.read().filter($"grp" === 2L).count() == 1)
  }

  test("concurrent positional deletes of disjoint predicates all land " +
    "(or retry past CME) with exact final state") {
    val (t, dir) = freshTable("mor-concurrent", 400, batches = 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = (0 until 4).map { k =>
      scala.concurrent.Future {
        val h = LakeTable.load(spark, dir)
        var done = false
        var attempts = 0
        while (!done && attempts < 10) {
          attempts += 1
          try { h.deleteWherePositional($"id" % 8 === k); done = true }
          catch {
            case _: java.util.ConcurrentModificationException => ()
          }
        }
        done
      }
    }
    val ok = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(ok.forall(identity), "a delete never landed in 10 attempts")
    assert(t.read().count() == 400 - 4 * 50)
    (0 until 4).foreach(k =>
      assert(t.read().filter($"id" % 8 === k).count() == 0))
  }
}
