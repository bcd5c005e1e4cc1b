package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Merge-on-read MERGE (Iceberg-v2 shape): ONE commit carries both
  * the appended source rows and an equality-delete on the source's
  * keys at the same data sequence number — O(source) commit cost, no
  * provenance scan, zero data files rewritten. The strict
  * fileSeq < deleteSeq comparison keeps each merge's own rows alive
  * while masking every earlier generation; compaction absorbs the
  * entries lazily. */
class MorUpsertSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", LongType),
    StructField("v", StringType)))

  private def freshTable(name: String, rows: Int, batches: Int = 3)
      : LakeTable = {
    val t = LakeTable.create(spark, tmpDir(name), schema)
    (0 until batches).foreach { b =>
      val lo = b * rows / batches
      val hi = (b + 1) * rows / batches
      t.append((lo until hi).map(i =>
        (i.toLong, (i % 7).toLong, s"row-$i")).toDF("id", "grp", "v"))
    }
    t
  }

  private def dataState(t: LakeTable): Seq[(String, Long)] =
    t.dataFiles.map(e => (e.path, e.modTimeMs)).sortBy(_._1)

  test("one commit updates matched keys and inserts unseen keys; " +
    "no pre-existing data file is touched") {
    val t = freshTable("morup-basic", 300)
    val before = dataState(t)
    val v0 = t.currentVersion

    // 30 updates (ids 0,10,...,290) + 5 inserts (ids 1000..1004)
    val src = ((0 until 300 by 10).map(i =>
        (i.toLong, 99L, s"upd-$i")) ++
      (1000 until 1005).map(i => (i.toLong, 42L, s"new-$i")))
      .toDF("id", "grp", "v")
    val v1 = t.upsertMor(src, Seq("id"))
    assert(v1 == v0 + 1, "MOR merge must be exactly one commit")
    assert(before.forall(dataState(t).contains),
      "a pre-existing data file was rewritten or touched")
    assert(t.read().count() == 305)
    assert(t.read().filter($"v".startsWith("upd-")).count() == 30)
    assert(t.read().filter($"id" >= 1000L).count() == 5)
    // the old generation of a merged key is gone from every read path
    assert(t.read().filter($"id" === 20L).select("v").as[String]
      .head() == "upd-20")
    assert(t.readWhere($"id" === 20L).select("v").as[String]
      .head() == "upd-20")
    assert(t.deleteEntries.exists(e =>
      e.kind == "eq" && e.keyCols == Seq("id")))
    // time travel: the pre-merge snapshot still serves the originals
    assert(t.readVersion(v0).filter($"id" === 20L).select("v").as[String]
      .head() == "row-20")
  }

  test("generations layer: a second merge of overlapping keys wins, " +
    "and a plain append AFTER a merge is out of the delete's scope") {
    val t = freshTable("morup-layers", 100)
    t.upsertMor(Seq((7L, 1L, "gen1"), (8L, 1L, "gen1"))
      .toDF("id", "grp", "v"), Seq("id"))
    t.upsertMor(Seq((7L, 2L, "gen2")).toDF("id", "grp", "v"), Seq("id"))
    val byId = t.read().filter($"id".isin(7L, 8L))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(byId == Map(7L -> "gen2", 8L -> "gen1"))
    // a LATER append of a merged key is a new row, not a masked one
    t.append(Seq((7L, 3L, "late")).toDF("id", "grp", "v"))
    assert(t.read().filter($"id" === 7L).count() == 2)
    assert(t.read().filter($"id" === 7L).select("v").as[String]
      .collect().toSet == Set("gen2", "late"))
  }

  test("MOR merge equals copy-on-write merge on the same source") {
    val mor = freshTable("morup-eq-mor", 200)
    val cow = freshTable("morup-eq-cow", 200)
    val src = ((0 until 200 by 3).map(i => (i.toLong, 50L, s"u-$i")) ++
      Seq((9999L, 60L, "ins"))).toDF("id", "grp", "v")
    mor.upsertMor(src, Seq("id"))
    cow.upsert(src, Seq("id"))
    val a = mor.read().as[(Long, Long, String)].collect().sortBy(_._1)
    val b = cow.read().as[(Long, Long, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("compaction absorbs the merge's delete entries once no " +
    "pre-merge file survives; content is unchanged") {
    val t = freshTable("morup-absorb", 150)
    t.upsertMor((0 until 150 by 5).map(i => (i.toLong, 9L, s"u-$i"))
      .toDF("id", "grp", "v"), Seq("id"))
    val want = t.read().as[(Long, Long, String)].collect().sortBy(_._1)
    assert(t.deleteEntries.nonEmpty)
    t.compact(2)
    assert(t.deleteEntries.isEmpty,
      "full compaction must absorb every equality-delete entry")
    assert(t.read().as[(Long, Long, String)].collect().sortBy(_._1)
      .toSeq == want.toSeq)
  }

  test("null keys merge null-safely") {
    val t = LakeTable.create(spark, tmpDir("morup-null"), schema)
    t.append(Seq((Some(1L), 1L, "one"), (None, 1L, "null-v1"))
      .map { case (id, g, v) => (id.map(Long.box).orNull, g, v) }
      .toDF("id", "grp", "v"))
    t.upsertMor(Seq((null.asInstanceOf[java.lang.Long], 2L, "null-v2"))
      .toDF("id", "grp", "v"), Seq("id"))
    val got = t.read().select("v").as[String].collect().toSet
    assert(got == Set("one", "null-v2"))
  }

  test("exactly-once: a replayed batch is a no-op and an EMPTY batch " +
    "still advances the writer's high-water mark") {
    val t = freshTable("morup-eo", 60)
    val src = Seq((5L, 9L, "b1")).toDF("id", "grp", "v")
    t.upsertMorExactlyOnce(src, Seq("id"), "w", batchId = 1L)
    val after = t.read().as[(Long, Long, String)].collect().sortBy(_._1)
    // replay of batch 1 (possibly with different data — crash replay
    // of a non-deterministic source) must be a no-op
    val v = t.currentVersion
    t.upsertMorExactlyOnce(Seq((5L, 9L, "ghost")).toDF("id", "grp", "v"),
      Seq("id"), "w", batchId = 1L)
    assert(t.currentVersion == v)
    assert(t.read().as[(Long, Long, String)].collect().sortBy(_._1)
      .toSeq == after.toSeq)
    // empty batch 2: no rows land, but the mark advances so batch 2's
    // replay is also a no-op
    t.upsertMorExactlyOnce(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      Seq("id"), "w", batchId = 2L)
    assert(t.lastBatchId("w") == 2L)
    assert(t.read().count() == after.length)
  }
}
