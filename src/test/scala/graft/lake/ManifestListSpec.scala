package graft.lake

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** The manifest-list split (Iceberg's manifest-list shape): snapshots
  * reference immutable manifest files instead of inlining the live
  * file list, so per-commit metadata is O(batch) not O(table),
  * `currentVersion` is hint+probe not a listing, and the manifest
  * count is bounded by the merge ladder. */
class ManifestListSpec extends SparkSuite {
  import spark.implicits._

  private val abSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))

  private def snapNode(t: LakeTable, v: Int) = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    om.readTree(Files.readString(
      Paths.get(t.root, "metadata", f"v$v%08d.json")))
  }

  private def manifestPaths(t: LakeTable, v: Int): Seq[String] =
    snapNode(t, v).get("manifests").elements().asScala
      .map(_.get("path").asText()).toSeq

  test("snapshot size stays O(1) while the live-file list grows: " +
    "commits reference unchanged manifests instead of rewriting them") {
    val t = LakeTable.create(spark, tmpDir("mlist-o1"), abSchema)
    val snapSizes = (1 to 30).map { i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("a", "b").repartition(2))
      Files.size(Paths.get(t.root, "metadata", f"v${t.currentVersion}%08d.json"))
    }
    assert(t.dataFiles.size >= 30, s"grew to ${t.dataFiles.size} files")
    // inline-files snapshots grew ~linearly (300+ bytes per live
    // file); manifest-list snapshots hold refs only, bounded by the
    // ladder's manifest count — the last snapshot must NOT be
    // O(live files) and no snapshot may inline a files array
    assert(snapSizes.last < 4000,
      s"snapshot grew to ${snapSizes.last} bytes — O(table) metadata")
    assert(snapNode(t, t.currentVersion).get("files") == null)
    // growth over 30 commits stays within the ladder's ref-count
    // bound rather than tracking file count
    assert(snapSizes.last < snapSizes.head * 4,
      s"snapshot bytes ${snapSizes.head} -> ${snapSizes.last}")
  }

  test("append reuses every unchanged manifest ref; ladder bounds the " +
    "manifest count at O(fanout * log files)") {
    val t = LakeTable.create(spark, tmpDir("mlist-reuse"), abSchema)
    (1 to 40).foreach { i =>
      val before =
        if (t.currentVersion >= 1) manifestPaths(t, t.currentVersion)
        else Nil
      t.append(Seq((i.toLong, "x")).toDF("a", "b"))
      val after = manifestPaths(t, t.currentVersion)
      // every pre-existing manifest either survives verbatim or was
      // consumed by a ladder merge — never rewritten for the append
      // itself (the new batch rides its own manifest)
      val merged = after.toSet -- before.toSet
      assert(merged.nonEmpty, "append must add at least one manifest")
      val n = t.dataFiles.size
      val bound = LakeTable.ManifestMergeFanout *
        (64 - java.lang.Long.numberOfLeadingZeros(math.max(1, n)) + 1)
      assert(after.size <= bound,
        s"$n files but ${after.size} manifests (bound $bound)")
    }
    // reads serve every row through the manifest chain
    assert(t.read().count() == 40)
    assert(t.read().agg(sum("a")).as[Long].head() == (1 to 40).sum.toLong)
  }

  test("row-level rewrite touches only manifests holding replaced " +
    "files; unrelated refs are carried verbatim") {
    val t = LakeTable.create(spark, tmpDir("mlist-replace"), abSchema)
    (1 to 3).foreach(i =>
      t.append(Seq((i.toLong * 10, s"b$i")).toDF("a", "b")))
    val before = manifestPaths(t, t.currentVersion).toSet
    t.deleteWhere(col("a") === 10L) // replaces exactly one file
    val after = manifestPaths(t, t.currentVersion).toSet
    assert((before intersect after).nonEmpty,
      "untouched manifests must be re-referenced, not rewritten")
    assert(t.read().select("a").as[Long].collect().toSet == Set(20L, 30L))
  }

  test("currentVersion: served by the _latest hint + probe; stale, " +
    "corrupt, and missing hints all fall back correctly") {
    val t = LakeTable.create(spark, tmpDir("mlist-hint"), abSchema)
    (1 to 5).foreach(i => t.append(Seq((i.toLong, "x")).toDF("a", "b")))
    val hintPath = Paths.get(t.root, "metadata", "_latest")
    assert(Files.exists(hintPath), "winning commits must publish the hint")
    assert(Files.readString(hintPath).trim.toInt == 5)
    // stale hint (lagging writer): probe-forward recovers the frontier
    Files.writeString(hintPath, "1")
    assert(t.currentVersion == 5)
    // corrupt hint: full-listing fallback
    Files.writeString(hintPath, "not-a-version")
    assert(t.currentVersion == 5)
    // missing hint (legacy table): full-listing fallback
    Files.delete(hintPath)
    assert(t.currentVersion == 5)
    // hint ahead of any visible snapshot (severe regression): fallback
    Files.writeString(hintPath, "99")
    assert(t.currentVersion == 5)
  }

  test("expire + vacuum reclaims manifests no retained snapshot " +
    "references; retained reads stay intact") {
    val t = LakeTable.create(spark, tmpDir("mlist-vacuum"), abSchema)
    (1 to 12).foreach(i => t.append(Seq((i.toLong, "x")).toDF("a", "b")))
    val metaDir = Paths.get(t.root, "metadata")
    def onDiskManifests: Set[String] =
      Files.list(metaDir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("m-") && n.endsWith(".json")).toSet
    assert(onDiskManifests.nonEmpty)
    t.expireSnapshots(keepLast = 2)
    val retained = (t.currentVersion - 1 to t.currentVersion)
      .flatMap(v => manifestPaths(t, v)).toSet
    assert(onDiskManifests == retained,
      s"orphan manifests survived: ${onDiskManifests -- retained}")
    assert(t.read().count() == 12)
    assert(t.readVersion(t.currentVersion - 1).count() == 11)
  }

  test("rollback re-references the target's manifests (O(1) metadata) " +
    "and restores its rows") {
    val t = LakeTable.create(spark, tmpDir("mlist-rollback"), abSchema)
    (1 to 6).foreach(i => t.append(Seq((i.toLong, "x")).toDF("a", "b")))
    val targetRefs = manifestPaths(t, 3).toSet
    t.rollbackTo(3)
    assert(manifestPaths(t, t.currentVersion).toSet == targetRefs,
      "rollback must reuse the target's manifest refs verbatim")
    assert(t.read().count() == 3)
  }
}
