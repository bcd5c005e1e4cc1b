package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.LakeTable

/** Manifest-stats pruning of the changelog stream's GROWTH partitions:
  * an equality-delete commit plans a read ONLY of files whose [lo, hi]
  * key ranges can hold a deleted key — the planner-level guarantee
  * behind "a GDPR forget's changelog batch is O(files that can hold
  * the keys)". Asserted at planInputPartitions, where the file set is
  * visible. */
class ChangesPruneSpec extends SparkSuite {

  private def changesStream(t: LakeTable) =
    new GraftLakeChangesMicroBatchStream(t,
      GraftLakeChangesMicroBatchStream.schemaFor(t.schema),
      Map.empty, None)

  private def growthFiles(parts: Array[_]): Seq[String] =
    parts.toSeq.collect {
      case c: GraftChangeInputPartition
          if c.mode == GraftLakeChangesMicroBatchStream.ModeGrowth =>
        c.fileName
    }

  test("an equality-delete commit plans growth reads only for files " +
    "whose key ranges can hold a deleted key") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 100L).map(i => (i, s"d-$i")).toDF("id", "s")
    val t = LakeTable.create(spark, tmpDir("chprune"), df.schema)
    // three single-file appends with DISJOINT id ranges
    t.append(df.coalesce(1))                                       // v1
    t.append((1000L until 1100L).map(i => (i, s"d-$i"))
      .toDF("id", "s").coalesce(1))                                // v2
    t.append((5000L until 5100L).map(i => (i, s"d-$i"))
      .toDF("id", "s").coalesce(1))                                // v3
    val byRange = t.dataFiles.map(e =>
      e.stats("id").lo.asInstanceOf[Long] -> e.path.split("/").last)
      .toMap
    // forget keys living only in the middle file
    t.deleteWhereEqual(Seq(1005L, 1042L).toDF("id"), Seq("id"))    // v4
    val v = t.currentVersion
    val parts = changesStream(t).planInputPartitions(
      LakeLogOffset(v - 1), LakeLogOffset(v))
    assert(growthFiles(parts) == Seq(byRange(1000L)),
      s"expected only the middle file, got ${growthFiles(parts)}")
    // a position delete keeps its named file regardless of key stats
    t.deleteWherePositional(col("id") === 5001L)                   // v5
    val v2 = t.currentVersion
    val parts2 = changesStream(t).planInputPartitions(
      LakeLogOffset(v2 - 1), LakeLogOffset(v2))
    assert(growthFiles(parts2) == Seq(byRange(5000L)),
      s"position delete planned ${growthFiles(parts2)}")
  }

  test("prune conservatism: unorderable and null key components " +
    "never prune; a key outside every range prunes everything") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 50L).map(i => (i, s"d-$i")).toDF("id", "s")
    val t = LakeTable.create(spark, tmpDir("chprune2"), df.schema)
    t.append(df.coalesce(1))                                       // v1
    // a key that no file range can hold: zero growth partitions
    t.deleteWhereEqual(Seq(9999L).toDF("id"), Seq("id"))           // v2
    val v = t.currentVersion
    val parts = changesStream(t).planInputPartitions(
      LakeLogOffset(v - 1), LakeLogOffset(v))
    assert(growthFiles(parts).isEmpty,
      s"out-of-range key planned reads: ${growthFiles(parts)}")
    // the delete entry still applies at later reads (pruning is a
    // planner decision, not a semantic one)
    assert(t.read().count() == 50)
  }

  test("a -0.0 equality key cannot prune a file whose range ends at " +
    "+0.0/-0.0 (the zero class is one SQL key)") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, -0.0d), (2L, -5.0d)).toDF("id", "key")
    val t = LakeTable.create(spark, tmpDir("chprune0"), df.schema)
    t.append(df.coalesce(1))                                       // v1
    t.deleteWhereEqual(Seq(0.0d).toDF("key"), Seq("key"))          // v2
    val v = t.currentVersion
    val parts = changesStream(t).planInputPartitions(
      LakeLogOffset(v - 1), LakeLogOffset(v))
    assert(growthFiles(parts).size == 1,
      "the zero-keyed file was wrongly pruned")
    // and the batch read agrees the row is gone
    assert(t.read().count() == 1)
  }
}
