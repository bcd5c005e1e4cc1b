package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Manifest-level file pruning from parquet footer stats: snapshot
  * [lo, hi] ranges exclude files before any scan is planned. */
class StatsPruningSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def twoBatchTable(prefix: String): LakeTable = {
    val t = LakeTable.create(spark, tmpDir(prefix), schema)
    t.append((0L until 100L).map(i => (i, "alpha", i / 10.0))
      .toDF("id", "grp", "v").coalesce(1))
    t.append((1000L until 1100L).map(i => (i, "zeta", i / 10.0))
      .toDF("id", "grp", "v").coalesce(1))
    t
  }

  test("snapshot carries per-file column ranges from the footers") {
    val t = twoBatchTable("stats")
    val stats = t.dataFiles.map(f => f.stats("id"))
    assert(stats.toSet ==
      Set(LakeTable.ColStat(0L, 99L), LakeTable.ColStat(1000L, 1099L)))
    val grpStats = t.dataFiles.map(_.stats("grp")).toSet
    assert(grpStats == Set(LakeTable.ColStat("alpha", "alpha"),
      LakeTable.ColStat("zeta", "zeta")))
  }

  test("range predicates prune to the provably-relevant files") {
    val t = twoBatchTable("prune")
    assert(t.dataFiles.size == 2)
    assert(t.pruneFiles($"id" < 50L).size == 1)
    assert(t.pruneFiles($"id" === 1050L).size == 1)
    assert(t.pruneFiles($"id" > 2000L).isEmpty)
    assert(t.pruneFiles(lit(500L) < $"id").size == 1) // literal-first flips
    assert(t.pruneFiles($"grp" === "zeta").size == 1) // string ranges
    assert(t.pruneFiles($"id".isin(5L, 7L)).size == 1) // IN-list
    assert(t.pruneFiles($"id" < 50L && $"grp" === "zeta").isEmpty) // conjunction
    // OR trees and functions are un-analyzable: keep everything
    assert(t.pruneFiles($"id" < 50L || $"grp" === "zeta").size == 2)
    assert(t.pruneFiles(abs($"id") < 10L).size == 2)
  }

  test("readWhere equals an unpruned filtered read") {
    val t = twoBatchTable("prune-eq")
    for (cond <- Seq($"id" < 50L, $"id" === 1050L, $"grp" === "alpha",
        $"id" > 30L && $"id" < 1020L, $"v" >= 104.0)) {
      val got = t.readWhere(cond).select("id").as[Long].collect().toSet
      val want = t.read().filter(cond).select("id").as[Long].collect().toSet
      assert(got == want, s"for $cond")
    }
  }

  test("NaN poisons a float column's stats; other columns still prune") {
    val t = LakeTable.create(spark, tmpDir("nan"), schema)
    t.append(Seq((1L, "a", Double.NaN), (2L, "a", 5.0))
      .toDF("id", "grp", "v").coalesce(1))
    val f = t.dataFiles.head
    assert(!f.stats.contains("v"), "NaN range must record no stats")
    assert(f.stats.contains("id"))
    // no stats -> no pruning on v, results still exact
    assert(t.pruneFiles($"v" > 100.0).size == 1)
    assert(t.readWhere($"v" === 5.0).count() == 1)
  }

  test("delete uses pruning for provenance; rewritten files get fresh stats") {
    val t = twoBatchTable("prune-del")
    t.deleteWhere($"id" < 10L)
    // the untouched file keeps its original range; the rewritten one
    // re-derives stats from its new footer
    val ranges = t.dataFiles.map(f => f.stats("id")).toSet
    assert(ranges == Set(LakeTable.ColStat(10L, 99L),
      LakeTable.ColStat(1000L, 1099L)))
  }

  test("pruning soundness property: random data, random range predicates") {
    // randomized (fixed seed) adversarial check of the one invariant
    // that matters: pruning NEVER changes results
    val rnd = new scala.util.Random(42)
    val t = LakeTable.create(spark, tmpDir("prop"), schema)
    (1 to 6).foreach { _ =>
      val base = rnd.nextInt(2000)
      val rows = (0 until 50).map { _ =>
        val id = (base + rnd.nextInt(500)).toLong
        (id, "g" + rnd.nextInt(4), rnd.nextDouble() * 100 - 50)
      }
      t.append(rows.toDF("id", "grp", "v").coalesce(1))
    }
    val preds = (1 to 40).map { _ =>
      val c = rnd.nextInt(6) match {
        case 0 => $"id" < rnd.nextInt(2500).toLong
        case 1 => $"id" >= rnd.nextInt(2500).toLong
        case 2 => $"id" === rnd.nextInt(2500).toLong
        case 3 => $"grp" === ("g" + rnd.nextInt(5))
        case 4 => $"v" > (rnd.nextDouble() * 100 - 50)
        case 5 => $"id" > rnd.nextInt(2500).toLong &&
          $"v" <= (rnd.nextDouble() * 100 - 50)
      }
      c
    }
    for (p <- preds) {
      val got = t.readWhere(p).select("id", "grp", "v")
        .as[(Long, String, Double)].collect().sorted.toSeq
      val want = t.read().filter(p).select("id", "grp", "v")
        .as[(Long, String, Double)].collect().sorted.toSeq
      assert(got == want, s"pruned read diverged for $p")
    }
  }

  test("stats survive the JSON snapshot round-trip on reload") {
    val t = twoBatchTable("stats-reload")
    val reloaded = LakeTable.load(spark, t.root)
    assert(reloaded.dataFiles.map(_.stats).toSet ==
      t.dataFiles.map(_.stats).toSet)
    assert(reloaded.pruneFiles($"id" < 50L).size == 1)
  }
}
