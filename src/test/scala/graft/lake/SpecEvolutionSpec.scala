package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Partition-spec EVOLUTION (alterPartitionSpec): old and new layouts
  * coexist, each file is pruned by the spec it was written under, and
  * compaction migrates history to the current spec. */
class SpecEvolutionSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime
      .of(2024, 1, 1, 0, 0).plusDays(day).plusHours(hour)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")))

  private def mkRows(n: Int, days: Int, idBase: Long = 0L) =
    (0 until n).map(i =>
      (idBase + i, ts(i % days, i % 24), s"e-$i"))

  test("days(ts) -> hours(ts): both epochs coexist, reads serve the " +
    "union, each epoch prunes by its own derived column") {
    val rows1 = mkRows(200, days = 5)
    val df1 = rows1.toDF("id", "ts", "payload")
    val t = LakeTable.create(spark, tmpDir("se-evolve"), df1.schema,
      partitionBy = Seq("days(ts)"))
    t.append(df1)
    val oldFiles = t.dataFiles.map(_.path).toSet
    assert(oldFiles.forall(_.contains("_p_days_ts=")))

    t.alterPartitionSpec(Seq("hours(ts)"))
    assert(t.partitionBy == Seq("_p_hours_ts"))
    assert(t.partitionTransforms.map(_.spec) == Seq("hours(ts)"))
    // superseded spec retained for pruning + guards
    assert(t.properties(LakeTable.TransformsHistoryProp) == "days(ts)")
    // old derived column stays in the schema; the new one was added
    assert(t.schema.fieldNames.contains("_p_days_ts"))
    assert(t.schema.fieldNames.contains("_p_hours_ts"))

    val rows2 = mkRows(200, days = 5, idBase = 1000L)
    val df2 = rows2.toDF("id", "ts", "payload")
    t.append(df2)
    val newFiles = t.dataFiles.map(_.path).toSet -- oldFiles
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(_.contains("_p_hours_ts=")),
      s"post-evolution files not hour-laid-out: $newFiles")
    assert(newFiles.forall(!_.contains("_p_days_ts=")))

    // full read serves both epochs; old files surface the new derived
    // column as null and vice versa
    assert(t.read().count() == 400)
    assert(t.read().filter(col("_p_hours_ts").isNull).count() == 200)
    assert(t.read().filter(col("_p_days_ts").isNull).count() == 200)

    // PRUNING: a raw-ts window must prune files in BOTH epochs — the
    // old epoch through days(ts) stats, the new through hours(ts) —
    // and return exactly the filter-equivalent rows
    val cond = col("ts") >= lit(ts(2)) && col("ts") < lit(ts(3))
    val pruned = t.readWhere(cond)
    val expect = (rows1 ++ rows2).count { case (_, v, _) =>
      !v.before(ts(2)) && v.before(ts(3)) }
    assert(pruned.count() == expect)
    val plannedFiles = pruned.inputFiles.length
    val allFiles = t.read().inputFiles.length
    assert(plannedFiles < allFiles,
      s"window did not prune: $plannedFiles of $allFiles")
    // old-epoch files outside the window are gone from the plan —
    // the strict upper bound relaxes inclusively (`< ts(3)` keeps the
    // day-3 BOUNDARY dir, never a wrong prune), so days {2, 3} plan
    // and days {0, 1, 4} are pruned
    val day2 = ts(2).getTime / 86400000L
    val plannedOld = pruned.inputFiles.count(_.contains("_p_days_ts="))
    val liveOldInWindow = t.dataFiles.filter(f =>
      oldFiles.contains(f.path) &&
        (f.path.contains(s"_p_days_ts=$day2") ||
          f.path.contains(s"_p_days_ts=${day2 + 1}")))
    assert(plannedOld == liveOldInWindow.size,
      s"old epoch not pruned by its own spec: planned $plannedOld, " +
        s"in-window ${liveOldInWindow.size}")

    // guards: the source column of a superseded spec is still blocked
    val e = intercept[IllegalArgumentException](t.renameColumn("ts", "t2"))
    assert(e.getMessage.contains("partition transform"))
  }

  test("compaction migrates old-epoch files to the current spec and " +
    "results are unchanged") {
    val rows1 = mkRows(120, days = 3)
    val df1 = rows1.toDF("id", "ts", "payload")
    val t = LakeTable.create(spark, tmpDir("se-compact"), df1.schema,
      partitionBy = Seq("days(ts)"))
    t.append(df1)
    t.alterPartitionSpec(Seq("hours(ts)"))
    val rows2 = mkRows(120, days = 3, idBase = 1000L)
    t.append(rows2.toDF("id", "ts", "payload"))
    val before = t.read().select("id").as[Long].collect().toSet
    t.compact(4)
    // every live file now carries the CURRENT spec's layout
    assert(t.dataFiles.forall(_.path.contains("_p_hours_ts=")),
      s"compaction left old-epoch files: ${t.dataFiles.map(_.path)}")
    assert(t.read().select("id").as[Long].collect().toSet == before)
    // post-compaction pruning uses the new epoch exclusively
    val cond = col("ts") >= lit(ts(1)) && col("ts") < lit(ts(2))
    val pruned = t.readWhere(cond)
    assert(pruned.count() == (rows1 ++ rows2).count { case (_, v, _) =>
      !v.before(ts(1)) && v.before(ts(2)) })
    assert(pruned.inputFiles.length < t.read().inputFiles.length)
  }

  test("evolution to an identity spec and back; empty spec " +
    "un-partitions future writes; re-declaring a spec reuses its column") {
    val df = (0 until 60).map(i => (i.toLong, s"s${i % 3}", ts(i % 4)))
      .toDF("id", "grp", "ts")
    val t = LakeTable.create(spark, tmpDir("se-ident"), df.schema,
      partitionBy = Seq("days(ts)"))
    t.append(df)
    t.alterPartitionSpec(Seq("grp"))
    t.append(df)
    assert(t.partitionBy == Seq("grp"))
    assert(t.read().count() == 120)
    // back to days(ts): the derived column already exists — reused,
    // not re-added (no duplicate field, same field id)
    val idBefore = t.fieldIds("_p_days_ts")
    t.alterPartitionSpec(Seq("days(ts)"))
    assert(t.fieldIds("_p_days_ts") == idBefore)
    assert(t.schema.fieldNames.count(_ == "_p_days_ts") == 1)
    t.append(df)
    assert(t.read().count() == 180)
    // empty spec: new files land unpartitioned
    t.alterPartitionSpec(Seq.empty)
    val preFiles = t.dataFiles.map(_.path).toSet
    t.append(df)
    val flat = t.dataFiles.map(_.path).toSet -- preFiles
    assert(flat.nonEmpty && flat.forall(p =>
      !p.contains("=") || p.startsWith("data/")),
      s"unpartitioned append still laid out dirs: $flat")
    assert(t.read().count() == 240)
  }
}
