package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, Tables}

/** Hidden partitioning (Iceberg transform specs): the writer derives
  * the physical partition column, and RAW-column predicates prune
  * partition directories through the manifest layer — the reader never
  * names the layout. */
class HiddenPartitioningSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime
      .of(2024, 1, 1, 0, 0).plusDays(day).plusHours(hour)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")))

  test("days(ts): layout is day dirs, writer owns the derived column, " +
    "raw timestamp predicates prune files without naming the layout") {
    val rows = (0 until 200).map(i =>
      (i.toLong, ts(i % 10, i % 24), s"e-$i"))
    val df = rows.toDF("id", "ts", "payload")
    val t = LakeTable.create(spark, tmpDir("hp-days"), df.schema,
      partitionBy = Seq("days(ts)"))
    assert(t.partitionBy == Seq("_p_days_ts"))
    assert(t.partitionTransforms.map(_.spec) == Seq("days(ts)"))
    t.append(df)

    // physical layout: hive day dirs derived by the writer
    val dirs = t.dataFiles.map(_.path.split("/")
      .find(_.startsWith("_p_days_ts=")).get).distinct
    assert(dirs.size == 10, s"expected 10 day dirs, got $dirs")
    // derived value = floor(epochMicros / day) — UTC session
    val firstDay = Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime / 86400000L
    assert(dirs.map(_.stripPrefix("_p_days_ts=").toLong).sorted ==
      (firstDay until firstDay + 10).toSeq)

    // read-back: full content, derived column visible and correct
    assert(t.read().count() == 200)
    assert(t.read().filter(
      col("_p_days_ts") =!= expr(
        "CAST(unix_micros(ts) DIV 86400000000 AS INT)")).count() == 0)

    // pruning on the RAW column: equality and range both cut the
    // file set at the manifest layer (readWhere plans only the
    // surviving entries)
    val all = t.read().inputFiles.length
    val eq = t.readWhere(col("ts") === lit(ts(3, 5)))
    assert(eq.inputFiles.length < all,
      s"equality did not prune: ${eq.inputFiles.length} of $all")
    assert(eq.count() == rows.count { case (_, v, _) => v == ts(3, 5) })
    val range = t.readWhere(
      col("ts") >= lit(ts(2)) && col("ts") < lit(ts(4)))
    assert(range.inputFiles.length < all)
    assert(range.count() ==
      rows.count { case (_, v, _) =>
        !v.before(ts(2)) && v.before(ts(4)) })
    // a day-interior bound still keeps its boundary day (inclusive
    // relaxation, never a wrong prune)
    val tight = t.readWhere(col("ts") > lit(ts(8, 12)))
    assert(tight.count() ==
      rows.count { case (_, v, _) => v.after(ts(8, 12)) })
  }

  test("truncate(n, string) and truncate(n, long): prefix/floor dirs, " +
    "raw predicates prune, integer floor uses negative-safe semantics") {
    val rows = (0 until 120).map(i =>
      (i.toLong - 60, f"k${i % 6}%s-${i}%03d"))
    val df = rows.toDF("n", "s")
    val t = LakeTable.create(spark, tmpDir("hp-trunc"), df.schema,
      partitionBy = Seq("truncate(2,s)", "truncate(50,n)"))
    t.append(df)
    assert(t.partitionBy == Seq("_p_trunc2_s", "_p_trunc50_n"))
    assert(t.read().count() == 120)
    // string prefix dirs k0..k5 -> 2-char prefixes k0..k5
    val sDirs = t.dataFiles.map(_.path.split("/")
      .find(_.startsWith("_p_trunc2_s=")).get).distinct
    assert(sDirs.size == 6)
    // integer floor toward negative infinity: -60 lands in -100, not 0
    val nDirs = t.dataFiles.map(_.path.split("/")
      .find(_.startsWith("_p_trunc50_n=")).get
      .stripPrefix("_p_trunc50_n=").toLong).distinct.sorted
    assert(nDirs == Seq(-100L, -50L, 0L, 50L))
    val all = t.read().inputFiles.length
    val byPrefix = t.readWhere(col("s") === "k3-057")
    assert(byPrefix.inputFiles.length < all)
    assert(byPrefix.count() == 1)
    val byRange = t.readWhere(col("n") >= 10L && col("n") < 40L)
    assert(byRange.inputFiles.length < all)
    assert(byRange.count() == 30)
    val byIn = t.readWhere(col("n").isin(-55L, 5L))
    assert(byIn.inputFiles.length < all)
    assert(byIn.count() == 2)
  }

  test("months(ts) + mixed identity partition") {
    val rows = (0 until 90).map(i =>
      (i.toLong, ts(i), if (i % 2 == 0) "a" else "b"))
    val df = rows.toDF("id", "ts", "side")
    val t = LakeTable.create(spark, tmpDir("hp-months"), df.schema,
      partitionBy = Seq("months(ts)", "side"))
    t.append(df)
    assert(t.partitionBy == Seq("_p_months_ts", "side"))
    // Jan/Feb/Mar 2024 = months 648..650 since epoch
    val mDirs = t.dataFiles.map(_.path.split("/")
      .find(_.startsWith("_p_months_ts=")).get
      .stripPrefix("_p_months_ts=").toInt).distinct.sorted
    assert(mDirs == Seq(648, 649, 650))
    val all = t.read().inputFiles.length
    val feb = t.readWhere(col("ts") >= lit(ts(31)) &&
      col("ts") < lit(ts(60)) && col("side") === "a")
    assert(feb.inputFiles.length < all)
    assert(feb.count() == rows.count { case (i, v, sd) =>
      !v.before(ts(31)) && v.before(ts(60)) && sd == "a" })
  }

  test("upsert and compaction recompute/preserve derived columns; " +
    "rename/drop of a transform source is blocked; MOR delete composes") {
    val rows = (0 until 100).map(i => (i.toLong, ts(i % 5), s"v-$i"))
    val df = rows.toDF("id", "ts", "v")
    val t = LakeTable.create(spark, tmpDir("hp-ops"), df.schema,
      partitionBy = Seq("days(ts)"))
    t.append(df)
    // upsert moves a row to a NEW day: the derived column recomputes
    // and the row physically lands in the new day dir
    t.upsert(Seq((7L, ts(9), "moved")).toDF("id", "ts", "v"), Seq("id"))
    assert(t.read().count() == 100)
    val moved = t.readWhere(col("ts") === lit(ts(9)))
    assert(moved.filter(col("id") === 7L).count() == 1)
    val dayDirs = t.dataFiles.filter(_.path.contains(
      s"_p_days_ts=${Timestamp.valueOf("2024-01-10 00:00:00")
        .getTime / 86400000L}"))
    assert(dayDirs.nonEmpty, "upserted row did not land in its day dir")
    // compaction keeps the layout and the content
    t.compact(1)
    assert(t.read().count() == 100)
    assert(t.readWhere(col("ts") === lit(ts(9)))
      .filter(col("id") === 7L).count() == 1)
    // schema-evolution guards
    intercept[IllegalArgumentException] { t.renameColumn("ts", "t2") }
    intercept[IllegalArgumentException] { t.dropColumn("ts") }
    // MOR delete on a transform-partitioned table
    t.deleteWherePositional(col("id") < 10L)
    assert(t.read().count() == 90)
    assert(t.readWhere(col("ts") === lit(ts(0)))
      .filter(col("id") < 10L).count() == 0)
  }

  test("string truncation counts CODE POINTS (supplementary chars) " +
    "and NTZ sources derive wall-clock days — both without consulting " +
    "the session timezone") {
    // U+1D7D8: one code point, two UTF-16 units — writer substring()
    // counts code points, so the pruner's mapping must agree exactly
    // (tested against Spark's own substring, since this container's
    // filesystem jnu encoding cannot hold such dir names on disk)
    val s0 = new String(Character.toChars(0x1D7D8))
    val tr = LakeTable.TruncateTransform("s", 2,
      org.apache.spark.sql.types.StringType)
    for (v <- Seq(s0 + "ab", s0, "ab", "zz-plain", s0 + s0 + s0)) {
      val sparkTrunc = Seq(Tuple1(v)).toDF("s")
        .selectExpr("substring(s, 1, 2)").as[String].head()
      assert(tr.mapValue(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType).contains(sparkTrunc),
        s"mapValue disagrees with Spark substring for ${v.length}-unit input")
    }
    // ...and string transforms never serve RANGE prunes (UTF-16 vs
    // UTF-8 ordering hazard), only equality/IN
    assert(!tr.rangeSafe)
    assert(LakeTable.TruncateTransform("n", 50,
      org.apache.spark.sql.types.LongType).rangeSafe)
    // NTZ day/month transforms read wall-clock fields (CAST AS DATE),
    // never unix_micros-of-session-zoned casts
    val ntz = Seq("2024-01-03 23:30:00", "2024-01-04 00:30:00",
        "2024-02-01 12:00:00")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "st")
      .select($"id", to_timestamp_ntz($"st").as("ts"))
    val t2 = LakeTable.create(spark, tmpDir("hp-ntz"), ntz.schema,
      partitionBy = Seq("days(ts)", "months(ts)"))
    t2.append(ntz)
    val base = java.time.LocalDate.of(2024, 1, 3).toEpochDay.toInt
    val dayDirs = t2.dataFiles.map(_.path.split("/")
      .find(_.startsWith("_p_days_ts=")).get
      .stripPrefix("_p_days_ts=").toInt).distinct.sorted
    assert(dayDirs == Seq(base, base + 1,
      java.time.LocalDate.of(2024, 2, 1).toEpochDay.toInt))
    val monthDirs = t2.dataFiles.map(_.path.split("/")
      .find(_.startsWith("_p_months_ts=")).get
      .stripPrefix("_p_months_ts=").toInt).distinct.sorted
    assert(monthDirs == Seq(648, 649))
    assert(t2.readWhere(
      $"ts" === to_timestamp_ntz(lit("2024-01-04 00:30:00")))
      .count() == 1)
  }

  test("transform-partitioned lake scan still plans from manifests " +
    "with partition-level pruning visible to Catalyst") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val rows = (0 until 80).map(i => (i.toLong, ts(i % 8), s"p-$i"))
    val t = LakeTable.create(spark, tmpDir("hp-plan"),
      rows.toDF("id", "ts", "v").schema,
      partitionBy = Seq("days(ts)"))
    t.append(rows.toDF("id", "ts", "v"))
    // Catalyst ALSO prunes on the derived column when named directly
    val direct = t.read().filter(col("_p_days_ts") ===
      (Timestamp.valueOf("2024-01-03 00:00:00").getTime / 86400000L))
    val scan = direct.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s }.get
    val allParts = t.read().queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s }.get
      .selectedPartitions.partitionCount
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of $allParts partitions")
    assert(direct.count() == 10)
  }
}
