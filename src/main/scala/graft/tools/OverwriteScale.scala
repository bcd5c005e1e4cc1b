package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lake.LakeTable

/** Scale evidence for the r14 dynamic partition overwrite (SQL
  * `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic`): the
  * 100 TB claim is that "rebuild yesterday" costs O(one partition) —
  * the rebuild's wall time tracks the TOUCHED partition's size, not
  * the table's, because the commit replaces whole files selected from
  * manifest metadata and writes only the incoming rows.
  *
  * Method: events subsets at 1x/4x/16x growth loaded into a
  * `days(ts)`-partitioned table whose DAY COUNT grows with size while
  * ONE fixed day keeps a constant row count (the rebuild target). At
  * each size: overwritePartitionsDynamic of that fixed day (min-of-3
  * in one JVM; the commit is re-applied with identical content, so
  * repeats measure the same work), plus a full-scan aggregate before
  * and after to pin correctness and show read cost unharmed. Reported:
  * table rows, files, partitions, rebuild seconds, replaced files.
  * Claim: rebuild seconds stay FLAT across the 16x table growth
  * (replaced-file selection is a metadata filter; write cost is the
  * fixed day's rows); the full-scan column grows with data size — the
  * table, not the rebuild, is the scaling term. */
object OverwriteScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val dir = java.nio.file.Files.createTempDirectory("owscale")

    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("timestamp").as("ts"))
      .localCheckpoint()
    println(s"[owscale] events ${ev.count()} rows, $sfDir")
    println("[owscale] size  rows      files  days  rebuild(s)  " +
      "replaced  fullScan(s)")

    def minOf3(f: () => Unit): Double =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min

    for (frac <- Seq(16, 4, 1)) {
      // growth = MORE DAYS (the 100 TB axis). Day 0 — the rebuild
      // target — is the event_id % 256 == 0 slice, a CONSTANT row set
      // at every size (the frac subsets nest: % 256 == 0 implies
      // % 16 == 0); the remaining rows spread over a day count that
      // grows 16x, so the TABLE grows while the rebuilt partition
      // does not.
      val days = 8 * (16 / frac)
      val rows = ev.filter(col("event_id") % frac === 0L)
        .withColumn("ts", expr(
          "timestampadd(DAY, CAST(CASE WHEN event_id % 256 = 0 " +
            s"THEN 0 ELSE 1 + event_id % ${days - 1} END AS INT), " +
            "TIMESTAMP'2026-01-01 00:00:00')"))
      val t = LakeTable.create(spark, s"$dir/t$frac", rows.schema,
        partitionBy = Seq("days(ts)"))
      // several appends -> multiple files per day dir
      (0 until 4).foreach(b =>
        t.append(rows.filter(col("user_id") % 4 === b)))
      val n = t.read().count()
      val files0 = t.dataFiles.size
      // the FIXED day: event_id % days == 0 -> 2026-01-01, whose row
      // count is ~constant across sizes (event_id % frac == 0 subsets
      // nest; day-0 membership is the same modulus family)
      val day0 = rows.filter(expr("CAST(ts AS DATE) = DATE'2026-01-01'"))
        .filter(col("user_id") % 7 =!= 3) // the "re-curation"
        .localCheckpoint()
      val day0n = day0.count()
      // first rebuild replaces the original multi-file day dir; the
      // timed min-of-3 measures the steady-state rebuild
      val before0 = t.dataFiles.map(_.path).toSet
      t.overwritePartitionsDynamic(day0)
      val replaced =
        before0.count(p => !t.dataFiles.map(_.path).toSet(p))
      val rebuild = minOf3 { () =>
        t.overwritePartitionsDynamic(day0)
      }
      val scan = minOf3 { () =>
        t.read().agg(sum("value"), count(lit(1))).collect()
      }
      println(f"[owscale] 1/$frac%-4d $n%-9d $files0%-6d $days%-5d " +
        f"$rebuild%-11.2f $replaced%-9d $scan%.2f   (day0=$day0n rows)")
    }
    spark.stop()
  }
}
