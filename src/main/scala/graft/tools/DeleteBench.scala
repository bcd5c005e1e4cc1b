package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench for the POSITIONAL-DELETE commit path (writeDeleteFiles:
  * delete-file write + read-back + manifest + commit-json): one table
  * of `filesPer` data files, then N positional-delete commits, each
  * deleting a disjoint ~1/(2N) slice of the rows so every commit does
  * comparable work and MOR state stays small. Per-delete wall printed;
  * compare min/median across trees (alternated runs — this box's
  * regimes swing, see BENCH_NOTES).
  * Usage: runMain graft.tools.DeleteBench [nDeletes] [filesPerTable] */
object DeleteBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val filesPer = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-delbench")
    val df = spark.range(200000)
      .select(col("id"), (col("id") % 97).cast("double").as("v"),
        concat(lit("row-"), col("id")).as("s"))
      .repartition(filesPer)
    val t = graft.lake.LakeTable.create(spark, s"$dir/t", df.schema)
    t.append(df)
    // warm the scan/codegen paths outside timing
    t.read().filter(col("id") % 1000 === 999).count()
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      t.deleteWherePositional(col("id") % lit(2 * n) === lit(i - 1))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[delete] #$i%02d $dt%.3f s")
      dt
    }
    val sorted = times.sorted
    println(f"[delete] n=$n filesPer=$filesPer min=${sorted.head}%.3f " +
      f"median=${sorted(n / 2)}%.3f")
    spark.stop()
  }
}
