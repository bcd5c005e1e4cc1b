package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench for the LakeTable commit path: N appends of an 8-file
  * batch into one table, per-append wall printed. Isolates write-job +
  * footer-read + manifest + commit-json cost from query noise.
  * Usage: runMain graft.tools.CommitBench [nAppends] [filesPerAppend] */
object CommitBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val filesPer = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-commitbench")
    val df = spark.range(100000)
      .select(col("id"), (col("id") % 97).cast("double").as("v"),
        concat(lit("row-"), col("id")).as("s"))
      .repartition(filesPer)
    val t = graft.lake.LakeTable.create(spark, s"$dir/t", df.schema)
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      t.append(df)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[commit] #$i%02d $dt%.3f s")
      dt
    }
    val sorted = times.sorted
    println(f"[commit] n=$n filesPer=$filesPer min=${sorted.head}%.3f " +
      f"median=${sorted(n / 2)}%.3f")
    spark.stop()
  }
}
