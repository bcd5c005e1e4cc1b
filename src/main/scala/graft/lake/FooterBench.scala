package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dev microbench: serial vs pooled driver footer reads over the same
  * freshly-written files, same JVM — the within-session A/B for the
  * footerMetas threading change (cross-session walls on this box swing
  * 3-5x; see BENCH_NOTES). Usage: runMain graft.lake.FooterBench */
object FooterBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-footerbench")
    val df = spark.range(100000)
      .select(col("id"), (col("id") % 97).cast("double").as("v"),
        concat(lit("row-"), col("id")).as("s"))
      .repartition(8)
    df.write.parquet(s"$dir/files")
    val schema: StructType = df.schema
    val conf = spark.sparkContext.hadoopConfiguration
    val paths = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dir/files"))
      .filter(_.toString.endsWith(".parquet"))
      .toArray.toSeq.map(_.toString)
      .map(p => java.nio.file.Paths.get(p).toUri.toString)
    println(s"[footer] files=${paths.length}")
    def serial(): Double = {
      val t0 = System.nanoTime()
      paths.foreach(p => LakeTable.footerMeta(p, schema, conf))
      (System.nanoTime() - t0) / 1e6
    }
    def pooled(): Double = {
      val t0 = System.nanoTime()
      val futs = paths.map(p => LakeTable.footerPool.submit(
        new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            LakeTable.footerMeta(p, schema, conf); ()
          }
        }))
      futs.foreach(_.get())
      (System.nanoTime() - t0) / 1e6
    }
    // warm both paths (FS cache, class init), then alternate
    serial(); pooled()
    val s = (1 to 10).map(_ => serial())
    val p = (1 to 10).map(_ => pooled())
    val s2 = (1 to 10).map(_ => serial())
    val p2 = (1 to 10).map(_ => pooled())
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[footer] serial median ${med(s ++ s2)}%.1f ms, " +
      f"pooled median ${med(p ++ p2)}%.1f ms")
    spark.stop()
  }
}
