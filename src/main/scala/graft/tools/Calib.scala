package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

object Calib {
  def t[T](l: String)(f: => T): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[calib] $l%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    (1 to 2).foreach { r =>
      println(s"--- round $r")
      t("raw count")(docs.count())
      t("split only")(docs.select(split(col("text"), " ").as("w")).selectExpr("sum(size(w))").collect())
      t("split+transform")(docs.select(expr("transform(sequence(0, size(split(text,' '))-3), i -> i)").as("x")).selectExpr("sum(size(x))").collect())
      t("shingles no distinct")(docs.select(expr("transform(sequence(0, size(split(text,' '))-3), i -> concat_ws(' ', slice(split(text,' '), i+1, 3)))").as("x")).selectExpr("sum(size(x))").collect())
      t("widened shingles no distinct")(Tables.widen(docs).select(expr("transform(sequence(0, size(split(text,' '))-3), i -> concat_ws(' ', slice(split(text,' '), i+1, 3)))").as("x")).selectExpr("sum(size(x))").collect())
      t("cpu 20M md5")(spark.range(20000000).selectExpr("max(xxhash64(cast(id as string)))").collect())
    }
    spark.stop()
  }
}
