package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.DedupOps

/** Dev-only stage-by-stage profiler for the heavy dedup operators. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.load(spark, sfDir, "documents")
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      time("shingleHashArrays")(DedupOps.shingleHashArrays(docs).count())
      val sh = DedupOps.shingleHashArrays(docs)
        .select(col("doc_id"), size(col("shs")).as("n"),
          explode(col("shs")).as("shingle"))
      time("explode")(sh.count())
      val byShingle = sh.groupBy(col("shingle"))
        .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
        .filter(size(col("ds")) > 1)
      time("byShingle")(byShingle.count())
      val combos = byShingle.select(
        graft.functions.PairExplode.pair_explode(sort_array(col("ds")))
          .as(Seq("d1", "n1", "d2", "n2")))
      time("combos")(combos.count())
      time("pairAgg")(combos.groupBy(col("d1"), col("d2"), col("n1"),
        col("n2")).agg(count(lit(1))).count())
      time("full ngramJaccard")(DedupOps.ngramJaccard(docs).count())
      time("full minHashLsh")(DedupOps.minHashLsh(docs).count())
      time("simHash")(DedupOps.simHash(docs).count())
      time("full simHashPairs")(DedupOps.simHashPairs(docs).count())
    }
    spark.stop()
  }
}
