package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for plan-shape auditing.
  * Usage: runMain graft.tools.Plans [queryPrefix ...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) Set("q01", "q02", "q03", "q04", "q39")
                 else args.toSet
    // KERNEL frames: plans of hot operator kernels that a query's own
    // captured plan cannot show because the query localCheckpoints the
    // kernel's output (the checkpoint truncates lineage to a Scan
    // ExistingRDD). `kernel_q95_sketch` is the SimHash sketch frame
    // (DedupOps.simHash — the md5Tokens64 token-hash kernel) exactly
    // as q95 computes it before sketchesAgainstIndex checkpoints it.
    val kernels: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "kernel_q95_sketch" -> (() => graft.operators.DedupOps.simHash(
        graft.Tables.load(spark, sfDir, "documents"))))
    kernels.filter { case (n, _) => wanted.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"\n===================== $name =====================")
        fn().explain("formatted")
      }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"\n===================== $name =====================")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
