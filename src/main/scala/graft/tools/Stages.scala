package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.DedupOps

object Stages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize","64k")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"wall=${(i.completionTime.get - i.submissionTime.get)/1000.0}%6.2f s " +
          f"cpu=${i.taskMetrics.executorRunTime/1000.0}%7.2f s  ${i.name}")
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    // args: query-name prefixes from SparkEntry.queries; default = the
    // dedup trio this tool was first built for
    val wanted = if (args.nonEmpty) args.toSeq else Seq("q32", "q33", "q34")
    val docs = Tables.load(spark, sfDir, "documents")
    val legacy = Map(
      "q32" -> (() => DedupOps.ngramJaccard(docs).count()),
      "q33" -> (() => DedupOps.minHashLsh(docs).count()),
      "q34" -> (() => DedupOps.simHashPairs(docs).count()))
    wanted.foreach { w =>
      val f: () => Unit = legacy.get(w).map(g => () => { g(); () })
        .getOrElse {
          val (name, fn) = graft.SparkEntry.queries
            .find(_._1.startsWith(w))
            .getOrElse(sys.error(s"no query matching $w"))
          () => { fn(spark, sfDir).count(); () }
        }
      println(s"=== $w run 1"); f()
      println(s"=== $w run 2"); f()
    }
    spark.stop()
  }
}
