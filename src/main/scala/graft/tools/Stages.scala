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
          f"cpu=${i.taskMetrics.executorRunTime/1000.0}%7.2f s  ${i.name.split(" at ").head}")
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    Seq("q32" -> (() => DedupOps.ngramJaccard(docs).count()),
        "q33" -> (() => DedupOps.minHashLsh(docs).count()),
        "q34" -> (() => DedupOps.simHashPairs(docs).count())).foreach {
      case (n, f) =>
        println(s"=== $n run 1"); f()
        println(s"=== $n run 2"); f()
    }
    spark.stop()
  }
}
