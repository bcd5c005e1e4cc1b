package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run an arbitrary SEQUENCE of queries in one JVM and print
  * every individual wall time — the within-session A/B harness this
  * box's noisy-neighbor regimes require (cross-session comparisons
  * swing 3-5x; see BENCH_NOTES). Usage:
  *   runMain graft.tools.AbRepeat q183 q183 q182 q183 q183
  * Prefix match like Bench's SPARK_GRAFT_ONLY; repeats allowed. */
object AbRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // structural counters: jobs/stages/tasks and task-time are regime-
    // insensitive where wall clock on this box is not
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong)
          taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    args.zipWithIndex.foreach { case (w, i) =>
      val (name, fn) = SparkEntry.queries.toSeq.sortBy(_._1)
        .find(_._1.startsWith(w))
        .getOrElse(sys.error(s"no query matching $w"))
      val (j0, s0, t0c, m0) =
        (jobs.get(), stages.get(), tasks.get(), taskMs.get())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener bus drains asynchronously; give counters a beat
      Thread.sleep(250)
      println(f"[ab] #$i%02d $name $dt%.3f s " +
        f"jobs=${jobs.get() - j0} stages=${stages.get() - s0} " +
        f"tasks=${tasks.get() - t0c} taskSec=${(taskMs.get() - m0) / 1e3}%.1f")
    }
    spark.stop()
  }
}
