package graft.tools

import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingQueries

/** Dev tool (VERDICT r16 item 4): A/B the HDFS-backed state store
  * against RocksDB + changelog checkpointing on the engine's stateful
  * shapes — a windowed aggregation (q50's) and a stream-stream
  * interval join (q73's) — alternated in one JVM, reporting wall AND
  * the structural number the fsync pressure rides on: files written
  * under the checkpoint dir. Usage: runMain graft.tools.StateStoreAb */
object StateStoreAb {
  private def countFiles(dir: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(dir)) return 0L
    val s = java.nio.file.Files.walk(dir)
    try s.filter(p => java.nio.file.Files.isRegularFile(p)).count()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/events.parquet").limit(1).count()

    val Rocks = "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider"
    val Hdfs = "org.apache.spark.sql.execution.streaming.state" +
      ".HDFSBackedStateStoreProvider"

    def withProvider[T](p: String)(body: => T): T = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val ck = "spark.sql.streaming.stateStore.rocksdb" +
        ".changelogCheckpointing.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, p)
      spark.conf.set(ck, (p == Rocks).toString)
      try body finally spark.conf.set(key, prev)
    }

    def tumbling(tag: String): (Double, Long) = {
      val qname = s"ssab_t_$tag" + UUID.randomUUID().toString.take(8)
      val ckpt = java.nio.file.Paths.get(s"/root/repo/target/ckpt/$qname")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val t0 = System.nanoTime()
      try {
        val agg = StreamingQueries.eventsStream(spark, sfDir)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(qname)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(qname).count()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      ((System.nanoTime() - t0) / 1e9, countFiles(ckpt))
    }

    def join(tag: String): (Double, Long) = {
      val qname = s"ssab_j_$tag" + UUID.randomUUID().toString.take(8)
      val ckpt = java.nio.file.Paths.get(s"/root/repo/target/ckpt/$qname")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val t0 = System.nanoTime()
      try {
        val clicks = StreamingQueries.eventsStream(spark, sfDir)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
          .withWatermark("c_ts", "1 hour")
        val purchases = StreamingQueries.eventsStream(spark, sfDir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"), col("value"))
          .withWatermark("p_ts", "1 hour")
        val joined = purchases.join(clicks, expr(
          """p_user = c_user AND
            |c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts""".stripMargin))
        val q = joined.writeStream.outputMode("append")
          .format("memory").queryName(qname)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(qname).count()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      ((System.nanoTime() - t0) / 1e9, countFiles(ckpt))
    }

    for (rep <- 1 to 3; (pname, p) <- Seq("hdfs" -> Hdfs, "rocks" -> Rocks)) {
      withProvider(p) {
        val (tw, tf) = tumbling(pname)
        val (jw, jf) = join(pname)
        println(f"[ssab] rep=$rep provider=$pname%-5s " +
          f"tumbling ${tw}%6.2f s ($tf files)  join ${jw}%6.2f s ($jf files)")
      }
    }
    spark.stop()
  }
}
