package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.lake.LakeCatalog

/** Throughput evidence for the r14 streaming WRITE surface
  * (`df.writeStream.toTable("graft.ns.t")`): the claim is that the
  * public SQL-face route costs the SAME as the engine's own
  * programmatic MV loop — both land one transactional
  * `appendExactlyOnce` commit per epoch, so the strategy delegation
  * (marker staging + MicroBatchWrite.commit callback + the planned
  * child re-wrap) must add only planning noise, not per-row or
  * per-epoch I/O.
  *
  * Method: the SAME workload (20 epochs x 10k rows from a
  * MemoryStream, AvailableNow drains of one batch each) written (a)
  * through `writeStream.toTable` on an extensions session and (b)
  * through the programmatic `MVManager.startToLake`-equivalent
  * (foreachBatch -> appendExactlyOnce). Reported: total seconds,
  * epochs/s, rows/s, commits (must equal epochs — exactly-once), and
  * the ratio. Claim: ratio within noise of 1. */
object StreamWriteScale {
  private val Epochs =
    sys.env.getOrElse("SWSCALE_EPOCHS", "20").toInt
  private val RowsPerEpoch =
    sys.env.getOrElse("SWSCALE_ROWS", "10000").toInt

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val wh = java.nio.file.Files.createTempDirectory("swscale").toString
    spark.conf.set("spark.sql.catalog.sws", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sws.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sws.s")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def drive(run: (Int, org.apache.spark.sql.DataFrame) => Unit)
        : Double = {
      val mem = MemoryStream[Long]
      val df = mem.toDF().select(col("value").as("id"),
        (col("value") % 97).cast("double").as("v"))
      val t0 = System.nanoTime()
      (0 until Epochs).foreach { e =>
        mem.addData((e.toLong * RowsPerEpoch) until
          ((e + 1).toLong * RowsPerEpoch): _*)
        run(e, df)
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm both paths (file write + streaming machinery) before any
    // timed run, so first-use JIT/IO doesn't bias the first variant
    spark.sql("DROP TABLE IF EXISTS sws.s.warm")
    spark.sql("CREATE TABLE sws.s.warm (id BIGINT, v DOUBLE)")
    locally {
      val mem = MemoryStream[Long]
      mem.addData(0L until 1000L: _*)
      mem.toDF().select(col("value").as("id"), lit(0.0).as("v"))
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sws-w").toString)
        .trigger(Trigger.AvailableNow()).toTable("sws.s.warm")
        .awaitTermination()
    }

    // (a) the public surface: writeStream.toTable, one AvailableNow
    // drain per epoch (each drain = start + one batch + stop, so the
    // figure INCLUDES per-epoch query lifecycle — the realistic upper
    // bound; a long-running trigger amortizes it away)
    spark.sql("DROP TABLE IF EXISTS sws.s.sql_sink")
    spark.sql("CREATE TABLE sws.s.sql_sink (id BIGINT, v DOUBLE)")
    val ckptA = java.nio.file.Files.createTempDirectory("sws-a").toString
    val secA = drive { (_, df) =>
      df.writeStream.option("checkpointLocation", ckptA)
        .trigger(Trigger.AvailableNow()).toTable("sws.s.sql_sink")
        .awaitTermination()
    }
    val catA = new LakeCatalog(spark, wh).table("s", "sql_sink")
    val rowsA = catA.read().count()
    val commitsA = catA.currentVersion

    // (b) the engine's own loop: foreachBatch -> appendExactlyOnce
    // (what MVManager.startToLake runs per micro-batch), same drains
    spark.sql("DROP TABLE IF EXISTS sws.s.prog_sink")
    spark.sql("CREATE TABLE sws.s.prog_sink (id BIGINT, v DOUBLE)")
    val progT = new LakeCatalog(spark, wh).table("s", "prog_sink")
    val ckptB = java.nio.file.Files.createTempDirectory("sws-b").toString
    val secB = drive { (_, df) =>
      df.writeStream.option("checkpointLocation", ckptB)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                         id: Long) =>
          progT.appendExactlyOnce(batch, "sws-prog", id): Unit
        }
        .start().awaitTermination()
    }
    val rowsB = progT.read().count()

    val total = Epochs.toLong * RowsPerEpoch
    require(rowsA == total && rowsB == total,
      s"exactly-once violated: sql=$rowsA prog=$rowsB want $total")
    require(commitsA == Epochs,
      s"expected $Epochs commits on the SQL sink, saw $commitsA")
    println(f"[swscale] epochs $Epochs x $RowsPerEpoch rows")
    println(f"[swscale] writeStream.toTable   ${secA}%6.1f s  " +
      f"${Epochs / secA}%5.2f epochs/s  ${total / secA}%,.0f rows/s  " +
      f"commits $commitsA (exactly-once)")
    println(f"[swscale] foreachBatch+append   ${secB}%6.1f s  " +
      f"${Epochs / secB}%5.2f epochs/s  ${total / secB}%,.0f rows/s")
    println(f"[swscale] toTable/programmatic ratio ${secA / secB}%.2f " +
      "(1.0 = the SQL surface is free)")
    spark.stop()
  }
}
