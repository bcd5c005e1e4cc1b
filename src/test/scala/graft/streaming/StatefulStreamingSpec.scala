package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.SparkSuite

/** SURVEY §2.2 streaming row: session windows, dedup-within-watermark,
  * custom state via flatMapGroupsWithState. */
class StatefulStreamingSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("session_window merges events within gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sessions").start()
    input.addData(
      (t("2024-01-01 10:00:00"), 1L),
      (t("2024-01-01 10:05:00"), 1L),  // same session (gap < 10m)
      (t("2024-01-01 10:30:00"), 1L),  // new session
      (t("2024-01-01 10:06:00"), 2L))
    q.processAllAvailable()
    val got = spark.table("sessions")
      .select($"user_id", $"n").as[(Long, Long)].collect().sorted.toSeq
    q.stop()
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    input.addData(
      (t("2024-01-01 10:00:00"), 100L),
      (t("2024-01-01 10:00:30"), 100L),  // duplicate id within watermark
      (t("2024-01-01 10:01:00"), 101L))
    q.processAllAvailable()
    assert(spark.table("dedup_stream").count() == 2)
    q.stop()
  }

  test("mapGroupsWithState emits one updated row per key per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val latest = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val mx = (rows.map(_._2) ++ state.getOption.iterator).max
          state.update(mx)
          (key, mx)
      }.toDF("k", "max_seen")
    val q = latest.writeStream.outputMode("update")
      .format("memory").queryName("mgws").start()
    input.addData((1L, 5L), (1L, 3L), (2L, 7L))
    q.processAllAvailable()
    input.addData((1L, 4L)) // below running max; state must hold 5
    q.processAllAvailable()
    val last = spark.table("mgws").filter($"k" === 1)
      .orderBy($"max_seen".desc).limit(1).as[(Long, Long)].head()
    q.stop()
    assert(last == (1L, 5L))
  }

  test("flatMapGroupsWithState maintains running per-key counters") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val counted = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          Iterator((key, n, s))
      }.toDF("user_id", "n", "total")
    val q = counted.writeStream.outputMode("append")
      .format("memory").queryName("counters").start()
    input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
    q.processAllAvailable()
    input.addData((1L, 1.0))
    q.processAllAvailable()
    val last = spark.table("counters")
      .filter($"user_id" === 1).orderBy($"n".desc).limit(1)
      .as[(Long, Long, Double)].head()
    q.stop()
    assert(last == (1L, 3L, 16.0)) // state carried across micro-batches
  }
}
