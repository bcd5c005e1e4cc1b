package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SURVEY §2.2 joins row, streaming half: stream-stream inner join with
  * watermarks + a time-range condition (the streaming form of the
  * as-of/interval join family). */
class StreamStreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-stream LEFT OUTER interval join (q171): click-less " +
    "purchases emit n_clicks = 0, the result equals the batch left " +
    "join, and the sentinel rows never leak") {
    val out = graft.streaming.StreamingQueries
      .streamOuterIntervalJoin(spark, sf).localCheckpoint()
    // sentinel hygiene: only real purchase ids appear
    assert(out.filter($"purchase_id" < 0).count() == 0)
    // the outer half actually fired: some purchases report zero clicks
    val zeros = out.filter($"n_clicks" === 0).count()
    assert(zeros > 0, "no unmatched purchase emitted a null row — " +
      "the watermark-eviction device did not fire")
    // exactness vs the batch left join
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type", $"value",
        col("ts").cast("timestamp").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"),
        $"ts".as("p_ts"), $"value")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("c_ts"))
    val expected = p.join(c, $"pu" === $"cu" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
        $"c_ts" <= $"p_ts", "left_outer")
      .groupBy($"purchase_id")
      .agg(count($"cu").as("n_clicks"), max($"value").as("value"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"purchase_id", $"n_clicks", $"value")
        .as[(Long, Long, Double)].collect().toSet
    assert(canon(out) == canon(expected))
  }

  test("stream-stream join matches purchases within the preceding hour") {
    implicit val sqlCtx = spark.sqlContext
    val errors = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]

    val e = errors.toDF().toDF("e_ts", "e_user", "e_id")
      .withWatermark("e_ts", "2 hours")
    val p = purchases.toDF().toDF("p_ts", "p_user", "p_id")
      .withWatermark("p_ts", "2 hours")

    val joined = e.join(p, expr(
      """e_user = p_user AND
        |p_ts >= e_ts - INTERVAL 1 HOUR AND p_ts <= e_ts""".stripMargin))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()

    purchases.addData(
      (t("2024-01-01 09:30:00"), 1L, 100L), // within window of e1
      (t("2024-01-01 07:00:00"), 1L, 101L), // too old
      (t("2024-01-01 09:45:00"), 2L, 102L)) // other user
    errors.addData((t("2024-01-01 10:00:00"), 1L, 900L))
    q.processAllAvailable()

    val got = spark.table("ss_join")
      .select($"e_id", $"p_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == Set((900L, 100L)))
  }
}
