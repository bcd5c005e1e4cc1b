package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsOf picks latest right row at-or-before each left time") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 11:00:00"), "r2"),
      (1L, ts("2024-01-01 12:30:00"), "r3"),
      (2L, ts("2024-01-01 09:30:00"), "late")
    ).toDF("k2", "t2", "payload")

    val got = AsOfJoin.leftAsOf(left, right, "k", "t", "k2", "t2",
        Seq("payload"))
      .orderBy("k", "t")
      .select("k", "payload").as[(Long, Option[String])].collect().toSeq

    assert(got == Seq(
      (1L, Some("r1")), // 10:00 -> 09:30 match
      (1L, Some("r2")), // 12:00 -> 11:00, NOT 12:30 (future)
      (2L, None)))      // 09:00 has no prior right row
  }

  test("equal timestamps are inclusive (right sorts before left)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "same"))
      .toDF("k2", "t2", "payload")
    val got = AsOfJoin.leftAsOf(left, right, "k", "t", "k2", "t2",
        Seq("payload")).select("payload").as[String].collect()
    assert(got.toSeq == Seq("same"))
  }

  test("empty right side leaves all left rows with null payload") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("k2", "t2", "payload")
    val got = AsOfJoin.leftAsOf(left, right, "k", "t", "k2", "t2",
        Seq("payload")).select("k", "payload")
      .as[(Long, Option[String])].collect().toSeq
    assert(got == Seq((1L, None)))
  }

  test("multiple payload columns survive intact") {
    val left = Seq((7L, ts("2024-01-01 10:00:00"), "L"))
      .toDF("k", "t", "tag")
    val right = Seq((7L, ts("2024-01-01 09:00:00"), 42L, 1.5))
      .toDF("k2", "t2", "rid", "v")
    val got = AsOfJoin.leftAsOf(left, right, "k", "t", "k2", "t2",
        Seq("rid", "v"))
      .select("k", "tag", "rid", "v")
      .as[(Long, String, Long, Double)].collect()
    assert(got.toSeq == Seq((7L, "L", 42L, 1.5)))
  }
}
