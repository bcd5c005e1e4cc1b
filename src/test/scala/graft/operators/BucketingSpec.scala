package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed-bucketed join runs without any shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val orders = Tables.load(spark, sf, "orders")
      val lineitem = Tables.load(spark, sf, "lineitem")
      Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_quantity", $"o_totalprice")

      assert(!Bucketing.hasShuffle(joined),
        "bucketed join should have no exchange:\n" +
          joined.queryExecution.executedPlan.toString)
      // and it computes the same thing as the plain join
      val plain = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed group-by on bucket key avoids the aggregation shuffle") {
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val orders = Tables.load(spark, sf, "orders")
      Bucketing.writeBucketed(orders, "b_orders_agg", "o_custkey", 4)
      val agg = spark.table("b_orders_agg")
        .groupBy($"o_custkey").agg(sum($"o_totalprice").as("spend"))
      assert(!Bucketing.hasShuffle(agg))
      assert(agg.count() == orders.select($"o_custkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
