package graft.operators

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

import graft.{SparkSuite, Tables}

class SkewAndSourcesSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join under a hot key") {
    val hot = (1 to 1000).map(i => (7L, s"row$i")) ++
      (1 to 10).map(i => (i.toLong, s"cold$i"))
    val left = hot.toDF("k", "payload")
    val right = Seq((7L, "dim7"), (1L, "dim1"), (99L, "dimX"))
      .toDF("rk", "name")
    val plain = left.join(right, $"k" === $"rk")
      .select($"k", $"payload", $"name")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "rk", factor = 8)
      .select($"k", $"payload", $"name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.agg(countDistinct($"l_partkey")).as[Long].head()
    val approx = li.agg(approx_count_distinct($"l_partkey", rsd = 0.02))
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("orc source round-trips, and <=> (null-safe equality) works") {
    val ev = Tables.load(spark, sf, "events")
      .select($"event_id", $"event_type", $"value")
    val base = tmpDir("orc")
    ev.write.orc(base)
    assert(spark.read.orc(base).count() == ev.count())

    val withNulls = Seq((Some(1L), Some(1L)), (None, None),
      (Some(2L), None)).toDF("a", "b")
    assert(withNulls.filter($"a" <=> $"b").count() == 2) // 1=1 and null<=>null
    assert(withNulls.filter($"a" === $"b").count() == 1)
  }

  test("csv and json sources round-trip the events table") {
    val ev = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val base = tmpDir("formats")
    ev.write.option("header", "true").csv(s"$base/csv")
    ev.write.json(s"$base/json")
    val csvBack = spark.read.option("header", "true").schema(ev.schema)
      .csv(s"$base/csv")
    val jsonBack = spark.read.schema(ev.schema).json(s"$base/json")
    assert(csvBack.count() == ev.count())
    assert(jsonBack.count() == ev.count())
    assert(csvBack.agg(sum($"value")).as[Double].head() ===
      ev.agg(sum($"value")).as[Double].head() +- 0.01)
    assert(jsonBack.agg(sum($"value")).as[Double].head() ===
      ev.agg(sum($"value")).as[Double].head() +- 0.01)
  }

  test("Q21-shape waiting suppliers: plans the EXISTS/NOT EXISTS pair " +
    "as semi + anti equi-joins, no cartesian product anywhere") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, CartesianProductExec}
    def flat(pl: SparkPlan): Seq[SparkPlan] = {
      val kids = pl match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case o                        => o.children
      }
      (pl +: kids.flatMap(flat)) ++ pl.subqueries.flatMap(flat)
    }
    for (df <- Seq(Relational.waitingSuppliers(spark, sf),
                   Relational.topCustomerOrders(spark, sf),
                   Relational.excessVolumeSuppliers(spark, sf),
                   Relational.orderPriorityCheck(spark, sf))) {
      assert(df.count() > 0)
      val nodes = flat(df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        "correlated-exists shapes must never plan a cartesian")
      val joinTypes = nodes.collect {
        case j: BaseJoinExec => j.joinType.toString.toLowerCase
      }
      assert(joinTypes.exists(_.contains("semi")),
        s"expected a semi join in $joinTypes")
    }
    // the anti side is specific to the Q21 shape
    val nodes = flat(Relational.waitingSuppliers(spark, sf)
      .queryExecution.executedPlan)
    val joinTypes = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        j.joinType.toString.toLowerCase
    }
    assert(joinTypes.exists(_.contains("anti")),
      s"expected an anti join in $joinTypes")
  }

  test("Q2/Q13/Q17/Q22 shapes: correlated scalar aggregates " +
    "decorrelate to equi-joins (no cartesian, no re-execution); the " +
    "outer and anti structures plan as declared") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, CartesianProductExec}
    def flat(pl: SparkPlan): Seq[SparkPlan] = {
      val kids = pl match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case o                        => o.children
      }
      (pl +: kids.flatMap(flat)) ++ pl.subqueries.flatMap(flat)
    }
    def joins(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      assert(df.count() > 0)
      val nodes = flat(df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        "decorrelated shapes must never plan a cartesian:\n" +
          df.queryExecution.executedPlan)
      nodes.collect {
        case j: BaseJoinExec => j.joinType.toString.toLowerCase
      }
    }
    // Q2: the correlated MIN becomes an aggregate joined back (inner)
    assert(joins(Relational.minCostSupplier(spark, sf))
      .count(_ == "inner") >= 4)
    // Q13: zero-order customers must survive — a real outer join
    val q13 = Relational.customerDistribution(spark, sf)
    assert(joins(q13).exists(_.contains("outer")))
    assert(q13.filter($"c_count" === 0).count() > 0 ||
      spark.read.parquet(s"$sf/customer.parquet").count() ==
        spark.read.parquet(s"$sf/orders.parquet")
          .select($"o_custkey").distinct().count())
    // Q17: the correlated AVG decorrelates into an aggregate + join
    assert(joins(Relational.smallQuantityLines(spark, sf)).nonEmpty)
    // Q22: NOT EXISTS plans as an anti equi-join
    assert(joins(Relational.inactiveRichCustomers(spark, sf))
      .exists(_.contains("anti")))
    // Q11: the fraction threshold arrives as a broadcast SCALAR
    // subquery into the filter, never a join back of the aggregate
    // (rows survive above AND below it, so the filter really binds)
    val q11 = Relational.importantStock(spark, sf)
    assert(q11.count() > 0)
    val q11Nodes = flat(q11.queryExecution.executedPlan)
    assert(!q11Nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(q11.queryExecution.executedPlan.toString.contains("scalar-subquery") ||
      q11Nodes.flatMap(_.subqueries).nonEmpty,
      "the Q11 threshold must plan as a scalar subquery:\n" +
        q11.queryExecution.executedPlan)
    // Q16: NOT IN over the exclusion list plans as an anti join, and
    // count(DISTINCT) keeps a grouped (not global) aggregate
    assert(joins(Relational.supplierPartCount(spark, sf))
      .exists(_.contains("anti")))
  }

  test("Q7/Q8/Q9/Q15/Q19 shapes: star dimensions broadcast, no " +
    "cartesian anywhere, and the Q19 cross-table OR pushes its " +
    "per-table residue into BOTH scans") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    def flat(pl: SparkPlan): Seq[SparkPlan] = {
      val kids = pl match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case o                        => o.children
      }
      (pl +: kids.flatMap(flat)) ++ pl.subqueries.flatMap(flat)
    }
    def nodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
      assert(df.count() > 0)
      val ns = flat(df.queryExecution.executedPlan)
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        s"no cartesian allowed:\n${df.queryExecution.executedPlan}")
      ns
    }
    // Q7/Q8/Q9: the multi-way star plans its dimensions as broadcast
    // joins (nation/region/supplier/part are all tiny next to the
    // fact shuffles)
    assert(nodes(Relational.volumeShipping(spark, sf))
      .count(_.isInstanceOf[BroadcastHashJoinExec]) >= 3)
    assert(nodes(Relational.marketShare(spark, sf))
      .count(_.isInstanceOf[BroadcastHashJoinExec]) >= 4)
    assert(nodes(Relational.productProfit(spark, sf))
      .count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2)
    // Q15: the revenue view's scalar max arrives as a subquery, not a
    // join back through a second aggregation of lineitem
    nodes(Relational.topSupplier(spark, sf))
    // Q19: each side's scan carries its derived OR-residue — part
    // must not read rows outside the three brands, lineitem must not
    // read quantities no disjunct accepts
    val q19 = Relational.discountedRevenue(spark, sf)
    val scans = nodes(q19).collect { case f: FileSourceScanExec => f }
    val partScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("part.parquet"))).get
    val lineScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("lineitem.parquet"))).get
    assert(partScan.metadata("PushedFilters").contains("Or("),
      s"part scan must carry the brand/size OR-residue: " +
        partScan.metadata("PushedFilters"))
    assert(lineScan.metadata("PushedFilters").contains("Or("),
      s"lineitem scan must carry the quantity OR-residue: " +
        lineScan.metadata("PushedFilters"))
  }
}
