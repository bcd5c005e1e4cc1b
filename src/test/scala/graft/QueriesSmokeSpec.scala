package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs and returns rows at sf0.001; entry()
  * returns rows (the driver's smoke contract). Value-level correctness
  * is covered by the DuckDB oracle gate (tools/compare_oracle.py). */
class QueriesSmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("every query is oracled except the documented no-oracle set") {
    // a typo'd or forgotten oracle key silently downgrades a query to
    // the driver's weaker rows-only check — keep the exception list
    // EXPLICIT so that can't happen unnoticed
    // (q24 left this list in round 8: its graded output became the
    // exact distinct counts plus per-engine tolerance booleans, so
    // all three driver checks bind again)
    // (q34/q95 left this list in round 8: the SimHash token hash moved
    // from xxhash64 to md5's top 64 bits — well-mixed AND reproducible
    // in any engine — so DuckDB recomputes the exact sketch and both
    // queries carry full oracles. q44 left in round 7 via Rabin-Karp;
    // q24 via the tolerance-band reformulation.)
    val documentedNoOracle = Set(
      "q41_ann_lsh",            // seeded random-projection buckets
      "q45_ann_ivf",            // seeded k-means centroids
      "q60_ann_ivf_persisted",  // same seeded centroids
      "q79_bpe_merges",         // iterative argmax, not one SQL query
      "q91_ann_ivf_batch")      // same seeded centroids as q45/q60
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == documentedNoOracle,
      s"undocumented no-oracle queries: ${unoracled -- documentedNoOracle}; " +
        s"stale exceptions: ${documentedNoOracle -- unoracled}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("approx distinct within rsd of exact counts (q24's no-oracle bound)") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = operators.Relational.approxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // rsd = 0.02 configured; allow 5 sigma
    approx.foreach { case (k, (ap, as_)) =>
      val (ep, es) = exact(k)
      assert(math.abs(ap - ep).toDouble / ep <= 0.1, s"$k parts: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es <= 0.1, s"$k supps: $as_ vs $es")
    }
  }
}
