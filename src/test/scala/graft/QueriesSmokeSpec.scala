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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }
}
