package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ZOrderKeySpec extends SparkSuite {
  import spark.implicits._
  import ZOrderKey.zorder_key

  // independent reference implementation of the 2-D Morton interleave
  // over the low 32 bits of each dimension
  private def ref2(a: Long, b: Long): Long = {
    var out = 0L
    (0 until 32).foreach { i =>
      out |= ((a >>> (31 - i)) & 1L) << (63 - (i * 2))
      out |= ((b >>> (31 - i)) & 1L) << (63 - (i * 2 + 1))
    }
    out
  }

  test("codegen'd key matches the reference interleave across the " +
    "domain") {
    val vals = Seq(0L, 1L, 2L, 7L, 255L, 1L << 20, (1L << 32) - 1)
    val pairs = for (a <- vals; b <- vals) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", zorder_key($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ref2(a, b), s"zorder_key($a, $b)")
    }
  }

  test("curve order clusters quadrants: first 16 of an 8x8 grid are " +
    "the low quadrant") {
    val grid = for (a <- 0L until 8L; b <- 0L until 8L) yield (a, b)
    val keyed = grid.toDF("a", "b")
      .select($"a", $"b", zorder_key($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val firstQuad = keyed.take(16)
    assert(firstQuad.forall { case (a, b, _) => a < 4 && b < 4 },
      firstQuad.mkString(","))
  }

  test("3-column keys, int inputs, nulls-as-zero, and arity/type guards") {
    // 3 dims: 21 bits each; a distinguishing low bit still separates
    val z3 = Seq((0L, 0L, 0L), (0L, 0L, 1L), (1L, 0L, 0L))
      .toDF("a", "b", "c")
      .select(zorder_key($"a", $"b", $"c").as("z")).as[Long].collect()
    assert(z3(0) < z3(1) && z3(1) < z3(2))
    // int inputs accepted, equal to long inputs of the same value
    val zi = Seq((3, 5L)).toDF("i", "l")
      .select(zorder_key($"i", $"l")).as[Long].head()
    assert(zi == ref2(3L, 5L))
    // null keys as 0: sorts with the dimension minimum, never crashes
    val withNull = Seq((Some(5L), 5L), (None, 5L)).toDF("a", "b")
      .select(zorder_key($"a", $"b").as("z")).as[Long].collect()
    assert(withNull(1) == ref2(0L, 5L))
    intercept[Exception] {
      Seq(1L).toDF("a").select(zorder_key($"a")).collect()
    }
    intercept[Exception] {
      Seq(("x", 1L)).toDF("s", "a")
        .select(zorder_key($"s", $"a")).collect()
    }
  }
}
