package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum

/** Order-independent summation banding for float columns.
  *
  * Double addition is not associative, so a raw `sum(DOUBLE)` depends
  * on accumulation order — which at the lake/streaming surface depends
  * on FILE LAYOUT (how an append was partitioned, what compaction did,
  * which micro-batch a row landed in). Two engines reading the same
  * logical table can then differ in the last few ULPs, which the
  * driver's exact hash treats as a wrong answer (q156, round 10).
  *
  * The fix (the q105/q24 pattern, applied here as a reusable device):
  * cast each addend to DECIMAL before summing. The per-row cast is a
  * single deterministic rounding identical in Spark and DuckDB, decimal
  * addition is exact and therefore order-independent, and the one
  * final cast back to DOUBLE is again deterministic — so the result is
  * bit-identical no matter what order either engine visits rows in.
  *
  * Inside a STREAMING aggregation the same trick also makes the
  * accumulator state exact: `sum(decimal)` carries decimal state across
  * micro-batches, so even the batch boundaries stop mattering.
  *
  * `sum2` is for data that is 2-decimal-exact at the source (all the
  * money/quantity/value columns in the fixture tables — verified at
  * sf0.01 and sf0.1); the oracle side mirrors it as
  * `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  */
object Banding {
  /** Exact, order-independent sum of a double column whose values are
    * `scale`-decimal-exact (or whose per-row decimal rounding both
    * engines agree on), returned as DOUBLE. Mirror in oracle SQL:
    * `CAST(sum(CAST(x AS DECIMAL(18,scale))) AS DOUBLE)`. */
  def sumBand(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** 2-decimal source columns (money/quantity/value fixtures). */
  def sum2(c: Column): Column = sumBand(c, 2)
  /** 4-decimal products (price * (1-discount) style). */
  def sum4(c: Column): Column = sumBand(c, 4)
  /** 6-decimal products (price * (1-disc) * (1+tax) style). */
  def sum6(c: Column): Column = sumBand(c, 6)
  /** Transcendental per-row values (ln/sqrt/pow): the DECIMAL(18,9)
    * rounding of an IEEE-identical double is deterministic in both
    * engines, and the decimal sum is then exact. */
  def sum9(c: Column): Column = sumBand(c, 9)

  /** avg is sum/count and inherits sum's order dependence; band it as
    * an exact decimal sum over the non-null count. Mirror in SQL:
    * `CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / count(x)`. */
  def avgBand(c: Column, scale: Int): Column =
    sumBand(c, scale) / org.apache.spark.sql.functions.count(c)

  def avg2(c: Column): Column = avgBand(c, 2)
  def avg9(c: Column): Column = avgBand(c, 9)
}
