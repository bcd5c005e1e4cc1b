package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (the reference system delegates this to its SQL
  * upstream; Spark has no built-in batch as-of).
  *
  * Formulation: tag left/right rows, union them, and take the
  * last-non-null right payload over a window partitioned by key and
  * ordered by (time, tag) — right rows (tag 0) sort before left rows
  * (tag 1) at equal timestamps, giving inclusive (`right.time <=
  * left.time`) semantics.
  *
  * Scale properties: exactly ONE shuffle (by key) + a per-partition sort —
  * the same cost profile as a sort-merge join, no range-explosion, no
  * driver-side state. Skewed keys behave like any window skew (salt the
  * key upstream if one key dominates).
  */
object AsOfJoin {

  /** For each left row, attach `payloadCols` from the latest right row with
    * `right(timeR) <= left(timeL)` and matching key; null payload when no
    * such row exists (left-outer as-of).
    *
    * Right side should be unique per (key, time) — pre-dedup it for
    * deterministic results (see SparkEntry.q19).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyL: String, timeL: String,
      keyR: String, timeR: String,
      payloadCols: Seq[String]): DataFrame = {

    val leftStruct = struct(left.columns.map(col): _*)
    val payStruct = struct(payloadCols.map(col): _*)
    val payType = right.select(payStruct.as("_pay")).schema("_pay").dataType
    val leftType = left.select(leftStruct.as("_lrow")).schema("_lrow").dataType

    val l = left.select(
      col(keyL).as("_k"), col(timeL).cast("timestamp").as("_t"),
      lit(1).as("_tag"), leftStruct.as("_lrow"),
      lit(null).cast(payType).as("_pay"))
    val r = right.select(
      col(keyR).as("_k"), col(timeR).cast("timestamp").as("_t"),
      lit(0).as("_tag"), lit(null).cast(leftType).as("_lrow"),
      payStruct.as("_pay"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l.unionByName(r)
      .withColumn("_asof", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val leftCols = left.columns.map(c => col(s"_lrow.$c").as(c))
    val payCols = payloadCols.map(c => col(s"_asof.$c").as(c))
    joined.select(leftCols ++ payCols: _*)
  }
}
