package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange — the
  * pay-once-join-many layout for fact tables at 100 TB (both sides
  * bucketed on the join key into the same bucket count -> sort-merge
  * join with zero shuffle).
  */
object Bucketing {

  /** Persist `df` as a session-catalog table bucketed (and sorted) by
    * `key` into `numBuckets` files per partition. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", s"${df.sparkSession.conf.get("spark.sql.warehouse.dir")
        .stripSuffix("/")}/$tableName")
      .mode("overwrite")
      .saveAsTable(tableName)

  /** True if the executed plan of `df` contains any shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, leftKey: String,
                   rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
