package org.apache.spark

/** Test-only access to the live SparkContext's conf: emulating a
  * `spark-submit --conf spark.sql.extensions=...` user in-process
  * requires the conf to be present on the CONTEXT before a session is
  * built (that is where `SparkSession.Builder.getOrCreate` reads
  * static confs from), and `SparkContext.conf` is private[spark]. */
object GraftTestBridge {
  def setContextConf(sc: SparkContext, k: String, v: String): Unit =
    sc.conf.set(k, v)
  def removeContextConf(sc: SparkContext, k: String): Unit =
    sc.conf.remove(k)
}
