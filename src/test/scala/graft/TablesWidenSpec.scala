package graft

/** Tables.widen — stats-driven parallelism floor for CPU-dense paths. */
class TablesWidenSpec extends SparkSuite {
  import spark.implicits._

  test("small single-file input is widened to defaultParallelism") {
    val dir = tmpDir("widen-small")
    (1 to 100).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val widened = Tables.widen(spark.read.parquet(dir))
    // test-side .rdd is fine; main sources must stay rdd-free
    assert(widened.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(widened.count() == 100)
  }

  test("input already scanning wide is left untouched (no reshuffle)") {
    // force the size estimate over target*maxPartitionBytes by shrinking
    // maxPartitionBytes, so the scan itself is already parallel enough
    val dir = tmpDir("widen-big")
    (1 to 200000).map(i => (i.toLong, s"payload-$i" * 8))
      .toDF("id", "text").repartition(4)
      .write.mode("overwrite").parquet(dir)
    val conf = spark.sessionState.conf
    val old = conf.getConfString("spark.sql.files.maxPartitionBytes")
    try {
      conf.setConfString("spark.sql.files.maxPartitionBytes", "16384")
      val df = spark.read.parquet(dir)
      val widened = Tables.widen(df)
      // same plan object back: no repartition node was added
      assert(widened.queryExecution.logical eq df.queryExecution.logical)
    } finally conf.setConfString("spark.sql.files.maxPartitionBytes", old)
  }
}
