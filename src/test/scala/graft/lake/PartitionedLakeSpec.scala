package graft.lake

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class PartitionedLakeSpec extends SparkSuite {
  import spark.implicits._

  test("partitioned table: layout, read-back, and partition pruning") {
    val ev = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val t = LakeTable.create(spark, tmpDir("part-lake"), ev.schema,
      partitionBy = Seq("event_type"))
    t.append(ev.filter($"event_id" % 2 === 0))
    t.append(ev.filter($"event_id" % 2 === 1))

    // content identical to source (partition col recovered from dirs)
    val back = t.read()
    assert(back.count() == ev.count())
    assert(back.groupBy($"event_type").count().collect().toSet ==
      ev.groupBy($"event_type").count().collect().toSet)

    // partition pruning: a filter on the partition column must reduce
    // the scanned partition set, before any file IO
    val filtered = t.read().filter($"event_type" === "purchase")
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    val allParts = t.read().queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get.selectedPartitions.partitionCount
    assert(scan.selectedPartitions.partitionCount < allParts,
      s"pruned ${scan.selectedPartitions.partitionCount} vs $allParts")
    assert(filtered.count() ==
      ev.filter($"event_type" === "purchase").count())
  }

  test("compaction preserves partitioned content") {
    val ev = Tables.load(spark, sf, "events")
      .select($"event_id", $"event_type", $"value")
    val t = LakeTable.create(spark, tmpDir("part-compact"), ev.schema,
      partitionBy = Seq("event_type"))
    (0 to 3).foreach(i => t.append(ev.filter($"event_id" % 4 === i)))
    val before = t.read().agg(sum($"value")).as[Double].head()
    val filesBefore = t.dataFiles.size
    t.compact(numFiles = 1)
    assert(t.dataFiles.size < filesBefore)
    assert(math.abs(t.read().agg(sum($"value")).as[Double].head() - before) < 1e-6)
    assert(t.read().count() == ev.count())
  }
}
