package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A parquet scan whose file list is SERVED FROM TABLE-MANIFEST
  * METADATA instead of filesystem listing.
  *
  * `spark.read.parquet(paths)` stats/lists every path on the driver to
  * build its file index before a single byte of data is read. For a
  * lake table the manifest already knows the exact committed file set
  * with sizes — re-deriving it from the filesystem is pure overhead,
  * and on an object store it is THE scan-planning bottleneck: one
  * LIST/HEAD round-trip per path (a bucket-pruned probe touching 200
  * posting files pays 200 driver round-trips before planning even
  * starts). Iceberg/Delta solve this with manifest-backed FileIndex
  * implementations; this is the same pattern for graft's lake.
  *
  * The scan is a first-class `HadoopFsRelation`, so EVERYTHING
  * downstream is stock Spark: parquet vectorized reads, filter
  * pushdown, column pruning, `_metadata` columns, and partition
  * pruning — `listFiles` evaluates Catalyst partition filters against
  * the manifest-supplied partition values (the same name-bound
  * interpreted-predicate contract `InMemoryFileIndex.prunePartitions`
  * implements), so dynamic partition filters from joins prune here
  * too, with zero IO. */
object ManifestScan {

  /** The bucket id Spark's bucketed-read machinery would assign this
    * file name (`BucketingUtils.getBucketId` — name-encoded `_NNNNN`
    * suffix), or None for a non-bucket-named file. Exposed so the
    * manifest layer can verify file names agree with their bucket
    * dirs BEFORE claiming a `BucketSpec` on the relation. */
  def fileBucketId(fileName: String): Option[Int] =
    org.apache.spark.sql.execution.datasources.BucketingUtils
      .getBucketId(fileName)

  /** One manifest-backed partition directory: `values` are external
    * Scala values (null = hive default partition), positionally
    * matching `partSchema`; `files` are (absolutePath, sizeBytes,
    * modTimeMs) straight from the manifest. */
  case class ManifestPartition(values: Seq[Any],
                               files: Seq[(String, Long, Long)])

  def parquet(spark: SparkSession, dataSchema: StructType,
              partSchema: StructType,
              partitions: Seq[ManifestPartition],
              rootPath: String,
              options: Map[String, String] = Map.empty,
              bucketSpec: Option[
                org.apache.spark.sql.catalyst.catalog.BucketSpec] = None)
      : DataFrame = {
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val toInternal =
      CatalystTypeConverters.createToCatalystConverter(partSchema)
    val dirs = partitions.map { p =>
      val row =
        if (partSchema.isEmpty) InternalRow.empty
        else toInternal(Row.fromSeq(p.values)).asInstanceOf[InternalRow]
      PartitionDirectory(row, p.files.map { case (path, size, mtime) =>
        new FileStatus(size, false, 1, 128L * 1024 * 1024, mtime,
          new Path(path))
      }.toArray)
    }
    val totalBytes = partitions.iterator.flatMap(_.files).map(_._2).sum
    val allFiles = partitions.flatMap(_.files.map(_._1)).toArray
    val index = new FileIndex {
      override def rootPaths: Seq[Path] = Seq(new Path(rootPath))
      override def listFiles(partitionFilters: Seq[Expression],
                             dataFilters: Seq[Expression])
          : Seq[PartitionDirectory] =
        if (partSchema.isEmpty || partitionFilters.isEmpty) dirs
        else {
          // bind by NAME against the partition schema: the filters
          // reference the relation's output attributes, whose exprIds
          // this index never sees (InMemoryFileIndex.prunePartitions
          // binds identically)
          val bound = Predicate.createInterpreted(
            partitionFilters.reduce(And).transform {
              case a: AttributeReference =>
                val i = partSchema.fieldIndex(a.name)
                BoundReference(i, partSchema(i).dataType, nullable = true)
            })
          dirs.filter(d => bound.eval(d.values))
        }
      override def inputFiles: Array[String] = allFiles
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = totalBytes
      override def partitionSchema: StructType = partSchema
    }
    val relation = HadoopFsRelation(index, partSchema, dataSchema,
      bucketSpec = bucketSpec, new ParquetFileFormat(), options)(classic)
    org.apache.spark.sql.classic.Dataset.ofRows(
      classic, LogicalRelation(relation))
  }
}
