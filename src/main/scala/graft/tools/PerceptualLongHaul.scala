package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.lake.LakeTable
import graft.operators.{DedupOps, MultimodalOps}
import graft.streaming.MVManager

/** Long-haul steady state for the BINARY-axis loops (VERDICT r12 item
  * 6): the text/vector loops got their 100-batch amplification runs in
  * r8/r9 — this closes the measurement gap for the two r12 media
  * modalities.
  *
  * Phase 1 — the PERCEPTUAL curation MV (q168's loop): media batches
  * through `startPerceptualCurationFromLake` (simhash index + banded
  * pbh postings, both bucketed + size-ladder compacted). Claims:
  * per-batch append-to-commit latency flat-or-bounded (probed file
  * counts plateau at the ladder bound), cumulative compaction rewrite
  * logarithmic (each row rewritten <= ~log2(batches) + 1 times).
  *
  * Phase 2 — the ELEMENT-postings table (q170's exact-recall frame-set
  * index): per batch, probe `setJaccardAgainstIndex` with the batch's
  * frame sets, then append the batch's posting rows (eh-bucketed,
  * ladder-compacted). Claims: per-batch probe cost FLAT while the
  * postings grow ~N-fold (the probe touches only the batch's own eh
  * buckets), rewrite amplification log-bounded.
  *
  * One session (the box throttles ~3x across sessions); verdict lines
  * print the bound checks. */
object PerceptualLongHaul {

  final class CompactionMeter(t: LakeTable) {
    private var seen = t.currentVersion
    var bytes = 0L
    var rows = 0L
    def poll(): Long = {
      val cur = t.currentVersion
      for (v <- (seen + 1) to cur) {
        if (t.appMetaAt(v, "compaction").contains("true")) {
          val prev = t.filesAt(v - 1).map(_.path).toSet
          val fresh = t.filesAt(v).filterNot(f => prev.contains(f.path))
          bytes += fresh.map(_.sizeBytes).sum
          rows += fresh.map(_.rows).sum
        }
      }
      seen = cur
      bytes
    }
    def liveBytes: Long = t.dataFiles.map(_.sizeBytes).sum
    def liveRows: Long = t.dataFiles.map(_.rows).sum
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "60").toInt
    val dir = java.nio.file.Files.createTempDirectory("plonghaul")

    val media = MultimodalOps.withBinaryPayload(
      Tables.load(spark, sfDir, "documents").select("doc_id", "text"))
      .localCheckpoint()
    val total = media.count()
    println(s"[plonghaul] $total media docs, $batches batches, $sfDir")

    // ---- phase 1: perceptual curation MV -----------------------------
    val src = LakeTable.create(spark, s"$dir/src", media.schema)
    val idxSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("simhash",
        org.apache.spark.sql.types.LongType)))
    val index = LakeTable.create(spark, s"$dir/idx", idxSchema,
      properties = LakeTable.autoCompactProps(32, Some("doc_id")),
      bucketBy = Some(("doc_id", 32)))
    val postings = LakeTable.create(spark, s"$dir/post",
      DedupOps.simHashPostingsSchema,
      properties = LakeTable.autoCompactProps(32, Some("pbh")) ++
        DedupOps.simHashPostingsProps,
      bucketBy = Some(("pbh", 32)))
    val out = LakeTable.create(spark, s"$dir/out", media.schema)
    val mv = new MVManager(spark, s"$dir/ckpt")
    val q = mv.startPerceptualCurationFromLake("plh", src, index, out,
      trigger = Trigger.ProcessingTime("100 milliseconds"),
      postings = Some(postings))
    val meters = Seq("index" -> new CompactionMeter(index),
      "postings" -> new CompactionMeter(postings),
      "out" -> new CompactionMeter(out))
    println("[plonghaul] batch  secs  idxFiles  postFiles  " +
      "rewriteMB(idx/post/out)")
    val secs = (0 until batches).map { i =>
      val before = index.dataCommitCount
      val t0 = System.nanoTime()
      src.append(media.filter(col("doc_id") % batches === i))
      while (index.dataCommitCount <= before) Thread.sleep(10)
      val s = (System.nanoTime() - t0) / 1e9
      val mb = meters.map(m => f"${m._2.poll() / 1e6}%.1f").mkString("/")
      println(f"[plonghaul] ${i + 1}%5d  $s%5.2f  " +
        f"${index.dataFiles.size}%8d  ${postings.dataFiles.size}%9d  $mb")
      s
    }
    q.stop()
    val half = secs.drop(batches / 2)
    val median = half.sorted.apply(half.length / 2)
    println(f"[plonghaul] mv batch2 ${secs(1)}%5.2f s  " +
      f"median(b${batches / 2}..b$batches) $median%5.2f s  " +
      f"ratio ${median / secs(1)}%4.2f")
    val logBound = math.log(math.max(2.0, batches.toDouble)) /
      math.log(2.0) + 1.0
    meters.foreach { case (name, m) =>
      val amp = if (m.liveBytes == 0) 0.0
        else m.bytes.toDouble / m.liveBytes
      val rowAmp = if (m.liveRows == 0) 0.0
        else m.rows.toDouble / m.liveRows
      println(f"[plonghaul] $name%-8s live ${m.liveBytes / 1e6}%8.1f MB" +
        f" / ${m.liveRows}%d rows  rewrote ${m.bytes / 1e6}%8.1f MB / " +
        f"${m.rows}%d rows  rowAmp $rowAmp%5.2f  byteAmp $amp%5.2f  " +
        f"(log bound ~$logBound%4.1f)")
    }
    println(s"[plonghaul] rows: src=$total out=${out.read().count()} " +
      s"index=${index.read().count()}")

    // ---- phase 2: element-postings probe under N-fold growth ---------
    val fsets = MultimodalOps.frameSignatureRows(media)
      .select("doc_id", "shs").localCheckpoint()
    val ep = LakeTable.create(spark, s"$dir/ep",
      DedupOps.elementPostingsSchema,
      properties = LakeTable.autoCompactProps(16, Some("eh")) ++
        DedupOps.elementPostingsProps,
      bucketBy = Some(("eh", 16)))
    val epMeter = new CompactionMeter(ep)
    println("[plonghaul] ep batch  probeSecs  pairs  epFiles  epRows")
    val probeSecs = (0 until batches).map { i =>
      val batch = fsets.filter(col("doc_id") % batches === i)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val pairs = DedupOps.setJaccardAgainstIndex(batch, ep).count()
      val s = (System.nanoTime() - t0) / 1e9
      ep.appendExactlyOnce(DedupOps.elementPostingsRows(batch),
        "plh-ep", i.toLong)
      // the size-ladder gate every postings writer calls post-commit
      // (the MV loops do this inside their step)
      ep.autoCompactIfNeeded()
      epMeter.poll()
      println(f"[plonghaul] ${i + 1}%8d  $s%9.2f  $pairs%5d  " +
        f"${ep.dataFiles.size}%7d  ${epMeter.liveRows}%6d")
      s
    }
    val pHalf = probeSecs.drop(batches / 2)
    val pMedian = pHalf.sorted.apply(pHalf.length / 2)
    val pEarly = probeSecs.take(math.max(2, batches / 10)).sorted
      .apply(math.max(1, batches / 20))
    println(f"[plonghaul] ep probe early ~$pEarly%5.2f s  " +
      f"median(2nd half) $pMedian%5.2f s  ratio ${pMedian / pEarly}%4.2f" +
      "  (flat <= ~1.5x under ~" +
      f"${batches / 2}x postings growth)")
    val epAmp = if (epMeter.liveRows == 0) 0.0
      else epMeter.rows.toDouble / epMeter.liveRows
    println(f"[plonghaul] ep rewrote ${epMeter.rows}%d rows vs live " +
      f"${epMeter.liveRows}%d  rowAmp $epAmp%5.2f  " +
      f"(log bound ~$logBound%4.1f)")
    spark.stop()
  }
}
