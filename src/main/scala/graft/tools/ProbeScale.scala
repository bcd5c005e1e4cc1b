package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lake.LakeTable
import graft.operators.{DedupOps, SimilarityOps}

/** Measures the VERDICT r05 top item: incremental near-dup probe cost
  * must track BATCH size, not INDEX size. Builds the text signature
  * index (and its band-postings twin) at 1x and ~10x history, then
  * times the same small batch's `nearDupSigsAgainstIndex` against
  * both — once through the postings probe, once through the legacy
  * band-scan. Flat probe-path times across the 10x growth (vs the
  * band-scan's linear growth) is the O(batch)-per-batch proof.
  * min-of-N within ONE session per the round-3 measurement rule. */
object ProbeScale {
  def minOf(n: Int)(f: => Unit): Double =
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")

    // batch: a fixed small slice; history 1x: the rest of the table;
    // history 30x: the rest replicated 30 times under shifted doc_ids
    // (distinct ids, same text mass — LSH buckets get genuinely denser)
    val batch = docs.filter(col("doc_id") % 400 === 0).localCheckpoint()
    val hist1 = docs.filter(col("doc_id") % 200 =!= 0)
    val nDocs = docs.count()
    val hist10 = (0 until 30).map { r =>
      hist1.select((col("doc_id") + lit(r * nDocs * 10)).as("doc_id"),
        concat(col("text"), lit(s" rep$r")).as("text"))
    }.reduce(_ unionByName _)

    val batchSigs = DedupOps.signatureIndexRows(batch).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("probe-scale")

    def build(tag: String, hist: org.apache.spark.sql.DataFrame)
        : (LakeTable, LakeTable) = {
      val rows = DedupOps.signatureIndexRows(hist).localCheckpoint()
      val idx = LakeTable.create(spark, s"$dir/idx-$tag", rows.schema,
        bucketBy = Some(("doc_id", 16)))
      idx.append(rows)
      val post = LakeTable.create(spark, s"$dir/post-$tag",
        DedupOps.bandPostingsSchema, bucketBy = Some(("pbh", 512)))
      post.append(DedupOps.bandPostingsRows(rows))
      (idx, post)
    }
    val (idx1, post1) = build("1x", hist1)
    val (idx10, post10) = build("10x", hist10)
    println(s"[probe-scale] index 1x: ${idx1.read().count()} rows, " +
      s"${idx1.read().inputFiles.length} files; 30x: " +
      s"${idx10.read().count()} rows, " +
      s"${idx10.read().inputFiles.length} files; batch: " +
      s"${batch.count()} docs")

    def run(idx: LakeTable, post: Option[LakeTable]): Unit = {
      DedupOps.nearDupSigsAgainstIndex(batchSigs, idx,
        minJaccard = 0.5, postings = post).count(); ()
    }
    for ((label, idx, post) <- Seq(
        ("postings 1x ", idx1, Some(post1)),
        ("postings 30x", idx10, Some(post10)),
        ("bandscan 1x ", idx1, None),
        ("bandscan 30x", idx10, None))) {
      val s = minOf(3)(run(idx, post))
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }

    // the embedding twin, same shape
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val vbatch = emb.filter(col("vec_id") % 100 === 0).localCheckpoint()
    val vhist1 = emb.filter(col("vec_id") % 100 =!= 0)
    val nVec = emb.count()
    val vhist10 = (0 until 10).map { r =>
      vhist1.select((col("vec_id") + lit(r * nVec * 10)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _)
    def vbuild(tag: String, hist: org.apache.spark.sql.DataFrame)
        : (LakeTable, LakeTable) = {
      val idx = LakeTable.create(spark, s"$dir/vidx-$tag", emb.schema,
        bucketBy = Some(("vec_id", 16)))
      idx.append(hist)
      val post = LakeTable.create(spark, s"$dir/vpost-$tag",
        SimilarityOps.srpPostingsSchema, bucketBy = Some(("pbh", 512)))
      post.append(SimilarityOps.srpPostingsRows(hist))
      (idx, post)
    }
    val (vidx1, vpost1) = vbuild("1x", vhist1)
    val (vidx10, vpost10) = vbuild("10x", vhist10)
    def vrun(idx: LakeTable, post: Option[LakeTable]): Unit = {
      SimilarityOps.embeddingNearDupAgainstIndex(vbatch, idx,
        threshold = 0.35, postings = post).count(); ()
    }
    for ((label, idx, post) <- Seq(
        ("vec postings 1x ", vidx1, Some(vpost1)),
        ("vec postings 10x", vidx10, Some(vpost10)),
        ("vec bandscan 1x ", vidx1, None),
        ("vec bandscan 10x", vidx10, None))) {
      val s = minOf(3)(vrun(idx, post))
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }

    // high-selectivity SRP bands (16 bits x 4): candidate volume stays
    // near the true near-dup count, so the postings probe's O(batch)
    // shape is visible instead of being buried under candidate verify
    def vbuild16(tag: String, hist: org.apache.spark.sql.DataFrame)
        : (LakeTable, LakeTable) = {
      val idx = LakeTable.create(spark, s"$dir/vidx16-$tag", emb.schema,
        bucketBy = Some(("vec_id", 16)))
      idx.append(hist)
      val post = LakeTable.create(spark, s"$dir/vpost16-$tag",
        SimilarityOps.srpPostingsSchema, bucketBy = Some(("pbh", 512)))
      post.append(SimilarityOps.srpPostingsRows(hist,
        bandBits = 16, bands = 4))
      (idx, post)
    }
    val (widx1, wpost1) = vbuild16("1x", vhist1)
    val (widx10, wpost10) = vbuild16("10x", vhist10)
    def wrun(idx: LakeTable, post: Option[LakeTable]): Unit = {
      SimilarityOps.embeddingNearDupAgainstIndex(vbatch, idx,
        threshold = 0.35, bandBits = 16, bands = 4,
        postings = post).count(); ()
    }
    for ((label, idx, post) <- Seq(
        ("vec16 postings 1x ", widx1, Some(wpost1)),
        ("vec16 postings 10x", widx10, Some(wpost10)),
        ("vec16 bandscan 1x ", widx1, None),
        ("vec16 bandscan 10x", widx10, None))) {
      val s = minOf(3)(wrun(idx, post))
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }
    spark.stop()
  }
}
