package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lake.LakeTable
import graft.operators.{DedupOps, SimilarityOps}

/** Measures the VERDICT r05 top item: incremental near-dup probe cost
  * must track BATCH size, not INDEX size. Builds the text signature
  * index (and its band-postings twin) at 1x and 30x history (vectors:
  * 1x and 10x), then times the same small batch's
  * `nearDupSigsAgainstIndex` against both — once through the postings
  * probe, once through the legacy band-scan. Flat probe-path times
  * across the growth (vs the band-scan's linear growth) is the
  * O(batch)-per-batch proof. The embedding modality is measured under
  * BOTH geometries: the legacy 8x8 bands and the graded 4x16-bit
  * default (SimilarityOps.DefaultIndexBand*), with the fetched
  * candidate-postings volume printed alongside the times.
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
    val hist30 = (0 until 30).map { r =>
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
        DedupOps.bandPostingsSchema,
        properties = DedupOps.bandPostingsProps(),
        bucketBy = Some(("pbh", 512)))
      post.append(DedupOps.bandPostingsRows(rows))
      (idx, post)
    }
    val (idx1, post1) = build("1x", hist1)
    val (idx30, post30) = build("30x", hist30)
    println(s"[probe-scale] index 1x: ${idx1.read().count()} rows, " +
      s"${idx1.read().inputFiles.length} files; 30x: " +
      s"${idx30.read().count()} rows, " +
      s"${idx30.read().inputFiles.length} files; batch: " +
      s"${batch.count()} docs")

    def run(idx: LakeTable, post: Option[LakeTable]): Unit = {
      DedupOps.nearDupSigsAgainstIndex(batchSigs, idx,
        minJaccard = 0.5, postings = post).count(); ()
    }
    for ((label, idx, post) <- Seq(
        ("postings 1x ", idx1, Some(post1)),
        ("postings 30x", idx30, Some(post30)),
        ("bandscan 1x ", idx1, None),
        ("bandscan 30x", idx30, None))) {
      val s = minOf(3)(run(idx, post))
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }

    // the ELEMENT-postings twin (q170's exact-recall frame-set probe):
    // unlike the banded families, its cost model is
    // O(batch keys + sum of probed elements' df + true-match volume) —
    // the 30x history replicates every document (with one differing
    // trailing frame), so shared-frame df AND the true-match count
    // both grow 30x; the measurement separates the honest
    // output-bound growth from any hidden history scan (the bucketed
    // probe itself opens only dirs holding batch keys at either scale)
    locally {
      import graft.operators.MultimodalOps
      def ebuild(tag: String, hist: org.apache.spark.sql.DataFrame)
          : LakeTable = {
        val rows = MultimodalOps.frameSignatureRows(
          MultimodalOps.withBinaryPayload(hist)).localCheckpoint()
        val post = LakeTable.create(spark, s"$dir/epost-$tag",
          DedupOps.elementPostingsSchema,
          properties = DedupOps.elementPostingsProps,
          bucketBy = Some(("eh", 512)))
        post.append(DedupOps.elementPostingsRows(rows))
        post
      }
      val ep1 = ebuild("1x", hist1)
      val ep30 = ebuild("30x", hist30)
      val ebatch = MultimodalOps.frameSignatureRows(
        MultimodalOps.withBinaryPayload(batch)).localCheckpoint()
      for ((label, p) <- Seq(("elements 1x ", ep1),
          ("elements 30x", ep30))) {
        var matches = 0L
        val s = minOf(3) {
          matches = DedupOps.setJaccardAgainstIndex(ebatch, p,
            minJaccard = 0.5).count()
        }
        println(f"[probe-scale] $label min-of-3 $s%6.2f s  " +
          f"(true matches $matches)")
      }
    }

    // the embedding twin, same shape
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    // the batch PLANTS true near-dups of history (tiny additive noise
    // on a history slice, fresh ids): candidate volume under the
    // 16-bit geometry is then genuinely nonzero at both scales — a
    // zero-candidate batch would prove flatness vacuously
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val planted = emb.filter(col("vec_id") % 97 === 3)
      .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "x + float(0.001) * float(pmod(hash(vec_id, i), 7) - 3))")
          .as("embedding"))
    val vbatch = emb.filter(col("vec_id") % 100 === 0)
      .unionByName(planted).localCheckpoint()
    val vhist1 = emb.filter(col("vec_id") % 100 =!= 0)
    val nVec = emb.count()
    val vhist10 = (0 until 10).map { r =>
      vhist1.select((col("vec_id") + lit(r * nVec * 10)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _)
    // legacy 8x8 geometry, pinned explicitly (the graded default is
    // now 4x16 — measured below): kept as the contrast that shows WHY
    // low-selectivity bands are candidate-volume-bound at scale
    def vbuild(tag: String, hist: org.apache.spark.sql.DataFrame)
        : (LakeTable, LakeTable) = {
      val idx = LakeTable.create(spark, s"$dir/vidx-$tag", emb.schema,
        bucketBy = Some(("vec_id", 16)))
      idx.append(hist)
      val post = LakeTable.create(spark, s"$dir/vpost-$tag",
        SimilarityOps.srpPostingsSchema,
        properties = SimilarityOps.srpPostingsProps(8, 8),
        bucketBy = Some(("pbh", 512)))
      post.append(SimilarityOps.srpPostingsRows(hist,
        bandBits = 8, bands = 8))
      (idx, post)
    }
    val (vidx1, vpost1) = vbuild("1x", vhist1)
    val (vidx10, vpost10) = vbuild("10x", vhist10)
    def vrun(idx: LakeTable, post: Option[LakeTable]): Unit = {
      SimilarityOps.embeddingNearDupAgainstIndex(vbatch, idx,
        threshold = 0.35, bandBits = 8, bands = 8,
        postings = post).count(); ()
    }
    // fetched candidate-postings volume per geometry/scale: the rows
    // the batch's band keys drag out of the postings table — the
    // quantity that must stay flat for the probe to be O(batch)
    def candVolume(post: LakeTable, bandBits: Int, bands: Int): Long = {
      val pbhs = SimilarityOps.srpPostingsRows(vbatch,
          bandBits = bandBits, bands = bands)
        .select("pbh").distinct().collect().map(_.get(0))
      post.probeTiered("pbh", pbhs.toSeq, 10000).count()
    }
    for ((label, idx, post) <- Seq(
        ("vec postings 1x ", vidx1, Some(vpost1)),
        ("vec postings 10x", vidx10, Some(vpost10)),
        ("vec bandscan 1x ", vidx1, None),
        ("vec bandscan 10x", vidx10, None))) {
      val s = minOf(3)(vrun(idx, post))
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }

    for ((label, post, bits, bnds) <- Seq(
        ("vec8  cand-volume 1x ", vpost1, 8, 8),
        ("vec8  cand-volume 10x", vpost10, 8, 8))) {
      println(f"[probe-scale] $label ${candVolume(post, bits, bnds)}%8d rows")
    }

    // high-selectivity SRP bands (16 bits x 4) — NOW THE GRADED
    // DEFAULT (SimilarityOps.DefaultIndexBand*): candidate volume
    // stays near the true near-dup count, so the postings probe's
    // O(batch) shape is visible instead of being buried under
    // candidate verify
    def vbuild16(tag: String, hist: org.apache.spark.sql.DataFrame)
        : (LakeTable, LakeTable) = {
      val idx = LakeTable.create(spark, s"$dir/vidx16-$tag", emb.schema,
        bucketBy = Some(("vec_id", 16)))
      idx.append(hist)
      val post = LakeTable.create(spark, s"$dir/vpost16-$tag",
        SimilarityOps.srpPostingsSchema,
        properties = SimilarityOps.srpPostingsProps(),
        bucketBy = Some(("pbh", 512)))
      post.append(SimilarityOps.srpPostingsRows(hist))
      (idx, post)
    }
    val (widx1, wpost1) = vbuild16("1x", vhist1)
    val (widx10, wpost10) = vbuild16("10x", vhist10)
    def wrun(idx: LakeTable, post: Option[LakeTable]): Unit = {
      SimilarityOps.embeddingNearDupAgainstIndex(vbatch, idx,
        threshold = 0.35, postings = post).count(); ()
    }
    for ((label, idx, post) <- Seq(
        ("vec16 postings 1x ", widx1, Some(wpost1)),
        ("vec16 postings 10x", widx10, Some(wpost10)),
        ("vec16 bandscan 1x ", widx1, None),
        ("vec16 bandscan 10x", widx10, None))) {
      val s = minOf(3)(wrun(idx, post))
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }
    for ((label, post) <- Seq(
        ("vec16 cand-volume 1x ", wpost1),
        ("vec16 cand-volume 10x", wpost10))) {
      println(f"[probe-scale] $label ${candVolume(post,
        SimilarityOps.DefaultIndexBandBits,
        SimilarityOps.DefaultIndexBands)}%8d rows")
    }

    // ---- the q71 crossover: what the bucketed-index commit overhead
    // buys. freshAgainstIndex probes a bucketed fp index vs scanning
    // an unbucketed one, at 1x and 30x history with the same small
    // batch: the probe must stay flat while the scan grows, and the
    // one-time extra commit cost (bucket clustering) is measured too.
    import graft.functions.TextFunctions
    def fpRows(df: org.apache.spark.sql.DataFrame) =
      df.select(TextFunctions.fingerprint(col("text")).as("fp"),
        col("doc_id"))
    val fpSchema = fpRows(batch).schema
    def fpBuild(tag: String, hist: org.apache.spark.sql.DataFrame,
                bucketed: Boolean): LakeTable = {
      val rows = fpRows(hist).localCheckpoint()
      val t0 = System.nanoTime()
      val t = LakeTable.create(spark, s"$dir/fp-$tag", fpSchema,
        bucketBy = if (bucketed) Some(("fp", 32)) else None)
      t.append(rows)
      println(f"[probe-scale] fp commit $tag%-16s " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
      t
    }
    val fb1 = fpBuild("bucketed-1x", hist1, bucketed = true)
    val fb30 = fpBuild("bucketed-30x", hist30, bucketed = true)
    val fu1 = fpBuild("flat-1x", hist1, bucketed = false)
    val fu30 = fpBuild("flat-30x", hist30, bucketed = false)
    for ((label, t) <- Seq(("fp probe bucketed 1x ", fb1),
        ("fp probe bucketed 30x", fb30), ("fp probe flat 1x ", fu1),
        ("fp probe flat 30x", fu30))) {
      val s = minOf(3)(DedupOps.freshAgainstIndex(batch, t).count())
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }

    // ---- and at REAL index scale: 10M synthetic fps. The bucketed
    // probe touches ~|batch| of 256 bucket dirs; the flat layout has
    // nothing to prune on (md5 ranges span every file) and rescans
    // all 10M rows per batch — the crossover the q71 commit overhead
    // buys.
    val n10m = 10000000L
    def synthFps(ids: org.apache.spark.sql.DataFrame) =
      ids.select(TextFunctions.fingerprint(
        concat(lit("synthetic doc "), col("id"))).as("fp"),
        col("id").as("doc_id"))
    val bigRows = synthFps(spark.range(n10m).toDF("id"))
    def bigBuild(tag: String, bucketed: Boolean): LakeTable = {
      val t0 = System.nanoTime()
      val t = LakeTable.create(spark, s"$dir/fp10m-$tag", fpSchema,
        bucketBy = if (bucketed) Some(("fp", 256)) else None)
      t.append(bigRows)
      println(f"[probe-scale] fp 10M commit $tag%-9s " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
      t
    }
    val bigifB = bigBuild("bucketed", bucketed = true)
    val big10F = bigBuild("flat", bucketed = false)
    // batch: 13 known dups + 12 fresh docs
    val sbatch = spark.range(13).toDF("id")
      .unionByName(spark.range(n10m, n10m + 12).toDF("id"))
      .select(concat(lit("synthetic doc "), col("id")).as("text"),
        col("id").as("doc_id")).localCheckpoint()
    for ((label, t) <- Seq(("fp 10M probe bucketed", bigifB),
        ("fp 10M probe flat    ", big10F))) {
      val s = minOf(3) {
        assert(DedupOps.freshAgainstIndex(sbatch, t).count() == 12)
      }
      println(f"[probe-scale] $label min-of-3 $s%6.2f s")
    }
    spark.stop()
  }
}
