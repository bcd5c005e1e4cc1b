package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IvfIndex, SimilarityOps}

/** Measures the q137/q138/q140 serving claim: ANN from the persisted
  * IVF(-PQ) index must cost O(probed lists), not O(corpus). Trains
  * the portable 64-center model (the serving-shape fan-out; the
  * graded 8 is a fixture convenience) over the sf embeddings, builds
  * BOTH persisted shapes — the raw-vector IVF index and the
  * PQ-compressed IVF-PQ code table — then grows each through 19 more
  * exactly-once append batches (replica vectors under shifted ids, so
  * inverted lists genuinely densify 20x), timing the same 4-probe
  * serve after each growth step and recording probed-vs-total files
  * at 1x and 20x.
  *
  * Expected: serve time growing with the PROBED lists' row mass
  * (4/64 of each growth step), never with total file count — flat-ish
  * until the probed rows dominate the fixed plan cost; probed files a
  * small flat fraction of total (auto-compaction holds each list dir
  * at O(log rows) files, gate sized from the cluster count); and the
  * IVF-PQ serve cheaper than raw IVF at the same growth because its
  * scan bytes are ~16x smaller. min-of-N within ONE session per the
  * round-3 measurement rule. */
object VecScale {
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
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val nVecs = emb.count()

    val c = 64
    val model = IvfIndex.trainPortable(emb, c)
    val dir = java.nio.file.Files.createTempDirectory("vec-scale")
    val ivf = IvfIndex.buildIndex(spark, emb, model, s"$dir/ivf")
    val (pq, cbs) = SimilarityOps.ivfPqPersist(emb, spark, s"$dir/pq",
      model)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

    def serveIvf(): Unit = {
      IvfIndex.searchPersisted(ivf, qv, model, k = 10, nprobe = 4)
        .count(); ()
    }
    def servePq(): Unit = {
      SimilarityOps.ivfPqSearchPersisted(pq, cbs, model, qv, k = 10,
        nprobe = 4).count(); ()
    }
    def stats(tag: String): Unit = {
      val fIvf = ivf.read().inputFiles.length
      val fPq = pq.read().inputFiles.length
      val tIvf = minOf(3)(serveIvf())
      val tPq = minOf(3)(servePq())
      println(f"[vec-scale] $tag%-8s ivf-files=$fIvf%5d " +
        f"ivf-serve=$tIvf%.3f s   pq-files=$fPq%5d " +
        f"pq-serve=$tPq%.3f s")
    }
    stats("1x")

    (1 until 20).foreach { r =>
      val replica = emb.select(
        (col("vec_id") + lit(r * nVecs * 10)).as("vec_id"),
        col("embedding"))
      IvfIndex.appendToIndex(ivf, replica, model, "vec-scale", r.toLong)
      val codes = IvfIndex.assign(replica, model)
        .select(col("vec_id"),
          graft.functions.PqFunctions.pq_encode(col("embedding"), cbs)
            .as("codes"),
          col("_cluster"))
      pq.appendExactlyOnce(codes, "vec-scale-pq", r.toLong)
      pq.autoCompactIfNeeded()
      if (r % 5 == 0 || r == 19) stats(s"${r + 1}x")
    }

    // final pruning ratio at the 4-probe serve (readWhere prunes at
    // the MANIFEST level, so inputFiles reflects what the serve plan
    // actually lists; a bare read().filter would report the unpruned
    // relation)
    val probes = IvfIndex.probeIds(qv, model, 4)
    for ((t, name) <- Seq(ivf -> "ivf", pq -> "pq")) {
      val total = t.read().inputFiles.length
      val probed = t.readWhere(col("_cluster").isin(probes: _*))
        .inputFiles.length
      println(s"[vec-scale] final $name: probes=4 of $c " +
        s"probed-files=$probed of $total " +
        f"(${100.0 * probed / total}%.1f%%)")
    }
    spark.stop()
  }
}
