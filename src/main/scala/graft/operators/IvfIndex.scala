package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.CentroidFunctions.{nearest_centroid, top_centroids}
import graft.functions.VectorFunctions.cosine_sim

/** IVF (inverted-file) approximate nearest neighbor: k-means-style
  * coarse quantizer + per-cluster inverted lists; queries probe only the
  * `nprobe` closest clusters.
  *
  * All heavy work is partition-parallel DataFrame plans; only the
  * centroid matrix (C x dim doubles — a few KB) ever reaches the driver,
  * which is inherent to Lloyd's algorithm, not a scaling bug. At 100 TB
  * the assignment column would be persisted (a partition key in the lake
  * table) so queries touch only probed partitions.
  */
object IvfIndex {

  case class Model(centroids: Array[Array[Double]]) {
    def c: Int = centroids.length
  }

  private def collectCentroids(assigned: DataFrame, embCol: String,
                               prev: Array[Array[Double]]): Array[Array[Double]] = {
    // elementwise mean per cluster: posexplode -> (cluster, pos) avg
    val dims = assigned.select(col("_cluster"),
        posexplode(col(embCol)).as(Seq("_pos", "_v")))
      .groupBy(col("_cluster"), col("_pos"))
      .agg(avg(col("_v")).as("_mean"))
      .collect()
    val out = prev.map(_.clone())
    dims.foreach { case Row(cl: Int, pos: Int, mean: Double) =>
      out(cl)(pos) = mean
    }
    out
  }

  /** Deterministic training: first `c` vectors (by id) seed the
    * centroids; `iters` Lloyd rounds refine them. */
  def train(vectors: DataFrame, c: Int, iters: Int = 3,
            embCol: String = "embedding", idCol: String = "vec_id"): Model = {
    var cents: Array[Array[Double]] = vectors.orderBy(col(idCol)).limit(c)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (1 to iters).foreach { _ =>
      val assigned = vectors.select(col(embCol),
        nearest_centroid(col(embCol), cents).as("_cluster"))
      cents = collectCentroids(assigned, embCol, cents)
    }
    Model(cents)
  }

  /** Attach the inverted-list id to every vector (the column you'd
    * partition the lake table by in production). */
  def assign(vectors: DataFrame, model: Model,
             embCol: String = "embedding"): DataFrame =
    vectors.withColumn("_cluster",
      nearest_centroid(col(embCol), model.centroids))

  /** Approximate top-k: probe the query's `nprobe` closest clusters and
    * brute-force only those inverted lists. */
  def search(vectors: DataFrame, query: DataFrame, model: Model, k: Int,
             nprobe: Int, embCol: String = "embedding",
             idCol: String = "vec_id"): DataFrame = {
    val indexed = assign(vectors, model, embCol)
    val probes = query
      .select(col(embCol).as("_qv"),
        explode(top_centroids(col(embCol), model.centroids, nprobe))
          .as("_cluster"))
    indexed.join(broadcast(probes), Seq("_cluster"))
      .select(col(idCol), cosine_sim(col(embCol), col("_qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
