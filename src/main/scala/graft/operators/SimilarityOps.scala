package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a single codegen'd scan +
  * TakeOrderedAndProject (no full sort, no shuffle of the scores).
  * Scale path: random-hyperplane LSH bucketing — candidates come from an
  * equi-join on bucket signature, cutting the scan by ~2^bits for large
  * corpora; multi-probe (hamming-1 neighbors) recovers recall.
  */
object SimilarityOps {

  /** Brute-force cosine top-k against one query vector (given as a 1-row
    * DataFrame with column `embedding`). Broadcast of the query row +
    * one scan; `orderBy.limit` plans as TakeOrderedAndProject, so only k
    * rows per partition survive — no global sort at 100 TB. */
  def bruteForceTopK(vectors: DataFrame, query: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame =
    vectors.crossJoin(broadcast(query.select(col(embCol).as("_qv"))))
      .select(col(idCol),
        cosine_sim(col(embCol), col("_qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplanes (seeded), as literal arrays. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id (0..2^bits-1) for an embedding —
    * one codegen'd matrix-dot expression (see SignRandomProjection). */
  private def bucketExpr(embCol: String, planes: Seq[Array[Double]]) =
    graft.functions.SignRandomProjection.srp_bucket(
      col(embCol), planes.toArray)

  /** LSH-bucketed approximate top-k: bucket all vectors once (cacheable /
    * persistable as a bucketed table in production), then multi-probe —
    * brute-force only the buckets within `probeHamming` sign-flips of the
    * query's bucket (37/256 buckets at bits=8, hamming<=2), since nearby
    * cosine implies nearby sign pattern. The probe list is a tiny
    * broadcast; the candidate join is an equi-join on bucket id. */
  def lshTopK(vectors: DataFrame, query: DataFrame, k: Int,
              bits: Int = 8, probeHamming: Int = 2, seed: Long = 42L,
              idCol: String = "vec_id",
              embCol: String = "embedding"): DataFrame = {
    val dim = 64 // fixture embedding dimensionality (FIXTURES.md)
    val planes = hyperplanes(dim, bits, seed)
    val bucketed = vectors.withColumn("_bucket", bucketExpr(embCol, planes))
    val probed = query
      .select(col(embCol).as("_qv"), bucketExpr(embCol, planes).as("_qb"))
      .select(col("_qv"), col("_qb"),
        expr(s"explode(sequence(0L, ${(1L << bits) - 1}L))").as("_bucket"))
      .filter(bit_count(col("_qb").bitwiseXOR(col("_bucket")))
        <= probeHamming)
      .select(col("_qv"), col("_bucket"))
    bucketed.join(broadcast(probed), Seq("_bucket"))
      .select(col(idCol), cosine_sim(col(embCol), col("_qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Exact embedding near-dup pairs within equal-`blockCol` blocks
    * (block-nested join, cosine >= threshold). For unblocked corpora use
    * LSH buckets as the block key. */
  def embeddingNearDup(vectors: DataFrame, threshold: Double,
                       blockCol: String = "label",
                       idCol: String = "vec_id",
                       embCol: String = "embedding"): DataFrame =
    vectors.as("a")
      .join(vectors.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("v1"), col(s"b.$idCol").as("v2"),
        cosine_sim(col(s"a.$embCol"), col(s"b.$embCol")).as("cos"))
      .filter(col("cos") >= threshold)
}
