package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.lake.LakeTable

/** Delete-aware curation loops (MVManager.startCurationCdc /
  * startEmbeddingCurationCdc) — the q162/q163 CDC pattern applied to
  * the curation MVs themselves, closing the last GDPR gap: a forget on
  * the RAW source must (a) stop the curated OUT table from serving the
  * forgotten documents, (b) drop their fingerprints/signatures/
  * postings — derived content of forgotten text — from the dedup
  * index, and (c) free the frontier so a legitimate LATER resubmission
  * of the same content is re-admitted, while content whose fingerprint
  * still has a SURVIVING owner keeps being rejected. */
class CurationCdcSpec extends SparkSuite {
  import spark.implicits._

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("exact CDC curation: forget frees the fp frontier, resubmission " +
    "re-admitted, surviving-owner fp still rejects, replay is a no-op") {
    val src = LakeTable.create(spark, tmpDir("ccdc-src"), docsSchema)
    val index = LakeTable.create(spark, tmpDir("ccdc-idx"), StructType(Seq(
      StructField("fp", StringType), StructField("doc_id", LongType))),
      bucketBy = Some(("fp", 8)))
    val out = LakeTable.create(spark, tmpDir("ccdc-out"), docsSchema)
    val mv = new MVManager(spark, tmpDir("ccdc-ckpt"))

    // v1: alpha owned by 1 (2 collapses into it), beta by 3, gamma by 4
    src.append(Seq(
      (1L, "alpha doc"), (2L, "Alpha Doc!"), (3L, "beta doc"),
      (4L, "gamma doc")).toDF("doc_id", "text"))
    mv.startCurationCdc("ccdc", src, index, out).awaitTermination()
    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(1L, 3L, 4L))

    // v2: forget alpha's owner and gamma's owner (beta's owner survives)
    src.deleteWhereEqual(Seq(1L, 4L).toDF("doc_id"), Seq("doc_id"))
    // v3: resubmission — alpha and gamma must be re-admitted (their fp
    // lost its owner), beta must stay rejected (owner 3 still serves)
    src.append(Seq(
      (101L, "ALPHA doc"), (103L, "beta doc?"), (104L, "gamma doc"))
      .toDF("doc_id", "text"))
    // v4: growth — a new doc admits, a copy of the RE-ADMITTED alpha
    // dedupes against the resubmission's new frontier row
    src.append(Seq(
      (5L, "delta doc"), (106L, "alpha doc")).toDF("doc_id", "text"))
    mv.startCurationCdc("ccdc", src, index, out).awaitTermination()

    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(3L, 101L, 104L, 5L))
    // the index holds no derived content of the forgotten documents
    assert(index.read().select("doc_id").as[Long].collect().toSet ==
      Set(3L, 101L, 104L, 5L))

    // replay of the finished stream is exactly-once: nothing moves
    val (vo, vi) = (out.currentVersion, index.currentVersion)
    mv.startCurationCdc("ccdc", src, index, out).awaitTermination()
    assert(out.currentVersion == vo && index.currentVersion == vi)
  }

  test("propagateForget replay is exactly-once at every crash point " +
    "(between any two of the out/index/postings deletes)") {
    val index = LakeTable.create(spark, tmpDir("pf-idx"), StructType(Seq(
      StructField("fp", StringType), StructField("doc_id", LongType))),
      bucketBy = Some(("fp", 8)))
    val out = LakeTable.create(spark, tmpDir("pf-out"), docsSchema)
    MVManager.curateStep(Seq((1L, "alpha doc"), (3L, "beta doc"))
      .toDF("doc_id", "text"), index, out, "w", 0L)

    val keys = Seq(1L).toDF("doc_id")
    // crash point: the OUT delete landed, the INDEX delete did not —
    // simulate the partial apply, then replay the full propagation
    out.deleteWhereEqualExactlyOnce(keys, Seq("doc_id"), "w#del", 2L)
    MVManager.propagateForget(keys, "doc_id", "doc_id", out, index,
      None, "w", 2L)
    assert(out.read().select("doc_id").as[Long].collect().toSet == Set(3L))
    assert(index.read().select("doc_id").as[Long].collect().toSet ==
      Set(3L))
    // wholesale replay after everything landed: both tables no-op
    val (vo, vi) = (out.currentVersion, index.currentVersion)
    MVManager.propagateForget(keys, "doc_id", "doc_id", out, index,
      None, "w", 2L)
    assert(out.currentVersion == vo && index.currentVersion == vi)
    // and the freed frontier admits a resubmission
    MVManager.curateStep(Seq((11L, "alpha doc")).toDF("doc_id", "text"),
      index, out, "w", 3L)
    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(3L, 11L))
  }

  test("near-dup CDC curation with postings: forget drops signatures " +
    "AND postings; a near-copy of forgotten text re-admits; a " +
    "near-copy of surviving text still rejects") {
    val src = LakeTable.create(spark, tmpDir("ndcdc-src"), docsSchema)
    val index = LakeTable.create(spark, tmpDir("ndcdc-idx"),
      MVManager.curationIndexSchema, bucketBy = Some(("fp", 8)))
    val postings = LakeTable.create(spark, tmpDir("ndcdc-post"),
      graft.operators.DedupOps.bandPostingsSchema,
      properties = graft.operators.DedupOps.bandPostingsProps(),
      bucketBy = Some(("pbh", 16)))
    val out = LakeTable.create(spark, tmpDir("ndcdc-out"), docsSchema)
    val mv = new MVManager(spark, tmpDir("ndcdc-ckpt"))

    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    src.append(Seq((1L, base), (2L, other)).toDF("doc_id", "text")) // v1
    mv.startCurationCdc("ndcdc", src, index, out,
      nearDupMinJaccard = Some(0.5), postings = Some(postings))
      .awaitTermination()
    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L))

    src.deleteWhereEqual(Seq(1L).toDF("doc_id"), Seq("doc_id")) // v2
    // v3: a NEAR copy of the forgotten doc 1 (one word changed) must
    // re-admit — under the insert-only loop its signature would still
    // LSH-match doc 1's retained postings and be rejected forever; a
    // near copy of the SURVIVING doc 2 must still reject
    src.append(Seq(
      (11L, base.replace("upsilon", "omega")),
      (12L, other.replace("sixteen", "zzz"))).toDF("doc_id", "text"))
    mv.startCurationCdc("ndcdc", src, index, out,
      nearDupMinJaccard = Some(0.5), postings = Some(postings))
      .awaitTermination()

    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(2L, 11L))
    assert(index.read().select("doc_id").as[Long].collect().toSet ==
      Set(2L, 11L), "forgotten doc's signature rows must leave the index")
    assert(postings.read().select("doc_id").as[Long].collect().toSet ==
      Set(2L, 11L), "forgotten doc's band postings must leave postings")
  }

  test("perceptual curation MV: restart exactly-once on the binary " +
    "axis, forget propagates to out/index/postings, re-upload of " +
    "forgotten media re-admits") {
    import graft.operators.{DedupOps, MultimodalOps}
    def frame(c: Char) = c.toString * 64
    val base = ('a' to 't').map(frame).mkString
    val looped = ('a' to 't').map(frame).reverse.mkString +
      frame('a') + frame('b') // same frame SET as base -> hamming 0
    val disjoint = ('A' to 'T').map(frame).mkString
    def media(rows: Seq[(Long, String)]) =
      MultimodalOps.withBinaryPayload(rows.toDF("doc_id", "text"))
    val mediaSchema = media(Seq((0L, "x"))).schema
    val root = tmpDir("pcur")
    val src = LakeTable.create(spark, s"$root/src", mediaSchema)
    val index = LakeTable.create(spark, s"$root/idx",
      MultimodalOps.perceptualSketch(media(Seq((0L, "x")))).schema,
      bucketBy = Some(("doc_id", 8)))
    val postings = LakeTable.create(spark, s"$root/post",
      DedupOps.simHashPostingsSchema,
      properties = DedupOps.simHashPostingsProps,
      bucketBy = Some(("pbh", 16)))
    val out = LakeTable.create(spark, s"$root/out", mediaSchema)
    val mv = new MVManager(spark, s"$root/ckpt")
    def run() = mv.startPerceptualCurationFromLake("pcur", src, index,
      out, postings = Some(postings)).awaitTermination()

    src.append(media(Seq((1L, base), (5L, disjoint)))) // v1
    run()
    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(1L, 5L))

    // restart: an exact copy and a frame-reordered/looped re-encode of
    // accepted media are both rejected THROUGH the postings probe
    // (hamming 0 by set semantics); within the batch the two copies
    // also collapse to one cluster
    src.append(media(Seq((10L, base), (11L, looped)))) // v2
    run()
    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(1L, 5L), "re-encoded copies leaked past the sketch index")

    // GDPR forget of media 1: its row leaves out, its sketch —
    // derived content — leaves the index, its bands leave postings
    src.deleteWhereEqual(Seq(1L).toDF("doc_id"), Seq("doc_id")) // v3
    // re-upload of the forgotten content (new id) and a looped copy
    // of the SURVIVING media 5 arrive together: the first re-admits
    // (frontier freed), the second still rejects
    src.append(media(Seq((21L, base), (22L, disjoint + frame('A'))))) // v4
    run()
    assert(out.read().select("doc_id").as[Long].collect().toSet ==
      Set(5L, 21L))
    assert(index.read().select("doc_id").as[Long].collect().toSet ==
      Set(5L, 21L), "forgotten sketch survived in the index")
    assert(postings.read().select("doc_id").as[Long].collect().toSet ==
      Set(5L, 21L), "forgotten bands survived in postings")

    // wholesale replay: nothing moves anywhere
    val (vo, vi, vp) =
      (out.currentVersion, index.currentVersion, postings.currentVersion)
    run()
    assert(out.currentVersion == vo && index.currentVersion == vi &&
      postings.currentVersion == vp)
  }

  test("embedding CDC curation: a forgotten vector leaves out/index/" +
    "postings and an exact re-embedding of the content re-admits") {
    import graft.operators.SimilarityOps
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val src = LakeTable.create(spark, tmpDir("ecdc-src"), embSchema)
    val index = LakeTable.create(spark, tmpDir("ecdc-idx"), embSchema,
      bucketBy = Some(("vec_id", 8)))
    val postings = LakeTable.create(spark, tmpDir("ecdc-post"),
      SimilarityOps.srpPostingsSchema,
      properties = SimilarityOps.srpPostingsProps(),
      bucketBy = Some(("pbh", 16)))
    val out = LakeTable.create(spark, tmpDir("ecdc-out"), embSchema)
    val mv = new MVManager(spark, tmpDir("ecdc-ckpt"))

    def vec(axes: Seq[Int]): Seq[Float] =
      (0 until 64).map(i => if (axes.contains(i)) 1f else 0f)
    src.append(Seq((1L, vec(Seq(0, 1, 2))), (5L, vec(Seq(40, 41))))
      .toDF("vec_id", "embedding")) // v1
    mv.startEmbeddingCurationCdc("ecdc", src, index, out,
      threshold = 0.35, postings = Some(postings)).awaitTermination()
    assert(out.read().select("vec_id").as[Long].collect().toSet ==
      Set(1L, 5L))

    src.deleteWhereEqual(Seq(1L).toDF("vec_id"), Seq("vec_id")) // v2
    // v3: re-embedding of the forgotten content (exact copy, new id)
    // re-admits; a near copy of the SURVIVING vector 5 still rejects
    src.append(Seq((11L, vec(Seq(0, 1, 2))), (15L, vec(Seq(40))))
      .toDF("vec_id", "embedding"))
    mv.startEmbeddingCurationCdc("ecdc", src, index, out,
      threshold = 0.35, postings = Some(postings)).awaitTermination()

    assert(out.read().select("vec_id").as[Long].collect().toSet ==
      Set(5L, 11L))
    assert(index.read().select("vec_id").as[Long].collect().toSet ==
      Set(5L, 11L), "forgotten vector must leave the index")
    assert(postings.read().select("vec_id").as[Long].collect().toSet ==
      Set(5L, 11L), "forgotten vector's SRP bands must leave postings")

    // replay is a no-op across all four tables
    val (vo, vi, vp) =
      (out.currentVersion, index.currentVersion, postings.currentVersion)
    mv.startEmbeddingCurationCdc("ecdc", src, index, out,
      threshold = 0.35, postings = Some(postings)).awaitTermination()
    assert(out.currentVersion == vo && index.currentVersion == vi &&
      postings.currentVersion == vp)
  }
}
