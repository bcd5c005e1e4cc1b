package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.lake.LakeTable
import graft.operators.{IvfIndex, TextOps}

/** Delete-aware index maintenance (MVManager.startLexicalIndexCdc /
  * startVectorIndexCdc): a GDPR delete on the source table must leave
  * the SERVING index — postings, docstats, inverted lists — exactly
  * as a from-scratch build over the survivors, across restarts, with
  * replays staying exactly-once (a replayed delete must not re-commit
  * at a fresh sequence number and kill re-inserted rows). */
class CdcIndexMVSpec extends SparkSuite {
  import spark.implicits._

  test("lexical CDC MV: source delete propagates to postings and " +
    "docstats; BM25 serves the survivors; re-inserted doc reappears; " +
    "replay is exactly-once") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val root = tmpDir("lexcdc")
    val src = LakeTable.create(spark, s"$root/src", docs.schema)
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), docs.schema)
    val (pt, dt) = TextOps.buildLexicalIndex(spark, empty, s"$root/idx")
    val mv = new MVManager(spark, s"$root/ckpt")

    src.append(docs) // v1
    mv.startLexicalIndexCdc("lex", src, pt, dt).awaitTermination()
    val forgotten = docs.filter($"doc_id" % 5 === 2 && $"doc_id" =!= 0)
    src.deleteWhereEqual(forgotten.select($"doc_id"), Seq("doc_id")) // v2
    mv.startLexicalIndexCdc("lex", src, pt, dt).awaitTermination()

    // the index no longer serves any forgotten doc
    val forgottenIds = forgotten.select($"doc_id").as[Long].collect().toSet
    val served = pt.read().select($"doc_id").as[Long].collect().toSet
    assert(served.intersect(forgottenIds).isEmpty,
      "forgotten docs still in postings")
    assert(dt.read().select($"doc_id").as[Long].collect().toSet
      .intersect(forgottenIds).isEmpty, "forgotten docs still in docstats")

    // serving equals a from-scratch build over the survivors (df, N,
    // avgdl all shrink with the corpus)
    val survivors = docs.filter(!($"doc_id" % 5 === 2 && $"doc_id" =!= 0))
    val (pt2, dt2) = TextOps.buildLexicalIndex(spark, survivors,
      s"$root/rebuilt")
    def serve(p: LakeTable, d0: LakeTable) =
      TextOps.bm25FromIndex(p, d0, queryDoc = 0L, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(serve(pt, dt) == serve(pt2, dt2))

    // replay: re-running the finished stream changes nothing
    val beforeReplay = (pt.currentVersion, dt.currentVersion)
    mv.startLexicalIndexCdc("lex", src, pt, dt).awaitTermination()
    assert(serve(pt, dt) == serve(pt2, dt2))

    // a forgotten doc re-inserted AFTER the delete serves again (the
    // index delete's sequence scope must not reach the new postings)
    val back = docs.filter($"doc_id" === forgottenIds.min)
    src.append(back) // v3
    mv.startLexicalIndexCdc("lex", src, pt, dt).awaitTermination()
    assert(pt.read().filter($"doc_id" === forgottenIds.min).count() > 0,
      "re-inserted doc has no postings")
  }

  test("vector CDC MV: deleted vectors leave the inverted lists; " +
    "serving matches a survivor rebuild; upsert-shaped step converges") {
    val emb = Tables.load(spark, sf, "embeddings")
    val model = IvfIndex.trainPortable(emb, c = 8)
    val vecs = emb.filter($"vec_id" =!= 0).select($"vec_id", $"embedding")
    val root = tmpDir("veccdc")
    val src = LakeTable.create(spark, s"$root/src", vecs.schema)
    val index = LakeTable.create(spark, s"$root/idx",
      IvfIndex.assign(vecs, model).schema,
      properties = LakeTable.autoCompactProps(model.c),
      partitionBy = Seq("_cluster"))
    val mv = new MVManager(spark, s"$root/ckpt")

    src.append(vecs) // v1
    mv.startVectorIndexCdc("vec", src, index, model).awaitTermination()
    src.deleteWhereEqual(vecs.filter($"vec_id" % 4 === 1)
      .select($"vec_id"), Seq("vec_id")) // v2
    mv.startVectorIndexCdc("vec", src, index, model).awaitTermination()

    val survivors = vecs.filter($"vec_id" % 4 =!= 1)
    val rebuilt = IvfIndex.buildIndex(spark, survivors, model,
      tmpDir("veccdc-rebuilt"))
    def lists(t: LakeTable): Seq[(Long, Int)] =
      t.read().select($"vec_id", $"_cluster".cast("int"))
        .as[(Long, Int)].collect().sorted.toSeq
    assert(lists(index) == lists(rebuilt),
      "CDC-maintained lists differ from survivor rebuild")

    val qv = emb.filter($"vec_id" === 0)
      .select("embedding").as[Seq[Float]].head().toArray
    def serve(t: LakeTable): Seq[(Long, Double)] =
      IvfIndex.searchPersisted(t, qv, model, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(serve(index) == serve(rebuilt))

    // an upsert on the source (delete+insert in ONE commit) converges:
    // the moved vector is in the index exactly once, under its new
    // embedding's cluster
    val movedId = vecs.filter($"vec_id" % 4 === 0)
      .agg(min($"vec_id")).as[Long].head()
    val donor = vecs.filter($"vec_id" % 4 === 2)
      .orderBy($"vec_id".desc).select($"embedding").limit(1)
      .as[Seq[Float]].head()
    val moved = Seq((movedId, donor)).toDF("vec_id", "embedding")
    src.upsertMor(moved, Seq("vec_id")) // v3
    mv.startVectorIndexCdc("vec", src, index, model).awaitTermination()
    assert(index.read().filter($"vec_id" === movedId).count() == 1,
      "upserted vector not exactly-once in index")
    val survivors2 = survivors.filter($"vec_id" =!= movedId)
      .unionByName(moved)
    val rebuilt2 = IvfIndex.buildIndex(spark, survivors2, model,
      tmpDir("veccdc-rebuilt2"))
    assert(lists(index) == lists(rebuilt2),
      "post-upsert lists differ from survivor rebuild")
  }
}
