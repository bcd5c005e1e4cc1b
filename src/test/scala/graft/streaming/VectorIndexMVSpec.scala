package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.lake.LakeTable
import graft.operators.IvfIndex

/** The continuous vector-index MV (MVManager.startVectorIndexFromLake):
  * commit-log-driven IVF index growth must converge to exactly what a
  * from-scratch buildIndex over the full corpus produces — same
  * inverted-list membership, same served answers — across a
  * checkpoint-resumed restart, with replay staying exactly-once. */
class VectorIndexMVSpec extends SparkSuite {
  import spark.implicits._

  test("vector-index MV: two commits across a restart converge to the " +
    "from-scratch index; a replayed batch does not duplicate rows") {
    val emb = Tables.load(spark, sf, "embeddings")
    val model = IvfIndex.trainPortable(emb, c = 8)
    val vecs = emb.filter($"vec_id" =!= 0)
      .select($"vec_id", $"embedding")
    val root = tmpDir("vecmv")
    val src = LakeTable.create(spark, s"$root/src", vecs.schema)
    val index = LakeTable.create(spark, s"$root/idx",
      IvfIndex.assign(vecs, model).schema,
      properties = LakeTable.autoCompactProps(model.c),
      partitionBy = Seq("_cluster"))
    val mv = new MVManager(spark, s"$root/ckpt")

    src.append(vecs.filter($"vec_id" % 2 === 0))
    mv.startVectorIndexFromLake("vec", src, index, model)
      .awaitTermination()
    val afterFirst = index.read().count()
    src.append(vecs.filter($"vec_id" % 2 =!= 0))
    mv.startVectorIndexFromLake("vec", src, index, model)
      .awaitTermination()
    assert(index.read().count() > afterFirst)

    val rebuilt = IvfIndex.buildIndex(spark, vecs, model,
      tmpDir("vecmv-rebuilt"))
    def lists(t: LakeTable): Seq[(Long, Int)] =
      t.read().select($"vec_id", $"_cluster".cast("int"))
        .as[(Long, Int)].collect().sorted.toSeq
    assert(lists(index) == lists(rebuilt),
      "MV-grown inverted lists differ from a from-scratch build")

    // exactly-once: re-running the finished stream replays nothing
    mv.startVectorIndexFromLake("vec", src, index, model)
      .awaitTermination()
    assert(lists(index) == lists(rebuilt), "replay duplicated rows")

    // served answers agree end to end (partition-pruned plan on both)
    val qv = emb.filter($"vec_id" === 0)
      .select("embedding").as[Seq[Float]].head().toArray
    def serve(t: LakeTable): Seq[(Long, Double)] =
      IvfIndex.searchPersisted(t, qv, model, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(serve(index) == serve(rebuilt))
  }
}
