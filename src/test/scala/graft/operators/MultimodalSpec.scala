package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.TextFunctions.rollingFingerprint

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Tables.load(spark, sf, "documents")

  test("feature extraction is deterministic and schema-stable") {
    val f1 = MultimodalOps.documentFeatures(spark, docs)
    val f2 = MultimodalOps.documentFeatures(spark, docs)
    assert(f1.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "content_hash", "width", "height") ++
        (0 until 8).map(j => s"f$j"))
    assert(f1.count() == docs.count())
    val h1 = f1.orderBy("doc_id").select("content_hash").as[Long].collect()
    val h2 = f2.orderBy("doc_id").select("content_hash").as[Long].collect()
    assert(h1.sameElements(h2))
    assert(h1.forall(_ >= 0)) // 60-bit md5 prefix is non-negative
    assert(f1.filter($"width" < 1 || $"width" > 1920 ||
      $"height" < 1 || $"height" > 1080).count() == 0)
    assert(f1.filter($"f0" < 0 || $"f0" >= 1 || $"f7" < 0 || $"f7" >= 1)
      .count() == 0)
    // the typed array shape (downstream similarity input) is intact
    val arr = MultimodalOps.extractFeatures(
      MultimodalOps.withBinaryPayload(docs)).toDF()
    assert(arr.select(max(size($"features"))).as[Int].head() == 8)
  }

  test("frame sampling keeps every Nth fixed-size chunk") {
    val media = MultimodalOps.withBinaryPayload(docs.limit(10))
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 32, everyN = 2)
    assert(frames.filter($"frame_idx" % 2 =!= 0).count() == 0)
    assert(frames.filter($"n_bytes" > 32).count() == 0)
    // doc with L bytes yields ceil(L/32) chunks, every 2nd kept
    val perDoc = frames.groupBy($"doc_id").count()
    val expected = media.select($"doc_id",
      ceil(length($"payload".cast("string")) / 32.0).as("chunks"))
    assert(perDoc.count() == 10)
  }

  test("rolling fingerprint is order-sensitive, md5 fingerprint is not") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val rolled = df.select(rollingFingerprint("text")).as[Long].collect()
    assert(rolled(0) != rolled(1))
    val same = Seq((1L, "alpha beta"), (2L, "alpha beta"))
      .toDF("doc_id", "text")
      .select(rollingFingerprint("text")).as[Long].collect()
    assert(same(0) == same(1))
  }
}
