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

  test("perceptual sketch: frame-set semantics (reorder/repeat = same " +
    "sketch), exact copies at hamming 0, disjoint payloads far apart") {
    // 64-byte frames built from distinct fill characters
    def frame(c: Char) = c.toString * 64
    val base = ('a' to 't').map(frame).mkString          // 20 frames
    val looped = ('a' to 't').map(frame).reverse.mkString +
      frame('a') + frame('b')                            // reordered + repeats
    val disjoint = ('A' to 'T').map(frame).mkString      // no shared frame
    val media = MultimodalOps.withBinaryPayload(Seq(
      (1L, base), (2L, base), (3L, looped), (4L, disjoint))
      .toDF("doc_id", "text"))
    val sk = MultimodalOps.perceptualSketch(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) == sk(2L), "exact copy must sketch identically")
    // the sketch is over DISTINCT frame hashes: frame order and
    // repetition (a looped video) cannot move it
    assert(sk(1L) == sk(3L), "frame reorder/repeat must not move sketch")
    val ham = java.lang.Long.bitCount(sk(1L) ^ sk(4L))
    assert(ham > 3, s"disjoint payloads at hamming $ham")
    // banded pairs find exactly the near trio
    val pairs = DedupOps.sketchPairs(
        MultimodalOps.perceptualSketch(media), maxHamming = 3)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("incremental perceptual probe matches the banded all-pairs " +
    "cross-slice, with and without postings") {
    val media = MultimodalOps.withBinaryPayload(docs)
    val idxSketches = MultimodalOps.perceptualSketch(
      media.filter($"doc_id" % 3 === 0)).localCheckpoint()
    val root = tmpDir("phidx")
    val index = graft.lake.LakeTable.create(spark, s"$root/idx",
      idxSketches.schema, bucketBy = Some(("doc_id", 8)))
    index.appendExactlyOnce(idxSketches, "t", 0L)
    val postings = graft.lake.LakeTable.create(spark, s"$root/post",
      DedupOps.simHashPostingsSchema,
      properties = DedupOps.simHashPostingsProps,
      bucketBy = Some(("pbh", 16)))
    postings.appendExactlyOnce(
      DedupOps.simHashPostingsRows(idxSketches), "t", 0L)
    val batch = MultimodalOps.perceptualSketch(
      media.filter($"doc_id" % 2 === 0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"d_new", $"d_idx", $"hamming".cast("long"))
        .as[(Long, Long, Long)].collect().toSet
    val viaIndex = rows(DedupOps.sketchesAgainstIndex(batch, index))
    val viaPostings = rows(DedupOps.sketchesAgainstIndex(batch, index,
      postings = Some(postings)))
    // ground truth: full cross-slice hamming join over the sketches
    val all = MultimodalOps.perceptualSketch(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = (for {
      (dn, hn) <- all; (di, hi) <- all
      if dn % 2 == 0 && di % 3 == 0
      h = java.lang.Long.bitCount(hn ^ hi) if h <= 3
    } yield (dn, di, h.toLong)).toSet
    assert(viaIndex == truth, "index probe missed/invented pairs")
    assert(viaPostings == truth, "postings probe missed/invented pairs")
  }

  test("frame-set Jaccard: the element-postings probe equals ground " +
    "truth cross-slice, and maxDf drops ubiquitous frames without " +
    "corrupting jaccard for pairs found through rarer ones") {
    val media = MultimodalOps.withBinaryPayload(docs)
    val idxRows = MultimodalOps.frameSignatureRows(
      media.filter($"doc_id" % 3 === 0)).localCheckpoint()
    val postings = graft.lake.LakeTable.create(spark, tmpDir("fjp"),
      DedupOps.elementPostingsSchema,
      properties = DedupOps.elementPostingsProps,
      bucketBy = Some(("eh", 16)))
    postings.appendExactlyOnce(
      DedupOps.elementPostingsRows(idxRows), "t", 0L)
    val batchRows = MultimodalOps.frameSignatureRows(
      media.filter($"doc_id" % 2 === 0)).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"d_new", $"d_idx", $"inter", $"jaccard")
        .as[(Long, Long, Long, Double)].collect().toSet
    val probed = rows(
      DedupOps.setJaccardAgainstIndex(batchRows, postings))
    // ground truth from the collected sets
    val idxSets = idxRows.select($"doc_id", $"shs")
      .as[(Long, Seq[Long])].collect().toMap
    val batchSets = batchRows.select($"doc_id", $"shs")
      .as[(Long, Seq[Long])].collect().toMap
    val truth = (for {
      (dn, sn) <- batchSets; (di, si) <- idxSets
      inter = sn.toSet.intersect(si.toSet).size.toLong if inter > 0
      j = inter.toDouble / (sn.size + si.size - inter) if j >= 0.5
    } yield (dn, di, inter, j)).toSet
    assert(probed == truth, "probe disagrees with ground truth")
    // maxDf semantics pinned: candidates come only through elements
    // with df <= cap, but inter/jaccard are computed from ALL shared
    // elements — so the capped result is EXACTLY the truth pairs that
    // share at least one rare element, with uncorrupted jaccard
    val cappedRows = rows(DedupOps.setJaccardAgainstIndex(
      batchRows, postings, maxDf = Some(1)))
    val dfOf = idxSets.values.flatMap(_.distinct).toSeq
      .groupBy(identity).map { case (e, xs) => e -> xs.size }
    val cappedTruth = truth.filter { case (dn, di, _, _) =>
      batchSets(dn).toSet.intersect(idxSets(di).toSet)
        .exists(e => dfOf(e) <= 1)
    }
    assert(cappedRows == cappedTruth,
      "capped probe must emit exactly the rare-element-reachable " +
        "pairs with exact jaccard")
  }

  test("multimodal pair curation: quality and aspect gates compose") {
    val feats = MultimodalOps.documentFeatures(spark, docs)
    val qual = graft.operators.TextOps.quality(spark, sf)
    val curated = feats.join(qual, "doc_id")
      .filter($"quality" >= 0.8 &&
        $"width" <= lit(4L) * $"height" &&
        $"height" <= lit(4L) * $"width")
    val n = curated.count()
    assert(n > 0 && n < docs.count(),
      s"gate must be selective, kept $n of ${docs.count()}")
    assert(curated.filter($"quality" < 0.8).count() == 0)
    assert(curated.filter($"width" > lit(4L) * $"height" ||
      $"height" > lit(4L) * $"width").count() == 0)
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
