package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.lake.LakeTable

/** The VERDICT r04 top item: incremental dedup/near-dup must stop
  * reshuffling the index side every batch. These specs pin the two
  * halves of the fix — the bucketed lake layout (probe reads touch
  * only the probed buckets' files) and the join plans (index rows
  * never pass through a ShuffleExchange; every index scan feeds a
  * broadcast hash join as the streamed side). */
class ColocationSpec extends SparkSuite {
  import spark.implicits._

  /** Physical plan flattened THROUGH adaptive wrappers and
    * materialized query stages, so exchange/scan assertions see the
    * whole executed tree. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case o                        => o.children
    }
    p +: kids.flatMap(flatten)
  }

  private def executedFlat(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // finalize any adaptive stages before inspecting
    flatten(df.queryExecution.executedPlan)
  }

  private def scansOf(nodes: Seq[SparkPlan], root: String) =
    nodes.collect {
      case s: FileSourceScanExec
          if s.relation.location.inputFiles.exists(_.contains(root)) => s
    }

  /** Like [[flatten]] but stops at broadcast boundaries: rows below a
    * BroadcastExchange reach the consumer as a broadcast variable, not
    * through the enclosing shuffle's wire. */
  private def flattenRowFlow(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    import org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec
    val kids = p match {
      case _: BroadcastExchangeLike | _: BroadcastQueryStageExec => Nil
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case o                        => o.children
    }
    p +: kids.flatMap(flattenRowFlow)
  }

  /** No shuffle exchange anywhere in the plan moves rows that came
    * from the index: every ShuffleExchange's ROW-FLOW subtree (not
    * crossing broadcast boundaries) must be free of index scans. */
  private def assertIndexNeverShuffled(nodes: Seq[SparkPlan],
                                       root: String): Unit =
    nodes.collect { case e: ShuffleExchangeLike => e }.foreach { e =>
      assert(scansOf(flattenRowFlow(e.child), root).isEmpty,
        s"index rows pass through a shuffle:\n$e")
    }

  test("pq top-k plan: single pass, zero shuffles, distributed " +
    "partial top-k") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val df = SimilarityOps.pqTopK(
      emb.filter($"vec_id" =!= 0), emb.filter($"vec_id" === 0),
      k = 10, codebookSource = Some(emb))
    val nodes = executedFlat(df)
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
      "PQ search must not shuffle: encode + ADC are per-row kernels " +
        "and top-k merges partial heaps")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "top-k should plan as TakeOrderedAndProject, not global sort")
  }

  test("semantic dedup plan: seeds broadcast to the assignment, " +
    "no cartesian over the corpus") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val nodes = executedFlat(
      SimilarityOps.semanticDedup(emb, k = 8, threshold = 0.35))
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    assert(nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "the k-seed assignment should be a broadcast nested loop")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "no unbroadcast cartesian product anywhere")
  }

  test("bucketed lake layout: writer owns _bucket, probes prune to " +
    "the probed buckets' files with zero shuffle") {
    val t = LakeTable.create(spark, tmpDir("bucketed"), StructType(Seq(
      StructField("fp", StringType), StructField("doc_id", LongType))),
      bucketBy = Some(("fp", 16)))
    t.append((0 until 400).map(i => (s"fp-$i", i.toLong))
      .toDF("fp", "doc_id"))

    // layout invariant: every stored _bucket equals the declared hash
    // (the default stamp is Spark's own bucket hash — murmur3)
    assert(t.read()
      .filter(col("_bucket") =!=
        pmod(hash(col("fp")), lit(16)).cast("int"))
      .count() == 0)
    // driver-side bucketIdOf agrees with the stored layout
    val some = t.read().select("fp", "_bucket").limit(20)
      .as[(String, Int)].collect()
    some.foreach { case (fp, b) => assert(t.bucketIdOf(fp) == b) }

    val probed = t.probe("fp", Seq("fp-7", "fp-123"))
    assert(probed.select("doc_id").as[Long].collect().toSet ==
      Set(7L, 123L))
    val totalFiles = t.read().inputFiles.length
    assert(probed.inputFiles.length < totalFiles,
      s"probe read ${probed.inputFiles.length} of $totalFiles files")
    // at most one bucket DIR per probed fp (a dir may hold several
    // files — one per writing task of each append)
    def dirs(fs: Array[String]) = fs.map(_.replaceAll("/[^/]+$", "")).toSet
    assert(dirs(probed.inputFiles).size <= 2)
    assert(dirs(t.read().inputFiles).size > 8) // 400 fps fill most buckets
    assert(!Bucketing.hasShuffle(probed))

    // the scan is PLANNED FROM THE MANIFEST, not from filesystem
    // listing: post-upgrade commits carry sizes, so both the probe and
    // the full read must resolve to the manifest-served FileIndex
    // (spark.read would stat every path on the driver — one HEAD per
    // file on an object store, the planning bottleneck at scale)
    for (df <- Seq(probed, t.read())) {
      val scans = executedFlat(df).collect {
        case s: FileSourceScanExec => s.relation.location.getClass.getName
      }
      assert(scans.nonEmpty && scans.forall(_.contains("ManifestScan")),
        s"expected manifest-served planning, got $scans")
    }
  }

  test("incremental read paths plan from the manifest too: " +
    "readVersion and changesBetween resolve to the manifest-served " +
    "FileIndex (the streaming curation loops' per-version reads)") {
    val t = LakeTable.create(spark, tmpDir("manifest-incr"), StructType(
      Seq(StructField("fp", StringType), StructField("doc_id", LongType))),
      bucketBy = Some(("fp", 8)))
    t.append((0L until 50L).map(i => (s"fp-$i", i)).toDF("fp", "doc_id"))
    t.append((50L until 90L).map(i => (s"fp-$i", i)).toDF("fp", "doc_id"))
    // the curation loops read each micro-batch's version range through
    // changesBetween — at scale that planning must cost zero listing
    // round-trips, same as the full read (ManifestScan serves file
    // list + sizes straight from the committed snapshot)
    for (df <- Seq(t.readVersion(1), t.changesBetween(1, 2),
                   t.changesBetween(-1, 2))) {
      val scans = executedFlat(df).collect {
        case s: FileSourceScanExec => s.relation.location.getClass.getName
      }
      assert(scans.nonEmpty && scans.forall(_.contains("ManifestScan")),
        s"expected manifest-served planning, got $scans")
    }
    assert(t.changesBetween(1, 2).count() == 40)
    assert(t.readVersion(1).count() == 50)
  }

  test("bucketed layout contract: upsert routes through the hash, " +
    "rename/drop of the bucket column are rejected") {
    val t = LakeTable.create(spark, tmpDir("bucketed-evo"), StructType(Seq(
      StructField("fp", StringType), StructField("doc_id", LongType))),
      bucketBy = Some(("fp", 8)))
    t.append(Seq(("k1", 1L), ("k2", 2L)).toDF("fp", "doc_id"))
    // upsert callers never supply _bucket; the writer derives it
    t.upsert(Seq(("k1", 10L), ("k3", 3L)).toDF("fp", "doc_id"), Seq("fp"))
    assert(t.read().select("fp", "doc_id").as[(String, Long)]
      .collect().toSet == Set(("k1", 10L), ("k2", 2L), ("k3", 3L)))
    // and every row still sits in its declared bucket
    assert(t.read().filter(col("_bucket") =!=
      pmod(hash(col("fp")), lit(8)).cast("int")).count() == 0)
    assert(t.probe("fp", Seq("k3")).select("doc_id").as[Long]
      .collect().toSeq == Seq(3L))
    // the layout derives from fp: renaming or dropping it would orphan
    // every file's _bucket
    intercept[IllegalArgumentException] { t.renameColumn("fp", "fp2") }
    intercept[IllegalArgumentException] { t.dropColumn("fp") }
    intercept[IllegalArgumentException] { t.renameColumn("_bucket", "b") }
  }

  test("freshAgainstIndex: same answer as the naive anti-join, index " +
    "side pruned and never shuffled") {
    val index = LakeTable.create(spark, tmpDir("fresh-idx"), StructType(Seq(
      StructField("fp", StringType), StructField("doc_id", LongType))),
      bucketBy = Some(("fp", 16)))
    val history = (0 until 300).map(i => (i.toLong, s"history document $i"))
      .toDF("doc_id", "text")
    index.append(history.select(
      graft.functions.TextFunctions.fingerprint($"text").as("fp"), $"doc_id"))

    val batch = Seq(
      (1000L, "history document 42"),  // dup of history -> dropped
      (1001L, "genuinely new one"),
      (1002L, "history document 7"),   // dup of history -> dropped
      (1003L, "genuinely new one"),    // within-batch copy -> collapsed
      (1004L, "another new one")).toDF("doc_id", "text")

    val fresh = DedupOps.freshAgainstIndex(batch, index)
    assert(fresh.select("doc_id").as[Long].collect().toSet ==
      Set(1001L, 1004L))

    val nodes = executedFlat(fresh)
    val idxScans = scansOf(nodes, index.root)
    assert(idxScans.nonEmpty, "expected a scan of the index")
    assertIndexNeverShuffled(nodes, index.root)
    // the probe pruned: the index scan reads a strict subset of files
    val totalFiles = index.read().inputFiles.length
    assert(idxScans.map(_.relation.location.inputFiles.length).sum
      < totalFiles)
    // and the matching fps reach the anti-join through a broadcast
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]))
  }

  test("embeddingNearDupAgainstIndex: matches the brute-force " +
    "cross-slice band+cosine reference, index never shuffled") {
    import graft.functions.VectorFunctions.cosine_sim
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val hist = emb.filter($"vec_id" % 3 === 0)
    val batch = emb.filter($"vec_id" % 2 === 0)
    val index = LakeTable.create(spark, tmpDir("vec-idx"), emb.schema,
      bucketBy = Some(("vec_id", 8)))
    index.append(hist)

    val got = SimilarityOps.embeddingNearDupAgainstIndex(
      batch, index, threshold = 0.35)
    val pairs = got.select("v_new", "v_idx").as[(Long, Long)]
      .collect().toSet

    // brute-force reference: every cross-slice pair agreeing in some
    // sign band under the graded default geometry (4 x 16 bits), with
    // exact cosine >= threshold
    val bits = SimilarityOps.DefaultIndexBandBits
    val mask = (1L << bits) - 1
    def sig(c: org.apache.spark.sql.Column) =
      graft.functions.SignRandomProjection.sign_bits(c)
    val ref = batch.as("a").join(hist.as("b"),
        (0 until SimilarityOps.DefaultIndexBands).map(k =>
          shiftright(sig($"a.embedding"), k * bits).bitwiseAND(mask) ===
            shiftright(sig($"b.embedding"), k * bits).bitwiseAND(mask))
          .reduce(_ || _))
      .select($"a.vec_id".as("v_new"), $"b.vec_id".as("v_idx"),
        cosine_sim($"a.embedding", $"b.embedding").as("cos"))
      .filter($"cos" >= 0.35)
      .select("v_new", "v_idx").as[(Long, Long)].collect().toSet
    assert(pairs == ref)
    assert(pairs.exists(p => p._1 == p._2), "self-pairs from %6 overlap")

    val nodes = executedFlat(got)
    assertIndexNeverShuffled(nodes, index.root)
    assert(scansOf(nodes, index.root).nonEmpty)
  }

  test("nearDupAgainstIndex: bucketed index, same pairs as exact " +
    "cross-comparison, index side never shuffled in the served plan") {
    val mk = (id: Long, base: String) => (id, base)
    // two near-dup families with DISJOINT vocabularies (identical text
    // within a family -> jaccard 1.0, certain LSH recall; zero shared
    // shingles across families) + unrelated noise on both sides
    val famA = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val famB = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    val history = Seq(
      mk(1L, famA),
      mk(2L, famB),
      mk(3L, "completely unrelated history words aisle bough crane " +
        "dune ember fjord grove heath inlet knoll larch mesa"))
      .toDF("doc_id", "text")
    val batch = Seq(
      mk(100L, famA),  // dup of 1
      mk(101L, famB),  // dup of 2
      mk(102L, "fresh material nothing in common with anything else " +
        "aa bb cc dd ee ff gg hh ii jj kk ll"))
      .toDF("doc_id", "text")

    val rows = DedupOps.signatureIndexRows(history)
    val index = LakeTable.create(spark, tmpDir("sig-idx"), rows.schema,
      bucketBy = Some(("doc_id", 8)))
    index.append(rows)

    val got = DedupOps.nearDupAgainstIndex(batch, index, minJaccard = 0.5)
    val pairs = got.select("d_new", "d_idx").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 1L), (101L, 2L)))

    val nodes = executedFlat(got)
    assertIndexNeverShuffled(nodes, index.root)
    assert(scansOf(nodes, index.root).nonEmpty)
  }

  test("band postings probe: same pairs as the band-scan path, and a " +
    "small batch reads a small FRACTION of postings + index files " +
    "(the O(batch)-per-batch property)") {
    // large index: 120 docs with disjoint 12-word vocabularies across
    // 12 separate commits -> many files in both tables
    def words(seed: Int) =
      (0 until 12).map(j => s"w${seed}x$j").mkString(" ")
    val history = (0 until 120).map(i => (i.toLong, words(i)))
    val rows = DedupOps.signatureIndexRows(
      history.toDF("doc_id", "text")).localCheckpoint()
    val index = LakeTable.create(spark, tmpDir("post-idx"), rows.schema,
      bucketBy = Some(("doc_id", 8)))
    val postings = LakeTable.create(spark, tmpDir("post-post"),
      DedupOps.bandPostingsSchema,
      properties = DedupOps.bandPostingsProps(),
      bucketBy = Some(("pbh", 64)))
    history.grouped(10).zipWithIndex.foreach { case (grp, i) =>
      val r = DedupOps.signatureIndexRows(
        grp.toDF("doc_id", "text")).localCheckpoint()
      index.appendExactlyOnce(r, "w", i.toLong)
      postings.appendExactlyOnce(DedupOps.bandPostingsRows(r), "w",
        i.toLong)
    }
    // tiny batch: one dup of history doc 42, one genuinely fresh doc
    val batch = Seq((1000L, words(42)), (1001L, words(9999)))
      .toDF("doc_id", "text")

    val got = DedupOps.nearDupAgainstIndex(batch, index,
      minJaccard = 0.5, postings = Some(postings))
    val pairs = got.select("d_new", "d_idx").as[(Long, Long)]
      .collect().toSet
    assert(pairs == Set((1000L, 42L)))
    // semantics identical to the legacy band-scan path
    val legacy = DedupOps.nearDupAgainstIndex(batch, index,
      minJaccard = 0.5)
    assert(legacy.select("d_new", "d_idx").as[(Long, Long)]
      .collect().toSet == pairs)

    val nodes = executedFlat(got)
    assertIndexNeverShuffled(nodes, index.root)
    assertIndexNeverShuffled(nodes, postings.root)
    // the candidate stage is localCheckpointed inside the operator, so
    // measure the EXACT probe it issues (same probe() code path, same
    // keys): the batch's ~32 band keys (2 docs x 16 bands) over 64
    // buckets touch only their bucket dirs — not all of history
    val pbhs = DedupOps.bandPostingsRows(
        DedupOps.signatureIndexRows(batch))
      .select("pbh").distinct().as[Long].collect()
    val probed = postings.probe("pbh", pbhs.toSeq)
    val postTotal = postings.read().inputFiles.length
    val postRead = probed.inputFiles.length
    assert(postRead > 0 && postRead < postTotal / 2,
      s"postings probe read $postRead of $postTotal files")
    assert(!Bucketing.hasShuffle(probed))
    // and the probe's rows suffice to regenerate the candidate: doc 42
    // must collide with the batch dup in some band
    assert(probed.select("doc_id").as[Long].collect().toSet
      .contains(42L))
    // the index is touched only by the verify fetch of candidate 42
    val idxTotal = index.read().inputFiles.length
    val idxRead = scansOf(nodes, index.root)
      .map(_.relation.location.inputFiles.length).sum
    assert(idxRead > 0 && idxRead < idxTotal / 2,
      s"verify fetch read $idxRead of $idxTotal index files")
  }

  test("probeBuckets: bucket-dir pruning with no residual filter, " +
    "degrading to a full read at full coverage") {
    val t = LakeTable.create(spark, tmpDir("probe-buckets"),
      StructType(Seq(StructField("pbh", LongType),
        StructField("doc_id", LongType))),
      bucketBy = Some(("pbh", 64)))
    t.append((0L until 4000L).map(i => (i * 7919L, i))
      .toDF("pbh", "doc_id"))
    val total = t.read().inputFiles.length
    // a handful of keys: only their bucket dirs are planned, and ALL
    // rows of those dirs come back (no per-value filter — callers
    // re-join on the exact key)
    val keys = Seq(7919L, 15838L, 23757L)
    val probed = t.probeBuckets("pbh", keys)
    assert(probed.inputFiles.length < total / 2,
      s"read ${probed.inputFiles.length} of $total files")
    assert(!Bucketing.hasShuffle(probed))
    val got = probed.select("pbh").as[Long].collect().toSet
    assert(keys.forall(got.contains), "probed keys' rows must be present")
    // rows sharing the probed buckets ride along — that's the contract
    assert(got.size >= keys.size)
    // key sets covering every bucket degrade to a plain full read
    val all = t.probeBuckets("pbh", (0L until 4000L).map(_ * 7919L))
    assert(all.count() == 4000L)
    // unbucketed-column fallback: full read, nothing lost
    assert(t.probeBuckets("doc_id", Seq(1L)).count() == 4000L)
  }

  test("composite-key bucketing: an aggregate-MV upsert rewrites ONLY " +
    "the buckets holding its changed keys; every other file survives " +
    "byte-identical") {
    import java.nio.file.{Files, Paths}
    val t = LakeTable.create(spark, tmpDir("agg-mv-bucketed"),
      StructType(Seq(
        StructField("event_type", StringType),
        StructField("uid_bucket", LongType),
        StructField("n", LongType))),
      bucketBy = Some(("event_type,uid_bucket", 8)))
    // the full key space: 4 types x 10 uid buckets
    val types = Seq("click", "view", "purchase", "refund")
    val full = (for (ty <- types; u <- 0L until 10L)
      yield (ty, u, 1L)).toDF("event_type", "uid_bucket", "n")
    t.append(full)
    // stored layout must agree with the driver-side composite hash
    t.read().select("event_type", "uid_bucket", "_bucket")
      .as[(String, Long, Int)].collect().foreach { case (ty, u, b) =>
        assert(t.bucketIdOfKey(Seq(ty, u)) == b,
          s"layout/driver hash disagree for ($ty,$u)")
      }
    def snapshot(): Map[String, (Long, Long)] =
      t.dataFiles.map { f =>
        val p = Paths.get(t.root, f.path)
        f.path -> (Files.size(p), Files.getLastModifiedTime(p).toMillis)
      }.toMap
    val before = snapshot()
    // one changed key -> exactly one bucket dir may be rewritten
    val touched = t.bucketIdOfKey(Seq("purchase", 3L))
    t.upsert(Seq(("purchase", 3L, 99L))
      .toDF("event_type", "uid_bucket", "n"),
      Seq("event_type", "uid_bucket"))
    val after = snapshot()
    val (gone, kept) = before.partition { case (p, _) => !after.contains(p) }
    assert(gone.keySet.forall(_.contains(s"_bucket=$touched")),
      s"files outside bucket $touched were rewritten: ${gone.keySet}")
    kept.foreach { case (p, meta) =>
      assert(after(p) == meta, s"surviving file $p changed: " +
        s"$meta -> ${after(p)}")
    }
    assert(t.read().filter($"event_type" === "purchase" &&
      $"uid_bucket" === 3L).select("n").as[Long].head() == 99L)
    assert(t.read().count() == 40)
  }
}
