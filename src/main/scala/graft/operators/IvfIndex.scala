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

  /** Persist the FROZEN centers next to an index's metadata — written
    * once (putIfAbsent: first writer wins, racers adopt) so the
    * serving contract survives process restarts: rows already
    * assigned under these centers stay probe-able forever, no matter
    * what the source has grown to since. Double.toString round-trips
    * exactly, so the reloaded model is bit-identical. */
  def saveModel(indexRoot: String, model: Model,
                store: graft.lake.CommitStore =
                  graft.lake.PosixCommitStore): Unit = {
    val path = java.nio.file.Paths.get(indexRoot, "metadata",
      "ivf-model.json")
    java.nio.file.Files.createDirectories(path.getParent)
    val body = model.centroids
      .map(_.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    store.putIfAbsent(path, body); ()
  }

  /** Reload the frozen centers persisted by [[saveModel]]; None when
    * the index predates model persistence (caller must then supply
    * the original model explicitly). Reads through the SAME
    * [[graft.lake.CommitStore]] the model was saved through —
    * Engine.startVectorIndex threads the index table's store into
    * both calls, so on an object-store deployment the model is found
    * where it was written instead of silently tripping the
    * predates-persistence path. */
  def loadModel(indexRoot: String,
                store: graft.lake.CommitStore =
                  graft.lake.PosixCommitStore): Option[Model] = {
    val path = java.nio.file.Paths.get(indexRoot, "metadata",
      "ivf-model.json")
    store.read(path).map { raw =>
      val rows = raw.trim.stripPrefix("[").stripSuffix("]")
        .split("\\],\\[").map(_.stripPrefix("[").stripSuffix("]"))
      Model(rows.map(_.split(",").map(_.toDouble)))
    }
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

  /** k-means‖-style seeding (Bahmani et al., VLDB'12, adapted): a
    * deterministic pseudo-random oversample of `5*c` vectors — ordered
    * by xxhash64(id), which TakeOrderedAndProject serves from
    * per-partition top-k heaps (no full sort, no shuffle of the corpus)
    * — then driver-local farthest-point (maximin) selection of the
    * final c centers from that sample. The expensive distributed phase
    * touches each row once; the O(5c * c * dim) selection runs on a
    * few-hundred-row sample on the driver. Deterministic by
    * construction (hash order + maximin), so training is reproducible
    * without a seed parameter. */
  private def seedCentroids(vectors: DataFrame, c: Int, embCol: String,
                            idCol: String): Array[Array[Double]] = {
    val sample = vectors
      .orderBy(xxhash64(col(idCol)), col(idCol)) // hash ties broken stably
      .limit(5 * c)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (sample.length <= c) return sample
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    val minD2 = sample.map(d2(_, sample.head))
    while (chosen.length < c) {
      var best = 0; var i = 1
      while (i < sample.length) {
        if (minD2(i) > minD2(best)) best = i
        i += 1
      }
      chosen += sample(best)
      i = 0
      while (i < sample.length) {
        val d = d2(sample(i), sample(best))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
    }
    chosen.toArray
  }

  /** Deterministic training: k-means‖-style sampled seed + `iters`
    * Lloyd rounds. MEASURED IN BOTH REGIMES (tools/RecallScale,
    * BENCH_NOTES r10 + r11): on near-isotropic corpora (no cluster
    * structure, like the synthetic fixture) the averaged Lloyd
    * centers collapse toward the global mean and serve WORSE recall
    * than [[trainPortable]]'s corpus-sample centers at every nprobe
    * (.19 vs .79 at nprobe=1); on a CLUSTERED fixture (64-Gaussian
    * mixture, the regime Lloyd should win) both quantizers reach
    * recall 1.0 by nprobe=4 and portable still leads at nprobe=1
    * (.875 vs .800) — Lloyd's only measured edge is occupancy
    * balance (max cluster 655 vs 1057 at c=64), which matters for
    * tail latency, not recall. Default to trainPortable; reach for
    * Lloyd when a probe-cost budget is dominated by the fattest
    * cluster. */
  def train(vectors: DataFrame, c: Int, iters: Int = 3,
            embCol: String = "embedding", idCol: String = "vec_id"): Model = {
    var cents: Array[Array[Double]] = seedCentroids(vectors, c, embCol, idCol)
    (1 to iters).foreach { _ =>
      val assigned = vectors.select(col(embCol),
        nearest_centroid(col(embCol), cents).as("_cluster"))
      cents = collectCentroids(assigned, embCol, cents)
    }
    Model(cents)
  }

  /** Fully-ORACLED deterministic quantizer variant: the centers are
    * the first `c` corpus vectors in PORTABLE hash order — the first
    * 15 hex chars of md5(vec_id) read as a (positive, 60-bit) bigint,
    * ties broken by id — with no maximin pass and no Lloyd rounds.
    * Every step is reproducible in ANSI SQL (md5 is the q34/q95
    * trick; the 15-char slice keeps both engines in non-negative
    * territory so signed/unsigned ordering agrees), which makes the
    * whole IVF serve path — assignment, probe selection, exact
    * rescoring — oracle-checkable end to end. [[train]] remains the
    * production quantizer: maximin + Lloyd give better centers, but
    * the centroid means' float summation order is not portable
    * across engines. Center cost/quality tradeoff is irrelevant to
    * the serve-path plan shape, which is identical either way. */
  def trainPortable(vectors: DataFrame, c: Int,
                    embCol: String = "embedding",
                    idCol: String = "vec_id"): Model = {
    val h = expr(s"cast(conv(substring(md5(cast($idCol as string)), " +
      "1, 15), 16, 10) as bigint)")
    val rows = vectors.orderBy(h, col(idCol)).limit(c)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(rows.length == c, s"corpus smaller than c=$c")
    Model(rows)
  }

  /** Attach the inverted-list id to every vector (the column you'd
    * partition the lake table by in production). */
  def assign(vectors: DataFrame, model: Model,
             embCol: String = "embedding"): DataFrame =
    vectors.withColumn("_cluster",
      nearest_centroid(col(embCol), model.centroids))

  /** Persist the inverted lists as a lake table PARTITIONED by
    * `_cluster` — the 100 TB serving shape promised above: each
    * inverted list is a partition directory, so probing `nprobe`
    * clusters compiles to a partition-pruned scan that never opens the
    * other C - nprobe lists. */
  def buildIndex(spark: org.apache.spark.sql.SparkSession,
                 vectors: DataFrame, model: Model, path: String,
                 embCol: String = "embedding"): graft.lake.LakeTable = {
    val assigned = assign(vectors, model, embCol)
    // a continuous appendToIndex loop adds one file per touched
    // cluster dir per batch; without a bound, probing nprobe clusters
    // reads O(batches) files. Tiered auto-compaction keeps each
    // inverted-list dir at O(log rows) files, with every merge
    // touching only that dir's small tier (see
    // LakeTable.autoCompactIfNeeded). The gate is sized to the
    // MODEL-DRIVEN cluster count: a hardcoded 256 with >512 clusters
    // would re-trigger a full rewrite every batch that can never
    // reach its target (one file per cluster dir is the floor).
    val t = graft.lake.LakeTable.create(spark, path, assigned.schema,
      properties =
        graft.lake.LakeTable.autoCompactProps(model.centroids.length),
      partitionBy = Seq("_cluster"))
    t.append(assigned)
    t
  }

  /** Incremental index maintenance: assign a NEW batch to its nearest
    * centroids (broadcast model, row-local) and append it into the
    * existing `_cluster`-partitioned inverted lists — exactly-once per
    * (writerId, batchId), so a crawl loop can grow the ANN index
    * continuously without rebuilds. Centroids stay FROZEN (the standard
    * serving-time IVF contract; retrain offline when drift matters), so
    * previously-served probes remain valid and searchPersisted sees new
    * vectors immediately with the same partition pruning. */
  def appendToIndex(index: graft.lake.LakeTable, batch: DataFrame,
                    model: Model, writerId: String, batchId: Long,
                    embCol: String = "embedding"): Int = {
    val v = index.appendExactlyOnce(assign(batch, model, embCol),
      writerId, batchId)
    // the growing-index writer enforces the table's layout bound (a
    // no-op until the file count crosses the declared threshold)
    index.autoCompactIfNeeded()
    v
  }

  /** GDPR propagation to the SERVING ANN index: remove vectors by id
    * via a merge-on-read EQUALITY delete — O(|keys|) commit, zero
    * inverted-list files rewritten, no scan (partition-pruned serving
    * applies the delete as a key anti-join; the list compaction gate
    * absorbs it physically later). Exactly-once per (writerId,
    * batchId) — a replayed batch must not re-commit at a fresh
    * sequence number and kill re-inserted vectors. */
  def removeFromIndex(index: graft.lake.LakeTable, ids: DataFrame,
                      writerId: String, batchId: Long,
                      idCol: String = "vec_id"): Unit = {
    import org.apache.spark.sql.functions.col
    index.deleteWhereEqualExactlyOnce(
      ids.select(col(idCol)).distinct(), Seq(idCol), writerId, batchId)
    ()
  }

  /** Driver-side probe selection: same cosine scoring as the
    * TopCentroids expression, on the local KB-sized centroid matrix. */
  def probeIds(q: Array[Float], model: Model, nprobe: Int): Seq[Int] = {
    val scores = model.centroids.map { cent =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      val m = math.min(q.length, cent.length)
      while (j < m) {
        dot += q(j) * cent(j); na += q(j).toDouble * q(j); nb += cent(j) * cent(j)
        j += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) -2.0 else dot / den
    }
    scores.zipWithIndex.sortBy(-_._1).take(nprobe).map(_._2).toSeq
  }

  /** Serve one query from the persisted index. Probes are computed
    * driver-side from the local model, producing a static
    * `_cluster IN (...)` predicate the planner prunes partitions with
    * at PLANNING time (visible in the scan's selectedPartitions — no
    * dynamic pruning machinery involved). This is the low-latency
    * serving path; for query BATCHES use `search`, whose broadcast
    * probe join covers many query vectors in one plan. */
  def searchPersisted(index: graft.lake.LakeTable, queryVec: Array[Float],
                      model: Model, k: Int, nprobe: Int,
                      embCol: String = "embedding",
                      idCol: String = "vec_id"): DataFrame = {
    val probes = probeIds(queryVec, model, nprobe)
    index.read()
      .filter(col("_cluster").isin(probes: _*))
      .select(col(idCol),
        cosine_sim(col(embCol), typedlit(queryVec.toSeq)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Batched serving from the PERSISTED index — the missing half of
    * [[searchPersisted]] (which handles one vector) and [[search]]
    * (which re-assigns the corpus instead of reading the lists): score
    * a whole query batch against the stored `_cluster`-partitioned
    * inverted lists, reading ONLY the union of the batch's probed
    * clusters. Each query's probe set rides in a broadcast join, and
    * the union (at most C ints — metadata-scale) becomes a static
    * `_cluster IN (...)` predicate, so partition pruning happens at
    * PLANNING time exactly as in the single-query path; rows of
    * unprobed lists are never read, and each scored row joins only the
    * queries that actually probed its cluster. Returns per-query top-k
    * (queryIdCol, idCol, cos) — ties broken by idCol, identical to
    * [[searchPersisted]]'s ordering, which the spec pins by equality. */
  def searchPersistedBatch(index: graft.lake.LakeTable,
                           queries: DataFrame, model: Model, k: Int,
                           nprobe: Int, embCol: String = "embedding",
                           idCol: String = "vec_id",
                           queryIdCol: String = "query_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint: the probe set is both collected (for the static
    // partition filter) and joined — one evaluation, so a
    // non-deterministic query plan (sample, unordered limit) cannot
    // produce a filter that disagrees with the joined rows
    val probes = queries.select(col(queryIdCol).as("_qid"),
      col(embCol).as("_qv"),
      explode(top_centroids(col(embCol), model.centroids, nprobe))
        .as("_cluster"))
      .localCheckpoint(eager = false)
    // the probed-cluster union is bounded by C (the centroid count),
    // never by query or corpus size — a driver-safe collect
    val probed = probes.select(col("_cluster")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val scored = index.read()
      .filter(col("_cluster").isin(probed: _*))
      .join(broadcast(probes), Seq("_cluster"))
      .select(col("_qid"), col(idCol),
        cosine_sim(col(embCol), col("_qv")).as("cos"))
    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("cos").desc, col(idCol))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("_qid").as(queryIdCol), col(idCol), col("cos"))
  }

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
