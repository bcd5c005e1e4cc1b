package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator row of SURVEY §2; `oracleSql`
  * holds the DuckDB-equivalent SQL (identical output column names —
  * the driver's compare sorts columns by name before hashing). Entries
  * without an oracle (approximate/hash-seeded ops) get rows-only checks.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinAggNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core (SURVEY §2.2) ---
    "q01_agg_pricing" -> (Relational.aggPricing _),
    "q02_filter_project" -> (Relational.filterProject _),
    "q03_join_agg_nation" -> (Relational.joinAggNation _),
    "q04_topk_orders" -> (Relational.topkOrders _),
    "q05_window_rank" -> (Relational.windowRank _),
    "q06_window_running" -> (Relational.windowRunning _),
    "q07_rollup" -> (Relational.rollupQty _),
    "q08_cube" -> (Relational.cubeSegNation _),
    "q09_grouping_sets" -> (Relational.groupingSets _),
    "q10_distinct_agg" -> (Relational.distinctAgg _),
    "q11_intersect" -> (Relational.intersectCustomers _),
    "q12_except" -> (Relational.exceptCustomers _),
    "q13_union_all" -> (Relational.unionAllKeys _),
    "q14_semi_join" -> (Relational.semiJoin _),
    "q15_anti_join" -> (Relational.antiJoin _),
    "q16_scalar_subquery" -> (Relational.scalarSubquery _),
    "q17_json_extract" -> (Relational.jsonExtract _),
    "q66_map_funcs" -> (Relational.mapFuncs _),
    "q18_time_bucket" -> (Relational.timeBucket _),
    "q19_asof_join" -> (Relational.asofJoin _),
    "q20_range_join" -> (Relational.rangeJoin _),
    "q21_string_funcs" -> (Relational.stringFuncs _),
    "q22_conditional_agg" -> (Relational.conditionalAgg _),
    "q23_udaf_geomean" -> (Relational.udafGeomean _),
    // no oracle possible: HLL++ sketch estimates are engine-specific by
    // construction (DuckDB's approx_count_distinct uses a different
    // sketch/hash). Validated in QueriesSmokeSpec ("approx distinct
    // within rsd"): estimates within the configured rsd of the exact
    // distinct counts (q10 is the exact twin).
    "q24_approx_distinct" -> (Relational.approxDistinct _),
    "q25_fuzzy_levenshtein" -> (Relational.fuzzyLevenshtein _),
    "q26_array_funcs" -> (Relational.arrayFuncs _),
    "q27_except_all" -> (Relational.exceptAll _),
    "q28_datetime_funcs" -> (Relational.datetimeFuncs _),
    "q29_math_funcs" -> (Relational.mathFuncs _),
    "q46_window_stats" -> (Relational.windowStats _),
    "q47_sessionize" -> (Relational.sessionize _),
    "q48_percentiles" -> (Relational.percentiles _),
    "q54_pivot" -> (Relational.pivotEvents _),
    "q57_correlated_subquery" -> (Relational.correlatedSubquery _),
    "q59_shipping_priority" -> (Relational.shippingPriority _),
    "q77_local_supplier_volume" -> (Relational.localSupplierVolume _),
    "q101_waiting_suppliers" -> (Relational.waitingSuppliers _),
    "q102_top_customer_orders" -> (Relational.topCustomerOrders _),
    "q103_excess_volume_suppliers" -> (Relational.excessVolumeSuppliers _),
    "q104_order_priority_check" -> (Relational.orderPriorityCheck _),
    "q107_min_cost_supplier" -> (Relational.minCostSupplier _),
    "q108_customer_distribution" -> (Relational.customerDistribution _),
    "q109_small_quantity_lines" -> (Relational.smallQuantityLines _),
    "q110_inactive_rich_customers" ->
      (Relational.inactiveRichCustomers _),
    "q112_volume_shipping" -> (Relational.volumeShipping _),
    "q113_market_share" -> (Relational.marketShare _),
    "q114_product_profit" -> (Relational.productProfit _),
    "q115_top_supplier" -> (Relational.topSupplier _),
    "q116_discounted_revenue" -> (Relational.discountedRevenue _),
    "q118_important_stock" -> (Relational.importantStock _),
    "q119_supplier_part_count" -> (Relational.supplierPartCount _),
    "q89_returned_items" -> (Relational.returnedItemReport _),
    "q93_ship_mode_priority" -> (Relational.shipModePriority _),
    "q94_promo_revenue" -> (Relational.promoRevenue _),
    // TPC-H Q6 (forecasting revenue change): the canonical
    // pushdown-and-scan query — every predicate reaches the parquet
    // reader (PushedFilters on shipdate/discount/quantity), one
    // codegen'd conditional-sum pass, no shuffle beyond the final agg
    "q99_forecast_revenue" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(graft.Banding.sum4(col("l_extendedprice") * col("l_discount"))
          .as("revenue"))
    }),
    "q58_stream_dedup" -> (graft.streaming.StreamingQueries.streamDedup _),
    "q55_unpivot" -> (Relational.unpivotEvents _),
    "q49_stats_agg" -> (Relational.statsAgg _),
    // --- LLM-data operators (dedup / text / similarity) ---
    "q30_dedup_exact" -> ((s, d) => DedupOps.exact(Tables.load(s, d, "documents"))),
    "q31_dedup_norm" -> ((s, d) => DedupOps.normalized(Tables.load(s, d, "documents"))),
    "q32_neardup_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccard(Tables.load(s, d, "documents"), minJaccard = 0.5)),
    // LSH bucketing + exact-Jaccard verification: output equals q32's
    // exact pipeline, so the shared oracle doubles as an LSH recall
    // proof (hash-seeded est-jaccard variant stays in DedupSimilaritySpec)
    "q33_neardup_minhash" -> ((s, d) =>
      DedupOps.minHashLshTrueJaccard(Tables.load(s, d, "documents"),
        k = 64, bands = 16, minJaccard = 0.5)),
    // Oracled since the token hash moved to md5 (DedupOps.md5Token64):
    // DuckDB recomputes the exact 64-bit sketch from the text, so the
    // banded pipeline is graded against a brute-force all-pairs hamming
    // scan in another engine. DedupSimilaritySpec additionally pins
    // banding == brute force inside Spark.
    "q34_simhash_pairs" -> ((s, d) =>
      DedupOps.simHashPairs(Tables.load(s, d, "documents"), maxHamming = 3)),
    // Oracled (q34's md5-sketch reason). The FOURTH
    // incremental-dedup modality: the %3==0 slice's (doc_id, simhash)
    // rows are indexed with band postings; the %2==0 slice probes
    // them and verifies hamming <= 3 against doc_id-pruned sketch
    // fetches. Pigeonhole recall is exact (hamming <= 3 over 4 bands),
    // so the DuckDB oracle is a brute-force cross-slice hamming scan;
    // DedupSimilaritySpec pins the same equality inside Spark.
    "q95_simhash_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
      val dir = java.nio.file.Files.createTempDirectory("graft-shidx")
      val rows = DedupOps.simHashIndexRows(
        docs.filter(col("doc_id") % 3 === 0)).localCheckpoint()
      val index = graft.lake.LakeTable.create(
        s, s"$dir/idx", rows.schema, bucketBy = Some(("doc_id", 8)))
      index.appendExactlyOnce(rows, "q95", 0L)
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        DedupOps.simHashPostingsSchema,
        properties = DedupOps.simHashPostingsProps,
        bucketBy = Some(("pbh", 16)))
      postings.appendExactlyOnce(DedupOps.simHashPostingsRows(rows),
        "q95", 0L)
      DedupOps.simHashAgainstIndex(
        docs.filter(col("doc_id") % 2 === 0), index, maxHamming = 3,
        postings = Some(postings))
    }),
    "q56_neardup_clusters" -> ((s, d) => {
      val pairs = DedupOps.ngramJaccard(
        Tables.load(s, d, "documents"), minJaccard = 0.8)
      DedupOps.nearDupClusters(pairs)
        .groupBy(org.apache.spark.sql.functions.col("cluster_id"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"))
    }),
    // no oracle possible: BPE training is an ITERATIVE argmax loop (each
    // merge depends on all previous rounds) — not expressible as one
    // SQL query. Deterministic by construction (no seeds, lexicographic
    // tie-break); BpeSpec verifies the exact merge sequence against a
    // hand-computed corpus and order-independence under repartitioning.
    "q79_bpe_merges" -> ((s, d) =>
      // maxBatch=4: same learned list as sequential for EVERY corpus —
      // the prefix-stop rule preserves order and the tie guard closes
      // the exact-count-tie corner (BpeSpec pins both) — at ~40% fewer
      // rounds of per-round shuffle + checkpoint fixed cost
      BpeOps.mergeTable(Tables.load(s, d, "documents"), numMerges = 20,
        maxBatch = 4)),
    "q35_text_stats" -> (TextOps.textStats _),
    "q36_token_count" -> (TextOps.tokenStats _),
    "q37_lang_id" -> (TextOps.languageId _),
    "q38_fingerprint" -> (TextOps.fingerprints _),
    "q43_quality_score" -> (TextOps.quality _),
    "q67_top_words" -> ((s, d) => TextOps.topWords(s, d, k = 20)),
    // no oracle possible: rolling (Rabin-Karp) window fingerprints are
    // defined over our base/modulus constants; no other engine computes
    // the same values. Validated in MultimodalSpec ("rolling fingerprint
    // is order-sensitive, md5 fingerprint is not"). The md5 fingerprint
    // twin (q38) IS oracle-checked.
    "q44_rolling_fingerprint" -> (TextOps.rollingFingerprints _),
    "q39_cosine_topk" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
      SimilarityOps.bruteForceTopK(
        e.filter(org.apache.spark.sql.functions.col("vec_id") =!= 0),
        e.filter(org.apache.spark.sql.functions.col("vec_id") === 0), k = 10)
    }),
    // LSH-blocked (bucket-then-verify) near-dup pairs; the oracle
    // recomputes the seed-free axis-sign band predicate + exact cosine
    // literally, so the hash match verifies BOTH the banded candidate
    // join and the verification stage. The old within-label all-pairs
    // join (quadratic in block size) survives as
    // SimilarityOps.embeddingNearDup for bounded blocks only.
    "q40_embedding_neardup" -> ((s, d) =>
      SimilarityOps.embeddingNearDupLsh(
        Tables.load(s, d, "embeddings"), threshold = 0.35)),
    // PQ/ADC top-k: deterministic codebooks (sub-vectors of vec ids
    // 0..15, no seeded k-means) make the codes and the asymmetric
    // distances engine-reproducible, so this ANN axis — compressed
    // representations — is fully oracled, unlike the seeded IVF/LSH
    // entries. The oracle unrolls the same sub-distance arithmetic in
    // the same accumulation order.
    "q121_pq_topk" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
      SimilarityOps.pqTopK(
        e.filter(org.apache.spark.sql.functions.col("vec_id") =!= 0),
        e.filter(org.apache.spark.sql.functions.col("vec_id") === 0),
        k = 10, codebookSource = Some(e))
    }),
    // Perplexity-style quality scoring: a corpus-trained unigram LM
    // scores each document by mean token log-probability (rare-token
    // garbage scores low). avg/log float drift between engines sits
    // far inside the driver's rounding tolerance.
    "q123_unigram_logprob" -> ((s, d) => TextOps.unigramLogprob(s, d)),
    // Bigram-LM quality scoring — q123's next-order sibling
    // (add-one-smoothed P(w2|w1), bigram-start marginal, mean ln P
    // per doc); per-bigram ln banded to DECIMAL(18,9) so the score
    // is order-independent and the 1-ulp libm/JVM ln divergence
    // cannot reach the driver hash.
    "q143_bigram_logprob" -> ((s, d) => TextOps.bigramLogprob(s, d)),
    // Distinct-n diversity audit per source slice: the ratio of
    // distinct to total word n-grams (n=1..3) — templated slices
    // score low, the pre-weighting signal a mixture audit wants.
    // Integer counts + exact division: hash-graded.
    "q150_ngram_diversity" -> ((s, d) => TextOps.ngramDiversity(s, d)),
    // Sparse lexical retrieval: tf-idf cosine top-k for doc 0 — the
    // lexical twin of the dense retrieval queries; broadcast query
    // terms, word-keyed join, one doc-keyed sum, TakeOrdered
    "q124_tfidf_retrieval" -> ((s, d) => TextOps.tfidfRetrieve(s, d)),
    // BM25: the production-standard lexical scorer (saturated tf +
    // doc-length normalization + BM25+ idf), same join shape as q124
    "q125_bm25_retrieval" -> ((s, d) => TextOps.bm25Retrieve(s, d)),
    // Persisted-PQ serving: the corpus is encoded ONCE into a lake
    // code table (~16x smaller than the vectors) and the query is
    // answered from codes alone — same deterministic codebooks as
    // q121, so the result (and oracle) are identical to q121's;
    // what's graded is that the compressed serving path loses nothing.
    "q126_pq_persisted" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val dir = java.nio.file.Files.createTempDirectory("graft-pq")
      val (table, cbs) = SimilarityOps.pqPersist(e, s, s"$dir/codes")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
        .map(_.toDouble).toArray
      SimilarityOps.pqSearchPersisted(table, cbs, q, k = 10,
        excludeId = Some(0L))
    }),
    // BATCHED persisted-PQ serving: four query vectors answered from
    // ONE scan of the code table — all four LUTs ride as a single
    // plan constant, every row's four distances come from one kernel
    // pass, and per-query top-k is a windowed rank (the
    // IvfIndex.searchPersistedBatch shape). Fully oracled like
    // q121/q126: deterministic codebooks, ADC arithmetic unrolled in
    // SQL in the same accumulation order.
    "q128_pq_batch" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val dir = java.nio.file.Files.createTempDirectory("graft-pqb")
      val (table, cbs) = SimilarityOps.pqPersist(e, s, s"$dir/codes")
      val qs = e.filter(col("vec_id") < 4)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray).toSeq
      SimilarityOps.pqSearchPersistedBatch(table, cbs, qs, k = 5)
    }),
    // Multi-query BM25 over a shared corpus statistics pass: 3 query
    // documents' term vectors broadcast against ONE tf scan, per-query
    // top-k via window — the lexical twin of q128's batched PQ
    // serving. Scores sum as DECIMAL so the driver hash binds
    // regardless of either engine's row-visit order (q105 pattern).
    "q131_bm25_batch" -> ((s, d) =>
      TextOps.bm25RetrieveBatch(s, d, queryDocs = Seq(0L, 1L, 2L),
        k = 5)),
    // The fully-ORACLED IVF serve path: portable-hash centers (first
    // 8 vectors by md5(vec_id) order, no Lloyd rounds — every step
    // ANSI-SQL-reproducible), corpus assigned by the same cosine
    // argmax kernel production uses, index persisted partitioned by
    // _cluster, then a 2-probe partition-pruned top-10 serve for
    // query vector 0. Shrinks the permanent no-oracle set to the
    // genuinely seeded families (LSH hyperplanes, Lloyd centroids,
    // BPE): q45/q60/q91's plan shape, hash-graded end to end.
    "q132_ann_ivf_portable" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.trainPortable(e, c = 8)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfp")
      val index = IvfIndex.buildIndex(
        s, e.filter(col("vec_id") =!= 0), model, dir.toString)
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      IvfIndex.searchPersisted(index, qv, model, k = 10, nprobe = 2)
    }),
    // The fully-ORACLED LSH serve path: portable md5-Rademacher
    // hyperplanes (a public constant matrix any engine rederives),
    // same sign-bucket kernel / multi-probe / exact-cosine rescore as
    // q41. With q121 (PQ) and q132 (IVF) this gives every ANN axis an
    // end-to-end hash-graded representative; only genuinely seeded
    // constructions (Gaussian planes, Lloyd centroids, BPE) remain
    // spec-pinned-only.
    "q133_ann_lsh_portable" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      SimilarityOps.lshTopKPortable(
        e.filter(col("vec_id") =!= 0),
        e.filter(col("vec_id") === 0), k = 10)
    }),
    // WIDE-signature LSH serve (r10): 20-bit portable signatures with
    // radius-6 multi-probe — the geometry RecallScale's width
    // analysis prescribes as indexes grow (bits ~ log2(N)), servable
    // only because hammingBallMasks generates the 60,460-mask probe
    // ball directly where the old formulation exploded 2^20 rows per
    // query. Oracle states the same candidate set as a Hamming-ball
    // membership test — no enumeration on either engine.
    "q154_ann_lsh_wide" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      SimilarityOps.lshTopKPortable(
        e.filter(col("vec_id") =!= 0),
        e.filter(col("vec_id") === 0), k = 10,
        bits = 20, probeHamming = 6)
    }),
    // IVF-PQ composed — the production billion-scale ANN deployment
    // (FAISS IndexIVFPQ): portable-hash coarse centers prune WHICH
    // inverted lists are read (planning-time partition pruning, the
    // q132 axis) and deterministic PQ codebooks compress WHAT they
    // store (the q121 axis) — the serve plan reads only the 2 probed
    // partition dirs of the ~16x-compressed code table and never
    // touches a raw vector. Both constituent constructions are
    // already hash-graded, so their composition is too: the oracle
    // replays center selection, cosine-argmax assignment, probe
    // top-2, PQ encoding, and the ADC chain in the kernels' exact
    // accumulation order.
    "q137_ivfpq_persisted" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.trainPortable(e, c = 8)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq")
      val (table, cbs) = SimilarityOps.ivfPqPersist(
        e.filter(col("vec_id") =!= 0), s, s"$dir/codes", model,
        codebookSource = Some(e))
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      SimilarityOps.ivfPqSearchPersisted(table, cbs, model, qv,
        k = 10, nprobe = 2)
    }),
    // Two-stage IVF-PQ with exact re-ranking (the FAISS refine
    // pattern): ADC over the 2 probed compressed lists produces a
    // 40-id shortlist, whose RAW vectors alone are fetched by
    // id-bucketed probe and re-scored with the exact cosine for the
    // final top-10 — exact-metric quality at compressed-scan cost.
    // Both stages' arithmetic is already oracled (q137's ADC chains,
    // q132's cosine chains), so the composition is too.
    "q149_ivfpq_refined" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.trainPortable(e, c = 8)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqr")
      val (codes, cbs) = SimilarityOps.ivfPqPersist(
        e.filter(col("vec_id") =!= 0), s, s"$dir/codes", model,
        codebookSource = Some(e))
      val vecs = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      val vt = graft.lake.LakeTable.create(s, s"$dir/vecs", vecs.schema,
        properties =
          graft.lake.LakeTable.autoCompactProps(16, Some("vec_id")),
        bucketBy = Some(("vec_id", 16)))
      vt.append(vecs)
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      SimilarityOps.ivfPqSearchRefined(codes, cbs, model, vt, qv,
        k = 10, kPrime = 40, nprobe = 2)
    }),
    // q149's SAME-metric twin (r10 advisor fix graded): the refine
    // re-ranks the ADC shortlist by exact squared L2 — the metric the
    // shortlist itself ranks by — via the codegen'd l2_dist kernel,
    // so the FAISS IndexRefineFlat convergence contract holds for
    // unnormalized corpora too. Oracle shares q149's shortlist CTEs;
    // the re-rank chain is the kernel's ascending (x-q)^2 order.
    "q153_ivfpq_refined_l2" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.trainPortable(e, c = 8)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfpql2")
      val (codes, cbs) = SimilarityOps.ivfPqPersist(
        e.filter(col("vec_id") =!= 0), s, s"$dir/codes", model,
        codebookSource = Some(e))
      val vecs = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      val vt = graft.lake.LakeTable.create(s, s"$dir/vecs", vecs.schema,
        properties =
          graft.lake.LakeTable.autoCompactProps(16, Some("vec_id")),
        bucketBy = Some(("vec_id", 16)))
      vt.append(vecs)
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      SimilarityOps.ivfPqSearchRefined(codes, cbs, model, vt, qv,
        k = 10, kPrime = 40, nprobe = 2, metric = "l2")
    }),
    // The vector index maintained CONTINUOUSLY by a commit-log MV —
    // the q136 loop on the dense axis: two source commits drive two
    // exactly-once appendToIndex batches (frozen portable centers,
    // checkpoint-resumed restart between them), after which the
    // partition-pruned serve answers exactly what a from-scratch
    // buildIndex over the full corpus would. Oracle shared with q132:
    // the MV's only job is to converge to the same inverted lists.
    "q138_vector_index_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.trainPortable(e, c = 8)
      val vecs = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      val dir = java.nio.file.Files.createTempDirectory("graft-vecmv")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", vecs.schema)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx",
        IvfIndex.assign(vecs, model).schema,
        properties = graft.lake.LakeTable.autoCompactProps(model.c),
        partitionBy = Seq("_cluster"))
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(vecs.filter(col("vec_id") % 2 === 0))
      mv.startVectorIndexFromLake("vec", src, index, model)
        .awaitTermination()
      src.append(vecs.filter(col("vec_id") % 2 =!= 0))
      mv.startVectorIndexFromLake("vec", src, index, model)
        .awaitTermination()
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      IvfIndex.searchPersisted(index, qv, model, k = 10, nprobe = 2)
    }),
    // Hybrid lexical+dense retrieval fused by reciprocal-rank fusion
    // (Cormack et al. 2009, the production RAG-stack standard): the
    // banded-BM25 arm and the exact-cosine arm each produce a
    // deterministic top-20 ranking, and rrf = sum 1/(60+rank) over
    // the arms — rank arithmetic on integers, so the fused score is
    // bit-portable wherever the arm rankings are (BM25 decimal
    // banding + the cosine kernel's fixed chains make them so).
    "q139_hybrid_rrf" -> ((s, d) =>
      TextOps.hybridRrfRetrieve(s, d, queryDoc = 0L, k = 10)),
    // Hard-negative mining for contrastive training (DPR/ANCE): per
    // query, the top-10 most-similar corpus vectors BELOW the 0.95
    // near-dup band — informative negatives that are not unlabeled
    // positives. One corpus scan, broadcast 4-query batch, band
    // filter before the shuffle, per-query windowed top-k; exact
    // cosine chains make it fully oracled.
    "q141_hard_negatives" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val qs = e.filter(col("vec_id") < 4)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
      SimilarityOps.hardNegatives(e, qs, k = 10, dupThreshold = 0.95)
    }),
    // BATCHED IVF-PQ serving — the composed index answering a query
    // batch from ONE partition-pruned scan of the compressed code
    // table: the probe-set UNION is the static planning-time filter,
    // a broadcast (query, cluster) pair list keeps each row scoring
    // only against the queries that probed its list, all four LUTs
    // ride as one plan constant (PqAdcBatch), per-query top-5 via
    // window. Oracled like q137 with per-query probe sets.
    "q140_ivfpq_batch" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.trainPortable(e, c = 8)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqb")
      val (table, cbs) = SimilarityOps.ivfPqPersist(
        e, s, s"$dir/codes", model)
      val qs = e.filter(col("vec_id") < 4)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
      SimilarityOps.ivfPqSearchPersistedBatch(table, cbs, model, qs,
        k = 5, nprobe = 2)
    }),
    // BM25 served from a PERSISTED lexical index — the production
    // deployment shape (the q126/q60 pattern for the lexical axis):
    // word-bucketed postings with denormalized doc length, serving
    // reads only the term-probed bucket dirs and joins a broadcast
    // |terms|-row idf table; df/N/avgdl derive from stored rows, so
    // index growth is pure exactly-once appends. Identical math to
    // q125 -> fully oracled (decimal-banded like q131).
    "q135_bm25_persisted" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-lexidx")
      val (pt, dt) = TextOps.buildLexicalIndex(
        s, Tables.load(s, d, "documents"), dir.toString)
      TextOps.bm25FromIndex(pt, dt, queryDoc = 0L, k = 10)
    }),
    // The lexical index maintained CONTINUOUSLY by a commit-log MV:
    // two source commits drive two exactly-once append batches (the
    // second restart replays from checkpoint — the q85 evolution
    // pattern), after which serving answers exactly what a
    // from-scratch build over the full corpus would. Oracle shared
    // with q135: the MV's only job is to converge to the same index.
    "q136_lexical_index_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft-lexmv")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", docs.schema)
      val empty = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), docs.schema)
      val (pt, dt) = TextOps.buildLexicalIndex(s, empty, s"$dir/idx")
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(docs.filter(col("doc_id") % 2 === 0))
      mv.startLexicalIndexFromLake("lex", src, pt, dt).awaitTermination()
      src.append(docs.filter(col("doc_id") % 2 =!= 0))
      mv.startLexicalIndexFromLake("lex", src, pt, dt).awaitTermination()
      TextOps.bm25FromIndex(pt, dt, queryDoc = 0L, k = 10)
    }),
    // CCNet-style perplexity bucketing: unigram-LM scores (decimal-
    // banded, so identical docs tie exactly) + equal-depth head/
    // middle/tail bands from a range-exchange distributed rank —
    // never a single-reducer global window. The oracle reproduces
    // score AND band per document, so the distributed prefix-sum
    // rank machinery itself is hash-graded against a window ntile
    // equivalent (explicit floor(rank*3/N) formula both engines
    // compute identically).
    "q134_quality_buckets" -> ((s, d) =>
      TextOps.qualityBuckets(s, d, nBuckets = 3)),
    // DSIR-style data selection: raw documents ranked by hashed-
    // unigram importance weights against a target slice (doc_id%7==0
    // stands in for the curated target corpus); deterministic
    // (md5-bucket features + exact top-k), so the oracle recomputes
    // the full weight pipeline — distributions, smoothing, log-ratio,
    // per-doc sum — in SQL.
    "q129_dsir_selection" -> ((s, d) =>
      CorpusOps.dsirSelect(Tables.load(s, d, "documents"),
        isTarget = org.apache.spark.sql.functions.col("doc_id") % 7 === 0,
        k = 100)),
    // Exact repeated-substring spans (the ExactSubstr dedup recipe):
    // 8-token windows occurring more than once anywhere in the corpus,
    // merged per document into maximal spans. All-integer output —
    // bit-deterministic; the oracle replays the identical window-hash,
    // duplicate-filter, and interval-union arithmetic.
    "q130_repeated_spans" -> ((s, d) =>
      DedupOps.repeatedSpans(Tables.load(s, d, "documents"), n = 8)),
    // SemDeDup-style semantic dedup: deterministic nearest-seed
    // clustering + within-cluster earlier-mate cosine drop; the oracle
    // recomputes the full pipeline (assignment, pairs, anti-join) in
    // SQL, so the hash check grades clustering AND dedup end to end.
    "q120_semantic_dedup" -> ((s, d) =>
      SimilarityOps.semanticDedup(
        Tables.load(s, d, "embeddings"), k = 8, threshold = 0.35)),
    // The SCALED variant: k is DERIVED from corpus size (k =
    // max(8, ceil(N/16))), so expected cluster size stays ~16 rows
    // and total pairwise work is ~N*16 — the linear regime a 100 TB
    // run needs (q120's fixed k=8 exercises the small-k shape; this
    // exercises the bound). At sf0.1 that is 125 clusters (~4 per
    // core at local[32]); the oracle recomputes k from count(*) in
    // SQL, so the derivation itself is hash-graded.
    "q127_semantic_dedup_scaled" -> ((s, d) =>
      SimilarityOps.semanticDedup(
        Tables.load(s, d, "embeddings"), threshold = 0.35,
        targetClusterRows = 16L)),
    // no oracle possible: LSH buckets come from seeded random-projection
    // hyperplanes — the candidate set is defined by our seed, not by the
    // data alone. Validated in DedupSimilaritySpec: recall bound vs the
    // exact brute-force top-k (q39, which IS oracle-checked).
    "q41_ann_lsh" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
      SimilarityOps.lshTopK(
        e.filter(org.apache.spark.sql.functions.col("vec_id") =!= 0),
        e.filter(org.apache.spark.sql.functions.col("vec_id") === 0), k = 10)
    }),
    "q42_multimodal_features" -> ((s, d) =>
      MultimodalOps.documentFeatures(s, Tables.load(s, d, "documents"))),
    // no oracle possible: IVF results depend on k-means centroids from
    // seeded Lloyd's iterations — cluster assignments aren't reproducible
    // across engines. Validated in DedupSimilaritySpec: recall bound vs
    // exact brute-force top-k (q39, oracle-checked).
    "q45_ann_ivf" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.train(e, c = 16, iters = 2)
      IvfIndex.search(
        e.filter(org.apache.spark.sql.functions.col("vec_id") =!= 0),
        e.filter(org.apache.spark.sql.functions.col("vec_id") === 0),
        model, k = 10, nprobe = 4)
    }),
    // no oracle possible (same seeded-centroid reason as q45). The
    // persisted-index serving path: inverted lists written as _cluster
    // partitions of a lake table, probes compiled to a static partition
    // IN-filter — DedupSimilaritySpec proves the scan touches exactly
    // nprobe partition dirs and results equal the q45 probe-join path.
    "q60_ann_ivf_persisted" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.train(e, c = 16, iters = 2)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-q60")
      val index = IvfIndex.buildIndex(
        s, e.filter(col("vec_id") =!= 0), model, dir.toString)
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      IvfIndex.searchPersisted(index, qv, model, k = 10, nprobe = 4)
    }),
    // no oracle possible (same seeded-centroid reason as q45/q60). The
    // BATCHED persisted-index serving path: a whole query batch scored
    // against the _cluster-partitioned inverted lists in ONE plan —
    // the probe-set union becomes a static partition IN-filter, each
    // query joins only its own probed clusters, and a per-query window
    // takes top-k. DedupSimilaritySpec proves per-query equality with
    // searchPersisted and union-level partition pruning.
    "q91_ann_ivf_batch" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.train(e, c = 16, iters = 2)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-q91")
      val index = IvfIndex.buildIndex(
        s, e.filter(col("vec_id") % 25 =!= 0), model, dir.toString)
      val queries = e.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))
      IvfIndex.searchPersistedBatch(index, queries, model,
        k = 10, nprobe = 4)
    }),
    // --- corpus hygiene (training-data pipeline ops) ---
    // benchmark set := docs with doc_id % 97 == 0 (a deterministic
    // fixture slice standing in for a held-out eval set); corpus = rest
    "q61_decontaminate" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
      CorpusOps.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0))
    }),
    // FUZZY decontamination — q61's production complement: corpus
    // docs whose n-gram Jaccard against ANY benchmark doc reaches
    // 0.5 are dropped (the PaLM/Llama fuzzy rule); survivors
    // returned. Candidates from the broadcast inverted-index join
    // (cannot miss: any qualifying pair shares a shingle), verified
    // with the exact Jaccard — fully oracled with guaranteed recall,
    // unlike a banded-LSH generator.
    "q142_neardup_decontaminate" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
      CorpusOps.decontaminateNearDup(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        minJaccard = 0.5)
    }),
    // Temperature-flattened language mixture (mC4/XLM-R, alpha=0.7):
    // the fixture's lang distribution is naturally skewed (en ~2.7x
    // de), and share^0.7 upweights the low-resource tail; the
    // deterministic exact-count form makes the whole sample a pure
    // function of the corpus (pow banded to DECIMAL(28,6), md5-order
    // selection) — fully oracled.
    "q144_temperature_mixture" -> ((s, d) =>
      CorpusOps.temperatureMixture(Tables.load(s, d, "documents"),
        alpha = 0.7)),
    // End-to-end RAG retrieval: q82's chunking + a deterministic
    // hash-encoder stub + cosine top-10 for doc 0's first chunk —
    // chunk boundaries, chunk identity, embedding plumbing, and
    // ranking bind under one oracle hash. Components are
    // integer-valued md5 derivatives, so float storage and the
    // oracle's double chains agree exactly.
    "q145_rag_retrieve" -> ((s, d) => TextOps.ragRetrieve(s, d)),
    // Metadata-FILTERED vector search (the vector-store "filtered
    // ANN" surface): candidates restricted to lang='en' documents by
    // a semi-join BEFORE scoring, then exact cosine top-10. The
    // modality tables share ids (doc_id == vec_id), so the filter is
    // a relational predicate over the metadata table.
    "q146_filtered_ann" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val allowed = Tables.load(s, d, "documents")
        .filter(col("lang") === "en" && col("doc_id") =!= 0)
        .select(col("doc_id"))
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      SimilarityOps.filteredCosineTopK(e, allowed, qv, k = 10)
    }),
    // Result-diversified RAG retrieval: per-document best chunk only
    // (max cosine, ties low), then top-10 documents — one repetitive
    // document cannot monopolize the retrieved context.
    "q147_rag_diverse" -> ((s, d) => TextOps.ragRetrieveDiverse(s, d)),
    // BATCHED hybrid RRF — the fusion surface answering a 3-query
    // batch: one shared BM25 statistics pass, one dense corpus scan
    // scoring all queries from a broadcast list, per-query windowed
    // ranks, per-query fusion. Completes the batch-serving symmetry
    // (BM25 q131, PQ q128/q140, IVF q91, fusion here).
    "q148_hybrid_rrf_batch" -> ((s, d) =>
      TextOps.hybridRrfRetrieveBatch(s, d, queryDocs = Seq(0L, 1L, 2L),
        k = 10)),
    // the fixture corpus carries no PII, so the query enriches each doc
    // with deterministically derived email/phone/IP strings (pure
    // function of doc_id — reproduced literally in the oracle SQL);
    // the operator itself is corpus-agnostic
    "q62_pii_redaction" -> ((s, d) =>
      CorpusOps.redactPii(Tables.load(s, d, "documents").selectExpr(
        "doc_id",
        "concat(text, ' contact user', CAST(doc_id AS STRING), " +
          "'@example.com or 555-', " +
          "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', " +
          "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), " +
          "' from 10.0.', CAST(doc_id % 256 AS STRING), '.7 end') " +
          "AS text"))),
    "q63_repetition_signals" -> ((s, d) =>
      CorpusOps.repetitionSignals(Tables.load(s, d, "documents"))),
    "q64_deterministic_split" -> ((s, d) =>
      CorpusOps.splitSummary(Tables.load(s, d, "documents"))),
    "q65_domain_mixture" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, count, lit}
      CorpusOps.mixCorpus(Tables.load(s, d, "documents"),
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0))
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    }),
    // budget-constrained selection: per source, the best docs by quality
    // until 800 tokens are spent (histogram cutoff + sliver window — the
    // oracle recomputes the same rule as one naive window, so the hash
    // match proves the two-phase plan equals the per-domain total sort)
    "q69_token_budget" -> ((s, d) =>
      CorpusOps.tokenBudget(Tables.load(s, d, "documents"),
        budgetTokens = 800L)),
    // fixed-size per-domain sample: 10 docs per source by content hash
    // (selection-tree plan; oracle = the naive row_number window)
    "q70_domain_cap" -> ((s, d) =>
      CorpusOps.domainCap(Tables.load(s, d, "documents"), k = 10)),
    // deterministic epoch shuffle: seeded global positions via one
    // range exchange + distributed prefix-sum (oracle = the naive
    // single-reducer row_number over the same md5 key)
    "q111_epoch_shuffle" -> ((s, d) =>
      CorpusOps.epochShuffle(Tables.load(s, d, "documents"), seed = 42L)),
    // sequence packing: contiguous 512-token bins per source via the
    // distributed prefix-sum (oracle = the naive per-source window, so
    // the hash match proves the two-pass cumsum is exact)
    "q81_sequence_packing" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      CorpusOps.packSequences(Tables.load(s, d, "documents"),
          budgetTokens = 512L)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    }),
    // overlapping character chunking (size 200, overlap 50)
    "q82_doc_chunks" -> ((s, d) =>
      CorpusOps.chunkDocs(Tables.load(s, d, "documents"),
        size = 200, overlap = 50)),
    // incremental NEAR-dup against a persisted signature index: the
    // %3==0 slice is indexed (shingle sets + MinHash sigs committed to
    // a lake table), the %2==0 slice arrives as the new batch; banded
    // LSH candidates verify exactly, and the oracle computes the full
    // cross-slice exact Jaccard — hash match = recall proof across the
    // index boundary
    "q84_neardup_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
      val dir = java.nio.file.Files.createTempDirectory("graft-sigidx")
      val rows = DedupOps.signatureIndexRows(
        docs.filter(col("doc_id") % 3 === 0)).localCheckpoint()
      val index = graft.lake.LakeTable.create(
        s, s"$dir/idx", rows.schema, bucketBy = Some(("doc_id", 8)))
      index.appendExactlyOnce(rows, "q84", 0L)
      // band postings committed alongside: the probe path reads these
      // pbh-bucketed rows instead of band-scanning the index per batch
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        DedupOps.bandPostingsSchema,
        properties = DedupOps.bandPostingsProps(),
        bucketBy = Some(("pbh", 16)))
      postings.appendExactlyOnce(DedupOps.bandPostingsRows(rows),
        "q84", 0L)
      DedupOps.nearDupAgainstIndex(
        docs.filter(col("doc_id") % 2 === 0), index, minJaccard = 0.5,
        postings = Some(postings))
    }),
    // incrementally-MAINTAINED aggregate MV (the RisingWave half of the
    // reference): events arrive in 3 micro-batches (6 files, paced 2
    // per trigger); each update-mode batch merges ONLY the changed
    // (event_type, uid_bucket) aggregates into the lake table by key.
    // The final table state hash-matching the plain batch GROUP BY
    // proves incremental maintenance converges exactly.
    "q90_incremental_agg_mv" ->
      (graft.streaming.StreamingQueries.aggregateMv _),
    // incremental EMBEDDING near-dup vs a persisted vector index — the
    // third incremental-dedup modality (exact fp = q71, MinHash text
    // sigs = q84, embeddings = q88). The %3==0 vectors are indexed in a
    // bucketed lake table; the %2==0 slice arrives as the new batch;
    // seed-free SRP band candidates verify with exact cosine, and the
    // oracle recomputes band predicate + cosine literally across the
    // slice boundary — hash match = recall proof over the index.
    "q88_embedding_neardup_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.load(s, d, "embeddings").select("vec_id", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("graft-vecidx")
      val hist = emb.filter(col("vec_id") % 3 === 0)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx", emb.schema,
        bucketBy = Some(("vec_id", 8)))
      index.appendExactlyOnce(hist, "q88", 0L)
      // SRP band postings: the probe path's O(batch) candidate source
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        SimilarityOps.srpPostingsSchema,
        properties = SimilarityOps.srpPostingsProps(),
        bucketBy = Some(("pbh", 16)))
      postings.appendExactlyOnce(SimilarityOps.srpPostingsRows(hist),
        "q88", 0L)
      SimilarityOps.embeddingNearDupAgainstIndex(
        emb.filter(col("vec_id") % 2 === 0), index, threshold = 0.35,
        postings = Some(postings))
    }),
    // the continuous EMBEDDING curation MV — the vector twin of q87,
    // completing the loop story for the third incremental-dedup
    // modality: batch 1 admits the %3==0 vectors (within-batch cosine
    // clusters collapse to min vec_id), batch 2 (the full table) must
    // drop every vector that band-collides AND cosine-matches an
    // accepted batch-1 vector at 0.35 — across a stop/restart, with
    // postings-probed candidate generation. The oracle recomputes the
    // whole two-batch evolution (band predicate + exact cosine +
    // recursive-CTE clusters) in SQL.
    "q92_embedding_curation_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.load(s, d, "embeddings").select("vec_id", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("graft-cur-emb")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", emb.schema)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx", emb.schema,
        bucketBy = Some(("vec_id", 8)))
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        SimilarityOps.srpPostingsSchema,
        properties = SimilarityOps.srpPostingsProps(),
        bucketBy = Some(("pbh", 16)))
      val out = graft.lake.LakeTable.create(s, s"$dir/out", emb.schema)
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(emb.filter(col("vec_id") % 3 === 0))
      mv.startEmbeddingCurationFromLake("cur", src, index, out,
        threshold = 0.35, postings = Some(postings)).awaitTermination()
      src.append(emb)
      mv.startEmbeddingCurationFromLake("cur", src, index, out,
        threshold = 0.35, postings = Some(postings)).awaitTermination()
      out.read().select("vec_id")
    }),
    // bucketed point lookup through the whole layout stack: documents
    // land in a hash-bucketed lake table (pmod(xxhash64(doc_id), 16)
    // hive partitions), and probe() serves an id lookup via bucket-dir
    // pruning + manifest IN pruning + parquet pushdown — the O(keys)
    // crawl-index read no matter how big history grows. Oracle = plain
    // IN query over the same rows, so the hash match proves the
    // layout-routed read loses/duplicates nothing.
    "q86_lake_point_lookup" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory("graft-lookup")
      val t = graft.lake.LakeTable.create(s, s"$dir/t", docs.schema,
        bucketBy = Some(("doc_id", 16)))
      t.append(docs)
      t.probe("doc_id", Seq(7L, 123L, 321L, 444L))
        .select("doc_id", "source", "n_chars")
    }),
    // the FULL curation MV: exact dedup AND near-dup filtering against
    // one unified persisted index (fp + shingle sets + MinHash sigs),
    // driven by the commit log across a stop/restart. Batch 1 admits
    // the %3==0 slice; batch 2 (the full table) must drop exact copies
    // via the fp frontier AND any doc whose jaccard vs an accepted
    // batch-1 doc reaches 0.5 via the banded-LSH + exact-verify path.
    // The oracle recomputes the whole two-batch evolution in SQL, so a
    // hash match proves LSH recall + frontier semantics end to end.
    "q87_curation_neardup_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft-cur-nd")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", docs.schema)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx",
        graft.streaming.MVManager.curationIndexSchema,
        bucketBy = Some(("fp", 8)))
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        DedupOps.bandPostingsSchema,
        properties = DedupOps.bandPostingsProps(),
        bucketBy = Some(("pbh", 16)))
      val out = graft.lake.LakeTable.create(s, s"$dir/out", docs.schema)
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(docs.filter(col("doc_id") % 3 === 0))
      mv.startCurationFromLake("cur", src, index, out,
        nearDupMinJaccard = Some(0.5), postings = Some(postings))
        .awaitTermination()
      src.append(docs)
      mv.startCurationFromLake("cur", src, index, out,
        nearDupMinJaccard = Some(0.5), postings = Some(postings))
        .awaitTermination()
      out.read().select("doc_id")
    }),
    // the continuous-curation MV loop end to end: a lake-backed source
    // receives two commits (the %3==0 slice, then the full table); a
    // checkpointed streaming query watches the commit log, dedupes each
    // micro-batch against the persisted fingerprint index with zero
    // index-side shuffles, appends accepted docs to `out`, and advances
    // the frontier — STOPPED and RESTARTED from the same checkpoint
    // between the commits, so the oracle hash-match proves exactly-once
    // curation across a restart (batch-2 copies of batch-1 docs must
    // not be re-admitted).
    "q85_curation_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft-curation")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", docs.schema)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx",
        StructType(Seq(StructField("fp", StringType),
          StructField("doc_id", LongType))),
        bucketBy = Some(("fp", 8)))
      val out = graft.lake.LakeTable.create(s, s"$dir/out", docs.schema)
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(docs.filter(col("doc_id") % 3 === 0))
      mv.startCurationFromLake("curate", src, index, out).awaitTermination()
      src.append(docs) // includes every batch-1 doc again
      mv.startCurationFromLake("curate", src, index, out).awaitTermination()
      out.read().select("doc_id")
    }),
    // incremental dedup against a persisted fingerprint index: docs with
    // doc_id%3==0 are the already-accepted history (committed to a lake
    // index), docs with doc_id%2==0 arrive as the new batch; the %6==0
    // overlap must dedupe out. The fresh rows advance the index via an
    // exactly-once commit before being returned.
    "q71_incremental_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val docs = Tables.load(s, d, "documents")
      val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx")
      val index = graft.lake.LakeTable.create(s, dir.toString, StructType(Seq(
        StructField("fp", StringType), StructField("doc_id", LongType))),
        bucketBy = Some(("fp", 8)))
      index.append(docs.filter(col("doc_id") % 3 === 0).select(
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
        col("doc_id")))
      // plan pins the index snapshot BEFORE the frontier advances, so
      // re-evaluating `fresh` after the commit still yields this batch
      val fresh = DedupOps.freshAgainstIndex(
        docs.filter(col("doc_id") % 2 === 0), index)
      index.appendExactlyOnce(fresh, "q71", 1L)
      fresh
    }),
    // Arrow IPC sink -> graft-arrow DSv2 source -> aggregate: the
    // reference's native interchange format round-tripped end-to-end
    // (its ingress is Arrow RecordBatches; batch_writer.go:200-222 is
    // the file form). Oracle aggregates the original events table, so a
    // hash match proves the sink+source preserve every row and type.
    "q72_arrow_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val dir = java.nio.file.Files.createTempDirectory("graft-arrow-q72")
      graft.sources.ArrowSink.write(ev, dir.toString)
      s.read.format("graft-arrow").load(dir.toString)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("max_ts"))
    }),
    // --- streaming + lake commit layer (SURVEY §7 steps 3-5) ---
    "q50_stream_tumbling" -> (graft.streaming.StreamingQueries.tumblingMv _),
    "q51_stream_to_lake" -> (graft.streaming.StreamingQueries.streamToLake _),
    "q52_lake_roundtrip" -> (graft.streaming.StreamingQueries.lakeRoundtrip _),
    "q53_lake_partitioned" ->
      (graft.streaming.StreamingQueries.lakePartitioned _),
    "q68_stream_hygiene" ->
      (graft.streaming.StreamingQueries.streamHygiene _),
    // stream-STATIC join: the streaming side enriched against a lake
    // dim pinned at plan time (snapshot isolation for the static
    // side); the oracle is the plain batch join + aggregate
    "q122_stream_static_enrich" ->
      (graft.streaming.StreamingQueries.streamStaticEnrich _),
    // stream-stream interval join (clicks within the hour before each
    // purchase); inner-join emission is eager, so AvailableNow drains
    // the full pair set and the oracle is a plain batch self-join
    "q73_stream_interval_join" ->
      (graft.streaming.StreamingQueries.streamIntervalJoin _),
    // stream-stream LEFT OUTER interval join (q171): q73's missing
    // half — click-less purchases answer with n_clicks = 0, which
    // only the watermark can prove; the two-sentinel device makes the
    // AvailableNow drain deterministic (see streamOuterIntervalJoin's
    // scaladoc). Oracle: the plain batch LEFT JOIN rollup.
    "q171_stream_outer_join" ->
      (graft.streaming.StreamingQueries.streamOuterIntervalJoin _),
    // the streaming JOIN MV persisted into the lake — RisingWave's
    // third MV class (append = q51, aggregate = q90, join = this):
    // q73's interval-join matches land in a lake table through
    // exactly-once per-batch commits, and the oracle (the same batch
    // self-join) hash-matches the TABLE's read-back state
    "q97_stream_join_mv" ->
      (graft.streaming.StreamingQueries.joinMv _),
    // native session_window streaming sessionization (q47's stateful
    // twin; oracle replays the strict gap-overlap rule batch-side)
    "q74_stream_sessions" ->
      (graft.streaming.StreamingQueries.streamSessions _),
    // custom state machine (flatMapGroupsWithState conversion funnel);
    // oracle replays the transition rule with a lag window
    "q78_stream_state_funnel" ->
      (graft.streaming.StreamingQueries.streamStateFunnel _),
    // Arrow interchange loop: stream OUT as exactly-once batch dirs,
    // stream back IN through the graft-arrow micro-batch source
    "q83_arrow_stream_loop" ->
      (graft.streaming.StreamingQueries.arrowStreamLoop _),
    // copy-on-write row-level ops on the lake: DELETE (drop views) then
    // MERGE (adjust some purchases in place + backfill-insert new rows
    // under shifted ids), then read the final state back. The oracle
    // replays delete + merge semantics in plain SQL over the original
    // events table, so the hash match grades file-pruned rewrites,
    // NULL-safe delete, and key-replacement semantics end-to-end.
    // MERGE-ON-READ row-level deletes (Iceberg-v2 position deletes,
    // q75's copy-on-write twin): two overlapping positional deletes
    // commit O(matched positions) each — ZERO data files rewritten —
    // and a late append proves new rows are untouched by earlier
    // delete files. The read serves THROUGH the live delete files
    // (the (file,pos) anti-join path), which is exactly the state a
    // 100 TB table sits in between GDPR sweeps and its next
    // compaction. Oracle: the surviving rows recomputed in SQL.
    "q151_mor_delete" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-mor")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.repartition(8)) // several files so covers/pruning are real
      t.deleteWherePositional(col("event_type") === "view")
      t.deleteWherePositional(col("event_id") % 3 === 0)
      val late = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 11 === 0)
        .withColumn("event_id", col("event_id") + 2000000000L)
        .withColumn("event_type", lit("late"))
      t.append(late)
      t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // HIDDEN PARTITIONING (Iceberg transform specs): the table is
    // declared `days(ts)` — the writer derives the day column and
    // lays out day directories; the reader prunes with a RAW
    // timestamp range, never naming the layout. The graded read
    // serves a 3-day window from day-pruned dirs (bounds derived
    // from min(ts), day-aligned so both engines' literals are
    // micros-exact). Oracle: the same window recomputed in SQL.
    "q152_hidden_partition" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts").cast("timestamp").as("ts"))
      val dir = java.nio.file.Files.createTempDirectory("graft-hp")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema,
        partitionBy = Seq("days(ts)"))
      t.append(ev.repartition(8))
      val loUs = ev.agg(min(unix_micros(col("ts")))).head().getLong(0)
      val dayUs = 86400000000L
      val aMs = (Math.floorDiv(loUs, dayUs) + 2) * 86400L * 1000
      val bMs = (Math.floorDiv(loUs, dayUs) + 5) * 86400L * 1000
      t.readWhere(
          col("ts") >= lit(new java.sql.Timestamp(aMs)) &&
            col("ts") < lit(new java.sql.Timestamp(bMs)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // WRITE-AUDIT-PUBLISH branch (q156's movable sibling): curation
    // output STAGES on a named branch — main consumers keep serving
    // the pinned snapshot through two staged commits (an append AND a
    // row-level delete) — the audit runs over readBranch, and publish
    // fast-forwards main in ONE atomic step. The graded result holds
    // all three phases (pinned main, staged view, published+late), so
    // the oracle hash proves staging isolation end-to-end. At 100 TB
    // this is how a curation batch ships: no consumer ever reads a
    // half-audited corpus.
    // DELETE-AWARE LEXICAL INDEX MV (q162): the q136 commit-log loop
    // upgraded to CDC — a GDPR equality delete on the source
    // PROPAGATES to the serving BM25 index (the insert-only loop can
    // grow an index but structurally cannot shrink one). The delete
    // step consumes the row-level changelog (a key semi-join, no diff
    // shuffle) and lands as equality deletes on postings + docstats:
    // O(|keys|), zero index files rewritten, and df/N/avgdl reflect
    // the removal instantly because they derive from stored rows.
    // Oracle: the q135/q136 BM25 math over the SURVIVOR corpus.
    "q162_lexical_cdc_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft-lexcdc")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", docs.schema)
      val empty = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), docs.schema)
      val (pt, dt) = TextOps.buildLexicalIndex(s, empty, s"$dir/idx")
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(docs.filter(col("doc_id") % 2 === 0))
      mv.startLexicalIndexCdc("lexcdc", src, pt, dt).awaitTermination()
      src.append(docs.filter(col("doc_id") % 2 =!= 0))
      src.deleteWhereEqual(docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id")), Seq("doc_id"))
      mv.startLexicalIndexCdc("lexcdc", src, pt, dt).awaitTermination()
      TextOps.bm25FromIndex(pt, dt, queryDoc = 0L, k = 10)
    }),
    // DELETE-AWARE VECTOR INDEX MV (q163): q162's dense-axis twin —
    // forgotten vectors leave the serving IVF inverted lists via an
    // equality delete on vec_id, and the partition-pruned serve
    // (searchPersisted) answers over exactly the survivors. Centers
    // stay frozen (trained pre-delete — the serving-time IVF
    // contract), so the oracle is q132's pipeline with the forgotten
    // ids filtered from the candidate set.
    "q163_vector_cdc_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = Tables.load(s, d, "embeddings")
      val model = IvfIndex.trainPortable(e, c = 8)
      val vecs = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      val dir = java.nio.file.Files.createTempDirectory("graft-veccdc")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", vecs.schema)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx",
        IvfIndex.assign(vecs, model).schema,
        properties = graft.lake.LakeTable.autoCompactProps(model.c),
        partitionBy = Seq("_cluster"))
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(vecs.filter(col("vec_id") % 2 === 0))
      mv.startVectorIndexCdc("veccdc", src, index, model)
        .awaitTermination()
      src.append(vecs.filter(col("vec_id") % 2 =!= 0))
      src.deleteWhereEqual(vecs.filter(col("vec_id") % 7 === 3)
        .select(col("vec_id")), Seq("vec_id"))
      mv.startVectorIndexCdc("veccdc", src, index, model)
        .awaitTermination()
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      IvfIndex.searchPersisted(index, qv, model, k = 10, nprobe = 2)
    }),
    // DELETE-AWARE CURATION MV (q164): the q162/q163 CDC pattern on
    // the curation loop itself — the full GDPR story for the curated
    // corpus. Batch 1 curates the even documents. Then the source
    // takes a forget (eq delete of even doc_id%11==4), the forgotten
    // CONTENT is legitimately RE-SUBMITTED under new ids (+1e6), and
    // the odd documents arrive as normal growth. The CDC loop must
    // (a) stop serving forgotten docs from the curated output,
    // (b) free their fingerprints in the dedup index so the
    // resubmission is re-admitted — under the insert-only loop it
    // would be rejected as a duplicate of a document that no longer
    // exists — and (c) keep rejecting resubmitted content whose
    // fingerprint still has a SURVIVING owner. Oracle replays the
    // batch algebra: min-id per fp among evens, minus forgotten;
    // resubmissions accepted iff their fp lost its owner; odds
    // accepted against both.
    "q164_curation_cdc_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft-curcdc")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", docs.schema)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx",
        StructType(Seq(StructField("fp", StringType),
          StructField("doc_id", LongType))),
        bucketBy = Some(("fp", 8)))
      val out = graft.lake.LakeTable.create(s, s"$dir/out", docs.schema)
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(docs.filter(col("doc_id") % 2 === 0)) // v1
      mv.startCurationCdc("curcdc", src, index, out).awaitTermination()
      src.deleteWhereEqual( // v2: forget
        docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 11 === 4)
          .select(col("doc_id")), Seq("doc_id"))
      src.append(docs // v3: legitimate resubmission, same text, new ids
        .filter(col("doc_id") % 2 === 0 && col("doc_id") % 11 === 4)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      src.append(docs.filter(col("doc_id") % 2 =!= 0)) // v4: growth
      mv.startCurationCdc("curcdc", src, index, out).awaitTermination()
      out.read().select("doc_id")
    }),
    // PERCEPTUAL-HASH NEAR-DUP on the BINARY axis (q165): media
    // payloads frame-sampled into 64-byte chunks, each chunk
    // md5-fingerprinted, the distinct frame hashes bit-voted into a
    // 64-bit perceptual SimHash; pairs within hamming <= 3 via the
    // 4x16-bit banded join (exact pigeonhole recall). The oracle
    // recomputes the full sketch from the same bytes — so this grades
    // frame chunking, the portable frame hash, the bit-vote, the
    // banded candidate join, and the hamming verify, end to end on
    // binary columns.
    "q165_phash_neardup" -> ((s, d) => {
      val media = MultimodalOps.withBinaryPayload(
        Tables.load(s, d, "documents"))
      DedupOps.sketchPairs(
        MultimodalOps.perceptualSketch(media), maxHamming = 3)
    }),
    // INCREMENTAL perceptual near-dup vs a PERSISTED sketch index
    // (q166): the q95 shape on the binary axis — the %3==0 media
    // slice's sketches are indexed with simhash-layout band postings;
    // the %2==0 slice probes them (O(batch) candidate generation,
    // zero index-side shuffles) and verifies hamming <= 3 against
    // doc_id-pruned sketch fetches. The FIFTH incremental-dedup
    // modality (exact fp, MinHash text, embeddings, text SimHash,
    // binary perceptual hash) through the same banded machinery.
    "q166_phash_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val media = MultimodalOps.withBinaryPayload(
        Tables.load(s, d, "documents"))
      val dir = java.nio.file.Files.createTempDirectory("graft-phidx")
      val rows = MultimodalOps.perceptualSketch(
        media.filter(col("doc_id") % 3 === 0)).localCheckpoint()
      val index = graft.lake.LakeTable.create(
        s, s"$dir/idx", rows.schema, bucketBy = Some(("doc_id", 8)))
      index.appendExactlyOnce(rows, "q166", 0L)
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        DedupOps.simHashPostingsSchema,
        properties = DedupOps.simHashPostingsProps,
        bucketBy = Some(("pbh", 16)))
      postings.appendExactlyOnce(DedupOps.simHashPostingsRows(rows),
        "q166", 0L)
      DedupOps.sketchesAgainstIndex(
        MultimodalOps.perceptualSketch(
          media.filter(col("doc_id") % 2 === 0)),
        index, maxHamming = 3, postings = Some(postings))
    }),
    // IMAGE-TEXT PAIR CURATION (q167): the multimodal training-pair
    // filter — media features (decoded dims from the q42 stub) joined
    // with the caption's quality score (q43's formula); a pair
    // survives iff the caption clears the quality bar AND the media
    // aspect ratio is within 4:1 (the CLIP-style data-curation gate).
    // All comparisons are per-row and integer/deterministic-double,
    // so the oracle replays the whole gate exactly.
    "q167_multimodal_pair_curation" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit}
      val docs = Tables.load(s, d, "documents")
      MultimodalOps.documentFeatures(s, docs)
        .join(TextOps.quality(s, d), "doc_id")
        .filter(col("quality") >= lit(0.8) &&
          col("width") <= lit(4L) * col("height") &&
          col("height") <= lit(4L) * col("width"))
        .select("doc_id", "n_bytes", "width", "height", "quality")
    }),
    // PERCEPTUAL CURATION MV (q168): the continuous curation loop on
    // the BINARY axis — a lake-backed media source takes two commits
    // (the %3==0 slice, then the full table re-appended); the
    // checkpointed loop sketches each version once, collapses
    // within-batch near-dup clusters to their min id, drops survivors
    // within hamming 3 of the persisted sketch index (postings-probed
    // O(batch)), appends accepted media, and advances the frontier —
    // STOPPED and RESTARTED between the commits, so the hash match
    // proves exactly-once perceptual curation across a restart (there
    // is no separate exact frontier: a re-appended payload sketches
    // identically and band-collides with its indexed original).
    "q168_perceptual_curation_mv" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val media = MultimodalOps.withBinaryPayload(
        Tables.load(s, d, "documents"))
      val dir = java.nio.file.Files.createTempDirectory("graft-pcur")
      val src = graft.lake.LakeTable.create(s, s"$dir/src", media.schema)
      val index = graft.lake.LakeTable.create(s, s"$dir/idx",
        MultimodalOps.perceptualSketch(media).schema,
        bucketBy = Some(("doc_id", 8)))
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        DedupOps.simHashPostingsSchema,
        properties = DedupOps.simHashPostingsProps,
        bucketBy = Some(("pbh", 16)))
      val out = graft.lake.LakeTable.create(s, s"$dir/out", media.schema)
      val mv = new graft.streaming.MVManager(s, s"$dir/ckpt")
      src.append(media.filter(col("doc_id") % 3 === 0))
      mv.startPerceptualCurationFromLake("pcur", src, index, out,
        postings = Some(postings)).awaitTermination()
      src.append(media)
      mv.startPerceptualCurationFromLake("pcur", src, index, out,
        postings = Some(postings)).awaitTermination()
      out.read().select("doc_id")
    }),
    // FRAME-SET JACCARD NEAR-DUP (q169): the heavier-edit media dedup
    // the PhashOperating curve prescribes — distinct frame-hash SETS
    // compared by exact Jaccard through the shared-element inverted
    // index (DedupOps.setJaccardPairs, the q32 exact pipeline factored
    // set-agnostic): recall is exact BY CONSTRUCTION, which matters on
    // this axis — frame sets are far smaller than shingle sets, and
    // the MinHash-banded candidate join measurably drops borderline
    // tiny-set pairs at jaccard ~0.5 that the text fixtures never
    // exhibit. The banded/incremental variant is q170.
    "q169_frame_jaccard_neardup" -> ((s, d) =>
      DedupOps.setJaccardPairs(
        MultimodalOps.frameSignatureRows(MultimodalOps.withBinaryPayload(
          Tables.load(s, d, "documents")))
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("shs")),
        minJaccard = 0.5)),
    // INCREMENTAL frame-set Jaccard vs PERSISTED element postings
    // (q170): the incremental shape on the binary axis, with EXACT
    // recall — frame sets are small (~20-60 elements), so borderline
    // pairs at jaccard ~0.5 are real and the MinHash banded candidate
    // join measurably drops them (found building this query: 3 missed
    // pairs at sf0.1); instead the %3==0 slice's frame hashes are
    // indexed as an eh-bucketed inverted index carrying the owner's
    // set size, and the %2==0 slice probes it on ITS OWN frame hashes
    // (O(batch) keys) — (inter, jaccard) resolve entirely from the
    // probed posting rows, no index fetch, no probabilistic stage.
    "q170_frame_jaccard_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val media = MultimodalOps.withBinaryPayload(
        Tables.load(s, d, "documents"))
      val dir = java.nio.file.Files.createTempDirectory("graft-fjidx")
      // prune sig BEFORE the checkpoint: the element-postings path
      // never uses the MinHash column, and localCheckpoint would
      // otherwise materialize it
      val rows = MultimodalOps.frameSignatureRows(
          media.filter(col("doc_id") % 3 === 0))
        .select(col("doc_id"), col("shs")).localCheckpoint()
      val postings = graft.lake.LakeTable.create(s, s"$dir/postings",
        DedupOps.elementPostingsSchema,
        properties = DedupOps.elementPostingsProps,
        bucketBy = Some(("eh", 16)))
      postings.appendExactlyOnce(DedupOps.elementPostingsRows(rows),
        "q170", 0L)
      DedupOps.setJaccardAgainstIndex(
        MultimodalOps.frameSignatureRows(
          media.filter(col("doc_id") % 2 === 0)),
        postings, minJaccard = 0.5)
    }),
    // METADATA TABLES (q160): the lake introspects ITSELF — per-
    // partition row totals come from the manifest stats the pruner
    // trusts (no data file opened: the whole answer is metadata), and
    // per-snapshot operations are DERIVED by diffing each retained
    // snapshot against its predecessor. The oracle recomputes both
    // from raw data in SQL, so this grades (a) manifest row stats
    // stay exact through partitioned appends AND a copy-on-write
    // delete's survivor rewrite, (b) the operation classifier tells
    // append/delete apart by file-set + row-total evidence alone.
    "q160_meta_tables" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-meta")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema,
        partitionBy = Seq("event_type"))
      t.append(ev.repartition(4)) // v1
      t.append(ev.filter(col("event_type") =!= "view")
        .withColumn("event_id", col("event_id") + 1000000000L)) // v2
      t.deleteWhere(col("event_type") === "error" &&
        col("event_id") < 1000000000L) // v3: CoW rewrite
      val parts = t.meta("partitions")
        .select(lit("partition").as("kind"), col("partition").as("key"),
          col("row_count"))
      val snaps = t.meta("snapshots")
        .select(lit("snapshot").as("kind"),
          concat(lit("v"), col("version").cast("string"), lit(":"),
            col("operation")).as("key"),
          col("rows").as("row_count"))
      parts.unionByName(snaps)
    }),
    // ROW-LEVEL CHANGELOG (q161): net `_change_type`-tagged diff
    // between two snapshots of a table that took a GDPR equality
    // delete, a post-delete late append (out of the delete's sequence
    // scope), and a merge-on-read upsert — the feed a downstream
    // index/replica needs to mirror deletes, which the insert-only
    // incremental feed (changesBetween, q71/q84) structurally cannot
    // carry. Computed over CHANGED FILES only: at 100 TB the diff
    // touches the delta, never the table. Oracle: the four commits'
    // net row algebra recomputed in SQL.
    "q161_changelog" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-cdc")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.repartition(4)) // v1: baseline
      t.deleteWhereEqual(ev.filter(col("user_id") % 53 === 7)
        .select(col("user_id")).distinct(), Seq("user_id")) // v2: forget
      t.append(ev
        .filter(col("event_type") === "purchase" && col("event_id") % 9 === 0)
        .withColumn("event_id", col("event_id") + 2000000000L)
        .withColumn("event_type", lit("late"))) // v3: late, incl. forgotten
      t.upsertMor(ev
        .filter(col("event_type") === "click" && col("event_id") % 4 === 0 &&
          col("user_id") % 53 =!= 7)
        .withColumn("event_type", lit("adjusted"))
        .withColumn("value", col("value") * 2), Seq("event_id")) // v4
      t.readChangelog(1, 4)
        .groupBy(col("_change_type"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    "q159_wap_branch" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-wap")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.filter(col("event_type") =!= "purchase").repartition(4))
      t.createBranch("curation")
      t.append(ev.filter(col("event_type") === "purchase"))
      t.deleteWhere(col("event_type") === "view")
      def agg(df: org.apache.spark.sql.DataFrame, phase: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            graft.Banding.sum2(col("value")).as("sum_value"))
          .withColumn("phase", lit(phase))
      val pinned = agg(t.read(), "main_pinned")
      val staged = agg(t.readBranch("curation"), "staged")
      t.publishBranch("curation")
      val late = ev
        .filter(col("event_type") === "error" && col("event_id") % 7 === 0)
        .withColumn("event_id", col("event_id") + 4000000000L)
        .withColumn("event_type", lit("late"))
      t.append(late)
      pinned.unionByName(staged).unionByName(agg(t.read(), "published"))
    }),
    // PARTITION-SPEC EVOLUTION (q152's mid-life sibling): the table
    // starts on days(ts), grows, and is re-declared hours(ts) WITHOUT
    // rewriting history — batch 1 keeps its day layout, batch 2 lands
    // in hour dirs, and the graded window read prunes EACH epoch by
    // the spec it was written under (per-file manifest stats make the
    // other epoch's check vacuous, never wrong). At 100 TB this is how
    // a table re-partitions as it grows 100x: one metadata commit, no
    // rewrite. Oracle: the same window recomputed in SQL — evolution
    // provably changes layout, never results.
    "q158_spec_evolution" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts").cast("timestamp").as("ts"))
      val dir = java.nio.file.Files.createTempDirectory("graft-se")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema,
        partitionBy = Seq("days(ts)"))
      t.append(ev.filter(col("event_id") % 2 === 0).repartition(4))
      t.alterPartitionSpec(Seq("hours(ts)"))
      // the fine-spec epoch clusters its write BY THE PARTITION KEY —
      // the 100 TB idiom for high-cardinality specs (each hour's rows
      // land in one task, one file per dir instead of tasks x dirs
      // tiny files; 720 hour dirs here, 2880 files without this)
      t.append(ev.filter(col("event_id") % 2 === 1)
        .repartition(8, date_trunc("hour", col("ts"))))
      val loUs = ev.agg(min(unix_micros(col("ts")))).head().getLong(0)
      val dayUs = 86400000000L
      val aMs = (Math.floorDiv(loUs, dayUs) + 2) * 86400L * 1000
      val bMs = (Math.floorDiv(loUs, dayUs) + 5) * 86400L * 1000
      t.readWhere(
          col("ts") >= lit(new java.sql.Timestamp(aMs)) &&
            col("ts") < lit(new java.sql.Timestamp(bMs)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // MERGE-ON-READ EQUALITY DELETE (q151's key-scoped twin): "forget
    // these users" commits the KEY VALUES — O(keys), no provenance
    // scan, zero data files rewritten — and Iceberg-v2 SEQUENCE
    // semantics scope it to rows committed before it: the late batch
    // appended AFTER the delete keeps its rows even for deleted
    // users. Oracle: pre-delete rows of surviving users + the whole
    // late batch.
    "q155_eq_delete" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-eqdel")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.repartition(8))
      val forget = ev.filter(col("user_id") % 97 === 3)
        .select(col("user_id")).distinct()
      t.deleteWhereEqual(forget, Seq("user_id"))
      val late = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 13 === 0)
        .withColumn("event_id", col("event_id") + 3000000000L)
        .withColumn("event_type", lit("late"))
      t.append(late) // includes rows of forgotten users — above the seq
      t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // MERGE-ON-READ UPSERT (q75's O(source)-commit twin): each merge
    // is ONE commit carrying both the source rows and an
    // equality-delete on their keys at the same sequence number — no
    // provenance scan, zero data files rewritten. Two layered merges
    // (the second overlaps the first, so last-writer-wins crosses
    // delete generations) plus inserts in the same commit. Oracle:
    // the two merges replayed as anti-join-then-union in SQL.
    "q157_mor_upsert" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-morup")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.repartition(8))
      val adjust = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 5 === 0)
        .withColumn("value", col("value") * 2)
        .withColumn("event_type", lit("adjusted"))
      t.upsertMor(adjust, Seq("event_id"))
      val second = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 10 === 0)
        .withColumn("value", col("value") * 5)
        .withColumn("event_type", lit("readjusted"))
        .unionByName(ev
          .filter(col("event_type") === "purchase" && col("event_id") % 7 === 0)
          .withColumn("event_id", col("event_id") + 1000000000L)
          .withColumn("event_type", lit("backfill")))
      t.upsertMor(second, Seq("event_id"))
      t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // SNAPSHOT TAGS (q117's durable-name sibling): the exact corpus a
    // training run consumed, pinned under a NAME that survives
    // retention — the table moves on (two more appends, compaction,
    // expireSnapshots(1) destroys all untagged history), and readTag
    // still serves the tagged snapshot byte-exactly. Oracle: the
    // first batch recomputed in SQL.
    "q156_snapshot_tag" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
      val dir = java.nio.file.Files.createTempDirectory("graft-tag")
      val t = graft.lake.LakeTable.create(s, s"$dir/li", li.schema)
      t.append(li.filter(col("l_orderkey") % 3 === 0).repartition(4))
      t.createTag("train-v1")
      t.append(li.filter(col("l_orderkey") % 3 === 1))
      t.append(li.filter(col("l_orderkey") % 3 === 2))
      t.compact(2)
      t.expireSnapshots(keepLast = 1)
      t.readTag("train-v1").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("l_quantity")).as("sum_qty"),
          graft.Banding.sum2(col("l_extendedprice")).as("sum_price"))
    }),
    "q75_lake_row_ops" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-rowops")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.repartition(8)) // several files so pruning is real
      t.deleteWhere(col("event_type") === "view")
      val adjustments = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 5 === 0)
        .withColumn("value", col("value") * 2)
        .withColumn("event_type", lit("adjusted"))
      val backfill = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 7 === 0)
        .withColumn("event_id", col("event_id") + 1000000000L)
        .withColumn("event_type", lit("backfill"))
      t.upsert(adjustments.unionByName(backfill), Seq("event_id"))
      t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // snapshot ROLLBACK through the whole commit stack: a bad commit
    // (the "view" events, standing in for a poisoned batch) is undone
    // by rolling back to the good snapshot — a NEW commit restoring
    // the old file set, history intact — and the table keeps moving
    // (the purchase batch lands on top). The oracle recomputes the
    // surviving state in SQL, so the hash match proves the restored
    // file set is exactly the good snapshot's.
    // z-order layout on the graded surface (q76 grades the sorted
    // twin): events land in many unclustered files, compactZOrder
    // re-clusters them on the Morton interleave of (user_id,
    // event_id), and a two-dimensional readWhere serves from the
    // manifest-pruned layout. The oracle is the plain filtered
    // aggregate — pruning provably changes nothing.
    "q100_zorder_pruned_read" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.repartition(16)) // unclustered: wide ranges everywhere
      t.compactZOrder(numFiles = 8, cols = Seq("user_id", "event_id"))
      t.readWhere(col("user_id") >= 10 && col("user_id") <= 19 &&
          col("event_id") % 1000 < 500)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // storage-co-located fact-fact join: orders and lineitem live as
    // lake tables bucketed on the JOIN KEY with Spark's own bucket
    // hash, so the manifest-served scans surface a real BucketSpec
    // and the sort-merge join runs with ZERO exchange on both sides
    // (LakeBucketedScanSpec pins the plan; broadcast is disabled on a
    // child session so the co-located path is what actually runs).
    // At 100 TB this is the difference between shuffling both fact
    // tables on every join and never shuffling them at all. The
    // oracle is the plain SQL join — co-location provably changes
    // the schedule, never the result.
    "q105_bucketed_colocated_join" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val orders = Tables.load(s2, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val li = Tables.load(s2, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"))
      val dir = java.nio.file.Files.createTempDirectory("graft-spj")
      val to = graft.lake.LakeTable.create(s2, s"$dir/orders",
        orders.schema, bucketBy = Some(("o_orderkey", 16)))
      val tl = graft.lake.LakeTable.create(s2, s"$dir/lineitem",
        li.schema, bucketBy = Some(("l_orderkey", 16)))
      to.append(orders)
      tl.append(li)
      // Revenue is summed as DECIMAL(18,4): the per-row double product
      // is IEEE-deterministic across engines, the decimal cast rounds
      // it deterministically, and decimal addition is exact and
      // order-independent — so the exchange-free single-stage sum over
      // bucketed files produces the same bits as DuckDB's oracle no
      // matter what order either engine visits the rows in. (Plain
      // double summation differed by ~1e-15 relative and tripped the
      // driver's exact hash; same banding pattern as q24.)
      tl.read().join(to.read(), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(18,4)"))
            .cast("double").as("revenue"))
    }),
    // bucket-key aggregation served by the storage partitioning: the
    // per-order rollup (TPC-H Q18's inner block) over a lineitem lake
    // table bucketed on l_orderkey — the groupBy reuses the on-disk
    // HashPartitioning, so the whole aggregate is map-side only.
    "q106_bucketed_local_agg" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val s2 = s.newSession()
      s2.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val li = Tables.load(s2, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val dir = java.nio.file.Files.createTempDirectory("graft-spj-agg")
      val tl = graft.lake.LakeTable.create(s2, s"$dir/lineitem",
        li.schema, bucketBy = Some(("l_orderkey", 16)))
      tl.append(li)
      tl.read().groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    }),
    // skew-handled join as a graded query: the events fact (user_id is
    // Zipf-hot in the fixture) salted x8 against a per-user dimension
    // built from customers — every hot key's rows scatter across 8
    // reducers instead of serializing one. The oracle is the PLAIN
    // join aggregate, so the hash match proves salting changes the
    // schedule, never the result.
    "q98_skew_salted_join" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), col("value"))
      val dim = Tables.load(s, d, "customer")
        .select(pmod(col("c_custkey"), lit(50L)).as("u_id"),
          col("c_mktsegment"))
        .groupBy(col("u_id"))
        .agg(min(col("c_mktsegment")).as("segment"))
      SkewJoin.saltedInnerJoin(ev, dim, "user_id", "u_id", factor = 8)
        .groupBy(col("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // snapshot-isolated time travel: three committed batches, a
    // CURRENT read and an AS-OF read of the middle snapshot in ONE
    // result — the historical read must see exactly the first two
    // batches (planned from that version's manifest, zero listing)
    // while the current read sees all three
    "q117_lake_time_travel" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-asof")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.filter(col("event_type") === "click"))
      t.append(ev.filter(col("event_type") === "view"))
      val mid = t.currentVersion
      t.append(ev.filter(col("event_type") === "purchase"))
      val asOf = t.readVersion(mid).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
        .withColumn("snapshot", lit("as_of"))
      val now = t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
        .withColumn("snapshot", lit("current"))
      asOf.unionByName(now)
    }),
    // the PURE-SQL catalog surface (round 12): DDL + DML + query all
    // through spark.sql against the DSv2 GraftCatalog — CTAS (q172),
    // VERSION AS OF time travel steered by the snapshots metadata
    // table (q173), and hidden partitioning whose derived columns the
    // SQL user never sees (q174)
    "q172_sql_catalog_agg" -> (graft.lake.SqlQueries.catalogAgg _),
    "q173_sql_time_travel" -> (graft.lake.SqlQueries.sqlTimeTravel _),
    "q174_sql_hidden_partitioning" ->
      (graft.lake.SqlQueries.sqlHiddenPartitioning _),
    // DELETE FROM via DSv2 SupportsDelete -> merge-on-read position
    // deletes: the GDPR forget drivable from pure SQL (q175)
    "q175_sql_delete" -> (graft.lake.SqlQueries.sqlDelete _),
    "q176_sql_merge" -> (graft.lake.SqlQueries.sqlMerge _),
    "q177_sql_update" -> (graft.lake.SqlQueries.sqlUpdate _),
    "q178_sql_stream_table" -> (graft.lake.SqlQueries.sqlStreamTable _),
    "q179_sql_stream_to_table" ->
      (graft.lake.SqlQueries.sqlStreamToTable _),
    "q180_sql_dynamic_overwrite" ->
      (graft.lake.SqlQueries.sqlDynamicOverwrite _),
    "q181_sql_call_procedures" ->
      (graft.lake.SqlQueries.sqlCallProcedures _),
    "q182_sql_static_overwrite" ->
      (graft.lake.SqlQueries.sqlStaticOverwrite _),
    "q183_sql_minhash_dedup" ->
      (graft.lake.SqlQueries.sqlMinHashDedup _),
    "q184_sql_cosine_topk" ->
      (graft.lake.SqlQueries.sqlCosineTopK _),
    "q185_sql_spec_evolution" ->
      (graft.lake.SqlQueries.sqlSpecEvolution _),
    // streaming row-level changelog (readStream.table("...changes")):
    // a cross-engine consumer mirrors merge-on-read DML exactly (q186)
    "q186_sql_changelog_stream" ->
      (graft.lake.SqlQueries.sqlChangelogStream _),
    // the q186 loop as a first-class operator: MVManager
    // .startTableMirror, exactly-once per source version (q187)
    "q187_table_mirror_mv" ->
      (graft.lake.SqlQueries.sqlTableMirrorMv _),
    // the SQL-only batch change feed: table_changes(...) TVF over the
    // full DML algebra, grading the four-type CDF schema (q188)
    "q188_sql_table_changes" ->
      (graft.lake.SqlQueries.sqlTableChanges _),
    // the mirror loop forced through the distributed over-bound delta
    // path (maxMorRowsPerBatch=1 — the bulk-purge shape) (q189)
    "q189_mirror_distributed_delta" ->
      (graft.lake.SqlQueries.sqlMirrorDistributedDelta _),
    "q96_lake_rollback" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-rollback")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev.filter(col("event_type") === "click"))
      val good = t.currentVersion
      t.append(ev.filter(col("event_type") === "view")) // the bad batch
      t.rollbackTo(good)
      t.append(ev.filter(col("event_type") === "purchase"))
      t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"))
    }),
    // the end-to-end curation pipeline, composed from the graded
    // pieces: inject exact duplicates (every 50th doc re-appears under
    // a shifted id) + the q62 deterministic PII enrichment, then
    // redact -> quality-filter on clean text -> exact-dedup (min
    // doc_id survives; duplicates collapse because redaction strips
    // the only id-dependent bytes) -> content-keyed split -> audit per
    // (source, split). One oracle grades the whole composition.
    "q80_curation_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val raw = Tables.load(s, d, "documents")
      val dups = raw.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("source", lit("dupsrc"))
      val docs = raw.unionByName(dups).withColumn("text", expr(
        "concat(text, ' contact user', CAST(doc_id AS STRING), " +
          "'@example.com or 555-', " +
          "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-', " +
          "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), " +
          "' from 10.0.', CAST(doc_id % 256 AS STRING), '.7 end')"))
      val clean = CorpusOps.redactPii(docs)
        .select(col("doc_id"), col("clean_text"))
      val scored = docs.select(col("doc_id"), col("source"))
        .join(clean, Seq("doc_id"))
        .withColumn("q",
          graft.functions.TextFunctions.qualityScore("clean_text"))
      val deduped = scored.filter(col("q") >= 0.6)
        .groupBy(col("clean_text"))
        .agg(min(col("doc_id")).as("doc_id"),
          expr("min_by(source, doc_id)").as("source"))
      CorpusOps.withSplit(deduped, textCol = "clean_text")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.functions.TextFunctions.tokenCount(col("clean_text")))
            .as("sum_tokens"))
    }),
    // manifest-level stats pruning: sort-compact the lake table on
    // user_id so per-file ranges are narrow, then readWhere drops the
    // out-of-range files from the plan entirely (driver-side metadata
    // decision); the oracle is the plain filtered aggregate, so the
    // hash match proves pruning never changes results
    "q76_lake_pruned_read" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = java.nio.file.Files.createTempDirectory("graft-pruned")
      val t = graft.lake.LakeTable.create(s, s"$dir/events", ev.schema)
      t.append(ev)
      t.compactSorted(8, Seq("user_id"))
      t.readWhere(col("user_id") >= 3L && col("user_id") <= 9L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Banding.sum2(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),
  )

  /** Exact n-gram Jaccard near-dup pairs at >= 0.5 — shared by q32
    * (exact inverted-index pipeline) and q33 (LSH candidates + exact
    * verification): both must produce this answer. */
  private val trueJaccardOracle: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
       sh AS (SELECT DISTINCT doc_id,
              w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
              FROM words, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
       cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                 FROM sh a JOIN sh b ON a.shingle = b.shingle
                   AND a.doc_id < b.doc_id GROUP BY 1, 2)
       SELECT d1, d2, inter,
              inter::DOUBLE / (ca.n + cb.n - inter) AS jaccard
       FROM pairs JOIN cnt ca ON ca.doc_id = d1
       JOIN cnt cb ON cb.doc_id = d2
       WHERE inter::DOUBLE / (ca.n + cb.n - inter) >= 0.5"""

  // ---- shared SQL fragment builders for the generated float-exact
  // oracles. These strings pin the kernels' accumulation chains
  // bit-for-bit; ONE definition of each keeps the graded paths from
  // diverging when a chain is ever touched. ----
  private def sqlChain(terms: Seq[String]): String =
    terms.tail.foldLeft(terms.head)((acc, t) => s"($acc + $t)")
  /** ascending-index left-associative dot chain (CosineSimilarity /
    * CentroidBase order) */
  private def sqlDot(a: String, b: String, dims: Int = 64): String =
    sqlChain((1 to dims).map(i => s"$a[$i]*$b[$i]"))
  /** the cosine kernel: den = sqrt(na)*sqrt(nb), -2 zero-norm sentinel */
  private def sqlCos(d: String, na: String, nb: String): String =
    s"CASE WHEN sqrt($na)*sqrt($nb) = 0 THEN -2.0" +
      s" ELSE $d/(sqrt($na)*sqrt($nb)) END"
  /** (a[o]-b[o])^2 summed over the 8 dims of subspace j — PqMath
    * .sqDist's ascending order */
  private def sqlSubDist(a: String, b: String, j: Int): String =
    (1 to 8).map { i =>
      val o = j * 8 + i
      s"($a[$o]-$b[$o])*($a[$o]-$b[$o])"
    }.mkString("(", " + ", ")")
  private val pqDistCols = (0 until 8)
    .map(j => s"${sqlSubDist("x.v", "c.v", j)} AS d$j").mkString(", ")
  private val pqCaseArms =
    (0 until 8).map(j => s"WHEN $j THEN d$j").mkString(" ")
  private val pqPivotCols = (0 until 8)
    .map(j => s"max(CASE WHEN j = $j THEN dist END) AS s$j")
    .mkString(", ")
  private val pqChainSum =
    (1 until 8).foldLeft("s0")((acc, j) => s"($acc + s$j)")

  /** q121's oracle, generated: the per-subspace squared-L2 is unrolled
    * as a left-associative `+` chain over ascending indices — the
    * exact accumulation order of PqMath.sqDist — so the doubles agree
    * bit-for-bit modulo the driver's float rounding. Encoding argmin
    * ties break to the lower code id (row_number ORDER BY dist, code =
    * the kernel's strict-less scan). */
  private val pqTopKOracle: String = {
    val distCols = pqDistCols
    val caseArms = pqCaseArms
    // The final ADC distance must accumulate in the same order as
    // PqAdc (ascending j, left-associative +). A bare sum() over a
    // GROUP BY leaves the order to the engine, which is the same
    // summation-order ULP class that tripped q105's exact hash — so
    // pivot the 8 per-subspace terms into columns and add them in an
    // explicit ((s0+s1)+s2)+... chain instead.
    val pivotCols = pqPivotCols
    val chainSum = pqChainSum
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       cb AS (SELECT vec_id AS code, v FROM e WHERE vec_id < 16),
       pairs AS (SELECT x.vec_id, c.code, $distCols FROM e x, cb c),
       longp AS (SELECT vec_id, code, jj.j AS j,
              CASE jj.j $caseArms END AS dist
              FROM pairs, (SELECT unnest(range(8)) AS j) jj),
       best AS (SELECT vec_id, j, code, dist,
              row_number() OVER (PARTITION BY vec_id, j
                                 ORDER BY dist, code) AS rn
              FROM longp),
       lut AS (SELECT j, code, dist FROM longp WHERE vec_id = 0),
       adcw AS (SELECT b.vec_id, b.j, l.dist
              FROM best b JOIN lut l ON b.j = l.j AND b.code = l.code
              WHERE b.rn = 1 AND b.vec_id <> 0),
       adcp AS (SELECT vec_id, $pivotCols FROM adcw GROUP BY vec_id),
       adc AS (SELECT vec_id, $chainSum AS adc_dist FROM adcp)
       SELECT vec_id, adc_dist FROM adc
       ORDER BY adc_dist, vec_id LIMIT 10"""
  }

  /** q128's oracle: the batched form of [[pqTopKOracle]] — four query
    * LUTs (vec_id < 4), every corpus vector's codes scored against
    * each, self-pairs excluded, per-query top-5 by (dist, id). The
    * same left-associative ascending-j pivot chain keeps the doubles
    * bit-identical to PqAdcBatch. */
  private val pqBatchOracle: String = {
    def subDist(a: String, b: String, j: Int): String =
      (1 to 8).map { i =>
        val o = j * 8 + i
        s"($a[$o]-$b[$o])*($a[$o]-$b[$o])"
      }.mkString("(", " + ", ")")
    val distCols = (0 until 8)
      .map(j => s"${subDist("x.v", "c.v", j)} AS d$j").mkString(", ")
    val caseArms = (0 until 8).map(j => s"WHEN $j THEN d$j").mkString(" ")
    val pivotCols = pqPivotCols
    val chainSum = pqChainSum
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       cb AS (SELECT vec_id AS code, v FROM e WHERE vec_id < 16),
       pairs AS (SELECT x.vec_id, c.code, $distCols FROM e x, cb c),
       longp AS (SELECT vec_id, code, jj.j AS j,
              CASE jj.j $caseArms END AS dist
              FROM pairs, (SELECT unnest(range(8)) AS j) jj),
       best AS (SELECT vec_id, j, code, dist,
              row_number() OVER (PARTITION BY vec_id, j
                                 ORDER BY dist, code) AS rn
              FROM longp),
       codes AS (SELECT vec_id, j, code FROM best WHERE rn = 1),
       luts AS (SELECT vec_id AS query_id, j, code, dist
              FROM longp WHERE vec_id < 4),
       adcw AS (SELECT l.query_id, c.vec_id, c.j, l.dist
              FROM codes c JOIN luts l ON c.j = l.j AND c.code = l.code
              WHERE c.vec_id <> l.query_id),
       adcp AS (SELECT query_id, vec_id, $pivotCols
              FROM adcw GROUP BY query_id, vec_id),
       adc AS (SELECT query_id, vec_id, $chainSum AS adc_dist FROM adcp),
       ranked AS (SELECT query_id, vec_id, adc_dist,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, vec_id) AS rn
              FROM adc)
       SELECT query_id, vec_id, adc_dist FROM ranked WHERE rn <= 5"""
  }

  /** q132's oracle, generated: the entire portable-hash IVF serve
    * path in SQL. Centers are the first 8 vectors by md5(vec_id)
    * order (15 hex chars — both engines stay in non-negative 60-bit
    * territory, so signed/unsigned ordering agrees); every cosine is
    * three independent left-associative ascending-index chains (dot,
    * na, nb) with den = sqrt(na)*sqrt(nb) and the kernel's -2
    * zero-norm sentinel — the exact accumulation order of
    * CentroidBase.scores and CosineSimilarity. Assignment argmax and
    * probe top-2 both break ties to the LOWER centroid index
    * (row_number ORDER BY cos DESC, cidx), matching the kernel's
    * strict-greater scan and probeIds' stable sort. */
  private val ivfPortableOracle: String = ivfPortableOracleWhere("")

  /** q132/q138's IVF serve math with an extra candidate predicate —
    * the CDC-MV variant (q163) serves the SURVIVOR corpus after a
    * GDPR delete, so its oracle is the same pipeline with the
    * forgotten ids filtered out of the candidate set (centers still
    * derive from the full corpus: the frozen model is trained before
    * the delete, exactly like the engine's). */
  private def ivfPortableOracleWhere(extraCand: String): String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       h AS (SELECT vec_id, v,
              ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
              FROM e),
       cent AS (SELECT v AS cv,
              row_number() OVER (ORDER BY hh, vec_id) - 1 AS cidx
              FROM h QUALIFY cidx <= 7),
       pairs AS (SELECT x.vec_id, c.cidx, ${dot("x.v", "c.cv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("c.cv", "c.cv")} AS nb
              FROM e x, cent c),
       cosp AS (SELECT vec_id, cidx, ${cos("dt", "na", "nb")} AS cs
              FROM pairs),
       asg AS (SELECT vec_id, cidx AS cluster FROM cosp
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, cidx) = 1),
       probes AS (SELECT cidx FROM cosp WHERE vec_id = 0
              QUALIFY row_number() OVER (ORDER BY cs DESC, cidx) <= 2),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       cand AS (SELECT x.vec_id, ${dot("x.v", "q.qv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("q.qv", "q.qv")} AS nb
              FROM e x JOIN asg a ON x.vec_id = a.vec_id, q
              WHERE x.vec_id <> 0
                AND a.cluster IN (SELECT cidx FROM probes)$extraCand)
       SELECT vec_id, ${cos("dt", "na", "nb")} AS cos
       FROM cand ORDER BY cos DESC, vec_id LIMIT 10"""
  }

  /** q133's oracle, generated: the portable-Rademacher LSH serve path
    * in SQL. The plane matrix is a PUBLIC constant (component (i,j) =
    * +-1 by the md5("i:j") first-hex-digit parity — recomputed here at
    * SQL-generation time by the same derivation the Spark side uses),
    * each plane dot is the kernel's ascending-j left-associative
    * chain (so the sign test binds bit-for-bit), buckets are the same
    * 8-bit sign words, multi-probe is the same hamming<=2 expansion
    * over all 256 buckets, and the rescore is the exact cosine chain
    * of q132's oracle. */
  private def lshPortableOracleWith(bits: Int, radius: Int): String = {
    val planes = graft.operators.SimilarityOps.portablePlanes(64, bits)
    def dot(a: String, b: String): String = sqlDot(a, b)
    def planeDot(a: String, i: Int): String =
      sqlChain((1 to 64).map(j =>
        s"$a[$j]*(${if (planes(i)(j - 1) > 0) "1.0" else "-1.0"})"))
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    val bucket = (0 until bits).map(i =>
      s"(CASE WHEN ${planeDot("v", i)} >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString("(", " + ", ")")
    // candidate set stated directly as the Hamming ball membership
    // test — provably the same set the engine's mask expansion
    // probes (ball(qb) = {qb ^ m : popcount(m) <= r}), with no
    // 2^bits enumeration on either engine
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       b AS (SELECT vec_id, v, $bucket AS bucket FROM e),
       q AS (SELECT bucket AS qbv, v AS qv FROM b WHERE vec_id = 0),
       cand AS (SELECT x.vec_id, ${dot("x.v", "q.qv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("q.qv", "q.qv")} AS nb
              FROM b x, q
              WHERE bit_count(xor(x.bucket, q.qbv)) <= $radius
                AND x.vec_id <> 0)
       SELECT vec_id, ${cos("dt", "na", "nb")} AS cos
       FROM cand ORDER BY cos DESC, vec_id LIMIT 10"""
  }

  private val lshPortableOracle: String = lshPortableOracleWith(8, 2)

  /** q154's oracle: the 20-bit wide-signature serve — the geometry the
    * RecallScale width analysis calls for as indexes grow, servable
    * only because hammingBallMasks generates radius-6 probes as
    * 60,460 masks instead of a 2^20-row explode. */
  private val lshWideOracle: String = lshPortableOracleWith(20, 6)

  /** q137's oracle, generated: the IVF-PQ composition replayed end to
    * end — q132's center selection / cosine-argmax assignment / probe
    * top-2 CTEs feeding q121's PQ encode + ADC CTEs, with the
    * candidate set restricted to the probed clusters. Every float
    * chain keeps the kernels' exact accumulation order (cosine: three
    * ascending-index chains + sqrt(na)*sqrt(nb); ADC: per-subspace
    * left-associative sums pivoted and added in an explicit
    * ascending-j chain), encode/assignment ties break low exactly as
    * the strict-compare kernel scans do. */
  private val ivfPqOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    val distCols = pqDistCols
    val caseArms = pqCaseArms
    val pivotCols = pqPivotCols
    val chainSum = pqChainSum
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       h AS (SELECT vec_id, v,
              ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
              FROM e),
       cent AS (SELECT v AS cv,
              row_number() OVER (ORDER BY hh, vec_id) - 1 AS cidx
              FROM h QUALIFY cidx <= 7),
       cpair AS (SELECT x.vec_id, c.cidx, ${dot("x.v", "c.cv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("c.cv", "c.cv")} AS nb
              FROM e x, cent c),
       cosp AS (SELECT vec_id, cidx, ${cos("dt", "na", "nb")} AS cs
              FROM cpair),
       asg AS (SELECT vec_id, cidx AS cluster FROM cosp
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, cidx) = 1),
       probes AS (SELECT cidx FROM cosp WHERE vec_id = 0
              QUALIFY row_number() OVER (ORDER BY cs DESC, cidx) <= 2),
       cb AS (SELECT vec_id AS code, v FROM e WHERE vec_id < 16),
       pairs AS (SELECT x.vec_id, c.code, $distCols FROM e x, cb c),
       longp AS (SELECT vec_id, code, jj.j AS j,
              CASE jj.j $caseArms END AS dist
              FROM pairs, (SELECT unnest(range(8)) AS j) jj),
       best AS (SELECT vec_id, j, code, dist,
              row_number() OVER (PARTITION BY vec_id, j
                                 ORDER BY dist, code) AS rn
              FROM longp),
       lut AS (SELECT j, code, dist FROM longp WHERE vec_id = 0),
       adcw AS (SELECT b.vec_id, b.j, l.dist
              FROM best b JOIN lut l ON b.j = l.j AND b.code = l.code
              JOIN asg a ON b.vec_id = a.vec_id
              WHERE b.rn = 1 AND b.vec_id <> 0
                AND a.cluster IN (SELECT cidx FROM probes)),
       adcp AS (SELECT vec_id, $pivotCols FROM adcw GROUP BY vec_id),
       adc AS (SELECT vec_id, $chainSum AS adc_dist FROM adcp)
       SELECT vec_id, adc_dist FROM adc
       ORDER BY adc_dist, vec_id LIMIT 10"""
  }

  /** Shared CTE prefix of the q149/q153 refine oracles: [[ivfPqOracle]]
    * truncated to the 40-row ADC shortlist plus the query vector —
    * the re-rank tail (exact cosine for q149, exact L2 for q153)
    * plugs in as `tail`, both in the kernels' exact accumulation
    * order. */
  private def ivfPqRefinedOracleWith(tail: String): String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    val distCols = pqDistCols
    val caseArms = pqCaseArms
    val pivotCols = pqPivotCols
    val chainSum = pqChainSum
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       h AS (SELECT vec_id, v,
              ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
              FROM e),
       cent AS (SELECT v AS cv,
              row_number() OVER (ORDER BY hh, vec_id) - 1 AS cidx
              FROM h QUALIFY cidx <= 7),
       cpair AS (SELECT x.vec_id, c.cidx, ${dot("x.v", "c.cv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("c.cv", "c.cv")} AS nb
              FROM e x, cent c),
       cosp AS (SELECT vec_id, cidx, ${cos("dt", "na", "nb")} AS cs
              FROM cpair),
       asg AS (SELECT vec_id, cidx AS cluster FROM cosp
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, cidx) = 1),
       probes AS (SELECT cidx FROM cosp WHERE vec_id = 0
              QUALIFY row_number() OVER (ORDER BY cs DESC, cidx) <= 2),
       cb AS (SELECT vec_id AS code, v FROM e WHERE vec_id < 16),
       pairs AS (SELECT x.vec_id, c.code, $distCols FROM e x, cb c),
       longp AS (SELECT vec_id, code, jj.j AS j,
              CASE jj.j $caseArms END AS dist
              FROM pairs, (SELECT unnest(range(8)) AS j) jj),
       best AS (SELECT vec_id, j, code, dist,
              row_number() OVER (PARTITION BY vec_id, j
                                 ORDER BY dist, code) AS rn
              FROM longp),
       lut AS (SELECT j, code, dist FROM longp WHERE vec_id = 0),
       adcw AS (SELECT b.vec_id, b.j, l.dist
              FROM best b JOIN lut l ON b.j = l.j AND b.code = l.code
              JOIN asg a ON b.vec_id = a.vec_id
              WHERE b.rn = 1 AND b.vec_id <> 0
                AND a.cluster IN (SELECT cidx FROM probes)),
       adcp AS (SELECT vec_id, $pivotCols FROM adcw GROUP BY vec_id),
       adc AS (SELECT vec_id, $chainSum AS adc_dist FROM adcp),
       short AS (SELECT vec_id FROM adc
              QUALIFY row_number() OVER (ORDER BY adc_dist, vec_id)
                <= 40),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       $tail"""
  }

  /** q149's oracle: exact-cosine re-rank of the shortlist. */
  private val ivfPqRefinedOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    ivfPqRefinedOracleWith(
      s"""rr AS (SELECT x.vec_id, ${dot("x.v", "q.qv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("q.qv", "q.qv")} AS nb
              FROM e x JOIN short s ON x.vec_id = s.vec_id, q)
       SELECT vec_id, ${cos("dt", "na", "nb")} AS cos
       FROM rr ORDER BY cos DESC, vec_id LIMIT 10""")
  }

  /** q153's oracle: SAME-metric (exact squared L2) re-rank of the
    * shortlist — the L2Distance kernel's ascending-index (x-q)^2
    * chain, ascending, ties to the lower id. */
  private val ivfPqRefinedL2Oracle: String =
    ivfPqRefinedOracleWith(
      s"""rr AS (SELECT x.vec_id,
              ${sqlChain((1 to 64).map(i =>
                s"(x.v[$i]-q.qv[$i])*(x.v[$i]-q.qv[$i])"))} AS l2
              FROM e x JOIN short s ON x.vec_id = s.vec_id, q)
       SELECT vec_id, l2 FROM rr ORDER BY l2, vec_id LIMIT 10""")

  /** q140's oracle, generated: [[ivfPqOracle]]'s batch form — the
    * q128 pattern (per-query LUTs from vec_id < 4, self-pairs
    * excluded, per-query top-5) with the candidate set restricted per
    * query to ITS OWN probed clusters (probes keyed by query_id).
    * Same exact-accumulation chains throughout. */
  private val ivfPqBatchOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    val distCols = pqDistCols
    val caseArms = pqCaseArms
    val pivotCols = pqPivotCols
    val chainSum = pqChainSum
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       h AS (SELECT vec_id, v,
              ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
              FROM e),
       cent AS (SELECT v AS cv,
              row_number() OVER (ORDER BY hh, vec_id) - 1 AS cidx
              FROM h QUALIFY cidx <= 7),
       cpair AS (SELECT x.vec_id, c.cidx, ${dot("x.v", "c.cv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("c.cv", "c.cv")} AS nb
              FROM e x, cent c),
       cosp AS (SELECT vec_id, cidx, ${cos("dt", "na", "nb")} AS cs
              FROM cpair),
       asg AS (SELECT vec_id, cidx AS cluster FROM cosp
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, cidx) = 1),
       probes AS (SELECT vec_id AS query_id, cidx FROM cosp
              WHERE vec_id < 4
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, cidx) <= 2),
       cb AS (SELECT vec_id AS code, v FROM e WHERE vec_id < 16),
       pairs AS (SELECT x.vec_id, c.code, $distCols FROM e x, cb c),
       longp AS (SELECT vec_id, code, jj.j AS j,
              CASE jj.j $caseArms END AS dist
              FROM pairs, (SELECT unnest(range(8)) AS j) jj),
       best AS (SELECT vec_id, j, code, dist,
              row_number() OVER (PARTITION BY vec_id, j
                                 ORDER BY dist, code) AS rn
              FROM longp),
       codes AS (SELECT vec_id, j, code FROM best WHERE rn = 1),
       luts AS (SELECT vec_id AS query_id, j, code, dist
              FROM longp WHERE vec_id < 4),
       adcw AS (SELECT l.query_id, c.vec_id, c.j, l.dist
              FROM codes c JOIN luts l ON c.j = l.j AND c.code = l.code
              JOIN asg a ON c.vec_id = a.vec_id
              JOIN probes p ON p.query_id = l.query_id
                           AND p.cidx = a.cluster
              WHERE c.vec_id <> l.query_id),
       adcp AS (SELECT query_id, vec_id, $pivotCols
              FROM adcw GROUP BY query_id, vec_id),
       adc AS (SELECT query_id, vec_id, $chainSum AS adc_dist FROM adcp),
       ranked AS (SELECT query_id, vec_id, adc_dist,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, vec_id) AS rn
              FROM adc)
       SELECT query_id, vec_id, adc_dist FROM ranked WHERE rn <= 5"""
  }

  /** q141's oracle, generated: every corpus vector scored against the
    * 4-query batch with the exact cosine chains, self-pairs dropped,
    * the near-dup band [0.95, 1] excluded (the threshold compared as
    * an explicit DOUBLE — 0.95 is DECIMAL in DuckDB and the decimal
    * would otherwise coerce per engine convention), per-query top-10
    * by (cos DESC, id). */
  private val hardNegativesOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
       dn AS (SELECT q.query_id, x.vec_id, ${dot("x.v", "q.qv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("q.qv", "q.qv")} AS nb
              FROM e x, q WHERE x.vec_id <> q.query_id),
       c AS (SELECT query_id, vec_id, ${cos("dt", "na", "nb")} AS cos
              FROM dn),
       f AS (SELECT * FROM c WHERE cos < CAST(0.95 AS DOUBLE)),
       ranked AS (SELECT query_id, vec_id, cos,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id) AS rn
              FROM f)
       SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 10"""
  }

  /** q146's oracle: the q132 cosine chains restricted to lang='en'
    * ids via the metadata join — exact filtered search. */
  private val filteredAnnOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       ok AS (SELECT doc_id FROM documents
              WHERE lang = 'en' AND doc_id <> 0),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       dn AS (SELECT x.vec_id, ${dot("x.v", "q.qv")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("q.qv", "q.qv")} AS nb
              FROM e x JOIN ok ON x.vec_id = ok.doc_id, q)
       SELECT vec_id, ${cos("dt", "na", "nb")} AS cos
       FROM dn ORDER BY cos DESC, vec_id LIMIT 10"""
  }

  /** q147's oracle: q145's scoring CTEs with the per-document
    * best-chunk collapse (QUALIFY rank 1 by cos DESC, chunk_id) before
    * the global top-10. */
  private val ragDiverseOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b, dims = 16)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    s"""WITH chunks AS (SELECT doc_id, CAST(s // 150 AS BIGINT) AS chunk_id,
           substr(text, CAST(s AS BIGINT) + 1, 200) AS chunk_text
         FROM documents, UNNEST(generate_series(0, length(text) - 1, 150))
           AS g(s)
         WHERE length(text) > 0),
       emb AS (SELECT doc_id, chunk_id,
           list_transform(range(0, 16), j ->
             (('0x' || substr(md5(chunk_text || ':' || j), 1, 15))::BIGINT
               % 1000)::DOUBLE) AS v
           FROM chunks),
       q AS (SELECT v AS qv FROM emb WHERE doc_id = 0 AND chunk_id = 0),
       dn AS (SELECT x.doc_id, x.chunk_id, ${dot("x.v", "q.qv")} AS dt,
           ${dot("x.v", "x.v")} AS na, ${dot("q.qv", "q.qv")} AS nb
           FROM emb x, q WHERE x.doc_id <> 0),
       sc AS (SELECT doc_id, chunk_id, ${cos("dt", "na", "nb")} AS cos
           FROM dn),
       best AS (SELECT doc_id, chunk_id, cos FROM sc
           QUALIFY row_number() OVER (PARTITION BY doc_id
             ORDER BY cos DESC, chunk_id) = 1)
       SELECT doc_id, chunk_id, cos FROM best
       ORDER BY cos DESC, doc_id LIMIT 10"""
  }

  /** q145's oracle, generated: q82's chunk CTE, the 16-component
    * md5-hash embedding (integer-valued, so DuckDB's DOUBLE math and
    * Spark's float storage agree exactly), and the standard cosine
    * chains over the 16 dims. Ties (duplicate chunk texts embed
    * identically) break by (doc_id, chunk_id) in both engines. */
  private val ragRetrieveOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b, dims = 16)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    s"""WITH chunks AS (SELECT doc_id, CAST(s // 150 AS BIGINT) AS chunk_id,
           substr(text, CAST(s AS BIGINT) + 1, 200) AS chunk_text
         FROM documents, UNNEST(generate_series(0, length(text) - 1, 150))
           AS g(s)
         WHERE length(text) > 0),
       emb AS (SELECT doc_id, chunk_id,
           list_transform(range(0, 16), j ->
             (('0x' || substr(md5(chunk_text || ':' || j), 1, 15))::BIGINT
               % 1000)::DOUBLE) AS v
           FROM chunks),
       q AS (SELECT v AS qv FROM emb WHERE doc_id = 0 AND chunk_id = 0),
       dn AS (SELECT x.doc_id, x.chunk_id, ${dot("x.v", "q.qv")} AS dt,
           ${dot("x.v", "x.v")} AS na, ${dot("q.qv", "q.qv")} AS nb
           FROM emb x, q WHERE x.doc_id <> 0)
       SELECT doc_id, chunk_id, ${cos("dt", "na", "nb")} AS cos
       FROM dn ORDER BY cos DESC, doc_id, chunk_id LIMIT 10"""
  }

  /** q139's oracle, generated: the q131 banded-BM25 CTEs produce the
    * lexical top-20 ranking, the q132 cosine chains produce the dense
    * top-20 ranking, and the fused score is COALESCE'd integer-rank
    * arithmetic — 1/(60+rank) is one correctly-rounded IEEE division
    * (the CAST to DOUBLE matters: a bare 1.0 is DECIMAL in DuckDB)
    * and the two arms add in a single commutative addition, so the
    * doubles match the Spark side bit for bit. */
  private val hybridRrfOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    s"""WITH toks AS (SELECT doc_id, u.w AS word
           FROM (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents), unnest(ws) AS u(w)
           WHERE u.w != ''),
       tf AS (SELECT doc_id, word, count(*) AS tf
              FROM toks GROUP BY 1, 2),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       idf AS (SELECT word,
              ln(1.0 + ((SELECT count(*)::DOUBLE FROM documents)
                        - count(*) + 0.5) / (count(*) + 0.5)) AS idf
              FROM tf GROUP BY word),
       q AS (SELECT word FROM tf WHERE doc_id = 0),
       sc AS (SELECT t.doc_id,
              CAST(CAST(sum(CAST(i.idf * (t.tf * 2.2::DOUBLE) /
                  (t.tf + 1.2 * (0.25 + 0.75 * d.dl /
                    (SELECT avg(dl) FROM dl)))
                AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS score
              FROM tf t JOIN q ON t.word = q.word
              JOIN idf i ON t.word = i.word
              JOIN dl d ON t.doc_id = d.doc_id
              WHERE t.doc_id <> 0
              GROUP BY t.doc_id),
       lex AS (SELECT doc_id AS id,
              row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
              FROM sc QUALIFY lrank <= 20),
       e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       qv AS (SELECT v AS qvec FROM e WHERE vec_id = 0),
       dn AS (SELECT x.vec_id, ${dot("x.v", "q.qvec")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("q.qvec", "q.qvec")} AS nb
              FROM e x, qv q WHERE x.vec_id <> 0),
       dcos AS (SELECT vec_id, ${cos("dt", "na", "nb")} AS cs FROM dn),
       den AS (SELECT vec_id AS id,
              row_number() OVER (ORDER BY cs DESC, vec_id) AS drank
              FROM dcos QUALIFY drank <= 20),
       fused AS (SELECT COALESCE(l.id, d.id) AS doc_id,
              COALESCE(CAST(1.0 AS DOUBLE)/(60 + l.lrank), 0.0) +
              COALESCE(CAST(1.0 AS DOUBLE)/(60 + d.drank), 0.0)
                AS rrf_score
              FROM lex l FULL OUTER JOIN den d ON l.id = d.id)
       SELECT doc_id, rrf_score FROM fused
       ORDER BY rrf_score DESC, doc_id LIMIT 10"""
  }

  /** q148's oracle: [[hybridRrfOracle]] keyed by query_id over the
    * 3-query batch — per-query banded-BM25 and cosine rankings,
    * per-query integer-rank fusion, per-query top-10. */
  private val hybridRrfBatchOracle: String = {
    def dot(a: String, b: String): String = sqlDot(a, b)
    def cos(d: String, na: String, nb: String): String = sqlCos(d, na, nb)
    s"""WITH toks AS (SELECT doc_id, u.w AS word
           FROM (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents), unnest(ws) AS u(w)
           WHERE u.w != ''),
       tf AS (SELECT doc_id, word, count(*) AS tf
              FROM toks GROUP BY 1, 2),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       idf AS (SELECT word,
              ln(1.0 + ((SELECT count(*)::DOUBLE FROM documents)
                        - count(*) + 0.5) / (count(*) + 0.5)) AS idf
              FROM tf GROUP BY word),
       q AS (SELECT doc_id AS query_id, word FROM tf
             WHERE doc_id IN (0, 1, 2)),
       sc AS (SELECT q.query_id, t.doc_id,
              CAST(CAST(sum(CAST(i.idf * (t.tf * 2.2::DOUBLE) /
                  (t.tf + 1.2 * (0.25 + 0.75 * d.dl /
                    (SELECT avg(dl) FROM dl)))
                AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS score
              FROM tf t JOIN q ON t.word = q.word
              JOIN idf i ON t.word = i.word
              JOIN dl d ON t.doc_id = d.doc_id
              WHERE t.doc_id <> q.query_id
              GROUP BY q.query_id, t.doc_id),
       lex AS (SELECT query_id, doc_id AS id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS lrank
              FROM sc QUALIFY lrank <= 20),
       e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       qv AS (SELECT vec_id AS query_id, v AS qvec FROM e
              WHERE vec_id IN (0, 1, 2)),
       dn AS (SELECT q.query_id, x.vec_id, ${dot("x.v", "q.qvec")} AS dt,
              ${dot("x.v", "x.v")} AS na, ${dot("q.qvec", "q.qvec")} AS nb
              FROM e x, qv q WHERE x.vec_id <> q.query_id),
       dcos AS (SELECT query_id, vec_id, ${cos("dt", "na", "nb")} AS cs
              FROM dn),
       den AS (SELECT query_id, vec_id AS id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cs DESC, vec_id) AS drank
              FROM dcos QUALIFY drank <= 20),
       fused AS (SELECT COALESCE(l.query_id, d.query_id) AS query_id,
              COALESCE(l.id, d.id) AS doc_id,
              COALESCE(CAST(1.0 AS DOUBLE)/(60 + l.lrank), 0.0) +
              COALESCE(CAST(1.0 AS DOUBLE)/(60 + d.drank), 0.0)
                AS rrf_score
              FROM lex l FULL OUTER JOIN den d
                ON l.query_id = d.query_id AND l.id = d.id),
       ranked AS (SELECT query_id, doc_id, rrf_score,
              row_number() OVER (PARTITION BY query_id
                ORDER BY rrf_score DESC, doc_id) AS rn
              FROM fused)
       SELECT query_id, doc_id, rrf_score FROM ranked WHERE rn <= 10"""
  }

  /** q135/q136's oracle: q125's BM25 math — the persisted index and
    * the maintenance MV change WHERE the statistics live, not what
    * they are — with N = docs having tokens (what docstats stores)
    * and the q131 DECIMAL(18,12) score banding. */
  private val bm25PersistedOracle: String = bm25PersistedOracleWhere("")

  /** The same BM25-from-index math over a corpus SLICE — the CDC-MV
    * variant (q162) serves the survivors of a GDPR delete, and all
    * statistics (df, N, avgdl) must reflect the removal because they
    * derive from stored rows. `corpusWhere` filters the source docs
    * (e.g. " WHERE doc_id % 7 <> 3"). */
  private def bm25PersistedOracleWhere(corpusWhere: String): String =
    s"""WITH toks AS (SELECT doc_id, u.w AS word
           FROM (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents$corpusWhere), unnest(ws) AS u(w)
           WHERE u.w != ''),
       tf AS (SELECT doc_id, word, count(*) AS tf
              FROM toks GROUP BY 1, 2),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       idf AS (SELECT word,
              ln(1.0 + ((SELECT count(*)::DOUBLE FROM dl)
                        - count(*) + 0.5) / (count(*) + 0.5)) AS idf
              FROM tf GROUP BY word),
       q AS (SELECT word FROM tf WHERE doc_id = 0)
       SELECT t.doc_id,
              CAST(CAST(sum(CAST(i.idf * (t.tf * 2.2::DOUBLE) /
                  (t.tf + 1.2 * (0.25 + 0.75 * d.dl /
                    (SELECT avg(dl) FROM dl)))
                AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS score
       FROM tf t JOIN q ON t.word = q.word
       JOIN idf i ON t.word = i.word
       JOIN dl d ON t.doc_id = d.doc_id
       WHERE t.doc_id <> 0
       GROUP BY t.doc_id
       ORDER BY score DESC, t.doc_id LIMIT 10"""

  /** Per-document 64-bit SimHash sketch recomputed from scratch in
    * DuckDB — possible because the token hash is the first 16 hex chars
    * of md5 (DedupOps.md5Token64), a bit pattern every engine agrees
    * on. Tokenization mirrors the Spark side exactly: lower, split on
    * single space, distinct, drop empties. Each token's hash votes
    * +1/-1 per bit; sketch bit b is set iff the counter is >= 0. */
  /** Perceptual-hash sketch CTE — the q34 SimHash oracle device with
    * frames instead of word tokens: 64-byte payload chunks, each
    * md5-fingerprinted to a 64-bit hash, bit-voted into a SimHash.
    * Fixture payloads are pure ASCII (byte == char), so DuckDB's
    * string substring/md5 see exactly the bytes the engine's binary
    * operators hash. */
  private val phashSketchBody: String =
    """fr AS (SELECT doc_id,
           list_distinct(list_transform(
             range(0, (length(text) + 63) // 64),
             i -> md5(substring(text, (i * 64 + 1)::BIGINT, 64)))) AS fs
           FROM documents WHERE length(text) > 0),
       th AS (SELECT doc_id,
              ('0x' || substr(u.f, 1, 16))::UBIGINT AS h
              FROM fr, unnest(fs) AS u(f)),
       bits AS (SELECT doc_id, b,
                SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS c
                FROM th, (SELECT unnest(range(64)) AS b)
                GROUP BY doc_id, b),
       sh AS (SELECT doc_id,
              bit_or(CASE WHEN c >= 0 THEN (1::UBIGINT << b)
                     ELSE 0::UBIGINT END) AS simhash
              FROM bits GROUP BY doc_id)"""

  private val phashSketchCte: String = "WITH " + phashSketchBody

  /** Distinct (doc_id, frame-md5) rows — the raw material of the
    * frame-SET Jaccard oracles (q169/q170), chunked exactly like the
    * engine's binary frame sampler. */
  private val phashFrameCte: String =
    """WITH fr0 AS (SELECT doc_id,
           list_distinct(list_transform(
             range(0, (length(text) + 63) // 64),
             i -> md5(substring(text, (i * 64 + 1)::BIGINT, 64)))) AS fs
           FROM documents WHERE length(text) > 0),
       fh AS (SELECT doc_id, u.f AS f FROM fr0, unnest(fs) AS u(f))"""

  private val simHashSketchCte: String =
    """WITH toks AS (SELECT doc_id,
           list_filter(list_distinct(string_split(lower(text), ' ')),
                       x -> x != '') AS ts
           FROM documents),
       th AS (SELECT doc_id,
              ('0x' || substr(md5(u.t), 1, 16))::UBIGINT AS h
              FROM toks, unnest(ts) AS u(t)),
       bits AS (SELECT doc_id, b,
                SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS c
                FROM th, (SELECT unnest(range(64)) AS b)
                GROUP BY doc_id, b),
       sh AS (SELECT doc_id,
              bit_or(CASE WHEN c >= 0 THEN (1::UBIGINT << b)
                     ELSE 0::UBIGINT END) AS simhash
              FROM bits GROUP BY doc_id)"""

  /** q62's full redaction result — shared verbatim by q68's streaming
    * aggregate. Same deterministic PII enrichment as the Spark queries;
    * DuckDB regexp_replace needs the 'g' flag for replace-all (Spark's
    * default); patterns are RE2/Java-identical. */
  private val piiRedactionOracle: String =
    """WITH enriched AS (SELECT doc_id,
           text || ' contact user' || doc_id::VARCHAR || '@example.com or 555-'
             || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
             || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7 end' AS text
           FROM documents)
         SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
           '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS clean_text,
         len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         len(regexp_extract_all(text,
           '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
         len(regexp_extract_all(text,
           '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips
         FROM enriched"""

  /** The seed-free axis-sign SRP band predicate, in DuckDB SQL: rows
    * `a` and `b` agree in ALL 8 sign bits of SOME 8-bit band — the
    * literal semantics of SignRandomProjection.sign_bits band joins,
    * so oracles check LSH candidate generation exactly. */
  /** Literal SQL form of the Spark-side SRP band-collision predicate,
    * parameterized by the band geometry (defaults = the 4 x 16-bit
    * index-modality geometry of SimilarityOps; q40's one-shot LSH
    * keeps its inline 8 x 8 predicate). DuckDB list indexing is
    * 1-based. */
  private def srpBandPred(a: String, b: String,
      bands: Int = SimilarityOps.DefaultIndexBands,
      bandBits: Int = SimilarityOps.DefaultIndexBandBits): String =
    (0 until bands).map(k => (0 until bandBits).map { j =>
      val i = k * bandBits + j + 1
      s"($a.embedding[$i] >= 0) = ($b.embedding[$i] >= 0)"
    }.mkString("(", " AND ", ")")).mkString("(", "\n            OR ", ")")

  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           AS sum_base_price,
         CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
         CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax)
           AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           / count(l_quantity) AS avg_qty,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           / count(l_extendedprice) AS avg_price,
         CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           / count(l_discount) AS avg_disc, count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice*l_discount AS disc_revenue FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q03_join_agg_nation" ->
      """SELECT r_name, n_name, CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
         count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q05_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",
    "q06_window_running" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend,
         lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_price,
         lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS next_price
         FROM orders""",
    "q07_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
         count(*) AS n FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q08_cube" ->
      """SELECT c_mktsegment, n_name, CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(c_acctbal) AS avg_bal,
         count(*) AS n FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY CUBE (c_mktsegment, n_name)""",
    "q09_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
         count(*) AS n FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q10_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT (l_partkey, l_suppkey)) AS n_ps
         FROM lineitem GROUP BY l_returnflag""",
    "q11_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT SELECT o_custkey FROM orders""",
    "q12_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000""",
    "q13_union_all" ->
      """SELECT src, count(*) AS n, count(DISTINCT key) AS n_keys FROM (
           SELECT c_custkey AS key, 'customer' AS src FROM customer
           UNION ALL
           SELECT o_custkey AS key, 'orders' AS src FROM orders)
         GROUP BY src""",
    "q14_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         GROUP BY o_orderpriority""",
    "q15_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",
    "q16_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey,
         o_totalprice / (SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(o_totalprice) FROM orders) AS price_ratio
         FROM orders
         WHERE o_totalprice > 1.5 * (SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(o_totalprice) FROM orders)""",
    "q17_json_extract" ->
      """SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
         count(*) AS n,
         avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k,
         max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY 1, 2""",
    "q66_map_funcs" ->
      // DuckDB side reads the same JSON as key list + typed lookup;
      // single-key fixture makes keys/cardinality deterministic
      """SELECT event_type,
         array_to_string(json_keys(props), ',') AS keys,
         FALSE AS has_missing,
         CAST(len(json_keys(props)) AS BIGINT) AS n_entries,
         count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_kv
         FROM events GROUP BY 1, 2, 3, 4""",
    "q18_time_bucket" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS hour_ts, event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(value) AS avg_value FROM events GROUP BY 1, 2""",
    "q19_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
               ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'purchase'),
         pd AS (SELECT user_id, ts, event_id AS p_event_id,
                value AS p_value FROM p WHERE rn = 1)
         SELECT e.event_id, e.user_id, pd.p_event_id, pd.p_value
         FROM (SELECT * FROM events WHERE event_type = 'error') e
         ASOF LEFT JOIN pd
           ON e.user_id = pd.user_id AND e.ts >= pd.ts""",
    "q20_range_join" ->
      """SELECT e.event_id, count(p.p_id) AS n_prev,
         coalesce(CAST(CAST(sum(CAST(p.p_value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE), 0) AS sum_prev
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error') e
         LEFT JOIN (SELECT user_id AS p_user, ts AS p_ts,
                    event_id AS p_id, value AS p_value FROM events
                    WHERE event_type = 'purchase') p
           ON e.user_id = p.p_user
           AND p.p_ts >= e.ts - INTERVAL 1 HOUR AND p.p_ts <= e.ts
         GROUP BY e.event_id""",
    "q21_string_funcs" ->
      """SELECT substring(p_type, 1, 6) AS type_prefix, count(*) AS n,
         avg(length(p_name)) AS avg_name_len, max(upper(p_brand)) AS max_brand,
         min(p_retailprice) AS min_price FROM part GROUP BY 1""",
    "q22_conditional_agg" ->
      """SELECT l_returnflag,
         CAST(CAST(sum(CAST(CASE WHEN l_quantity > 25 THEN l_extendedprice
           ELSE 0 END AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS big_rev,
         CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_disc,
         CAST(CAST(sum(CAST(CASE WHEN l_tax > 0.04 THEN l_tax END AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(CASE WHEN l_tax > 0.04 THEN l_tax END) AS avg_high_tax
         FROM lineitem GROUP BY l_returnflag""",
    "q23_udaf_geomean" ->
      """SELECT o_orderpriority, exp(CAST(CAST(sum(CAST(ln(o_totalprice) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / count(*)) AS geomean_price,
         count(*) AS n FROM orders GROUP BY 1""",
    // tolerance-band HLL oracle: each engine checks its OWN sketch
    // against its own exact count — the exact columns + in-band
    // booleans hash-match even though the raw estimates never would
    "q24_approx_distinct" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
         CAST(count(*) AS BIGINT) AS n,
         abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
             / count(DISTINCT l_partkey) - 1) < 0.1 AS approx_parts_ok,
         abs(CAST(approx_count_distinct(l_suppkey) AS DOUBLE)
             / count(DISTINCT l_suppkey) - 1) < 0.1 AS approx_supps_ok
         FROM lineitem GROUP BY l_returnflag""",
    "q57_correlated_subquery" ->
      """WITH sq AS (SELECT s_suppkey, s_name,
           (SELECT sum(l_quantity) FROM lineitem
            WHERE l_suppkey = s_suppkey
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_brand = 'Brand#1')) AS total_qty
           FROM supplier)
         SELECT s_suppkey, s_name, total_qty FROM sq
         WHERE total_qty > (SELECT 1.1 * avg(total_qty) FROM sq)""",
    "q58_stream_dedup" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1""",
    "q59_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         o_orderpriority,
         CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q54_pivot" ->
      """SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click') AS click,
         count(*) FILTER (WHERE event_type = 'error') AS error,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         count(*) FILTER (WHERE event_type = 'signup') AS signup,
         count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY user_id""",
    "q55_unpivot" ->
      """WITH p AS (SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
           FROM events GROUP BY user_id)
         SELECT user_id, event_type, n FROM (
           SELECT user_id, 'click' AS event_type, click AS n FROM p
           UNION ALL SELECT user_id, 'error', error FROM p
           UNION ALL SELECT user_id, 'purchase', purchase FROM p
           UNION ALL SELECT user_id, 'signup', signup FROM p
           UNION ALL SELECT user_id, 'view', view FROM p)""",
    "q67_top_words" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents)
         WHERE word <> ''
         GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "q61_decontaminate" ->
      // string shingles here, 64-bit shingle hashes in Spark: identity
      // of the n-gram is what both sides count (collisions ~2^-64)
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
         bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
         corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
         SELECT c.doc_id, count(*) AS n_shared
         FROM corp c JOIN bench b USING (shingle)
         GROUP BY 1 HAVING count(*) >= 1""",
    // q142: survivors = corpus docs with NO benchmark doc at jaccard
    // >= 0.5. Same string-shingle identity trick as q61/q33; the
    // jaccard is integer-derived division, identical in both engines.
    // Docs too short to shingle have no sh rows, can't be bad, survive.
    "q142_neardup_decontaminate" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT c.doc_id, b.doc_id AS bench_id,
                count(*) AS i
                FROM sh c JOIN sh b ON c.shingle = b.shingle
                WHERE c.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
                GROUP BY 1, 2),
         bad AS (SELECT DISTINCT i.doc_id
                FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_id
                JOIN cnt cb ON cb.doc_id = i.bench_id
                WHERE i.i::DOUBLE / (ca.n + cb.n - i.i) >= 0.5)
         SELECT d.doc_id FROM documents d
         WHERE d.doc_id % 97 <> 0
           AND d.doc_id NOT IN (SELECT doc_id FROM bad)""",
    // q144: the one non-integer step (pow) is banded to DECIMAL(28,6)
    // before the weight sum; every later step is identical double
    // arithmetic on identical inputs (decimal->double correctly
    // rounded, floor exact), so the per-domain targets — and with the
    // md5(id) selection order, the selected SET — match bit-for-bit.
    "q144_temperature_mixture" ->
      """WITH d2 AS (SELECT doc_id, lang AS domain FROM documents),
         cnt AS (SELECT domain, count(*) AS c FROM d2 GROUP BY 1),
         tot AS (SELECT sum(c) AS t FROM cnt),
         w AS (SELECT domain, c,
               CAST(pow(c, 0.7) AS DECIMAL(28,6)) AS wd FROM cnt),
         sw AS (SELECT sum(wd) AS sumw FROM w),
         tgt AS (SELECT domain,
               LEAST(c, CAST(floor(((t // 2) * (wd::DOUBLE))
                 / (sumw::DOUBLE)) AS BIGINT)) AS k
               FROM w, sw, tot),
         ranked AS (SELECT doc_id, domain,
               row_number() OVER (PARTITION BY domain
                 ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
               FROM d2)
         SELECT r.doc_id, r.domain
         FROM ranked r JOIN tgt ON r.domain = tgt.domain
         WHERE r.rn <= tgt.k""",
    "q62_pii_redaction" -> piiRedactionOracle,
    // streaming variant: the same redaction run as an exactly-once MV
    // into the lake; the oracle aggregates the batch redaction — equal
    // because AvailableNow drains everything exactly once
    "q68_stream_hygiene" ->
      s"""WITH red AS ($piiRedactionOracle)
         SELECT count(*) AS n_docs,
         CAST(sum(n_emails) AS BIGINT) AS sum_emails,
         CAST(sum(n_phones) AS BIGINT) AS sum_phones,
         CAST(sum(n_ips) AS BIGINT) AS sum_ips,
         CAST(sum(length(clean_text)) AS BIGINT) AS sum_clean_chars
         FROM red""",
    "q63_repetition_signals" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE len(string_split(text, ' ')) >= 2),
         wc AS (SELECT doc_id, unnest(w) AS word FROM words),
         cnts AS (SELECT doc_id, word, count(*) AS c FROM wc GROUP BY 1, 2),
         topw AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_word_frac
                  FROM cnts GROUP BY 1),
         bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b
                FROM words, UNNEST(generate_series(1, len(w)-1)) AS t(i)),
         bi AS (SELECT doc_id,
                1.0 - count(DISTINCT b)::DOUBLE / count(*) AS dup_bigram_frac
                FROM bg GROUP BY 1)
         SELECT t.doc_id, t.top_word_frac, bi.dup_bigram_frac
         FROM topw t JOIN bi USING (doc_id)""",
    "q111_epoch_shuffle" ->
      """SELECT doc_id,
           row_number() OVER (
             ORDER BY md5(concat(42, '|', doc_id)), doc_id) - 1 AS pos
         FROM documents""",
    "q64_deterministic_split" ->
      """SELECT source,
         CASE WHEN b < 13 THEN 'train' WHEN b < 15 THEN 'val'
              ELSE 'test' END AS split,
         count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM (SELECT source, n_chars,
           strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1 AS b
           FROM documents)
         GROUP BY 1, 2""",
    "q65_domain_mixture" ->
      """SELECT source, count(*) AS n_docs
         FROM (SELECT source,
           (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) AS b
           FROM documents)
         WHERE b < CASE source WHEN 'src0' THEN 2048 WHEN 'src1' THEN 1024
                   WHEN 'src2' THEN 0 ELSE 4096 END
         GROUP BY 1""",
    // naive single-window formulation of the q69 budget-prefix rule; a
    // hash match proves the histogram-cutoff plan computes the same set
    "q69_token_budget" ->
      """WITH scored AS (SELECT source, doc_id,
           least(length(text) / 500.0, 1.0) * 0.4
           + (CASE WHEN (CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / (length(text) - length(replace(text, ' ', '')) + 1))
                BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.4
           + (CASE WHEN len(list_filter(string_split(text, ' '),
                w -> w IN ('the','of','and','to','a','in','is'))) > 0
                THEN 1.0 ELSE 0.5 END) * 0.2 AS quality,
           len(regexp_extract_all(lower(text),
             '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tokens
           FROM documents),
         c AS (SELECT source, doc_id, sum(n_tokens) OVER
             (PARTITION BY source ORDER BY quality DESC, doc_id) AS cum
           FROM scored)
         SELECT source, doc_id FROM c WHERE cum <= 800""",
    // naive row_number-window formulation of the q70 per-domain cap
    "q70_domain_cap" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id, row_number() OVER
             (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
           FROM documents)
         WHERE rn <= 10""",
    "q80_curation_pipeline" ->
      """WITH dup AS (
           SELECT doc_id, text, source FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text, 'dupsrc' FROM documents
           WHERE doc_id % 50 = 0),
         enr AS (SELECT doc_id, source,
           text || ' contact user' || doc_id::VARCHAR
             || '@example.com or 555-'
             || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
             || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7 end' AS text
           FROM dup),
         red AS (SELECT doc_id, source,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS clean_text
           FROM enr),
         kept AS (SELECT * FROM red WHERE
           least(length(clean_text) / 500.0, 1.0) * 0.4
           + (CASE WHEN (CAST(length(replace(clean_text, ' ', ''))
                AS DOUBLE) / (length(clean_text)
                - length(replace(clean_text, ' ', '')) + 1))
                BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.4
           + (CASE WHEN len(list_filter(string_split(clean_text, ' '),
                w -> w IN ('the','of','and','to','a','in','is'))) > 0
                THEN 1.0 ELSE 0.5 END) * 0.2 >= 0.6),
         ded AS (SELECT clean_text, min(doc_id) AS doc_id,
             arg_min(source, doc_id) AS source
           FROM kept GROUP BY clean_text),
         sp AS (SELECT source, clean_text,
             CASE WHEN b < 13 THEN 'train' WHEN b < 15 THEN 'val'
                  ELSE 'test' END AS split
           FROM (SELECT source, clean_text,
             strpos('0123456789abcdef', substr(md5(clean_text), 32, 1)) - 1
               AS b FROM ded))
         SELECT source, split, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(lower(clean_text),
             '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS sum_tokens
         FROM sp GROUP BY 1, 2""",
    "q78_stream_state_funnel" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type FROM events),
         agg AS (SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase'
             AND prev_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_conversions
           FROM o GROUP BY 1),
         lastt AS (SELECT user_id, event_type AS last_type FROM (
           SELECT user_id, event_type, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1)
         SELECT a.user_id, a.n_events, a.n_conversions, l.last_type
         FROM agg a JOIN lastt l ON a.user_id = l.user_id""",
    "q77_local_supplier_volume" ->
      """SELECT n_name,
         CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",
    "q93_ship_mode_priority" ->
      """SELECT l_linestatus,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
               OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
               AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
           AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate > o_orderdate
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_linestatus ORDER BY l_linestatus""",
    // Q21-shape: the EXISTS/NOT EXISTS pair decorrelates to the same
    // semi/anti self-joins the engine plans explicitly
    "q101_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         WHERE o_orderstatus = 'F'
           AND EXISTS (SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey
               AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
             WHERE l3.l_orderkey = l1.l_orderkey
               AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_shipdate > l1.l_shipdate)
         GROUP BY s_name""",
    // Q4-shape: EXISTS comparing an inner column to an OUTER column,
    // decorrelated to a residual-condition semi join
    "q104_order_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-07-01'
           AND o_orderdate < TIMESTAMP '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
         GROUP BY o_orderpriority""",
    // Q20-shape: correlated scalar-agg subquery inside a grouped
    // HAVING under an IN — Catalyst decorrelates the scalar into an
    // aggregate + equi-join
    "q103_excess_volume_suppliers" ->
      """SELECT s_name, count(*) AS n_parts
         FROM supplier JOIN (
           SELECT l1.l_suppkey, l1.l_partkey
           FROM lineitem l1
           WHERE l1.l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_type LIKE 'PROMO%')
           GROUP BY l1.l_suppkey, l1.l_partkey
           HAVING sum(l1.l_quantity) > (SELECT 1.5 * avg(l2.l_quantity)
                                        FROM lineitem l2
                                        WHERE l2.l_partkey = l1.l_partkey)
         ) ex ON s_suppkey = ex.l_suppkey
         GROUP BY s_name""",
    // Q18-shape: IN over a grouped HAVING subquery
    "q102_top_customer_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
           sum(l_quantity) AS sum_qty
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING sum(l_quantity) > 300)
         GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""",
    "q94_promo_revenue" ->
      """SELECT 100.0 * CAST(CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%'
           THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
           AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'""",
    "q99_forecast_revenue" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "q89_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
         CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem, orders, customer, nation
         WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND c_nationkey = n_nationkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q76_lake_pruned_read" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
         count(DISTINCT user_id) AS n_users
         FROM events WHERE user_id >= 3 AND user_id <= 9
         GROUP BY 1""",
    // delete-then-merge replayed in plain SQL: rows whose key appears
    // in the merge source are replaced, unseen keys are inserted
    // Mirrors q152: the same day-aligned 3-day window recomputed in
    // SQL (// is DuckDB floor division; day-aligned bounds make the
    // timestamp literals micros-exact on both engines).
    "q152_hidden_partition" ->
      """WITH lo AS (SELECT
             (epoch_us(min(ts)) // 86400000000 + 2) * 86400000000 AS a,
             (epoch_us(min(ts)) // 86400000000 + 5) * 86400000000 AS b
           FROM events)
         SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events, lo
         WHERE epoch_us(ts) >= a AND epoch_us(ts) < b
         GROUP BY event_type""",
    // Mirrors q162: BM25 from the index over the survivor corpus —
    // all statistics recomputed without the forgotten documents.
    "q162_lexical_cdc_mv" ->
      bm25PersistedOracleWhere(" WHERE doc_id % 7 <> 3"),
    // Mirrors q163: the IVF serve with forgotten ids out of the
    // candidate set (frozen full-corpus centers, like the engine).
    "q163_vector_cdc_mv" ->
      ivfPortableOracleWhere("\n                AND x.vec_id % 7 <> 3"),
    // Mirrors q164: the CDC curation algebra replayed version by
    // version — batch-1 owners are min-id per fingerprint among the
    // evens; the forget removes owners with id%11==4 AND frees their
    // fingerprints; the resubmission (+1e6 ids, same text) is accepted
    // exactly where the fingerprint lost its owner; the odd batch is
    // accepted against everything admitted so far.
    "q164_curation_cdc_mv" ->
      """WITH fp AS (SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
           FROM documents),
         acc1 AS (SELECT fp, min(doc_id) AS doc_id FROM fp
           WHERE doc_id % 2 = 0 GROUP BY fp),
         fgt AS (SELECT doc_id FROM documents
           WHERE doc_id % 2 = 0 AND doc_id % 11 = 4),
         sur1 AS (SELECT fp, doc_id FROM acc1
           WHERE doc_id NOT IN (SELECT doc_id FROM fgt)),
         res AS (SELECT f.fp, min(f.doc_id + 1000000) AS doc_id
           FROM fp f JOIN fgt g USING (doc_id) GROUP BY f.fp),
         acc3 AS (SELECT fp, doc_id FROM res
           WHERE fp NOT IN (SELECT fp FROM sur1)),
         acc4 AS (SELECT fp, min(doc_id) AS doc_id FROM fp
           WHERE doc_id % 2 <> 0 GROUP BY fp
           HAVING fp NOT IN (SELECT fp FROM sur1)
              AND fp NOT IN (SELECT fp FROM acc3))
         SELECT doc_id FROM sur1
         UNION ALL SELECT doc_id FROM acc3
         UNION ALL SELECT doc_id FROM acc4""",
    // Mirrors q165: the full perceptual sketch recomputed from the
    // same bytes (frames -> md5 -> bit-vote), then banded pairs.
    "q165_phash_neardup" -> (phashSketchCte +
      """ SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""),
    // Mirrors q166: cross-slice perceptual matches (the banded probe
    // has exact pigeonhole recall at hamming <= 3, so the oracle is
    // the plain cross join).
    "q166_phash_incremental" -> (phashSketchCte +
      """ SELECT n.doc_id AS d_new, i.doc_id AS d_idx,
             CAST(bit_count(xor(n.simhash, i.simhash)) AS INT) AS hamming
           FROM sh n, sh i
           WHERE n.doc_id % 2 = 0 AND i.doc_id % 3 = 0
             AND bit_count(xor(n.simhash, i.simhash)) <= 3"""),
    // Mirrors q167: q42's decoded dims + q43's quality formula, the
    // same per-row gate.
    "q167_multimodal_pair_curation" ->
      """WITH hx AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                md5(text) AS m FROM documents),
         hh AS (SELECT doc_id, n_bytes,
                list_reduce(list_transform(range(1, 16),
                  i -> (strpos('0123456789abcdef', substring(m, i, 1))
                        - 1)::BIGINT),
                  (a, b) -> a * 16 + b) AS h
                FROM hx),
         q AS (SELECT doc_id,
           least(length(text) / 500.0, 1.0) * 0.4
           + (CASE WHEN (CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / (length(text) - length(replace(text, ' ', '')) + 1))
                BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.4
           + (CASE WHEN len(list_filter(string_split(text, ' '),
                w -> w IN ('the','of','and','to','a','in','is'))) > 0
                THEN 1.0 ELSE 0.5 END) * 0.2 AS quality
           FROM documents)
         SELECT hh.doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           (h % 1920) + 1 AS width, ((h >> 17) % 1080) + 1 AS height,
           quality
         FROM hh JOIN q USING (doc_id)
         WHERE quality >= 0.8
           AND (h % 1920) + 1 <= 4 * (((h >> 17) % 1080) + 1)
           AND ((h >> 17) % 1080) + 1 <= 4 * ((h % 1920) + 1)""",
    // Mirrors q168: the two-batch perceptual curation algebra —
    // batch 1 (%3==0) collapses its hamming<=3 connected clusters to
    // min-id survivors (all accepted: the index is empty); batch 2
    // (the full table) collapses likewise, then survivors within
    // hamming 3 of ANY batch-1 accepted sketch drop (re-appended
    // copies sketch identically and always drop).
    "q168_perceptual_curation_mv" -> ("WITH RECURSIVE " + phashSketchBody +
      """,
         b1 AS (SELECT doc_id, simhash FROM sh WHERE doc_id % 3 = 0),
         e1 AS (SELECT a.doc_id AS d1, b.doc_id AS d2
                FROM b1 a JOIN b1 b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         e1s AS (SELECT d1 AS a, d2 AS b FROM e1
                 UNION ALL SELECT d2, d1 FROM e1),
         cc1 AS (SELECT doc_id, doc_id AS lbl FROM b1
                 UNION
                 SELECT e.b, c.lbl FROM cc1 c JOIN e1s e
                   ON e.a = c.doc_id),
         acc1 AS (SELECT doc_id, simhash FROM b1
                  WHERE doc_id NOT IN (SELECT doc_id FROM cc1
                    WHERE lbl < doc_id)),
         b2 AS (SELECT doc_id, simhash FROM sh),
         e2 AS (SELECT a.doc_id AS d1, b.doc_id AS d2
                FROM b2 a JOIN b2 b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         e2s AS (SELECT d1 AS a, d2 AS b FROM e2
                 UNION ALL SELECT d2, d1 FROM e2),
         cc2 AS (SELECT doc_id, doc_id AS lbl FROM b2
                 UNION
                 SELECT e.b, c.lbl FROM cc2 c JOIN e2s e
                   ON e.a = c.doc_id),
         sur2 AS (SELECT doc_id, simhash FROM b2
                  WHERE doc_id NOT IN (SELECT doc_id FROM cc2
                    WHERE lbl < doc_id)),
         acc2 AS (SELECT s.doc_id FROM sur2 s
                  WHERE NOT EXISTS (SELECT 1 FROM acc1 i
                    WHERE bit_count(xor(s.simhash, i.simhash)) <= 3))
         SELECT doc_id FROM acc1
         UNION ALL SELECT doc_id FROM acc2"""),
    // Mirrors q169: exact set-Jaccard over distinct frame hashes,
    // pairs generated from shared frames (inter >= 1 is implied by
    // jaccard >= 0.5). The full exact comparison — the engine's
    // MinHash-banded candidates + verify must reproduce it.
    "q169_frame_jaccard_neardup" -> (phashFrameCte +
      """,
         cnt AS (SELECT doc_id, count(*) AS n FROM fh GROUP BY 1),
         e AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter,
                  ca.n AS n1, cb.n AS n2
               FROM fh a JOIN fh b ON a.f = b.f AND a.doc_id < b.doc_id
               JOIN cnt ca ON ca.doc_id = a.doc_id
               JOIN cnt cb ON cb.doc_id = b.doc_id
               GROUP BY 1, 2, ca.n, cb.n)
         SELECT d1, d2, inter,
                inter::DOUBLE / (n1 + n2 - inter) AS jaccard
         FROM e WHERE inter::DOUBLE / (n1 + n2 - inter) >= 0.5"""),
    // Mirrors q170: the cross-slice frame-set comparison (self-pairs
    // included for %6==0 docs, the q84 convention).
    "q170_frame_jaccard_incremental" -> (phashFrameCte +
      """,
         cnt AS (SELECT doc_id, count(*) AS n FROM fh GROUP BY 1),
         pairs AS (SELECT a.doc_id AS d_new, b.doc_id AS d_idx,
                   count(*) AS inter
                   FROM fh a JOIN fh b ON a.f = b.f
                     AND a.doc_id % 2 = 0 AND b.doc_id % 3 = 0
                   GROUP BY 1, 2)
         SELECT d_new, d_idx, inter,
                inter::DOUBLE / (ca.n + cb.n - inter) AS jaccard
         FROM pairs JOIN cnt ca ON ca.doc_id = d_new
         JOIN cnt cb ON cb.doc_id = d_idx
         WHERE inter::DOUBLE / (ca.n + cb.n - inter) >= 0.5"""),
    // Mirrors q160: per-partition totals and per-snapshot referenced
    // row counts recomputed from raw data — v1 all rows, v2 adds the
    // shifted non-view batch, v3's copy-on-write delete removes
    // exactly v1's error rows.
    "q160_meta_tables" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
           FROM events),
         b2 AS (SELECT event_id + 1000000000 AS event_id, user_id,
             event_type, value
           FROM base WHERE event_type <> 'view'),
         allr AS (SELECT * FROM base UNION ALL SELECT * FROM b2),
         fin AS (SELECT * FROM allr
           WHERE NOT (event_type = 'error' AND event_id < 1000000000)),
         parts AS (SELECT 'partition' AS kind,
             'event_type=' || event_type AS key,
             count(*) AS row_count
           FROM fin GROUP BY event_type),
         snaps AS (
           SELECT 'snapshot' AS kind, 'v0:create' AS key,
             0::BIGINT AS row_count
           UNION ALL SELECT 'snapshot', 'v1:append',
             (SELECT count(*) FROM base)
           UNION ALL SELECT 'snapshot', 'v2:append',
             (SELECT count(*) FROM allr)
           UNION ALL SELECT 'snapshot', 'v3:delete',
             (SELECT count(*) FROM fin))
         SELECT kind, key, row_count FROM parts
         UNION ALL SELECT kind, key, row_count FROM snaps""",
    // Mirrors q161: the net row algebra of forget + late append +
    // MOR upsert. Deletes = forgotten users' baseline rows plus the
    // old versions of surviving upserted clicks; inserts = the late
    // batch (whole — appended after the delete's sequence) plus the
    // adjusted click rows.
    "q161_changelog" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
           FROM events),
         forg AS (SELECT * FROM base WHERE user_id % 53 = 7),
         sclk AS (SELECT * FROM base
           WHERE event_type = 'click' AND event_id % 4 = 0
             AND user_id % 53 <> 7),
         dels AS (SELECT * FROM forg UNION ALL SELECT * FROM sclk),
         late AS (SELECT event_id + 2000000000 AS event_id, user_id,
             'late' AS event_type, value
           FROM base WHERE event_type = 'purchase' AND event_id % 9 = 0),
         adj AS (SELECT event_id, user_id, 'adjusted' AS event_type,
             value * 2 AS value FROM sclk),
         ins AS (SELECT * FROM late UNION ALL SELECT * FROM adj)
         SELECT 'delete' AS _change_type, event_type, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
             AS DOUBLE) AS sum_value
         FROM dels GROUP BY event_type
         UNION ALL
         SELECT 'insert', event_type, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
             AS DOUBLE) AS sum_value
         FROM ins GROUP BY event_type""",
    // Mirrors q159: the three WAP phases recomputed in SQL.
    "q159_wap_branch" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
           FROM events),
         b1 AS (SELECT * FROM base WHERE event_type <> 'purchase'),
         staged AS (SELECT * FROM b1 WHERE event_type <> 'view'
           UNION ALL
           SELECT * FROM base WHERE event_type = 'purchase'),
         late AS (SELECT event_id + 4000000000 AS event_id, user_id,
             'late' AS event_type, value
           FROM base WHERE event_type = 'error' AND event_id % 7 = 0),
         pub AS (SELECT * FROM staged UNION ALL SELECT * FROM late),
         a AS (SELECT 'main_pinned' AS phase, event_type,
             count(*) AS n,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
               AS DOUBLE) AS sum_value
           FROM b1 GROUP BY event_type),
         b AS (SELECT 'staged' AS phase, event_type, count(*) AS n,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
               AS DOUBLE) AS sum_value
           FROM staged GROUP BY event_type),
         c AS (SELECT 'published' AS phase, event_type, count(*) AS n,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
               AS DOUBLE) AS sum_value
           FROM pub GROUP BY event_type)
         SELECT phase, event_type, n, sum_value FROM a
         UNION ALL SELECT phase, event_type, n, sum_value FROM b
         UNION ALL SELECT phase, event_type, n, sum_value FROM c""",
    // Mirrors q152: the same 3-day window, epochs invisible.
    "q158_spec_evolution" ->
      """WITH lo AS (SELECT
             (epoch_us(min(ts)) // 86400000000 + 2) * 86400000000 AS a,
             (epoch_us(min(ts)) // 86400000000 + 5) * 86400000000 AS b
           FROM events)
         SELECT event_type, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
             AS DOUBLE) AS sum_value
         FROM events, lo
         WHERE epoch_us(ts) >= a AND epoch_us(ts) < b
         GROUP BY event_type""",
    // Mirrors q156: the tagged snapshot IS the first batch, whatever
    // the table did afterwards.
    "q156_snapshot_tag" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS sum_price
         FROM lineitem WHERE l_orderkey % 3 = 0
         GROUP BY l_returnflag""",
    // Mirrors q155: pre-delete rows of users outside the forget set,
    // plus the ENTIRE late batch (appended after the equality delete,
    // so out of its sequence scope even for forgotten users).
    "q155_eq_delete" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
           FROM events),
         kept AS (SELECT * FROM base WHERE user_id % 97 <> 3),
         late AS (SELECT event_id + 3000000000 AS event_id, user_id,
             'late' AS event_type, value
           FROM base
           WHERE event_type = 'purchase' AND event_id % 13 = 0),
         allr AS (SELECT * FROM kept UNION ALL SELECT * FROM late)
         SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM allr GROUP BY event_type""",
    // Mirrors q157: two sequential MOR merges replayed in plain SQL —
    // each merge is source UNION ALL (prior state anti-joined on the
    // source's keys); the second source overlaps the first, so
    // last-writer-wins must cross merge generations.
    "q157_mor_upsert" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
           FROM events),
         m1 AS (SELECT event_id, user_id, 'adjusted' AS event_type,
             value * 2 AS value
           FROM base WHERE event_type = 'purchase' AND event_id % 5 = 0),
         s1 AS (SELECT * FROM m1
           UNION ALL
           SELECT * FROM base
           WHERE event_id NOT IN (SELECT event_id FROM m1)),
         m2 AS (SELECT event_id, user_id, 'readjusted' AS event_type,
             value * 5 AS value
           FROM base WHERE event_type = 'purchase' AND event_id % 10 = 0
           UNION ALL
           SELECT event_id + 1000000000, user_id, 'backfill', value
           FROM base WHERE event_type = 'purchase' AND event_id % 7 = 0),
         s2 AS (SELECT * FROM m2
           UNION ALL
           SELECT * FROM s1
           WHERE event_id NOT IN (SELECT event_id FROM m2))
         SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM s2 GROUP BY event_type""",
    // Mirrors q151: rows surviving both positional deletes, plus the
    // late append (committed AFTER the deletes, so never filtered).
    "q151_mor_delete" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
           FROM events),
         kept AS (SELECT * FROM base
           WHERE event_type IS DISTINCT FROM 'view'
             AND event_id % 3 <> 0),
         late AS (SELECT event_id + 2000000000 AS event_id, user_id,
             'late' AS event_type, value
           FROM base
           WHERE event_type = 'purchase' AND event_id % 11 = 0),
         allr AS (SELECT * FROM kept UNION ALL SELECT * FROM late)
         SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM allr GROUP BY event_type""",
    "q75_lake_row_ops" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
           FROM events),
         afterdel AS (SELECT * FROM base
           WHERE event_type IS DISTINCT FROM 'view'),
         src AS (
           SELECT event_id, user_id, 'adjusted' AS event_type,
             value * 2 AS value
           FROM base WHERE event_type = 'purchase' AND event_id % 5 = 0
           UNION ALL
           SELECT event_id + 1000000000, user_id, 'backfill', value
           FROM base WHERE event_type = 'purchase' AND event_id % 7 = 0),
         merged AS (
           SELECT * FROM src
           UNION ALL
           SELECT a.* FROM afterdel a WHERE NOT EXISTS
             (SELECT 1 FROM src WHERE src.event_id = a.event_id))
         SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM merged GROUP BY 1""",
    // session_window's overlap rule: ts exactly at prev + gap opens a
    // NEW session, hence >= (q47's batch rule uses > — both graded)
    "q74_stream_sessions" ->
      """WITH g AS (SELECT user_id, ts, event_id, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_ts FROM events),
         s AS (SELECT *, CASE WHEN prev_ts IS NULL
             OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END
             AS new_sess FROM g),
         t AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS sess_id FROM s)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM t GROUP BY user_id, sess_id""",
    "q73_stream_interval_join" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
         max(p.value) AS value
         FROM events p JOIN events c ON c.user_id = p.user_id
           AND p.event_type = 'purchase' AND c.event_type = 'click'
           AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         GROUP BY 1""",
    // Mirrors q171: LEFT JOIN — count(c.user_id) skips the null
    // matches, so click-less purchases report n_clicks = 0.
    "q171_stream_outer_join" ->
      """SELECT p.event_id AS purchase_id, count(c.user_id) AS n_clicks,
         max(p.value) AS value
         FROM events p LEFT JOIN events c ON c.user_id = p.user_id
           AND c.event_type = 'click'
           AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         WHERE p.event_type = 'purchase'
         GROUP BY 1""",
    "q97_stream_join_mv" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
         max(p.value) AS value
         FROM events p JOIN events c ON c.user_id = p.user_id
           AND p.event_type = 'purchase' AND c.event_type = 'click'
           AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         GROUP BY 1""",
    "q83_arrow_stream_loop" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
         count(event_id) AS n_ids
         FROM events GROUP BY 1""",
    "q72_arrow_roundtrip" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
         count(DISTINCT user_id) AS n_users,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
         FROM events GROUP BY 1""",
    // bin of a doc = floor(tokens-before-it / 512) in (source, doc_id)
    // order — the naive window form of the distributed prefix-sum
    "q81_sequence_packing" ->
      """WITH tk AS (SELECT source, doc_id,
           len(regexp_extract_all(lower(text),
             '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS t
           FROM documents),
         c AS (SELECT source, doc_id, t, sum(t) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum FROM tk)
         SELECT source, CAST((cum - t) // 512 AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS sum_tokens
         FROM c GROUP BY 1, 2""",
    "q82_doc_chunks" ->
      """SELECT doc_id, CAST(s // 150 AS BIGINT) AS chunk_id,
           substr(text, CAST(s AS BIGINT) + 1, 200) AS chunk_text
         FROM documents, UNNEST(generate_series(0, length(text) - 1, 150))
           AS g(s)
         WHERE length(text) > 0""",
    // full cross-slice exact Jaccard: every (new, indexed) pair at
    // >= 0.5 — the LSH-bucketed incremental path must find them all
    "q84_neardup_incremental" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pairs AS (SELECT a.doc_id AS d_new, b.doc_id AS d_idx,
                   count(*) AS inter
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                     AND a.doc_id % 2 = 0 AND b.doc_id % 3 = 0
                   GROUP BY 1, 2)
         SELECT d_new, d_idx, inter,
                inter::DOUBLE / (ca.n + cb.n - inter) AS jaccard
         FROM pairs JOIN cnt ca ON ca.doc_id = d_new
         JOIN cnt cb ON cb.doc_id = d_idx
         WHERE inter::DOUBLE / (ca.n + cb.n - inter) >= 0.5""",
    "q86_lake_point_lookup" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE doc_id IN (7, 123, 321, 444)""",
    // two-batch evolution of the near-dup curation MV: a1 = batch-1
    // exact winners (empty index -> no near-dup drops); f2 = batch-2
    // exact-fresh winners; nd = f2 docs whose exact shingle jaccard vs
    // ANY a1 doc reaches 0.5 (the LSH path must find them all)
    // strengthened round-6 contract: near-dup clusters WITHIN each
    // batch collapse to their min doc_id (recursive-CTE connected
    // components over the exact-jaccard pair graph), the fp frontier
    // advances with ACCEPTED docs only, and batch-2 survivors are
    // checked against batch-1's accepted docs — the full two-batch
    // evolution of curateStepNearDup in SQL
    "q87_curation_neardup_mv" ->
      """WITH RECURSIVE fp AS (SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
           FROM documents),
         words AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         b1 AS (SELECT fp, min(doc_id) AS doc_id FROM fp
                WHERE doc_id % 3 = 0 GROUP BY fp),
         e1 AS (SELECT a.doc_id AS d1, b.doc_id AS d2
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                JOIN cnt ca ON ca.doc_id = a.doc_id
                JOIN cnt cb ON cb.doc_id = b.doc_id
                WHERE a.doc_id IN (SELECT doc_id FROM b1)
                  AND b.doc_id IN (SELECT doc_id FROM b1)
                  AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id, ca.n, cb.n
                HAVING count(*)::DOUBLE / (ca.n + cb.n - count(*))
                  >= 0.5),
         e1s AS (SELECT d1 AS a, d2 AS b FROM e1
                 UNION ALL SELECT d2, d1 FROM e1),
         cc1 AS (SELECT doc_id, doc_id AS lbl FROM b1
                 UNION
                 SELECT e.b, c.lbl FROM cc1 c JOIN e1s e
                   ON e.a = c.doc_id),
         acc1 AS (SELECT fp, doc_id FROM b1
                  WHERE doc_id NOT IN (SELECT doc_id FROM cc1
                    WHERE lbl < doc_id)),
         f2 AS (SELECT fp, min(doc_id) AS doc_id FROM fp
                WHERE fp NOT IN (SELECT fp FROM acc1) GROUP BY fp),
         e2 AS (SELECT a.doc_id AS d1, b.doc_id AS d2
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                JOIN cnt ca ON ca.doc_id = a.doc_id
                JOIN cnt cb ON cb.doc_id = b.doc_id
                WHERE a.doc_id IN (SELECT doc_id FROM f2)
                  AND b.doc_id IN (SELECT doc_id FROM f2)
                  AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id, ca.n, cb.n
                HAVING count(*)::DOUBLE / (ca.n + cb.n - count(*))
                  >= 0.5),
         e2s AS (SELECT d1 AS a, d2 AS b FROM e2
                 UNION ALL SELECT d2, d1 FROM e2),
         cc2 AS (SELECT doc_id, doc_id AS lbl FROM f2
                 UNION
                 SELECT e.b, c.lbl FROM cc2 c JOIN e2s e
                   ON e.a = c.doc_id),
         sur2 AS (SELECT doc_id FROM f2
                  WHERE doc_id NOT IN (SELECT doc_id FROM cc2
                    WHERE lbl < doc_id)),
         nd AS (SELECT a.doc_id AS d_new
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                JOIN cnt ca ON ca.doc_id = a.doc_id
                JOIN cnt cb ON cb.doc_id = b.doc_id
                WHERE a.doc_id IN (SELECT doc_id FROM sur2)
                  AND b.doc_id IN (SELECT doc_id FROM acc1)
                GROUP BY a.doc_id, b.doc_id, ca.n, cb.n
                HAVING count(*)::DOUBLE / (ca.n + cb.n - count(*))
                  >= 0.5)
         SELECT doc_id FROM acc1
         UNION ALL
         SELECT doc_id FROM sur2
         WHERE doc_id NOT IN (SELECT d_new FROM nd)""",
    // sequential-batch semantics: a fp seen in the %3==0 first commit
    // keeps its batch-1 winner (min id within the slice); fps arriving
    // only in the second commit take their global min id
    "q85_curation_mv" ->
      """WITH fp AS (SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
           FROM documents)
         SELECT coalesce(min(doc_id) FILTER (WHERE doc_id % 3 = 0),
                         min(doc_id)) AS doc_id
         FROM fp GROUP BY fp""",
    "q71_incremental_dedup" ->
      """WITH fp AS (SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
           FROM documents),
         newb AS (SELECT fp, min(doc_id) AS doc_id FROM fp
           WHERE doc_id % 2 = 0 GROUP BY fp)
         SELECT fp, doc_id FROM newb n
         WHERE NOT EXISTS (SELECT 1 FROM fp o
           WHERE o.doc_id % 3 = 0 AND o.fp = n.fp)""",
    "q48_percentiles" ->
      """SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.5) AS median_price,
         quantile_cont(o_totalprice, 0.9) AS p90_price,
         quantile_cont(o_totalprice, 0.99) AS p99_price,
         count(*) AS n FROM orders GROUP BY 1""",
    "q49_stats_agg" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS sx,
           CAST(CAST(sum(CAST(l_extendedprice * l_extendedprice
             AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sxx,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq,
           CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqq,
           CAST(CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqx,
           CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sd,
           CAST(CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS st,
           CAST(CAST(sum(CAST(l_discount * l_tax AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS sdt
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_price,
           (sqq - sq * sq / n) / (n - 1) AS var_qty,
           (sqx - sq * sx / n) /
             sqrt((sqq - sq * sq / n) * (sxx - sx * sx / n))
             AS qty_price_corr,
           (sdt - sd * st / n) / (n - 1) AS disc_tax_cov
         FROM m""",
    "q47_sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_ts FROM events),
         s AS (SELECT *, CASE WHEN prev_ts IS NULL
             OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END
             AS new_sess FROM g),
         t AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS BIGINT) AS sess_id FROM s)
         SELECT user_id, sess_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM t GROUP BY 1, 2""",
    "q46_window_stats" ->
      """SELECT o_custkey, o_orderkey,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cume,
         first_value(o_totalprice) OVER wf AS cheapest,
         last_value(o_totalprice) OVER wf AS priciest
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey),
                wf AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)""",
    "q28_datetime_funcs" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
         count(*) AS n,
         avg(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01'))
           AS avg_days,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           AS revenue
         FROM orders GROUP BY 1, 2""",
    "q29_math_funcs" ->
      """SELECT l_returnflag,
         CAST(CAST(sum(CAST(sqrt(l_quantity) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_sqrt_qty,
         CAST(CAST(sum(CAST(ln(l_extendedprice) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) AS sum_ln_price,
         max(pow(l_discount, 2)) AS max_disc_sq,
         min(abs(l_tax - 0.04)) AS min_tax_dev,
         CAST(CAST(sum(CAST(greatest(l_quantity, 25.0) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty_floor25
         FROM lineitem GROUP BY l_returnflag""",
    "q25_fuzzy_levenshtein" ->
      """SELECT name_prefix, count(*) AS n_pairs, avg(dist) AS avg_dist,
         CAST(max(dist) AS INTEGER) AS max_dist
         FROM (SELECT substring(a.p_name, 1, 8) AS name_prefix,
                      levenshtein(a.p_name, b.p_name) AS dist
               FROM part a JOIN part b
                 ON substring(a.p_name, 1, 8) = substring(b.p_name, 1, 8)
                 AND a.p_partkey < b.p_partkey
               WHERE levenshtein(a.p_name, b.p_name) <= 4)
         GROUP BY 1""",
    "q26_array_funcs" ->
      """SELECT l_orderkey, CAST(len(qs) AS INTEGER) AS n_items,
         qs[1] AS min_qty, qs[-1] AS max_qty, list_sum(qs) AS sum_qty
         FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
               FROM lineitem GROUP BY l_orderkey)""",
    "q27_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 200000
         EXCEPT ALL
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""",
    "q30_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents GROUP BY text""",
    "q31_dedup_norm" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents
         GROUP BY trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))""",
    "q32_neardup_jaccard" -> trueJaccardOracle,
    // identical oracle: LSH + exact verification must reproduce the
    // exact pipeline's answer (recall 1 at the fixtures' separation)
    "q33_neardup_minhash" -> trueJaccardOracle,
    "q183_sql_minhash_dedup" -> trueJaccardOracle,
    "q184_sql_cosine_topk" ->
      """SELECT e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[],
           q.embedding::DOUBLE[]) AS cos
         FROM embeddings e,
              (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         WHERE e.vec_id <> 0 ORDER BY cos DESC, e.vec_id LIMIT 10""",
    "q185_sql_spec_evolution" ->
      """SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events
         WHERE ts >= (SELECT min(ts) FROM events)
           AND ts < (SELECT min(ts) + INTERVAL 12 HOUR FROM events)
         GROUP BY event_type""",
    "q34_simhash_pairs" -> (simHashSketchCte +
      """ SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""),
    "q95_simhash_incremental" -> (simHashSketchCte +
      """ SELECT n.doc_id AS d_new, i.doc_id AS d_idx,
             CAST(bit_count(xor(n.simhash, i.simhash)) AS INT) AS hamming
           FROM sh n, sh i
           WHERE n.doc_id % 2 = 0 AND i.doc_id % 3 = 0
             AND bit_count(xor(n.simhash, i.simhash)) <= 3"""),
    "q42_multimodal_features" ->
      // replicates fakeDecode: h = first 15 hex chars of md5 (60 bits,
      // parsed via list_reduce over hex digits), features/dims derived
      // by shifts+mod — integer-exact in both engines
      """WITH hx AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                md5(text) AS m FROM documents),
         hh AS (SELECT doc_id, n_bytes,
                list_reduce(list_transform(range(1, 16),
                  i -> (strpos('0123456789abcdef', substring(m, i, 1))
                        - 1)::BIGINT),
                  (a, b) -> a * 16 + b) AS h
                FROM hx)
         SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           h AS content_hash,
           (h % 1920) + 1 AS width, ((h >> 17) % 1080) + 1 AS height,
           CAST(CAST(((h >> 0) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f0,
           CAST(CAST(((h >> 7) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f1,
           CAST(CAST(((h >> 14) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f2,
           CAST(CAST(((h >> 21) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f3,
           CAST(CAST(((h >> 28) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f4,
           CAST(CAST(((h >> 35) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f5,
           CAST(CAST(((h >> 42) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f6,
           CAST(CAST(((h >> 49) % 1000000) / 1000000.0 AS REAL) AS DOUBLE) AS f7
         FROM hh""",
    "q56_neardup_clusters" ->
      """WITH RECURSIVE
         words AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM words, UNNEST(generate_series(1, len(w)-2)) AS t(i)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                  AND a.doc_id < b.doc_id GROUP BY 1, 2),
         pairs AS (SELECT d1, d2 FROM pr
                   JOIN cnt ca ON ca.doc_id = d1
                   JOIN cnt cb ON cb.doc_id = d2
                   WHERE inter::DOUBLE / (ca.n + cb.n - inter) >= 0.8),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         reach AS (SELECT a AS node, b AS r FROM edges
                   UNION
                   SELECT re.node, e.b FROM reach re
                   JOIN edges e ON re.r = e.a),
         labels AS (SELECT node, least(node, min(r)) AS cluster_id
                    FROM reach GROUP BY node)
         SELECT cluster_id, count(*) AS n_docs FROM labels GROUP BY 1""",
    "q35_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
           AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / (length(text) - length(replace(text, ' ', '')) + 1)
           AS avg_word_len
         FROM documents""",
    "q36_token_count" ->
      """SELECT source, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         avg(n_tokens) AS avg_tokens FROM (
           SELECT source, len(regexp_extract_all(lower(text),
             '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tokens FROM documents)
         GROUP BY source""",
    "q37_lang_id" ->
      """SELECT doc_id, CASE
           WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred
         FROM (SELECT doc_id,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('the','of','and','to','a','in','is'))) AS s_en,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('der','die','das','und','ist','nicht','ein'))) AS s_de,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('el','la','de','que','y','los','un'))) AS s_es,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('le','la','et','les','des','une','est'))) AS s_fr
           FROM documents)""",
    "q38_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
         FROM documents""",
    // the literal Rabin-Karp fold of TextFunctions.rollingFingerprint:
    // word-level base-131 over char-level base-31 word hashes, mod
    // 2^31-1 — pure integer arithmetic, so the oracle recomputes the
    // fingerprint bit-for-bit (list_reduce accumulates through VARCHAR
    // because DuckDB lambdas unify accumulator/element types)
    "q44_rolling_fingerprint" ->
      """SELECT doc_id,
         list_reduce(list_prepend('0', string_split(text, ' ')),
           (acc, w) -> ((acc::BIGINT * 131 + list_reduce(
               list_prepend('0', list_transform(range(1, length(w)+1),
                 i -> unicode(substr(w, i, 1))::VARCHAR)),
               (a, c) -> ((a::BIGINT * 31 + c::BIGINT)
                 % 2147483647)::VARCHAR)::BIGINT)
             % 2147483647)::VARCHAR)::BIGINT AS rolling_fp
         FROM documents""",
    "q43_quality_score" ->
      """SELECT doc_id,
         least(length(text) / 500.0, 1.0) * 0.4
         + (CASE WHEN (CAST(length(replace(text, ' ', '')) AS DOUBLE)
              / (length(text) - length(replace(text, ' ', '')) + 1))
              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.4
         + (CASE WHEN len(list_filter(string_split(text, ' '),
              w -> w IN ('the','of','and','to','a','in','is'))) > 0
              THEN 1.0 ELSE 0.5 END) * 0.2 AS quality
         FROM documents""",
    "q39_cosine_topk" ->
      """SELECT e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[],
           q.embedding::DOUBLE[]) AS cos
         FROM embeddings e,
              (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         WHERE e.vec_id <> 0 ORDER BY cos DESC, e.vec_id LIMIT 10""",
    // The band predicate is the literal SQL form of the Spark-side LSH
    // candidate join (8 bands x 8 axis-sign bits, seed-free — DuckDB
    // list indexing is 1-based), so the oracle checks candidate
    // generation AND verification exactly.
    "q40_embedding_neardup" ->
      s"""SELECT a.vec_id AS v1, b.vec_id AS v2,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE ${(0 until 8).map(k => (0 until 8).map { j =>
           val i = k * 8 + j + 1
           s"(a.embedding[$i] >= 0) = (b.embedding[$i] >= 0)"
         }.mkString("(", " AND ", ")")).mkString("(", "\n            OR ", ")")}
         AND list_cosine_similarity(a.embedding::DOUBLE[],
           b.embedding::DOUBLE[]) >= 0.35""",
    "q121_pq_topk" -> pqTopKOracle,
    // identical answer by construction: same codebooks, same ADC
    "q126_pq_persisted" -> pqTopKOracle,
    "q128_pq_batch" -> pqBatchOracle,
    "q132_ann_ivf_portable" -> ivfPortableOracle,
    "q133_ann_lsh_portable" -> lshPortableOracle,
    "q154_ann_lsh_wide" -> lshWideOracle,
    // the IVF-PQ composition: q132's assignment/probe CTEs restrict
    // q121's encode+ADC CTEs to the probed clusters
    "q137_ivfpq_persisted" -> ivfPqOracle,
    "q140_ivfpq_batch" -> ivfPqBatchOracle,
    "q149_ivfpq_refined" -> ivfPqRefinedOracle,
    "q153_ivfpq_refined_l2" -> ivfPqRefinedL2Oracle,
    "q141_hard_negatives" -> hardNegativesOracle,
    "q145_rag_retrieve" -> ragRetrieveOracle,
    "q146_filtered_ann" -> filteredAnnOracle,
    "q147_rag_diverse" -> ragDiverseOracle,
    // the MV converges to the same inverted lists as a from-scratch
    // buildIndex, so q132's oracle grades the continuous loop
    "q138_vector_index_mv" -> ivfPortableOracle,
    "q139_hybrid_rrf" -> hybridRrfOracle,
    "q148_hybrid_rrf_batch" -> hybridRrfBatchOracle,
    // Identical math to q125 (the persisted index changes WHERE the
    // statistics come from, not what they are), decimal-banded like
    // q131 so the serving plan's visit order can't reach the hash.
    "q135_bm25_persisted" -> bm25PersistedOracle,
    // the MV converges to the same index as a from-scratch build,
    // so the same oracle grades the continuous-maintenance loop
    "q136_lexical_index_mv" -> bm25PersistedOracle,
    // q123's score pipeline with the DECIMAL(18,12) banding, then the
    // explicit equal-depth band formula floor(rank*3/N) over
    // (score DESC, doc_id) — deliberately NOT ntile, whose remainder
    // spread is an engine convention rather than arithmetic.
    "q134_quality_buckets" ->
      """WITH toks AS (SELECT doc_id, u.w AS word
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents), unnest(ws) AS u(w)
             WHERE u.w != ''),
         lm AS (SELECT word,
                ln(count(*) / (SELECT count(*)::DOUBLE FROM toks)) AS lp
                FROM toks GROUP BY word),
         sc AS (SELECT t.doc_id,
                CAST(CAST(sum(CAST(l.lp AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)
                  / count(*) AS score
                FROM toks t JOIN lm l ON t.word = l.word
                GROUP BY t.doc_id),
         rk AS (SELECT doc_id, score,
                row_number() OVER (ORDER BY score DESC, doc_id) - 1
                  AS rank
                FROM sc)
         SELECT doc_id, score,
                CAST((rank * 3) // (SELECT count(*) FROM sc) AS INT)
                  AS bucket
         FROM rk""",
    // q125's pipeline with a (query_id, word) query side and a
    // per-query window top-k; the per-row score term is the same
    // left-associative double chain, summed as DECIMAL(18,12) so the
    // total is order-independent in both engines (q105 pattern).
    "q131_bm25_batch" ->
      """WITH toks AS (SELECT doc_id, u.w AS word
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents), unnest(ws) AS u(w)
             WHERE u.w != ''),
         tf AS (SELECT doc_id, word, count(*) AS tf
                FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         idf AS (SELECT word,
                ln(1.0 + ((SELECT count(*)::DOUBLE FROM documents)
                          - count(*) + 0.5) / (count(*) + 0.5)) AS idf
                FROM tf GROUP BY word),
         q AS (SELECT doc_id AS query_id, word FROM tf
               WHERE doc_id IN (0, 1, 2)),
         sc AS (SELECT q.query_id, t.doc_id,
                CAST(CAST(sum(CAST(i.idf * (t.tf * 2.2::DOUBLE) /
                    (t.tf + 1.2 * (0.25 + 0.75 * d.dl /
                      (SELECT avg(dl) FROM dl)))
                  AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS score
                FROM tf t JOIN q ON t.word = q.word
                JOIN idf i ON t.word = i.word
                JOIN dl d ON t.doc_id = d.doc_id
                WHERE t.doc_id <> q.query_id
                GROUP BY q.query_id, t.doc_id),
         ranked AS (SELECT query_id, doc_id, score,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rn
                FROM sc)
         SELECT query_id, doc_id, score FROM ranked WHERE rn <= 5""",
    // Mirrors CorpusOps.dsirSelect: md5-bucketed unigram features,
    // add-one-smoothed target/raw distributions, per-doc sum of
    // bucket log-ratios over RAW docs, exact top-100. The 1024.0
    // literal forces double division exactly as the Spark side's
    // double cast does.
    "q129_dsir_selection" ->
      """WITH toks AS (SELECT doc_id, doc_id % 7 = 0 AS t,
               ('0x' || substr(md5(u.w), 1, 8))::UBIGINT % 1024 AS bucket
             FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                   FROM documents), unnest(ws) AS u(w)
             WHERE u.w != ''),
         cnt AS (SELECT bucket,
               sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
               sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS cr
             FROM toks GROUP BY bucket),
         tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt),
         lr AS (SELECT bucket,
               CAST(ln((ct + 1) / (tt + 1024.0)) -
                    ln((cr + 1) / (tr + 1024.0)) AS DECIMAL(18,9)) AS lr
             FROM cnt, tot),
         w AS (SELECT k.doc_id, CAST(CAST(sum(l.lr) AS VARCHAR) AS DOUBLE) AS weight,
               count(*) AS n_tokens
             FROM toks k JOIN lr l ON k.bucket = l.bucket
             WHERE NOT k.t GROUP BY k.doc_id)
         SELECT doc_id, weight, n_tokens FROM w
         ORDER BY weight DESC, doc_id LIMIT 100""",
    // Mirrors DedupOps.repeatedSpans with n=8: same md5 window hash
    // (unsigned here, two's-complement on the Spark side — different
    // VALUES, identical equality classes, and the hash never reaches
    // the output), same >= 2 duplicate rule, same cumulative-max
    // interval union. Integer-only output.
    "q130_repeated_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents),
         pos AS (SELECT doc_id, i - 1 AS pos,
               ('0x' || substr(md5(array_to_string(ws[i:i+7], ' ')),
                 1, 16))::UBIGINT AS sh
             FROM d, unnest(generate_series(1, len(ws) - 7)) AS t(i)
             WHERE len(ws) >= 8),
         dup AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) >= 2),
         m AS (SELECT p.doc_id, p.pos FROM pos p JOIN dup USING (sh)),
         g AS (SELECT doc_id, pos,
               CASE WHEN max(pos + 8) OVER
                   (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
                 OR pos > max(pos + 8) OVER
                   (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS ns
             FROM m),
         sp AS (SELECT doc_id, pos, sum(ns) OVER
                 (PARTITION BY doc_id ORDER BY pos) AS span_id
             FROM g),
         spans AS (SELECT doc_id, span_id, min(pos) AS s,
               max(pos) + 8 AS e
             FROM sp GROUP BY doc_id, span_id)
         SELECT doc_id, count(*) AS n_spans,
               CAST(sum(e - s) AS BIGINT) AS dup_tokens
         FROM spans GROUP BY doc_id""",
    "q125_bm25_retrieval" ->
      """WITH toks AS (SELECT doc_id, u.w AS word
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents), unnest(ws) AS u(w)
             WHERE u.w != ''),
         tf AS (SELECT doc_id, word, count(*) AS tf
                FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         idf AS (SELECT word,
                ln(1.0 + ((SELECT count(*)::DOUBLE FROM documents)
                          - count(*) + 0.5) / (count(*) + 0.5)) AS idf
                FROM tf GROUP BY word),
         q AS (SELECT word FROM tf WHERE doc_id = 0)
         SELECT t.doc_id,
                CAST(CAST(sum(CAST(i.idf * (t.tf * 2.2::DOUBLE) /
                    (t.tf + 1.2 * (0.25 + 0.75 * d.dl /
                      (SELECT avg(dl) FROM dl)))
                  AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS score
         FROM tf t JOIN q ON t.word = q.word
         JOIN idf i ON t.word = i.word
         JOIN dl d ON t.doc_id = d.doc_id
         WHERE t.doc_id <> 0
         GROUP BY t.doc_id
         ORDER BY score DESC, t.doc_id LIMIT 10""",
    "q124_tfidf_retrieval" ->
      """WITH toks AS (SELECT doc_id, u.w AS word
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents), unnest(ws) AS u(w)
             WHERE u.w != ''),
         tf AS (SELECT doc_id, word, count(*) AS tf
                FROM toks GROUP BY 1, 2),
         idf AS (SELECT word,
                ln((SELECT count(*)::DOUBLE FROM documents) / count(*))
                  AS idf
                FROM tf GROUP BY word),
         w AS (SELECT doc_id, t.word, tf * idf AS wgt
               FROM tf t JOIN idf i ON t.word = i.word),
         norms AS (SELECT doc_id, sqrt(CAST(CAST(sum(CAST(wgt * wgt AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)) AS nrm
                   FROM w GROUP BY 1),
         q AS (SELECT word, wgt FROM w WHERE doc_id = 0),
         dots AS (SELECT w.doc_id, CAST(CAST(sum(CAST(w.wgt * q.wgt AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS dot
                  FROM w JOIN q ON w.word = q.word
                  WHERE w.doc_id <> 0 GROUP BY 1)
         SELECT d.doc_id,
                d.dot / (n.nrm * (SELECT nrm FROM norms WHERE doc_id = 0))
                  AS cos
         FROM dots d JOIN norms n ON d.doc_id = n.doc_id
         ORDER BY cos DESC, d.doc_id LIMIT 10""",
    "q123_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, u.w AS word
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents), unnest(ws) AS u(w)
             WHERE u.w != ''),
         lm AS (SELECT word,
                ln(count(*) / (SELECT count(*)::DOUBLE FROM toks)) AS lp
                FROM toks GROUP BY word)
         SELECT t.doc_id, count(*) AS n_tokens, CAST(CAST(sum(CAST(l.lp AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_logprob
         FROM toks t JOIN lm l ON t.word = l.word
         GROUP BY t.doc_id""",
    // q150: distinct-to-total word n-gram ratios per source — integer
    // counts and one exact division per cell in both engines.
    "q150_ngram_diversity" ->
      """WITH toks AS (SELECT source,
             list_filter(string_split(text, ' '), x -> x != '') AS ws
             FROM documents),
         g1 AS (SELECT source,
                count(DISTINCT u.w)::DOUBLE / count(*) AS distinct_1
                FROM toks, unnest(ws) AS u(w) GROUP BY source),
         b2 AS (SELECT source, ws[i] || ' ' || ws[i+1] AS g
                FROM toks, UNNEST(generate_series(1, len(ws)-1)) AS t(i)
                WHERE len(ws) >= 2),
         g2 AS (SELECT source,
                count(DISTINCT g)::DOUBLE / count(*) AS distinct_2
                FROM b2 GROUP BY source),
         b3 AS (SELECT source,
                ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
                FROM toks, UNNEST(generate_series(1, len(ws)-2)) AS t(i)
                WHERE len(ws) >= 3),
         g3 AS (SELECT source,
                count(DISTINCT g)::DOUBLE / count(*) AS distinct_3
                FROM b3 GROUP BY source)
         SELECT g1.source, distinct_1, distinct_2, distinct_3
         FROM g1 JOIN g2 USING (source) JOIN g3 USING (source)""",
    // q143: add-one bigram LM — counts and V are integer-exact, the
    // smoothed probability is one double division of exact integers
    // (identical in both engines), and per-bigram ln is banded to
    // DECIMAL(18,9) before the order-independent decimal sum.
    "q143_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x != '') AS ws
             FROM documents),
         bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
                FROM toks, UNNEST(generate_series(1, len(ws)-1)) AS t(i)
                WHERE len(ws) >= 2),
         cb AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
         cu AS (SELECT w1, sum(c) AS cw FROM cb GROUP BY 1),
         v AS (SELECT count(DISTINCT u.w) AS nv
               FROM toks, unnest(ws) AS u(w))
         SELECT b.doc_id,
                CAST(CAST(sum(CAST(ln((cb.c + 1) / (cu.cw + v.nv))
                  AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) / count(*) AS score
         FROM bg b JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
         JOIN cu ON b.w1 = cu.w1, v
         GROUP BY b.doc_id""",
    // Mirrors semanticDedup literally: nearest-of-8-seeds assignment
    // (ties to the lower seed id), then drop any vector with an
    // earlier same-cluster mate at cosine >= 0.35. DOUBLE[] casts per
    // the float-parity rule; both engines sum the dot product in
    // array order, so the doubles are bit-identical.
    "q120_semantic_dedup" ->
      """WITH seeds AS (SELECT vec_id AS seed_id, embedding::DOUBLE[] AS sv
             FROM embeddings WHERE vec_id < 8),
         assign AS (SELECT e.vec_id, s.seed_id,
             list_cosine_similarity(e.embedding::DOUBLE[], s.sv) AS cos
             FROM embeddings e, seeds s),
         best AS (SELECT vec_id, seed_id AS cluster
             FROM (SELECT vec_id, seed_id, row_number() OVER
                     (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
                   FROM assign) WHERE rn = 1),
         dropped AS (SELECT DISTINCT bb.vec_id
             FROM best aa JOIN best bb
               ON aa.cluster = bb.cluster AND aa.vec_id < bb.vec_id
             JOIN embeddings ea ON ea.vec_id = aa.vec_id
             JOIN embeddings eb ON eb.vec_id = bb.vec_id
             WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                     eb.embedding::DOUBLE[]) >= 0.35)
         SELECT b.vec_id, b.cluster FROM best b
         LEFT JOIN dropped d ON b.vec_id = d.vec_id
         WHERE d.vec_id IS NULL""",
    // q120's pipeline with k derived from count(*) exactly as
    // semanticDedup derives it (max(8, ceil(N/16))) — the hash check
    // grades the k-derivation rule along with clustering and dedup.
    "q127_semantic_dedup_scaled" ->
      """WITH kk AS (SELECT greatest(8,
               CAST(ceil(count(*) / 16.0) AS BIGINT)) AS k
             FROM embeddings),
         seeds AS (SELECT vec_id AS seed_id, embedding::DOUBLE[] AS sv
             FROM embeddings, kk WHERE vec_id < kk.k),
         assign AS (SELECT e.vec_id, s.seed_id,
             list_cosine_similarity(e.embedding::DOUBLE[], s.sv) AS cos
             FROM embeddings e, seeds s),
         best AS (SELECT vec_id, seed_id AS cluster
             FROM (SELECT vec_id, seed_id, row_number() OVER
                     (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
                   FROM assign) WHERE rn = 1),
         dropped AS (SELECT DISTINCT bb.vec_id
             FROM best aa JOIN best bb
               ON aa.cluster = bb.cluster AND aa.vec_id < bb.vec_id
             JOIN embeddings ea ON ea.vec_id = aa.vec_id
             JOIN embeddings eb ON eb.vec_id = bb.vec_id
             WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                     eb.embedding::DOUBLE[]) >= 0.35)
         SELECT b.vec_id, b.cluster FROM best b
         LEFT JOIN dropped d ON b.vec_id = d.vec_id
         WHERE d.vec_id IS NULL""",
    "q90_incremental_agg_mv" ->
      """SELECT event_type, user_id % 10 AS uid_bucket,
         count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    // cross-slice SRP-band candidates + exact cosine, with self-pairs
    // (%6==0 vectors sit in both slices and match in every band)
    "q88_embedding_neardup_incremental" ->
      s"""WITH pr AS (SELECT a.vec_id AS v_new, b.vec_id AS v_idx,
           a.embedding::DOUBLE[] AS ea, b.embedding::DOUBLE[] AS eb
         FROM embeddings a JOIN embeddings b
           ON a.vec_id % 2 = 0 AND b.vec_id % 3 = 0
         WHERE ${srpBandPred("a", "b")}),
         sc AS (SELECT v_new, v_idx,
           ${sqlCos(sqlDot("ea", "eb"), sqlDot("ea", "ea"),
                    sqlDot("eb", "eb"))} AS cos
         FROM pr)
         SELECT v_new, v_idx, cos FROM sc WHERE cos >= 0.35""",
    // the full two-batch embedding-curation evolution: within-batch
    // cosine clusters (band predicate + exact cosine, recursive-CTE
    // components) collapse to min vec_id, batch-2 survivors drop
    // against batch-1's accepted vectors — exactly curateStepEmbedding
    "q92_embedding_curation_mv" ->
      s"""WITH RECURSIVE
         b1 AS (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id % 3 = 0),
         e1 AS (SELECT a.vec_id AS d1, b.vec_id AS d2
                FROM b1 a JOIN b1 b ON a.vec_id < b.vec_id
                WHERE ${srpBandPred("a", "b")}
                  AND list_cosine_similarity(a.embedding::DOUBLE[],
                    b.embedding::DOUBLE[]) >= 0.35),
         e1s AS (SELECT d1 AS a, d2 AS b FROM e1
                 UNION ALL SELECT d2, d1 FROM e1),
         cc1 AS (SELECT vec_id, vec_id AS lbl FROM b1
                 UNION
                 SELECT e.b, c.lbl FROM cc1 c JOIN e1s e
                   ON e.a = c.vec_id),
         acc1 AS (SELECT vec_id, embedding FROM b1
                  WHERE vec_id NOT IN (SELECT vec_id FROM cc1
                    WHERE lbl < vec_id)),
         f2 AS (SELECT vec_id, embedding FROM embeddings),
         e2 AS (SELECT a.vec_id AS d1, b.vec_id AS d2
                FROM f2 a JOIN f2 b ON a.vec_id < b.vec_id
                WHERE ${srpBandPred("a", "b")}
                  AND list_cosine_similarity(a.embedding::DOUBLE[],
                    b.embedding::DOUBLE[]) >= 0.35),
         e2s AS (SELECT d1 AS a, d2 AS b FROM e2
                 UNION ALL SELECT d2, d1 FROM e2),
         cc2 AS (SELECT vec_id, vec_id AS lbl FROM f2
                 UNION
                 SELECT e.b, c.lbl FROM cc2 c JOIN e2s e
                   ON e.a = c.vec_id),
         sur2 AS (SELECT vec_id, embedding FROM f2
                  WHERE vec_id NOT IN (SELECT vec_id FROM cc2
                    WHERE lbl < vec_id)),
         nd AS (SELECT a.vec_id AS dn FROM sur2 a JOIN acc1 b
                ON ${srpBandPred("a", "b")}
                  AND list_cosine_similarity(a.embedding::DOUBLE[],
                    b.embedding::DOUBLE[]) >= 0.35)
         SELECT vec_id FROM acc1
         UNION ALL
         SELECT vec_id FROM sur2
         WHERE vec_id NOT IN (SELECT dn FROM nd)""",
    "q50_stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS hour_ts, event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q51_stream_to_lake" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
         count(DISTINCT user_id) AS n_users FROM events GROUP BY 1""",
    "q122_stream_static_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2""",
    "q52_lake_roundtrip" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(value) AS avg_value
         FROM events GROUP BY 1""",
    "q53_lake_partitioned" ->
      """SELECT user_id, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'purchase' GROUP BY 1""",
    "q96_lake_rollback" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY 1""",
    "q172_sql_catalog_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
         FROM lineitem WHERE l_quantity < 30
         GROUP BY l_returnflag, l_linestatus""",
    "q173_sql_time_travel" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
           'as_of' AS snapshot
         FROM events WHERE event_type IN ('click', 'view')
         GROUP BY event_type
         UNION ALL
         SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
           'current' AS snapshot
         FROM events WHERE event_type IN ('click', 'view', 'purchase')
         GROUP BY event_type""",
    "q174_sql_hidden_partitioning" ->
      """SELECT user_id % 10 AS cohort, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id % 10""",
    "q175_sql_delete" ->
      s"""SELECT event_type, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events WHERE user_id NOT IN (${graft.lake.SqlQueries.ForgetUsers})
         GROUP BY event_type""",
    "q176_sql_merge" ->
      """WITH c AS (SELECT user_id, count(*) AS n_events FROM events
                    WHERE event_type = 'click' GROUP BY user_id),
              p AS (SELECT user_id, count(*) AS n_p FROM events
                    WHERE event_type = 'purchase' GROUP BY user_id),
              m AS (SELECT COALESCE(c.user_id, p.user_id) AS user_id,
                           COALESCE(c.n_events, 0) AS n_events,
                           COALESCE(p.n_p, 0) AS purchases
                    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id)
         SELECT user_id % 10 AS cohort, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(n_events) AS BIGINT) AS total_events,
                CAST(sum(purchases) AS BIGINT) AS total_purchases
         FROM m GROUP BY user_id % 10""",
    "q177_sql_update" ->
      """SELECT CASE WHEN event_type = 'click' AND user_id % 7 = 3
                     THEN concat('priority_', event_type)
                     ELSE event_type END AS event_type,
                count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1""",
    "q178_sql_stream_table" ->
      """SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events WHERE event_type IN ('click', 'view', 'purchase')
         GROUP BY event_type""",
    "q179_sql_stream_to_table" ->
      """SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events WHERE event_type IN ('click', 'view', 'purchase')
           AND user_id % 2 = 0
         GROUP BY event_type""",
    "q180_sql_dynamic_overwrite" ->
      """SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (CAST(ts AS DATE) =
                      (SELECT CAST(min(ts) AS DATE) FROM events)
                    AND user_id % 5 = 2)
         GROUP BY event_type""",
    "q181_sql_call_procedures" ->
      """SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
                'tagged' AS snapshot
         FROM events WHERE event_type = 'click'
         GROUP BY event_type
         UNION ALL
         SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
                'current' AS snapshot
         FROM events WHERE event_type IN ('click', 'view', 'purchase')
         GROUP BY event_type""",
    "q182_sql_static_overwrite" ->
      """SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (event_type = 'click' AND user_id % 3 = 1)
         GROUP BY event_type""",
    // q186: the oracle replays the DML algebra the changelog stream
    // mirrored — forget the GDPR roster, reclassify the keyed clicks,
    // append the purchase replays — over the raw events
    "q186_sql_changelog_stream" ->
      s"""WITH kept AS (
           SELECT event_id, user_id, event_type, value FROM events
           WHERE user_id NOT IN (${graft.lake.SqlQueries.ForgetUsers})),
         updated AS (
           SELECT event_id, user_id,
             CASE WHEN event_type = 'click' AND user_id % 5 = 1
                  THEN concat('cdc_', event_type)
                  ELSE event_type END AS event_type,
             value FROM kept),
         final AS (
           SELECT * FROM updated
           UNION ALL
           SELECT event_id + 10000000, user_id, 'replay', value
           FROM events WHERE event_type = 'purchase')
         SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM final GROUP BY event_type""",
    // q188: the oracle recomputes the TYPED change events the TVF
    // must return for commits [2, head] — v2's cohort delete as
    // `delete`, v3's keyed update as paired pre/post images (old and
    // new values), v4's append as `insert`
    "q188_sql_table_changes" ->
      """WITH src AS (
           SELECT event_id, user_id, event_type, value FROM events),
         after_del AS (SELECT * FROM src WHERE user_id % 7 <> 3),
         ev AS (
           SELECT 'delete' AS _change_type, event_type, value
           FROM src WHERE user_id % 7 = 3
           UNION ALL
           SELECT 'update_preimage', event_type, value
           FROM after_del
           WHERE event_type = 'click' AND user_id % 4 = 1
           UNION ALL
           SELECT 'update_postimage', event_type, value + 5
           FROM after_del
           WHERE event_type = 'click' AND user_id % 4 = 1
           UNION ALL
           SELECT 'insert', 'tvf_replay', value
           FROM src WHERE event_type = 'view')
         SELECT _change_type, event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM ev GROUP BY _change_type, event_type""",
    // q189: the distributed-delta mirror oracle replays the algebra —
    // view/purchase base, drop the user_id%11=6 cohort, +50 on the
    // keyed purchases, append the keyed click replays
    "q189_mirror_distributed_delta" ->
      """WITH base AS (
           SELECT event_id, user_id, event_type, value FROM events
           WHERE event_type IN ('view', 'purchase')),
         kept AS (SELECT * FROM base WHERE user_id % 11 <> 6),
         updated AS (
           SELECT event_id, user_id, event_type,
             CASE WHEN event_type = 'purchase' AND user_id % 2 = 0
                  THEN value + 50 ELSE value END AS value
           FROM kept),
         final AS (
           SELECT * FROM updated
           UNION ALL
           SELECT event_id + 40000000, user_id, 'late', value
           FROM events
           WHERE event_type = 'click' AND user_id % 5 = 0)
         SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM final GROUP BY event_type""",
    // q187: the mirror-MV oracle replays the source's DML algebra —
    // click/view base, drop the user_id%9=4 cohort, double the keyed
    // views, append the purchase replays
    "q187_table_mirror_mv" ->
      """WITH base AS (
           SELECT event_id, user_id, event_type, value FROM events
           WHERE event_type IN ('click', 'view')),
         kept AS (SELECT * FROM base WHERE user_id % 9 <> 4),
         updated AS (
           SELECT event_id, user_id, event_type,
             CASE WHEN event_type = 'view' AND user_id % 3 = 0
                  THEN value * 2 ELSE value END AS value
           FROM kept),
         final AS (
           SELECT * FROM updated
           UNION ALL
           SELECT event_id + 20000000, user_id, 'purchase', value
           FROM events WHERE event_type = 'purchase')
         SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM final GROUP BY event_type""",
    "q117_lake_time_travel" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
           'as_of' AS snapshot
         FROM events WHERE event_type IN ('click', 'view')
         GROUP BY event_type
         UNION ALL
         SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
           'current' AS snapshot
         FROM events WHERE event_type IN ('click', 'view', 'purchase')
         GROUP BY event_type""",
    "q100_zorder_pruned_read" ->
      """SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events
         WHERE user_id >= 10 AND user_id <= 19
           AND event_id % 1000 < 500
         GROUP BY 1""",
    "q98_skew_salted_join" ->
      """WITH dim AS (SELECT c_custkey % 50 AS u_id,
             min(c_mktsegment) AS segment
           FROM customer GROUP BY 1)
         SELECT segment, event_type, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events e JOIN dim d ON e.user_id = d.u_id
         GROUP BY 1, 2""",
    "q105_bucketed_colocated_join" ->
      """SELECT o_orderpriority, count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "q107_min_cost_supplier" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
           FROM lineitem GROUP BY 1, 2)
         SELECT p_partkey, p_type, s_name, n_name, ps.cost
         FROM part JOIN ps ON p_partkey = ps.l_partkey
         JOIN supplier ON s_suppkey = ps.l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN region ON r_regionkey = n_regionkey
         WHERE r_name = 'ASIA' AND p_size <= 15
           AND ps.cost = (
             SELECT min(ps2.cost)
             FROM ps ps2
             JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
             JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
             JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
             WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'ASIA')""",
    "q108_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey) GROUP BY c_count""",
    "q109_small_quantity_lines" ->
      """SELECT p_brand, count(*) AS n_lines,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS revenue
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_type = 'SMALL'
           AND l_quantity < (SELECT avg(l2.l_quantity) / 5
                             FROM lineitem l2
                             WHERE l2.l_partkey = p_partkey)
         GROUP BY p_brand""",
    "q110_inactive_rich_customers" ->
      """SELECT c_mktsegment, count(*) AS numcust,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
         FROM customer
         WHERE c_acctbal > (SELECT
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / count(c_acctbal)
             FROM customer WHERE c_acctbal > 0.0)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment""",
    "q112_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(sum(CAST(volume AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM (
           SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
           FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE (n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
                  AND n2.n_name IN ('NATION_4', 'NATION_5', 'NATION_6'))
              OR (n1.n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
                  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')))
         GROUP BY 1, 2, 3""",
    "q113_market_share" ->
      """SELECT o_year,
           CAST(CAST(sum(CAST(CASE WHEN nation = 'NATION_5' THEN volume
                ELSE 0 END AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(CAST(volume AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS mkt_share
         FROM (
           SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
           FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
           WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
         GROUP BY o_year""",
    "q114_product_profit" ->
      """SELECT nation, o_year, CAST(CAST(sum(CAST(amount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_profit
         FROM (
           SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.9 * p_retailprice * l_quantity AS amount
           FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE p_name LIKE '%widget%')
         GROUP BY 1, 2""",
    "q115_top_supplier" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
             CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",
    "q116_discounted_revenue" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                AND l_quantity BETWEEN 5 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                AND l_quantity BETWEEN 10 AND 40)""",
    "q118_important_stock" ->
      """WITH v AS (
           SELECT l_partkey,
             CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS value
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
           GROUP BY l_partkey)
         SELECT l_partkey, value FROM v
         WHERE value > (SELECT
           CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) * 0.001
           FROM v)""",
    "q119_supplier_part_count" ->
      """SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
         FROM part JOIN lineitem ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#1'
           AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
           AND l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size""",
    "q106_bucketed_local_agg" ->
      """SELECT l_orderkey, count(*) AS n,
           sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY 1""",
  )
}
