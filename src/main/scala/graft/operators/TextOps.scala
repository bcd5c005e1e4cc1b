package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Banding, Tables}
import graft.functions.TextFunctions._

/** Text-analysis query surface over the documents table: stats, quality,
  * tokens, language-id, fingerprints. Narrow per-row transforms — single
  * scan, no shuffle except final aggregations. */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Per-document structural stats. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      wordCount(col("text")).as("n_words"),
      avgWordLen(col("text")).as("avg_word_len"))

  /** Token counts aggregated per source corpus. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), tokenCount(col("text")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        avg(col("n_tokens")).as("avg_tokens"))

  /** Heuristic language ID per document. */
  def languageId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), langId("text").as("lang_pred"))

  /** Normalized-text md5 fingerprint per document. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Order-sensitive rolling-hash fingerprints (no oracle: xxhash64 is
    * engine-specific). */
  def rollingFingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      rollingFingerprint("text").as("rolling_fp"))

  /** Corpus quality pre-filter scores per document. */
  def quality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), qualityScore("text").as("quality"))

  /** Unigram log-probability quality score (the perplexity-style
    * filter of CCNet/Gopher data pipelines, in its simplest exact
    * form): a unigram LM is "trained" on the corpus itself (token
    * relative frequencies) and every document is scored by the mean
    * log-probability of its tokens — rare-garbage-heavy documents
    * score low, boilerplate scores high. Self-scoring means no
    * unseen-token smoothing is needed (every scored token has count
    * >= 1).
    *
    * Shape at 100 TB: explode + one vocabulary-wide count (map-side
    * partial combine collapses each partition to its vocab before the
    * shuffle), then a token->logprob equi-join and a per-doc mean —
    * two shuffles total, all keys high-cardinality (no single-reducer
    * step). The LM could be swapped for a held-out table without
    * changing the plan. */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.widen(docs(s, dir))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val total = toks.count()
    val lm = toks.groupBy(col("word"))
      .agg(count(lit(1)).as("c"))
      .select(col("word"), log(col("c") / lit(total.toDouble)).as("lp"))
    toks.join(lm, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        // per-token lp banded to DECIMAL(18,12) (qualityBuckets'
        // device) so the doc mean is visit-order independent
        (Banding.sumBand(col("lp"), 12) / count(lit(1)))
          .as("avg_logprob"))
  }

  /** Sparse lexical retrieval: tf-idf cosine top-k for a query
    * document — the lexical complement to the dense-embedding
    * retrieval family (q39/q41/q45/q121). Weights are
    * tf * ln(N/df) with no smoothing (every scored term has df >= 1
    * in a self-indexed corpus).
    *
    * Shape at 100 TB: tf and df are vocabulary-keyed aggregations
    * with map-side combine; the query's term vector is tiny by
    * construction (one document) and broadcasts, so scoring is a
    * map-side hash join on `word` followed by one doc-keyed sum —
    * never an all-pairs or corpus-wide window. Multi-query batches
    * generalize by keying the broadcast side on (query_id, word). */
  def tfidfRetrieve(s: SparkSession, dir: String, queryDoc: Long = 0L,
                    k: Int = 10): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    val toks = Tables.widen(d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
      .select(col("word"), log(lit(n.toDouble) / col("df")).as("idf"))
    val w = tf.join(idf, Seq("word"))
      .select(col("doc_id"), col("word"),
        (col("tf") * col("idf")).as("wgt"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(Banding.sumBand(col("wgt") * col("wgt"), 12)).as("nrm"))
    val qTerms = w.filter(col("doc_id") === queryDoc)
      .select(col("word"), col("wgt").as("qwgt"))
    val qNorm = norms.filter(col("doc_id") === queryDoc)
      .select(col("nrm").as("qnrm"))
    w.filter(col("doc_id") =!= queryDoc)
      .join(broadcast(qTerms), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(Banding.sumBand(col("wgt") * col("qwgt"), 12).as("dot"))
      .join(norms, Seq("doc_id"))
      .crossJoin(broadcast(qNorm)) // scalar side
      .select(col("doc_id"),
        (col("dot") / (col("nrm") * col("qnrm"))).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc)
      .limit(k)
  }

  /** BM25 retrieval (Robertson/Sparck Jones probabilistic ranking,
    * the production-standard lexical scorer): the q124 pipeline with
    * saturation (k1) and document-length normalization (b) on the
    * term frequency, and the BM25+ idf ln(1 + (N-df+0.5)/(df+0.5)).
    * Same 100 TB shape as q124 — vocabulary-keyed aggregations,
    * broadcast query terms, word-keyed scoring join, one doc-keyed
    * sum; the avg-doc-length scalar is computed once driver-side and
    * rides as a literal. */
  def bm25Retrieve(s: SparkSession, dir: String, queryDoc: Long = 0L,
                   k: Int = 10, k1: Double = 1.2,
                   b: Double = 0.75): DataFrame = {
    val d = docs(s, dir)
    val n = d.count()
    val toks = Tables.widen(d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val avgdl = dl.agg(avg(col("dl"))).head().getDouble(0)
    val idf = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
      .select(col("word"), log(lit(1.0) +
        (lit(n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"))
    val qTerms = tf.filter(col("doc_id") === queryDoc)
      .select(col("word")) // distinct by construction of tf
    tf.filter(col("doc_id") =!= queryDoc)
      .join(broadcast(qTerms), Seq("word"))
      .join(idf, Seq("word"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"), (col("idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl") / lit(avgdl)))).as("w"))
      .groupBy(col("doc_id"))
      .agg(Banding.sumBand(col("w"), 12).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** CCNet-style quality bucketing (Wenzek et al. 2020): score every
    * document by its unigram-LM mean log-probability (the q123
    * pipeline) and split the corpus into `nBuckets` equal-depth bands
    * — head/middle/tail at the default 3 — the standard
    * perplexity-tiered selection step before LLM pretraining.
    *
    * The global rank that equal-depth banding needs is computed the
    * scale-safe way (the epochShuffle machinery, not a single-reducer
    * window): range-exchange on (score DESC, doc_id), per-partition
    * sorted cursors, and an O(partitions) driver-side prefix sum of
    * partition counts — no stage ever sees more than its partition.
    * Bucket = floor(rank * nBuckets / N), an explicit formula both
    * engines reproduce (ntile's remainder spread is
    * engine-convention-shaped, so it is NOT used).
    *
    * Per-token log-probs are summed as DECIMAL(18,12) before the
    * divide, so a document's score is order-independent and identical
    * docs tie EXACTLY (raw double summation would leave planted
    * duplicates ulp-apart in an engine-dependent order, and a tercile
    * boundary falling between them would flip their buckets across
    * engines). */
  def qualityBuckets(s: SparkSession, dir: String,
                     nBuckets: Int = 3): DataFrame = {
    import s.implicits._
    val toks = Tables.widen(docs(s, dir))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val total = toks.count()
    val lm = toks.groupBy(col("word"))
      .agg(count(lit(1)).as("c"))
      .select(col("word"), log(col("c") / lit(total.toDouble)).as("lp"))
    val scored = toks.join(lm, Seq("word"))
      .groupBy(col("doc_id"))
      .agg((sum(col("lp").cast("decimal(18,12)")).cast("double") /
        count(lit(1))).as("score"))
    val n = s.sparkContext.defaultParallelism
    val staged = scored
      .repartitionByRange(n, col("score").desc, col("doc_id"))
      .sortWithinPartitions(col("score").desc, col("doc_id"))
      .as[(Long, Double)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map { case (id, sc) => (pid, id, sc) }
      }.toDF("pid", "doc_id", "score")
      .localCheckpoint(eager = false)
    val counts = staged.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val nDocs = counts.map(_._2).sum
    val offsets: Map[Int, Long] = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val bc = s.sparkContext.broadcast(offsets)
    val nb = nBuckets.toLong
    staged.as[(Int, Long, Double)].mapPartitions { it =>
      var i = 0L
      it.map { case (pid, id, sc) =>
        val rank = bc.value(pid) + i
        i += 1
        (id, sc, ((rank * nb) / nDocs).toInt)
      }
    }.toDF("doc_id", "score", "bucket")
  }

  /** Multi-query BM25: the [[bm25Retrieve]] pipeline generalized to a
    * query BATCH, keyed on (query_id, word) exactly as q124/q125's
    * scaladocs sketch. The corpus-side statistics (tf, dl, idf, avgdl)
    * are computed ONCE and shared by every query; the batch's term
    * vectors broadcast (a handful of documents by construction), so
    * scoring stays one word-keyed hash join over tf — no per-query
    * re-scan, no all-pairs — followed by one (query_id, doc_id)-keyed
    * sum and a per-query row_number top-k (the
    * searchPersistedBatch/q128 serving shape).
    *
    * Each per-row score term is a deterministic chain of IEEE double
    * ops, but the per-document SUM of those terms is order-sensitive
    * at the last ulp, so the terms are summed as DECIMAL(18,12)
    * (exact, order-independent addition) and the total cast back to
    * double — the q105/q24 banding pattern that keeps the driver's
    * exact hash binding against any engine's visit order. */
  def bm25RetrieveBatch(s: SparkSession, dir: String,
                        queryDocs: Seq[Long] = Seq(0L, 1L, 2L),
                        k: Int = 5, k1: Double = 1.2,
                        b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val n = d.count()
    val toks = Tables.widen(d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // exact integer sum / count in any engine — avgdl is portable
    val avgdl = dl.agg(avg(col("dl"))).head().getDouble(0)
    val idf = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
      .select(col("word"), log(lit(1.0) +
        (lit(n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"))
    val qTerms = tf.filter(col("doc_id").isin(queryDocs: _*))
      .select(col("doc_id").as("query_id"), col("word"))
    val scored = tf.join(broadcast(qTerms), Seq("word"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(idf, Seq("word"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), (col("idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl") / lit(avgdl))))
        .cast("decimal(18,12)").as("w"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).cast("double").as("score"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("_rn", row_number().over(win))
      .filter(col("_rn") <= k)
      .select(col("query_id"), col("doc_id"), col("score"))
  }

  /** Bigram-LM quality scoring — the next-order member of the q123
    * unigram family. The CCNet/Gopher perplexity filters use an
    * n-gram LM; the exact distributed form is an add-one-smoothed
    * bigram model whose every statistic is a corpus aggregate:
    * P(w2|w1) = (C(w1,w2)+1) / (C(w1)+V), with C(w1) the
    * bigram-start marginal (so the model is self-consistent by
    * construction) and V the corpus vocabulary; each document scores
    * the mean ln P over its bigrams. Documents with fewer than two
    * tokens have no bigrams and are absent from the result (the
    * q123/tokenless contract).
    *
    * Shape at 100 TB: one pass forms per-doc bigram structs
    * row-locally, the (w1,w2) count and its w1 marginal are
    * vocab-keyed aggregations with map-side combine, V is one scalar,
    * and scoring is two word-keyed equi-joins plus a doc-keyed mean —
    * no corpus window, no self-join. Per-bigram ln is banded to
    * DECIMAL(18,9) (the q129 quantum) before the doc-keyed sum: libm
    * and the JVM disagree by 1 ulp on some ln inputs, and a raw
    * double sum would also be visit-order dependent. */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.widen(docs(s, dir))
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
    val bg = toks.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-2), " +
          "i -> struct(ws[i] as w1, ws[i+1] as w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val cu = cb.groupBy(col("w1")).agg(sum(col("c")).as("cw"))
    val v = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    bg.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .select(col("doc_id"),
        log((col("c") + lit(1L)) / (col("cw") + lit(v)))
          .cast("decimal(18,9)").as("lp"))
      .groupBy(col("doc_id"))
      .agg((sum(col("lp")).cast("double") / count(lit(1))).as("score"))
  }

  /** Deterministic hash-encoder STUB: a dim-component vector whose
    * j-th component is the md5-derived integer (first 15 hex chars of
    * md5(text || ':' || j), mod 1000) stored as float. Stands in for
    * a real embedding model exactly like the multimodal fakeDecode —
    * the pipeline plumbing (schema, per-chunk vectors, retrieval
    * plan) is real; swap this expression for an encoder UDF in
    * production. Components are INTEGER-valued, so float storage,
    * double widening, and any engine's arithmetic agree exactly. */
  def hashEmbedExpr(textCol: String, dim: Int)
      : org.apache.spark.sql.Column =
    expr(s"transform(sequence(0, ${dim - 1}), j -> " +
      s"cast(cast(conv(substring(md5(concat($textCol, ':', " +
      s"cast(j as string))), 1, 15), 16, 10) as bigint) % 1000 " +
      s"as float))")

  /** End-to-end RAG ingestion + retrieval in ONE declarative plan:
    * overlapping character chunks (the q82 operator), a per-chunk
    * embedding ([[hashEmbedExpr]] — deterministic stub), and the
    * query chunk's cosine top-k over every other document's chunks.
    * This is the retrieval half of a RAG stack graded end to end —
    * chunking boundaries, chunk identity, embedding plumbing, and
    * ranking all bind under one oracle hash.
    *
    * Shape at 100 TB: chunking and embedding are one shuffle-free
    * projection pass; retrieval is one scan + TakeOrdered (for a
    * persisted deployment, feed these chunk vectors to ivfPqPersist
    * / buildLexicalIndex — the serving axes graded by q137/q135). */
  def ragRetrieve(s: SparkSession, dir: String, chunkSize: Int = 200,
                  overlap: Int = 50, dim: Int = 16, k: Int = 10)
      : DataFrame = {
    val chunks = CorpusOps.chunkDocs(docs(s, dir), chunkSize, overlap)
      .select(col("doc_id"), col("chunk_id"),
        hashEmbedExpr("chunk_text", dim).as("emb"))
    val qv = chunks
      .filter(col("doc_id") === 0 && col("chunk_id") === 0)
      .select(col("emb")).head().getSeq[Float](0)
    chunks.filter(col("doc_id") =!= 0)
      .select(col("doc_id"), col("chunk_id"),
        graft.functions.VectorFunctions
          .cosine_sim(col("emb"), typedlit(qv)).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc, col("chunk_id").asc)
      .limit(k)
  }

  /** Result-DIVERSIFIED RAG retrieval: [[ragRetrieve]]'s scoring with
    * the standard per-source collapse — each document contributes
    * only its BEST chunk (max cosine, ties to the lower chunk_id)
    * and the top-k then ranks documents, so one long near-duplicate
    * document cannot monopolize the context window with k copies of
    * itself. Two windowed ranks over the scored candidates (both
    * partitioned — per-doc then global top-k via TakeOrdered on the
    * collapsed per-doc rows); everything else is [[ragRetrieve]]'s
    * plan. */
  def ragRetrieveDiverse(s: SparkSession, dir: String,
                         chunkSize: Int = 200, overlap: Int = 50,
                         dim: Int = 16, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.cosine_sim
    val chunks = CorpusOps.chunkDocs(docs(s, dir), chunkSize, overlap)
      .select(col("doc_id"), col("chunk_id"),
        hashEmbedExpr("chunk_text", dim).as("emb"))
    val qv = chunks
      .filter(col("doc_id") === 0 && col("chunk_id") === 0)
      .select(col("emb")).head().getSeq[Float](0)
    val scored = chunks.filter(col("doc_id") =!= 0)
      .select(col("doc_id"), col("chunk_id"),
        cosine_sim(col("emb"), typedlit(qv)).as("cos"))
    val perDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("cos").desc, col("chunk_id").asc)
    scored.withColumn("_rn", row_number().over(perDoc))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("chunk_id"), col("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Distinct-n corpus diversity audit (the Zhu et al. 2018
    * generation-diversity metric applied per source slice): for
    * n = 1..3, the ratio of DISTINCT word n-grams to total n-grams —
    * boilerplate/templated slices score low, which is exactly the
    * signal a pretraining mixture audit wants before weighting a
    * source. Integer counts and one exact division per cell; each n
    * is one explode pass + a source-keyed aggregate with map-side
    * combine, joined on the tiny per-source result. */
  def ngramDiversity(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.widen(docs(s, dir))
      .select(col("source"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
    def grams(n: Int): DataFrame = {
      val gram = (0 until n).map(j => s"ws[i+$j]")
        .mkString("concat_ws(' ', ", ", ", ")")
      base.filter(size(col("ws")) >= n)
        .select(col("source"), explode(expr(
          s"transform(sequence(0, size(ws)-$n), i -> $gram)")).as("g"))
        .groupBy(col("source"))
        .agg((countDistinct(col("g")) / count(lit(1)))
          .as(s"distinct_$n"))
    }
    grams(1).join(grams(2), Seq("source")).join(grams(3), Seq("source"))
  }

  /** Hybrid lexical + dense retrieval fused by reciprocal-rank fusion
    * (Cormack/Clarke/Buettcher 2009) — the production RAG-stack
    * standard for combining a BM25 arm with an embedding arm without
    * score calibration: each arm contributes 1/(rrfK + rank), so only
    * the RANKINGS matter, never the incomparable raw scores.
    *
    * Determinism story (what makes this hash-gradable): the lexical
    * ranking is the banded-BM25 batch pipeline (decimal term sums —
    * order-independent), the dense ranking is the exact cosine
    * kernel (fixed ascending-index chains — bit-portable), both
    * ranked with an id tiebreak; the fused score is then arithmetic
    * on INTEGER ranks — 1/(rrfK+r) is a single correctly-rounded
    * IEEE division and the two arms add in one commutative addition,
    * so every engine lands on the identical double.
    *
    * Scale shape: each arm is its own already-audited plan (BM25:
    * vocab-keyed aggs + broadcast query terms; cosine: one scan +
    * TakeOrdered) truncated to a poolK-row candidate list, and the
    * fusion is a full-outer join of two poolK-row lists — driver-
    * trivial regardless of corpus size. The rank windows run AFTER
    * the per-arm top-poolK truncation, so the unpartitioned window
    * orders poolK rows, never the corpus. Fixture note: doc_id and
    * vec_id identify the same document in the two modality tables. */
  def hybridRrfRetrieve(s: SparkSession, dir: String,
                        queryDoc: Long = 0L, k: Int = 10,
                        poolK: Int = 20, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.cosine_sim
    val lexTop = bm25RetrieveBatch(s, dir, Seq(queryDoc), k = poolK)
      .select(col("doc_id"), col("score"))
    val lexRanked = lexTop.select(col("doc_id").as("id"),
      row_number().over(Window.orderBy(col("score").desc,
        col("doc_id").asc)).as("lrank"))
    val e = Tables.load(s, dir, "embeddings")
    val qv = e.filter(col("vec_id") === queryDoc)
      .select(col("embedding")).head().getSeq[Float](0)
    val denseTop = e.filter(col("vec_id") =!= queryDoc)
      .select(col("vec_id"),
        cosine_sim(col("embedding"), typedlit(qv)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(poolK)
    val denseRanked = denseTop.select(col("vec_id").as("id"),
      row_number().over(Window.orderBy(col("cos").desc,
        col("vec_id").asc)).as("drank"))
    lexRanked.join(denseRanked, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("drank")), lit(0.0)))
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Batched [[hybridRrfRetrieve]] — the serving tier's request shape
    * (a query BATCH per plan) on the fusion surface, completing the
    * batch-serving symmetry: BM25 (q131), PQ (q128/q140), IVF (q91)
    * and now the fused ranking. The lexical arm is ONE
    * bm25RetrieveBatch pass (corpus statistics shared across
    * queries), the dense arm is ONE corpus scan scoring every query
    * from a broadcast list, each arm ranks per query with a windowed
    * row_number whose `<= poolK` filter Spark rewrites into
    * WindowGroupLimit (partial per-partition top-poolK BEFORE the
    * rank exchange — plan-verified, see BENCH_NOTES), and the fusion
    * is a per-query full-outer join of two tiny lists. Same
    * integer-rank determinism as the single-query form. */
  def hybridRrfRetrieveBatch(s: SparkSession, dir: String,
                             queryDocs: Seq[Long] = Seq(0L, 1L, 2L),
                             k: Int = 10, poolK: Int = 20,
                             rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.cosine_sim
    require(queryDocs.nonEmpty, "empty query batch")
    val lexW = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val lexRanked = bm25RetrieveBatch(s, dir, queryDocs, k = poolK)
      .select(col("query_id"), col("doc_id").as("id"),
        row_number().over(lexW).as("lrank"))
    val e = Tables.load(s, dir, "embeddings")
    val qDf = e.filter(col("vec_id").isin(queryDocs: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
    val denseW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val denseRanked = e
      .join(broadcast(qDf), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("embedding"), col("_qv")).as("cos"))
      .withColumn("_rn", row_number().over(denseW))
      .filter(col("_rn") <= poolK)
      .select(col("query_id"), col("vec_id").as("id"),
        col("_rn").as("drank"))
    val fused = lexRanked
      .join(denseRanked, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id").as("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("drank")), lit(0.0)))
          .as("rrf_score"))
    val topW = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    fused.withColumn("_rn", row_number().over(topW))
      .filter(col("_rn") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_score"))
  }

  /** Persisted lexical index — the production BM25 deployment shape,
    * completing the persisted-serving family (IVF inverted lists q60,
    * PQ code table q126): postings (word, doc_id, tf, dl) as a lake
    * table BUCKETED BY word, plus a docstats (doc_id, dl) table for
    * the corpus scalars. Postings carry the document length
    * DENORMALIZED (classic search-engine practice), so serving needs
    * no doc-keyed join at all. df/idf/N/avgdl are derived at query
    * time from what is stored, which is what makes increments pure
    * appends ([[appendToLexicalIndex]]) — nothing is re-weighted when
    * documents arrive.
    *
    * 100 TB shape: the build is the q125 statistics pass plus one
    * doc-keyed join, written once; a query then reads ONLY the bucket
    * dirs its terms hash into (LakeTable.probe: bucket-partition
    * pruning + manifest IN + parquet pushdown, no shuffle). */
  def buildLexicalIndex(s: SparkSession, docsDf: DataFrame, root: String,
                        buckets: Int = 16)
      : (graft.lake.LakeTable, graft.lake.LakeTable) = {
    val postings = postingsOf(docsDf)
    // a continuous appendToLexicalIndex loop adds one file per touched
    // bucket dir per batch; the tiered auto-compaction gate (sized to
    // the bucket fan-out, as in IvfIndex.buildIndex) keeps each dir at
    // O(log rows) files so probe cost stays flat as the index grows
    val pt = graft.lake.LakeTable.create(s, s"$root/postings",
      postings.schema,
      properties = graft.lake.LakeTable.autoCompactProps(buckets),
      bucketBy = Some(("word", buckets)))
    pt.append(postings)
    val dl = postings.select(col("doc_id"), col("dl")).distinct()
    val dt = graft.lake.LakeTable.create(s, s"$root/docstats", dl.schema)
    dt.append(dl)
    (pt, dt)
  }

  /** The (postings, docstats) schemas a lexical-index pair uses —
    * derived from the builder's own plan over an empty frame, so a
    * catalog-managed creation can never drift from what
    * [[buildLexicalIndex]]/[[appendToLexicalIndex]] actually write. */
  def lexicalIndexSchemas(s: SparkSession)
      : (org.apache.spark.sql.types.StructType,
         org.apache.spark.sql.types.StructType) = {
    import org.apache.spark.sql.types._
    val empty = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val p = postingsOf(empty)
    val d = p.select(col("doc_id"), col("dl")).distinct()
    (p.schema, d.schema)
  }

  private def postingsOf(docsDf: DataFrame): DataFrame = {
    val toks = Tables.widen(docsDf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    tf.join(dl, Seq("doc_id"))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"))
  }

  /** Incremental index maintenance: tokenize a batch of NEW documents
    * and append its postings/docstats rows exactly-once per
    * (writerId, batchId). Valid because every query-time statistic
    * (df, N, avgdl) derives from stored rows — appends never
    * invalidate previously-written postings. Batches must contain
    * documents not already indexed (same contract as
    * IvfIndex.appendToIndex); replays are no-ops. */
  def appendToLexicalIndex(postings: graft.lake.LakeTable,
                           docstats: graft.lake.LakeTable,
                           batch: DataFrame, writerId: String,
                           batchId: Long): Unit = {
    // lazy pin: tokenization runs ONCE (it fed both commits as two full
    // passes before), materialized inside the postings write job — no
    // dedicated checkpoint job, and both commits see one row set
    val p = postingsOf(batch).localCheckpoint(eager = false)
    postings.appendExactlyOnce(p, writerId, batchId)
    docstats.appendExactlyOnce(
      p.select(col("doc_id"), col("dl")).distinct(), writerId, batchId)
    // enforce the declared layout bound (no-op below the gate)
    postings.autoCompactIfNeeded()
  }

  /** GDPR propagation to the SERVING index: remove every posting and
    * docstat row of `docIds` via merge-on-read EQUALITY deletes —
    * O(|keys|) commit cost, zero index files rewritten, no index
    * scan (the read path applies the delete as a key anti-join and
    * compaction later absorbs it physically). BM25 statistics need
    * no fixup: df, N, and avgdl all derive from stored rows at query
    * time, so they reflect the removal the instant the delete
    * commits. Exactly-once per (writerId, batchId): a replayed
    * micro-batch must not re-commit the delete at a fresh sequence
    * number, which would kill re-inserted documents. */
  def removeFromLexicalIndex(postings: graft.lake.LakeTable,
                             docstats: graft.lake.LakeTable,
                             docIds: DataFrame, writerId: String,
                             batchId: Long): Unit = {
    val keys = docIds.select(col("doc_id")).distinct()
    postings.deleteWhereEqualExactlyOnce(keys, Seq("doc_id"),
      writerId, batchId)
    docstats.deleteWhereEqualExactlyOnce(keys, Seq("doc_id"),
      writerId, batchId)
    ()
  }

  /** BM25 served from the persisted index. The query document's term
    * list is fetched by a manifest-pruned doc_id probe (bounded: one
    * document's vocabulary — in production the caller passes
    * tokenized query terms directly and skips this read); scoring
    * then reads only the term-probed bucket dirs, broadcasts the
    * |terms|-row idf table, and aggregates per doc — no corpus-wide
    * scan, no doc-keyed join, no shuffle beyond the final doc-keyed
    * sum. Scores sum as DECIMAL(18,12) (q131's banding), so the
    * result is bit-stable at any parallelism. */
  def bm25FromIndex(postings: graft.lake.LakeTable,
                    docstats: graft.lake.LakeTable,
                    queryDoc: Long = 0L, k: Int = 10, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    val qWords = postings.probe("doc_id", Seq(queryDoc))
      .select(col("word")).collect().map(_.getString(0)).toSeq.sorted
    bm25Terms(postings, docstats, qWords, k, k1, b,
      excludeDoc = Some(queryDoc))
  }

  /** The production serving entry: caller supplies the tokenized
    * query terms (no index read to fetch them). Cost is
    * O(terms' posting lists): a bucket-pruned scan of the probed
    * dirs, a broadcast |terms|-row idf join, one doc-keyed sum. */
  def bm25Terms(postings: graft.lake.LakeTable,
                docstats: graft.lake.LakeTable,
                terms: Seq[String], k: Int = 10, k1: Double = 1.2,
                b: Double = 0.75,
                excludeDoc: Option[Long] = None): DataFrame = {
    val st = docstats.read()
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    val n = st.getLong(0)
    // an empty index (created, nothing appended yet) has no avgdl —
    // serve the honest empty answer instead of NPE-ing on the null
    if (n == 0L) return postings.read()
      .select(col("doc_id"), lit(0.0).as("score")).limit(0)
    val avgdl = st.getDouble(1)
    val restricted = postings.probe("word", terms)
    val idf = restricted.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
      .select(col("word"), log(lit(1.0) +
        (lit(n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"))
    val scoped = excludeDoc match {
      case Some(x) => restricted.filter(col("doc_id") =!= x)
      case None => restricted
    }
    scoped.join(broadcast(idf), Seq("word"))
      .select(col("doc_id"), (col("idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl") / lit(avgdl))))
        .cast("decimal(18,12)").as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Corpus heavy hitters: the k most frequent words with counts.
    * Explode + two-phase count (map-side partial combine collapses each
    * partition to its vocabulary before the shuffle) + TakeOrdered for
    * the top-k — shuffle width is the vocabulary, not the token stream.
    * Ties broken by word so the result is deterministic. */
  def topWords(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)
}
