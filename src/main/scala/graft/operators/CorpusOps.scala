package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for training-data pipelines: test-set
  * decontamination, PII redaction, repetition-based quality signals,
  * and deterministic train/val/test splitting. All are declarative
  * DataFrame plans with the 100 TB shapes baked in: the benchmark side
  * of decontamination broadcasts, redaction and bigram signals are
  * shuffle-free per-row scans, word-level signals aggregate with
  * map-side partials, and splitting is a pure hash projection.
  */
object CorpusOps {

  /** Test-set decontamination: flag corpus documents sharing at least
    * `minShared` distinct word n-gram shingles with a held-out
    * benchmark set — the standard guard against benchmark leakage into
    * training data.
    *
    * Shape: benchmark eval sets are tiny next to a 100 TB corpus, so
    * the benchmark's distinct shingle-hash set is BROADCAST and the
    * corpus is never shuffled at all — the whole operator is one scan
    * over the corpus plus a broadcast-hash semi-join + partial count
    * aggregation. Shingles travel as 64-bit hashes (ShingleHashes'
    * one-pass expression; collision odds ~n^2/2^64 leave counts
    * intact).
    *
    * Returns (doc_id, n_shared) for contaminated docs only.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    n: Int = 3, minShared: Long = 1,
                    textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    val bench = DedupOps.shingleHashArrays(benchmark, textCol, idCol, n)
      .select(explode(col("shs")).as("shingle")).distinct()
    val corp = DedupOps.shingleHashArrays(corpus, textCol, idCol, n)
      .select(col("doc_id"), explode(col("shs")).as("shingle"))
    // per-doc shingles are already distinct (ShingleHashes dedups), so
    // count(*) after the semi-ish join counts DISTINCT shared shingles
    corp.join(broadcast(bench), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Fuzzy (near-duplicate) test-set decontamination — the production
    * complement of [[decontaminate]]'s shared-shingle count: a corpus
    * document is dropped when its n-gram JACCARD against ANY
    * benchmark document reaches `minJaccard` (the PaLM/Llama-style
    * fuzzy rule; exact-overlap alone misses lightly-paraphrased eval
    * leaks). Returns the SURVIVING corpus doc ids.
    *
    * Two-phase with EXACT recall: candidate (corpus, bench) pairs
    * come from the inverted-index equi-join on shingles with the
    * benchmark side BROADCAST (eval sets are KB-MB scale against a
    * 100 TB corpus; any >= minJaccard pair shares at least one
    * shingle, so unlike banded LSH this candidate generator cannot
    * miss), and each pair's true Jaccard derives from one count over
    * the (per-doc pre-deduped) shared shingles plus the two set
    * sizes. Cost is O(matching postings), never corpus x bench; the
    * per-pair aggregation shuffles only candidate rows. Documents too
    * short to shingle cannot be contaminated and always survive. */
  def decontaminateNearDup(corpus: DataFrame, benchmark: DataFrame,
                           minJaccard: Double = 0.5, shingleN: Int = 3,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val cSh = DedupOps.shingleHashArrays(corpus, textCol, idCol, shingleN)
    val bSh = DedupOps.shingleHashArrays(benchmark, textCol, idCol,
        shingleN)
      .select(col("doc_id").as("bench_id"), col("shs").as("bshs"))
    // set sizes ride WITH the exploded shingles (first() recovers them
    // after the pair aggregation): the corpus is shingled exactly once
    // and no corpus-scale relation is ever shuffled to serve the
    // candidate-scale verify — only candidate rows reach the groupBy
    val cExpl = cSh.select(col("doc_id"),
      size(col("shs")).cast("long").as("n1"),
      explode(col("shs")).as("shingle"))
    val bExpl = bSh.select(col("bench_id"),
      size(col("bshs")).cast("long").as("n2"),
      explode(col("bshs")).as("shingle"))
    // per-doc shingle sets are distinct, so the join-then-count is
    // exactly |intersection| per (corpus, bench) pair
    val bad = cExpl.join(broadcast(bExpl), Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("inter"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2"))
      .filter(col("inter") / (col("n1") + col("n2") - col("inter"))
        >= minJaccard)
      .select(col("doc_id")).distinct()
    graft.Tables.widen(corpus).select(col(idCol).as("doc_id"))
      .join(bad, Seq("doc_id"), "left_anti")
  }

  /** Temperature-based domain mixture sampling — the mC4/XLM-R
    * multilingual recipe (Conneau et al. 2020): domains are sampled
    * proportionally to share^alpha; alpha < 1 FLATTENS the natural
    * distribution, upweighting low-resource domains (languages)
    * relative to their raw counts (XLM-R uses alpha=0.3, mC4 0.3 on
    * sizes; alpha=1 is proportional sampling). This is the
    * deterministic exact-count form: per-domain target k_d = min(c_d,
    * floor(budget * w_d / sum w)) with w_d = c_d^alpha, and the k_d
    * selected docs inside a domain are the first by content-neutral
    * md5(id) order (the q64/q70 device), so the whole sample is a
    * pure function of the corpus.
    *
    * Cross-engine determinism: the ONE non-integer step (pow) is
    * banded to DECIMAL(28,6) before the weight sum — both engines
    * then run identical double arithmetic on identical inputs
    * (decimal->double is correctly rounded, floor is exact), so the
    * targets and therefore the selected set match bit-for-bit.
    *
    * Shape at 100 TB: one D-row count aggregation (D = domains —
    * metadata-scale, driver-safe), targets computed driver-side, one
    * window PARTITIONED BY DOMAIN (parallel across domains; the q70
    * two-phase selection tree generalizes if a single domain
    * outgrows a partition). */
  def temperatureMixture(docs: DataFrame, alpha: Double = 0.7,
                         budgetDivisor: Long = 2,
                         idCol: String = "doc_id",
                         domainCol: String = "lang"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]: <1 flattens")
    require(budgetDivisor >= 1, "budgetDivisor must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val d2 = graft.Tables.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        col(domainCol).as("domain"))
    // The per-domain histogram STAYS DISTRIBUTED (VERDICT r10 item 3:
    // at web scale `domain` is a URL host — 10^7-10^8 values — and a
    // driver collect of it is a multi-GB driver structure). Only two
    // SCALARS ever reach the driver: the exact decimal weight sum and
    // the total count. A null domain is its own group (the join below
    // is null-safe or one stray null row silently drops its group).
    val cnts = d2.groupBy(col("domain")).agg(count(lit(1)).as("c"))
    // the ONE non-integer step (pow) banded to DECIMAL(28,6) per
    // domain, so the weight sum is exact and order-independent and
    // its correctly-rounded double is engine-portable
    val cntsW = cnts.withColumn("wd",
      pow(col("c").cast("double"), lit(alpha)).cast("decimal(28,6)"))
    val scal = cntsW.agg(sum(col("wd")).as("sumw"),
      sum(col("c")).as("total")).head()
    // empty corpus: sums are null; every downstream relation is empty,
    // so any finite placeholders keep the plan valid
    val sumw = if (scal.isNullAt(0)) 1.0 else scal.getDecimal(0).doubleValue
    val total = if (scal.isNullAt(1)) 0L else scal.getLong(1)
    // integer division keeps the budget portable (the oracle's t // N)
    val budget = total / budgetDivisor
    // per-domain targets computed WHERE THE COUNTS LIVE — a |domains|-
    // row relation, never driver state. AQE broadcasts it when small
    // and shuffle-joins when `domain` is web-scale (the packSequences
    // broadcast-up-to-a-bound-else-join behavior, chosen at runtime).
    val tDf = cntsW.select(col("domain").as("_dom"),
      least(col("c"), floor(lit(budget.toDouble) *
        col("wd").cast("double") / lit(sumw)).cast("long")).as("k"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(expr("md5(cast(cast(doc_id as string) as binary))"),
        col("doc_id"))
    d2.withColumn("rn", row_number().over(w))
      .join(tDf, col("domain") <=> col("_dom"))
      .filter(col("rn") <= col("k"))
      .select(col("doc_id"), col("domain"))
  }

  // conservative cross-engine patterns (identical semantics in Java
  // regex and RE2): email, North-American-style phone, IPv4
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val IpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII redaction: replace emails / phone numbers / IPv4 addresses
    * with typed placeholders and count what was removed, per document.
    * Pure per-row projection — codegen'd regexes, zero shuffles, scales
    * linearly with corpus bytes. */
  def redactPii(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        IpRe, "<IP>").as("clean_text"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      size(regexp_extract_all(col(textCol), lit(IpRe), lit(0)))
        .cast("long").as("n_ips"))

  /** Gopher-style repetition signals per document:
    *  - top_word_frac: occurrences of the most frequent word / total
    *    words (boilerplate and keyword-stuffing detector);
    *  - dup_bigram_frac: 1 - distinct bigrams / total bigrams
    *    (repeated-phrase detector).
    *
    * The bigram signal is computed row-locally (no shuffle). The word
    * signal explodes to (doc, word) — two aggregations with map-side
    * partial combine, the scale-safe alternative to per-row
    * interpreted higher-order-function loops over long documents. */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val words = graft.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val topWord = words
      .select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")))
        .as("top_word_frac"))
    val bigrams = words.select(col("doc_id"),
      (lit(1.0) - size(expr(
        "array_distinct(transform(sequence(0, size(w)-2), " +
          "i -> concat(w[i], ' ', w[i+1])))")).cast("double")
        / (size(col("w")) - 1)).as("dup_bigram_frac"))
    topWord.join(bigrams, "doc_id")
  }

  /** Deterministic, engine-portable train/val/test assignment: bucket
    * 0..15 from the last hex digit of md5(text), split 13/2/1. Stable
    * under reshuffling, reproducible anywhere md5 exists, and a pure
    * projection — the standard alternative to rand()-based splits,
    * which are neither restart- nor engine-stable. Content-keyed
    * (md5 of TEXT, not id) so exact duplicates always land in the same
    * split and can never leak across the boundary. */
  def withSplit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bucket =
      expr(s"locate(substr(md5($textCol), 32, 1), '0123456789abcdef') - 1")
    docs.withColumn("split",
      when(bucket < 13, "train").when(bucket < 15, "val").otherwise("test"))
  }

  /** Budget-constrained data selection: within each domain, order docs
    * by (quality DESC, doc_id) and keep the longest prefix whose running
    * token total stays within `budgetTokens` — "fill the mixture's token
    * budget with the best documents", the step after scoring in
    * training-data curation. Returns the kept (domainCol, idCol) pairs.
    *
    * 100 TB shape: the naive formulation is one running-sum window
    * partitioned by domain — a TOTAL per-domain sort through a single
    * reducer, linear in corpus size. Instead: (1) aggregate a
    * (domain × quantized-quality-bin) token histogram, whose size is
    * domains × `bins` regardless of corpus size; (2) derive each
    * domain's cutoff bin and residual budget DISTRIBUTIVELY with a
    * window over that histogram — per-domain groups are <= `bins`
    * rows, and the domains themselves spread across the cluster, so
    * the cutoff computation scales to web-level domain cardinality
    * (millions of hosts) with no driver collect at all; (3) docs above
    * the cutoff bin pass with a pure filter — no sort — and the exact
    * prefix window runs only over the cutoff bin's ~1/bins sliver.
    * Identical answer to the naive window because the bin order
    * refines the quality order. Caveat: a degenerate score
    * distribution (many docs sharing one bin — e.g. a constant
    * quality) concentrates the sliver; raise `bins` to split it, since
    * the sliver shrinks with bin width for any continuous component of
    * the score. */
  def tokenBudget(docs: DataFrame, budgetTokens: Long, bins: Int = 1000,
                  textCol: String = "text", idCol: String = "doc_id",
                  domainCol: String = "source"): DataFrame = {
    import graft.functions.TextFunctions
    val scored = graft.Tables.widen(docs).select(
      col(domainCol).as("domain"), col(idCol).as("doc_id"),
      TextFunctions.qualityScore(textCol).as("quality"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("qbin",
        least(floor(col("quality") * bins), lit(bins - 1)).cast("int"))
    // kept set is a PREFIX of the (quality DESC, doc_id) order: once the
    // running total crosses the budget everything after is dropped, even
    // if it would fit. So per domain, walking bins from best down, every
    // bin before the crossing is admitted whole, the crossing bin gets
    // the residual budget, and later bins are dropped wholesale. The
    // crossing bin is the FIRST (best-quality-first) whose preceding
    // cumulative total plus its own exceeds the budget — a running-sum
    // window over the histogram, never over documents. A domain that
    // never crosses fits whole: the left join leaves it cut-free.
    val wBins = Window.partitionBy(col("domain"))
      .orderBy(col("qbin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cutsDf = scored.groupBy("domain", "qbin")
      .agg(sum(col("n_tokens")).as("toks"))
      .withColumn("before", coalesce(sum(col("toks")).over(wBins), lit(0L)))
      .filter(col("before") + col("toks") > budgetTokens)
      .groupBy("domain")
      .agg(max(col("qbin")).as("cut"),
        (lit(budgetTokens) - min(col("before"))).as("residual"))
    // cutsDf has one row per OVER-budget domain — small next to the
    // corpus; the planner broadcasts it when it fits, shuffles when a
    // web-scale domain count doesn't
    val tagged = scored.join(cutsDf, Seq("domain"), "left")
      .na.fill(Map("cut" -> -1, "residual" -> 0L))
    val aboveCut = tagged.filter(col("qbin") > col("cut"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("quality").desc, col("doc_id"))
    val borderKept = tagged.filter(col("qbin") === col("cut"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= col("residual"))
    aboveCut.select(col("domain").as(domainCol), col("doc_id").as(idCol))
      .unionByName(borderKept
        .select(col("domain").as(domainCol), col("doc_id").as(idCol)))
  }

  /** Deterministic per-domain document cap: keep exactly `k` docs per
    * domain (fewer if the domain is smaller), chosen by content hash —
    * a reproducible, engine-portable uniform sample of fixed SIZE, the
    * cap-based complement of [[mixCorpus]]'s rate-based sampling.
    * Selection order is (md5(text), doc_id), stable under reshuffling
    * and re-runs. Returns the kept (domainCol, idCol) pairs.
    *
    * 100 TB shape: NOT a row_number window partitioned by domain (that
    * funnels each whole domain through one reducer). Selection-tree
    * instead: phase 1 sorts WITHIN each input partition (spillable,
    * zero shuffle) and streams out at most k docs per domain per
    * partition with O(1) state; phase 2 re-selects the global top k per
    * domain from the surviving ≤ partitions × k rows — small enough
    * that a collect_list + slice aggregation is safe. Two-phase top-k
    * is exact: the global top k of a union is contained in the union of
    * per-part top ks. */
  def domainCap(docs: DataFrame, k: Int, textCol: String = "text",
                idCol: String = "doc_id", domainCol: String = "source")
      : DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val keyed = graft.Tables.widen(docs).select(
      col(domainCol).as("domain"),
      md5(col(textCol).cast("binary")).as("rk"),
      col(idCol).cast("long").as("doc_id"))
    val partial = keyed.as[(String, String, Long)]
      .sortWithinPartitions("domain", "rk", "doc_id")
      .mapPartitions { it =>
        var cur: String = null
        var n = 0
        it.flatMap { case row @ (dom, _, _) =>
          if (dom != cur) { cur = dom; n = 0 }
          n += 1
          if (n <= k) Iterator.single(row) else Iterator.empty
        }
      }.toDF("domain", "rk", "doc_id")
    partial.groupBy(col("domain"))
      .agg(slice(sort_array(collect_list(struct(col("rk"), col("doc_id")))),
        1, k).as("top"))
      .select(col("domain").as(domainCol), explode(col("top")).as("t"))
      .select(col(domainCol), col("t.doc_id").as(idCol))
  }

  /** Sequence packing: assign documents, in (domain, doc_id) order, to
    * contiguous fixed-token-budget bins — the batch-construction step
    * before pretraining (each bin becomes one packed training
    * sequence). A doc's bin is floor(tokens-before-it / budget), i.e.
    * the bin its start position falls in.
    *
    * 100 TB shape: the rule needs an EXACT global running token sum per
    * domain, but a per-domain window is a single-reducer sort. Classic
    * distributed prefix-sum instead: range-partition by the order key
    * and sort within partitions (spillable, parallel), aggregate one
    * (partition × domain) token total — bounded by partitions × live
    * domains-per-partition, not rows — prefix those into per-slice base
    * offsets, then a slice-local cumsum reconstructs the exact global
    * cumsum in one more pass. The partitioned stage is
    * localCheckpoint-ed so both passes read the same materialized
    * layout.
    *
    * The base-offset prefix itself is ALWAYS computed distributively
    * (a window over the tiny per-(partition, domain) aggregate — each
    * domain's group is at most `partitions` rows). How it reaches the
    * data pass adapts to domain cardinality: up to
    * `maxBroadcastOffsets` offset rows ride a broadcast map into a
    * zero-shuffle partition-local pass (mixture-style domain counts);
    * beyond that — web-scale URL-host domains — they arrive by a join
    * + windowed cumsum sharing one (pid, domain) exchange, never a
    * driver collect.
    *
    * Returns (domainCol, idCol, n_tokens, bin). */
  def packSequences(docs: DataFrame, budgetTokens: Long,
                    textCol: String = "text", idCol: String = "doc_id",
                    domainCol: String = "source",
                    maxBroadcastOffsets: Int = 200000): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    import graft.functions.TextFunctions
    val ss = docs.sparkSession
    import ss.implicits._
    val n = ss.sparkContext.defaultParallelism
    val staged = graft.Tables.widen(docs).select(
        col(domainCol).as("domain"), col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).as("t"))
      .repartitionByRange(n, col("domain"), col("doc_id"))
      .sortWithinPartitions("domain", "doc_id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map { case (d, id, t) => (pid, d, id, t) }
      }
      .toDF("pid", "domain", "doc_id", "t")
      .localCheckpoint()
    // base offset of each (partition, domain) slice = tokens of the
    // SAME domain in earlier partitions: a running-sum window over the
    // per-slice totals (each domain's group <= partition count, groups
    // spread across the cluster — no driver involvement)
    val wSlices = Window.partitionBy(col("domain")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetsDf = staged
      .groupBy(col("pid"), col("domain")).agg(sum(col("t")).as("pt"))
      .withColumn("off", coalesce(sum(col("pt")).over(wSlices), lit(0L)))
      .select(col("pid"), col("domain"), col("off"))
      .localCheckpoint()
    val budget = budgetTokens
    if (offsetsDf.count() <= maxBroadcastOffsets) {
      // mixture-scale domains: offsets ride a broadcast map, the data
      // pass is partition-local over the already-sorted layout — zero
      // further shuffles
      val offsets: Map[(Int, String), Long] = offsetsDf
        .as[(Int, String, Long)].collect()
        .map { case (pid, dom, off) => ((pid, dom), off) }.toMap
      val bc = ss.sparkContext.broadcast(offsets)
      staged.as[(Int, String, Long, Long)]
        .mapPartitions { it =>
          var curDom: String = null
          var cum = 0L
          it.map { case (pid, dom, id, t) =>
            if (dom != curDom) { curDom = dom; cum = bc.value((pid, dom)) }
            val binOfStart = cum / budget
            cum += t
            (dom, id, t, binOfStart)
          }
        }
        .toDF(domainCol, idCol, "n_tokens", "bin")
    } else {
      // web-scale domains: same arithmetic, delivered by a join plus a
      // slice-local cumsum window; both share one (pid, domain)
      // exchange, and every window group is bounded by one partition's
      // share of one domain — no single-reducer anywhere
      val wInSlice = Window.partitionBy(col("pid"), col("domain"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      staged.join(offsetsDf, Seq("pid", "domain"))
        .withColumn("before",
          col("off") + coalesce(sum(col("t")).over(wInSlice), lit(0L)))
        .select(col("domain").as(domainCol), col("doc_id").as(idCol),
          col("t").as("n_tokens"),
          expr(s"before div $budget").as("bin")) // exact integer division
    }
  }

  /** Fixed-size overlapping character chunking: one row per chunk,
    * starts at 0, stride = size - overlap, final partial chunk kept.
    * Pure projection + explode — shuffle-free, linear in corpus bytes,
    * and engine-portable (chunk boundaries are pure arithmetic).
    * Returns (idCol, chunk_id, chunk_text). */
  def chunkDocs(docs: DataFrame, size: Int, overlap: Int,
                textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need 0 <= overlap < size")
    val stride = size - overlap
    graft.Tables.widen(docs)
      .filter(length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"),
        col(textCol).as("_t"),
        explode(expr(s"sequence(0, length($textCol) - 1, $stride)"))
          .as("_s"))
      .select(col("doc_id"),
        expr(s"CAST(_s div $stride AS BIGINT)").as("chunk_id"),
        expr(s"substr(_t, _s + 1, $size)").as("chunk_text"))
  }

  /** Split audit: doc counts and char volume per (source, split). */
  def splitSummary(docs: DataFrame): DataFrame =
    withSplit(docs)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))

  /** Training-mixture construction: deterministically downsample each
    * domain to its target rate. A doc survives iff its content-keyed
    * md5 bucket (12 bits, 4096 buckets) falls under
    * floor(rate * 4096) — so the realized rate is exact to 1/4096,
    * reproducible across engines and runs, and stable under
    * repartitioning (rand()-per-row sampling is none of these).
    * Domains absent from `rates` are kept whole. Pure filter: pushdown-
    * friendly, zero shuffles, and composable with [[withSplit]]
    * (independent hash bits: split uses hex digit 32, mixing 1-3). */
  def mixCorpus(docs: DataFrame, rates: Map[String, Double],
                textCol: String = "text", domainCol: String = "source")
      : DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "mixture rates must be in [0,1]")
    val bucket = expr(
      s"""locate(substr(md5($textCol), 1, 1), '0123456789abcdef') - 1""")
      .cast("long") * 256 +
      expr(s"locate(substr(md5($textCol), 2, 1), '0123456789abcdef') - 1")
        .cast("long") * 16 +
      expr(s"locate(substr(md5($textCol), 3, 1), '0123456789abcdef') - 1")
        .cast("long")
    val threshold = rates.foldLeft(lit(4096L)) { case (acc, (dom, r)) =>
      when(col(domainCol) === dom, lit(math.floor(r * 4096).toLong))
        .otherwise(acc)
    }
    docs.filter(bucket < threshold)
  }

  /** Deterministic epoch shuffle: every document gets a stable global
    * position for a given seed — the reorder applied to a training
    * corpus at each epoch (pos for seed k is uncorrelated with seed
    * k+1, yet byte-reproducible across runs, engines, and input
    * partitioning, which rand()-keyed sorts are not). Position = rank
    * of md5(seed|doc_id) in the whole corpus, ties (impossible in
    * practice) broken by doc_id.
    *
    * 100 TB shape: ONE range exchange on the hash key — md5 output is
    * uniform, so the sampled range bounds are skew-free by
    * construction — then sortWithinPartitions; the global position is
    * per-partition row counts (|partitions| rows, driver-bounded like
    * [[packSequences]]'s offset map) prefix-summed and broadcast back,
    * added to a partition-local running index. Never a global
    * row_number window (that is a single-reducer sort); never
    * monotonically_increasing_id (not rank-dense, not seeded). */
  def epochShuffle(docs: DataFrame, seed: Long,
                   idCol: String = "doc_id"): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val n = ss.sparkContext.defaultParallelism
    val staged = docs
      .select(col(idCol).cast("long").as("doc_id"))
      .withColumn("skey", md5(concat_ws("|", lit(seed), col("doc_id"))))
      .repartitionByRange(n, col("skey"), col("doc_id"))
      .sortWithinPartitions("skey", "doc_id")
      .as[(Long, String)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map { case (id, k) => (pid, id, k) }
      }.toDF("pid", "doc_id", "skey")
      .localCheckpoint()
    val counts = staged.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    // empty partitions emit no count row, so pids may be sparse; the
    // pairing is positional over the pid-sorted rows
    val offsets: Map[Int, Long] = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val bc = ss.sparkContext.broadcast(offsets)
    staged.as[(Int, Long, String)].mapPartitions { it =>
      var i = 0L
      it.map { case (pid, id, _) =>
        val pos = bc.value(pid) + i
        i += 1
        (id, pos)
      }
    }.toDF("doc_id", "pos")
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every RAW
    * document by how much its hashed-unigram distribution looks like
    * a TARGET corpus, and keep the top-k. Weight(doc) = sum over its
    * tokens of ln(p_target(bucket)/p_raw(bucket)), with
    * add-one-smoothed bucket distributions over `buckets` hashed
    * feature buckets — the paper's hashed n-gram importance weights,
    * made deterministic (hash features + exact top-k instead of
    * Gumbel sampling) so the whole selection is SQL-reproducible.
    *
    * 100 TB shape: the two bucket distributions are one token-explode
    * + bucket-keyed count with map-side combine (output = `buckets`
    * rows, metadata-scale); the per-bucket log-ratio table BROADCASTS
    * to a second pass over raw tokens; per-doc weights are a doc-keyed
    * sum; selection is TakeOrdered k. Two shuffles (bucket agg, doc
    * agg) — never a corpus-wide window, never an all-pairs join. The
    * bucket hash is the first 8 hex chars of md5 (portable bit
    * pattern), so any engine recomputes identical weights. */
  def dsirSelect(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                 k: Int = 100, buckets: Int = 1024,
                 textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), isTarget.as("_t"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("bucket",
        expr("cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)")
          % buckets)
    val counts = toks.groupBy(col("bucket"))
      .agg(sum(when(col("_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("_t"), 1L).otherwise(0L)).as("cr"))
      .localCheckpoint() // evaluated once: feeds totals AND the ratio
    val totRow = counts.agg(sum(col("ct")), sum(col("cr"))).head()
    val (tt, tr) = (totRow.getLong(0), totRow.getLong(1))
    // Per-bucket log-ratio QUANTIZED to nano precision: libm and the
    // JVM disagree by 1 ulp on some ln() inputs, so the raw double is
    // not engine-portable — rounding each of the `buckets` values to
    // 9 decimals collapses the sub-ulp disagreement, and everything
    // downstream (decimal sums) is exact and order-independent, so
    // the selection is bit-reproducible in any engine (the q105/q24
    // banding pattern, applied at the only non-portable step).
    val lr = counts.select(col("bucket"),
      (log((col("ct") + 1).cast("double") / (tt + buckets).toDouble) -
        log((col("cr") + 1).cast("double") / (tr + buckets).toDouble))
        .cast("decimal(18,9)").as("lr"))
    toks.filter(!col("_t"))
      .join(broadcast(lr), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("lr")).cast("double").as("weight"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("weight").desc, col("doc_id").asc)
      .limit(k)
  }
}
