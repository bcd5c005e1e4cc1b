package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class CorpusOpsSpec extends SparkSuite {
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing shingles with " +
    "the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),     // shares 'alpha beta gamma'
      (2L, "epsilon zeta eta theta"),     // disjoint
      (3L, "beta gamma delta alpha")      // shares 'beta gamma delta'
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = CorpusOps.decontaminate(corpus, bench)
      .as[(Long, Long)].collect().toMap
    // doc 1: shingles {a b g, b g d} both in bench -> 2 shared
    // doc 3: {b g d, g d a, d a ...} only 'beta gamma delta' in bench
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("decontaminateNearDup: a paraphrased benchmark leak is dropped, " +
    "low-overlap and unshingleable docs survive, threshold is exact") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // 8 of 10 words shared in order: high jaccard, must drop
      (1L, "the quick brown fox jumps over the lazy cat today"),
      // one shared shingle, jaccard far below 0.5: must survive
      (2L, "the quick brown tortoise crawls under a heavy rock"),
      // disjoint: must survive
      (3L, "completely different words in every position here"),
      // too short to shingle: cannot be contaminated, must survive
      (4L, "hi there")
    ).toDF("doc_id", "text")
    val got = CorpusOps.decontaminateNearDup(corpus, bench,
      minJaccard = 0.5).as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L), s"survivors were $got")
    // driver recomputation of doc 1's jaccard confirms it is >= 0.5
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val j = {
      val a = shingles("the quick brown fox jumps over the lazy cat today")
      val b = shingles("the quick brown fox jumps over the lazy dog today")
      (a & b).size.toDouble / (a | b).size
    }
    assert(j >= 0.5, s"fixture drifted: planted jaccard $j")
  }

  test("bigramLogprob: hand-computed add-one bigram LM on a tiny corpus") {
    val dir = tmpDir("bigram-docs")
    Seq((1L, "a b a b", "en", "t", 7L), (2L, "b b", "en", "t", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.bigramLogprob(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bigrams: doc1 (a,b),(b,a),(a,b); doc2 (b,b)
    // C(a,b)=2 C(b,a)=1 C(b,b)=1; marginals C(a)=2 C(b)=2; V=2
    // P(b|a)=3/4, P(a|b)=2/4, P(b|b)=2/4
    def band(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val lpAB = band(math.log(3.0 / 4)); val lpBA = band(math.log(2.0 / 4))
    val exp1 = ((lpAB + lpBA + lpAB).toDouble) / 3
    val exp2 = band(math.log(2.0 / 4)).toDouble / 1
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == exp1, s"doc1 ${got(1L)} vs $exp1")
    assert(got(2L) == exp2, s"doc2 ${got(2L)} vs $exp2")
  }

  test("temperatureMixture: T<1 strictly upweights the rarest domain " +
    "and downweights the biggest; the sample is deterministic") {
    val docs = Tables.load(spark, sf, "documents")
    val sel = CorpusOps.temperatureMixture(docs, alpha = 0.7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val selByDom = sel.groupBy(_._2).view.mapValues(_.length).toMap
    val natByDom = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = natByDom.values.sum.toDouble
    val selTotal = sel.length.toDouble
    val top = natByDom.maxBy(_._2)._1
    val rare = natByDom.minBy(_._2)._1
    assert(selByDom(rare) / selTotal > natByDom(rare) / total,
      s"rare domain $rare share did not increase")
    assert(selByDom(top) / selTotal < natByDom(top) / total,
      s"top domain $top share did not decrease")
    // budget respected (floor per domain can undershoot, never over)
    assert(sel.length <= total.toLong / 2)
    val again = CorpusOps.temperatureMixture(docs, alpha = 0.7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sel.toSet == again.toSet, "sample is not deterministic")
  }

  test("ragRetrieve: hash embedding matches a driver md5 recomputation; " +
    "the query doc is excluded and cosines are non-increasing") {
    val docs = Tables.load(spark, sf, "documents")
    val chunk0 = CorpusOps.chunkDocs(docs, 200, 50)
      .filter($"doc_id" === 0 && $"chunk_id" === 0)
    val got = chunk0
      .select(graft.operators.TextOps.hashEmbedExpr("chunk_text", 16)
        .as("emb"))
      .head().getSeq[Float](0)
    val text = chunk0.select($"chunk_text").head().getString(0)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val expected = (0 until 16).map { j =>
      (java.lang.Long.parseLong(md5hex(s"$text:$j").take(15), 16) %
        1000).toFloat
    }
    assert(got == expected, "hash embedding diverged from driver md5")
    val res = graft.operators.TextOps.ragRetrieve(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.length == 10)
    assert(res.forall(_._1 != 0L), "query doc leaked into results")
    assert(res.map(_._3).sliding(2).forall(p => p(0) >= p(1)),
      "cosines not non-increasing")
  }

  test("ngramDiversity: hand-computed distinct-n ratios per source") {
    val dir = tmpDir("divers-docs")
    Seq((1L, "x x y", "en", "a", 5L), (2L, "z z z z", "en", "b", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.ngramDiversity(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // a: unigrams {x,x,y} 2/3; bigrams {x x, x y} 2/2; trigrams 1/1
    assert(got("a") == ((2.0 / 3, 1.0, 1.0)))
    // b: unigrams 1/4; bigrams {z z}x3 1/3; trigrams {z z z}x2 1/2
    assert(got("b") == ((0.25, 1.0 / 3, 0.5)))
  }

  test("decontaminate broadcast side is the benchmark (corpus never " +
    "shuffled for the join)") {
    val docs = Tables.load(spark, sf, "documents")
    val plan = CorpusOps.decontaminate(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0))
      .queryExecution.executedPlan
    val hasBroadcastJoin = plan.toString.contains("BroadcastHashJoin")
    assert(hasBroadcastJoin, "benchmark shingles must broadcast")
  }

  test("redactPii scrubs and counts emails, phones, IPs") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "call 555-123-4567 or 555-987-6543"),
      (3L, "host 192.168.0.1 and 10.0.255.7 up"),
      (4L, "clean text only")).toDF("doc_id", "text")
    val got = CorpusOps.redactPii(df)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "mail <EMAIL> now" && got(1L)._3 == 1)
    assert(got(2L)._2 == "call <PHONE> or <PHONE>" && got(2L)._4 == 2)
    assert(got(3L)._2 == "host <IP> and <IP> up" && got(3L)._5 == 2)
    assert(got(4L) == ((4L, "clean text only", 0L, 0L, 0L)))
  }

  test("repetitionSignals: hand-computed fractions") {
    val df = Seq(
      // 4 words, 'spam' 3/4; bigrams: 'spam spam' x2 (dup), 'spam ham'
      (1L, "spam spam spam ham"),
      // all distinct words and bigrams
      (2L, "one two three four")).toDF("doc_id", "text")
    val got = CorpusOps.repetitionSignals(df)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(got(1L)._2 - 0.75) < 1e-9)
    assert(math.abs(got(1L)._3 - (1.0 - 2.0 / 3.0)) < 1e-9)
    assert(math.abs(got(2L)._2 - 0.25) < 1e-9)
    assert(got(2L)._3 == 0.0)
  }

  test("mixCorpus: deterministic per-domain rates, untouched domains " +
    "kept whole, rate 0 drops all") {
    val docs = Tables.load(spark, sf, "documents")
    val rates = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0)
    val mixed = CorpusOps.mixCorpus(docs, rates)
    val bysrc = mixed.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val full = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!bysrc.contains("src2"), "rate 0 must drop the domain")
    // sampled rates land near targets (content-hash, small n => loose)
    assert(bysrc("src0").toDouble / full("src0") > 0.2 &&
      bysrc("src0").toDouble / full("src0") < 0.8)
    assert(bysrc("src1") < bysrc("src0"))
    // unlisted domains pass through whole
    assert(bysrc("src5") == full("src5"))
    // deterministic: same selection under repartitioning
    val again = CorpusOps.mixCorpus(docs.repartition(5), rates)
      .select("doc_id").as[Long].collect().toSet
    assert(again == mixed.select("doc_id").as[Long].collect().toSet)
    intercept[IllegalArgumentException] {
      CorpusOps.mixCorpus(docs, Map("src0" -> 1.5))
    }
  }

  test("tokenBudget equals the naive per-domain prefix window") {
    import graft.functions.TextFunctions
    val docs = Tables.load(spark, sf, "documents")
    // ground truth: one window, keep while running tokens <= budget
    def naive(budget: Long): Set[(String, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source")
        .orderBy(TextFunctions.qualityScore("text").desc, $"doc_id")
      docs.withColumn("cum",
          sum(TextFunctions.tokenCount($"text")).over(w))
        .filter($"cum" <= budget)
        .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    }
    for (budget <- Seq(0L, 120L, 800L, 1000000L)) {
      val got = CorpusOps.tokenBudget(docs, budget)
        .as[(String, Long)].collect().toSet
      assert(got == naive(budget), s"budget=$budget")
    }
    // coarse bins force many docs into the cutoff bin — same answer
    val coarse = CorpusOps.tokenBudget(docs, 800L, bins = 4)
      .as[(String, Long)].collect().toSet
    assert(coarse == naive(800L), "bin quantization must not change the set")
  }

  test("domainCap keeps exactly min(k, domain size) content-hash-chosen docs") {
    val docs = Tables.load(spark, sf, "documents")
    // ground truth: naive row_number window
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source")
      .orderBy(md5($"text".cast("binary")), $"doc_id")
    def naive(k: Int): Set[(String, Long)] =
      docs.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    for (k <- Seq(1, 10, 1000)) { // 1000 > any domain: keeps everything
      val got = CorpusOps.domainCap(docs, k)
        .as[(String, Long)].collect().toSet
      assert(got == naive(k), s"k=$k")
      assert(got.groupBy(_._1).values.forall(_.size <= k))
    }
    // deterministic under reshuffling (content-hash key, not partition
    // order): the two-phase selection tree picks the same docs
    val again = CorpusOps.domainCap(docs.repartition(7), 10)
      .as[(String, Long)].collect().toSet
    assert(again == naive(10))
  }

  test("packSequences equals the naive per-domain cumsum window") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf, "documents")
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def naive(budget: Long): Set[(String, Long, Long)] =
      docs.select($"source", $"doc_id",
          TextFunctions.tokenCount($"text").as("t"))
        .withColumn("cum", sum($"t").over(w))
        .select($"source", $"doc_id",
          (($"cum" - $"t") / budget).cast("long").as("bin"))
        .as[(String, Long, Long)].collect().toSet
    for (budget <- Seq(128L, 512L, 100000L)) {
      val got = CorpusOps.packSequences(docs, budget)
        .select("source", "doc_id", "bin")
        .as[(String, Long, Long)].collect().toSet
      assert(got == naive(budget), s"budget=$budget")
    }
    // the distributed prefix-sum is layout-independent: same bins no
    // matter how the input arrives
    val again = CorpusOps.packSequences(docs.repartition(13), 512L)
      .select("source", "doc_id", "bin")
      .as[(String, Long, Long)].collect().toSet
    assert(again == naive(512L))
    // bins are contiguous budget-sized windows: within (source, bin),
    // token sums only exceed the budget when a single doc does
    val over = CorpusOps.packSequences(docs, 128L)
      .groupBy($"source", $"bin")
      .agg(sum($"n_tokens").as("s"), max($"n_tokens").as("m"),
        count(lit(1)).as("n"))
      .filter($"s" > 2 * 128 && $"n" > 1 && $"m" < 128)
    assert(over.isEmpty,
      "a multi-doc bin of small docs can't overshoot a full budget")
  }

  test("tokenBudget and packSequences at 100k synthetic domains: no " +
    "driver-histogram blowup, exact answers on a spot-checked slice") {
    // VERDICT r04 item 4: cutoffs/offsets must hold up when `domain`
    // is a URL host (millions of values), not a mixture label (dozens).
    // 100k domains x 2 docs. Doc A: 4 tokens, quality 0.616 (stopword
    // bonus -> qbin 6); doc B: 6 tokens, quality 0.523 (qbin 5) — so
    // the per-domain quality-DESC prefix under budget 5 admits exactly
    // A (4 <= 5) and crosses at B.
    val n = 100000
    val docs = spark.range(n).select(
        concat(lit("host-"), $"id").as("source"),
        $"id".as("base"))
      .select($"source", explode(array(lit(0), lit(1))).as("i"), $"base")
      .select($"source", ($"base" * 2 + $"i").as("doc_id"),
        when($"i" === 0, "the alpha beta gamma")
          .otherwise("five six seven eight nine ten").as("text"))

    // budget 5: per domain, doc A (4 tokens) fits, B (6) crosses
    val kept = CorpusOps.tokenBudget(docs, budgetTokens = 5L, bins = 10)
    assert(kept.count() == n)
    assert(kept.filter($"doc_id" % 2 =!= 0).count() == 0)

    // packing under budget 5: A -> bin 0 (start 0), B -> bin 0 (start
    // 4, 4 div 5 = 0); forcing the distributed (join + window) offset
    // path must give identical bins to the broadcast path
    val viaBroadcast = CorpusOps.packSequences(docs, 5L)
      .select("source", "doc_id", "bin").as[(String, Long, Long)]
      .collect().toSet
    val viaJoin = CorpusOps.packSequences(docs, 5L,
        maxBroadcastOffsets = 0)
      .select("source", "doc_id", "bin").as[(String, Long, Long)]
      .collect().toSet
    assert(viaBroadcast == viaJoin)
    assert(viaBroadcast.size == 2 * n)
    assert(viaBroadcast.forall(_._3 == 0L))
  }

  test("temperatureMixture at 100k synthetic domains: no driver " +
    "histogram, exact targets on a spot-checked skewed slice") {
    // VERDICT r10 item 3: `domain` at web scale is a URL host, so the
    // per-domain histogram must never be collect()ed. 100k domains:
    // one fat head domain (1000 docs) + 99,999 singletons. With
    // alpha=0.7 and budgetDivisor=1: total=100999, budget=100999,
    // w_head=1000^0.7 (banded 125.892541), w_single=1, sumw =
    // 99999 + 125.892541. Head target = min(1000, floor(budget *
    // w_head / sumw)) — flattened well below its natural share;
    // singleton target = min(1, floor(budget / sumw)) = 1.
    val nDom = 100000
    val head = spark.range(1000).select(
      $"id".as("doc_id"), lit("host-0").as("lang"))
    val tail = spark.range(1L, nDom.toLong).select(
      ($"id" + 1000000L).as("doc_id"),
      concat(lit("host-"), $"id").as("lang"))
    val docs = head.unionByName(tail)
    val sel = CorpusOps.temperatureMixture(
      docs, alpha = 0.7, budgetDivisor = 1)
    val byDom = sel.groupBy($"domain").count()
    // every singleton keeps its one doc; the head is flattened to
    // exactly floor(budget * w_head / sumw)
    val sumw = 99999.0 + BigDecimal(math.pow(1000.0, 0.7))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val headK = math.floor(100999.0 *
      BigDecimal(math.pow(1000.0, 0.7))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble / sumw)
      .toLong
    assert(headK < 1000, "head must be flattened below natural count")
    val got = byDom.filter($"domain" === "host-0").head().getLong(1)
    assert(got == headK, s"head target $got != $headK")
    assert(byDom.filter($"domain" =!= "host-0").agg(max($"count"))
      .head().getLong(0) == 1L)
    assert(sel.count() == headK + (nDom - 1))
  }

  test("chunkDocs: hand-computed boundaries, full coverage, portability") {
    val df = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""))
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkDocs(df, size = 4, overlap = 2)
      .as[(Long, Long, String)].collect().toSet
    // doc 1: stride 2, starts 0,2,4,6,8 -> abcd cdef efgh ghij ij
    assert(got == Set(
      (1L, 0L, "abcd"), (1L, 1L, "cdef"), (1L, 2L, "efgh"),
      (1L, 3L, "ghij"), (1L, 4L, "ij"),
      (2L, 0L, "xy")))
    // every character position is covered by at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap { case (_, cid, c) =>
      val start = cid.toInt * 2
      start until (start + c.length)
    }
    assert(covered == (0 until 10).toSet)
    intercept[IllegalArgumentException] {
      CorpusOps.chunkDocs(df, size = 4, overlap = 4)
    }
  }

  test("withSplit is deterministic, content-keyed, and ~13/2/1") {
    val docs = Tables.load(spark, sf, "documents")
    val a = CorpusOps.withSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = CorpusOps.withSplit(docs.repartition(7)).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b, "split assignment must survive reshuffling")
    // duplicate text => same split (content-keyed): append a copy row
    val dup = docs.limit(1).withColumn("doc_id", lit(999999L))
    val withDup = CorpusOps.withSplit(docs.limit(1).unionByName(dup))
      .select("split").as[String].collect()
    assert(withDup.distinct.length == 1)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
  }

  test("epochShuffle equals the naive global row_number, is seed-" +
    "sensitive, layout-independent, and never plans a single-" +
    "partition global sort") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf, "documents")
    def naive(seed: Long): Map[Long, Long] = docs
      .select($"doc_id",
        md5(concat_ws("|", lit(seed), $"doc_id")).as("skey"))
      .withColumn("pos",
        row_number().over(Window.orderBy($"skey", $"doc_id")) - 1)
      .select($"doc_id", $"pos".cast("long"))
      .as[(Long, Long)].collect().toMap
    val got42 = CorpusOps.epochShuffle(docs, 42L)
      .as[(Long, Long)].collect().toMap
    assert(got42 == naive(42L))
    // positions are a permutation of 0..N-1
    assert(got42.values.toSeq.sorted == (0L until got42.size).toSeq)
    // a different seed is a different permutation (epochs decorrelate)
    val got7 = CorpusOps.epochShuffle(docs, 7L)
      .as[(Long, Long)].collect().toMap
    assert(got7 == naive(7L) && got7 != got42)
    // content-keyed: the order survives input reshuffling
    val again = CorpusOps.epochShuffle(docs.repartition(13), 42L)
      .as[(Long, Long)].collect().toMap
    assert(again == got42)
    // the global order is assembled DISTRIBUTED: many output
    // partitions, each holding one contiguous position range, ranges
    // tiling 0..N-1 in partition order — the naive row_number's
    // Window(orderBy) would collapse everything into one partition
    val parts = CorpusOps.epochShuffle(docs, 42L)
      .select($"pos").as[Long].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val s = it.toSeq
        if (s.isEmpty) Iterator.empty
        else Iterator((pid, s.min, s.max, s.size.toLong))
      }.collect().sortBy(_._1)
    assert(parts.length > 1, "global sort must not run on one partition")
    parts.foreach { case (pid, lo, hi, n) =>
      assert(hi - lo + 1 == n, s"partition $pid positions not contiguous")
    }
    assert(parts.head._2 == 0L && parts.last._3 == got42.size - 1L)
    parts.sliding(2).foreach { case Array((_, _, hi, _), (_, lo, _, _)) =>
      assert(lo == hi + 1, "partition ranges must tile in order")
    case _ => ()
    }
  }

  test("dsirSelect ranks target-like raw docs first, never emits " +
    "target docs, and the lr table broadcasts") {
    // target vocabulary: alpha/beta/gamma. Raw doc 10 speaks it;
    // raw doc 11 is out-of-distribution; raw doc 12 mixes.
    val docs = Seq(
      (7L, "alpha beta gamma alpha beta"),   // target (7 % 7 == 0)
      (14L, "beta gamma alpha beta gamma"),  // target
      (10L, "alpha beta gamma beta"),
      (11L, "xray yankee zulu quebec"),
      (12L, "alpha xray beta zulu")
    ).toDF("doc_id", "text")
    val got = CorpusOps.dsirSelect(docs,
      isTarget = col("doc_id") % 7 === 0, k = 10)
    val rows = got.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._1).toSet == Set(10L, 11L, 12L),
      "every raw doc scored, no target doc emitted")
    val w = rows.toMap
    assert(w(10L) > w(12L) && w(12L) > w(11L),
      s"in-distribution must outrank mixed must outrank OOD: $w")
    assert(got.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "the bucket log-ratio table must broadcast")
  }

  test("dsirSelect weight equals the driver-recomputed importance " +
    "weight (hashed buckets, add-one smoothing)") {
    val docs = Tables.load(spark, sf, "documents")
    val got = CorpusOps.dsirSelect(docs,
      isTarget = col("doc_id") % 7 === 0, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // brute force on the driver with the same arithmetic
    val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val B = 1024
    def bucketsOf(text: String): Seq[Int] =
      text.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq.map { tok =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(tok.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        (java.lang.Long.parseLong(hex, 16) % B).toInt
      }
    val (tgt, raw) = all.partition(_._1 % 7 == 0)
    val ct = new Array[Long](B); val cr = new Array[Long](B)
    tgt.foreach(d => bucketsOf(d._2).foreach(b => ct(b) += 1))
    raw.foreach(d => bucketsOf(d._2).foreach(b => cr(b) += 1))
    val (tt, tr) = (ct.sum, cr.sum)
    val lr = Array.tabulate(B) { b =>
      val v = math.log((ct(b) + 1).toDouble / (tt + B)) -
        math.log((cr(b) + 1).toDouble / (tr + B))
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    got.foreach { case (id, weight) =>
      val expect = raw.find(_._1 == id).map(d =>
        bucketsOf(d._2).map(lr).sum.toDouble).get
      assert(math.abs(weight - expect) < 1e-12,
        s"doc $id: got $weight expected $expect")
    }
  }

  test("repeatedSpans merges overlapping duplicate windows into " +
    "maximal spans; clean docs are absent") {
    val shared10 = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10" // 10 tokens
    val docs = Seq(
      (1L, s"$shared10 unique1a unique1b"),
      (2L, s"prefix2a prefix2b $shared10"),
      (3L, "clean3a clean3b clean3c clean3d clean3e clean3f " +
        "clean3g clean3h clean3i"),
      // within-doc repeat: the same 8 tokens twice
      (4L, "r1 r2 r3 r4 r5 r6 r7 r8 gap r1 r2 r3 r4 r5 r6 r7 r8")
    ).toDF("doc_id", "text")
    val got = DedupOps.repeatedSpans(docs, n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // docs 1/2: a 10-token shared run = three overlapping 8-windows
    // (pos 0..2 resp. 2..4) merging into ONE 10-token span
    assert(got(1L) == (1L, 10L), s"doc1: ${got.get(1L)}")
    assert(got(2L) == (1L, 10L), s"doc2: ${got.get(2L)}")
    // doc 4: both copies of the repeated 8-run are duplicated spans,
    // separated by 'gap' -> two spans, 16 tokens
    assert(got(4L) == (2L, 16L), s"doc4: ${got.get(4L)}")
    assert(!got.contains(3L), "clean doc must be absent")
  }

  test("qualityBuckets: distributed rank-band equals the naive global " +
    "ordering; bands balanced within one; full coverage") {
    val rows = TextOps.qualityBuckets(spark, sf, nBuckets = 3)
      .as[(Long, Double, Int)].collect()
    val n = rows.length
    assert(n > 0)
    // re-derive every band from the naive driver-side global sort —
    // the exact contract the range-exchange prefix-sum must match
    val expected = rows.sortBy { case (id, sc, _) => (-sc, id) }
      .zipWithIndex
      .map { case ((id, _, _), rank) => id -> ((rank.toLong * 3) / n).toInt }
      .toMap
    rows.foreach { case (id, _, b) =>
      assert(b == expected(id), s"doc $id: got band $b, want ${expected(id)}")
    }
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0, 1, 2))
    assert(sizes.values.max - sizes.values.min <= 1,
      s"unbalanced bands: $sizes")
    // every scored document appears exactly once
    assert(rows.map(_._1).distinct.length == n)
  }
}
