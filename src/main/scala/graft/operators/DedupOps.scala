package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for LLM training-data pipelines: exact,
  * normalized-exact, exact n-gram Jaccard (inverted-index join), MinHash
  * LSH and SimHash. Everything is groupBy/join-shaped — shuffle-parallel,
  * no driver-side collection — so the same plans run on a 1000-executor
  * cluster over 100 TB of documents.
  */
object DedupOps {

  /** Exact dedup: one survivor (min id) per identical text + copy count.
    * Plain hash aggregation — map-side partial agg, single shuffle.
    * At 100 TB scale group by a 128-bit fingerprint instead of the raw
    * text to cut shuffle width (see `fingerprint` / q38). */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Exact dedup after canonical normalization (case/punct/whitespace). */
  def normalized(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextFunctions.normText(col(textCol)).as("_norm"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Distinct word n-gram shingles per document: (doc_id, shingle).
    * Docs shorter than n words produce no shingles. */
  def shingles(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id", n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w)-$n), i -> concat_ws(' ', slice(w, i+1, $n)))"
      )).as("shingle"))
      .distinct()

  /** EXACT n-gram Jaccard near-dup pairs via inverted-index self-join:
    * pairs sharing >= 1 shingle get their true Jaccard; keep >= minJaccard.
    *
    * This is the exact (oracle-checkable) path; the shingle self-join is
    * the classic inverted-index candidate generator — cost is bounded by
    * sum over shingles of df^2, so at 100 TB you first drop ultra-frequent
    * shingles (maxDf) or switch to [[minHashLsh]]. */
  def ngramJaccard(docs: DataFrame, minJaccard: Double = 0.5,
                   n: Int = 3, maxDf: Option[Int] = None): DataFrame = {
    var sh = shingles(docs, n = n)
    maxDf.foreach { m =>
      val hot = sh.groupBy("shingle").count().filter(col("count") > m)
        .select("shingle")
      sh = sh.join(hot, Seq("shingle"), "left_anti")
    }
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(cnt.as("ca"), col("d1") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("d2") === col("cb.doc_id"))
      .select(col("d1"), col("d2"), col("inter"),
        (col("inter") / (col("ca.n") + col("cb.n") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signatures: k permutations approximated by k seeded xxhash64
    * draws; one wide aggregate (k min() columns) = single shuffle with
    * map-side combine — no per-position explode. */
  def minHashSignatures(sh: DataFrame, k: Int = 64): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"_h$i"))
    sh.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"_h$i")): _*).as("sig"))
  }

  /** MinHash + LSH banding near-dup candidates with estimated Jaccard
    * (fraction of matching signature positions). bands*rowsPerBand = k.
    * Candidate generation is an equi-join on (band, bandHash) — fully
    * shuffle-parallel; collision probability follows the standard
    * (1-(1-s^r)^b) S-curve. */
  def minHashLsh(docs: DataFrame, k: Int = 64, bands: Int = 16,
                 minEstJaccard: Double = 0.5, shingleN: Int = 3): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = minHashSignatures(shingles(docs, n = shingleN), k)
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64(lit(j), expr(s"slice(sig, ${j * r + 1}, $r)")).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), col("sig"),
      explode(array(bandStructs: _*)).as("bk"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(first(col("a.sig")).as("s1"), first(col("b.sig")).as("s2"))
    cand.select(col("d1"), col("d2"),
        (aggregate(zip_with(col("s1"), col("s2"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash per document over distinct word tokens, built from 64
    * conditional-sum aggregate columns (one shuffle, map-side combine),
    * then OR-folded into a single long. */
  def simHash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
      .withColumn("_h", xxhash64(col("tok")))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"_b$b")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val hashCol = (0 until 64)
      .map(b => when(col(s"_b$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), hashCol.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, blocked
    * by 16-bit bands: distance <= 3 guarantees at least one of the 4 bands
    * matches exactly (pigeonhole), so candidates come from an equi-join. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simHash(docs)
    val bandStructs = (0 until 4).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL).as("bv"))
    }
    val buckets = sh.select(col("doc_id"), col("simhash"),
      explode(array(bandStructs: _*)).as("bk"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(first(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
        .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
