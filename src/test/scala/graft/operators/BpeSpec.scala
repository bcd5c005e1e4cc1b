package graft.operators

import graft.{SparkSuite, Tables}

/** Distributed BPE merge training: exact hand-computed sequence,
  * determinism under reshuffling, early stop. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learns the hand-computed merge sequence on the classic corpus") {
    // weights: low x5, lower x2, newest x6, widest x3 (Sennrich-style)
    val docs = Seq.fill(5)("low").mkString(" ") ::
      Seq.fill(2)("lower").mkString(" ") ::
      Seq.fill(6)("newest").mkString(" ") ::
      Seq.fill(3)("widest").mkString(" ") :: Nil
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeOps.learnMerges(df, numMerges = 4)
    // hand-computed: pair counts over {low:5, lower:2, newest:6, widest:3}
    // round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (es? no)... tie on 9 ->
    //   lexicographic: (e,s) wins -> "es"
    // round 2: (es,t)=9, (t,</w>)=9 -> (es,t) vs (t,</w>):
    //   "es" < "t" -> (es,t) -> "est"
    // round 3: (est,</w>)=9 -> "est</w>"
    // round 4: (l,o)=7 -> "lo"
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o")))
  }

  test("applyMerge is left-to-right and non-overlapping") {
    assert(BpeOps.applyMerge(Seq("a", "a", "a"), "a", "a") ==
      Seq("aa", "a"))
    assert(BpeOps.applyMerge(Seq("a", "b", "a", "b"), "a", "b") ==
      Seq("ab", "ab"))
    assert(BpeOps.applyMerge(Seq("x"), "a", "b") == Seq("x"))
  }

  test("merge list is identical under repartitioning (determinism)") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val a = BpeOps.learnMerges(docs, numMerges = 6)
    val b = BpeOps.learnMerges(docs.repartition(7), numMerges = 6)
    assert(a == b)
    assert(a.size == 6)
  }

  test("tokenize applies merges in learned order") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"))
    val df = Seq((1L, "lowest")).toDF("doc_id", "text")
    val got = BpeOps.tokenize(df, merges).as[(Long, Long, Seq[String])]
      .head()
    // l o w e s t</w> -> es -> est -> est</w> -> lo:
    // ["lo", "w", "est</w>"]
    assert(got == ((1L, 3L, Seq("lo", "w", "est</w>"))))
    // with no merges, tokens = chars + end marker
    val raw = BpeOps.tokenize(df, Nil).as[(Long, Long, Seq[String])].head()
    assert(raw._2 == 7L)
    // fewer merges can only shorten, never lengthen
    assert(got._2 <= raw._2)
  }

  test("stops early when no pair repeats") {
    val df = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every adjacent pair occurs exactly once -> no rule is learnable
    assert(BpeOps.learnMerges(df, numMerges = 10).isEmpty)
  }

  test("batched merges: same learned list as sequential, strictly " +
    "fewer rounds (VERDICT r04 item 7)") {
    // four disjoint-alphabet word families with distinct counts: the
    // prefix-stop selection batches (family</w> merge, next family's
    // internal merge) pairs, halving rounds without reordering anything
    val words =
      Seq.fill(128)("ab") ++ Seq.fill(64)("cd") ++
      Seq.fill(32)("ef") ++ Seq.fill(16)("gh")
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

    val (seqMerges, seqRounds) =
      BpeOps.learnMergesBatched(df, numMerges = 8, maxBatch = 1)
    val (batched, batchedRounds) =
      BpeOps.learnMergesBatched(df, numMerges = 8, maxBatch = 4)
    assert(seqMerges == batched,
      s"batched diverged: $batched vs $seqMerges")
    assert(seqRounds == 8)
    assert(batchedRounds < seqRounds,
      s"no round saving: $batchedRounds vs $seqRounds")
    // the exact hand-derived order (prefix rule stops at </w> overlaps)
    val eow = BpeOps.EndOfWord
    assert(seqMerges == Seq(("a", "b"), ("ab", eow), ("c", "d"),
      ("cd", eow), ("e", "f"), ("ef", eow), ("g", "h"), ("gh", eow)))
  }

  test("tie guard: a tied witness whose merged successor lex-beats a " +
    "disjoint candidate truncates the batch (exact sequential parity)") {
    // "azr"x6 + "az"x4 + "cd"x6: round-1 pool is (a,z):10 then the
    // count-6 tie group (c,d) < (d,</w>) < (r,</w>) < (z,r). An
    // UNguarded batch would select [(a,z), (c,d)] — but sequentially,
    // applying (a,z) turns witness (z,r) into the NEW pair (az,r),
    // which ties (c,d) at 6 and wins the argmax by lex ("az" < "c").
    // The guard must stop the prefix after (a,z) so every maxBatch
    // learns the identical list.
    val words = Seq.fill(6)("azr") ++ Seq.fill(4)("az") ++ Seq.fill(6)("cd")
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (seqM, _) = BpeOps.learnMergesBatched(df, numMerges = 4, maxBatch = 1)
    val eow = BpeOps.EndOfWord
    assert(seqM == Seq(("a", "z"), ("az", "r"), ("azr", eow), ("c", "d")),
      s"sequential baseline drifted: $seqM")
    for (mb <- Seq(2, 3, 4)) {
      val (batched, _) = BpeOps.learnMergesBatched(df, 4, maxBatch = mb)
      assert(batched == seqM, s"maxBatch=$mb diverged: $batched vs $seqM")
    }
  }

  test("maxBatch = 1 reproduces learnMerges exactly on real documents " +
    "(q79's surface is untouched)") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val viaDefault = BpeOps.learnMerges(docs, numMerges = 12)
    val (viaBatched1, rounds) =
      BpeOps.learnMergesBatched(docs, numMerges = 12, maxBatch = 1)
    assert(viaDefault == viaBatched1)
    assert(rounds == 12)
  }

  test("q79's batched training (maxBatch=4) learns the IDENTICAL " +
    "20-merge list as sequential, in fewer rounds") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val seq = BpeOps.learnMergesBatched(docs, 20, maxBatch = 1)
    val bat = BpeOps.learnMergesBatched(docs, 20, maxBatch = 4)
    assert(bat._1 == seq._1, "batched list diverged from sequential")
    assert(bat._2 < seq._2, s"no round saving: ${bat._2} vs ${seq._2}")
  }
}
