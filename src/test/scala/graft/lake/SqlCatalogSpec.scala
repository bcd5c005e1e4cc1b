package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** The DSv2 SQL catalog over the lake ([[GraftCatalog]]): pure-SQL DDL,
  * DML, time travel, metadata tables, pushdown, and ALTER — installed
  * on a live session with nothing but confs. */
class SqlCatalogSpec extends SparkSuite {

  private lazy val wh = tmpDir("sqlcat-wh")

  private def install(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
  }

  test("CREATE TABLE / INSERT INTO / SELECT round-trips through SQL") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql(
      "CREATE TABLE graft.sqlns.t1 (id BIGINT, grp STRING, v DOUBLE)")
    spark.sql(
      """INSERT INTO graft.sqlns.t1
        |SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END,
        |       CAST(id AS DOUBLE) / 4 FROM range(100)""".stripMargin)
    val total = spark.sql(
      "SELECT count(*) AS n FROM graft.sqlns.t1").head.getLong(0)
    assert(total == 100)
    val agg = spark.sql(
      """SELECT grp, count(*) AS n, CAST(sum(v) AS DECIMAL(18,4)) AS s
        |FROM graft.sqlns.t1 GROUP BY grp ORDER BY grp""".stripMargin)
      .collect()
    assert(agg.toSeq == Seq(
      Row("a", 50L, new java.math.BigDecimal("612.5000")),
      Row("b", 50L, new java.math.BigDecimal("625.0000"))))
    // second INSERT is a second lake commit (snapshot history grows)
    spark.sql(
      "INSERT INTO graft.sqlns.t1 SELECT id + 100, 'c', 0.0 FROM range(10)")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.t1")
      .head.getLong(0) == 110)
  }

  test("CREATE OR REPLACE TABLE (plain and CTAS) replaces the " +
    "incarnation: fresh history, fresh uuid, new content") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("DROP TABLE IF EXISTS graft.sqlns.corep")
    spark.sql("CREATE TABLE graft.sqlns.corep AS SELECT id FROM range(9)")
    val cat = new LakeCatalog(spark, wh)
    val uuid1 = cat.table("sqlns", "corep").incarnationId
    spark.sql("CREATE OR REPLACE TABLE graft.sqlns.corep AS " +
      "SELECT id, id * 2 AS dbl FROM range(4)")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.corep")
      .head.getLong(0) == 4)
    assert(spark.table("graft.sqlns.corep").schema.fieldNames.toSeq
      == Seq("id", "dbl"))
    val t2 = cat.table("sqlns", "corep")
    assert(t2.incarnationId != uuid1,
      "replace must mint a fresh incarnation")
    // plain (schema-only) replace
    spark.sql("CREATE OR REPLACE TABLE graft.sqlns.corep (k STRING)")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.corep")
      .head.getLong(0) == 0)
    assert(spark.table("graft.sqlns.corep").schema.fieldNames.toSeq
      == Seq("k"))
  }

  test("catalog surfaces: SHOW TABLES / DESCRIBE / spark.table") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE IF NOT EXISTS graft.sqlns.t_show (id INT)")
    val tables = spark.sql("SHOW TABLES IN graft.sqlns")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tables.contains("t_show"))
    val desc = spark.sql("DESCRIBE TABLE graft.sqlns.t_show")
      .select("col_name").collect().map(_.getString(0))
    assert(desc.contains("id"))
    assert(spark.table("graft.sqlns.t_show").schema ==
      StructType(Seq(StructField("id", IntegerType))))
  }

  test("filter pushdown reaches readWhere: pruned files, exact rows") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.pruned (k BIGINT, s STRING)")
    // three appends -> three files with disjoint k ranges
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO graft.sqlns.pruned " +
        s"SELECT id + ${b * 1000}, concat('r', id) FROM range(100)")
    }
    val cat = new LakeCatalog(spark, wh)
    val t = cat.table("sqlns", "pruned")
    val total = t.dataFiles.size
    // manifest range stats exclude the first two inserts' files
    val kept = t.pruneFiles(col("k") >= lit(2000L))
    assert(kept.size == total / 3,
      s"expected 1/3 of $total files to survive, got ${kept.size}")
    val rows = spark.sql(
      "SELECT k FROM graft.sqlns.pruned WHERE k >= 2000 ORDER BY k")
      .collect()
    assert(rows.length == 100 && rows.head.getLong(0) == 2000L &&
      rows.last.getLong(0) == 2099L)
    // residual-only filter (no exact translation) still evaluates fully
    val mod = spark.sql(
      "SELECT count(*) FROM graft.sqlns.pruned WHERE k % 7 = 0")
      .head.getLong(0)
    assert(mod == (0 until 3).map(b =>
      (0 until 100).count(i => (i + b * 1000) % 7 == 0)).sum)
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel in SQL") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.tt (id BIGINT)")
    spark.sql("INSERT INTO graft.sqlns.tt SELECT id FROM range(10)")
    val cat = new LakeCatalog(spark, wh)
    val v1 = cat.table("sqlns", "tt").currentVersion
    spark.sql("INSERT INTO graft.sqlns.tt SELECT id + 10 FROM range(5)")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.tt")
      .head.getLong(0) == 15)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.sqlns.tt VERSION AS OF $v1")
      .head.getLong(0) == 10)
    val tsMs = cat.table("sqlns", "tt").snapshots
      .find(_.version == v1).get.committedAtMs
    val ts = new java.sql.Timestamp(tsMs).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft.sqlns.tt TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == 10)
  }

  test("VERSION AS OF resolves snapshot TAGS by name (the SQL face of " +
    "createTag)") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("DROP TABLE IF EXISTS graft.sqlns.tagged")
    spark.sql("CREATE TABLE graft.sqlns.tagged (id BIGINT)")
    spark.sql("INSERT INTO graft.sqlns.tagged SELECT id FROM range(10)")
    val t = new LakeCatalog(spark, wh).table("sqlns", "tagged")
    t.createTag("audit-2026q1")
    spark.sql("INSERT INTO graft.sqlns.tagged SELECT id + 10 FROM range(5)")
    assert(spark.sql(
      "SELECT count(*) FROM graft.sqlns.tagged VERSION AS OF 'audit-2026q1'")
      .head.getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.tagged")
      .head.getLong(0) == 15)
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft.sqlns.tagged VERSION AS OF 'nope'")
        .collect()
    }
    assert(ex.getMessage.contains("neither a snapshot version"),
      ex.getMessage.take(300))
    // the ACTIVE WAP branch is readable BY NAME (readBranch's audit
    // contract from SQL) while regular reads keep the pinned main
    t.createBranch("wap-audit")
    spark.sql("INSERT INTO graft.sqlns.tagged SELECT id + 100 FROM range(3)")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.tagged")
      .head.getLong(0) == 15, "pin pierced by a regular read")
    assert(spark.sql(
      "SELECT count(*) FROM graft.sqlns.tagged VERSION AS OF 'wap-audit'")
      .head.getLong(0) == 18, "staged head not served by branch name")
    t.abandonBranch("wap-audit")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.tagged")
      .head.getLong(0) == 15)
  }

  test("PARTITIONED BY (identity + days transform + bucket) via SQL") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql(
      """CREATE TABLE graft.sqlns.part
        |(id BIGINT, ts TIMESTAMP, region STRING)
        |PARTITIONED BY (region, days(ts), bucket(4, id))""".stripMargin)
    val cat = new LakeCatalog(spark, wh)
    val t = cat.table("sqlns", "part")
    assert(t.partitionSpecs == Seq("region", "days(ts)"))
    assert(t.bucketSpec.contains(("id", 4)))
    assert(t.properties.get(LakeTable.BucketHashProp)
      .contains(LakeTable.SparkBucketHash))
    spark.sql(
      """INSERT INTO graft.sqlns.part
        |SELECT id, timestamp'2026-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0),
        |       CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END
        |FROM range(48)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.part")
      .head.getLong(0) == 48)
    // partition pruning on the identity column: only eu files planned
    assert(t.pruneFiles(col("region") === "us").nonEmpty)
    val eu = spark.sql(
      "SELECT count(*) FROM graft.sqlns.part WHERE region = 'eu'")
      .head.getLong(0)
    assert(eu == 24)
    // truncate transform: SQL DDL -> physical _p_trunc<w>_<col> ->
    // partitionSpecs/SHOW CREATE round-trip
    spark.sql(
      """CREATE TABLE graft.sqlns.part_tr (id BIGINT, code STRING)
        |PARTITIONED BY (truncate(2, code))""".stripMargin)
    spark.sql("INSERT INTO graft.sqlns.part_tr " +
      "SELECT id, concat('ab', CAST(id % 3 AS STRING)) FROM range(9)")
    assert(cat.table("sqlns", "part_tr").partitionSpecs ==
      Seq("truncate(2,code)"))
    val ddl = spark.sql("SHOW CREATE TABLE graft.sqlns.part_tr")
      .head.getString(0)
    assert(ddl.contains("truncate(2, code)") && !ddl.contains("_p_"), ddl)
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.part_tr " +
      "WHERE code = 'ab1'").head.getLong(0) == 3)
  }

  test("INSERT OVERWRITE replaces content in one commit; history kept") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.ow (id BIGINT)")
    spark.sql("INSERT INTO graft.sqlns.ow SELECT id FROM range(10)")
    val cat = new LakeCatalog(spark, wh)
    val before = cat.table("sqlns", "ow").currentVersion
    spark.sql(
      "INSERT OVERWRITE graft.sqlns.ow SELECT id + 100 FROM range(3)")
    val t = cat.table("sqlns", "ow")
    assert(t.currentVersion == before + 1) // ONE commit
    assert(spark.sql("SELECT min(id), count(*) FROM graft.sqlns.ow")
      .head == Row(100L, 3L))
    // pre-overwrite snapshot still serves via time travel
    assert(spark.sql(
      s"SELECT count(*) FROM graft.sqlns.ow VERSION AS OF $before")
      .head.getLong(0) == 10)
  }

  test("CTAS creates and loads in one statement") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql(
      """CREATE TABLE graft.sqlns.ctas AS
        |SELECT id, id * 2 AS dbl FROM range(20)""".stripMargin)
    assert(spark.sql(
      "SELECT CAST(sum(dbl) AS BIGINT) FROM graft.sqlns.ctas")
      .head.getLong(0) == 380L)
  }

  test("ALTER TABLE: ADD/RENAME/DROP COLUMN + SET TBLPROPERTIES") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.alt (id BIGINT, a STRING)")
    spark.sql("INSERT INTO graft.sqlns.alt VALUES (1, 'x'), (2, 'y')")
    spark.sql("ALTER TABLE graft.sqlns.alt ADD COLUMN w DOUBLE")
    // old files read null for the new field
    assert(spark.sql(
      "SELECT count(*) FROM graft.sqlns.alt WHERE w IS NULL")
      .head.getLong(0) == 2)
    spark.sql("INSERT INTO graft.sqlns.alt VALUES (3, 'z', 1.5)")
    spark.sql("ALTER TABLE graft.sqlns.alt RENAME COLUMN a TO label")
    // rename keeps the field ID: old files serve data under the new name
    assert(spark.sql(
      "SELECT label FROM graft.sqlns.alt WHERE id = 1")
      .head.getString(0) == "x")
    spark.sql("ALTER TABLE graft.sqlns.alt DROP COLUMN w")
    assert(!spark.table("graft.sqlns.alt").schema.fieldNames
      .contains("w"))
    spark.sql(
      "ALTER TABLE graft.sqlns.alt SET TBLPROPERTIES ('x.y' = 'z')")
    val cat = new LakeCatalog(spark, wh)
    assert(cat.table("sqlns", "alt").properties.get("x.y").contains("z"))
  }

  test("metadata tables serve through SQL: snapshots/files/refs") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.meta1 (id BIGINT)")
    spark.sql("INSERT INTO graft.sqlns.meta1 SELECT id FROM range(5)")
    spark.sql("INSERT INTO graft.sqlns.meta1 SELECT id + 5 FROM range(5)")
    val snaps = spark.sql(
      "SELECT operation FROM graft.sqlns.meta1.snapshots").collect()
    assert(snaps.length == 3) // create + 2 appends
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.meta1.files")
      .head.getLong(0) >= 2)
    assert(spark.sql(
      "SELECT name FROM graft.sqlns.meta1.refs WHERE name = 'main'")
      .collect().length == 1)
  }

  test("aliases resolve through SQL (blue-green read path)") {
    install()
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("sqlns")
    val blue = cat.createTable("sqlns", "serve_blue",
      StructType(Seq(StructField("id", LongType))))
    blue.append(spark.range(7).toDF("id"))
    cat.setAlias("sqlns", "serving", "serve_blue")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.serving")
      .head.getLong(0) == 7)
  }

  test("DROP TABLE and IF EXISTS behavior") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.dropme (id INT)")
    spark.sql("DROP TABLE graft.sqlns.dropme")
    val tables = spark.sql("SHOW TABLES IN graft.sqlns")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(!tables.contains("dropme"))
    spark.sql("DROP TABLE IF EXISTS graft.sqlns.dropme") // no throw
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.sqlns.dropme").collect()
    }
  }

  test("DROP TABLE guards: metadata-table identifiers are never drop " +
    "targets, aliases drop the pointer not the table, DROP NAMESPACE " +
    "without CASCADE raises the contract exception") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dropns")
    // a REAL table named like a metadata table, next to a normal one
    spark.sql("CREATE TABLE graft.dropns.snapshots (id INT)")
    spark.sql("CREATE TABLE graft.dropns.base (id INT)")
    spark.sql("INSERT INTO graft.dropns.base VALUES (1), (2)")
    // DROP of a metadata-table identifier must NOT resolve to the real
    // `snapshots` table in the namespace — it is not a droppable target
    intercept[Exception] {
      spark.sql("DROP TABLE graft.dropns.base.snapshots")
    }
    assert(spark.sql("SELECT count(*) FROM graft.dropns.snapshots")
      .head.getLong(0) == 0, "real table named 'snapshots' survived")
    assert(spark.table("graft.dropns.base").count() == 2)
    // alias: DROP TABLE of the alias removes the pointer, keeps target
    val lakeCat = new LakeCatalog(spark, wh)
    lakeCat.setAlias("dropns", "base_live", "base")
    assert(spark.table("graft.dropns.base_live").count() == 2)
    spark.sql("DROP TABLE graft.dropns.base_live")
    assert(!lakeCat.aliasExists("dropns", "base_live"))
    assert(spark.table("graft.dropns.base").count() == 2,
      "dropping an alias must not touch the target table")
    // non-empty namespace without CASCADE: the TableCatalog contract —
    // NonEmptyNamespaceException from the catalog, rendered by Spark
    // as the proper SQL error condition (not a generic require crash)
    val nsEx = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DROP NAMESPACE graft.dropns")
    }
    assert(nsEx.getCondition != null &&
      nsEx.getCondition.contains("SCHEMA_NOT_EMPTY"),
      s"expected the SCHEMA_NOT_EMPTY condition, got: $nsEx")
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("dropns"))
    // CASCADE drops aliases, tables, and the namespace directory
    spark.sql("DROP NAMESPACE graft.dropns CASCADE")
    assert(!lakeCat.listNamespaces().contains("dropns"))
  }

  test("writes respect CHECK constraints installed on the lake table") {
    install()
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("sqlns")
    val t = cat.createTable("sqlns", "checked",
      StructType(Seq(StructField("id", LongType))))
    t.updateProperties(Map("constraint.pos" -> "id >= 0"))
    spark.sql("INSERT INTO graft.sqlns.checked VALUES (4)")
    intercept[Exception] {
      spark.sql("INSERT INTO graft.sqlns.checked VALUES (-1)")
    }
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.checked")
      .head.getLong(0) == 1)
  }

  test("GraftExtensions swaps catalog reads to the V1 manifest plan") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE IF NOT EXISTS graft.sqlns.ext (id BIGINT)")
    spark.sql("INSERT INTO graft.sqlns.ext SELECT id FROM range(50)")
    // without extensions: the DSv2->V1 shim executes (row-based scan)
    val shimPlan = spark.sql("SELECT id FROM graft.sqlns.ext WHERE id > 10")
      .queryExecution.executedPlan.toString
    assert(shimPlan.contains("GraftLakeScan"), shimPlan.take(400))

    // a FRESH session over the same context, with extensions installed
    val org = spark
    org.sparkContext // force init
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // with a live SparkContext, getOrCreate reads `spark.sql
      // .extensions` from the CONTEXT conf — withExtensions is the
      // public per-builder route
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.graft.warehouse", wh)
      assert(ext ne org, "expected a fresh session")
      assert(ext.sessionState.analyzer.extendedResolutionRules
        .exists(_.isInstanceOf[GraftV1ReadRule]),
        "GraftV1ReadRule not injected: " +
          ext.sessionState.analyzer.extendedResolutionRules.map(_.ruleName))
      val df = ext.sql("SELECT id FROM graft.sqlns.ext WHERE id > 10")
      val plan = df.queryExecution.executedPlan.toString
      // the rule swapped in the V1 manifest relation: vectorized
      // FileScan parquet, no DSv2 row shim
      assert(!plan.contains("GraftLakeScan"), plan.take(400))
      assert(plan.contains("FileScan parquet"), plan.take(400))
      assert(plan.contains("PushedFilters: [IsNotNull(id), " +
        "GreaterThan(id,10)]"), plan.take(600))
      assert(df.count() == 39)
      // time travel + the swap compose
      val cat = new LakeCatalog(ext, wh)
      val v = cat.table("sqlns", "ext").currentVersion
      ext.sql("INSERT INTO graft.sqlns.ext SELECT id + 100 FROM range(5)")
      assert(ext.sql(
        s"SELECT count(*) FROM graft.sqlns.ext VERSION AS OF $v")
        .head.getLong(0) == 50)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(org)
      SparkSession.setActiveSession(org)
    }
  }

  test("shim-route statistics: the scan reports manifest-exact " +
    "rows/bytes (pruned and projection-pro-rated); upstream " +
    "V1ScanWrapper hides them from static planning (pinned), AQE " +
    "rescues the broadcast conf-only, and the extensions route " +
    "broadcasts statically") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.statns")
    spark.sql("DROP TABLE IF EXISTS graft.statns.dim")
    spark.sql("DROP TABLE IF EXISTS graft.statns.fact")
    spark.sql("CREATE TABLE graft.statns.dim (k BIGINT, name STRING)")
    spark.sql("INSERT INTO graft.statns.dim " +
      "SELECT id, concat('n', id) FROM range(20)")
    spark.sql("CREATE TABLE graft.statns.fact (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.statns.fact " +
      "SELECT id % 20, CAST(id AS DOUBLE) FROM range(100000)")
    val lake = new LakeCatalog(spark, wh).table("statns", "fact")
    val (fullRows, fullBytes) = lake.scanStats(None)
    assert(fullRows == 100000L && fullBytes > 0L)

    // 1. the shim Scan implements SupportsReportStatistics with
    //    manifest numbers, projection-pro-rated
    val t = new GraftSqlTable("graft.statns.fact", lake, None)
    val sb = t.newScanBuilder(new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
      .asInstanceOf[GraftScanBuilder]
    sb.pruneColumns(StructType(Seq(StructField("k", LongType))))
    val st = sb.build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    assert(st.numRows.getAsLong == 100000L)
    assert(st.sizeInBytes.getAsLong > 0L &&
      st.sizeInBytes.getAsLong < fullBytes,
      "narrow projection must report pro-rated bytes, " +
        s"got ${st.sizeInBytes} vs full $fullBytes")
    // ...and they ARE served on the pre-pushdown relation
    val rel = spark.table("graft.statns.fact").queryExecution.analyzed
      .collectLeaves().head
    assert(rel.stats.rowCount.contains(BigInt(100000)) ||
      rel.stats.sizeInBytes < BigInt(Long.MaxValue) / 4,
      s"relation-level stats not served: ${rel.stats}")

    // 2. PINNED upstream limitation (Spark 4.1 V2ScanRelationPushDown):
    //    every V1Scan is wrapped in V1ScanWrapper, which does not
    //    forward SupportsReportStatistics — so STATIC planning on the
    //    conf-only route still sees defaultSizeInBytes and plans
    //    sort-merge. If this assertion ever flips after a Spark
    //    upgrade, delete the AQE crutch below and assert the static
    //    broadcast directly.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val joinSql =
      """SELECT d.name, sum(f.v) AS s
        |FROM graft.statns.fact f JOIN graft.statns.dim d ON f.k = d.k
        |GROUP BY d.name""".stripMargin
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val statik = spark.sql(joinSql).queryExecution.executedPlan
      val scans = statik.collectLeaves().map(_.getClass.getSimpleName)
      assert(statik.toString.contains("SortMergeJoin"),
        "upstream V1ScanWrapper now forwards stats? plan:\n" +
          statik.toString.take(800) + s"\nleaves: $scans")

      // 3. conf-only at scale: AQE's runtime re-plan converts the join
      //    to broadcast from the dim side's actual shuffle size
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val df = spark.sql(joinSql)
      // materialize THIS plan (count() would plan a different query),
      // so the adaptive plan is final when inspected
      assert(df.collect().length == 20)
      assert(df.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "AQE did not rescue the conf-only join:\n" +
          df.queryExecution.executedPlan.toString.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)

    // 4. the recommended install (GraftExtensions V1 swap) broadcasts
    //    STATICALLY: the manifest FileIndex serves sizeInBytes
    val orig = spark
    orig.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.graft.warehouse", wh)
      ext.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = ext.sql(joinSql).queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          "extensions route must broadcast statically:\n" +
            plan.take(1200))
      } finally ext.conf.set("spark.sql.adaptive.enabled", aqe)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("GraftV1ReadRule memoizes the swapped V1 plan per (table root, " +
    "version): a self-join builds the manifest read ONCE, a new commit " +
    "invalidates, and freshened exprIds keep the self-join sound") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("DROP TABLE IF EXISTS graft.sqlns.memo")
    spark.sql("CREATE TABLE graft.sqlns.memo (id BIGINT)")
    spark.sql("INSERT INTO graft.sqlns.memo SELECT id FROM range(50)")
    val org = spark
    org.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.graft.warehouse", wh)
      def builds = GraftV1ReadRule.planBuilds.get()
      val b0 = builds
      // two references to the same (root, version): one build, and the
      // per-branch exprId freshening must keep the join unambiguous
      val selfJoin = ext.sql(
        """SELECT count(*) FROM graft.sqlns.memo a
          |JOIN graft.sqlns.memo b ON a.id = b.id + 1""".stripMargin)
      assert(selfJoin.head.getLong(0) == 49)
      assert(builds - b0 == 1,
        s"self-join rebuilt the V1 plan ${builds - b0} times, want 1")
      // a repeat of the same query at the same version: zero rebuilds
      assert(ext.sql(
        """SELECT count(*) FROM graft.sqlns.memo a
          |JOIN graft.sqlns.memo b ON a.id = b.id + 1""".stripMargin)
        .head.getLong(0) == 49)
      assert(builds - b0 == 1, "repeat query must serve from the cache")
      // a new commit moves the version: exactly one fresh build, and
      // the read sees the new rows (no stale-plan serving)
      ext.sql("INSERT INTO graft.sqlns.memo SELECT id + 100 FROM range(5)")
      assert(ext.sql("SELECT count(*) FROM graft.sqlns.memo")
        .head.getLong(0) == 55)
      assert(builds - b0 == 2,
        s"post-commit query must rebuild once, saw ${builds - b0 - 1}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(org)
      SparkSession.setActiveSession(org)
    }
  }

  test("GraftV1ReadRule plan cache is incarnation-aware: DROP + CREATE " +
    "of the same table name serves the NEW table, never the dead " +
    "incarnation's file list") {
    install()
    val org = spark
    org.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.graft.warehouse", wh)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
      // incarnation 1: same (root, version) keys as incarnation 2
      // will have — versions are dense from 0 per directory
      ext.sql("DROP TABLE IF EXISTS graft.sqlns.reinc")
      ext.sql("CREATE TABLE graft.sqlns.reinc AS " +
        "SELECT id FROM range(7)")
      assert(ext.sql("SELECT count(*) FROM graft.sqlns.reinc")
        .head.getLong(0) == 7)
      // drop deletes the directory; recreate mints fresh v0/v1 — a
      // (root, version)-keyed cache would now serve the dead
      // incarnation's analyzed plan, whose FileIndex lists parquet
      // files that no longer exist
      ext.sql("DROP TABLE graft.sqlns.reinc")
      ext.sql("CREATE TABLE graft.sqlns.reinc AS " +
        "SELECT id FROM range(31)")
      assert(ext.sql("SELECT count(*) FROM graft.sqlns.reinc")
        .head.getLong(0) == 31,
        "second incarnation served stale cached state")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(org)
      SparkSession.setActiveSession(org)
    }
  }

  /** Fresh extensions session over the shared context (row-level DML
    * executes through the injected planner strategy). */
  private def withExtSession[A](f: SparkSession => A): A = {
    val orig = spark
    orig.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.graft.warehouse", wh)
      f(ext)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("SQL UPDATE routes merge-on-read by default: one commit of " +
    "position deletes + inserts, zero data files rewritten, time " +
    "travel intact; copy-on-write honors update.mode") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
      ext.sql("DROP TABLE IF EXISTS graft.rl.upd")
      ext.sql("CREATE TABLE graft.rl.upd (id BIGINT, grp STRING, v DOUBLE)")
      ext.sql("""INSERT INTO graft.rl.upd
        |SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END,
        |       CAST(id AS DOUBLE) FROM range(100)""".stripMargin)
      val t = new LakeCatalog(ext, wh).table("rl", "upd")
      val filesBefore = t.dataFiles.map(_.path).toSet
      val vBefore = t.currentVersion
      ext.sql("UPDATE graft.rl.upd SET v = v * 10 WHERE id < 5")
      assert(t.currentVersion == vBefore + 1, "UPDATE must be ONE commit")
      // the updated rows land as ONE new appended file; every original
      // file survives untouched (zero rewrites)
      assert(filesBefore.subsetOf(t.dataFiles.map(_.path).toSet),
        "merge-on-read UPDATE must not rewrite data files")
      assert(t.meta("delete_files").count() > 0,
        "position-delete files must carry the update")
      assert(ext.sql("SELECT sum(v) FROM graft.rl.upd WHERE id < 5")
        .head.getDouble(0) == 100.0)
      assert(ext.sql("SELECT count(*) FROM graft.rl.upd")
        .head.getLong(0) == 100)
      // time travel serves the pre-update state
      assert(ext.sql(
        s"SELECT sum(v) FROM graft.rl.upd VERSION AS OF $vBefore " +
          "WHERE id < 5").head.getDouble(0) == 10.0)
      // copy-on-write mode: affected files rewritten, no MOR debt added
      ext.sql("ALTER TABLE graft.rl.upd " +
        "SET TBLPROPERTIES ('update.mode'='copy-on-write')")
      val delFilesBefore = t.meta("delete_files").count()
      val files2 = t.dataFiles.map(_.path).toSet
      ext.sql("UPDATE graft.rl.upd SET grp = 'z' WHERE id >= 90")
      assert(t.meta("delete_files").count() == delFilesBefore,
        "copy-on-write UPDATE must not add delete files")
      assert(t.dataFiles.map(_.path).toSet != files2,
        "copy-on-write UPDATE must rewrite the affected files")
      assert(ext.sql(
        "SELECT count(*) FROM graft.rl.upd WHERE grp = 'z'")
        .head.getLong(0) == 10)
      assert(ext.sql("SELECT count(*) FROM graft.rl.upd")
        .head.getLong(0) == 100)
    }
  }

  test("SQL MERGE INTO: matched update/delete (conditional), not-" +
    "matched insert, not-matched-by-source, cardinality check, one " +
    "commit per statement") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
      ext.sql("DROP TABLE IF EXISTS graft.rl.tgt")
      ext.sql("DROP TABLE IF EXISTS graft.rl.src")
      ext.sql("CREATE TABLE graft.rl.tgt (id BIGINT, grp STRING, v DOUBLE)")
      ext.sql("INSERT INTO graft.rl.tgt " +
        "SELECT id, 'old', CAST(id AS DOUBLE) FROM range(10)")
      ext.sql("CREATE TABLE graft.rl.src (id BIGINT, v DOUBLE)")
      // overlaps 8..9, new 10..12; 3 is absent from src
      ext.sql("INSERT INTO graft.rl.src SELECT id, -1.0 FROM range(8, 13)")
      val t = new LakeCatalog(ext, wh).table("rl", "tgt")
      val vBefore = t.currentVersion
      ext.sql(
        """MERGE INTO graft.rl.tgt t USING graft.rl.src s ON t.id = s.id
          |WHEN MATCHED AND t.id = 8 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.v, grp = 'upd'
          |WHEN NOT MATCHED THEN INSERT (id, grp, v) VALUES (s.id, 'new', s.v)
          |WHEN NOT MATCHED BY SOURCE AND t.id = 0 THEN DELETE
          |""".stripMargin)
      assert(t.currentVersion == vBefore + 1, "MERGE must be ONE commit")
      val rows = ext.sql(
        "SELECT id, grp, v FROM graft.rl.tgt ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      // 0 deleted (not matched by source), 8 deleted (matched+cond),
      // 9 updated, 10-12 inserted, 1-7 untouched
      assert(rows.toSeq == (1L to 7L).map(i => (i, "old", i.toDouble)) ++
        Seq((9L, "upd", -1.0), (10L, "new", -1.0), (11L, "new", -1.0),
          (12L, "new", -1.0)), rows.mkString(", "))
      // a source with duplicate join keys must fail the cardinality
      // check, not silently double-apply
      ext.sql("INSERT INTO graft.rl.src VALUES (9, -7.0)")
      val ex = intercept[Exception] {
        ext.sql(
          """MERGE INTO graft.rl.tgt t USING graft.rl.src s ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      }
      assert(ex.getMessage.toLowerCase.contains("merge"),
        s"expected the MERGE cardinality error, got: ${ex.getMessage}")
    }
  }

  test("row-level ops on a hidden-partitioned bucketed table re-derive " +
    "the physical layout for rewritten rows; SELECT _file/_pos works") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
      ext.sql("DROP TABLE IF EXISTS graft.rl.part")
      ext.sql(
        """CREATE TABLE graft.rl.part (id BIGINT, region STRING, v DOUBLE)
          |PARTITIONED BY (region, bucket(4, id))""".stripMargin)
      ext.sql("""INSERT INTO graft.rl.part
        |SELECT id, CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END,
        |       CAST(id AS DOUBLE) FROM range(40)""".stripMargin)
      // moving a row across partitions: the write derives the new
      // partition/bucket columns, never the SQL user
      ext.sql("UPDATE graft.rl.part SET region = 'apac' WHERE id = 4")
      assert(ext.sql("SELECT count(*) FROM graft.rl.part " +
        "WHERE region = 'apac'").head.getLong(0) == 1)
      assert(ext.sql("SELECT count(*) FROM graft.rl.part")
        .head.getLong(0) == 40)
      val t = new LakeCatalog(ext, wh).table("rl", "part")
      // the partition-pruned read finds the moved row in its new home
      assert(t.pruneFiles(col("region") === lit("apac")).nonEmpty)
      // metadata columns select explicitly and stay out of SELECT *
      val meta = ext.sql(
        "SELECT _file, _pos FROM graft.rl.part WHERE id = 4").collect()
      assert(meta.length == 1 && meta(0).getString(0).nonEmpty &&
        meta(0).getLong(1) >= 0L)
      assert(!ext.table("graft.rl.part").columns.contains("_file"))
    }
  }

  test("row-level SQL DML refuses while a WAP branch is staging (the " +
    "scan resolves the pinned main, the commit would land staged) and " +
    "resumes after publish; snapshots stamp Iceberg-parity operations") {
    withExtSession { ext =>
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl")
      ext.sql("DROP TABLE IF EXISTS graft.rl.wapdml")
      ext.sql("CREATE TABLE graft.rl.wapdml (id BIGINT, v DOUBLE)")
      ext.sql("INSERT INTO graft.rl.wapdml " +
        "SELECT id, CAST(id AS DOUBLE) FROM range(20)")
      val t = new LakeCatalog(ext, wh).table("rl", "wapdml")
      t.createBranch("wap-audit-1")
      val ex = intercept[Exception] {
        ext.sql("UPDATE graft.rl.wapdml SET v = 0.0 WHERE id = 3")
      }
      val m = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      assert(m.contains("WAP branch"), m.take(400))
      t.publishBranch("wap-audit-1")
      ext.sql("UPDATE graft.rl.wapdml SET v = 0.0 WHERE id = 3")
      assert(ext.sql(
        "SELECT v FROM graft.rl.wapdml WHERE id = 3")
        .head.getDouble(0) == 0.0)
      // the UPDATE snapshot carries the Iceberg-parity operation label
      val op = ext.sql(
        """SELECT operation FROM graft.rl.wapdml.snapshots
          |ORDER BY version DESC LIMIT 1""".stripMargin)
        .head.getString(0)
      assert(op == "overwrite", s"delta commit stamped '$op'")
    }
  }

  test("conf-only sessions get a clear install instruction for UPDATE/" +
    "MERGE, not a wrong result; translatable DELETE still works " +
    "conf-only via SupportsDelete") {
    // earlier suites/tests may have installed the live-session
    // strategies (GraftEngine does on sqlName) — clear for the
    // duration, restore after
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    try {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rl2")
    spark.sql("DROP TABLE IF EXISTS graft.rl2.noext")
    spark.sql("CREATE TABLE graft.rl2.noext (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.rl2.noext " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    val ex = intercept[Exception] {
      spark.sql("UPDATE graft.rl2.noext SET v = 0.0 WHERE id = 1")
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse(""))).mkString(" | ")
    assert(rootMsg(ex).contains("GraftExtensions"),
      s"expected the install instruction, got: ${rootMsg(ex)}")
    // the metadata-only DELETE route is untouched by the row-level
    // rewrite (OptimizeMetadataOnlyDeleteFromTable swaps back)
    spark.sql("DELETE FROM graft.rl2.noext WHERE id IN (1, 2)")
    assert(spark.sql("SELECT count(*) FROM graft.rl2.noext")
      .head.getLong(0) == 8)
    } finally spark.experimental.extraStrategies = saved
  }

  test("MOR deletes and WAP pinning are visible through SQL reads") {
    install()
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("sqlns")
    val t = cat.createTable("sqlns", "mor",
      StructType(Seq(StructField("id", LongType))))
    t.append(spark.range(10).toDF("id"))
    t.deleteWhereEqual(spark.range(3).toDF("id"), Seq("id"))
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.mor")
      .head.getLong(0) == 7)
    // a staging WAP branch stays invisible to SQL (main pinned)
    t.createBranch("audit")
    t.append(spark.range(100, 105).toDF("id"))
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.mor")
      .head.getLong(0) == 7)
    t.publishBranch("audit")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.mor")
      .head.getLong(0) == 12)
  }

  test("DELETE FROM routes merge-on-read by default: position-delete " +
      "commit, zero data files rewritten, history time-travelable") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.del (id BIGINT, grp STRING)")
    spark.sql(
      """INSERT INTO graft.sqlns.del
        |SELECT id, CASE WHEN id % 3 = 0 THEN 'x' ELSE 'y' END
        |FROM range(90)""".stripMargin)
    val cat = new LakeCatalog(spark, wh)
    val t = cat.table("sqlns", "del")
    val filesBefore = spark.sql(
      "SELECT count(*) FROM graft.sqlns.del.files").head.getLong(0)
    val vBefore = spark.sql(
      "SELECT max(version) FROM graft.sqlns.del.snapshots")
      .head.getInt(0)
    spark.sql("DELETE FROM graft.sqlns.del WHERE grp = 'x' AND id < 30")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.del")
      .head.getLong(0) == 80) // ids 0,3,...,27 -> 10 rows marked
    // MOR: the data-file set is untouched, a delete file carries it
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.del.files")
      .head.getLong(0) == filesBefore)
    assert(spark.sql(
      "SELECT count(*) FROM graft.sqlns.del.delete_files")
      .head.getLong(0) >= 1)
    // pre-delete snapshot still serves the full 90
    assert(spark.sql(
      s"SELECT count(*) FROM graft.sqlns.del VERSION AS OF $vBefore")
      .head.getLong(0) == 90)
    // three-valued semantics ride the lake contract (NULL keeps)
    assert(t.read().filter(col("grp") === "x").count() == 20)
  }

  test("DELETE FROM honors delete.mode=copy-on-write: files rewritten, " +
      "no delete files") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.delcow (id BIGINT) " +
      "TBLPROPERTIES ('delete.mode'='copy-on-write')")
    spark.sql(
      "INSERT INTO graft.sqlns.delcow SELECT id FROM range(50)")
    spark.sql("DELETE FROM graft.sqlns.delcow WHERE id >= 40")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.delcow")
      .head.getLong(0) == 40)
    assert(spark.sql(
      "SELECT count(*) FROM graft.sqlns.delcow.delete_files")
      .head.getLong(0) == 0)
  }

  test("unconditional DELETE is one overwrite commit of the empty set; " +
      "non-translatable predicates are refused CONF-ONLY (with the " +
      "strategies installed they execute via the row-delta path)") {
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    try {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.deltrunc (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.sqlns.deltrunc " +
      "SELECT id, CAST(id AS STRING) FROM range(20)")
    val vBefore = spark.sql(
      "SELECT max(version) FROM graft.sqlns.deltrunc.snapshots")
      .head.getInt(0)
    spark.sql("DELETE FROM graft.sqlns.deltrunc")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.deltrunc")
      .head.getLong(0) == 0)
    // one commit, empty live set, history preserved
    assert(spark.sql(
      "SELECT max(version) FROM graft.sqlns.deltrunc.snapshots")
      .head.getInt(0) == vBefore + 1)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.sqlns.deltrunc VERSION AS OF $vBefore")
      .head.getLong(0) == 20)
    // a predicate with no exact translation must be refused by Spark,
    // not silently half-applied
    spark.sql("INSERT INTO graft.sqlns.deltrunc " +
      "SELECT id, CAST(id AS STRING) FROM range(5)")
    intercept[Exception] {
      spark.sql(
        "DELETE FROM graft.sqlns.deltrunc WHERE length(s) + id > 3")
    }
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.deltrunc")
      .head.getLong(0) == 5)
    } finally spark.experimental.extraStrategies = saved
  }

  test("TRUNCATE TABLE and SHOW CREATE TABLE round-trip") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("CREATE TABLE graft.sqlns.sct (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts), bucket(4, id))")
    spark.sql("INSERT INTO graft.sqlns.sct " +
      "SELECT id, timestamp'2026-01-01' FROM range(10)")
    // SHOW CREATE reproduces the logical DDL: hidden-partitioning
    // transforms round-trip, derived physical columns never leak
    val ddl = spark.sql("SHOW CREATE TABLE graft.sqlns.sct")
      .head.getString(0)
    assert(ddl.contains("PARTITIONED BY (days(ts), bucket(4, id))"), ddl)
    assert(!ddl.contains("_p_days_ts") && !ddl.contains("_bucket"), ddl)
    // TRUNCATE routes through the delete path: one empty-set overwrite
    // commit, history preserved
    val v = spark.sql(
      "SELECT max(version) FROM graft.sqlns.sct.snapshots")
      .head.getInt(0)
    spark.sql("TRUNCATE TABLE graft.sqlns.sct")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.sct")
      .head.getLong(0) == 0)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.sqlns.sct VERSION AS OF $v")
      .head.getLong(0) == 10)
  }

  test("continued SQL INSERTs into a compaction-opted table keep the " +
    "file count bounded (the post-commit ladder gate fires on the V1 " +
    "write path too)") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("DROP TABLE IF EXISTS graft.sqlns.laddered")
    spark.sql(
      """CREATE TABLE graft.sqlns.laddered (id BIGINT, v DOUBLE)
        |TBLPROPERTIES ('compaction.auto.maxFiles'='8')""".stripMargin)
    (0 until 20).foreach(i => spark.sql(
      s"INSERT INTO graft.sqlns.laddered " +
        s"SELECT id + ${i * 100}, 1.0 FROM range(100)"))
    val t = new LakeCatalog(spark, wh).table("sqlns", "laddered")
    assert(t.dataFiles.size <= 16,
      s"20 INSERTs left ${t.dataFiles.size} files — the ladder gate " +
        "did not bound the layout")
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.laddered")
      .head.getLong(0) == 2000)
  }

  test("SHOW CREATE TABLE output is re-executable verbatim to an " +
    "equivalent table; DESCRIBE surfaces partition transforms; SHOW " +
    "TBLPROPERTIES round-trips every property") {
    install()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sqlns")
    spark.sql("DROP TABLE IF EXISTS graft.sqlns.rt")
    spark.sql("DROP TABLE IF EXISTS graft.sqlns.rt_clone")
    spark.sql(
      """CREATE TABLE graft.sqlns.rt
        |(id BIGINT, region STRING, ts TIMESTAMP, code STRING, v DOUBLE)
        |PARTITIONED BY (region, days(ts), truncate(2, code),
        |                bucket(4, id))
        |TBLPROPERTIES ('delete.mode'='copy-on-write', 'owner.team'='ml')
        |""".stripMargin)
    val ddl = spark.sql("SHOW CREATE TABLE graft.sqlns.rt")
      .head.getString(0)
    // re-execute the emitted DDL verbatim, only retargeting the name
    spark.sql(ddl.replace("graft.sqlns.rt", "graft.sqlns.rt_clone"))
    val cat = new LakeCatalog(spark, wh)
    val orig = cat.table("sqlns", "rt")
    val clone = cat.table("sqlns", "rt_clone")
    assert(clone.schema == orig.schema, "schema did not round-trip")
    assert(clone.partitionSpecs == orig.partitionSpecs,
      s"partition specs did not round-trip: ${clone.partitionSpecs} " +
        s"vs ${orig.partitionSpecs}")
    assert(clone.bucketSpec == orig.bucketSpec)
    assert(clone.properties.get("delete.mode").contains("copy-on-write")
      && clone.properties.get("owner.team").contains("ml"),
      s"properties did not round-trip: ${clone.properties}")
    // the clone is a WORKING equivalent, not just a lookalike: writes
    // derive the same hidden layout
    spark.sql("""INSERT INTO graft.sqlns.rt_clone
      |SELECT id, 'eu', timestamp'2026-02-01', concat('ab', id), 1.0
      |FROM range(8)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.sqlns.rt_clone " +
      "WHERE region = 'eu'").head.getLong(0) == 8)
    // DESCRIBE surfaces the partition transforms (not the physical
    // derived columns)
    val desc = spark.sql("DESCRIBE TABLE graft.sqlns.rt").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.exists(_._2 == "days(ts)") &&
      desc.exists(_._2 == "bucket(4, id)"),
      s"partition transforms missing from DESCRIBE: $desc")
    assert(!desc.keys.exists(_.startsWith("_p_")) &&
      !desc.keys.exists(_ == "_bucket"), s"derived columns leaked: " +
        desc.keys.mkString(", "))
    // SHOW TBLPROPERTIES serves the full property map
    val props = spark.sql("SHOW TBLPROPERTIES graft.sqlns.rt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    orig.properties.foreach { case (k, v) =>
      assert(props.get(k).contains(v),
        s"property $k=$v missing from SHOW TBLPROPERTIES: $props")
    }
  }

  test("DELETE FROM works with GraftExtensions installed (the V1 read " +
      "rule must not rewrite the DELETE target)") {
    val org = spark
    org.sparkContext // force init
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions()(_))
        .getOrCreate()
      ext.conf.set("spark.sql.catalog.gext", "graft.lake.GraftCatalog")
      ext.conf.set("spark.sql.catalog.gext.warehouse",
        tmpDir("sqlcat-wh-del"))
      ext.sql("CREATE NAMESPACE IF NOT EXISTS gext.ns")
      ext.sql("CREATE TABLE gext.ns.d (id BIGINT)")
      ext.sql("INSERT INTO gext.ns.d SELECT id FROM range(30)")
      ext.sql("DELETE FROM gext.ns.d WHERE id < 10")
      assert(ext.sql("SELECT count(*) FROM gext.ns.d")
        .head.getLong(0) == 20)
      // read positions still get the V1 swap after the delete
      val plan = ext.sql("SELECT sum(id) FROM gext.ns.d")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("GraftLakeScan"),
        s"extensions session still read through the V1Scan shim:\n$plan")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(org)
      SparkSession.setActiveSession(org)
    }
  }
}
