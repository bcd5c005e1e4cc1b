package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EngineSpec extends SparkSuite {
  import spark.implicits._

  test("catalog.sqlName binds the DSv2 SQL catalog to the engine " +
      "warehouse: SQL DDL/DML and the programmatic LakeCatalog see " +
      "the same tables") {
    val wh = tmpDir("engine-sqlcat-wh")
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(wh),
      CatalogConfig(namespace = "ns", sqlName = Some("gsql"))))
    // SQL-created table visible programmatically
    engine.sql("CREATE NAMESPACE IF NOT EXISTS gsql.ns")
    engine.sql("CREATE TABLE gsql.ns.t (id BIGINT)")
    engine.sql("INSERT INTO gsql.ns.t SELECT id FROM range(20)")
    assert(engine.catalog.table("ns", "t").read().count() == 20)
    // programmatic append visible to SQL, incl. DELETE routing
    engine.catalog.table("ns", "t").append(
      spark.range(20, 30).toDF("id"))
    assert(engine.sql("SELECT count(*) FROM gsql.ns.t")
      .head.getLong(0) == 30)
    engine.sql("DELETE FROM gsql.ns.t WHERE id >= 25")
    assert(engine.catalog.table("ns", "t").read().count() == 25)
    // the WHOLE SQL face, not install instructions: binding sqlName
    // also installed the planner strategies, so row-level UPDATE (and
    // writeStream.toTable / dynamic overwrite) work out of the box
    engine.sql("ALTER TABLE gsql.ns.t ADD COLUMN flag STRING")
    engine.sql("UPDATE gsql.ns.t SET flag = 'hot' WHERE id < 3")
    assert(engine.sql(
      "SELECT count(*) FROM gsql.ns.t WHERE flag = 'hot'")
      .head.getLong(0) == 3)
  }

  test("mirror section parses from YAML and startTableMirror keeps an " +
    "exact replica across DML + a mid-stream ADD COLUMN (additive " +
    "evolution on restart)") {
    val yaml =
      s"""storage:
         |  localPath: ${tmpDir("ymir-wh")}
         |iceberg:
         |  defaultNamespace: ymir
         |catalog:
         |  sqlName: gmir
         |mirror:
         |  source: src
         |  target: src_mirror
         |  keyCols: id
         |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yaml)
      .copy(batching = BatchingConfig(availableNow = true))
    assert(cfg.mirror ==
      Some(MirrorConfig("src", "src_mirror", Seq("id"))))
    // keyCols is required — a mirror without a row identity refuses
    intercept[IllegalArgumentException] {
      GraftConfig.fromYamlString(
        "storage:\n  localPath: /tmp/x\nmirror:\n  source: s\n")
    }
    val engine = new GraftEngine(spark, cfg)
    val src = engine.catalog.createTable("ymir", "src",
      spark.range(0).selectExpr("id", "CAST(id AS DOUBLE) v").schema)
    src.append(spark.range(20).selectExpr("id", "CAST(id AS DOUBLE) v"))
    val mc = cfg.mirror.get
    def drive(): graft.lake.LakeTable = {
      val (m, q) = engine.startTableMirror(mc.target, mc.source,
        mc.keyCols)
      q.awaitTermination(); m
    }
    drive() // snapshot
    // DML: a forget + an update propagate through the changelog
    src.deleteWhereEqual(Seq(3L, 7L).toDF("id"), Seq("id"))
    engine.sql("UPDATE gmir.ymir.src SET v = v + 100 WHERE id < 2")
    val mirror = drive()
    def sorted(t: graft.lake.LakeTable): Seq[String] =
      t.read().collect().map(_.toSeq.mkString("|")).toSeq.sorted
    assert(sorted(mirror) == sorted(src), "mirror diverged after DML")
    // SCHEMA DRIFT: source ADD COLUMN between lifecycles — the restart
    // re-resolves the changes schema and the mirror EVOLVES ADDITIVELY
    // on its next append; pre-evolution rows mirror the new column as
    // null, exactly how the source reads them
    engine.sql("ALTER TABLE gmir.ymir.src ADD COLUMN tag STRING")
    src.append(spark.range(50, 53)
      .selectExpr("id", "CAST(0 AS DOUBLE) v", "'late' AS tag"))
    val evolved = drive()
    assert(evolved.schema.fieldNames.contains("tag"),
      "mirror did not evolve on source ADD COLUMN")
    assert(sorted(evolved) == sorted(src),
      "mirror diverged after schema drift")
    assert(evolved.read().filter(col("tag").isNull).count() ==
      src.read().filter(col("tag").isNull).count())
  }

  test("engine end-to-end: MV from stream into catalog table, read back") {
    implicit val sqlCtx = spark.sqlContext
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("engine-wh")),
      CatalogConfig(namespace = "analytics"),
      BatchingConfig(triggerInterval = "50 milliseconds")))

    val input = MemoryStream[(Long, String, Double)]
    val transformed = input.toDF().toDF("id", "kind", "v")
      .withColumn("v2", col("v") * 2)

    val (table, q) = engine.startMaterializedView("doubled", transformed)
    input.addData((1L, "a", 1.5), (2L, "b", 2.5))
    q.processAllAvailable()

    assert(engine.catalog.listNamespaces() == Seq("analytics"))
    assert(engine.catalog.listTables("analytics") == Seq("doubled"))
    assert(engine.readTable("doubled").agg(sum("v2")).as[Double].head() == 8.0)

    // restartability: a second engine over the same warehouse sees state
    val engine2 = GraftEngine(spark, engine.config.storage.warehouseDir)
    assert(engine2.catalog.table("analytics", "doubled").read().count() == 2)
    engine.shutdown()
  }

  test("multiple concurrent MVs ingest independently (reference's " +
    "per-view reader parallelism)") {
    implicit val sqlCtx = spark.sqlContext
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("engine-multi")),
      CatalogConfig(namespace = "multi"),
      BatchingConfig(triggerInterval = "50 milliseconds")))
    val in1 = MemoryStream[Long]
    val in2 = MemoryStream[Long]
    val (t1, q1) = engine.startMaterializedView("mv_a",
      in1.toDF().toDF("id"))
    val (t2, q2) = engine.startMaterializedView("mv_b",
      in2.toDF().toDF("id").withColumn("sq", col("id") * col("id")))
    in1.addData(1L, 2L, 3L)
    in2.addData(10L, 20L)
    q1.processAllAvailable(); q2.processAllAvailable()
    assert(t1.read().count() == 3)
    assert(t2.read().agg(sum("sq")).as[Long].head() == 500L)
    assert(engine.catalog.listTables("multi") == Seq("mv_a", "mv_b"))
    engine.shutdown()
  }

  test("config wiring: availableNow trigger + namespace isolation") {
    implicit val sqlCtx = spark.sqlContext
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("engine-wh2")),
      CatalogConfig(namespace = "ns1"),
      BatchingConfig(availableNow = true)))
    val input = MemoryStream[Long]
    input.addData(1L, 2L, 3L)
    val (_, q) = engine.startMaterializedView("ids", input.toDF().toDF("id"))
    q.awaitTermination() // AvailableNow terminates after draining
    assert(engine.readTable("ids").count() == 3)
    assert(engine.catalog.listTables("other").isEmpty)
  }

  test("startIngest: every configured source dir becomes its own " +
    "continuously-ingested table (the reference main's job)") {
    val wh = tmpDir("ingest-wh")
    val evDir = tmpDir("ingest-events")
    val ordDir = tmpDir("ingest-orders")
    Seq((1L, "click"), (2L, "view")).toDF("id", "kind")
      .write.mode("overwrite").parquet(evDir)
    Seq((10L, 99.5), (11L, 12.25)).toDF("oid", "total")
      .write.mode("overwrite").parquet(ordDir)
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(wh),
      CatalogConfig(namespace = "ing"),
      BatchingConfig(availableNow = true),
      flight = FlightConfig(servers = Seq(evDir, ordDir))))
    val started = engine.startIngest()
    assert(started.map(_._1).toSet ==
      Set(evDir, ordDir).map(d => java.nio.file.Paths.get(d).getFileName.toString))
    started.foreach(_._2.awaitTermination())
    assert(engine.catalog.listTables("ing").size == 2)
    started.foreach { case (name, _) =>
      assert(engine.readTable(name).count() == 2)
    }
  }

  test("startVectorIndex restart adopts the persisted frozen centers " +
    "even after the source grows; a mismatched explicit model fails") {
    import org.apache.spark.sql.functions.col
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("vfreeze-wh")),
      CatalogConfig(namespace = "vz"),
      BatchingConfig(availableNow = true)))
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(40)
      .localCheckpoint()
    val src = engine.catalog.createTable("vz", "rawvecs", vecs.schema)
    src.append(vecs.filter(col("vec_id") < 20))
    val (_, m1, q1) = engine.startVectorIndex("vec", "rawvecs",
      clusters = 4)
    q1.awaitTermination()
    // grow the source: a restart that retrained would now pick
    // centers from a different candidate pool
    src.append(vecs.filter(col("vec_id") >= 20))
    val (_, m2, q2) = engine.startVectorIndex("vec", "rawvecs",
      clusters = 4)
    q2.awaitTermination()
    assert(m1.centroids.map(_.toSeq).toSeq ==
      m2.centroids.map(_.toSeq).toSeq,
      "restart retrained the frozen centers")
    // an explicit model that disagrees with the frozen centers must
    // fail loudly, not silently serve the wrong geometry
    val rogue = graft.operators.IvfIndex.Model(
      m1.centroids.map(_.map(_ + 1.0)))
    intercept[IllegalArgumentException] {
      engine.startVectorIndex("vec", "rawvecs", clusters = 4,
        model = Some(rogue))
    }
  }

  test("catalog aliases: atomic blue-green retarget, no dangling " +
    "creation, no table shadowing, concurrent retargets serialize") {
    val engine = GraftEngine(spark, tmpDir("alias-wh"))
    val cat = engine.catalog
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType)))
    val t1 = cat.createTable("ns", "docs_v1", schema)
    t1.append(Seq(1L, 2L).toDF("a"))
    val t2 = cat.createTable("ns", "docs_v2", schema)
    t2.append(Seq(10L, 20L, 30L).toDF("a"))
    intercept[Exception] { cat.setAlias("ns", "docs", "missing") }
    assert(!cat.aliasExists("ns", "docs"))
    cat.setAlias("ns", "docs", "docs_v1")
    assert(cat.resolveAlias("ns", "docs") == "docs_v1")
    assert(cat.tableOrAlias("ns", "docs").read().count() == 2)
    // the atomic cutover: consumers of 'docs' flip to v2 in one call
    cat.setAlias("ns", "docs", "docs_v2")
    assert(cat.tableOrAlias("ns", "docs").read().count() == 3)
    // a real table always wins over an alias of the same name, and an
    // alias cannot shadow an existing table
    assert(cat.tableOrAlias("ns", "docs_v1").read().count() == 2)
    intercept[Exception] { cat.setAlias("ns", "docs_v1", "docs_v2") }
    // concurrent retargets all land (one version each, no lost update)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = (1 to 8).map { i =>
      scala.concurrent.Future {
        cat.setAlias("ns", "docs",
          if (i % 2 == 0) "docs_v1" else "docs_v2")
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(60, "s"))
    pool.shutdown()
    assert(Set("docs_v1", "docs_v2")(cat.resolveAlias("ns", "docs")))
    // the mirror guard: a table cannot be created under an alias name
    // (tableOrAlias would silently flip consumers to the new table)
    intercept[Exception] { cat.createTable("ns", "docs", schema) }
    // dropping an alias target would dangle the published pointer —
    // blocked until the alias is retargeted away
    val target = cat.resolveAlias("ns", "docs")
    intercept[Exception] { cat.dropTable("ns", target) }
    assert(cat.listAliases("ns") == Seq("docs"))
    val other = if (target == "docs_v1") "docs_v2" else "docs_v1"
    cat.setAlias("ns", "docs", other)
    cat.dropTable("ns", target) // no alias points here anymore
    assert(!cat.tableExists("ns", target))
    assert(cat.tableOrAlias("ns", "docs").root.endsWith(other))
  }

  test("catalog dropTable removes the table and its files completely") {
    val engine = GraftEngine(spark, tmpDir("drop-wh"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val t = engine.catalog.createTable("default", "tmp", schema)
    t.append(Seq(1L, 2L).toDF("id"))
    assert(engine.catalog.listTables("default") == Seq("tmp"))
    engine.catalog.dropTable("default", "tmp")
    assert(engine.catalog.listTables("default").isEmpty)
    assert(!engine.catalog.tableExists("default", "tmp"))
    // re-create after drop starts fresh
    val t2 = engine.catalog.createTable("default", "tmp", schema)
    assert(t2.read().count() == 0)
    intercept[IllegalArgumentException] {
      engine.catalog.dropTable("default", "missing")
    }
  }

  test("commitLogStream: batching.maxRows from config paces the " +
    "commit-log source") {
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("cls-wh")),
      CatalogConfig(namespace = "cls"),
      BatchingConfig(availableNow = true, maxRowsPerBatch = Some(2L))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val table = engine.catalog.createOrLoadTable("cls", "t", schema)
    (1 to 5).foreach(i => table.append(Seq(i.toLong).toDF("id")))

    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = engine.commitLogStream("t")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.add(b.count()); ()
      }
      .option("checkpointLocation", tmpDir("cls-ckpt"))
      .trigger(engine.config.trigger)
      .start()
    q.awaitTermination()
    val got = scala.jdk.CollectionConverters
      .CollectionHasAsScala(sizes).asScala.toSeq.filter(_ > 0)
    assert(got.sum == 6, s"create + 5 appends = 6 commit events, got $got")
    assert(got.forall(_ <= 2), s"paced by config maxRows, got $got")
  }

  test("storage.format=arrow: MV exports exactly-once Arrow batch dirs") {
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpDir("engine-arrow-wh")
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(wh, format = "arrow"),
      CatalogConfig(namespace = "exp"),
      BatchingConfig(triggerInterval = "50 milliseconds")))
    val input = MemoryStream[(Long, String)]
    val q = engine.startExport("feed", input.toDF().toDF("id", "v"))
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val dir = java.nio.file.Paths.get(s"$wh/exp/feed")
    val batches = java.nio.file.Files.list(dir).iterator()
    val dirs = scala.jdk.CollectionConverters.IteratorHasAsScala(batches)
      .asScala.toList.map(_.getFileName.toString).sorted
    assert(dirs == Seq("batch-0", "batch-1"), s"got $dirs")
    assert(dirs.forall { d =>
      val files = java.nio.file.Files.list(dir.resolve(d)).iterator()
      scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
        .exists(_.toString.endsWith(".arrow"))
    })
    // replaying a batch id must be a no-op (exactly-once contract)
    val before = java.nio.file.Files.list(dir.resolve("batch-0"))
      .iterator()
    val nBefore = scala.jdk.CollectionConverters
      .IteratorHasAsScala(before).asScala.size
    val mv2 = new graft.streaming.MVManager(spark, tmpDir("arrow-ckpt2"))
    val input2 = MemoryStream[(Long, String)]
    input2.addData((9L, "dup"))
    val q2 = mv2.startToArrow("feed", input2.toDF().toDF("id", "v"),
      s"$wh/exp/feed")
    q2.processAllAvailable(); q2.stop()
    val after = java.nio.file.Files.list(dir.resolve("batch-0")).iterator()
    val nAfter = scala.jdk.CollectionConverters
      .IteratorHasAsScala(after).asScala.size
    assert(nAfter == nBefore, "replayed batch-0 must not be rewritten")
    // invalid format fails loudly
    intercept[IllegalArgumentException] {
      new GraftEngine(spark, GraftConfig(StorageConfig(wh, format = "orc")))
        .startExport("x", input.toDF().toDF("id", "v"))
    }
  }

  test("arrowStream: one engine ingests another engine's Arrow export") {
    implicit val sqlCtx = spark.sqlContext
    val wh = tmpDir("engine-arrow-loop")
    val producer = new GraftEngine(spark, GraftConfig(
      StorageConfig(wh, format = "arrow"), CatalogConfig(namespace = "exp")))
    val input = MemoryStream[(Long, String)]
    val q = producer.startExport("feed", input.toDF().toDF("id", "v"))
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    val consumer = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("engine-arrow-consumer"))))
    val qn = "loop_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q2 = consumer.arrowStream(s"$wh/exp/feed")
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", tmpDir("engine-loop-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.table(qn).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
  }

  test("YAML-configured engine: file config drives warehouse, namespace, " +
    "source dirs, and metrics collection") {
    val wh = tmpDir("engine-yaml-wh")
    val srcA = tmpDir("engine-yaml-srcA")
    val srcB = tmpDir("engine-yaml-srcB")
    val metricsDir = s"$wh/_metrics"
    val yaml =
      s"""flight:
         |  servers:
         |    - $srcA
         |    - $srcB
         |iceberg:
         |  defaultNamespace: yamlns
         |storage:
         |  localPath: $wh
         |metrics:
         |  enabled: true
         |  collectionPath: $metricsDir
         |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yaml)
      .copy(batching = BatchingConfig(availableNow = true))
    val engine = new GraftEngine(spark, cfg)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    // two "servers" (poll dirs) feeding one unioned stream
    Seq(1L, 2L).toDF("id").write.mode("overwrite").parquet(srcA)
    Seq(3L).toDF("id").write.mode("overwrite").parquet(srcB)

    val (_, q) = engine.startMaterializedView("ingest",
      engine.sourceStreams(schema))
    q.awaitTermination()
    assert(engine.readTable("ingest").count() == 3)
    assert(engine.catalog.listTables("yamlns") == Seq("ingest"))

    // metrics.collectionPath produced a stats file for the query
    val statsFile = java.nio.file.Paths.get(metricsDir, "ingest.json")
    assert(java.nio.file.Files.exists(statsFile))
    val json = java.nio.file.Files.readString(statsFile)
    assert(json.contains(""""query":"ingest""""))
    assert(json.contains(""""inputRows":3"""))
  }

  test("curation section parses from YAML and drives the loop") {
    val yaml =
      s"""storage:
         |  localPath: ${tmpDir("ycur-wh")}
         |iceberg:
         |  defaultNamespace: ycorpus
         |curation:
         |  source: raw
         |  target: clean
         |  minJaccard: 0.5
         |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yaml)
      .copy(batching = BatchingConfig(availableNow = true))
    assert(cfg.curation ==
      Some(CurationConfig("raw", "clean", Some(0.5))))
    val engine = new GraftEngine(spark, cfg)
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("ycorpus", "raw", docsSchema)
    src.append(Seq((1L, "one doc here"), (2L, "one doc here"),
      (3L, "another entirely")).toDF("doc_id", "text"))
    val c = cfg.curation.get
    engine.startCuration(c.target, c.source, c.minJaccard, c.textCol,
      c.idCol)._2.awaitTermination()
    assert(engine.readTable("clean").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 3L))
  }

  test("curation auditFailIf from YAML: accepted batches ship through " +
    "write-audit-publish — violating batches quarantine, clean ones " +
    "publish, the frontier still advances for quarantined docs") {
    val yaml =
      s"""storage:
         |  localPath: ${tmpDir("wapcur-wh")}
         |iceberg:
         |  defaultNamespace: wcorpus
         |curation:
         |  source: raw
         |  target: clean
         |  auditFailIf: "length(text) < 15"
         |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yaml)
      .copy(batching = BatchingConfig(availableNow = true))
    assert(cfg.curation == Some(CurationConfig("raw", "clean",
      auditFailIf = Some("length(text) < 15"))))
    val engine = new GraftEngine(spark, cfg)
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("wcorpus", "raw", docsSchema)
    val c = cfg.curation.get
    def run() = engine.startCuration(c.target, c.source, c.minJaccard,
      c.textCol, c.idCol, c.auditFailIf)._2.awaitTermination()

    // batch 1: clean — stage, audit passes, publish
    src.append(Seq((1L, "a perfectly fine long document"),
      (2L, "another acceptable long document")).toDF("doc_id", "text"))
    run()
    assert(engine.readTable("clean").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L))
    // batch 2: contains a violation — the WHOLE accepted batch is
    // abandoned and parked in the quarantine table; main never moves
    src.append(Seq((3L, "short doc"),
      (4L, "an innocent bystander in a bad batch"))
      .toDF("doc_id", "text"))
    run()
    assert(engine.readTable("clean").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L), "violating batch leaked to main")
    assert(engine.readTable("clean_quarantine").select("doc_id").as[Long]
      .collect().toSet == Set(3L, 4L), "batch not quarantined")
    // batch 3: clean again — the pin is released, publishing resumes;
    // an exact copy of a QUARANTINED doc is still deduped (the
    // frontier advanced when the batch was audited, so quarantine
    // re-drive is a human decision, not an accidental re-admission)
    src.append(Seq((5L, "fresh clean content arriving later"),
      (14L, "an innocent bystander in a bad batch"))
      .toDF("doc_id", "text"))
    run()
    assert(engine.readTable("clean").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 5L))
    assert(engine.table("clean").activeBranch.isEmpty,
      "a WAP branch was left pinning the out table")
    assert(engine.catalog.listTables("wcorpus").toSet ==
      Set("raw", "clean", "clean_index", "clean_quarantine"))

    // human re-drive: the quarantined batch enters the corpus, the
    // quarantine empties, and a replayed re-drive is a no-op (the
    // device: both commits key on the quarantine version)
    assert(engine.redriveQuarantine("clean") == 2L)
    assert(engine.readTable("clean").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 5L, 3L, 4L))
    assert(engine.readTable("clean_quarantine").count() == 0)
    assert(engine.redriveQuarantine("clean") == 0L)
    assert(engine.readTable("clean").count() == 5)

    // crash-replay hole (ADVICE r12): a crash lands BETWEEN the redrive
    // append and the quarantine delete, and a NEW quarantine batch
    // commits before the admin retries. The retry must finish the
    // pending version (its delete) and drive the new version WITHOUT
    // duplicating the already-appended rows.
    src.append(Seq((6L, "tiny"), (7L, "innocent in the sixth batch"))
      .toDF("doc_id", "text"))
    run() // quarantines {6, 7}
    val out = engine.table("clean")
    val q = engine.table("clean_quarantine")
    val v = q.currentVersion
    // the crashed attempt: append landed, delete did not
    out.appendExactlyOnce(q.readVersion(v), "clean#redrive", v.toLong)
    // a newer violating batch lands before the admin retries
    src.append(Seq((8L, "oops"), (9L, "innocent in the newest batch"))
      .toDF("doc_id", "text"))
    run() // quarantines {8, 9}
    assert(engine.redriveQuarantine("clean") == 4L,
      "2 replayed from the crashed version + 2 fresh")
    val ids = engine.readTable("clean").select("doc_id").as[Long]
      .collect().toSeq
    assert(ids.toSet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(ids.size == 9, s"duplicated rows after replay: $ids")
    assert(engine.readTable("clean_quarantine").count() == 0)
  }

  test("perceptualCuration section parses from YAML and drives the " +
    "binary-axis loop: looped re-encodes dedupe, forgets free the " +
    "frontier for re-upload") {
    val yaml =
      s"""storage:
         |  localPath: ${tmpDir("pcur-wh")}
         |iceberg:
         |  defaultNamespace: media
         |perceptualCuration:
         |  source: raw_media
         |  target: curated_media
         |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yaml)
      .copy(batching = BatchingConfig(availableNow = true))
    assert(cfg.perceptualCuration ==
      Some(PerceptualCurationConfig("raw_media", "curated_media")))
    val engine = new GraftEngine(spark, cfg)
    def frame(c: Char) = c.toString * 64
    val base = ('a' to 't').map(frame).mkString
    val looped = ('a' to 't').map(frame).reverse.mkString + frame('a')
    val disjoint = ('A' to 'T').map(frame).mkString
    def media(rows: Seq[(Long, String)]) =
      graft.operators.MultimodalOps.withBinaryPayload(
        rows.toDF("doc_id", "text"))
    val src = engine.catalog.createTable("media", "raw_media",
      media(Seq((0L, "x"))).schema)
    val c = cfg.perceptualCuration.get
    def run() = engine.startPerceptualCuration(c.target, c.source,
      c.maxHamming, c.idCol, c.payloadCol, c.auditFailIf)
      ._2.awaitTermination()

    src.append(media(Seq((1L, base), (5L, disjoint))))
    run()
    assert(engine.readTable("curated_media").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 5L))
    // a looped re-encode (same frame set) and a novel payload
    src.append(media(Seq((10L, looped),
      (12L, ('0' to '9').map(frame).mkString))))
    run()
    assert(engine.readTable("curated_media").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 5L, 12L))
    assert(engine.catalog.listTables("media").toSet == Set("raw_media",
      "curated_media", "curated_media_index", "curated_media_postings"))
    // GDPR forget frees the frontier; a re-upload re-admits
    src.deleteWhereEqual(Seq(1L).toDF("doc_id"), Seq("doc_id"))
    src.append(media(Seq((21L, base))))
    run()
    assert(engine.readTable("curated_media").select("doc_id").as[Long]
      .collect().toSet == Set(5L, 12L, 21L))
    assert(engine.readTable("curated_media_index").select("doc_id")
      .as[Long].collect().toSet == Set(5L, 12L, 21L))
  }

  test("lexicalIndex + vectorIndex sections parse from YAML and drive " +
    "catalog-managed serving-index loops that converge to from-scratch " +
    "builds") {
    import org.apache.spark.sql.functions.col
    val yaml =
      s"""storage:
         |  localPath: ${tmpDir("yidx-wh")}
         |iceberg:
         |  defaultNamespace: yserve
         |lexicalIndex:
         |  source: rawdocs
         |  target: lex
         |  buckets: 8
         |vectorIndex:
         |  source: rawvecs
         |  target: vec
         |  clusters: 4
         |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yaml)
      .copy(batching = BatchingConfig(availableNow = true))
    assert(cfg.lexicalIndex ==
      Some(LexicalIndexConfig("rawdocs", "lex", buckets = 8)))
    assert(cfg.vectorIndex ==
      Some(VectorIndexConfig("rawvecs", "vec", clusters = 4)))
    val engine = new GraftEngine(spark, cfg)

    // lexical: two commits through the loop == one from-scratch build
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(60).localCheckpoint()
    val dSrc = engine.catalog.createTable("yserve", "rawdocs", docs.schema)
    dSrc.append(docs.filter(col("doc_id") % 2 === 0))
    val lc = cfg.lexicalIndex.get
    engine.startLexicalIndex(lc.target, lc.source, lc.buckets)
      ._3.awaitTermination()
    dSrc.append(docs.filter(col("doc_id") % 2 =!= 0))
    val (pt, dt, q1) =
      engine.startLexicalIndex(lc.target, lc.source, lc.buckets)
    q1.awaitTermination()
    val (fp, fd) = graft.operators.TextOps.buildLexicalIndex(
      spark, docs, tmpDir("yidx-fresh"), buckets = 8)
    val served = graft.operators.TextOps
      .bm25FromIndex(pt, dt, queryDoc = 0L, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fresh = graft.operators.TextOps
      .bm25FromIndex(fp, fd, queryDoc = 0L, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == fresh, "MV-grown lexical index diverged")

    // vector: same contract on the dense axis
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(60).localCheckpoint()
    val vSrc = engine.catalog.createTable("yserve", "rawvecs", vecs.schema)
    vSrc.append(vecs)
    val vc = cfg.vectorIndex.get
    val (index, model, q2) =
      engine.startVectorIndex(vc.target, vc.source, vc.clusters)
    q2.awaitTermination()
    val qv = vecs.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val rebuilt = graft.operators.IvfIndex.buildIndex(
      spark, vecs, model, tmpDir("yidx-vfresh"))
    val sGrown = graft.operators.IvfIndex
      .searchPersisted(index, qv, model, k = 5, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sFresh = graft.operators.IvfIndex
      .searchPersisted(rebuilt, qv, model, k = 5, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sGrown == sFresh, "MV-grown vector index diverged")
  }

  test("startCuration: the curation loop as a catalog-managed engine " +
    "MV — near-dups dropped continuously, tables created on first use") {
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("cur-wh")),
      CatalogConfig(namespace = "corpus"),
      BatchingConfig(availableNow = true)))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("corpus", "raw", docsSchema)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    src.append(Seq((1L, base), (2L, "something else entirely here now"))
      .toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    src.append(Seq(
      (10L, base),                                  // exact dup
      (11L, base.replace("kappa", "sigma")),        // near dup of 1
      (12L, "genuinely novel content for the corpus today"))
      .toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    assert(engine.readTable("curated").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 12L))
    assert(engine.catalog.listTables("corpus").toSet ==
      Set("raw", "curated", "curated_index", "curated_postings"))
    assert(engine.table("curated_index").bucketSpec == Some(("fp", 32)))
    // the near-dup loop's band postings: pbh-bucketed, probe-ready
    assert(engine.table("curated_postings").bucketSpec ==
      Some(("pbh", 32)))
    // every indexed sig row has its postings (commit-order invariant)
    val idxDocs = engine.readTable("curated_index")
      .filter($"sig".isNotNull).select("doc_id").as[Long].collect().toSet
    val postDocs = engine.readTable("curated_postings")
      .select("doc_id").as[Long].collect().toSet
    assert(idxDocs.subsetOf(postDocs))
  }

  test("startCuration BACKFILLS postings for a pre-existing index: " +
    "near-dups of pre-postings history are still rejected") {
    import graft.functions.TextFunctions.fingerprint
    import graft.operators.DedupOps
    import graft.streaming.MVManager
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("bf-wh")),
      CatalogConfig(namespace = "corpus2"),
      BatchingConfig(availableNow = true)))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("corpus2", "raw", docsSchema)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    // an index from an OLDER deployment: populated sig rows, NO
    // postings table alongside
    val hist = Seq((1L, base)).toDF("doc_id", "text")
    val oldIdx = engine.catalog.createTable("corpus2", "curated_index",
      MVManager.curationIndexSchema, bucketBy = Some(("fp", 32)))
    oldIdx.append(
      hist.select(fingerprint($"text").as("fp"), $"doc_id")
        .join(DedupOps.signatureIndexRows(hist), Seq("doc_id"), "left")
        .select("fp", "doc_id", "shs", "sig"))
    // the new deployment starts the loop: the postings table is
    // created AND backfilled from the existing index, so a near-dup
    // of the pre-postings history must still be rejected
    src.append(Seq(
      (10L, base.replace("upsilon", "omega")), // near-dup of history 1
      (11L, "genuinely new content with nothing shared at all"))
      .toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    assert(engine.readTable("curated").select("doc_id").as[Long]
      .collect().toSet == Set(11L))
    // the backfill covered history doc 1's bands
    assert(engine.readTable("curated_postings").select("doc_id")
      .as[Long].collect().toSet.contains(1L))
  }

  test("postings backfill is crash-safe: a postings table stranded " +
    "between createTable and the backfill commit is completed on the " +
    "next start, and a completed backfill never replays") {
    import graft.functions.TextFunctions.fingerprint
    import graft.operators.DedupOps
    import graft.streaming.MVManager
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("bfc-wh")),
      CatalogConfig(namespace = "corpus3"),
      BatchingConfig(availableNow = true)))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("corpus3", "raw", docsSchema)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val hist = Seq((1L, base)).toDF("doc_id", "text")
    val oldIdx = engine.catalog.createTable("corpus3", "curated_index",
      MVManager.curationIndexSchema, bucketBy = Some(("fp", 32)))
    oldIdx.append(
      hist.select(fingerprint($"text").as("fp"), $"doc_id")
        .join(DedupOps.signatureIndexRows(hist), Seq("doc_id"), "left")
        .select("fp", "doc_id", "shs", "sig"))
    // CRASH SIMULATION: the postings table was created but the process
    // died before the backfill commit — the pre-fix code would see
    // tableExists=true and skip the backfill forever
    engine.catalog.createTable("corpus3", "curated_postings",
      DedupOps.bandPostingsSchema,
      properties = DedupOps.bandPostingsProps(),
      bucketBy = Some(("pbh", 32)))
    src.append(Seq(
      (10L, base.replace("upsilon", "omega")), // near-dup of history 1
      (11L, "genuinely new content with nothing shared at all"))
      .toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    // the retried backfill landed: pre-postings history still rejects
    // its near-dups
    assert(engine.readTable("curated").select("doc_id").as[Long]
      .collect().toSet == Set(11L))
    assert(engine.readTable("curated_postings").select("doc_id")
      .as[Long].collect().toSet.contains(1L))
    val p = engine.table("curated_postings")
    assert(p.lastBatchId(GraftEngine.PostingsBackfillWriter) == 0L)
    // a SECOND start replays the keyed backfill as a no-op: no
    // duplicate posting rows, no new commit
    val before = p.currentVersion
    val n1 = p.read().count()
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    assert(p.currentVersion == before,
      "completed backfill must not re-commit")
    assert(p.read().count() == n1)
  }


  test("pre-marker postings tables are ADOPTED, not duplicated: the " +
    "coverage-diff backfill adds bands only for missing docs") {
    import graft.functions.TextFunctions.fingerprint
    import graft.operators.DedupOps
    import graft.streaming.MVManager
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("bfl-wh")),
      CatalogConfig(namespace = "corpus4"),
      BatchingConfig(availableNow = true)))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("corpus4", "raw", docsSchema)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val d1 = Seq((1L, base)).toDF("doc_id", "text")
    val d2 = Seq((2L, base.replaceAll("alpha beta", "strange words")))
      .toDF("doc_id", "text")
    def idxRows(df: org.apache.spark.sql.DataFrame) =
      df.select(fingerprint($"text").as("fp"), $"doc_id")
        .join(DedupOps.signatureIndexRows(df), Seq("doc_id"), "left")
        .select("fp", "doc_id", "shs", "sig")
    val oldIdx = engine.catalog.createTable("corpus4", "curated_index",
      MVManager.curationIndexSchema, bucketBy = Some(("fp", 32)))
    oldIdx.append(idxRows(d1))
    oldIdx.append(idxRows(d2))
    // LEGACY postings: doc 1's bands were committed by the old
    // creation-time backfill (plain append, no marker); doc 2's are
    // MISSING (the stranded-backfill / partial-coverage case)
    val legacy = engine.catalog.createTable("corpus4",
      "curated_postings", DedupOps.bandPostingsSchema,
      properties = DedupOps.bandPostingsProps(),
      bucketBy = Some(("pbh", 32)))
    legacy.append(DedupOps.bandPostingsRows(
      idxRows(d1).select("doc_id", "sig")))
    val doc1Rows = legacy.read().filter($"doc_id" === 1L).count()
    src.append(Seq((11L, "fresh words unrelated to anything at all"))
      .toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    val p = engine.table("curated_postings")
    // doc 1's bands were NOT duplicated; doc 2's were added
    assert(p.read().filter($"doc_id" === 1L).count() == doc1Rows,
      "pre-existing coverage must not be re-appended")
    assert(p.read().filter($"doc_id" === 2L).count() > 0,
      "missing coverage must be topped up")
    assert(p.lastBatchId(GraftEngine.PostingsBackfillWriter) == 0L)
  }

  test("upgrading a curation from exact to near-dup: the sig-less " +
    "index does not break the backfill, and near-dup filtering works " +
    "from the upgrade point on") {
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("upg-wh")),
      CatalogConfig(namespace = "corpus5"),
      BatchingConfig(availableNow = true)))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("corpus5", "raw", docsSchema)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    // phase 1: EXACT-only curation — index schema is (fp, doc_id)
    src.append(Seq((1L, base)).toDF("doc_id", "text"))
    engine.startCuration("curated", "raw")._2.awaitTermination()
    assert(engine.readTable("curated").count() == 1)
    // phase 2: upgrade the same pipeline to near-dup — must start
    // cleanly (no sig column to backfill) and filter near-dups of
    // NEWLY accepted docs
    src.append(Seq(
      (10L, "completely different content with its own words here"),
      (11L, "completely different content with its own words there"))
      .toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    val got = engine.readTable("curated").select("doc_id").as[Long]
      .collect().toSet
    assert(got.contains(1L) && got.contains(10L) && !got.contains(11L),
      s"expected near-dup 11 dropped, got $got")
  }

  test("text curation ADOPTS a pre-existing postings table's stamped " +
    "band count instead of failing every batch against the default") {
    import graft.operators.DedupOps
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("txtgeo-wh")),
      CatalogConfig(namespace = "txt24"),
      BatchingConfig(availableNow = true)))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val src = engine.catalog.createTable("txt24", "raw", docsSchema)
    // pre-existing postings table stamped with a NON-default geometry
    // (created through MVManager/DedupOps directly, which allow it)
    engine.catalog.createTable("txt24", "curated_postings",
      DedupOps.bandPostingsSchema,
      properties = DedupOps.bandPostingsProps(bands = 32),
      bucketBy = Some(("pbh", 32)))
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    src.append(Seq((1L, base)).toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    assert(engine.readTable("curated").select("doc_id").as[Long]
      .collect().toSet == Set(1L))
    // the committed postings carry the ADOPTED 32-band geometry
    assert(engine.table("curated_postings").read()
      .filter($"doc_id" === 1L).select("band").as[Int]
      .collect().toSet == (0 until 32).toSet)
    // a near-copy in a later batch is rejected THROUGH the adopted
    // 32-band probe path (previously: require-fail on every batch)
    src.append(Seq((10L, base.replace("upsilon", "omega")))
      .toDF("doc_id", "text"))
    engine.startCuration("curated", "raw", minJaccard = Some(0.5))
      ._2.awaitTermination()
    assert(engine.readTable("curated").select("doc_id").as[Long]
      .collect().toSet == Set(1L))
  }

  test("embedding curation ADOPTS a pre-upgrade 8x8 postings stamp " +
    "instead of failing every batch against the new default") {
    import org.apache.spark.sql.types._
    import graft.operators.SimilarityOps
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("geo-wh")),
      CatalogConfig(namespace = "vec8"),
      BatchingConfig(availableNow = true)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val src = engine.catalog.createTable("vec8", "raw_vec", embSchema)
    // pre-upgrade postings table: stamped with the OLD 8x8 geometry
    engine.catalog.createTable("vec8", "curated_vec_postings",
      SimilarityOps.srpPostingsSchema,
      properties = SimilarityOps.srpPostingsProps(8, 8),
      bucketBy = Some(("pbh", 32)))
    def vec(axes: Seq[Int]): Seq[Float] =
      (0 until 64).map(i => if (axes.contains(i)) 1f else 0f)
    src.append(Seq((1L, vec(Seq(0, 1, 2))), (2L, vec(Seq(40, 41))))
      .toDF("vec_id", "embedding"))
    engine.startEmbeddingCuration("curated_vec", "raw_vec")
      ._2.awaitTermination()
    assert(engine.readTable("curated_vec").select("vec_id").as[Long]
      .collect().toSet == Set(1L, 2L))
    // second batch: an exact copy must still be rejected THROUGH the
    // adopted 8x8 probe path
    src.append(Seq((10L, vec(Seq(0, 1, 2)))).toDF("vec_id", "embedding"))
    engine.startEmbeddingCuration("curated_vec", "raw_vec")
      ._2.awaitTermination()
    assert(engine.readTable("curated_vec").select("vec_id").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("startEmbeddingCuration: the vector curation loop as a " +
    "catalog-managed engine MV — cosine near-dups dropped, tables " +
    "created on first use, YAML-configurable") {
    import org.apache.spark.sql.types._
    val engine = new GraftEngine(spark, GraftConfig(
      StorageConfig(tmpDir("ecur-wh")),
      CatalogConfig(namespace = "vectors"),
      BatchingConfig(availableNow = true)))
    // a metadata column rides along: it must survive into the curated
    // table's full rows (the index holds only (vec_id, embedding))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("lang", StringType)))
    val src = engine.catalog.createTable("vectors", "raw_vec", embSchema)
    def vec(axes: Seq[Int]): Seq[Float] =
      (0 until 64).map(i => if (axes.contains(i)) 1f else 0f)
    src.append(Seq(
      (1L, vec(Seq(0, 1, 2)), "en"),
      (2L, vec(Seq(0, 1, 2)), "de"),   // within-batch copy -> collapsed
      (3L, vec(Seq(40, 41)), "fr"))
      .toDF("vec_id", "embedding", "lang"))
    engine.startEmbeddingCuration("curated_vec", "raw_vec",
      threshold = 0.35)._2.awaitTermination()
    assert(engine.readTable("curated_vec")
      .select("vec_id", "lang").as[(Long, String)].collect().toSet ==
      Set((1L, "en"), (3L, "fr")))
    assert(engine.table("curated_vec_index").schema.fieldNames.toSet
      .intersect(Set("lang")).isEmpty, "index carries no metadata")
    // a near-dup arriving later is dropped against the index
    src.append(Seq((10L, vec(Seq(0, 1)), "it"),
        (11L, vec(Seq(60, 61)), "pt"))
      .toDF("vec_id", "embedding", "lang"))
    engine.startEmbeddingCuration("curated_vec", "raw_vec",
      threshold = 0.35)._2.awaitTermination()
    assert(engine.readTable("curated_vec").select("vec_id").as[Long]
      .collect().toSet == Set(1L, 3L, 11L))
    assert(engine.catalog.listTables("vectors").toSet ==
      Set("raw_vec", "curated_vec", "curated_vec_index",
        "curated_vec_postings"))
    assert(engine.table("curated_vec_index").bucketSpec ==
      Some(("vec_id", 32)))
    // the YAML surface drives the same loop
    val cfg = GraftConfig.fromYamlString(
      """storage:
        |  localPath: /tmp/w
        |embeddingCuration:
        |  source: raw_vec
        |  target: curated_vec
        |  threshold: "0.5"
        |""".stripMargin)
    assert(cfg.embeddingCuration ==
      Some(EmbeddingCurationConfig("raw_vec", "curated_vec", 0.5)))
  }
}
