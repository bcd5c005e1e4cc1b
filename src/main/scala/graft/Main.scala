package graft

import org.apache.spark.sql.SparkSession

/** Process entry point — the reference's `cmd/ingestor/main.go:15-55`
  * re-expressed: load the YAML config, start continuous ingestion of
  * every configured source, block until termination, shut down cleanly
  * on SIGINT/SIGTERM. Unlike the reference (whose `Close()` is declared
  * but never called from main), the shutdown hook actually stops every
  * query so the final micro-batches commit before exit.
  *
  * Usage: `runMain graft.Main /path/to/config.yaml`
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.yaml>")
    val config = GraftConfig.fromYaml(args(0))
    val spark = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val engine = new GraftEngine(spark, config)
    val started = engine.startIngest()
    started.foreach { case (name, q) =>
      println(s"[graft] ingesting '$name' (query ${q.id})")
    }
    config.curation.foreach { c =>
      val (_, q) = engine.startCuration(c.target, c.source,
        c.minJaccard, c.textCol, c.idCol, c.auditFailIf)
      println(s"[graft] curating '${c.source}' -> '${c.target}' " +
        s"(near-dup: ${c.minJaccard.getOrElse("off")}, " +
        s"audit: ${c.auditFailIf.getOrElse("off")}, query ${q.id})")
    }
    config.embeddingCuration.foreach { c =>
      val (_, q) = engine.startEmbeddingCuration(c.target, c.source,
        c.threshold, c.idCol, c.embCol, c.auditFailIf)
      println(s"[graft] curating vectors '${c.source}' -> " +
        s"'${c.target}' (cosine >= ${c.threshold}, " +
        s"audit: ${c.auditFailIf.getOrElse("off")}, query ${q.id})")
    }
    config.perceptualCuration.foreach { c =>
      val (_, q) = engine.startPerceptualCuration(c.target, c.source,
        c.maxHamming, c.idCol, c.payloadCol, c.auditFailIf)
      println(s"[graft] curating media '${c.source}' -> '${c.target}' " +
        s"(hamming <= ${c.maxHamming}, " +
        s"audit: ${c.auditFailIf.getOrElse("off")}, query ${q.id})")
    }
    config.lexicalIndex.foreach { c =>
      val (_, _, q) = engine.startLexicalIndex(c.target, c.source,
        c.buckets, c.textCol, c.idCol)
      println(s"[graft] lexical index '${c.source}' -> " +
        s"'${c.target}_postings' (query ${q.id})")
    }
    config.vectorIndex.foreach { c =>
      val (_, _, q) = engine.startVectorIndex(c.target, c.source,
        c.clusters, idCol = c.idCol, embCol = c.embCol)
      println(s"[graft] vector index '${c.source}' -> " +
        s"'${c.target}_index' (${c.clusters} lists, query ${q.id})")
    }
    sys.addShutdownHook {
      println("[graft] shutting down")
      engine.shutdown()
    }
    engine.awaitAnyTermination()
  }
}
