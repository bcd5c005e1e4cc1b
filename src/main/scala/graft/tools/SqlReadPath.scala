package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Measures the SQL catalog's two read routes against the same lake
  * table so the V1-swap rule's value is a NUMBER, not a claim:
  *
  *   (a) the default [[graft.lake.GraftScanBuilder]] `V1Scan` shim —
  *       a row-based `RDD[Row]` handoff (Spark re-encodes every row
  *       at the DSv2 boundary), and
  *   (b) the `GraftExtensions` route, where
  *       [[graft.lake.GraftV1ReadRule]] swaps the relation for the V1
  *       manifest plan (vectorized parquet + whole-stage codegen).
  *
  * Both sessions share one SparkContext and one warehouse table (sf0.1
  * lineitem loaded once through SQL CTAS); each query is min-of-N
  * inside the single JVM per the round-3 measurement rule. Two shapes:
  * a selective filtered aggregate (pushdown-friendly: the shim prunes
  * files too — the delta is pure row-shim overhead on the surviving
  * rows) and a wide full-scan aggregate (the worst case for a row
  * shim: every column of every row crosses the boundary). */
object SqlReadPath {
  def minOf(n: Int)(f: => Unit): Double =
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  private val Selective =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s
      |FROM %s WHERE l_quantity < 5 GROUP BY l_returnflag""".stripMargin

  private val Wide =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS d,
      |  CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS t
      |FROM %s GROUP BY l_returnflag, l_linestatus""".stripMargin

  def main(args: Array[String]): Unit = {
    val base = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    base.sparkContext.setLogLevel("ERROR")
    base.range(1000000).selectExpr("sum(id)").collect()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val wh = java.nio.file.Files.createTempDirectory("sqlreadpath")
      .toString
    base.conf.set("spark.sql.catalog.g", "graft.lake.GraftCatalog")
    base.conf.set("spark.sql.catalog.g.warehouse", wh)
    Tables.load(base, sfDir, "lineitem")
      .createOrReplaceTempView("src")
    base.sql("CREATE NAMESPACE g.ns")
    base.sql("CREATE TABLE g.ns.lineitem AS SELECT * FROM src")

    // the extensions twin over the SAME context and warehouse
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions()(_)).getOrCreate()
    require(ext ne base, "expected a fresh extensions session")
    ext.conf.set("spark.sql.catalog.g", "graft.lake.GraftCatalog")
    ext.conf.set("spark.sql.catalog.g.warehouse", wh)

    def run(s: SparkSession, q: String): Double = {
      SparkSession.setActiveSession(s)
      minOf(5)(s.sql(q.format("g.ns.lineitem")).collect())
    }
    val rows = base.sql("SELECT count(*) FROM g.ns.lineitem")
      .head.getLong(0)
    for ((name, q) <- Seq("selective" -> Selective, "wide" -> Wide)) {
      val shim = run(base, q)
      val swap = run(ext, q)
      println(f"""{"query":"$name","rows":$rows,""" +
        f""""shim_s":$shim%.3f,"v1swap_s":$swap%.3f,""" +
        f""""speedup":${shim / swap}%.2f}""")
    }
    base.stop()
  }
}
