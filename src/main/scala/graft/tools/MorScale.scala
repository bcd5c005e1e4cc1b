package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/** Measures the merge-on-read delete claim: a positional delete's
  * WRITE COST is O(matched rows), not O(files containing them) — the
  * r9 verdict's named 100 TB caveat for the copy-on-write paths
  * (`deleteWhere` rewrites a whole file per matched row; a scattered
  * GDPR sweep rewrites the table).
  *
  * Builds one table of F files x R rows, then measures bytes written
  * under (a) a 1-row delete and (b) a scattered ~0.1% delete, each
  * both ways (positional vs copy-on-write on identical clones), plus
  * read-back cost with live delete files and after compaction
  * absorption. Bytes = du over data/ + deletes/ + metadata/ growth. */
object MorScale {
  private def du(p: Path): Long =
    if (!Files.isDirectory(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_))
        .mapToLong(Files.size(_)).sum()
      finally s.close()
    }

  private def tableBytes(root: String): Long =
    du(Paths.get(root, "data")) + du(Paths.get(root, "deletes")) +
      du(Paths.get(root, "metadata"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val files = 16
    val rowsPerFile = 100000
    val n = files.toLong * rowsPerFile

    def freshTable(name: String): LakeTable = {
      val dir = Files.createTempDirectory(s"mor-scale-$name").toString
      val df = spark.range(n)
        .select($"id", ($"id" % 1000).as("user"),
          (rand(42) * 1000).as("v"),
          concat(lit("payload-"), $"id").as("s"))
      val t = LakeTable.create(spark, dir, df.schema)
      (0 until files).foreach(i =>
        t.append(df.filter($"id" % files === i).repartition(1)))
      t
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def measure(label: String, cond: org.apache.spark.sql.Column,
                expectDeleted: Long,
                eqKeys: Option[(org.apache.spark.sql.DataFrame,
                  Seq[String])] = None): Unit = {
      val tp = freshTable(s"$label-pos")
      val tc = freshTable(s"$label-cow")
      val bp0 = tableBytes(tp.root); val bc0 = tableBytes(tc.root)
      val (_, sp) = timed(tp.deleteWherePositional(cond))
      val (_, sc) = timed(tc.deleteWhere(cond))
      val bp = tableBytes(tp.root) - bp0
      val bc = tableBytes(tc.root) - bc0
      assert(tp.read().count() == n - expectDeleted)
      assert(tc.read().count() == n - expectDeleted)
      println(f"$label%-22s positional: $bp%,12d B $sp%6.2f s   " +
        f"copy-on-write: $bc%,12d B $sc%6.2f s   ratio ${
          bc.toDouble / math.max(1L, bp)}%8.1fx")
      // equality mode when the predicate is key-expressible: commits
      // the KEYS — no provenance scan at all, the wall-time win the
      // positional path's fixed scan cost can't reach
      eqKeys.foreach { case (keys, keyCols) =>
        val te = freshTable(s"$label-eq")
        val be0 = tableBytes(te.root)
        val (_, se) = timed(te.deleteWhereEqual(keys, keyCols))
        val be = tableBytes(te.root) - be0
        assert(te.read().count() == n - expectDeleted)
        println(f"$label%-22s equality:   $be%,12d B $se%6.2f s   " +
          "(no scan)")
      }
      // read-back with live delete files vs after absorption
      val (_, rLive) = timed(tp.read().agg(sum($"v")).collect())
      tp.compact(files)
      assert(tp.deleteEntries.isEmpty)
      val (_, rComp) = timed(tp.read().agg(sum($"v")).collect())
      println(f"$label%-22s read w/ live deletes $rLive%6.2f s, " +
        f"after absorption $rComp%6.2f s")
    }

    println(s"table: $files files x $rowsPerFile rows = $n rows")
    import spark.implicits._
    measure("one-row", $"id" === 123456L, 1L,
      eqKeys = Some((Seq(123456L).toDF("id"), Seq("id"))))
    measure("forget-user", $"user" === 777L, n / 1000,
      eqKeys = Some((Seq(777L).toDF("user"), Seq("user"))))
    measure("scattered-0.1pct", $"id" % 1000 === 7, n / 1000)
    spark.stop()
  }
}
