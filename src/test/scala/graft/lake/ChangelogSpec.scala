package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Row-level changelog (`readChangelog`): net `_change_type`-tagged
  * diffs between retained snapshots, computed over changed files
  * only — pure appends take the no-shuffle fast path, merge-on-read
  * deletes and upserts emit exact deletes, compaction nets to zero,
  * and schema changes in range align by field ID. */
class ChangelogSpec extends SparkSuite {
  import spark.implicits._

  private val ct = "_change_type"

  private def mkTable(prefix: String) = {
    val df = (0 until 200).map(i => (i.toLong, s"p-$i", i % 5))
      .toDF("id", "payload", "grp")
    val t = LakeTable.create(spark, tmpDir(prefix), df.schema)
    t.append(df.repartition(4)) // v1
    (t, df)
  }

  test("pure appends: inserts only, exactly the appended rows, and no " +
    "diff machinery in the plan (changed-file fast path)") {
    val (t, df) = mkTable("cl-append")
    t.append(df.withColumn("id", $"id" + 1000L)) // v2
    t.append(df.withColumn("id", $"id" + 2000L)) // v3

    val ch = t.readChangelog(1, 3)
    assert(ch.filter(col(ct) =!= "insert").count() == 0)
    assert(ch.count() == 400)
    assert(ch.agg(min($"id")).head().getLong(0) == 1000L)
    // fast path: no Except/Join in the plan — appends diff by metadata
    val plan = ch.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Except") && !plan.contains("Join"))
    // empty range is an empty, correctly-typed changelog
    assert(t.readChangelog(2, 2).count() == 0)
    assert(t.readChangelog(2, 2).columns.contains(ct))
  }

  test("merge-on-read equality delete: pre-delete rows of forgotten " +
    "keys emit as deletes; rows appended after the delete are out of " +
    "scope; insert-then-delete inside the range nets to nothing") {
    val (t, df) = mkTable("cl-eqdel")
    // v2: append rows that the v3 delete will ALSO forget (in-range net)
    t.append(df.filter($"grp" === 2).withColumn("id", $"id" + 1000L))
    val forget = df.filter($"grp" === 2).select($"id")
      .union(df.filter($"grp" === 2).select($"id" + 1000L))
    t.deleteWhereEqual(forget.distinct(), Seq("id")) // v3
    t.append(df.filter($"grp" === 2).limit(7)
      .withColumn("id", $"id" + 5000L)) // v4: after the delete — lives

    val ch = t.readChangelog(1, 4).cache()
    val dels = ch.filter(col(ct) === "delete")
    val ins = ch.filter(col(ct) === "insert")
    // deletes: exactly the v1 rows of grp 2 (v2's rows net out in-range)
    assert(dels.count() == 40)
    assert(dels.filter($"grp" =!= 2).count() == 0)
    assert(dels.filter($"id" >= 1000L).count() == 0)
    // inserts: only the post-delete batch
    assert(ins.count() == 7)
    assert(ins.filter($"id" < 5000L).count() == 0)
    ch.unpersist()

    // sub-range view: (3, 4] sees only the late insert, (1, 3] only
    // the net deletes — bounds compose
    assert(t.readChangelog(3, 4).filter(col(ct) === "delete").count() == 0)
    assert(t.readChangelog(1, 3).filter(col(ct) === "insert").count() == 0)
    assert(t.readChangelog(1, 3).count() == 40)
  }

  test("copy-on-write delete and MOR upsert: old versions out, new " +
    "versions in; unchanged co-resident rows never surface") {
    val (t, df) = mkTable("cl-cow")
    t.deleteWhere($"grp" === 4) // v2: CoW — rewrites touched files
    val ch2 = t.readChangelog(1, 2)
    assert(ch2.filter(col(ct) === "insert").count() == 0)
    assert(ch2.filter(col(ct) === "delete").count() == 40)
    assert(ch2.filter($"grp" =!= 4).count() == 0)

    val src = df.filter($"grp" === 1)
      .withColumn("payload", concat(lit("u-"), $"id"))
    t.upsertMor(src, Seq("id")) // v3: 40 updates
    val ch3 = t.readChangelog(2, 3).cache()
    assert(ch3.filter(col(ct) === "delete").count() == 40)
    assert(ch3.filter(col(ct) === "insert").count() == 40)
    // the update pairs: same ids, old payloads out, new payloads in
    assert(ch3.filter(col(ct) === "insert" &&
      !$"payload".startsWith("u-")).count() == 0)
    assert(ch3.filter(col(ct) === "delete" &&
      $"payload".startsWith("u-")).count() == 0)
    ch3.unpersist()

    // end-to-end net across both ops
    val net = t.readChangelog(1, 3)
    assert(net.filter(col(ct) === "delete").count() == 80)
    assert(net.filter(col(ct) === "insert").count() == 40)
  }

  test("compaction nets to zero; an all-compaction range is empty by " +
    "metadata (marker short-circuit)") {
    val (t, df) = mkTable("cl-compact")
    t.append(df.withColumn("id", $"id" + 1000L)) // v2
    t.compact(1) // v3
    val chC = t.readChangelog(2, 3)
    assert(chC.count() == 0)
    val plan = chC.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Except")) // marker path, not a proved diff
    // mixed range (append + compaction): the append's rows, nothing else
    val chM = t.readChangelog(1, 3)
    assert(chM.filter(col(ct) === "delete").count() == 0)
    assert(chM.filter(col(ct) === "insert").count() == 200)
  }

  test("schema change in range aligns by field ID: renamed column " +
    "diffs as one column, added column surfaces old rows as null") {
    val (t, df) = mkTable("cl-schema")
    t.renameColumn("payload", "text") // v2
    t.append(df.limit(5).withColumn("id", $"id" + 9000L)
      .withColumnRenamed("payload", "text")
      .withColumn("score", lit(3))) // v3: additive evolution adds score
    val ch = t.readChangelog(1, 3).cache()
    // rename+add alone change no rows: only the appended 5 surface
    assert(ch.count() == 5)
    assert(ch.filter(col(ct) === "insert").count() == 5)
    assert(ch.columns.contains("text") && ch.columns.contains("score"))
    ch.unpersist()
    // a delete across the schema change emits old rows under NEW names
    t.deleteWhereEqual(Seq(0L, 1L).toDF("id"), Seq("id")) // v4
    val ch2 = t.readChangelog(3, 4)
    assert(ch2.filter(col(ct) === "delete").count() == 2)
    val r = ch2.filter($"id" === 0L).head()
    assert(r.getAs[String]("text") == "p-0")
    assert(r.isNullAt(r.fieldIndex("score"))) // pre-add file: null
  }

  test("GDPR fast path: an equality-delete range produces its " +
    "changelog via a key semi-join — no exceptAll diff in the plan") {
    val (t, df) = mkTable("cl-fast")
    t.deleteWhereEqual((0 until 30 by 3).map(_.toLong).toDF("id"),
      Seq("id")) // v2: forget 10 keys
    val ch = t.readChangelog(1, 2)
    assert(ch.filter(col(ct) === "insert").count() == 0)
    assert(ch.filter(col(ct) === "delete").count() == 10)
    assert(ch.filter($"id" % 3 =!= 0).count() == 0)
    assert(!ch.queryExecution.optimizedPlan.toString.contains("Except"))
    // two eq deletes sharing a key-column set: still the fast path,
    // keys unioned
    t.deleteWhereEqual(Seq(1L, 2L).toDF("id"), Seq("id")) // v3
    val ch2 = t.readChangelog(1, 3)
    assert(ch2.count() == 12)
    assert(ch2.filter(col(ct) === "delete").count() == 12)
    assert(!ch2.queryExecution.optimizedPlan.toString.contains("Except"))
  }

  test("equality delete keying on a column ADDED inside the range " +
    "degrades to the general diff instead of throwing") {
    val (t, df) = mkTable("cl-addcol-key")
    t.append(df.limit(30).withColumn("id", $"id" + 1000L)
      .withColumn("owner", concat(lit("u-"), ($"id" % 7).cast("string"))))
      // v2: additive evolution — `owner` does not exist at v1
    t.deleteWhereEqual(Seq("u-3").toDF("owner"), Seq("owner")) // v3
    // the fast path cannot project `owner` under the FROM schema; the
    // range must fall back to the two-sided diff and still be exact
    val ch = t.readChangelog(1, 3).cache()
    val expectedInserts = (0 until 30).map(i => i + 1000L)
      .filter(id => id % 7 != 3).toSet
    assert(ch.filter(col(ct) === "insert").select("id").as[Long]
      .collect().toSet == expectedInserts)
    // v1 rows carry owner=null, which never equals a delete key —
    // nothing from the pre-evolution file is deleted
    assert(ch.filter(col(ct) === "delete").count() == 0)
    ch.unpersist()
  }

  test("GDPR fast path prunes covered files by key bounds: disjoint-" +
    "range files contribute nothing and the deletes stay exact") {
    val df = (0L until 100L).map(i => (i, s"p-$i")).toDF("id", "payload")
    val t = LakeTable.create(spark, tmpDir("cl-prune"), df.schema)
    t.append(df.coalesce(1))                                      // v1
    t.append((5000L until 5100L).map(i => (i, s"p-$i"))
      .toDF("id", "payload").coalesce(1))                         // v2
    t.append((9000L until 9100L).map(i => (i, s"p-$i"))
      .toDF("id", "payload").coalesce(1))                         // v3
    // forget keys living ONLY in the middle file — the bounds prune
    // (one tiny agg over the key files) must read just that file and
    // the deletes must still be exactly the forgotten rows
    t.deleteWhereEqual(Seq(5005L, 5042L).toDF("id"), Seq("id"))   // v4
    val ch = t.readChangelog(3, 4).cache()
    assert(ch.filter(col(ct) === "insert").count() == 0)
    assert(ch.filter(col(ct) === "delete").select("id").as[Long]
      .collect().sorted.toSeq == Seq(5005L, 5042L))
    // the pruned plan scans one data file (plus the key file): the
    // middle file's rows are the only data rows anywhere in the plan
    val scanned = ch.filter(col(ct) === "delete")
      .select("payload").as[String].collect()
    assert(scanned.forall(_.startsWith("p-5")))
    ch.unpersist()
    // out-of-range keys prune everything: an empty (but exact)
    // changelog, not an error
    t.deleteWhereEqual(Seq(777777L).toDF("id"), Seq("id"))        // v5
    assert(t.readChangelog(4, 5).count() == 0)
    assert(t.read().count() == 298)
  }

  test("expired endpoints are loud; reversed range is rejected") {
    val (t, df) = mkTable("cl-ret")
    t.append(df.withColumn("id", $"id" + 1000L)) // v2
    t.append(df.withColumn("id", $"id" + 2000L)) // v3
    t.expireSnapshots(keepLast = 2) // v0, v1 gone
    intercept[IllegalStateException](t.readChangelog(1, 3))
    intercept[IllegalArgumentException](t.readChangelog(3, 2))
    assert(t.readChangelog(2, 3).count() == 200)
  }
}
