package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** WAP branches: staged commits invisible on main until publish,
  * atomic publish with concurrent-publisher serialization, abandon
  * restores main, retention pins the WAP base. */
class BranchSpec extends SparkSuite {
  import spark.implicits._

  private def mkTable(prefix: String) = {
    val df = (0 until 100).map(i => (i.toLong, s"t-$i", i % 5))
      .toDF("id", "payload", "grp")
    val t = LakeTable.create(spark, tmpDir(prefix), df.schema)
    t.append(df)
    (t, df)
  }

  test("staged commits are invisible on main until publish; " +
    "publish fast-forwards atomically; audits run on readBranch") {
    val (t, df) = mkTable("br-wap")
    t.createBranch("curation-7")
    assert(t.activeBranch.map(_._1).contains("curation-7"))

    // stage two commits
    t.append(df.withColumn("id", $"id" + 1000L))
    t.deleteWhere($"grp" === 4)

    // main: pinned — sees ONLY the original batch, through read,
    // readWhere, and the incremental feed
    assert(t.read().count() == 100)
    assert(t.readWhere($"id" >= 0L).count() == 100)
    assert(t.changesSince(t.mainVersion).count() == 0)
    // branch: staged view — both commits applied
    val staged = t.readBranch("curation-7")
    assert(staged.count() == 160) // 200 - 40 grp==4 rows
    assert(staged.filter($"grp" === 4).count() == 0)

    // a second branch cannot open while one stages
    val e = intercept[IllegalStateException](t.createBranch("other"))
    assert(e.getMessage.contains("linear"))

    // publish: main adopts the staged lineage in one step
    t.publishBranch("curation-7")
    assert(t.activeBranch.isEmpty)
    assert(t.read().count() == 160)
    // double publish is loud
    intercept[IllegalArgumentException](t.publishBranch("curation-7"))
    // life goes on: post-publish appends are immediately visible
    t.append(df.limit(5).withColumn("id", $"id" + 5000L))
    assert(t.read().count() == 165)
  }

  test("concurrent publishers serialize: exactly one wins") {
    val (t, df) = mkTable("br-race")
    t.createBranch("b")
    t.append(df.withColumn("id", $"id" + 1000L))
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    val results = Await.result(Future.sequence((1 to 4).map(_ =>
      Future {
        try { t.publishBranch("b"); 1 }
        catch { case _: Exception => 0 }
      })), 60.seconds).sum
    pool.shutdown()
    assert(results == 1, s"$results publishers won (want exactly 1)")
    assert(t.read().count() == 200)
  }

  test("abandon restores main exactly and releases the pin; a failed " +
    "audit never leaks staged rows") {
    val (t, df) = mkTable("br-abandon")
    val mainRows = t.read().select("id").as[Long].collect().toSet
    t.createBranch("bad-batch")
    t.append(df.withColumn("id", $"id" + 1000L)
      .withColumn("payload", lit("poisoned")))
    // the audit (any query over readBranch) fails the gate
    assert(t.readBranch("bad-batch")
      .filter($"payload" === "poisoned").count() > 0)
    t.abandonBranch("bad-batch")
    assert(t.activeBranch.isEmpty)
    assert(t.read().select("id").as[Long].collect().toSet == mainRows)
    // the staged snapshot stays retained (time travel can inspect it)
    // but main and all future reads exclude it
    t.append(df.limit(7).withColumn("id", $"id" + 9000L))
    assert(t.read().count() == 107)
  }

  test("staging isolation covers every default read surface: readAsOf " +
    "at 'now', the no-arg createTag, and meta() all answer at the pin") {
    val (t, df) = mkTable("br-default-surfaces")
    val pinned = t.currentVersion
    t.createBranch("stage")
    t.append(df.withColumn("id", $"id" + 1000L)) // staged
    // timestamp time travel at "now" must serve the pin, not the
    // staged head (the staged snapshot's commit time is <= now too)
    assert(t.readAsOf(System.currentTimeMillis() + 60000L).count() == 100)
    // the default tag pins MAIN, never unaudited staged data
    t.createTag("release")
    assert(t.tagVersion("release") == pinned)
    t.dropTag("release")
    // metadata defaults describe what read() serves
    assert(t.meta("files").count() ==
      t.meta("files", pinned).count())
    assert(t.meta("refs").filter($"type" === "wap-branch").count() == 1)
    // the explicit escape hatches still reach the staged head
    assert(t.readVersion(t.currentVersion).count() == 200)
    t.publishBranch("stage")
    assert(t.readAsOf(System.currentTimeMillis() + 60000L).count() == 200)
  }

  test("createBranch re-pins when a commit races into the pin window; " +
    "publishBranch returns the head visible AFTER the marker delete") {
    import java.nio.file.Path
    // inject the race deterministically: the store fires a hook right
    // before the wap marker's putIfAbsent — i.e. INSIDE the window
    // between createBranch's currentVersion read and the marker write
    val store = new CommitStore {
      @volatile var hook: () => Unit = null
      def putIfAbsent(path: Path, content: String): Boolean = {
        if (path.getFileName.toString.startsWith("wap-") && hook != null) {
          val h = hook; hook = null; h()
        }
        PosixCommitStore.putIfAbsent(path, content)
      }
    }
    val df = (0 until 100).map(i => (i.toLong, s"t-$i", i % 5))
      .toDF("id", "payload", "grp")
    val dir = tmpDir("br-pin-race")
    val t = LakeTable.create(spark, dir, df.schema, store = store)
    t.append(df) // v1
    val racer = LakeTable.load(spark, dir) // a plain-store main writer
    store.hook = () => { racer.append(df.withColumn("id", $"id" + 1000L)) }
    t.createBranch("pin")
    // the racer's commit was main-visible BEFORE the marker landed —
    // the pin must sit at or above it, never retroactively hide it
    val (_, pinnedAt) = t.activeBranch.get
    assert(pinnedAt == 2, s"pinned at $pinnedAt (racer's commit hidden)")
    assert(t.read().count() == 200)
    t.append(df.withColumn("id", $"id" + 2000L)) // staged
    assert(t.read().count() == 200)
    val published = t.publishBranch("pin")
    assert(published == t.currentVersion)
    assert(t.read().count() == 300)
  }

  test("retention pins the WAP base: expireSnapshots cannot expire " +
    "the main-visible version while a branch stages") {
    val (t, df) = mkTable("br-retain")
    t.append(df.limit(10).withColumn("id", $"id" + 2000L)) // v1
    t.createBranch("long-stage")                           // pins v1
    t.append(df.limit(10).withColumn("id", $"id" + 3000L)) // v2 staged
    t.append(df.limit(10).withColumn("id", $"id" + 4000L)) // v3 staged
    t.expireSnapshots(keepLast = 1)
    // main still serves the pinned version byte-exactly
    assert(t.read().count() == 110)
    t.publishBranch("long-stage")
    assert(t.read().count() == 130)
  }
}
