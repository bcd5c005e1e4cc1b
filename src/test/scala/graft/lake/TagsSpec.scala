package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Tags: named, retention-pinned snapshot references — "the exact
  * corpus run X trained on" as a durable name. */
class TagsSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("create/resolve/list/drop; immutability; readTag content") {
    val t = LakeTable.create(spark, tmpDir("tags"), schema)
    t.append((0L until 10L).map(i => (i, s"a-$i")).toDF("id", "v"))
    val v1 = t.currentVersion
    t.createTag("train-v1")
    t.append((10L until 25L).map(i => (i, s"b-$i")).toDF("id", "v"))
    t.createTag("train-v2", t.currentVersion)
    assert(t.tags == Map("train-v1" -> v1,
      "train-v2" -> t.currentVersion))
    assert(t.readTag("train-v1").count() == 10)
    assert(t.readTag("train-v2").count() == 25)
    // immutable: re-creating an existing tag fails; move = drop + create
    intercept[IllegalArgumentException] { t.createTag("train-v1") }
    intercept[IllegalArgumentException] { t.createTag("bad name!", 0) }
    intercept[IllegalArgumentException] { t.tagVersion("nope") }
    t.dropTag("train-v2")
    assert(t.tags.keySet == Set("train-v1"))
    intercept[IllegalArgumentException] { t.dropTag("train-v2") }
  }

  test("a tag pins its snapshot against retention: expire keeps the " +
    "tagged version and every file it references; drop releases it") {
    val t = LakeTable.create(spark, tmpDir("tags-retain"), schema)
    (0 until 6).foreach(b =>
      t.append((b * 10 until (b + 1) * 10).map(i =>
        (i.toLong, s"r-$i")).toDF("id", "v")))
    val vTag = 3 // v0 = empty create, v1..v3 = three appends: 30 rows
    t.createTag("pinned", vTag)
    // compact so old files become orphaned for untagged versions
    t.compact(1)
    val (expired, _) = t.expireSnapshots(keepLast = 1)
    assert(expired > 0)
    // untagged history is gone, the tagged snapshot survives exactly
    intercept[Exception] { t.readVersion(1).count() }
    assert(t.readTag("pinned").count() == 30)
    assert(t.readTag("pinned").select("id").as[Long].collect().sorted
      .toSeq == (0L until 30L))
    assert(t.read().count() == 60)
    // releasing the pin lets the next expiry reclaim it
    t.dropTag("pinned")
    t.expireSnapshots(keepLast = 1)
    intercept[Exception] { t.readVersion(vTag).count() }
    assert(t.read().count() == 60)
  }

  test("a tag pins the MOR delete state of its snapshot") {
    val t = LakeTable.create(spark, tmpDir("tags-mor"), schema)
    t.append((0L until 40L).map(i => (i, s"m-$i")).toDF("id", "v"))
    t.createTag("pre-delete")
    t.deleteWherePositional($"id" < 15L)
    t.createTag("post-delete")
    assert(t.readTag("pre-delete").count() == 40)
    assert(t.readTag("post-delete").count() == 25)
    // absorption does not disturb the pinned pre-delete view
    t.compact(1)
    t.expireSnapshots(keepLast = 1)
    assert(t.readTag("pre-delete").count() == 40)
    assert(t.readTag("post-delete").count() == 25)
  }
}
