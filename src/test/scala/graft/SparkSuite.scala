package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark
  val sf = "/root/testdata/sf0.001"
  def tmpDir(prefix: String): String = {
    val p = java.nio.file.Paths.get(
      s"/root/repo/target/test-tmp/$prefix-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }
}
