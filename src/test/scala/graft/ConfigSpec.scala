package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftConfig.fromYaml — parse + defaulting parity with the reference
  * loader (pkg/config/config.go:60-89). */
class ConfigSpec extends AnyFunSuite {

  // the reference's shipped config.yaml, verbatim shape
  private val referenceYaml =
    """# Crest Configuration
      |flight:
      |  # List of Flight server addresses
      |  servers:
      |    - localhost:8815
      |    - localhost:8816
      |  port: 8815
      |iceberg:
      |  defaultNamespace: default
      |storage:
      |  type: local
      |  localPath: data
      |  s3Bucket: crest-data
      |  s3Region: us-west-2
      |batching:
      |  maxRows: 1000
      |  maxTimeWindow: 60s
      |catalog:
      |  endpoint: http://localhost:8080
      |  type: rest
      |  warehouse: file:///tmp/warehouse
      |metrics:
      |  enabled: true
      |  collectionPath: metrics
      |""".stripMargin

  test("parses the reference-shaped config file") {
    val c = GraftConfig.fromYamlString(referenceYaml)
    assert(c.flight.servers == Seq("localhost:8815", "localhost:8816"))
    assert(c.flight.port == 8815)
    assert(c.catalog.namespace == "default")
    assert(c.catalog.endpoint.contains("http://localhost:8080"))
    assert(c.storage.warehouseDir == "data")
    assert(c.storage.kind == "local")
    assert(c.batching.maxRowsPerBatch.contains(1000L))
    assert(c.batching.triggerInterval == "60 seconds")
    assert(c.metrics.enabled)
    assert(c.metrics.collectionPath.contains("metrics"))
  }

  test("empty document takes the Go loader's defaults (config.go:72-89)") {
    val c = GraftConfig.fromYamlString("")
    assert(c.storage.warehouseDir == "data")
    assert(c.storage.kind == "local")
    assert(c.catalog.namespace == "default")
    assert(c.batching.maxRowsPerBatch.contains(1000L))
    assert(c.batching.triggerInterval == "60 seconds")
    assert(c.metrics.enabled)
    assert(c.metrics.collectionPath.isEmpty)
    assert(c.flight.servers.isEmpty)
  }

  test("partial sections default field-by-field") {
    val c = GraftConfig.fromYamlString(
      """storage:
        |  localPath: /lake/wh
        |batching:
        |  maxTimeWindow: 500ms
        |""".stripMargin)
    assert(c.storage.warehouseDir == "/lake/wh")
    assert(c.storage.kind == "local") // absent -> default
    assert(c.batching.triggerInterval == "500 milliseconds")
    assert(c.batching.maxRowsPerBatch.contains(1000L)) // absent -> default
  }

  test("durations: Go literals and spelled-out intervals") {
    val cases = Seq("60s" -> "60 seconds", "500ms" -> "500 milliseconds",
      "2m" -> "2 minutes", "1h" -> "1 hours", "10 seconds" -> "10 seconds")
    for ((in, out) <- cases)
      assert(ConfigYaml.normalizeDuration("t", in) == out, s"for '$in'")
    intercept[IllegalArgumentException] {
      ConfigYaml.normalizeDuration("t", "sixty")
    }
  }

  test("quoted values, trailing comments, and '#' inside quotes") {
    val c = GraftConfig.fromYamlString(
      """storage:
        |  localPath: "/wh/a#b"  # trailing comment
        |iceberg:
        |  defaultNamespace: 'ns1'
        |""".stripMargin)
    assert(c.storage.warehouseDir == "/wh/a#b")
    assert(c.catalog.namespace == "ns1")
  }

  test("apostrophe in an unquoted scalar doesn't eat trailing comments") {
    // regression: stripComment used to toggle quote state on ANY
    // apostrophe, so "bob's data # note" kept the comment in the value
    val c = GraftConfig.fromYamlString(
      """storage:
        |  localPath: bob's data # note
        |""".stripMargin)
    assert(c.storage.warehouseDir == "bob's data")
  }

  test("'' escapes a quote inside a single-quoted scalar") {
    val c = GraftConfig.fromYamlString(
      """storage:
        |  localPath: 'bob''s # lake'  # comment
        |""".stripMargin)
    assert(c.storage.warehouseDir == "bob's # lake")
  }

  test("fromYaml reads from a file") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".yaml")
    java.nio.file.Files.writeString(f, referenceYaml)
    try assert(GraftConfig.fromYaml(f.toString).flight.servers.size == 2)
    finally java.nio.file.Files.delete(f)
  }

  test("catalog.sqlName round-trips (absent -> None)") {
    val c = GraftConfig.fromYamlString(
      "storage:\n  localPath: /tmp/wh\ncatalog:\n  sqlName: graft\n")
    assert(c.catalog.sqlName.contains("graft"))
    assert(GraftConfig.fromYamlString("").catalog.sqlName.isEmpty)
  }

  test("malformed input fails loudly, not silently") {
    intercept[IllegalArgumentException] { // mistyped scalar where section
      GraftConfig.fromYamlString("storage: oops\n")
    }
    intercept[IllegalArgumentException] { // non-integer where int
      GraftConfig.fromYamlString("batching:\n  maxRows: many\n")
    }
    intercept[IllegalArgumentException] { // non-bool where bool
      GraftConfig.fromYamlString("metrics:\n  enabled: yes\n")
    }
    intercept[IllegalArgumentException] { // tab indentation
      ConfigYaml.parse("a:\n\tb: 1\n")
    }
    intercept[IllegalArgumentException] { // duplicate key
      ConfigYaml.parse("a: 1\na: 2\n")
    }
  }
}
