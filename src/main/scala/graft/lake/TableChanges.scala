package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `table_changes(...)` — the PURE-SQL batch change-data-feed face
  * (Delta ships the same TVF), completing the SQL-only story for the
  * changelog: a SQL-first user can SELECT a version range of changes
  * with no Scala/PySpark reader options, and the result composes into
  * any query like a table.
  *
  *   SELECT * FROM table_changes('graft.ns.t', 2)
  *   SELECT * FROM table_changes('graft.ns.t', 2, 5)
  *   SELECT * FROM table_changes('graft.ns.t', '2026-08-15 00:00:00')
  *
  * Bounds are LITERALS: an integer is a commit version, a string (or
  * timestamp literal) a timestamp resolved through the same clock as
  * the reader options — the builder simply re-expresses the call as
  * `spark.read.option("startingVersion"|"startingTimestamp", ...)
  * .table("<ident>.changes")` ([[GraftChangesTable]]), so semantics,
  * validation, typed `_change_type` events, and the balanced
  * per-commit union are EXACTLY the batch reader face's — one code
  * path, three surfaces (SQL TVF, reader options, streaming).
  * Registered by [[graft.GraftExtensions]] (`injectTableFunction`)
  * and [[graft.GraftFunctions.register]]. */
object TableChanges {

  val Name = "table_changes"

  private def usage =
    "table_changes(table, start[, end]) expects a table name string " +
      "and literal bounds — an INTEGER commit version or a STRING/" +
      "TIMESTAMP timestamp, e.g. table_changes('cat.ns.t', 2) or " +
      "table_changes('cat.ns.t', '2026-01-01', '2026-02-01')"

  /** One bound -> the batch reader option it means. Timestamp
    * literals are Catalyst micros; the reader options take epoch
    * millis. */
  private def boundOption(e: Expression, side: String)
      : (String, String) = e match {
    case Literal(v: Int, IntegerType)  => (s"${side}Version", v.toString)
    case Literal(v: Long, LongType)    => (s"${side}Version", v.toString)
    case Literal(s: UTF8String, StringType) =>
      (s"${side}Timestamp", s.toString)
    case Literal(v: Long, _: TimestampType) =>
      (s"${side}Timestamp", (v / 1000L).toString)
    case other => throw new IllegalArgumentException(
      s"$usage (got ${other.sql} for the $side bound)")
  }

  def builder(es: Seq[Expression]): LogicalPlan = {
    require(es.size == 2 || es.size == 3, usage)
    val ident = es.head match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$usage (got ${other.sql} for the table name)")
    }
    val spark = SparkSession.active
    var r = spark.read
    val (k1, v1) = boundOption(es(1), "starting")
    r = r.option(k1, v1)
    if (es.size == 3) {
      val (k2, v2) = boundOption(es(2), "ending")
      r = r.option(k2, v2)
    }
    // the nested analysis resolves `<ident>.changes` through the
    // session's catalogs exactly like any reader — current-catalog/
    // namespace resolution included
    r.table(s"$ident.changes").queryExecution.analyzed
  }
}
