package graft.lake

import org.apache.spark.sql.DataFrame

/** Exactly-once incremental table-to-table pipeline: each step reads the
  * source rows committed since the last consumed snapshot, applies a
  * batch transform, and appends the result to the sink in ONE commit
  * that also records the consumed source version — consumption offset
  * and output are atomic, so replays after a crash are no-ops.
  *
  * This is the reference's whole poll->read->write->commit loop
  * (ingestor.go:131-203 in /root/reference) as a first-class primitive
  * over lake tables, with the offset tracking the reference lacks (its
  * 500 ms DoGet poll re-reads everything, at-least-once). Drive it from
  * any scheduler; each `step` is idempotent.
  */
object IncrementalPipe {

  val SourceVersionKey = "pipe.sourceVersion"

  /** Consumed source version recorded in the sink (or -1). */
  def consumedVersion(sink: LakeTable): Int =
    sink.appMeta(SourceVersionKey).map(_.toInt).getOrElse(-1)

  /** Process everything newly committed in `source`; returns the new
    * consumed version (unchanged if nothing pending). */
  def step(source: LakeTable, sink: LakeTable,
           transform: DataFrame => DataFrame): Int = {
    val from = consumedVersion(sink)
    val to = source.currentVersion
    if (to <= from) return from
    val delta = transform(source.changesSince(from))
    sink.append(delta, Map(SourceVersionKey -> to.toString))
    to
  }
}
