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
  * 500 ms DoGet poll re-reads everything, at-least-once).
  *
  * The consumed offset lives in the sink snapshot's `highWater` map
  * under `pipe.<pipeId>.sourceVersion`, so it is (a) carried through
  * EVERY snapshot — interleaved plain appends, other pipes' steps, and
  * compactions cannot blind it — and (b) re-validated compare-and-set
  * inside the sink's optimistic commit loop: two concurrent steps of the
  * same pipe can never both land (the loser re-reads the advanced offset
  * and finds nothing left to consume). Drive `step` from any scheduler.
  */
object IncrementalPipe {

  val SourceVersionKey = "pipe.sourceVersion"

  private def offsetKey(pipeId: String) = s"pipe.$pipeId.sourceVersion"

  /** Consumed source version recorded in the sink (or -1). */
  def consumedVersion(sink: LakeTable, pipeId: String = "default"): Int =
    sink.highWater(offsetKey(pipeId)).map(_.toInt).getOrElse(-1)

  /** Process everything newly committed in `source`; returns the new
    * consumed version (unchanged if nothing pending). Idempotent and
    * safe under concurrent steps: a lost offset race re-reads and
    * retries (the loser's pre-written files are orphans for vacuum). */
  def step(source: LakeTable, sink: LakeTable,
           transform: DataFrame => DataFrame,
           pipeId: String = "default"): Int = {
    var attempt = 0
    while (true) {
      val from = consumedVersion(sink, pipeId)
      val to = source.currentVersion
      if (to <= from) return from
      val delta = transform(source.changesSince(from))
      try {
        sink.appendCas(delta, offsetKey(pipeId), expected = from,
          value = to, appMeta = Map(SourceVersionKey -> to.toString))
        return to
      } catch {
        case _: StaleOffsetException =>
          attempt += 1
          require(attempt < 10, s"pipe $pipeId: offset contention, giving up")
      }
    }
    -1 // unreachable
  }
}
