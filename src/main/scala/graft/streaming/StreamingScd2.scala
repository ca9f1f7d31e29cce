package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogue of [[graft.operators.Timeseries.changeIntervals]]:
  * SCD2 validity runs maintained as `flatMapGroupsWithState` state — the
  * batch gaps-and-islands window becomes one open-run record per key.
  *
  * Emission contract: a CLOSED interval is appended the moment its key's
  * value changes (`valid_to` = the new run's `valid_from`, half-open
  * `[from, to)` like the batch operator); the OPEN run lives in state and
  * is never emitted — an SCD2 consumer materializes closed history from
  * the stream and reconstructs current state from the latest change, so
  * append-mode closed-only emission is the natural contract. Deltas vs
  * batch, documented like every emitter's: events are processed in
  * (ts, seq) order WITHIN a micro-batch, so a cross-batch late event is
  * judged against the run open at its arrival, not retroactively spliced.
  * For in-order arrival the closed intervals are identical to the batch
  * operator's (parity-spec-asserted).
  *
  * State is ONE fixed-size record per key — bounded by key cardinality,
  * not event rate or window span.
  */
object StreamingScd2 {

  /** `value` is nullable (a null run is a run, matching the batch
    * operator's null-safe change detection).
    */
  case class Change(key: String, ts_s: Long, seq: Long, value: String)
  case class Interval(key: String, value: Option[String], valid_from: Long,
      valid_to: Long, n_events: Long)
  case class Run(value: Option[String], from: Long, n: Long)

  def intervals(ds: Dataset[Change]): Dataset[Interval] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Run, Interval](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Change], state: GroupState[Run]) =>
          var cur = state.getOption
          val out = Seq.newBuilder[Interval]
          it.toSeq.sortBy(c => (c.ts_s, c.seq)).foreach { c =>
            cur match {
              case Some(r) if r.value == Option(c.value) =>
                cur = Some(r.copy(n = r.n + 1))
              case Some(r) =>
                out += Interval(key, r.value, r.from, c.ts_s, r.n)
                cur = Some(Run(Option(c.value), c.ts_s, 1))
              case None =>
                cur = Some(Run(Option(c.value), c.ts_s, 1))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
