package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_seconds}

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
  * judged against the run open at its arrival, not retroactively spliced
  * — and an event EARLIER than the open run's start is DROPPED outright
  * (an inverted `[from, to)` interval must never emit). For in-order
  * arrival the closed intervals are identical to the batch operator's
  * (parity-spec-asserted).
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

  /** @param maxIdleMs optional event-time state TTL (see [[TwinRunner]];
    *                   also the lateness allowance: the TTL
    *                   watermark drops rows more than maxIdleMs
    *                   behind the stream's max event time, and a dead
    *                   key's state survives ~2x maxIdleMs of stream
    *                   advance before its watermark-relative horizon
    *                   passes).
    *                   Eviction semantics:
    *                   an evicted key's OPEN run dies unpublished (the
    *                   batch operator's open-interval row is likewise
    *                   never a closed interval); the key's next change
    *                   starts a fresh run.
    */
  def intervals(ds: Dataset[Change], maxIdleMs: Option[Long] = None): Dataset[Interval] = {
    import ds.sparkSession.implicits._
    TwinRunner.run[Change, Run, Interval](
        ds, _.key, timestamp_seconds(col("ts_s")), _.ts_s * 1000L, maxIdleMs) {
      (key, events, prior) =>
        var cur = prior
        val out = Seq.newBuilder[Interval]
        events.sortBy(c => (c.ts_s, c.seq)).foreach { c =>
          cur match {
            case Some(r) if c.ts_s < r.from => // late: drop, never an inverted interval
            case Some(r) if r.value == Option(c.value) =>
              cur = Some(r.copy(n = r.n + 1))
            case Some(r) =>
              out += Interval(key, r.value, r.from, c.ts_s, r.n)
              cur = Some(Run(Option(c.value), c.ts_s, 1))
            case None =>
              cur = Some(Run(Option(c.value), c.ts_s, 1))
          }
        }
        (out.result(), cur)
    }
  }
}
