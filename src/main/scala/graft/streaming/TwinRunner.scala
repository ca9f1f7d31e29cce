package graft.streaming

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Shared execution harness for the streaming-twin family
  * (StreamingAnomaly/Bollinger/Cusum/Dwell/Ewma/RollingMedian/Scd2/Spc/
  * Twap): per-key `flatMapGroupsWithState` with an OPTIONAL event-time
  * state TTL.
  *
  * Why a TTL: each twin's PER-KEY state is bounded (a ring of ≤ 8
  * values, one open observation), but total state grows with
  * distinct-keys-EVER — on a user-keyed stream that is unbounded. The
  * reference's own retention loop (minibatch models.py:309-348,
  * `max_age`) is the precedent: state needs housekeeping. `maxIdleMs`
  * is that retention applied to operator state: a key whose last event
  * is `maxIdleMs` behind the event-time watermark is EVICTED (its
  * `GroupState` removed — the state-store row count drops, spec-pinned).
  *
  * Semantics:
  *  - `maxIdleMs = None` (default): `GroupStateTimeout.NoTimeout`, no
  *    watermark attached — the exact plan every parity spec pinned
  *    before the TTL existed. Nothing changes.
  *  - `maxIdleMs = Some(ms)`: a `0 ms`-delay watermark is derived from
  *    the twin's own event-time column and the group runs under
  *    `EventTimeTimeout`. After processing a batch, the key's timeout is
  *    re-armed at `max(last event time + ms, watermark + 1)` (Spark
  *    rejects timeouts at or behind the watermark; the clamp means a
  *    very-late key lives one extra no-data batch, never less than its
  *    horizon). On timeout the state is dropped and nothing is emitted —
  *    open stints/runs (Twap/Dwell/Scd2) die unpublished, exactly like
  *    the batch operators drop a key's final lead()-less row; ring twins
  *    (Bollinger/RollingMedian/Ewma/Spc/Anomaly) restart cold and
  *    re-fill their frame before flagging again; Cusum restarts its
  *    baseline. A TTL longer than the stream's idle gaps is therefore
  *    OUTPUT-NEUTRAL (parity specs re-assert with a horizon-sized TTL).
  *
  * Eviction fires on the micro-batch AFTER the watermark passes the
  * deadline (Structured Streaming's no-data batches run timeouts even
  * when no new rows arrive). One more delta vs the TTL-off path: under
  * `EventTimeTimeout` Spark drops rows AT or BEHIND the watermark before
  * they reach the twin (`WatermarkSupport`'s `eventTime <= watermark`
  * late filter — note the `<=`: an epoch-0 event dies even in the first
  * batch). TTL-off twins judge late rows at arrival; TTL-on twins never
  * see them — the standard price of a watermark, and the right one for
  * the key-churn deployments a TTL exists for.
  */
private[streaming] object TwinRunner {

  /** The derived watermark column (only present when a TTL is set). */
  val EventTimeCol = "__graft_event_time"

  /** Run `process` per key with optional event-time TTL.
    *
    * @param eventTime   TimestampType column derived from `ds`'s own
    *                    columns (e.g. `timestamp_seconds(col("ts_s"))`)
    *                    — only used when `maxIdleMs` is set
    * @param eventTimeMs the same event time as epoch millis, object-side
    * @param process     (key, batch events in arrival order, prior state)
    *                    => (rows to emit, state to keep; None = leave
    *                    untouched)
    */
  def run[V, S, O](
      ds: Dataset[V],
      keyOf: V => String,
      eventTime: => Column,
      eventTimeMs: V => Long,
      maxIdleMs: Option[Long])(
      process: (String, Seq[V], Option[S]) => (Seq[O], Option[S]))(
      implicit ev: Encoder[V], es: Encoder[S], eo: Encoder[O]): Dataset[O] =
    maxIdleMs match {
      case None =>
        ds.groupByKey(keyOf)(Encoders.STRING)
          .flatMapGroupsWithState[S, O](OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (key: String, it: Iterator[V], state: GroupState[S]) =>
              val (out, next) = process(key, it.toSeq, state.getOption)
              next.foreach(state.update)
              out.iterator
          }
      case Some(idle) =>
        require(idle > 0, s"streaming twin: maxIdleMs must be positive, got $idle")
        val withWm = ds.toDF()
          .withColumn(EventTimeCol, eventTime)
          .withWatermark(EventTimeCol, "0 milliseconds")
          .as[V]
        withWm.groupByKey(keyOf)(Encoders.STRING)
          .flatMapGroupsWithState[S, O](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
            (key: String, it: Iterator[V], state: GroupState[S]) =>
              if (state.hasTimedOut) {
                state.remove()
                Iterator.empty
              } else {
                val events = it.toSeq
                val (out, next) = process(key, events, state.getOption)
                next.foreach(state.update)
                if (state.exists) {
                  val lastSeen = events.iterator.map(eventTimeMs).max
                  // saturating add: a "never expire" TTL (maxIdleMs near
                  // Long.MaxValue) must not wrap negative and evict on the
                  // very next batch
                  val deadline =
                    try math.addExact(lastSeen, idle)
                    catch { case _: ArithmeticException => Long.MaxValue }
                  state.setTimeoutTimestamp(
                    math.max(deadline, state.getCurrentWatermarkMs + 1))
                }
                out.iterator
              }
          }
    }
}
