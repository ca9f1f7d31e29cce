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
  *  - `maxIdleMs = Some(ms)`: a watermark with delay = `ms` is derived
  *    from the twin's own event-time column and the group runs under
  *    `EventTimeTimeout`. After processing a batch, the key's timeout is
  *    re-armed at `max(max event time EVER SEEN for the key + ms,
  *    watermark + 1)` (Spark rejects timeouts at or behind the watermark;
  *    the clamp means a very-late key lives one extra no-data batch,
  *    never less than its horizon). The per-key max rides the state
  *    tuple, NOT the current batch's max — an accepted out-of-order
  *    arrival must never move the deadline BACKWARD and evict a key
  *    short of its horizon. On timeout the state is dropped and nothing
  *    is emitted — open stints/runs (Twap/Dwell/Scd2) die unpublished,
  *    exactly like the batch operators drop a key's final lead()-less
  *    row; ring twins (Bollinger/RollingMedian/Ewma/Spc/Anomaly) restart
  *    cold and re-fill their frame before flagging again; Cusum restarts
  *    its baseline. A TTL longer than the stream's idle gaps is
  *    therefore OUTPUT-NEUTRAL (parity specs re-assert with a
  *    horizon-sized TTL).
  *
  * Eviction fires on the micro-batch AFTER the watermark passes the
  * deadline (Structured Streaming's no-data batches run timeouts even
  * when no new rows arrive). One more delta vs the TTL-off path: under
  * `EventTimeTimeout` Spark drops rows AT or BEHIND the watermark before
  * they reach the twin (`WatermarkSupport`'s `eventTime <= watermark`
  * late filter). The watermark delay equals the TTL, so the lateness
  * allowance is the retention horizon itself: a row more than
  * `maxIdleMs` behind the stream's max event time is dropped before the
  * twin sees it, while cross-key event-time skew WITHIN the horizon
  * loses nothing. The eviction horizon is WATERMARK-relative (last
  * event + maxIdleMs vs the watermark); since the watermark itself lags
  * the stream max by the lateness allowance, a dead key's state
  * survives until the stream advances ~2 × maxIdleMs past its last
  * event — total state is still bounded by active keys, with a 2×
  * constant, which is the deliberate trade for not dropping skewed
  * keys' rows. TTL-off twins judge late rows at arrival; that path is
  * untouched. Both prices are stated on every twin's `maxIdleMs` param —
  * they are the standard cost of a watermark, and the right one for the
  * key-churn deployments a TTL exists for.
  */
private[streaming] object TwinRunner {

  /** The derived watermark column (only present when a TTL is set). */
  val EventTimeCol = "__graft_event_time"

  // State-format note: TTL mode stores (twin state, per-key max event
  // time) as a tuple in the state store. Changing a twin's state shape —
  // including toggling maxIdleMs on or off — is a state-schema change, so
  // an existing streaming checkpoint cannot be resumed across it (restart
  // from a fresh checkpoint, the standard Structured Streaming contract
  // for stateful-operator schema changes).

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
        // clamp the watermark delay: Spark's interval parser converts ms
        // to µs with multiplyExact, so a "never expire" TTL near
        // Long.MaxValue would throw at query definition — the clamp keeps
        // that sentinel usable (the deadline arithmetic below saturates
        // independently)
        val delayMs = math.min(idle, Long.MaxValue / 1000)
        val withWm = ds.toDF()
          .withColumn(EventTimeCol, eventTime)
          .withWatermark(EventTimeCol, s"$delayMs milliseconds")
          .as[V]
        // state is (twin state, max event time ever seen for the key):
        // the deadline must be armed from the all-time max, not the
        // current batch's max — an accepted out-of-order arrival would
        // otherwise move the deadline backward and evict early
        implicit val tupleEnc: Encoder[(S, Long)] =
          Encoders.tuple(es, Encoders.scalaLong)
        withWm.groupByKey(keyOf)(Encoders.STRING)
          .flatMapGroupsWithState[(S, Long), O](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
            (key: String, it: Iterator[V], state: GroupState[(S, Long)]) =>
              if (state.hasTimedOut) {
                state.remove()
                Iterator.empty
              } else {
                val events = it.toSeq
                val prior = state.getOption
                val (out, next) = process(key, events, prior.map(_._1))
                val maxSeen = math.max(
                  prior.map(_._2).getOrElse(Long.MinValue),
                  events.iterator.map(eventTimeMs).max)
                next match {
                  case Some(s) => state.update((s, maxSeen))
                  // "None = leave untouched" keeps the twin state; the
                  // tracked max still advances
                  case None if prior.isDefined => state.update((prior.get._1, maxSeen))
                  case None => ()
                }
                if (state.exists) {
                  // saturating add: a "never expire" TTL (maxIdleMs near
                  // Long.MaxValue) must not wrap negative and evict on the
                  // very next batch
                  val deadline =
                    try math.addExact(maxSeen, idle)
                    catch { case _: ArithmeticException => Long.MaxValue }
                  state.setTimeoutTimestamp(
                    math.max(deadline, state.getCurrentWatermarkMs + 1))
                }
                out.iterator
              }
          }
    }
}
