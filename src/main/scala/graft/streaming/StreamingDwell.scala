package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}

/** Streaming analogue of [[graft.operators.Timeseries.dwellCensus]]'s
  * segmentation — [[StreamingTwap]]'s holds-until-next state applied to a
  * CATEGORICAL column: one open observation (timestamp + state label) per
  * key, the closed stint emitted when the successor arrives, the key's
  * final observation left open exactly like the batch lead() drop. The
  * emitted (state, duration) stints are identical to the batch
  * segmentation whatever the micro-batch cuts, so a census aggregated
  * from them reproduces `dwellCensus` bit-for-bit (spec-pinned). All
  * integer epoch-µs.
  *
  * Ordering contract: arrivals within a batch process in (ts_us, seq)
  * order — `seq` is the batch census's tie-break column (the wired
  * `events_dwell` orders by (ts, event_id)), so equal-timestamp events
  * segment identically to the batch operator. Cross-batch LATE arrivals
  * (event time before the key's open observation) are DROPPED, not
  * spliced — the documented at-arrival delta every twin shares, and the
  * guarantee that emitted durations are never negative.
  */
object StreamingDwell {

  case class Obs(key: String, ts_us: Long, seq: Long, state: String)
  case class Stint(key: String, ts_us: Long, state: String, dur_us: Long)
  case class Open(ts_us: Long, state: String)

  /** @param maxIdleMs optional event-time state TTL (see [[TwinRunner]];
    *                   also the lateness allowance: the TTL
    *                   watermark drops rows more than maxIdleMs
    *                   behind the stream's max event time, and a dead
    *                   key's state survives ~2x maxIdleMs of stream
    *                   advance before its watermark-relative horizon
    *                   passes).
    *                   Eviction semantics:
    *                   an evicted key's open stint dies unpublished —
    *                   exactly the batch lead() drop of a key's final
    *                   observation.
    */
  def stints(ds: Dataset[Obs], maxIdleMs: Option[Long] = None): Dataset[Stint] = {
    import ds.sparkSession.implicits._
    TwinRunner.run[Obs, Open, Stint](
        ds, _.key, timestamp_micros(col("ts_us")), _.ts_us / 1000L, maxIdleMs) {
      (key, events, prior) =>
        var open = prior
        val out = Seq.newBuilder[Stint]
        events.sortBy(o => (o.ts_us, o.seq)).foreach { o =>
          open match {
            case Some(p) if o.ts_us < p.ts_us => // late: drop, never splice
            case _ =>
              open.foreach { p =>
                out += Stint(key, p.ts_us, p.state, o.ts_us - p.ts_us)
              }
              open = Some(Open(o.ts_us, o.state))
          }
        }
        (out.result(), open)
    }
  }
}
