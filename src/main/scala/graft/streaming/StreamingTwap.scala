package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}

/** Streaming analogue of [[graft.operators.Timeseries.timeWeightedAvg]]'s
  * segmentation: holds-until-next stints as per-key
  * `flatMapGroupsWithState` state. The batch operator's lead() needs each
  * observation's SUCCESSOR, so the streaming form holds exactly one
  * observation per key (the open stint) and emits the closed stint when
  * its successor arrives — the whole state is two longs per key, and the
  * emitted (value, duration) segments are IDENTICAL to the batch lead()
  * segmentation whatever the micro-batch cuts (spec: TWAP aggregated from
  * streamed stints ≡ the batch operator bit-for-bit). The key's final
  * observation stays open in state, matching the batch drop of the
  * last row.
  *
  * Durations are whole milliseconds via the same truncating division
  * (timestamps ascend, so values are non-negative and truncation ≡
  * floor); values quantize through the batch path's HALF_UP micro-units.
  * Arrivals within a batch process in (ts, v) order, the batch
  * order-column contract; a cross-batch LATE arrival (event time before
  * the open observation) is DROPPED, never spliced — durations are never
  * negative.
  */
object StreamingTwap {

  case class Obs(key: String, ts_us: Long, v: Double)
  case class Stint(key: String, ts_us: Long, dur_ms: Long, vu: Long)
  case class Open(ts_us: Long, vu: Long)

  /** @param maxIdleMs optional event-time state TTL (see [[TwinRunner]];
    *                   also the lateness allowance: the TTL
    *                   watermark drops rows more than maxIdleMs
    *                   behind the stream's max event time, and a dead
    *                   key's state survives ~2x maxIdleMs of stream
    *                   advance before its watermark-relative horizon
    *                   passes).
    *                   Eviction semantics:
    *                   an evicted key's open stint dies unpublished —
    *                   exactly the batch lead() drop of the key's final
    *                   observation.
    */
  def stints(ds: Dataset[Obs], maxIdleMs: Option[Long] = None): Dataset[Stint] = {
    import ds.sparkSession.implicits._
    TwinRunner.run[Obs, Open, Stint](
        ds, _.key, timestamp_micros(col("ts_us")), _.ts_us / 1000L, maxIdleMs) {
      (key, events, prior) =>
        var open = prior
        val out = Seq.newBuilder[Stint]
        events.sortBy(o => (o.ts_us, o.v)).foreach { o =>
          val vu = java.math.BigDecimal.valueOf(o.v * 10000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          open match {
            case Some(p) if o.ts_us < p.ts_us => // late: drop, never a negative stint
            case _ =>
              open.foreach { p =>
                out += Stint(key, p.ts_us, (o.ts_us - p.ts_us) / 1000L, p.vu)
              }
              open = Some(Open(o.ts_us, vu))
          }
        }
        (out.result(), open)
    }
  }
}
