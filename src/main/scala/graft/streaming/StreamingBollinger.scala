package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_seconds}

/** Streaming analogue of [[graft.operators.Analytics.bollingerCensus]]:
  * the rolling mean ± k·σ band monitor as per-key
  * `flatMapGroupsWithState` state — unlike the CUSUM/anomaly twins
  * (which trade the batch definition for an online approximation), the
  * Bollinger breach test needs only the trailing `frameRows` values, so
  * the streaming form computes the EXACT batch semantics flag-for-flag:
  * a ring of the last frameRows−1 micro-unit values plus the arrival
  * counter is the whole state (bounded — a million keys at frame 20 is
  * ~200 MB whatever the stream length), and each arrival evaluates the
  * same cross-multiplied integer inequality
  *
  *   (v·n − Σv)²·(n−1) > k²·n·(n·Σv² − (Σv)²)
  *
  * over the ring — no σ, no sqrt, no division, so a mid-series
  * micro-batch split cannot flip a flag (spec: census aggregated from
  * these flags ≡ [[graft.operators.Analytics.bollingerCensus]] on the
  * same rows). Rows without a full frame don't evaluate, exactly like
  * the batch form.
  *
  * Values quantize through the SAME path as the batch census's
  * `round(value · 10⁴, 0).cast(long)` — `BigDecimal.valueOf` HALF_UP,
  * matching Spark's Round on doubles bit-for-bit (math.round would
  * differ on negative half-ties). Arrivals within a batch process in
  * (ts, v) order, the batch census's order-column contract.
  */
object StreamingBollinger {

  case class Obs(key: String, ts_s: Long, v: Double)
  case class Flag(key: String, ts_s: Long, i: Long, vu: Long, breach: Boolean)
  case class RingState(i: Long, ring: Seq[Long])

  /** @param maxIdleMs optional event-time state TTL (see [[TwinRunner]];
    *                   also the lateness allowance: the TTL
    *                   watermark drops rows more than maxIdleMs
    *                   behind the stream's max event time, and a dead
    *                   key's state survives ~2x maxIdleMs of stream
    *                   advance before its watermark-relative horizon
    *                   passes).
    *                   Eviction semantics:
    *                   an evicted key's frame re-fills cold on return (no
    *                   flags until full again — the batch contract for a
    *                   fresh key).
    */
  def flags(ds: Dataset[Obs], frameRows: Int, k: Int = 2,
      maxIdleMs: Option[Long] = None): Dataset[Flag] = {
    require(frameRows >= 2 && k >= 1, "streaming bollinger: frameRows >= 2, k >= 1")
    import ds.sparkSession.implicits._
    val n = frameRows.toLong
    val k2 = k.toLong * k
    TwinRunner.run[Obs, RingState, Flag](
        ds, _.key, timestamp_seconds(col("ts_s")), _.ts_s * 1000L, maxIdleMs) {
      (key, events, prior) =>
        var st = prior.getOrElse(RingState(0L, Vector.empty))
        val out = Seq.newBuilder[Flag]
        events.sortBy(o => (o.ts_s, o.v)).foreach { o =>
          val vu = java.math.BigDecimal.valueOf(o.v * 10000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          val window = (st.ring :+ vu).takeRight(frameRows)
          val i1 = st.i + 1
          if (window.length == frameRows) {
            var sx = 0L
            var sxx = 0L
            window.foreach { x => sx += x; sxx += x * x }
            val dev = vu * n - sx
            val breach = dev * dev * (n - 1) > k2 * n * (n * sxx - sx * sx)
            out += Flag(key, o.ts_s, i1, vu, breach)
          }
          st = RingState(i1, window.takeRight(frameRows - 1))
        }
        (out.result(), Some(st))
    }
  }
}
