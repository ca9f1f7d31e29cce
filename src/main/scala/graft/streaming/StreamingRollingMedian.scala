package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_seconds}

/** Streaming analogue of [[graft.operators.Analytics.rollingMadCensus]]:
  * the rolling median/MAD robust-outlier monitor as per-key
  * `flatMapGroupsWithState` state. Like [[StreamingBollinger]] (and
  * unlike the CUSUM/anomaly online approximations), the batch definition
  * needs only the trailing `frameRows` values, so the streaming form is
  * EXACT: the ring of the last frameRows−1 micro-unit values plus the
  * arrival counter is the whole (bounded) state, and each arrival
  * evaluates the same all-integer test — lower median of the full frame,
  * MAD = lower median of |xᵢ − med|, flag when |v − med| > k·MAD. No
  * float anywhere, so a mid-series micro-batch split cannot flip a flag
  * (spec: census from these flags ≡ the batch census). `frameRows` must
  * be odd (lower median = median), matching the batch operator's
  * contract; rows without a full frame don't evaluate.
  *
  * Values quantize through `BigDecimal.valueOf` HALF_UP — the same path
  * as the batch census's `round(value·10⁴, 0).cast(long)`. Arrivals
  * within a batch process in (ts, v) order, the batch order-column
  * contract.
  */
object StreamingRollingMedian {

  case class Obs(key: String, ts_s: Long, v: Double)
  case class Flag(key: String, ts_s: Long, i: Long, vu: Long, outlier: Boolean)
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
    *                   flags until full again).
    */
  def flags(ds: Dataset[Obs], frameRows: Int, k: Int = 3,
      maxIdleMs: Option[Long] = None): Dataset[Flag] = {
    require(frameRows >= 3 && frameRows % 2 == 1 && k >= 1,
      "streaming rolling median: frameRows odd >= 3, k >= 1")
    import ds.sparkSession.implicits._
    val mid = (frameRows - 1) / 2 // 0-based lower-median index
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
            val sorted = window.sorted
            val med = sorted(mid)
            val mad = window.map(x => math.abs(x - med)).sorted.apply(mid)
            val outlier = math.abs(vu - med) > k.toLong * mad
            out += Flag(key, o.ts_s, i1, vu, outlier)
          }
          st = RingState(i1, window.takeRight(frameRows - 1))
        }
        (out.result(), Some(st))
    }
  }
}
