package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_seconds}

/** Streaming analogue of [[graft.operators.Analytics.cusumCensus]]: the
  * ONLINE (tabular) CUSUM drift detector (Page 1954) as per-key
  * `flatMapGroupsWithState` state. Where the batch census centers on the
  * key's WHOLE-series mean (two passes over stored data), a stream cannot
  * see the future — the online form tracks the running mean and
  * accumulates one-sided excursions against it:
  *
  *   S⁺ ← max(0, S⁺ + (v − mean − slack))
  *   S⁻ ← max(0, S⁻ + (mean − v − slack))
  *
  * with a drift ALARM when either side exceeds `threshold`; on alarm the
  * accumulators reset (the standard restart — each alarm marks one
  * detected shift, not a saturated flag). The running mean uses the
  * observations BEFORE the current one (a shift should not drag its own
  * baseline), so the first observation never alarms.
  *
  * State per key is FOUR numbers (n, mean, S⁺, S⁻) — constant, no ring —
  * which is what makes this the 100 TB streaming shape: a million keys is
  * a few hundred MB of state regardless of stream length.
  *
  * Documented delta vs the batch census (same family as
  * [[StreamingAnomaly]]'s at-arrival judgement): the batch form's
  * mean-centered cumulative deviation uses the final mean, so batch and
  * online flag the same level shifts but at different positions/counts;
  * the spec pins behaviour on step/constant series rather than
  * cross-checking counts.
  */
object StreamingCusum {

  case class Obs(key: String, ts_s: Long, v: Double)
  case class Alarm(key: String, ts_s: Long, v: Double, n_seen: Long,
      s_pos: Double, s_neg: Double, alarm: Boolean)
  case class CusumState(n: Long, mean: Double, sPos: Double, sNeg: Double)

  /** @param maxIdleMs optional event-time state TTL (see [[TwinRunner]];
    *                   also the lateness allowance: the TTL
    *                   watermark drops rows more than maxIdleMs
    *                   behind the stream's max event time, and a dead
    *                   key's state survives ~2x maxIdleMs of stream
    *                   advance before its watermark-relative horizon
    *                   passes).
    *                   Eviction semantics:
    *                   an evicted key restarts its running-mean baseline
    *                   cold on return (first post-eviction row never
    *                   alarms, like any fresh key).
    */
  def alarms(
      ds: Dataset[Obs],
      threshold: Double,
      slack: Double = 0.0,
      maxIdleMs: Option[Long] = None): Dataset[Alarm] = {
    require(threshold > 0 && slack >= 0, "streaming cusum: threshold > 0, slack >= 0")
    import ds.sparkSession.implicits._
    TwinRunner.run[Obs, CusumState, Alarm](
        ds, _.key, timestamp_seconds(col("ts_s")), _.ts_s * 1000L, maxIdleMs) {
      (key, events, prior) =>
        var st = prior.getOrElse(CusumState(0L, 0.0, 0.0, 0.0))
        val out = Seq.newBuilder[Alarm]
        events.sortBy(o => (o.ts_s, o.v)).foreach { o =>
          val (sPos, sNeg) =
            if (st.n == 0) (0.0, 0.0) // no baseline yet — never alarms
            else (
              math.max(0.0, st.sPos + (o.v - st.mean - slack)),
              math.max(0.0, st.sNeg + (st.mean - o.v - slack)))
          val alarm = st.n > 0 && (sPos > threshold || sNeg > threshold)
          val n1 = st.n + 1
          val mean1 = st.mean + (o.v - st.mean) / n1
          st =
            if (alarm) CusumState(n1, mean1, 0.0, 0.0) // restart after a hit
            else CusumState(n1, mean1, sPos, sNeg)
          out += Alarm(key, o.ts_s, o.v, n1, sPos, sNeg, alarm)
        }
        (out.result(), Some(st))
    }
  }
}
