package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_seconds}

/** Streaming Western-Electric SPC monitor against FROZEN control limits —
  * the production deployment of [[graft.operators.Analytics.spcCensus]]:
  * limits come from a baseline period (the per-key exact moments (n, Σx,
  * Σx²) — the same mergeable-state shape `operators/Incremental` persists),
  * and the live stream is judged against them. That is how control charts
  * are actually run (limits are recomputed on a schedule, not per point),
  * and it is what makes the streaming form EXACT: each rule depends only
  * on the frozen limits and the trailing ≤ 8 observations, so the state is
  * a ring of the last 7 micro-unit values and a mid-series micro-batch
  * split cannot flip a flag. The same cross-multiplied integer
  * inequalities as the batch census — `BigInt` products so no baseline
  * size can overflow them — with the same pattern contract (rules flag at
  * the completing row once the trailing frame is full, counted from the
  * key's FIRST streamed row).
  *
  * Parity (spec-pinned): flags aggregated over a stream whose frozen
  * limits are the series' own full moments ≡ `Analytics.spcCensus` on the
  * same rows, rule for rule.
  *
  * Values quantize through the batch path's HALF_UP cents; arrivals
  * within a batch process in (ts, v) order, the batch order contract.
  */
object StreamingSpc {

  /** Frozen per-key baseline: exact moments over the baseline window. */
  case class Limits(n: Long, s: BigInt, q: BigInt)

  case class Obs(key: String, ts_s: Long, v: Double)
  case class Flags(key: String, ts_s: Long, i: Long,
      r1: Boolean, r2: Boolean, r3: Boolean, r4: Boolean)
  case class RingState(i: Long, ring: Seq[Long])

  /** @param maxIdleMs optional event-time state TTL (see [[TwinRunner]];
    *                   also the lateness allowance: the TTL
    *                   watermark drops rows more than maxIdleMs
    *                   behind the stream's max event time, and a dead
    *                   key's state survives ~2x maxIdleMs of stream
    *                   advance before its watermark-relative horizon
    *                   passes).
    *                   Eviction semantics:
    *                   an evicted key restarts its trailing frame AND its
    *                   arrival counter cold on return — rules 2–4 re-arm
    *                   from the key's first post-eviction row, the same
    *                   from-first-row pattern contract a fresh key has.
    */
  def flags(ds: Dataset[Obs], limits: Map[String, Limits],
      maxIdleMs: Option[Long] = None): Dataset[Flags] = {
    import ds.sparkSession.implicits._
    val lim = ds.sparkSession.sparkContext.broadcast(limits)
    TwinRunner.run[Obs, RingState, Flags](
        ds, _.key, timestamp_seconds(col("ts_s")), _.ts_s * 1000L, maxIdleMs) {
      (key, events, prior) =>
        lim.value.get(key) match {
          case None => (Seq.empty, None) // no baseline, nothing to judge
          case Some(l) =>
            val n = BigInt(l.n)
            val vr = n * l.q - l.s * l.s
            def dev(vu: Long): BigInt = BigInt(vu) * n - l.s
            def beyond(d: BigInt, k: Long): Boolean =
              d * d * (n - 1) > k * k * n * vr
            var st = prior.getOrElse(RingState(0L, Vector.empty))
            val out = Seq.newBuilder[Flags]
            events.sortBy(o => (o.ts_s, o.v)).foreach { o =>
              val vu = java.math.BigDecimal.valueOf(o.v * 100)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
              val window = (st.ring :+ vu).takeRight(8) // newest last
              val i1 = st.i + 1
              val devs = window.map(dev)
              def cnt(k: Int, p: BigInt => Boolean): Int =
                devs.takeRight(k).count(p)
              val d0 = devs.last
              val r1 = beyond(d0, 3)
              val r2 = i1 >= 3 &&
                (cnt(3, d => beyond(d, 2) && d > 0) >= 2 ||
                 cnt(3, d => beyond(d, 2) && d < 0) >= 2)
              val r3 = i1 >= 5 &&
                (cnt(5, d => beyond(d, 1) && d > 0) >= 4 ||
                 cnt(5, d => beyond(d, 1) && d < 0) >= 4)
              val r4 = i1 >= 8 &&
                (cnt(8, _ > 0) == 8 || cnt(8, _ < 0) == 8)
              out += Flags(key, o.ts_s, i1, r1, r2, r3, r4)
              st = RingState(i1, window.takeRight(7))
            }
            (out.result(), Some(st))
        }
    }
  }
}
