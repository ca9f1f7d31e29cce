package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_seconds}

/** Streaming analogue of [[graft.operators.Analytics.ewma]]: bounded-horizon
  * exponential smoothing as per-key `flatMapGroupsWithState` state. The
  * batch operator already truncates the recurrence at horizon K ((1−α)^K
  * below output precision), making each output a pure function of the last
  * K rows — so like [[StreamingBollinger]]/[[StreamingRollingMedian]] the
  * streaming form is EXACT, not an online approximation: the state is the
  * ring of the last K−1 micro-unit values plus the arrival counter, and
  * each arrival replays the batch column's arithmetic step for step —
  * weights (1−α)^j from the same `math.pow` doubles, numerator/denominator
  * accumulated in the same ascending-j order (the batch form's
  * `reduceLeft`), missing lags skipped (adding their 0.0 is an exact
  * no-op), and the final `round(num/den/10⁴, 4)` through the same
  * `BigDecimal.valueOf` HALF_UP path as Catalyst's Round-on-double. A
  * mid-series micro-batch split therefore cannot change a single output
  * bit (spec: streamed values ≡ the batch column row-for-row).
  *
  * Values quantize exactly like the batch `round(value·10⁴, 0)`; arrivals
  * within a batch process in (ts, v) order, the batch order-column
  * contract. State is bounded: K−1 longs per key, stream-length-free.
  */
object StreamingEwma {

  case class Obs(key: String, ts_s: Long, v: Double)
  case class Smoothed(key: String, ts_s: Long, i: Long, ewma: Double)
  case class RingState(i: Long, ring: Seq[Long])

  /** @param maxIdleMs optional event-time state TTL (see [[TwinRunner]];
    *                   also the lateness allowance: the TTL
    *                   watermark drops rows more than maxIdleMs
    *                   behind the stream's max event time, and a dead
    *                   key's state survives ~2x maxIdleMs of stream
    *                   advance before its watermark-relative horizon
    *                   passes).
    *                   Eviction semantics:
    *                   an evicted key restarts its smoothing window cold
    *                   on return (first values average the shorter
    *                   frame, like any fresh key).
    */
  def smooth(ds: Dataset[Obs], alpha: Double, horizon: Int = 8,
      maxIdleMs: Option[Long] = None): Dataset[Smoothed] = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    require(horizon >= 1, s"horizon >= 1, got $horizon")
    import ds.sparkSession.implicits._
    // same weight doubles as the batch column's lit(math.pow(1 - alpha, j))
    val weights = (0 until horizon).map(j => math.pow(1 - alpha, j)).toArray
    TwinRunner.run[Obs, RingState, Smoothed](
        ds, _.key, timestamp_seconds(col("ts_s")), _.ts_s * 1000L, maxIdleMs) {
      (key, events, prior) =>
        var st = prior.getOrElse(RingState(0L, Vector.empty))
        val out = Seq.newBuilder[Smoothed]
        events.sortBy(o => (o.ts_s, o.v)).foreach { o =>
          val vu = java.math.BigDecimal.valueOf(o.v * 10000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          val window = (st.ring :+ vu).takeRight(horizon) // oldest..newest
          // ascending j = newest..oldest, exactly the batch lag(x, j) terms
          var num = 0.0
          var den = 0.0
          var j = 0
          while (j < window.length) {
            val w = weights(j)
            num += w * window(window.length - 1 - j)
            den += w
            j += 1
          }
          val e = java.math.BigDecimal.valueOf(num / den / 10000.0)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          val i1 = st.i + 1
          out += Smoothed(key, o.ts_s, i1, e)
          st = RingState(i1, window.takeRight(horizon - 1))
        }
        (out.result(), Some(st))
    }
  }
}
