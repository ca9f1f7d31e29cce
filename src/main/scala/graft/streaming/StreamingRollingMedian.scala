package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  def flags(ds: Dataset[Obs], frameRows: Int, k: Int = 3): Dataset[Flag] = {
    require(frameRows >= 3 && frameRows % 2 == 1 && k >= 1,
      "streaming rolling median: frameRows odd >= 3, k >= 1")
    import ds.sparkSession.implicits._
    val mid = (frameRows - 1) / 2 // 0-based lower-median index
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[RingState, Flag](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], state: GroupState[RingState]) =>
          var st = state.getOption.getOrElse(RingState(0L, Vector.empty))
          val out = Seq.newBuilder[Flag]
          it.toSeq.sortBy(o => (o.ts_s, o.v)).foreach { o =>
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
          state.update(st)
          out.result().iterator
      }
  }
}
