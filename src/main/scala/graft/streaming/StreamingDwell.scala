package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogue of [[graft.operators.Timeseries.dwellCensus]]'s
  * segmentation — [[StreamingTwap]]'s holds-until-next state applied to a
  * CATEGORICAL column: one open observation (timestamp + state label) per
  * key, the closed stint emitted when the successor arrives, the key's
  * final observation left open exactly like the batch lead() drop. The
  * emitted (state, duration) stints are identical to the batch
  * segmentation whatever the micro-batch cuts, so a census aggregated
  * from them reproduces `dwellCensus` bit-for-bit (spec-pinned). All
  * integer epoch-µs; arrivals within a batch process in (ts, state)
  * order, the batch order-column contract.
  */
object StreamingDwell {

  case class Obs(key: String, ts_us: Long, state: String)
  case class Stint(key: String, ts_us: Long, state: String, dur_us: Long)
  case class Open(ts_us: Long, state: String)

  def stints(ds: Dataset[Obs]): Dataset[Stint] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Open, Stint](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], state: GroupState[Open]) =>
          var open = state.getOption
          val out = Seq.newBuilder[Stint]
          it.toSeq.sortBy(o => (o.ts_us, o.state)).foreach { o =>
            open.foreach { p =>
              out += Stint(key, p.ts_us, p.state, o.ts_us - p.ts_us)
            }
            open = Some(Open(o.ts_us, o.state))
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }
}
