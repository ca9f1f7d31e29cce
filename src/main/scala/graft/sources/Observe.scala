package graft.sources

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scan-time pipeline observability (batch side of the engine's status
  * surface — the streaming side is `Minibatch.status`/`StatusServer`).
  *
  * A curation pipeline wants gate metrics at every stage — rows kept,
  * nulls seen, mass retained — and the naive way to get them is a
  * `count()`/`agg()` per stage: each one is a SEPARATE job, i.e. a full
  * re-scan per metric at 100 TB. `Dataset.observe` instead attaches the
  * aggregates to the plan itself (`CollectMetricsExec` feeds an
  * accumulator), so the metrics ride the ONE pass the query was already
  * making — observability becomes free at any scale.
  *
  * Metric expressions must be aggregate functions without DISTINCT (the
  * accumulator must merge associatively across tasks — same partial+final
  * contract as any map-side-combined agg).
  */
object Observe {

  /** Attach named metrics to `df`'s scan. The metrics are computed during
    * whatever action later executes `df` — no extra job. Read them back
    * with [[collectWithMetrics]] (same-plan execution) or from
    * `StreamingQueryProgress.observedMetrics` when `df` is streaming.
    */
  def withMetrics(df: DataFrame, name: String, metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "Observe.withMetrics: need at least one metric")
    val named = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, named.head, named.tail: _*)
  }

  /** Execute `df` (one job) and return its rows together with the observed
    * metrics row for `name`. The collect runs `df`'s OWN QueryExecution, so
    * the `CollectMetricsExec` accumulator it reads is the one this action
    * populated — running a derived action (`df.count()`, `df.write`)
    * instead would execute a different plan instance and leave this one's
    * metrics empty, which is why this helper owns the action.
    */
  def collectWithMetrics(df: DataFrame, name: String): (Array[Row], Row) = {
    val rows = df.collect()
    val m = df.queryExecution.observedMetrics.getOrElse(name,
      throw new IllegalStateException(
        s"Observe: no observed metrics named '$name' after execution — " +
          s"was the observe() node dropped or the name misspelled? " +
          s"present: ${df.queryExecution.observedMetrics.keys.mkString(", ")}"))
    (rows, m)
  }

  /** Run a WRITE action on `df` and return the observed metrics row for
    * `name` — the 100 TB path: [[collectWithMetrics]] materializes every
    * output row on the driver to own the action, which is fine for a gate
    * query but not for a pipeline whose output is the written table itself.
    * A write executes its own QueryExecution (the writer wraps the plan in
    * an insert command), so this df's accumulator stays empty; the metrics
    * are instead taken from the post-action [[QueryExecutionListener]]
    * callback, keyed by the observe `name` so a concurrent action on some
    * other plan can't be mistaken for ours.
    *
    * Usage: `Observe.writeWithMetrics(observed, "gate")(
    *   _.write.mode("overwrite").parquet(out))`.
    */
  def writeWithMetrics(df: DataFrame, name: String, timeoutSec: Long = 120)(
      write: DataFrame => Unit): Row = {
    val results = new LinkedBlockingQueue[Either[Throwable, Row]](1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach(r => results.offer(Right(r)))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        if (qe.observedMetrics.contains(name) ||
            qe.analyzed.collectFirst {
              case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
                  if c.name == name => c
            }.nonEmpty)
          results.offer(Left(exception))
    }
    df.sparkSession.listenerManager.register(listener)
    try {
      write(df)
      // the listener bus delivers asynchronously after the action returns
      results.poll(timeoutSec, TimeUnit.SECONDS) match {
        case Right(row) => row
        case Left(e)    => throw new IllegalStateException(
          s"Observe.writeWithMetrics: write action for '$name' failed", e)
        case null       => throw new IllegalStateException(
          s"Observe.writeWithMetrics: no observed metrics named '$name' " +
            s"arrived within ${timeoutSec}s of the write — was the observe() " +
            "node dropped or the name misspelled?")
      }
    } finally df.sparkSession.listenerManager.unregister(listener)
  }
}
