package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.WindowAssign

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is a deterministic, order-stable batch query over
  * the driver's parquet tables; every SQL-expressible one has a matching
  * DuckDB `oracleSql` with IDENTICAL output column names. Aggregated doubles
  * are rounded on both sides so cross-engine float summation order cannot
  * flip the driver's hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("count_window_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A6 CountWindow (batch form): every 100 events in arrival order form a
    // window; aggregate per window. event_id is the arrival order key.
    "count_window_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
      WindowAssign.countWindow(ev, 100, Seq(col("event_id")))
        .groupBy(col("window_id"))
        .agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          round(avg(col("value")), 4).as("avg_value"),
          min(col("event_id")).as("first_id"),
          max(col("event_id")).as("last_id"))
        .orderBy(col("window_id"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "count_window_agg" ->
      """SELECT window_id,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value,
        |       round(avg(value), 4) AS avg_value,
        |       min(event_id) AS first_id,
        |       max(event_id) AS last_id
        |FROM (SELECT event_id, value,
        |             (row_number() OVER (ORDER BY event_id) - 1) // 100 AS window_id
        |      FROM events)
        |GROUP BY window_id
        |ORDER BY window_id""".stripMargin
  )
}
