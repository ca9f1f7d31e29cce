package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the daily-ingest pattern a 100 TB
  * warehouse lives on. A full `groupBy` over the corpus re-reads every
  * byte ever ingested; the mergeable-state split re-reads NOTHING but the
  * new delta:
  *
  *   state(corpus)                  — once, offline
  *   merge(state, state(delta))    — per ingest: one scan OF THE DELTA +
  *                                    one hash agg over |groups| rows
  *   finish(state)                 — serve-time projection, no scan
  *
  * Correct only if every aggregate in the state is MERGEABLE: count/sum
  * fold by +, min/max by min/max, and distinct counts by an HLL sketch
  * union (Apache DataSketches via Spark's `hll_sketch_agg` /
  * `hll_union_agg` — the same partial+final split Spark's own physical
  * aggregation performs inside one query, lifted across queries and
  * persisted). Exact distinct is deliberately absent: it is not boundedly
  * mergeable (the state would have to carry every value ever seen).
  *
  * Values should be pre-folded to exact integers (cents, micros) by the
  * caller so merge order can never flip a float bit — the merged state is
  * then bit-identical to `state(base ∪ delta)` computed in one shot
  * (spec-asserted), which is what makes the oracle comparison against a
  * full recompute exact.
  *
  * The reference has no warehouse layer; this extends its windowed-agg
  * surface (reference window.py:13-327 recomputes each window from the
  * buffer) with cross-batch aggregate reuse.
  */
object Incremental {

  /** Column names the state schema reserves beyond the group keys. */
  val StateCols: Seq[String] = Seq("n", "sum_u", "min_u", "max_u", "hll")

  /** Partial-aggregate state of `df` per `keys`: exact count/sum/min/max
    * of integer `value` plus an HLL sketch of `distinctOn`. One hash agg
    * (partial+final) over one scan; output is |groups| rows — the compact
    * artifact that persists between ingests.
    */
  def state(df: DataFrame, keys: Seq[Column], value: Column,
      distinctOn: Column): DataFrame =
    df.groupBy(keys: _*).agg(
      count(lit(1)).as("n"),
      sum(value).as("sum_u"),
      min(value).as("min_u"),
      max(value).as("max_u"),
      hll_sketch_agg(distinctOn).as("hll"))

  /** Fold any number of state tables into one. Associative and
    * commutative (integer sums, min/max lattice, sketch union), so a
    * 1000-executor tree merge, pairwise daily folds and one big union
    * all produce the same state. Cost: a hash agg over Σ|groupsᵢ| rows —
    * independent of the corpus sizes the states summarize.
    */
  def merge(keyNames: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge: at least one state")
    states.reduce(_.unionByName(_)).groupBy(keyNames.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_u")).as("sum_u"),
      min(col("min_u")).as("min_u"),
      max(col("max_u")).as("max_u"),
      hll_union_agg(col("hll")).as("hll"))
  }

  /** Serve-time projection of a state table: the finished aggregate row
    * per group. `avg_u` = round(sum/n, 4) — one hardware-exact long→double
    * division per group; `n_distinct_approx` finalizes the sketch. No
    * corpus scan: input is |groups| rows.
    */
  def finish(state: DataFrame, keyNames: Seq[String]): DataFrame =
    state.select(keyNames.map(col) ++ Seq(
      col("n"), col("sum_u"), col("min_u"), col("max_u"),
      round(col("sum_u").cast("double") / col("n"), 4).as("avg_u"),
      hll_sketch_estimate(col("hll")).as("n_distinct_approx")): _*)

  /** One persisted maintenance step: fold `delta`'s state into the state
    * table under `path` and write it as the next version directory
    * `path/v=<k+1>` (parquet, with Spark's `_SUCCESS` marker). Versioned
    * dirs make the step replay-safe — a re-run after a mid-write crash
    * overwrites its own incomplete version and never touches the previous
    * one; readers ([[latestState]]) only ever see versions whose
    * `_SUCCESS` exists. Returns the new version number.
    */
  def maintain(spark: SparkSession, path: String, keyNames: Seq[String],
      deltaState: DataFrame): Long = {
    val next = latestVersion(spark, path).map(_ + 1).getOrElse(0L)
    val merged = latestState(spark, path) match {
      case Some(prev) => merge(keyNames, prev, deltaState)
      case None => deltaState
    }
    merged.write.mode("overwrite").parquet(s"$path/v=$next")
    next
  }

  /** The newest COMPLETE (`_SUCCESS`-marked) state version under `path`. */
  def latestState(spark: SparkSession, path: String): Option[DataFrame] =
    latestVersion(spark, path).map(v => spark.read.parquet(s"$path/v=$v"))

  private def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toLong)
      .maxOption
  }
}
