package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair over irregular event streams: bucketize, densify,
  * forward-fill, linearly interpolate.
  *
  * The reference has no time-series surface at all (its closest concept is
  * the FixedTimeWindow emitter, reference window.py:229-278, which *groups*
  * by arrival interval but never fills gaps); this is an [EXT] operator for
  * the feature-engineering step a training pipeline runs before windowed
  * aggregation — sensors, metrics, and activity series arrive irregular,
  * models want a dense grid.
  */
object Timeseries {

  /** Dense per-key grid at `stepSeconds` resolution with forward-fill and
    * linear interpolation.
    *
    * Contract (mirrored exactly by the DuckDB oracle):
    *   1. bucket = floor(ts / step) * step; per (key, bucket) the observed
    *      value is avg(value) — UNROUNDED. Rounding here once made
    *      interpolation midpoints land on exact decimal ties (x.xxxx5),
    *      where Spark's round (BigDecimal HALF_UP on the shortest decimal
    *      repr) and DuckDB's (scaled std::round on the binary double)
    *      break differently; on full-precision averages decimal ties have
    *      measure zero, so the single final round agrees across engines;
    *   2. the spine per key is every step from its min to its max observed
    *      bucket (`sequence` + `explode` — generated distributed, never on
    *      the driver);
    *   3. `v_ffill` = last observed bucket value at or before this bucket;
    *   4. `v_interp` = the observation itself where present, else the
    *      linear interpolation between the surrounding observed buckets,
    *      else the forward/backward fill at the series edges.
    *
    * Output: (key, bucket_s, is_observed, v_ffill, v_interp).
    *
    * Scale shape: one hash agg on (key, bucket) with map-side combine, one
    * tiny per-key extent agg, a spine join hash-partitioned on (key,
    * bucket), and two per-key window sorts. Nothing is global: keys spread
    * across executors, so 10⁹ independent series parallelize flat. The
    * window sort is per-key and bounded by the spine length
    * ((max-min)/step); a single key spanning years at 1 s resolution is a
    * 10⁷-row partition — split such series by a coarse epoch (day/month)
    * column first, exactly like any skewed-window workload. `sequence()`
    * would refuse outright far earlier (it caps elements per call), so a
    * mis-sized step fails loudly instead of OOMing an executor.
    */
  def gapFillInterpolate(
      df: DataFrame,
      key: Column,
      tsSeconds: Column,
      value: Column,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "gapFillInterpolate: stepSeconds must be positive")
    val w = lit(stepSeconds)
    val b = df
      .select(key.as("key"), ((floor(tsSeconds / w)).cast("long") * w).as("bucket_s"), value.as("v"))
      .groupBy(col("key"), col("bucket_s"))
      .agg(avg(col("v")).as("v_obs"))
    val spine = b.groupBy(col("key"))
      .agg(min(col("bucket_s")).as("mn"), max(col("bucket_s")).as("mx"))
      .select(col("key"), explode(sequence(col("mn"), col("mx"), w)).as("bucket_s"))
    val back = Window.partitionBy(col("key")).orderBy(col("bucket_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("key")).orderBy(col("bucket_s"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(b, Seq("key", "bucket_s"), "left")
      .withColumn("prev_v", last(col("v_obs"), ignoreNulls = true).over(back))
      .withColumn("prev_t",
        last(when(col("v_obs").isNotNull, col("bucket_s")), ignoreNulls = true).over(back))
      .withColumn("next_v", first(col("v_obs"), ignoreNulls = true).over(fwd))
      .withColumn("next_t",
        first(when(col("v_obs").isNotNull, col("bucket_s")), ignoreNulls = true).over(fwd))
      .select(col("key"), col("bucket_s"),
        col("v_obs").isNotNull.as("is_observed"),
        round(col("prev_v"), 4).as("v_ffill"),
        // association mirrors the oracle SQL token-for-token; inputs stay
        // full-precision so the final round never sees a constructed tie
        round(when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("prev_t").isNotNull && col("next_t").isNotNull,
            col("prev_v") + (col("next_v") - col("prev_v")) *
              (col("bucket_s") - col("prev_t")).cast("double") /
              (col("next_t") - col("prev_t")))
          .otherwise(coalesce(col("prev_v"), col("next_v"))), 4).as("v_interp"))
  }
}
