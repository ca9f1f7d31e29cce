package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

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

  /** `DIV` (integral division, truncating toward zero — the same operator
    * DuckDB spells `//` on BIGINT), surfaced for exact integer plans.
    */
  private def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(new IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dense per-key grid at `stepSeconds` resolution with forward-fill and
    * linear interpolation.
    *
    * Contract (mirrored exactly by the DuckDB oracle):
    *   1. bucket = floor(ts / step) * step; per (key, bucket) the observed
    *      value is quantized ONCE to integer micro-units:
    *      v_u = round(avg(value) · 10⁴)::BIGINT;
    *   2. the spine per key is every step from its min to its max observed
    *      bucket (`sequence` + `explode` — generated distributed, never on
    *      the driver);
    *   3. `v_ffill` = (last observed v_u at or before this bucket) / 10⁴;
    *   4. `v_interp` = v_u/10⁴ where observed, else the linear
    *      interpolation computed in EXACT integer arithmetic —
    *      (prev_u·(next_t−t) + next_u·(t−prev_t)) DIV (next_t−prev_t),
    *      then / 10⁴ — else the forward/backward fill at the series edges.
    *
    * Why integer micro-units: interpolating DOUBLE bucket averages lands on
    * exact decimal ties (midpoints of low-precision inputs), where Spark's
    * round (BigDecimal HALF_UP on the shortest decimal repr of the double)
    * and DuckDB's (scaled std::round on the binary value) disagree — and
    * the tie side even varies run-to-run with aggregation order. After the
    * single stable quantization, every op here is exact 64-bit integer
    * arithmetic with truncating division (Spark `DIV` ≡ DuckDB `//`), and
    * the final /10⁴ double division of identical integers is bit-identical
    * on both engines — nothing left to round, nothing to disagree on.
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
    * mis-sized step fails loudly instead of OOMing an executor. Micro-unit
    * magnitudes: |v_u| ≤ 2⁶³/(gap seconds) is safe for any physical series
    * (a week-long gap still leaves 15 digits of value headroom).
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
      .agg(round(avg(col("v")) * 10000, 0).cast("long").as("v_u"))
    val spine = b.groupBy(col("key"))
      .agg(min(col("bucket_s")).as("mn"), max(col("bucket_s")).as("mx"))
      .select(col("key"), explode(sequence(col("mn"), col("mx"), w)).as("bucket_s"))
    val back = Window.partitionBy(col("key")).orderBy(col("bucket_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("key")).orderBy(col("bucket_s"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(b, Seq("key", "bucket_s"), "left")
      .withColumn("prev_u", last(col("v_u"), ignoreNulls = true).over(back))
      .withColumn("prev_t",
        last(when(col("v_u").isNotNull, col("bucket_s")), ignoreNulls = true).over(back))
      .withColumn("next_u", first(col("v_u"), ignoreNulls = true).over(fwd))
      .withColumn("next_t",
        first(when(col("v_u").isNotNull, col("bucket_s")), ignoreNulls = true).over(fwd))
      .select(col("key"), col("bucket_s"),
        col("v_u").isNotNull.as("is_observed"),
        (col("prev_u").cast("double") / 10000.0).as("v_ffill"),
        (when(col("v_u").isNotNull, col("v_u"))
          .when(col("prev_t").isNotNull && col("next_t").isNotNull,
            intDiv(
              col("prev_u") * (col("next_t") - col("bucket_s")) +
                col("next_u") * (col("bucket_s") - col("prev_t")),
              col("next_t") - col("prev_t")))
          .otherwise(coalesce(col("prev_u"), col("next_u")))
          .cast("double") / 10000.0).as("v_interp"))
  }

  /** Rolling z-score anomaly flags over an irregular event stream: each
    * row is judged against the trailing `windowSeconds` event-time RANGE
    * frame of its own key (inclusive of ts-peers, SQL peer semantics on
    * both engines). A row is anomalous when the frame holds at least
    * `minN` observations AND the value deviates more than `z` sample
    * standard deviations from the frame mean — the streaming-shaped
    * outlier screen that complements the global [[graft.SparkEntry]]
    * `q_outliers_mad` census.
    *
    * Adds (n_window, mean_w, std_w, is_anomaly) to the input's (key,
    * ts_s, value) projection. Thresholding compares continuous
    * quantities with strict `>`, so cross-engine ulp noise in the window
    * stddev cannot flip a flag except on a measure-zero boundary (the
    * summation-noise class, accepted engine-wide — see SCALE.md).
    *
    * Scale shape: ONE shuffle on the key, per-key sort, streaming frame
    * evaluation — identical cost profile to any event-time RANGE frame
    * (`q_window_range_frame`); no self-join, no global sort. The
    * streaming variant is [[graft.streaming.StreamingAnomaly]] — window
    * functions don't exist in Structured Streaming, so the frame becomes
    * per-key `flatMapGroupsWithState` state (parity with this operator
    * for in-order arrival is asserted in StreamingSuite).
    */
  def rollingAnomalies(
      df: DataFrame,
      key: Column,
      tsSeconds: Column,
      value: Column,
      windowSeconds: Long,
      z: Double,
      minN: Int = 10): DataFrame = {
    require(windowSeconds > 0, "rollingAnomalies: windowSeconds must be positive")
    require(z > 0, "rollingAnomalies: z must be positive")
    val w = Window.partitionBy(col("key")).orderBy(col("ts_s"))
      .rangeBetween(-windowSeconds, 0)
    df.select(key.as("key"), tsSeconds.cast("long").as("ts_s"), value.as("v"))
      .withColumn("n_window", count(col("v")).over(w))
      .withColumn("mean_w", avg(col("v")).over(w))
      .withColumn("std_w", stddev_samp(col("v")).over(w))
      .withColumn("is_anomaly",
        coalesce(
          col("n_window") >= minN && col("std_w") > 0 &&
            abs(col("v") - col("mean_w")) > col("std_w") * z,
          lit(false)))
  }

  /** SCD2-style change intervals: collapse each key's consecutive runs of
    * an equal tracked value into validity intervals — the
    * "effective_from / effective_to" derivation a warehouse runs over a
    * mutation log. Runs are found with a null-safe lag-change flag and a
    * running sum (the gaps-and-islands formulation); each run aggregates to
    * one row, and `valid_to` is the NEXT run's `valid_from` (NULL on each
    * key's current/open run — half-open intervals, `[from, to)`).
    *
    * Output: key column (original name), `value` (the tracked value of the
    * run), `valid_from`, `valid_to` (nullable), `n_events`.
    *
    * `tieBreak` must make (ts, tieBreak) a total order per key — equal
    * timestamps otherwise make run boundaries nondeterministic.
    *
    * Scale shape: ONE shuffle of the events on the key + a per-key sort
    * for both windows; runs then collapse via hash agg (map-side combined)
    * to one row per run — the second window (the `valid_to` lead) orders
    * RUN rows, orders of magnitude fewer than events. Keys scale out
    * independently; no global sort anywhere.
    */
  def changeIntervals(
      df: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val runs = df
      .withColumn("__chg",
        when(not(lag(value, 1).over(w) <=> value), 1).otherwise(0))
      .withColumn("__run",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runAgg = runs.groupBy(key, col("__run"))
      .agg(
        min(value).as("value"),
        min(ts).cast("long").as("valid_from"),
        count(lit(1)).as("n_events"))
    // lead over the RUN id, not valid_from: two runs of one key can start
    // in the same epoch-second (ordering by valid_from alone ties, and the
    // tie resolved differently across engines at sf0.1); __run is strictly
    // monotone per key in event order, so it IS the interval sequence
    val wNext = Window.partitionBy(key).orderBy(col("__run"))
    runAgg
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wNext))
      .drop("__run")
  }

  /** Downsample an event stream to per-key fixed-width buckets with
    * OHLC-style summaries: first/last value in arrival order (open/close),
    * extremes (high/low), event count and an EXACT micro-unit sum. The
    * financial-bar resample generalised to any metric stream.
    *
    * `orderCols` must be a total order within each (key, bucket) — open and
    * close are row SELECTIONS under that order (no float arithmetic), so
    * the result is cross-engine exact. min_by/max_by make the whole bar ONE
    * hash aggregation: partial bars combine map-side and merge
    * associatively, so the only exchange carries one partial bar per
    * (key, bucket) per task — no sort anywhere, and the identical
    * aggregation runs under a streaming event-time window ([[ohlcAggs]],
    * batch-parity spec in StreamingSuite).
    *
    * Output: (keyCol, bucket_s, open, high, low, close, n_events, sum_u)
    * with open/high/low/close rounded to 2dp and sum_u the exact
    * Σ round(value·10⁴) in BIGINT micro-units.
    */
  def resampleOhlc(
      df: DataFrame,
      key: Column,
      ts: Column,
      orderCols: Seq[Column],
      value: Column,
      bucketSeconds: Long): DataFrame = {
    val bucket = (intDiv(unix_timestamp(ts), lit(bucketSeconds)) * bucketSeconds)
      .as("bucket_s")
    val base = df.select(key.as("__k"), bucket,
      struct(orderCols: _*).as("__ord"), value.as("__v"))
    base
      .groupBy(col("__k"), col("bucket_s"))
      .agg(ohlcAggs(col("__ord"), col("__v")).head,
        ohlcAggs(col("__ord"), col("__v")).tail: _*)
  }

  /** The OHLC aggregate columns over a total-order column and a value —
    * shared by the batch resample and the streaming windowed form (pair
    * with `groupBy(key, window(ts, ...))` + a watermark; min_by/max_by are
    * streaming-legal aggregates, so bars finalize in append mode).
    */
  def ohlcAggs(ord: Column, v: Column): Seq[Column] = Seq(
    round(min_by(v, ord), 2).as("open"),
    round(max(v), 2).as("high"),
    round(min(v), 2).as("low"),
    round(max_by(v, ord), 2).as("close"),
    count(lit(1)).as("n_events"),
    sum(round(v * 10000, 0).cast("long")).as("sum_u"))

  /** Time-weighted average value per key — the irregular-sampling mean: a
    * reading HOLDS until the next one, so each value weighs by how long it
    * was current (numerically: the step-function integral / elapsed time),
    * where a plain AVG over-counts bursts of dense readings. The last
    * reading of a key has no successor and contributes no segment (the
    * standard left-closed convention).
    *
    * Exactness: micro-unit values × whole-millisecond durations accumulate
    * as DECIMAL(38,0) — exact at any magnitude, so the only float op is
    * the final one-per-key division of two exactly-represented sums
    * (correctly-rounded casts + one IEEE divide + the floor(x·10⁴+0.5)
    * rounding used across the family) — distributed ≡ oracle bit-for-bit.
    *
    * Scale shape: one per-key window pass (lead) + one hash agg with
    * map-side combine; no self-join. Keys whose readings all share one
    * millisecond carry zero elapsed time and are dropped (no average
    * exists over a zero-length interval).
    */
  def timeWeightedAvg(
      df: DataFrame,
      key: Column,
      tsMicros: Column,
      orderCols: Seq[Column],
      value: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ord"))
    val base = df.select(key.as("__k"), tsMicros.as("__ts"),
      struct(orderCols: _*).as("__ord"),
      round(value * 10000, 0).cast("long").as("__vu"))
    val seg = base
      .withColumn("__next_ts", lead(col("__ts"), 1).over(w))
      .filter(col("__next_ts").isNotNull)
      .withColumn("__dur_ms", intDiv(col("__next_ts") - col("__ts"), lit(1000L)))
    seg.groupBy(col("__k"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("__dur_ms")).as("dur_ms"),
        sum(col("__vu").cast("decimal(38,0)") * col("__dur_ms")).as("__num"))
      .filter(col("dur_ms") > 0)
      .select(col("__k"), col("n_segments"), col("dur_ms"),
        // __num/dur is already in micro-units = value·10⁴, so adding 0.5
        // and flooring IS the 4-decimal rounding; /10⁴ restores value units
        (floor(col("__num").cast("double") / col("dur_ms").cast("double")
          + 0.5d) / 10000d).as("twavg"))
  }

  /** Seasonal index per (key, phase) — the classical ratio-to-overall
    * decomposition step (phase mean ÷ key mean; e.g. phase = hour-of-day
    * exposes diurnal load shape, phase = day-of-week weekly shape). An
    * index of 1 is "this phase behaves like the key overall"; the vector
    * of indexes per key IS the seasonal profile a forecaster divides out.
    *
    * Exactness: the ratio (Σphase/nphase)/(Σkey/nkey) cross-multiplies to
    * (Σphase·nkey)/(nphase·Σkey) — both products exact DECIMAL(38,0), so
    * again the only float op is one correctly-rounded cast pair + one IEEE
    * divide + the family's floor-rounding. Scale shape: one hash agg over
    * the corpus to |keys·phases| rows, then a window over THAT (bounded)
    * table for the per-key totals; nothing else touches the corpus.
    */
  /** Interval-union coverage per key: each event opens an activity interval
    * `[ts, ts + holdSeconds)`; overlapping or touching intervals merge into
    * maximal spans (the "total active time" metric sessionization's
    * gap-based cut can't express — a session window splits on silence,
    * this measures the union of hold windows). Classic gaps-and-islands:
    * one per-key sort, a running max of prior ends marks island starts, a
    * running flag-sum numbers islands, and two hash aggs collapse islands
    * then keys. Everything is integer epoch microseconds — bit-exact
    * cross-engine.
    *
    * Output: (key, n_spans, active_us — Σ merged span lengths,
    * max_span_us — the longest merged span).
    *
    * Scale: one shuffle on the key, per-key in-partition sort, then hash
    * aggs; state per row is one running max + one running sum. 10⁹ keys
    * shard flat.
    */
  def coverageSpans(
      df: DataFrame,
      keyCol: String,
      ts: Column,
      holdSeconds: Long): DataFrame = {
    require(holdSeconds > 0, "coverageSpans: holdSeconds > 0")
    val hold = holdSeconds * 1000000L
    val base = df.select(col(keyCol), ts.as("__s"))
      .withColumn("__e", col("__s") + hold)
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("__s"), col("__e"))
    val prevMaxEnd = max(col("__e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val islands = base
      .withColumn("__new", when(prevMaxEnd.isNull || col("__s") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__isl"))
      .agg(min(col("__s")).as("__from"), max(col("__e")).as("__to"))
    islands.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("__to") - col("__from")).as("active_us"),
        max(col("__to") - col("__from")).as("max_span_us"))
  }

  /** State-dwell census: how long does a key sit in each state before its
    * next event — the holds-until-next duration model of
    * [[timeWeightedAvg]] applied to a categorical column, the natural
    * companion to the Markov transition census ("error states are rare
    * but users stew in them"). Per key one lead() window pass gives each
    * event its stint length (the key's last event has no successor and
    * drops — consistent with timeWeightedAvg); then one hash agg per
    * state: stint count, total µs, mean µs (family round-half-up integral
    * division — durations are non-negative). All integer epoch-µs.
    */
  def dwellCensus(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[Column],
      ts: Column,
      state: Column): DataFrame = {
    df.select(col(keyCol), struct(orderCols: _*).as("__ord0"), ts.as("__ts"),
        state.as("state"))
      .withColumn("__dur",
        lead(col("__ts"), 1).over(
          Window.partitionBy(col(keyCol)).orderBy(col("__ord0"))) - col("__ts"))
      .filter(col("__dur").isNotNull)
      .groupBy(col("state"))
      .agg(
        count(lit(1)).as("n_stints"),
        sum(col("__dur")).as("total_us"))
      .withColumn("mean_us",
        intDiv(col("total_us") * 2 + col("n_stints"), col("n_stints") * 2)
          .cast("long"))
  }

  /** [[dwellCensus]]'s aggregation tail over PRE-SEGMENTED stints — the
    * serving step for [[graft.streaming.StreamingDwell]]'s emitted
    * segments (state label + duration per stint), producing the identical
    * (state, n_stints, total_us, mean_us) census.
    */
  def dwellCensusFromStints(df: DataFrame, state: Column, durUs: Column): DataFrame =
    df.select(state.as("state"), durUs.as("__dur"))
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_stints"), sum(col("__dur")).as("total_us"))
      .withColumn("mean_us",
        intDiv(col("total_us") * 2 + col("n_stints"), col("n_stints") * 2)
          .cast("long"))

  /** SAX symbolic discretization (Lin et al. 2003) per key — the
    * time-series-to-word transform behind motif mining and cheap series
    * similarity: the series splits into `buckets` equal PAA segments
    * (bucket of row i = ⌊i·buckets/n⌋ — pure integer), each segment takes
    * its round-half-up mean, and the mean maps to a symbol. Deliberately
    * NOT the paper's Gaussian breakpoints (they assume z-normalization —
    * float mean/σ that no oracle can hash): breakpoints here are the
    * series' OWN nearest-rank quantiles at i/alphabet (exact integers,
    * the winsorize machinery), which is the standard data-adaptive SAX
    * variant and makes the whole transform bit-exact. Symbol = how many
    * breakpoints lie ≤ the segment mean; coinciding quantile ranks
    * collapse (deterministically, both engines), so short series may skip
    * symbol levels. `value` must quantize NON-NEGATIVE (the family's
    * round-half-up integral division contract — a negative segment sum
    * would floor on DuckDB but truncate on Spark); shift a signed series
    * before discretizing. The contract is ENFORCED: a negative quantized
    * value raises at runtime (riding the value column itself, so column
    * pruning can't elide the check) instead of silently producing
    * engine-dependent symbols.
    *
    * Output: (key, bucket, paa_u — micro-unit mean, symbol). Scale: two
    * window passes over one key shuffle (time rank + value rank), a PAA
    * hash agg, and a join against the ≤ (alphabet−1)-row-per-key
    * breakpoint table.
    */
  def saxSymbols(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[Column],
      value: Column,
      buckets: Int = 8,
      alphabet: Int = 4): DataFrame = {
    require(buckets >= 2 && alphabet >= 2, "saxSymbols: buckets >= 2, alphabet >= 2")
    val vuRaw = round(value * 10000, 0).cast("long")
    // loud contract guard, same pattern as selectByTokenBudget's
    val vu = when(vuRaw < 0,
      raise_error(concat(lit("saxSymbols: negative quantized value "),
        vuRaw.cast("string"),
        lit(" — round-half-up integral division floors on DuckDB but truncates " +
          "on Spark for negatives; shift the series before discretizing")))
        .cast("long"))
      .otherwise(vuRaw)
    val base = df.select(col(keyCol), struct(orderCols: _*).as("__ord0"), vu.as("__v"))
    val wk = Window.partitionBy(col(keyCol))
    val rows = base
      .withColumn("__rn", row_number().over(wk.orderBy(col("__ord0"))))
      .withColumn("__rv", row_number().over(wk.orderBy(col("__v"), col("__ord0"))))
      .withColumn("__n", count(lit(1)).over(wk))
    val paa = rows
      .withColumn("__b", intDiv((col("__rn") - 1) * buckets, col("__n")))
      .groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__c"), sum(col("__v")).as("__s"))
      .withColumn("paa_u", intDiv(col("__s") * 2 + col("__c"), col("__c") * 2))
    val isBp = (1 until alphabet)
      .map(i => col("__rv") === intDiv(col("__n") * i + (alphabet - 1), lit(alphabet.toLong)))
      .reduce(_ || _)
    val bps = rows.filter(isBp).select(col(keyCol), col("__v").as("__bp"))
    paa.join(bps, Seq(keyCol), "left")
      .groupBy(col(keyCol), col("__b"), col("paa_u"))
      .agg(sum(when(col("__bp") <= col("paa_u"), 1L).otherwise(0L)).as("symbol"))
      .select(col(keyCol), col("__b").as("bucket"), col("paa_u"), col("symbol"))
  }

  def seasonalIndex(
      df: DataFrame,
      key: Column,
      phase: Column,
      value: Column): DataFrame = {
    val base = df.select(key.as("__k"), phase.as("__p"),
      round(value * 10000, 0).cast("long").as("__vu"))
    val g = base.groupBy(col("__k"), col("__p"))
      .agg(count(lit(1)).as("n"), sum(col("__vu")).as("sum_u"))
    val w = Window.partitionBy(col("__k"))
    g.withColumn("__tn", sum(col("n")).over(w))
      .withColumn("__tsum", sum(col("sum_u")).over(w))
      .filter(col("__tsum") > 0)
      .select(col("__k"), col("__p"), col("n"),
        (floor((col("sum_u").cast("decimal(38,0)") * col("__tn")).cast("double")
          / (col("n").cast("decimal(38,0)") * col("__tsum")).cast("double")
          * 10000d + 0.5d) / 10000d).as("idx"))
  }

}
