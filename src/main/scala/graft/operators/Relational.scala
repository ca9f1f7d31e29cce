package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BloomProbe

/** Relational operators Spark lacks as single calls, composed scalably. */
object Relational {

  /** As-of join, "last event of `matchType` at or before each row", within
    * a key. NOT implemented as a range join (quadratic blow-up on hot keys);
    * instead a single partition-by-key sort carries the last matching id
    * forward — one shuffle on the key, linear work, no state explosion.
    */
  def lastMatchAsOf(
      events: DataFrame,
      keyCol: Column,
      orderCol: Column,
      isMatch: Column,
      carryCol: Column,
      outName: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn(outName,
      last(when(isMatch, carryCol), ignoreNulls = true).over(w))
  }

  /** NEAREST as-of join with tolerance: for every left row, the right row
    * (same key) whose time is CLOSEST — before or after — within
    * `tolerance`, or nulls when none qualifies. The other half of the
    * as-of family next to [[lastMatchAsOf]]'s backward-only carry: sensor
    * alignment, trade-vs-quote midpoints, click-to-conversion matching
    * all want nearest-in-time, and a tolerance bound, not a one-sided
    * carry (the pandas `merge_asof(direction='nearest', tolerance=...)`
    * contract).
    *
    * Shape: both sides union into one (key, time)-sorted stream; a
    * backward RANGE window takes the max (t, v) candidate struct and a
    * forward one the min, so each left row sees its nearest neighbor on
    * each side in TWO window passes over ONE key-hash shuffle — never a
    * per-row probe join. Every tie is deterministic and mirrored by the
    * oracle: equal distance prefers the earlier (backward) candidate;
    * equal time on the backward side prefers the larger carry, on the
    * forward side the smaller (the struct orderings); a NULL carry loses
    * any same-timestamp tie on either side (NULLS-LAST, via the null-rank
    * struct field); a right row at
    * exactly the left time is distance 0 via the backward frame. RANGE
    * (not ROWS) frames make same-timestamp visibility exact instead of
    * physical-order-dependent.
    */
  def nearestAsOf(
      left: DataFrame,
      right: DataFrame,
      keyName: String,
      leftTime: Column,
      rightTime: Column,
      carry: Column,
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, "nearestAsOf: tolerance must be >= 0")
    val carryType = right.select(carry).schema.head.dataType
    val lu = left
      .withColumn("__t", leftTime.cast("long"))
      .select(col(keyName).as("__k"), col("__t"),
        lit(null).cast(carryType).as("__rv"), lit(false).as("__isr"),
        struct(left.columns.map(col): _*).as("__lrow"))
    val lrowType = lu.select(col("__lrow")).schema.head.dataType
    val ru = right
      .withColumn("__t", rightTime.cast("long"))
      .select(col(keyName).as("__k"), col("__t"), carry.as("__rv"),
        lit(true).as("__isr"), lit(null).cast(lrowType).as("__lrow"))
    val wb = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    // A NULL carry must lose a same-timestamp tie on BOTH sides (the
    // oracle's ORDER BY is NULLS LAST): a boolean null-rank field sits
    // between t and v, oriented per side so the extreme the window takes
    // always prefers the non-null candidate — under max, isNotNull=true
    // sorts highest; under min, isNull=false sorts lowest. Without it a
    // bare struct(t, v) under min sorts the null v FIRST and a null carry
    // would WIN the forward-side tie. Same field name/type on both sides
    // so the pick chain below unifies the struct types.
    val candB = when(col("__isr"),
      struct(col("__t").as("t"), col("__rv").isNotNull.as("nn"), col("__rv").as("v")))
    val candF = when(col("__isr"),
      struct(col("__t").as("t"), col("__rv").isNull.as("nn"), col("__rv").as("v")))
    val marked = lu.unionByName(ru)
      .withColumn("__prev", max(candB).over(wb))
      .withColumn("__next", min(candF).over(wf))
      .filter(!col("__isr"))
    val db = col("__t") - col("__prev.t")
    val df = col("__next.t") - col("__t")
    val prevOk = col("__prev").isNotNull && db <= tolerance
    val nextOk = col("__next").isNotNull && df <= tolerance
    val pick = when(prevOk && (!nextOk || db <= df), col("__prev"))
      .when(nextOk, col("__next"))
    marked.select(col("__lrow.*") +:
      pick.getField("v").as("matched_v") +:
      pick.getField("t").as("matched_t") +:
      when(pick.isNotNull, abs(col("__t") - pick.getField("t"))).as("dist") +: Nil: _*)
  }

  /** Range (interval) join of facts against a small set of ranges — the
    * ranges side is broadcast so the theta-join is a single pass over the
    * facts (BroadcastNestedLoopJoin), no shuffle of the big side.
    */
  def rangeJoin(facts: DataFrame, ranges: DataFrame, value: Column, lo: Column, hi: Column): DataFrame =
    facts.join(broadcast(ranges), value >= lo && value < hi)

  /** Range (interval) join where BOTH sides are too big to broadcast — the
    * scale path [[rangeJoin]]'s broadcast tier can't take. The value domain
    * is quantized into fixed-width bands: each range replicates to every
    * band it overlaps, each fact maps to exactly ONE band, and the join
    * becomes a hash-partitioned equi-join on the band id with the theta
    * predicate evaluated only within band-matched pairs. No
    * BroadcastNestedLoopJoin, no cartesian: shuffle volume is |facts| +
    * |ranges|·(avg range width / bandWidth), both hash-partitioned.
    *
    * Result is exactly the theta join: a (fact, range) pair can only meet
    * in the fact's single band, so no duplicates; the residual predicate
    * keeps only true overlaps. Pick `bandWidth` near the median range
    * width — too wide re-creates hot bands, too narrow over-replicates the
    * ranges side. The shuffle-hash hint keeps Catalyst from re-planning the
    * replicated ranges side as a broadcast when it is small (which would be
    * fine for correctness but silently un-tests the scale plan).
    */
  def bandedRangeJoin(
      facts: DataFrame,
      ranges: DataFrame,
      value: Column,
      lo: Column,
      hi: Column,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val w = lit(bandWidth)
    val f = facts.withColumn("__band", floor(value / w).cast("long"))
    // explicit +1 step: without it a malformed range (lo > hi) makes
    // sequence() default to step -1 and silently replicate the row to every
    // band from floor(lo/w) DOWN to floor(hi/w) — no wrong output (the
    // residual predicate drops them) but a shuffle-volume bomb. With the
    // step pinned, a descending range fails fast instead.
    val r = ranges.withColumn("__band",
      explode(sequence(floor(lo / w).cast("long"), floor(hi / w).cast("long"), lit(1L))))
    f.join(r.hint("shuffle_hash"), Seq("__band"))
      .where(value >= lo && value < hi)
      .drop("__band")
  }

  /** Interval-overlap (temporal) join for two big interval tables — the
    * missing fourth member of the join family next to as-of, point-in-range
    * and banded range: emit every (left, right) pair of HALF-OPEN intervals
    * [lLo, lHi) × [rLo, rHi) that overlap (lLo < rHi ∧ rLo < lHi).
    * Concurrency analysis (sessions active together, validity periods in
    * force at once, shipments in transit simultaneously) is this join.
    *
    * Scale shape: the time axis is quantized into `bandWidth` bands; each
    * interval replicates to every band it covers and the join runs as a
    * hash-partitioned equi-join on (equiKeys…, band). An overlapping pair
    * meets in EVERY shared band, so the pair is emitted only in the band
    * containing the overlap START max(lLo, rLo) — that band lies inside
    * both intervals (the overlap is nonempty), so each true pair matches
    * exactly once: no dedup pass, no pair survives twice. Shuffle volume
    * is |L|·(avg width/bandWidth) + |R|·(same), never |L|·|R|; the
    * shuffle-hash hint keeps Catalyst from re-planning a small replicated
    * side as broadcast and silently un-testing the scale plan.
    *
    * Empty intervals (hi ≤ lo) match nothing by definition and are
    * dropped before expansion — they would otherwise make `sequence()`
    * step backwards. Column names must be disjoint across the two inputs
    * (alias before calling).
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lLo: Column, lHi: Column,
      rLo: Column, rHi: Column,
      bandWidth: Long,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val w = lit(bandWidth)
    def bands(df: DataFrame, lo: Column, hi: Column) = df
      .where(hi > lo)
      .withColumn("__band", explode(sequence(
        floor(lo / w).cast("long"), floor((hi - 1) / w).cast("long"), lit(1L))))
    val l = bands(left, lLo, lHi)
    val r = bands(right, rLo, rHi)
    l.join(r.hint("shuffle_hash"), (equiKeys :+ "__band").toSeq)
      .where(lLo < rHi && rLo < lHi &&
        col("__band") === floor(greatest(lLo, rLo) / w).cast("long"))
      .drop("__band")
  }

  /** Skew-safe equi-join: a hot join key concentrates its rows on one
    * reducer in a plain shuffle join; salting scatters each key over
    * `nSalts` sub-keys. The big (`left`) side derives a deterministic salt
    * from `saltFrom` (any high-cardinality column — an id, not the join
    * key), the `right` side replicates each row `nSalts` ways, and the join
    * runs on (key, salt) — result identical to the plain join, but the
    * hottest key now spreads over `nSalts` tasks.
    *
    * Use when BOTH sides are too big to broadcast and the key histogram is
    * skewed (AQE's skew-join split handles sort-merge spills; salting also
    * fixes the single-task hash-build/probe hotspot). The shuffle-hash hint
    * keeps Catalyst from re-planning the replicated side as a broadcast —
    * which would silently defeat the point.
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFrom: Column,
      nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(nSalts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    // hint the replicated side: build the hash table from it (BuildRight)
    // and keep Catalyst from re-planning it as a broadcast
    l.join(r.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** Latest-wins upsert — the batch form of `MERGE INTO … WHEN MATCHED
    * UPDATE / WHEN NOT MATCHED INSERT` with last-writer-wins semantics:
    * per key, keep the row with the highest `version`; on a version tie
    * the UPDATE side wins (tagged above the base in the comparator).
    * `version` must be non-null — a null version loses every comparison.
    *
    * Both inputs must share the base's schema; output keeps it (one row
    * per key).
    *
    * Scale shape: the winner is `max(struct(version, side, payload))` in
    * ONE map-side-combined hash agg — the full row rides the comparator,
    * so there is no second join back to fetch the winner's payload and the
    * exchange carries one candidate row per (key, partition). This is the
    * keep-best-dedup argument applied to CDC: the ranking-window MERGE
    * form sorts every key's history through the shuffle first.
    */
  def upsertLatest(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "upsertLatest: keyCols must be non-empty")
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"upsertLatest: schemas differ — base ${cols.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    require((keyCols :+ versionCol).forall(cols.contains),
      "upsertLatest: keyCols and versionCol must exist in the schema")
    val tagged = base.withColumn("__side", lit(0))
      .unionByName(updates.withColumn("__side", lit(1)))
    tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(
        col(versionCol).as("v"), col("__side").as("s"),
        struct(cols.map(col): _*).as("p"))).as("__w"))
      .select(col("__w.p.*"))
  }

  /** Bloom-pruned shuffle join — semi-join reduction (the "runtime filter"
    * pattern) for fact⋈dim where the dim side is too big to broadcast AS A
    * HASH TABLE but its join KEYS fit a Bloom sketch (~10 bits/key at 1%
    * fpp vs hundreds of bytes/row): build the sketch from the dim keys,
    * filter the fact side BEFORE its exchange, then run the ordinary
    * shuffle equi-join. Bloom filters have no false negatives, so the
    * result is exactly the plain join (the join itself removes the ≤fpp
    * false positives) — only the exchange gets cheaper: with a selective
    * dim, most fact rows die at the scan instead of shuffling. This is
    * Spark's own runtime bloom-filter rewrite
    * (`spark.sql.optimizer.runtime.bloomFilter.*`) made explicit, so it
    * applies regardless of optimizer thresholds and survives plan shapes
    * (pre-aggregations, unions) the rewrite won't look through.
    *
    * At 100 TB: the sketch is one pass over the (already filtered) dim
    * keys and ships at bits-per-key cost; the fact side never shuffles
    * its non-matching rows. The probe is Spark's own codegen'd
    * `BloomFilterMightContain` over a serialized-sketch literal
    * ([[graft.functions.BloomProbe]]) — same expression the runtime
    * rewrite injects, so the gate stays inside whole-stage codegen.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    require(fpp > 0 && fpp < 1, "bloomPrunedJoin: fpp must be in (0, 1)")
    val keys = dim.select(dimKey.cast("string").as("__k")).distinct().persist()
    try {
      val n = if (expectedItems > 0) expectedItems else math.max(keys.count(), 1L)
      // native codegen'd probe over xxhash64'd keys (see BloomProbe): a
      // different probe hash only moves WHICH fact rows false-positive
      // into the join, where they drop — result ≡ plain join either way
      val bloom = keys.select(BloomProbe.hashed(col("__k")).as("h"))
        .stat.bloomFilter("h", n, fpp)
      val sketch = BloomProbe.serialize(bloom)
      fact.filter(BloomProbe.mightContainHashed(sketch, factKey.cast("string")))
        .join(dim, factKey === dimKey)
    } finally keys.unpersist()
  }
}
