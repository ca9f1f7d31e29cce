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

  // ---- mergeable per-group top-k ------------------------------------------
  //
  // Top-k under a TOTAL order is a monoid: merge(topK(A), topK(B)) =
  // topK(A ∪ B) exactly — any pair ranked top-k in the union is top-k in
  // its own half. So per-group "best k orders / nearest k neighbors /
  // hottest k items by exact count" maintains incrementally with NO
  // approximation: the persisted state is the k-bounded array itself, and
  // a daily fold re-ranks k·states rows per group, never the corpus.
  // The order is graft_topk's (score desc, id asc) — deterministic cut,
  // so merged ≡ recompute is bit-exact (oracle-checked by
  // `agg_incremental_topk`).

  /** Per-group top-`k` (id, score) state of `df` — one hash agg via the
    * heap-bounded `graft_topk` aggregate (≤ k rows per group cross the
    * exchange; no sort).
    */
  def topKState(df: DataFrame, keys: Seq[Column], score: Column, id: Column,
      k: Int): DataFrame =
    df.groupBy(keys: _*).agg(graft.functions.TopKPairs.topK(score, id, k).as("topk"))

  /** Fold top-k states: union, re-rank, cut at `k` under the same total
    * order. Associative and commutative. Cost: Σ|groups|·k rows.
    * `explode_outer` keeps groups whose every state array is empty (the
    * null pair is ignored by the aggregate, leaving the empty array) so
    * merge ≡ recompute holds even for all-null-score groups.
    */
  def mergeTopK(keyNames: Seq[String], k: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeTopK: at least one state")
    states.reduce(_.unionByName(_))
      .select(keyNames.map(col) :+ explode_outer(col("topk")).as("p"): _*)
      .groupBy(keyNames.map(col): _*)
      .agg(graft.functions.TopKPairs.topK(col("p.score"), col("p.id"), k).as("topk"))
  }

  /** Serve-time projection: one ranked row per kept pair,
    * rank 1 = best ((score desc, id asc) position in the group).
    */
  def finishTopK(state: DataFrame, keyNames: Seq[String]): DataFrame =
    state.select(keyNames.map(col) :+ posexplode(col("topk")): _*)
      .select(keyNames.map(col) ++ Seq(
        (col("pos") + 1).as("rank"),
        col("col.id").as("id"),
        col("col.score").as("score")): _*)

  // ---- mergeable heavy hitters (Misra–Gries) ------------------------------
  //
  // Exact per-item counts over a huge keyspace are NOT boundedly mergeable
  // (the state is the keyspace). The Misra–Gries summary is (Agarwal et
  // al., "Mergeable Summaries", PODS 2012): persist ≤ k counters per
  // group, and fold states by summing counters then applying the MG
  // reduction — subtract the (k+1)-th largest summed count from every
  // counter and drop the non-positive. Estimates only ever UNDERCOUNT,
  // by at most n/(k+1) of the total stream length the merged state
  // summarizes — the same bound a single MG pass over the union gives,
  // so daily folds don't degrade the guarantee (spec-asserted).

  /** Per-group Misra–Gries state of `df`: ≤ `k` (item, est_count)
    * counters via the `graft_freq_items` aggregate (k counters per
    * partition, ≤ k rows per group cross the exchange).
    */
  def heavyHittersState(df: DataFrame, keys: Seq[Column], item: Column,
      k: Int): DataFrame =
    df.groupBy(keys: _*).agg(
      graft.functions.FrequentItems.freqItems(item, k, k).as("mg"))

  /** Fold Misra–Gries states with the PODS-2012 mergeable-summaries step:
    * sum counters per (group, item), then subtract the (k+1)-th largest
    * count in each group and keep the positive remainder — at most `k`
    * counters survive by construction. The per-group window sort runs
    * over state rows only (Σ|groups|·k), never a corpus. Output arrays
    * are (est desc, item asc)-ordered like [[heavyHittersState]]'s. A
    * group whose every counter dies in the reduction (all-tied small
    * groups) disappears from the output — callers treat absent as empty.
    */
  def mergeHeavyHitters(keyNames: Seq[String], k: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeHeavyHitters: at least one state")
    val keys = keyNames.map(col)
    val summed = states.reduce(_.unionByName(_))
      .select(keys :+ explode(col("mg")).as("c"): _*)
      .groupBy(keys :+ col("c.item").as("item"): _*)
      .agg(sum(col("c.est_count")).as("est"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyNames.map(col): _*)
      .orderBy(col("est").desc, col("item").asc)
    summed
      .withColumn("rk", row_number().over(w))
      .withColumn("cut",
        max(when(col("rk") === k + 1, col("est")).otherwise(lit(0L)))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(keyNames.map(col): _*)))
      .filter(col("est") - col("cut") > 0)
      .groupBy(keyNames.map(col): _*)
      .agg(array_sort(collect_list(
        struct((-(col("est") - col("cut"))).as("neg"), col("item")))).as("a"))
      .select(keys :+ transform(col("a"), x =>
        struct(x("item").as("item"), (-x("neg")).as("est_count"))).as("mg"): _*)
  }

  /** Serve-time projection: the top `outK` (rank, item, est_count) rows
    * per group from a Misra–Gries state.
    */
  def finishHeavyHitters(state: DataFrame, keyNames: Seq[String],
      outK: Int): DataFrame =
    state.select(keyNames.map(col) :+ posexplode(col("mg")): _*)
      .filter(col("pos") < outK)
      .select(keyNames.map(col) ++ Seq(
        (col("pos") + 1).as("rank"),
        col("col.item").as("item"),
        col("col.est_count").as("est_count")): _*)

  // ---- mergeable distinct-SET states (Theta sketches) ---------------------
  //
  // HLL answers one question about a persisted state: how many. Theta
  // sketches (DataSketches; Dasgupta et al., "A Framework for Estimating
  // Stream Expression Cardinalities") carry a SAMPLE of the k smallest
  // item hashes, which closes the sketch family under union AND
  // intersection AND difference — so two persisted states can answer "how
  // many distinct users did day A share with day B" with NO rescan of
  // either day. All three operations are deterministic set algebra over
  // hash order (no randomness), so estimates are run-stable.

  /** Per-group theta-sketch state of `distinctOn` — the compact artifact
    * that persists between ingests (same posture as [[state]]'s HLL
    * column, plus set algebra at serve time).
    */
  def setState(df: DataFrame, keys: Seq[Column], distinctOn: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*).agg(theta_sketch_agg(distinctOn, lgK).as("theta"))

  /** Fold theta states: sketch union per group — associative,
    * commutative, cost Σ|groups| rows. `lgK` bounds the UNION's retained
    * hashes and should match the states' (a union is exact only below
    * min(k) of everything it folds).
    */
  def mergeSetStates(keyNames: Seq[String], states: DataFrame*): DataFrame =
    mergeSetStatesLgK(keyNames, 12, states: _*)

  def mergeSetStatesLgK(keyNames: Seq[String], lgK: Int,
      states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeSetStates: at least one state")
    states.reduce(_.unionByName(_)).groupBy(keyNames.map(col): _*)
      .agg(theta_union_agg(col("theta"), lgK).as("theta"))
  }

  /** Serve-time set algebra between two persisted state tables: per group,
    * estimated |A|, |B|, |A∩B|, |A∪B|, |A\B| — the corpus-overlap audit
    * (how much of today's traffic is yesterday's users) straight off two
    * bounded artifacts. Inner join on the group keys: groups absent from
    * either side have no overlap question to answer.
    */
  def setOverlap(keyNames: Seq[String], a: DataFrame, b: DataFrame,
      lgK: Int = 12): DataFrame = {
    val keys = keyNames.map(col)
    val joined = a.select(keys :+ col("theta").as("__ta"): _*)
      .join(b.select(keys :+ col("theta").as("__tb"): _*), keyNames)
    joined.select(keys ++ Seq(
      theta_sketch_estimate(col("__ta")).cast("long").as("n_a"),
      theta_sketch_estimate(col("__tb")).cast("long").as("n_b"),
      theta_sketch_estimate(theta_intersection(col("__ta"), col("__tb")))
        .cast("long").as("n_both"),
      // the serve-time union must retain as many hashes as the states do,
      // or it silently drops to estimation mode below their exact range
      theta_sketch_estimate(theta_union(col("__ta"), col("__tb"), lgK))
        .cast("long").as("n_either"),
      theta_sketch_estimate(theta_difference(col("__ta"), col("__tb")))
        .cast("long").as("n_only_a")): _*)
  }

  /** Serve-time distinct counts off ONE persisted state table — the
    * single-state common case ("distinct users per segment, from state,
    * no rescan") that [[setOverlap]]'s two-sided algebra doesn't cover.
    * Exact below the sketch's 2^lgK retained-hash capacity, the standard
    * theta estimate above it. Input is |groups| state rows.
    */
  def finishSetCounts(state: DataFrame, keyNames: Seq[String]): DataFrame =
    state.select(keyNames.map(col) :+
      theta_sketch_estimate(col("theta")).cast("long").as("n_distinct"): _*)

  // ---- mergeable quantile states (KLL sketches) ---------------------------
  //
  // Percentiles are the classic non-mergeable aggregate (the exact answer
  // needs the whole multiset); the KLL sketch (Karnin-Lang-Liberty 2016,
  // via DataSketches' KllLongsSketch) is the bounded mergeable summary
  // with a PROVEN rank guarantee: ε ≈ 2.33/k normalized rank error at
  // 99% confidence, preserved under merging. So p50/p95/p99 of a year of
  // ingest maintain from daily states without rescanning anything.
  //
  // Caveat, stated where callers can see it: KLL compaction flips random
  // coins, so two runs over identical data may produce different (equally
  // valid) sketches — this family is deliberately NOT exposed as a
  // driver-contract query (the determinism gate diffs two Verify runs);
  // the spec pins the rank-error contract instead. Spark ships only a
  // pairwise `kll_sketch_merge_bigint`, so the per-group fold sorts the
  // collected states (stable fold order) and folds with `aggregate` —
  // states per group = number of deltas, a bounded list.

  /** Per-group KLL quantile state of integer `value`; `k` trades size for
    * rank accuracy (200 ≈ 1.2% error).
    */
  def quantileState(df: DataFrame, keys: Seq[Column], value: Column,
      k: Int = 200): DataFrame =
    df.groupBy(keys: _*).agg(kll_sketch_agg_bigint(value, k).as("kll"))

  /** Fold KLL states per group (sorted pairwise fold; see family note). */
  def mergeQuantileStates(keyNames: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeQuantileStates: at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(keyNames.map(col): _*)
      .agg(sort_array(collect_list(col("kll"))).as("__ks"))
      .select(keyNames.map(col) :+
        aggregate(
          slice(col("__ks"), lit(2), greatest(size(col("__ks")) - 1, lit(0))),
          element_at(col("__ks"), 1),
          (acc, x) => kll_sketch_merge_bigint(acc, x)).as("kll"): _*)
  }

  /** Serve-time quantiles off a state table: one column per requested
    * probability (`q_p50`-style names), no scan of anything but the
    * |groups| state rows.
    */
  def finishQuantiles(state: DataFrame, keyNames: Seq[String],
      probs: Seq[Double]): DataFrame =
    state.select(keyNames.map(col) ++ probs.map { p =>
      kll_sketch_get_quantile_bigint(col("kll"), lit(p))
        .as(s"q_p${math.round(p * 100)}")
    }: _*)

  /** One persisted maintenance step: fold `delta`'s state into the state
    * table under `path` and publish it as the next version directory
    * `path/v=<k+1>`. The write goes to a hidden `.tmp-v=<k+1>` directory
    * first (parquet, with Spark's `_SUCCESS` marker, plus the `_BATCH`
    * marker when `batchId` is given) and is then RENAMED into place, so a
    * published version is always complete AND always carries its batch
    * marker — there is no window where `_SUCCESS` exists but the marker
    * doesn't. Readers ([[latestState]]) only ever see `_SUCCESS`-marked
    * `v=` directories; a re-run after a mid-write crash deletes its own
    * stale tmp/incomplete version and never touches the previous one.
    *
    * At-least-once retry safety: pass the delta's stable identity as
    * `batchId` (Structured Streaming callers: `foreachBatch`'s batchId —
    * the hook Spark provides for exactly this). A `maintain` whose batchId
    * was already folded into a published version returns that version
    * WITHOUT folding again, so a retry after the publish-rename but before
    * the caller recorded completion cannot double-count. Without a
    * batchId the caller owns idempotence (must not re-submit a delta that
    * may already have committed). Single-maintainer protocol: concurrent
    * maintainers on one `path` are not coordinated (rename is atomic on
    * HDFS/local FS; object stores without atomic rename need an external
    * commit lock regardless). Returns the published version number.
    *
    * `mergeFn` selects the STATE FAMILY: it folds two complete state
    * tables keyed by `keyNames` into one (must be associative on states,
    * like every `merge*` in this object) and defaults to the scalar-agg
    * [[merge]]. The versioning / batchId-dedup / prune machinery is
    * family-agnostic, so the sketch families maintain through the same
    * protocol — e.g.
    * `(k, ss) => mergeQuantileStates(k, ss: _*)` (KLL percentiles),
    * `(k, ss) => mergeTopK(k, 10, ss: _*)`,
    * `(k, ss) => mergeSetStatesLgK(k, 12, ss: _*)` (theta distincts),
    * `(k, ss) => mergeHeavyHitters(k, 64, ss: _*)` (Misra–Gries).
    */
  def maintain(spark: SparkSession, path: String, keyNames: Seq[String],
      deltaState: DataFrame, batchId: Option[String] = None,
      mergeFn: (Seq[String], Seq[DataFrame]) => DataFrame =
        (k, ss) => merge(k, ss: _*)): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val alreadyFolded = batchId.flatMap { id =>
      completeVersions(spark, path).sorted(Ordering[Long].reverse).find { v =>
        val marker = new Path(s"$path/v=$v", BatchMarker)
        fs.exists(marker) && readSmallFile(fs, marker).trim == id
      }.orElse {
        // the version that folded this id may have been pruned — its id
        // lives on in the ledger; the delta is already part of every
        // surviving state, so answer with the newest one
        if (ledgerContains(fs, path, id)) latestVersion(spark, path)
        else None
      }
    }
    alreadyFolded.getOrElse {
      val next = latestVersion(spark, path).map(_ + 1).getOrElse(0L)
      val merged = latestState(spark, path) match {
        case Some(prev) => mergeFn(keyNames, Seq(prev, deltaState))
        case None => deltaState
      }
      val tmp = new Path(s"$path/$TmpPrefix$next")
      val dest = new Path(s"$path/v=$next")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      merged.write.mode("overwrite").parquet(tmp.toString)
      batchId.foreach { id =>
        val out = fs.create(new Path(tmp, BatchMarker), true)
        try out.write(id.getBytes("UTF-8")) finally out.close()
      }
      if (fs.exists(dest)) fs.delete(dest, true) // stale incomplete attempt
      require(fs.rename(tmp, dest), s"maintain: rename $tmp -> $dest failed")
      next
    }
  }

  /** Housekeeping for [[maintain]]'s version chain — without it a daily
    * ingest leaves 365 full state copies a year (the same reason the
    * reference runs a retention loop over its buffers, models.py:309-348).
    * Deletes all but the newest `keep` COMPLETE (`_SUCCESS`-marked)
    * versions, oldest first, so a crash mid-prune still leaves the newest
    * `keep` states intact and readable. Incomplete directories (a
    * concurrent/crashed writer's tip, stale `.tmp-v=` dirs) are never
    * touched — they are invisible to readers and owned by the next
    * `maintain`. Pruned versions' `_BATCH` ids are moved into the
    * `_BATCH_HISTORY.d/` ledger first, so [[maintain]]'s at-least-once
    * dedup keeps rejecting a late retry of a batch whose folding version
    * no longer exists. The ledger is APPEND-ONLY — one file per pruned
    * id (named by the id's SHA-1, installed tmp→rename) — so no step
    * ever deletes or rewrites existing ledger entries: a crash anywhere
    * leaves either (id recorded, victim still present — a harmless
    * duplicate the next prune skips) or (id unrecorded, victim still
    * present — the next prune retries), never a lost id. The ledger is
    * bounded by the count of pruned batches, not state size. Returns the
    * deleted version numbers.
    */
  def pruneVersions(spark: SparkSession, path: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"pruneVersions: keep must be >= 1, got $keep")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = completeVersions(spark, path).sorted.dropRight(keep)
    // a victim's _BATCH marker dies with its directory, which would let a
    // late at-least-once retry of that batch refold and double-count —
    // record the ids in the ledger BEFORE deleting anything
    val prunedIds = victims.flatMap { v =>
      val marker = new Path(s"$path/v=$v", BatchMarker)
      if (fs.exists(marker)) Some(readSmallFile(fs, marker).trim) else None
    }
    if (prunedIds.nonEmpty) {
      val dir = new Path(path, BatchLedgerDir)
      if (!fs.exists(dir)) fs.mkdirs(dir)
      prunedIds.distinct.foreach { id =>
        val dest = new Path(dir, sha1Hex(id))
        if (!fs.exists(dest)) {
          val tmp = new Path(dir, s".tmp-${sha1Hex(id)}")
          val out = fs.create(tmp, true)
          try out.write(id.getBytes("UTF-8")) finally out.close()
          require(fs.rename(tmp, dest), s"pruneVersions: ledger install failed for $dest")
        }
      }
    }
    victims.foreach(v => fs.delete(new Path(s"$path/v=$v"), true))
    victims
  }

  /** The newest COMPLETE (`_SUCCESS`-marked) state version under `path`. */
  def latestState(spark: SparkSession, path: String): Option[DataFrame] =
    latestVersion(spark, path).map(v => spark.read.parquet(s"$path/v=$v"))

  private val BatchMarker = "_BATCH"
  private val BatchLedger = "_BATCH_HISTORY" // legacy single-file layout, read-only
  private val BatchLedgerDir = "_BATCH_HISTORY.d"
  private val TmpPrefix = ".tmp-v="

  private def sha1Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Is `id` in the pruned-batch ledger? The append-only layout makes
    * this ONE existence probe — file names are `sha1Hex(id)`, so no
    * listing and no content reads however many batches have ever been
    * pruned (a per-micro-batch cost on object stores) — plus one read of
    * the legacy single-file `_BATCH_HISTORY` when it exists (pre-
    * crash-recoverable layouts only).
    */
  private def ledgerContains(fs: org.apache.hadoop.fs.FileSystem, path: String,
      id: String): Boolean =
    fs.exists(new Path(new Path(path, BatchLedgerDir), sha1Hex(id))) || {
      val legacy = new Path(path, BatchLedger)
      fs.exists(legacy) &&
        readSmallFile(fs, legacy).split("\n").map(_.trim).contains(id)
    }

  private def readSmallFile(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def latestVersion(spark: SparkSession, path: String): Option[Long] =
    completeVersions(spark, path).maxOption

  /** All `_SUCCESS`-marked `v=<n>` versions. A non-numeric `v=` directory
    * (someone's `v=tmp`) is skipped, not fatal.
    */
  private def completeVersions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .flatMap(p =>
        scala.util.Try(p.getName.stripPrefix("v=").toLong).toOption)
  }
}
