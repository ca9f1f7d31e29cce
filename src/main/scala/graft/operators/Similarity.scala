package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the oracle target). Scale
  * paths, in increasing sophistication: random-hyperplane LSH with
  * multiprobe (candidates from a hash-partitioned bucket join — the cross
  * product never materializes), IVF (a trained coarse codebook routes
  * queries to nprobe cells), PQ/ADC (the corpus compressed to m byte
  * codes, scored through per-query lookup tables), and their IVF-PQ
  * composition — the compressed inverted file production vector stores
  * deploy. Both codebook trainers ([[kmeansCells]], [[pqTrain]]) are
  * deterministic distributed Lloyd loops (md5-seeded, broadcast
  * codebooks, native [[graft.functions.VectorAvg]] centroid recompute).
  * Hyperplanes are generated from a seeded RNG at PLAN time
  * (deterministic literals in the plan; nothing random at execution).
  */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** DuckDB-recomputable hyperplane family: plane p's component d is
    * `int(md5hex(p + "," + d)[0..14]) % 2001 − 1000` — integers in
    * [−1000, 1000], exactly representable as doubles, so SQL rebuilds the
    * planes verbatim (`('0x'||substr(md5(p||','||d),1,15))::BIGINT`).
    * Direction quality matches a seeded-RNG plane for LSH purposes
    * (md5 bits are uniform); what the family buys is that the sign-bucket
    * computation becomes cross-engine checkable. Sign safety is
    * data-measured, not assumed: min |dot| over the test corpora is
    * ~0.07 at sf0.01 AND sf0.1 — eleven orders of magnitude above double
    * accumulation noise — so bucket bits cannot flip between engines.
    */
  def md5Planes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(numPlanes)(p => Seq.tabulate(dim)(d => md5PlaneValue(s"$p,$d")))

  /** [[md5Planes]] for multi-table LSH: table t's plane p component d is
    * keyed `"t:p,d"` so every table gets an independent family, still
    * SQL-recomputable. Sign margins over the test corpora across all 24
    * (4×6) planes: ≥ 0.016 at sf0.01 and sf0.1 — far above double noise.
    */
  def md5TablePlanes(table: Int, numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(numPlanes)(p => Seq.tabulate(dim)(d => md5PlaneValue(s"$table:$p,$d")))

  private def md5PlaneValue(key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001 - 1000).toDouble
  }

  /** Plane count that keeps expected LSH bucket occupancy ≈
    * `targetOccupancy` at corpus size `n`: the smallest b ≥ 6 with
    * 2^b · targetOccupancy ≥ n. Integer-exact on purpose — the formula is
    * replayed by the DuckDB oracle (`length(bin((n + occ - 1) // occ - 1))`)
    * and a float `ceil(log2(…))` can land on either side of an exact
    * power-of-two boundary depending on the engine's libm.
    *
    * This is the knob that keeps the kNN join LINEAR in corpus size: with
    * a fixed plane count the bucket space is fixed, per-bucket occupancy
    * grows ∝ n, and candidate pairs grow ∝ n² — measured 14.8× time at
    * 10× data on the r14 scale curve (SCALE.md). With occupancy pinned,
    * per-query candidates stay ≈ numTables · (planes+1) · targetOccupancy
    * and total work is O(n · log n). The recall trade is real and
    * documented: finer buckets lower per-table collision probability for a
    * FIXED similarity threshold (Charikar 2002: p = (1 − θ/π) per bit), so
    * at constant numTables the recall target shifts toward nearer
    * neighbors as n grows — the standard LSH regime (bits ≈ log₂ n,
    * recall bought back with more tables, Andoni & Indyk 2008).
    */
  def autoPlanes(n: Long, targetOccupancy: Int = 32): Int = {
    require(targetOccupancy > 0, "autoPlanes: targetOccupancy > 0")
    val m = (n + targetOccupancy - 1) / targetOccupancy // ceil(n / occ)
    val bits = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(48, math.max(6, bits))
  }

  /** k-means cell count that keeps expected cell occupancy ≈
    * `targetOccupancy` at corpus size `n`: ceil(n / occ), integer-exact
    * (same rationale as [[autoPlanes]] — a float ceil(n/occ) can land on
    * either side of an exact multiple).
    *
    * This is [[autoPlanes]]' fix applied to the SemDeDup defect class: with
    * a FIXED cell count the in-cell pair comparison costs Σ|cell|² ∝ n²/k —
    * measured 3.4× time at 10× data on the r14 curve
    * (SCALE.md) — while with occupancy pinned it is ∝ n·occ, linear. The
    * trade moves into the ASSIGNMENT term instead: nearest-of-k over k ∝ n
    * centroids is O(n·k·d) per pass, fine through millions of vectors and
    * the reason the cap exists — past it (k = 2²⁰; a ~GB-scale f64 codebook
    * at d ≈ 768, the broadcast bound) occupancy grows again and the paper's
    * own posture applies (SemDeDup runs a fixed 50k clusters at web scale
    * and pays growing cells on GPUs; [[kmeansCells]]' `trainSample` path
    * plus IVF-style coarse quantization is the JVM answer there).
    */
  def autoCells(n: Long, targetOccupancy: Int = 250): Int = {
    require(targetOccupancy > 0, "autoCells: targetOccupancy > 0")
    val k = (n + targetOccupancy - 1) / targetOccupancy // ceil(n / occ)
    math.min(1L << 20, math.max(1L, k)).toInt
  }

  /** Sign-pattern bucket id: bit p set iff dot(vec, planes(p)) >= 0. */
  def hyperplaneSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact brute-force cosine top-k for each query vector.
    *
    * Plan shape: broadcast the (small) query set against the corpus —
    * a BroadcastNestedLoopJoin over one pass of the corpus — then per-query
    * top-k via ranking window. The corpus is never shuffled by the join;
    * the window shuffles only (numQueries × corpusRows) scored pairs after
    * local pre-pruning in [[topKScored]].
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // norms precomputed per side: the pair loop does ONE dot product, not 3
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("qnorm", l2Norm(col("qvec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
    topKScored(scored, k)
  }

  /** Per-query top-k via the [[graft.functions.TopKPairs]] bounded-heap
    * aggregate: a hash agg with map-side combine — each partition keeps at
    * most k pairs per query, the exchange carries ≤ k rows per (query,
    * partition), and nothing is ever sorted but the final k-element
    * arrays. The previous formulation (two `row_number` ranking windows)
    * had to exchange AND sort every scored pair before its first filter;
    * for a kNN join that is the full n·m candidate matrix through the
    * shuffle. Tie order is identical ((cos_sim desc, neighbor_id asc)), so
    * oracle-tier callers keep their hash matches.
    */
  private[operators] def topKScored(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.topK(col("cos_sim"), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("pos0", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        round(col("p.score"), 4).as("cos_sim"), (col("pos0") + 1).as("rank"))

  /** Multi-table LSH ANN top-k with 1-bit multiprobe: `numTables`
    * independent hyperplane families; a query probes, in each table, its own
    * bucket plus every bucket at Hamming distance 1. Candidates are the
    * union across tables, deduped, then exact-cosine ranked.
    *
    * The joins are hash-partitioned on (table, bucket) — linear scale-out,
    * no cross product. Recall < 1.0 by construction; measured against brute
    * force in tests. Tuning: more tables → recall; more planes → precision
    * (smaller buckets → less verification work).
    *
    * `numPlanes <= 0` means AUTO: size the plane count from the corpus row
    * count so expected bucket occupancy stays ≈ `targetOccupancy`
    * ([[autoPlanes]]) — the configuration that keeps candidate generation
    * linear in corpus size instead of quadratic. The count is one
    * column-less corpus scan at plan time (the same class of bounded
    * plan-time action as the `dim` inference below); at any scale where
    * auto-sizing matters, that scan is noise next to the quadratic blowup
    * a fixed bucket space would cost.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 6,
      numTables: Int = 4,
      seed: Long = 42L,
      dim: Int = -1,
      md5Family: Boolean = false,
      targetOccupancy: Int = 32): DataFrame = {
    val effPlanes = if (numPlanes > 0) numPlanes else autoPlanes(corpus.count(), targetOccupancy)
    // The dedup-by-construction filter below relies on signatures being
    // exactly effPlanes bits wide: with >= 64 planes the 1-bit probe's
    // `1L << i` wraps, probe buckets stop being distinct within a table,
    // and a pair could join via multiple probe rows — enforce the
    // invariant instead of leaving it implicit (r21 ADVICE).
    require(effPlanes >= 1 && effPlanes <= 63,
      s"lshTopK: numPlanes must be in [1, 63], got $effPlanes")
    // dim <= 0 → sample the dimensionality from the (small) query side at
    // plan time; hyperplanes of the wrong length would throw in DotProduct.
    val planeDim =
      if (dim > 0) dim
      else {
        val sampled = queries
          .select(size(toDoubleArray(col(vecCol))).as("d")).na.drop().head(1)
        require(sampled.nonEmpty,
          "lshTopK: cannot infer dim from an empty (or all-null) query set; pass dim explicitly")
        sampled(0).getInt(0)
      }
    val tables = (0 until numTables).map(t =>
      (t, if (md5Family) md5TablePlanes(t, effPlanes, planeDim)
          else randomPlanes(effPlanes, planeDim, seed + t)))
    // signatures are computed ONCE per table into a column, and the probe
    // structs reference that column — inlining the signature subtree (6
    // dots × 64-double literals) into each of the (1+numPlanes)·numTables
    // probe structs once made a ~10k-literal expression tree whose
    // optimize+codegen time dwarfed the actual scan
    def withSigs(df: DataFrame, vec: String): DataFrame =
      df.select(scala.collection.immutable.ArraySeq.unsafeWrapArray(df.columns.map(col)) ++ tables.map { case (t, planes) =>
        hyperplaneSignature(col(vec), planes).as(s"__b$t")
      }: _*)
    // Both exploded sides keep their full per-table signature columns
    // (numTables longs per row — a few bytes): the first-matching-table
    // filter below needs them on the joined row.
    val sigCols = tables.map { case (t, _) => col(s"__b$t") }
    val c = withSigs(
      corpus.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("cvec"))
        .withColumn("cnorm", l2Norm(col("cvec"))), "cvec")
      .select(col("neighbor_id") +: col("cvec") +: col("cnorm") +: sigCols :+
        explode(array(tables.map { case (t, _) =>
          struct(lit(t).as("tbl"), col(s"__b$t").as("bucket"))
        }: _*)).as("tb"): _*)
      .select(col("neighbor_id") +: col("cvec") +: col("cnorm") +:
        tables.map { case (t, _) => col(s"__b$t").as(s"__cb$t") } :+
        col("tb.tbl").as("tbl") :+ col("tb.bucket").as("bucket"): _*)
    val probes = withSigs(
      queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qvec"))
        .withColumn("qnorm", l2Norm(col("qvec"))), "qvec")
      .select(col("query_id") +: col("qvec") +: col("qnorm") +: sigCols :+
        explode(array(tables.flatMap { case (t, _) =>
          struct(lit(t).as("tbl"), col(s"__b$t").as("bucket")) +:
            (0 until effPlanes).map(i =>
              struct(lit(t).as("tbl"), col(s"__b$t").bitwiseXOR(lit(1L << i)).as("bucket")))
        }: _*)).as("tb"): _*)
      .select(col("query_id") +: col("qvec") +: col("qnorm") +:
        tables.map { case (t, _) => col(s"__b$t").as(s"__qb$t") } :+
        col("tb.tbl").as("tbl") :+ col("tb.bucket").as("bucket"): _*)
    // Candidate DEDUP BY CONSTRUCTION (r21): a pair co-buckets in table t
    // exactly when bit_count(qb_t XOR cb_t) <= 1 (own bucket or one of
    // the 1-bit multiprobe flips — the probed values per table are
    // distinct, so within a table each pair matches at most one probe
    // row). Keeping a joined row only when ITS table is the pair's FIRST
    // matching table therefore yields each candidate pair exactly once —
    // the same set the former dropDuplicates("query_id", "neighbor_id")
    // produced, without shuffling every scored candidate through a
    // (query, neighbor) hash aggregate (the query's largest exchange:
    // ~1.7M rows at sf0.1). Duplicates never score, and topKScored's
    // partial heap combine now runs directly map-side on the join output.
    val firstMatch = tables.map { case (t, _) =>
      bit_count(col(s"__qb$t").bitwiseXOR(col(s"__cb$t"))) <= 1
    }.zipWithIndex.reverse.foldLeft(lit(numTables)) { case (acc, (m, t)) =>
      when(m, lit(t)).otherwise(acc)
    }
    val scored = probes.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(col("tbl") === firstMatch)
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm"))).as("cos_sim"))
    topKScored(scored, k)
  }

  /** Distributed Lloyd k-means cell trainer for the IVF codebook:
    * returns (id, cell) assignments with cell ∈ [0, nlist).
    *
    * Deterministic end to end — seeds are the `nlist` corpus vectors with
    * the smallest md5(id) (hash-spread across the space, no RNG, engine-
    * reproducible), and ties in the argmin break on the cell id.
    *
    * Scale shape per iteration: the codebook (nlist tiny rows) is
    * broadcast against the corpus, the argmin collapses map-side (every
    * replicated row of an id sits in the same partition, so the partial
    * min_by finishes before the exchange and only one row per id
    * shuffles), and centroid recomputation is the one-pass native
    * vector-avg agg ([[graft.functions.VectorAvg]] — partial-sum arrays
    * map-side, one row per cell per partition through the exchange,
    * instead of the posexplode formulation's dim× row multiplication)
    * used by [[ivfTopK]]. The codebook is localCheckpointed between
    * iterations so the plan doesn't accumulate one corpus scan per round.
    * Seed selection is sort+limit = distributed TakeOrdered, not a global
    * sort.
    *
    * The projected vector table is materialized ONCE (localCheckpoint):
    * Lloyd is inherently multi-pass (seeds + one assign per round + final
    * assign), and without it every pass re-reads the source and re-converts
    * vectors. The working set is (id, vec, norm) only — the standard
    * persisted feature table of any distributed k-means — and spills to
    * executor disk when it exceeds memory.
    */
  /** Driver-side Lloyd over a bounded sample (the `trainSample` scale
    * path shared by [[kmeansCells]], [[pqTrain]], and [[ivfPqTopK]]).
    *
    * Rationale: a codebook is a bounded MODEL ARTIFACT — `trainSample`
    * vectors at most, whatever the corpus size — so once the sample is
    * drawn, iterating Lloyd as distributed Spark jobs buys nothing and
    * costs a full job round-trip (shuffle + localCheckpoint) PER
    * ITERATION. Production quantizers (faiss et al.) train exactly this
    * way: sample → in-memory k-means → broadcast the codebook; only the
    * ENCODE pass, which must touch every vector, stays distributed (one
    * codegen projection, [[graft.functions.PqKernels]]).
    *
    * Semantics mirror the distributed loop exactly: seeds are the first
    * `k` samples (callers pass the md5-ordered sample), assignment is
    * argmin(|c|² − 2·x·c) with ties to the smallest cell id, emptied
    * cells drop out (`null` slot, never reused), recompute is the plain
    * mean. All arithmetic runs in one fixed order, so the codebook is
    * bit-reproducible run-to-run — stronger than the distributed
    * recompute, whose partial-sum merge order floats with partitioning.
    */
  private def lloydLocal(
      samples: Array[Array[Double]],
      k: Int,
      iters: Int): Array[Array[Double]] = {
    require(samples.nonEmpty, "lloydLocal: empty training sample")
    val dim = samples(0).length
    val cents = new Array[Array[Double]](k)
    var c = 0
    while (c < math.min(k, samples.length)) { cents(c) = samples(c).clone(); c += 1 }
    var it = 0
    while (it < iters) {
      val cn2 = cents.map(ct => if (ct == null) Double.PositiveInfinity
        else { var s = 0.0; var d = 0; while (d < dim) { s += ct(d) * ct(d); d += 1 }; s })
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var i = 0
      while (i < samples.length) {
        val x = samples(i)
        var best = -1
        var bestD = Double.PositiveInfinity
        var cell = 0
        while (cell < k) {
          if (cents(cell) != null) {
            val ct = cents(cell)
            var dot = 0.0
            var d = 0
            while (d < dim) { dot += x(d) * ct(d); d += 1 }
            val dist = cn2(cell) - 2.0 * dot
            if (dist < bestD) { bestD = dist; best = cell }
          }
          cell += 1
        }
        counts(best) += 1
        val s = sums(best)
        var d = 0
        while (d < dim) { s(d) += x(d); d += 1 }
        i += 1
      }
      c = 0
      while (c < k) {
        if (counts(c) > 0) {
          val s = sums(c)
          val ct = new Array[Double](dim)
          var d = 0
          while (d < dim) { ct(d) = s(d) / counts(c); d += 1 }
          cents(c) = ct
        } else cents(c) = null
        c += 1
      }
      it += 1
    }
    cents
  }

  /** The deterministic bounded training sample both local trainers draw:
    * the `trainSample` md5-smallest rows as (id-ordered) raw double
    * vectors — a TakeOrdered (no global sort), hash-spread, reproducible.
    */
  private def collectSample(
      corpus: DataFrame, idCol: String, vecCol: String, trainSample: Int): Array[Array[Double]] =
    corpus
      .select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__vec"))
      .orderBy(md5(col("__id").cast("string")), col("__id"))
      .limit(trainSample)
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** Pack full-vector centroids (index = cell id, null = emptied) into a
    * single-subspace [[graft.functions.PqKernels.DenseCodebook]] — with
    * m = 1 the PQ argmin kernel IS a nearest-centroid assigner.
    */
  private def centroidBook(
      cents: Array[Array[Double]], dim: Int): graft.functions.PqKernels.DenseCodebook = {
    val k = cents.length
    val cb = new Array[Double](k * dim)
    val cn2 = Array.fill(k)(Double.PositiveInfinity)
    var c = 0
    while (c < k) {
      if (cents(c) != null) {
        var n2 = 0.0
        var d = 0
        while (d < dim) { val v = cents(c)(d); cb(c * dim + d) = v; n2 += v * v; d += 1 }
        cn2(c) = n2
      }
      c += 1
    }
    graft.functions.PqKernels.DenseCodebook(cb, cn2, 1, k, dim)
  }

  def kmeansCells(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int = 3): DataFrame = kmeansCells(corpus, idCol, vecCol, nlist, iters, 0)

  /** `trainSample > 0` is the scale path: Lloyd runs on the driver over
    * the bounded md5-deterministic sample ([[lloydLocal]]) and the
    * corpus-wide cell assignment collapses to ONE codegen projection
    * (nearest-centroid via the m = 1 PQ kernel, raw vectors, broadcast
    * codebook) — no per-iteration jobs, no assignment shuffle, no
    * localCheckpoint. `trainSample = 0` keeps the fully distributed
    * Lloyd loop (every vector trains; the exhaustive-fit anchor).
    */
  def kmeansCells(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int,
      trainSample: Int): DataFrame = {
    require(nlist > 0 && iters >= 0, "kmeansCells: nlist and iters must be positive")
    if (trainSample > 0) {
      val samples = collectSample(corpus, idCol, vecCol, trainSample)
      val cents = lloydLocal(samples, nlist, iters)
      val book = centroidBook(cents, samples(0).length)
      return corpus.select(col(idCol),
        (element_at(graft.functions.PqKernels.pqCodes(
          toDoubleArray(col(vecCol)), book, normalize = false), 1)).as("cell"))
    }
    val base = corpus
      .select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__vec"))
      .withColumn("__vnorm2", dot(col("__vec"), col("__vec")))
      .localCheckpoint()
    val seedW = Window.orderBy(col("__id")) // nlist rows only — not a scale sort
    var cents = base
      .orderBy(md5(col("__id").cast("string")), col("__id")).limit(nlist)
      .withColumn("cell", row_number().over(seedW).cast("long") - 1)
      .select(col("cell"), col("__vec").as("cent"))
      .withColumn("__cnorm2", dot(col("cent"), col("cent")))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      // assign: argmin squared euclidean = vnorm² − 2·dot + cnorm² (vnorm²
      // is constant per row, dropped); recompute: mean per (cell, pos)
      val assigned = base.crossJoin(broadcast(cents))
        .withColumn("__d", col("__cnorm2") - lit(2.0) * dot(col("__vec"), col("cent")))
        .groupBy(col("__id"))
        .agg(min_by(col("cell"), struct(col("__d"), col("cell"))).as("cell"),
          first(col("__vec")).as("__vec"))
      cents = assigned
        .groupBy(col("cell"))
        .agg(graft.functions.VectorAvg.vectorAvg(col("__vec")).as("cent"))
        .withColumn("__cnorm2", dot(col("cent"), col("cent")))
        .localCheckpoint()
      i += 1
    }
    base.crossJoin(broadcast(cents))
      .withColumn("__d", col("__cnorm2") - lit(2.0) * dot(col("__vec"), col("cent")))
      .groupBy(col("__id"))
      .agg(min_by(col("cell"), struct(col("__d"), col("cell"))).as("cell"))
      .select(col("__id").as(idCol), col("cell"))
  }

  /** IVF (inverted-file) ANN top-k: a coarse codebook of cell centroids
    * partitions the corpus; each query is scored only against the cells
    * whose centroids are its `nprobe` nearest — a `nprobe/nlist` fraction
    * of the corpus instead of all of it.
    *
    * The codebook here is the per-`cellCol` centroid (computed
    * distributed: one-pass [[graft.functions.VectorAvg]] agg; only `nlist`
    * tiny rows ever reach the driver-free broadcast). In production the
    * cell assignment comes from offline k-means; the query-side plan is
    * identical. All joins: centroids are broadcast (nlist rows), the
    * corpus join is hash-partitioned on the cell id.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cellCol: String,
      k: Int,
      nprobe: Int = 3): DataFrame = {
    // codebook: cell -> centroid vector (one-pass native vector-avg agg)
    val centroids = corpus
      .select(col(cellCol).as("cell"), toDoubleArray(col(vecCol)).as("__cv"))
      .groupBy(col("cell"))
      .agg(graft.functions.VectorAvg.vectorAvg(col("__cv")).as("cent"))
      .withColumn("centnorm", l2Norm(col("cent")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("qnorm", l2Norm(col("qvec")))
    // probe list: nprobe closest centroids per query
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cent_sim", dot(col("qvec"), col("cent")) / (col("qnorm") * col("centnorm")))
      .withColumn("cent_rank", row_number().over(probeW))
      .filter(col("cent_rank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("qnorm"), col("cell"))
    // exact scoring within probed cells only
    val c = corpus.select(col(idCol).as("neighbor_id"), col(cellCol).as("cell"),
        toDoubleArray(col(vecCol)).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
    val scored = probes.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
    topKScored(scored, k)
  }

  /** L2-normalize to unit length (zero vectors pass through unchanged):
    * PQ prep — inner products of unit vectors ARE the cosines of the
    * originals, so ADC can score with per-subspace dot products alone.
    */
  private def unitize(vec: Column): Column = {
    val n = sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x * x))
    when(n > 0, transform(vec, x => x / n)).otherwise(vec)
  }

  /** (id, sub, subvec) rows: the vector split into `m` contiguous
    * subvectors of dim/m — the PQ decomposition, unit-normalized first.
    */
  private def subvectors(
      df: DataFrame, idCol: String, vecCol: String, idAs: String,
      dim: Int, m: Int): DataFrame = {
    val ds = dim / m
    df.select(col(idCol).as(idAs), unitize(toDoubleArray(col(vecCol))).as("__vec"))
      .select(col(idAs), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__vec"), j * ds + 1, lit(ds)))).as(Seq("sub", "subvec")))
  }

  /** Product-quantization codebook trainer: per-SUBSPACE k-means, all `m`
    * subspaces trained in one grouped Lloyd loop — centroids keyed by
    * (sub, cell), the assign step is a broadcast join on `sub` + argmin
    * over that subspace's `ksub` cells, centroid recomputation one native
    * [[graft.functions.VectorAvg]] agg on (sub, cell). Deterministic
    * seeds (per-sub smallest
    * md5(id)), ties break on cell id; empty cells drop out of later
    * rounds. Returns (sub, cell, cent).
    *
    * Multi-pass working set: the (id, sub, subvec) table is
    * localCheckpointed once, exactly like [[kmeansCells]]. The codebook is
    * m·ksub tiny rows — always broadcast-able.
    *
    * `trainSample > 0` bounds the Lloyd working set to that many vectors —
    * the deterministic md5-smallest rows (hash-spread, engine-reproducible;
    * a TakeOrdered, not a global sort) — and runs Lloyd ON THE DRIVER
    * ([[lloydLocal]]): once the working set is a bounded model-training
    * sample, distributed iteration only pays a job round-trip per Lloyd
    * round for kilobytes of state. This is how production quantizers
    * train at scale: the codebook needs a representative sample, not the
    * corpus — at 100 TB a full-corpus Lloyd loop is pure waste, while
    * ENCODING (pqEncode) still covers every vector. 0 = train on all
    * (the fully distributed loop).
    */
  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      trainSample: Int = 0): DataFrame = {
    require(m > 0 && dim > 0 && dim % m == 0,
      s"pqTrain: dim ($dim) must be divisible by m ($m)")
    require(ksub > 1 && ksub <= 256 && iters >= 0,
      s"pqTrain: ksub must be in (1, 256] (codes are byte-sized), iters >= 0")
    if (trainSample > 0) {
      // driver-side Lloyd over the bounded sample (see lloydLocal): one
      // TakeOrdered job draws the sample, m in-memory Lloyd runs train the
      // subspace codebooks, and the result is a local m·ksub-row relation —
      // vs ~2 jobs per iteration (+ checkpoints) for the distributed loop
      val ds = dim / m
      val samples = collectSample(corpus, idCol, vecCol, trainSample).map { v =>
        require(v.length == dim, s"pqTrain: vector length ${v.length} != dim $dim")
        var n2 = 0.0
        var i = 0
        while (i < dim) { n2 += v(i) * v(i); i += 1 }
        val n = math.sqrt(n2)
        if (n > 0.0) { i = 0; while (i < dim) { v(i) /= n; i += 1 } }
        v
      }
      val rows = (0 until m).flatMap { sub =>
        val subs = samples.map(v => java.util.Arrays.copyOfRange(v, sub * ds, sub * ds + ds))
        lloydLocal(subs, ksub, iters).zipWithIndex.collect {
          case (cent, cell) if cent != null =>
            org.apache.spark.sql.Row(sub, cell.toLong, cent.toSeq)
        }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sub",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cent",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false), nullable = false)))
      return corpus.sparkSession.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
    }
    val base = subvectors(corpus, idCol, vecCol, "__id", dim, m).localCheckpoint()
    val seedW = Window.partitionBy(col("sub"))
      .orderBy(md5(col("__id").cast("string")), col("__id"))
    var cents = base
      .withColumn("__rk", row_number().over(seedW))
      .filter(col("__rk") <= ksub)
      .select(col("sub"), (col("__rk") - 1).cast("long").as("cell"),
        col("subvec").as("cent"))
      .withColumn("__cnorm2", dot(col("cent"), col("cent")))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val assigned = base.join(broadcast(cents), Seq("sub"))
        .withColumn("__d", col("__cnorm2") - lit(2.0) * dot(col("subvec"), col("cent")))
        .groupBy(col("__id"), col("sub"))
        .agg(min_by(col("cell"), struct(col("__d"), col("cell"))).as("cell"),
          first(col("subvec")).as("subvec"))
      cents = assigned
        .groupBy(col("sub"), col("cell"))
        .agg(graft.functions.VectorAvg.vectorAvg(col("subvec")).as("cent"))
        .withColumn("__cnorm2", dot(col("cent"), col("cent")))
        .localCheckpoint()
      i += 1
    }
    cents.select(col("sub"), col("cell"), col("cent"))
  }

  /** Collect a trained (sub, cell, cent) codebook into the flat
    * driver-side layout the native PQ kernels compile against. A
    * codebook is a bounded MODEL ARTIFACT (≤ 256·256 rows of dim/m
    * doubles at any corpus size — pqTrain caps ksub at 256), so this is
    * the one place in the ANN family where a collect is the correct
    * scale shape: the alternative keeps corpus-sized exchanges in the
    * encode pass just to avoid materializing kilobytes. Lloyd-emptied
    * cells stay `cn2 = +∞` (never win an argmin, 0.0 in LUTs).
    */
  private[graft] def collectCodebook(
      codebook: DataFrame, m: Int, dsub: Int, ksubHint: Int = -1): graft.functions.PqKernels.DenseCodebook = {
    val rows = codebook
      .select(col("sub").cast("int"), col("cell").cast("int"), col("cent")).collect()
    require(rows.nonEmpty, "collectCodebook: empty codebook")
    val ksub =
      if (ksubHint > 0) ksubHint else rows.iterator.map(_.getInt(1)).max + 1
    val cb = new Array[Double](m * ksub * dsub)
    val cn2 = Array.fill(m * ksub)(Double.PositiveInfinity)
    rows.foreach { r =>
      val sub = r.getInt(0)
      val cell = r.getInt(1)
      val cent = r.getSeq[Double](2)
      require(sub >= 0 && sub < m && cell >= 0 && cell < ksub,
        s"collectCodebook: (sub=$sub, cell=$cell) outside m=$m, ksub=$ksub")
      require(cent.length == dsub,
        s"collectCodebook: centroid length ${cent.length} != dsub $dsub")
      val off = (sub * ksub + cell) * dsub
      var n2 = 0.0
      var d = 0
      while (d < dsub) {
        val c = cent(d)
        cb(off + d) = c
        n2 += c * c
        d += 1
      }
      cn2(sub * ksub + cell) = n2
    }
    graft.functions.PqKernels.DenseCodebook(cb, cn2, m, ksub, dsub)
  }

  /** PQ encoding: each vector compresses to `m` byte-sized codes —
    * (id, codes array, sub-ordered), the stored form a 100 TB vector
    * corpus keeps in place of float arrays (m bytes vs dim·4). The
    * codebook compiles into the native [[graft.functions.PqKernels]]
    * argmin kernel (see [[collectCodebook]]), so encoding is ONE
    * projection over the corpus inside whole-stage codegen — no explode,
    * no join, zero exchanges. The earlier declarative form (posexplode →
    * per-(id, sub) argmin agg → pivot) pushed the corpus through two
    * shuffles to compute what is a per-row map.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: DataFrame,
      dim: Int,
      m: Int = 8): DataFrame = {
    val book = collectCodebook(codebook, m, dim / m)
    corpus.select(col(idCol),
      graft.functions.PqKernels.pqCodes(toDoubleArray(col(vecCol)), book).as("codes"))
  }

  /** Per-query DENSE ADC lookup table: one row per query with an
    * array<double> of length m·ksub, laid out row-major by subspace —
    * `lut[sub·ksub + cell] = dot(q_sub, cent(sub, cell))`, zero-filled
    * for Lloyd-emptied cells (no code references them). One native-
    * kernel projection over the (small) query side.
    */
  private def denseLut(
      queries: DataFrame, idCol: String, vecCol: String,
      book: graft.functions.PqKernels.DenseCodebook): DataFrame =
    queries.select(col(idCol).as("query_id"),
      graft.functions.PqKernels.pqLut(toDoubleArray(col(vecCol)), book).as("__lut"))

  /** PQ/ADC approximate top-k: train codebook → encode corpus to byte
    * codes → score queries by Asymmetric Distance Computation. Per query
    * the dense lookup table dot(q_sub, cent) has m·ksub entries (tiny,
    * broadcast — see [[denseLut]]); scoring is the native
    * [[graft.functions.AdcScore]] kernel — one fused m-step flat-array
    * loop per (query, vector) pair inside whole-stage codegen. The corpus
    * is never exploded, joined on (sub, cell), or aggregated: one corpus
    * scan against the broadcast LUTs, then the two-phase top-k. Unit-
    * normalized vectors make the summed subspace dot products the
    * (quantized) cosine, so ranking is comparable to [[bruteForceTopK]]
    * and recall is measurable.
    *
    * The scale story vs [[ivfTopK]]: IVF prunes WHICH vectors are scored;
    * PQ shrinks WHAT is stored and scanned (m bytes/vector + one shared
    * codebook). Real systems compose them (IVF-PQ) — here each is its own
    * operator and the composition is a join away.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      trainSample: Int = 0): DataFrame = {
    val codebook = pqTrain(corpus, idCol, vecCol, dim, m, ksub, iters, trainSample)
    val book = collectCodebook(codebook, m, dim / m, ksubHint = ksub)
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      graft.functions.PqKernels.pqCodes(toDoubleArray(col(vecCol)), book).as("codes"))
    val lut = denseLut(queries, idCol, vecCol, book)
    val scored = codes
      .crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.AdcScore.adc(col("codes"), col("__lut"), ksub).as("cos_sim"))
    topKScored(scored, k)
  }

  /** IVF-PQ: the composition real ANN systems deploy — IVF prunes WHICH
    * vectors are scored (nprobe/nlist of the corpus), PQ shrinks WHAT is
    * stored and scanned (m bytes per vector + one shared codebook), and
    * scoring is ADC through per-query lookup tables, restricted to the
    * probed cells by one hash-partitioned join on the IVF cell id.
    *
    * Plan shape: both codebooks broadcast (nlist rows / m·ksub rows); the
    * corpus appears as (id, ivf_cell, pq codes) — the compressed inverted
    * file a 100 TB vector store actually persists; the only corpus-sized
    * exchanges are hash-partitioned on the cell id and the (sub, code)
    * LUT key. Recall compounds both approximations (cell pruning ×
    * quantization) — measured against brute force in ScalaTest.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      trainSample: Int = 0): DataFrame = {
    val (centroids, _, book, codes) =
      ivfPqArtifacts(corpus, idCol, vecCol, dim, nlist, m, ksub, iters, trainSample)
    ivfPqSearch(centroids, book, codes, queries, idCol, vecCol, k, nprobe)
  }

  /** The BUILD side of IVF-PQ — (centroids, codebook DF, collected
    * codebook, cell-tagged codes) — shared by [[ivfPqTopK]] (build +
    * search in one plan) and [[graft.sources.IndexStore.saveIvfPq]]
    * (persist artifacts for offline/online split), so the two paths train
    * IDENTICALLY. With `trainSample > 0` the trainers are
    * driver-deterministic (bounded md5-ordered sample), so artifact search
    * is bit-for-bit ≡ the in-plan operator; with `trainSample = 0` the
    * distributed Lloyd's partial-sum merge order floats with partitioning,
    * so separate executions agree up to float-tie cases — SAME-PARTITIONING
    * deterministic, not bit-reproducible run-to-run.
    *
    * `trainSample > 0` is the sampled scale path: BOTH codebooks train on
    * the driver over the same bounded md5-deterministic sample, and the
    * entire compressed inverted file — (id, ivf_cell, pq codes) — is ONE
    * codegen projection over ONE corpus scan (two broadcast codebooks,
    * zero joins, zero shuffles on the build side). IVF probe centroids
    * are the TRAINING means (what faiss persists), not the full-corpus
    * per-cell mean the distributed path recomputes — probe ranking is a
    * routing heuristic either way, and recall is what the spec pins.
    */
  private[graft] def ivfPqArtifacts(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nlist: Int,
      m: Int,
      ksub: Int,
      iters: Int,
      trainSample: Int)
      : (DataFrame, DataFrame, graft.functions.PqKernels.DenseCodebook, DataFrame) = {
    if (trainSample > 0) {
      val samples = collectSample(corpus, idCol, vecCol, trainSample)
      val cents = lloydLocal(samples, nlist, iters)
      val ivfBook = centroidBook(cents, samples(0).length)
      val codebook = pqTrain(corpus, idCol, vecCol, dim, m, ksub, iters, trainSample)
      val book = collectCodebook(codebook, m, dim / m, ksubHint = ksub)
      val codes = corpus.select(col(idCol),
        graft.functions.PqKernels.pqCodes(toDoubleArray(col(vecCol)), book).as("codes"),
        element_at(graft.functions.PqKernels.pqCodes(
          toDoubleArray(col(vecCol)), ivfBook, normalize = false), 1).as("ivf_cell"))
      val centRows = cents.zipWithIndex.collect { case (ct, cell) if ct != null =>
        org.apache.spark.sql.Row(cell.toLong, ct.toSeq)
      }
      val centSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ivf_cell",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cent",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false), nullable = false)))
      val centroids = corpus.sparkSession.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(centRows.toSeq: _*)), centSchema)
        .withColumn("centnorm", l2Norm(col("cent")))
      (centroids, codebook, book, codes)
    } else {
      // IVF side: trained cells + their centroids (one-pass vector-avg agg)
      val cells = kmeansCells(corpus, idCol, vecCol, nlist, iters)
      val assigned = corpus.join(cells, idCol)
      val centroids = assigned
        .select(col("cell").as("ivf_cell"), toDoubleArray(col(vecCol)).as("__cv"))
        .groupBy(col("ivf_cell"))
        .agg(graft.functions.VectorAvg.vectorAvg(col("__cv")).as("cent"))
        .withColumn("centnorm", l2Norm(col("cent")))
      // PQ side: codebook + byte codes, tagged with each vector's IVF cell
      val codebook = pqTrain(corpus, idCol, vecCol, dim, m, ksub, iters, trainSample)
      val book = collectCodebook(codebook, m, dim / m, ksubHint = ksub)
      val codes = corpus.select(col(idCol),
          graft.functions.PqKernels.pqCodes(toDoubleArray(col(vecCol)), book).as("codes"))
        .join(cells.withColumnRenamed("cell", "ivf_cell"), idCol)
      (centroids, codebook, book, codes)
    }
  }

  /** The QUERY side of IVF-PQ, over prebuilt index artifacts — shared by
    * [[ivfPqTopK]] (build + search in one plan) and
    * [[graft.sources.IndexStore]] (search over artifacts persisted by an
    * offline training job, the production split). `centroids` is
    * (ivf_cell, cent, centnorm); `codes` is (idCol, codes, ivf_cell).
    */
  private[graft] def ivfPqSearch(
      centroids: DataFrame,
      book: graft.functions.PqKernels.DenseCodebook,
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame = {
    // probe list: nprobe closest centroids per query (broadcast codebook)
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("qnorm", l2Norm(col("qvec")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("ivf_cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cent_sim", dot(col("qvec"), col("cent")) / (col("qnorm") * col("centnorm")))
      .withColumn("cent_rank", row_number().over(probeW))
      .filter(col("cent_rank") <= nprobe)
      .select(col("query_id"), col("ivf_cell"))
    // ADC scoring via the native kernel, restricted to probed cells by the
    // ivf_cell join; the dense per-query LUT rides in on a broadcast join
    val lut = denseLut(queries, idCol, vecCol, book)
    val scored = codes
      .join(probes, Seq("ivf_cell"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("codes"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(lut), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.AdcScore.adc(col("codes"), col("__lut"), book.ksub).as("cos_sim"))
    topKScored(scored, k)
  }
}
