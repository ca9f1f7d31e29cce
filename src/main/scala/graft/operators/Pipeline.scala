package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Dataset-preparation operators a pretraining pipeline runs after
  * filtering/dedup: packing documents into fixed token budgets and
  * deterministic split assignment. Both are pure map/window shapes — no
  * driver-side loops, no execution-time randomness.
  */
object Pipeline {

  /** Token-budget sequence packing: assign each row to a fixed-budget bin
    * (`seq_id`) within its stratum, in `order` — the pretraining "pack
    * documents into ~N-token sequences" step. A row straddling a boundary
    * belongs to the bin where it starts; `seq_id` is derived from the
    * running token count BEFORE the row, so the assignment is a single
    * window cumsum per stratum (the only sequential dependency is the
    * within-stratum order, so strata scale out independently).
    *
    * Adds `n_tok` (the evaluated token count) and `seq_id`.
    */
  def packSequences(
      df: DataFrame,
      strata: Column,
      order: Column,
      tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "packSequences: budget must be positive")
    val w = Window.partitionBy(strata).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", tokens.cast("long"))
      .withColumn("seq_id",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / lit(budget)).cast("long"))
  }

  /** Whole-document bin packing, best-fit-decreasing — the OTHER packing
    * shape next to [[packSequences]]: when documents must not straddle
    * sequence boundaries (instruction tuning, document-attention-masked
    * pretraining), each doc goes whole into one bin of capacity `budget`
    * and the packer minimizes bins. BFD: docs sorted by (tokens desc,
    * id asc), each placed into the fullest bin that still fits (ties →
    * oldest bin), else a new bin — the textbook 11/9·OPT + 6/9 guarantee
    * (Johnson 1973; Dósa 2007 tightness). Docs larger than the budget
    * get a SINGLETON bin flagged `oversize` (truncation is the caller's
    * policy, silently dropping data is not this operator's).
    *
    * Scale shape: one hash shuffle on the stratum key, then packing runs
    * per stratum in one task over the stratum's (id, tokens) pairs — 16
    * bytes per doc, NOT the documents (a 10M-doc stratum is 160 MB of
    * task state; production strata are date×source shards, bounded by
    * construction). The bin search is a TreeMap keyed by remaining
    * capacity (best fit = ceiling lookup, O(log bins) per doc). With
    * `saltBuckets > 1` a mega-stratum pre-splits by a deterministic md5
    * bucket of the id: every slice packs independently (budgets still
    * hold exactly; bin count is only additively worse by ≤ saltBuckets−1
    * per stratum) and bin ids are salt-prefixed — the documented
    * optimality-for-parallelism lever, same discipline as
    * [[capPerKey]]'s salted cut.
    *
    * Returns (strataName, idName, n_tok, bin_id, oversize).
    */
  def packBinsBFD(
      df: DataFrame,
      strataName: String,
      idName: String,
      tokensCol: Column,
      budget: Long,
      saltBuckets: Int = 1): DataFrame = {
    require(budget > 0, "packBinsBFD: budget must be positive")
    require(saltBuckets >= 1, "packBinsBFD: saltBuckets must be >= 1")
    // fail loudly on ids the long cast cannot represent: a silent NULL here
    // would corrupt the output id column AND the (tokens desc, id asc)
    // tie-break that makes the packing deterministic. String ids should be
    // pre-hashed (e.g. xxhash64) by the caller — same posture as
    // Dedup.dupClusters' checkedId.
    locally {
      import org.apache.spark.sql.types._
      val idType = df.select(col(idName)).schema.head.dataType
      require(Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(idType),
        s"packBinsBFD: id column '$idName' must be integral, got $idType")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val salted = df.select(
      col(strataName).cast("string").as("__s"),
      (if (saltBuckets == 1) lit(0L)
       else md5Bucket(col(idName), 4, saltBuckets).cast("long")).as("__salt"),
      col(idName).cast("long").as("__id"),
      tokensCol.cast("long").as("__n"))
      .as[(String, Long, Long, Long)]
    val packed = salted
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val (s, salt) = key
        val docs = it.toArray.sortBy(t => (-t._4, t._3))
        val byRemaining = new java.util.TreeMap[Long, java.util.ArrayDeque[Long]]()
        var nextBin = 0L
        def newBin(): Long = { val b = nextBin; nextBin += 1; b }
        def park(rem: Long, bin: Long): Unit =
          if (rem > 0) {
            var q = byRemaining.get(rem)
            if (q == null) { q = new java.util.ArrayDeque[Long](); byRemaining.put(rem, q) }
            q.addLast(bin)
          }
        docs.iterator.map { case (_, _, id, n) =>
          if (n > budget) {
            (s, id, n, (salt << 32) | newBin(), true)
          } else {
            val e = byRemaining.ceilingEntry(n)
            val bin =
              if (e == null) { val b = newBin(); park(budget - n, b); b }
              else {
                val q = e.getValue
                val b = q.pollFirst()
                if (q.isEmpty) byRemaining.remove(e.getKey)
                park(e.getKey - n, b)
                b
              }
            (s, id, n, (salt << 32) | bin, false)
          }
        }
      }
    packed.toDF("__s", "__id", "n_tok", "bin_id", "oversize")
      .withColumnRenamed("__s", strataName)
      .withColumnRenamed("__id", idName)
  }

  /** Deterministic train/valid/test split by hash bucket of a stable key:
    * the same row lands in the same split on every engine, run, partition
    * layout, and cluster size — no RNG at execution time, so eval sets
    * stay disjoint from training data across re-runs. md5 is the
    * cross-engine hash (any SQL engine reproduces the assignment).
    *
    * Adds a `split` column ∈ {train, valid, test} with approximately
    * `trainPct`/`validPct`/rest proportions.
    */
  def deterministicSplit(
      df: DataFrame,
      key: Column,
      trainPct: Int = 80,
      validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"deterministicSplit: bad percentages train=$trainPct valid=$validPct")
    df.withColumn("split",
      when(md5Bucket(key) < trainPct, "train")
        .when(md5Bucket(key) < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Leakage-safe deterministic split: near-duplicates must never straddle
    * the train/eval boundary — a doc-keyed split ([[deterministicSplit]])
    * puts two near-identical documents in train and test with probability
    * 2·p·(1−p), silently contaminating every evaluation downstream (the
    * published failure mode train/test-overlap decontamination audits
    * exist for; Lee et al. 2021 §6 measure it directly). The fix is
    * structural: the split key is the CLUSTER, not the document — every
    * member of a near-dup cluster (connected component of `pairs`,
    * labeled by [[Dedup.dupClusters]]' min-id representative) inherits
    * the md5 bucket of its representative, so a cluster lands whole in
    * exactly one split. Singletons are their own representative: with no
    * pairs this IS [[deterministicSplit]], and split fractions stay
    * ≈ requested because representatives hash uniformly.
    *
    * Scale shape: min-label propagation (O(cluster diameter) rounds, one
    * hash-partitioned label-table shuffle per round — near-dup clusters
    * are shallow) + ONE left join of the corpus against the labels
    * (pair-member rows only, a small fraction of the corpus) + a
    * per-row md5 expression. The corpus never shuffles on anything but
    * the label join key.
    */
  def splitLeakageSafe(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      trainPct: Int = 80,
      validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"splitLeakageSafe: bad percentages train=$trainPct valid=$validPct")
    val labels = Dedup.dupClusters(pairs, aCol, bCol)
      .select(col("doc_id").as("__split_member"), col("cluster_id").as("__split_rep"))
    val rep = coalesce(col("__split_rep"), col(idCol))
    df.join(labels, col(idCol) === col("__split_member"), "left")
      .withColumn("split",
        when(md5Bucket(rep) < trainPct, "train")
          .when(md5Bucket(rep) < trainPct + validPct, "valid")
          .otherwise("test"))
      .drop("__split_member", "__split_rep")
  }

  /** Incremental leakage-safe split: the daily-ingest form of
    * [[splitLeakageSafe]]. A new document that near-duplicates an
    * already-split corpus document MUST inherit that document's split —
    * assigning it independently (md5 of its own id) puts a near-copy of a
    * train document into test with probability 1−p, quietly contaminating
    * every later evaluation. New docs with no corpus match get the
    * ordinary deterministic md5 split.
    *
    * `corpusWithSplit` is the persisted ingest artifact (id, text,
    * blocking keys, `splitCol`) — how its splits were assigned is the
    * caller's contract ([[splitLeakageSafe]] at bootstrap, this function
    * thereafter). Matching is exact block-Jaccard at `threshold` (the
    * [[Dedup.incrementalJaccardNew]] machinery: distinct-shingle inverted
    * index, division-form length filter, count-common verify); a new doc
    * matching several corpus docs inherits from the SMALLEST corpus id —
    * deterministic under any execution order.
    *
    * Scale shape: every exchange's probe side is the new batch, never the
    * corpus. This in-plan form recomputes the corpus shingle index per
    * run (same posture as [[Dedup.incrementalJaccardNew]]); an ingest
    * loop should persist that index once and reuse it, the way
    * [[Dedup.incrementalMinhashNewAgainstTable]] does for signatures.
    * Returns `newBatch` + `splitCol` (a pre-existing `splitCol` column
    * on `newBatch` is replaced — the inherited assignment wins).
    */
  def splitLeakageSafeIncremental(
      newBatch: DataFrame,
      corpusWithSplit: DataFrame,
      idCol: String,
      textCol: String,
      splitCol: String,
      blockingKeys: Seq[String],
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      trainPct: Int = 80,
      validPct: Int = 10): DataFrame = {
    require(threshold > 0.0, "splitLeakageSafeIncremental: threshold must be > 0")
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"splitLeakageSafeIncremental: bad percentages train=$trainPct valid=$validPct")
    def inv(df: DataFrame) = df
      .select(col(idCol).as("doc_id") +:
        TextAnalysis.shingles(col(textCol), shingleSize).as("sh") +: blockingKeys.map(col): _*)
      .withColumn("n_sh", size(col("sh")))
      .select(col("doc_id") +: col("n_sh") +: explode(col("sh")).as("shingle") +:
        blockingKeys.map(col): _*)
    // division-form length filter — see ngramJaccardPairs for why not t·max
    val lengthCompatible =
      least(col("l.n_sh"), col("r.n_sh")).cast("double") /
        greatest(col("l.n_sh"), col("r.n_sh")) >= lit(threshold)
    val matched = inv(newBatch).as("l")
      .join(inv(corpusWithSplit).as("r"),
        blockingKeys.map(k => col(s"l.$k") === col(s"r.$k"))
          .foldLeft(col("l.shingle") === col("r.shingle"))(_ && _) && lengthCompatible)
      .groupBy(
        col("l.doc_id").as("__new_id"), col("r.doc_id").as("__corpus_id"),
        col("l.n_sh").as("n_a"), col("r.n_sh").as("n_b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))
        >= threshold)
      // smallest matching corpus id wins — deterministic inheritance
      .groupBy(col("__new_id"))
      .agg(min(col("__corpus_id")).as("__corpus_id"))
      .join(corpusWithSplit.select(col(idCol).as("__corpus_id"),
        col(splitCol).as("__inherited")), Seq("__corpus_id"))
      .select(col("__new_id"), col("__inherited"))
    newBatch.join(matched, col(idCol) === col("__new_id"), "left")
      .withColumn(splitCol,
        coalesce(col("__inherited"),
          when(md5Bucket(col(idCol)) < trainPct, "train")
            .when(md5Bucket(col(idCol)) < trainPct + validPct, "valid")
            .otherwise("test")))
      .drop("__new_id", "__inherited")
  }

  /** [[splitLeakageSafeIncremental]] against the split-corpus artifact
    * stored as a parquet table, tolerating a not-yet-existing artifact —
    * the daily-ingest form: read the persisted
    * (id, text, blocking keys, `splitCol`) table once per batch, assign
    * splits, and append the augmented batch back to the same table so
    * tomorrow's batch inherits from today's decisions too. At bootstrap
    * (no artifact yet) there is nothing to inherit and every document
    * gets the ordinary deterministic md5 split — exactly
    * [[splitLeakageSafe]]'s no-pairs degenerate case. Same contract and
    * concurrency caveat as [[Dedup.incrementalExactAgainstTable]] (one
    * writer; the read-assign-append cycle is the caller's transaction).
    */
  def splitLeakageSafeIncrementalAgainstTable(
      newBatch: DataFrame,
      corpusPath: String,
      idCol: String,
      textCol: String,
      splitCol: String,
      blockingKeys: Seq[String],
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      trainPct: Int = 80,
      validPct: Int = 10): DataFrame = {
    val corpus0 = Dedup.tableOrEmpty(newBatch, corpusPath)
    // bootstrap fallback returns newBatch.limit(0), which lacks splitCol
    val corpus =
      if (corpus0.columns.contains(splitCol)) corpus0
      else corpus0.withColumn(splitCol, lit(null).cast("string"))
    splitLeakageSafeIncremental(newBatch, corpus, idCol, textCol, splitCol,
      blockingKeys, shingleSize, threshold, trainPct, validPct)
  }

  /** Deterministic bucket from a stable key: the first `hexChars` hex
    * digits of md5, mod `buckets` — reproducible on any engine with md5
    * (the cross-engine hash; DuckDB spells it
    * `('0x' || substr(md5(k), 1, hexChars))::BIGINT % buckets`). Keep
    * 16^hexChars ≫ buckets so the modulo bias stays immaterial (the two
    * instantiations below are 2¹⁶ % 100 and 2³² % 10⁴).
    */
  private def md5Bucket(key: Column, hexChars: Int, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, hexChars), 16, 10).cast("long") % buckets

  /** 0–99: the percentage-rate form ([[deterministicSplit]], [[weightedSample]]). */
  private def md5Bucket(key: Column): Column = md5Bucket(key, 4, 100)

  /** Domain-mixture sampling: keep each row with its group's percentage —
    * the "data mixing" step that up/down-weights sources (web 30%, code
    * 100%, wiki 100%, ...) before training. Deterministic md5 bucket of a
    * stable key, NOT rand(): the same mixture reproduces across runs,
    * engines, and partition layouts, and composes with
    * [[deterministicSplit]] without correlation (different key → use a
    * distinct salt/key per decision if both are applied).
    *
    * Per-row filter, shuffle-free, codegen'd CASE — at 100 TB this is a
    * scan that prunes at the source. Groups absent from `weights` keep
    * `defaultPct`.
    */
  def weightedSample(
      df: DataFrame,
      key: Column,
      group: Column,
      weights: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    require((defaultPct +: weights.values.toSeq).forall(p => p >= 0 && p <= 100),
      s"weightedSample: percentages must be in [0, 100]")
    val pct = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (g, p)) => when(group === g, lit(p)).otherwise(acc)
    }
    df.filter(md5Bucket(key) < pct)
  }

  /** Exact-size weighted sample WITHOUT replacement — Efraimidis & Spirtes
    * (2006) algorithm A-ES: each row draws a uniform u ∈ (0, 1] and scores
    * ln(u)/w; the k highest scores are distributed exactly as a sequential
    * weighted reservoir sample. Unlike [[weightedSample]] (per-group
    * keep-rates → output SIZE varies with the data) this returns exactly
    * min(k, n) rows with per-row inclusion probability ∝ weight — the
    * "give me a 500-doc budget, prefer long documents" selection step.
    *
    * u is md5-derived from the stable id (first 8 hex chars → (v+1)/2³²,
    * so u > 0 and ln is finite), NOT rand(): the sample reproduces across
    * runs, engines (the DuckDB oracle recomputes the identical scores),
    * and partition layouts. Weights must be > 0 — clamp upstream
    * (`greatest(w, lit(1))`).
    *
    * Scale shape: score is one codegen'd projection; orderBy(desc).limit(k)
    * plans as TakeOrderedAndProject — a bounded k-heap per partition, k
    * rows per partition to the driver, NO global sort (spec-asserted). At
    * 100 TB the corpus is scanned once and never shuffled.
    */
  def reservoirSample(df: DataFrame, id: Column, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"reservoirSample: k must be > 0, got $k")
    df.withColumn("__es", esScore(id, weight))
      .orderBy(col("__es").desc, id.asc)
      .limit(k)
      .drop("__es")
  }

  /** The A-ES score ln(u)/w with u md5-derived from the stable id —
    * shared by [[reservoirSample]] (global top-k) and
    * [[reservoirSamplePerKey]] (per-group quotas).
    */
  private def esScore(id: Column, weight: Column): Column = {
    val v = conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
    val u = (v + lit(1L)).cast("double") / lit(4294967296.0)
    log(u) / weight
  }

  /** Stratified A-ES: an exact-size weighted sample without replacement
    * PER GROUP — "k docs per language, preferring long ones" — the
    * balanced-downsampling step that fixes per-stratum budgets instead of
    * one global budget ([[reservoirSample]]). Same deterministic md5
    * scores, so the DuckDB oracle recomputes the per-group selection
    * exactly.
    *
    * Scale shape: delegates to [[capPerKey]] on the score — with
    * `saltBuckets > 1` a salted pre-cap bounds any hot group's sort to
    * (group, salt) slices before the final per-group cut (the
    * select_domain_cap plan), so a stratum with billions of rows never
    * sorts through one task.
    */
  def reservoirSamplePerKey(
      df: DataFrame,
      id: Column,
      weight: Column,
      key: Column,
      kPerKey: Int,
      saltBuckets: Int = 1): DataFrame =
    capPerKey(df.withColumn("__es", esScore(id, weight)), key,
        Seq(col("__es").desc, id.asc), kPerKey, id, saltBuckets)
      .drop("__es")

  /** Fixed-size token-window chunking with overlap — the context-window
    * prep step that splits long documents into model-sized pieces (window
    * tokens, a new chunk every `stride` tokens, so consecutive chunks
    * overlap by window − stride). The final chunks of a document may be
    * shorter than `window`. Whitespace-token semantics mean there is no
    * zero-token document: `split("", " +")` is `[""]`, so an empty text is
    * ONE empty token and emits one 1-token chunk (pinned by the chunking
    * spec) — pre-filter `trim(text) != ''` upstream if empty docs must
    * vanish.
    *
    * Emits (id, chunk_idx, chunk_tokens, chunk, chunk_hash): the hash is a
    * cross-engine md5 of the space-joined chunk so downstream exact-dedup
    * of CHUNKS ([[Dedup.exactByKey]] on chunk_hash) composes directly.
    *
    * Scale shape: tokenize once per row, `posexplode` over an integer
    * stride sequence, `slice` per chunk — per-row compute, shuffle-free,
    * output rows ≈ input tokens / stride. At 100 TB this is a scan whose
    * output is written straight back out; no state, no shuffle.
    */
  def chunkTokens(
      df: DataFrame,
      id: Column,
      text: Column,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0, "chunkTokens: window must be positive")
    require(stride > 0 && stride <= window,
      "chunkTokens: stride must be in [1, window] (stride > window drops tokens)")
    df.select(id.as("id"), TextAnalysis.wsTokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col("id"), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride))))
      .where(col("col") < col("__n")) // drops the n=0 placeholder start
      .withColumn("chunk", slice(col("__toks"), col("col") + 1, lit(window)))
      .select(
        col("id"),
        col("pos").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        col("chunk"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public method): score
    * each raw document by the mean log-ratio of target-vs-raw n-gram
    * frequencies, so documents that "look like" the high-quality target
    * domain score high and can be kept by thresholding/ranking — the
    * domain-targeted data-selection step between raw crawl and training.
    *
    * score(d) = avg over gram OCCURRENCES g in d of
    *            ln(count_target(g) + alpha) − ln(count_raw(g) + alpha)
    * (the additive-smoothed unnormalized log-ratio; the probability
    * normalizers are a per-gram constant that shifts every document
    * equally, so ranking is identical to the normalized form).
    * Returns one row per raw document: (idCol, n_grams, score), score
    * rounded to 4 decimals (engine-stable). Documents with fewer than n
    * tokens have no grams and are dropped.
    *
    * Scale shape: the raw corpus' exploded grams collapse to per-document
    * (doc, gram, count) rows in ONE hash agg whose partial (map-side)
    * phase absorbs the occurrence multiset before anything shuffles — a
    * document repeating one gram a million times contributes one row to
    * the exchange. That compact table feeds BOTH the raw gram-count agg
    * (sum of counts per gram) and the scoring join (score = Σc·w / Σc —
    * identical to the per-occurrence average), so the raw corpus is
    * scanned once and Catalyst reuses the (doc, gram) exchange across the
    * two consumers. The target side aggregates separately (typically a
    * tiny curated corpus). With `hashBuckets` set, grams collapse to
    * xxhash64 buckets FIRST: the weight table is bounded at `buckets`
    * rows (MBs) and is broadcast EXPLICITLY — the corpus side never
    * shuffles on the gram at all — at the cost of hash-collision noise;
    * exactly the hashed-ngram variant the paper runs at web scale.
    * Identity grams (None) keep the oracle-checkable exact form; its
    * vocabulary-sized weight table joins hash-partitioned.
    */
  def importanceScores(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 1,
      alpha: Double = 1.0,
      hashBuckets: Option[Int] = None): DataFrame = {
    require(n > 0, "importanceScores: n must be positive")
    require(alpha > 0, "importanceScores: alpha must be positive (smoothing)")
    hashBuckets.foreach(b => require(b > 0, "importanceScores: hashBuckets must be positive"))
    def gram(c: Column): Column = hashBuckets match {
      case Some(b) => pmod(xxhash64(c), lit(b.toLong))
      case None    => c
    }
    // explode FIRST, bucket-hash in a separate projection: a generator
    // nested inside an expression (pmod(xxhash64(explode(...)))) is
    // rejected by the analyzer (UNSUPPORTED_GENERATOR.NESTED_IN_EXPRESSIONS)
    def grams(df: DataFrame, cols: Column*) = df
      .select(cols :+ explode(TextAnalysis.ngramsAll(col(textCol), n)).as("__g0"): _*)
      .select(cols :+ gram(col("__g0")).as("__g"): _*)
    val docGrams = grams(raw, col(idCol))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
    val tgtCnt = grams(target).groupBy(col("__g")).agg(count(lit(1)).as("__tc"))
    val weights = docGrams.groupBy(col("__g")).agg(sum(col("__c")).as("__rc"))
      .join(tgtCnt, Seq("__g"), "left")
      .select(col("__g"),
        (log(coalesce(col("__tc"), lit(0L)) + alpha) -
          log(col("__rc") + alpha)).as("__w"))
    // bounded-bucket weight table → force the broadcast the size estimator
    // can't prove; identity grams → vocabulary-sized, hash-partitioned
    val w = if (hashBuckets.isDefined) broadcast(weights) else weights
    // every raw gram is in the weight table by construction → inner join;
    // Σc·w / Σc ≡ the average over gram occurrences
    docGrams.join(w, "__g")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_grams"),
        round(sum(col("__c") * col("__w")) / sum(col("__c")), 4).as("score"))
  }

  /** Bigram language-model fluency scores — the perplexity-filter step of
    * CCNet-style pipelines (Wenzek et al. 2020 train a KenLM 5-gram on
    * Wikipedia and drop high-perplexity crawl text; public method), with
    * an add-alpha-smoothed bigram LM standing in for KenLM:
    *
    *   score(d) = avg over bigram occurrences (w1 w2) in d of
    *              ln(c_ref(w1 w2) + alpha) − ln(c_ref(w1) + alpha·V)
    *
    * i.e. the mean conditional log-likelihood under the reference corpus'
    * bigram distribution (V = reference unigram vocabulary size); negated
    * and exponentiated this IS the document's bigram perplexity, so
    * ranking by `avg_logp` descending = ranking by fluency. Returns one
    * row per raw document with ≥ 1 bigram: (idCol, n_bigrams, avg_logp),
    * rounded to 4 decimals; sub-2-token documents are dropped (no
    * bigrams), same contract as [[importanceScores]].
    *
    * Scale shape: three hash aggs (reference unigrams, reference bigrams,
    * per-doc bigram counts — each map-side combined so a repeated bigram
    * reaches the exchange once), V as a broadcast 1-row agg, and two
    * hash-partitioned joins keyed on the bigram / the prefix token. The
    * count tables are vocabulary-sized; composing with
    * [[selectTopByScore]] turns the score into an actual perplexity
    * filter, exactly like `text_importance_select`.
    */
  def bigramLogLikelihood(
      raw: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 1.0): DataFrame =
    ngramLogLikelihood(raw, reference, idCol, textCol, n = 2, alpha)

  /** [[bigramLogLikelihood]] generalized to order-`n` (KenLM-grade
    * pipelines run n = 5): score(d) = avg over n-gram occurrences of
    * ln(c_ref(ngram) + alpha) − ln(c_ref(context) + alpha·V), the
    * context being the gram's first n−1 tokens and V the reference
    * UNIGRAM vocabulary (standard add-alpha conditional). Same plan
    * shape at any n — two reference count aggs (n-grams and contexts),
    * the per-doc gram agg, joins keyed on gram/context strings, V as a
    * broadcast 1-row agg. Higher n sharpens the fluency signal and
    * grows the count tables toward corpus-positions rows — at web scale
    * hash the gram strings to 8-byte keys exactly like the dedup
    * operators. Documents shorter than n tokens are dropped.
    */
  def ngramLogLikelihood(
      raw: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      alpha: Double = 1.0): DataFrame = {
    require(n >= 2, "ngramLogLikelihood: n must be >= 2 (conditional LM)")
    require(alpha > 0, "ngramLogLikelihood: alpha must be positive (smoothing)")
    val ctxCnt = reference
      .select(explode(TextAnalysis.ngramsAll(col(textCol), n - 1)).as("__ctx"))
      .groupBy(col("__ctx")).agg(count(lit(1)).as("__cc"))
    val vocab = reference
      .select(explode(TextAnalysis.ngramsAll(col(textCol), 1)).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    val ngCnt = reference
      .select(explode(TextAnalysis.ngramsAll(col(textCol), n)).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__gc"))
    val docNg = raw
      .select(col(idCol), explode(TextAnalysis.ngramsAll(col(textCol), n)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      // the conditioning context = the gram's first n-1 tokens
      .withColumn("__ctx",
        array_join(slice(split(col("__g"), " "), 1, n - 1), " "))
    docNg
      .join(ngCnt, Seq("__g"), "left")
      .join(ctxCnt, Seq("__ctx"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("n_bigrams"),
        round(
          sum(col("__c") *
            (log(coalesce(col("__gc"), lit(0L)) + alpha) -
              log(coalesce(col("__cc"), lit(0L)) + lit(alpha) * col("__v")))) /
            sum(col("__c")), 4).as("avg_logp"))
  }

  /** KenLM-grade fluency scoring: interpolated MODIFIED KNESER-NEY over
    * trigrams (Kneser & Ney 1995; the Chen & Goodman 1998 "modified"
    * three-discount variant; the estimator KenLM — Heafield 2011 —
    * defaults to, and the LM CCNet actually trains). Replaces the
    * add-alpha stand-in where fidelity to the published pipelines
    * matters: add-alpha systematically over-penalizes unseen
    * continuations of frequent contexts; KN's absolute discounting +
    * continuation counts is the fix the literature settled on.
    *
    * The model, exactly as implemented (all counts from the REFERENCE):
    *  - order 3 (raw counts): p3(w|uv) = (c(uvw) − D3[c])⁺ / c(uv·)
    *      + γ3(uv)·p2(w|v), γ3(uv) = (D3₁·N1(uv·) + D3₂·N2(uv·) +
    *      D3₃·N3+(uv·)) / c(uv·)
    *  - order 2 (CONTINUATION counts from trigram types): ĉ(vw) =
    *      |{u : c(uvw) > 0}|, p2(w|v) = (ĉ(vw) − D2[ĉ])⁺ / ĉ(v·)
    *      + γ2(v)·p1(w)
    *  - order 1: p1(w) = ĉ(w)/T with ĉ(w) = |{v : ĉ(vw) > 0}| and T the
    *      number of bigram continuation types
    *  - discounts per order from count-of-counts (t_k = #types with
    *      count k): Y = t1/(t1+2t2); D₁ = 1 − 2Y·t2/t1; D₂ = 2 −
    *      3Y·t3/t2; D₃ = 3 − 4Y·t4/t3. When an order's discounts are
    *      INESTIMABLE (a t1..t3 of zero) or out of their [0, k] range
    *      (either breaks the telescoping clamp), that order falls back
    *      to D = 0.5/1.0/1.5 — exactly KenLM's `--discount_fallback`
    *      defaults (without the flag KenLM refuses such corpora; a
    *      pipeline operator prefers the documented fallback to a dead
    *      run, and the fallback preserves the sum-to-1 invariant).
    *
    * The interpolation telescopes: Σ_w p3(w|uv) = 1 exactly over the
    * continuation vocabulary (spec-asserted to 1e-9) — the property
    * add-alpha only approximates and backoff-without-interpolation
    * violates.
    *
    * Scale shape: the whole model collapses to ONE per-gram log-prob
    * table built from the reference trigram TYPES (type-table joins on
    * uv/vw/v/w + three broadcast 1-row discount tables) — KenLM's own
    * layout — so the scored corpus pays a single hash join on the gram
    * string. Grams unseen in the reference take the graded backoff path
    * (an anti-join remainder, empty when raw == reference): missing
    * trigram → discounted-0 + γ3·p2; missing context → p2; missing v →
    * p1; a w outside the continuation vocabulary has no mass and the
    * gram is dropped from the average (documented; KenLM gives <unk>
    * explicit mass instead — feed a real unknown-token convention
    * upstream if that is wanted). Documents shorter than 3 tokens drop
    * (no trigrams), as in [[ngramLogLikelihood]].
    *
    * Output: (idCol, n_grams, avg_logp rounded to 4dp) — same contract
    * as [[ngramLogLikelihood]] at n = 3.
    */
  def knTrigramLogLikelihood(
      raw: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val kp = knParts(reference, textCol)
    // anti-join keys come from tri, not model: every model join is against
    // an aggregate derived from tri, so the gram sets are identical by
    // construction and the cheap single-agg table avoids replanning the
    // whole 5-table model join just to produce keys.
    knScoreGraded(knDocTrigrams(raw, idCol, textCol), idCol,
      kp.model, kp.tri.select(col("__g")), kp.ctx3,
      kp.bg.select(col("__vw"), col("__cc2")), kp.ctx2, kp.uni,
      kp.d3, kp.d2, kp.tRow)
  }

  /** The serving tail shared by the composed operator and the persisted-
    * artifact path — BOTH KN scoring shapes are this one function, so
    * served ≡ composed holds by construction, not by parallel maintenance.
    * Seen grams pay one hash join against the per-gram log-prob table; the
    * unseen remainder (empty when raw == reference) takes the graded
    * backoff: missing trigram → discounted-0 + γ3·p2; missing context →
    * p2; missing v → p1; a w outside the continuation vocabulary has no
    * mass and the gram drops from the average.
    */
  private def knScoreGraded(
      docTri: DataFrame,
      idCol: String,
      model: DataFrame,     // (__g, __lp) per reference trigram type
      modelKeys: DataFrame, // (__g) — same gram set as model, cheapest plan
      ctx3: DataFrame,
      bgSlim: DataFrame,    // (__vw, __cc2)
      ctx2: DataFrame,
      uni: DataFrame,
      d3: DataFrame,
      d2: DataFrame,
      tRow: DataFrame): DataFrame = {
    val seen = docTri.join(model, "__g")
      .select(col(idCol), col("__c"), col("__lp"))
    // surviving grams are by definition NOT reference trigrams, so their
    // count is a constant null (knP3Of coalesces it to the discounted-0
    // numerator) — no join needed for c3.
    val unseen = knGramKeys(docTri.join(modelKeys, Seq("__g"), "left_anti"))
      .withColumn("__c3", lit(null).cast("long"))
      .join(ctx3, Seq("__uv"), "left")
      .join(bgSlim, Seq("__vw"), "left")
      .join(ctx2, Seq("__v"), "left")
      .join(uni, Seq("__w"), "left")
      .crossJoin(broadcast(d3)).crossJoin(broadcast(d2))
      .crossJoin(broadcast(tRow))
      .select(col(idCol), col("__c"),
        log(knP3Of(col("__c3"), knP2Of(col("__cc2")))).as("__lp"))
      // a w outside the continuation vocabulary has no mass: drop the gram
      .filter(col("__lp").isNotNull)
    knPerDoc(seen.unionByName(unseen), idCol)
  }

  /** The trained model as a persistable ARTIFACT: one row per reference
    * trigram type, (gram STRING, logp DOUBLE) — the analog of KenLM's
    * binarized model file. The published pipelines train ONCE (CCNet's
    * KenLM is fit on Wikipedia) and score many crawl shards; writing this
    * table to parquet and serving shards through
    * [[knScoreAgainstModel]] is that shape — the model build (type-table
    * joins over the reference) is paid once, not per shard.
    */
  def knTrigramModel(reference: DataFrame, textCol: String): DataFrame =
    knParts(reference, textCol).model
      .select(col("__g").as("gram"), col("__lp").as("logp"))

  /** Score documents against a SAVED [[knTrigramModel]] artifact: one
    * gram-keyed hash join, same output contract as
    * [[knTrigramLogLikelihood]]. Grams absent from the model are DROPPED
    * from the average — this slim (gram, logp) slice has no backoff
    * state. It is the right artifact ONLY when the served corpus is known
    * in-vocabulary (spec-pinned row-identical to the composed form there);
    * the production train-once/score-many shape is always partly OOV —
    * serve that through [[knTrainModel]]/[[KnModel]], whose full artifact
    * replays the same graded backoff as the composed operator.
    */
  def knScoreAgainstModel(
      raw: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    knPerDoc(
      knDocTrigrams(raw, idCol, textCol)
        .join(model.select(col("gram").as("__g"), col("logp").as("__lp")), "__g")
        .select(col(idCol), col("__c"), col("__lp")),
      idCol)

  /** A trained modified-KN trigram model with its FULL backoff state —
    * the analog of a KenLM .arpa/.binary file rather than the bare
    * top-order probability table. The production serving shape (CCNet:
    * train on Wikipedia ONCE, score every crawl shard — Wenzek et al.
    * 2020's own setting) is always partly out-of-vocabulary, and an OOV
    * gram must BACK OFF through the lower orders, not silently drop from
    * the average. This bundle carries everything the graded backoff
    * needs: the per-gram log-prob table plus the order-3 context stats,
    * bigram continuation counts, order-2 context stats, unigram
    * continuation counts, and the three 1-row discount/total tables.
    * Every table is bounded by reference trigram TYPES (the model's own
    * size), so the artifact costs ~2× the slim (gram, logp) slice — and
    * the served backoff evaluates the IDENTICAL expression tree as the
    * composed operator ([[knScoreGraded]] is shared code), so served ≡
    * composed bit-for-bit, OOV grams included (spec-pinned through a
    * parquet roundtrip).
    *
    * Frames are kept in the internal join-ready layout; [[KnModel.save]]
    * writes them under `dir/{grams,ctx3,bigrams,ctx2,unigrams,disc3,
    * disc2,total}` with clean public column names and [[KnModel.load]]
    * restores the internal layout.
    */
  final case class KnModel(
      grams: DataFrame,  // (__g, __lp) one row per reference trigram type
      ctx3: DataFrame,   // (__uv, __ctot, __n1, __n2, __n3)
      bg: DataFrame,     // (__vw, __cc2) bigram continuation counts
      ctx2: DataFrame,   // (__v, __cc2tot, __m1, __m2, __m3)
      uni: DataFrame,    // (__w, __cc1) unigram continuation counts
      d3: DataFrame,     // (__k3d1, __k3d2, __k3d3) 1 row
      d2: DataFrame,     // (__k2d1, __k2d2, __k2d3) 1 row
      tRow: DataFrame) { // (__T) 1 row
    def save(dir: String): Unit = {
      def w(df: DataFrame, name: String): Unit =
        df.write.mode("overwrite").parquet(s"$dir/$name")
      w(grams.select(col("__g").as("gram"), col("__lp").as("logp")), "grams")
      w(ctx3.select(col("__uv").as("ctx"), col("__ctot").as("ctot"),
        col("__n1").as("n1"), col("__n2").as("n2"), col("__n3").as("n3")), "ctx3")
      w(bg.select(col("__vw").as("bigram"), col("__cc2").as("cc2")), "bigrams")
      w(ctx2.select(col("__v").as("v"), col("__cc2tot").as("cc2tot"),
        col("__m1").as("m1"), col("__m2").as("m2"), col("__m3").as("m3")), "ctx2")
      w(uni.select(col("__w").as("w"), col("__cc1").as("cc1")), "unigrams")
      w(d3.select(col("__k3d1").as("d1"), col("__k3d2").as("d2"),
        col("__k3d3").as("d3")), "disc3")
      w(d2.select(col("__k2d1").as("d1"), col("__k2d2").as("d2"),
        col("__k2d3").as("d3")), "disc2")
      w(tRow.select(col("__T").as("t")), "total")
    }
  }

  object KnModel {
    def load(spark: SparkSession, dir: String): KnModel = {
      def r(name: String) = spark.read.parquet(s"$dir/$name")
      KnModel(
        r("grams").select(col("gram").as("__g"), col("logp").as("__lp")),
        r("ctx3").select(col("ctx").as("__uv"), col("ctot").as("__ctot"),
          col("n1").as("__n1"), col("n2").as("__n2"), col("n3").as("__n3")),
        r("bigrams").select(col("bigram").as("__vw"), col("cc2").as("__cc2")),
        r("ctx2").select(col("v").as("__v"), col("cc2tot").as("__cc2tot"),
          col("m1").as("__m1"), col("m2").as("__m2"), col("m3").as("__m3")),
        r("unigrams").select(col("w").as("__w"), col("cc1").as("__cc1")),
        r("disc3").select(col("d1").as("__k3d1"), col("d2").as("__k3d2"),
          col("d3").as("__k3d3")),
        r("disc2").select(col("d1").as("__k2d1"), col("d2").as("__k2d2"),
          col("d3").as("__k2d3")),
        r("total").select(col("t").as("__T")))
    }
  }

  /** Train the full-backoff KN artifact ([[KnModel]]) — the train-once
    * half of the train-once/score-many serving shape. Same estimator as
    * [[knTrigramLogLikelihood]] (shared [[knParts]]); the scoring half is
    * the [[KnModel]] overload of [[knScoreAgainstModel]].
    */
  def knTrainModel(reference: DataFrame, textCol: String): KnModel = {
    val kp = knParts(reference, textCol)
    KnModel(kp.model, kp.ctx3, kp.bg.select(col("__vw"), col("__cc2")),
      kp.ctx2, kp.uni, kp.d3, kp.d2, kp.tRow)
  }

  /** Export a [[KnModel]] to the standard ARPA n-gram format (Stolcke
    * 2002, SRILM; the interchange format KenLM reads and writes) — the
    * interop path OUT of this engine: a model trained here loads into
    * any ARPA consumer. Interpolated KN is written in ARPA's
    * backoff parameterization, the standard equivalence: the listed
    * trigram probs are already interpolated, bigram entries carry
    * log10 γ3(uv) as their backoff weight, unigram entries carry
    * log10 γ2(v), and an unlisted context backs off freely (weight 1 —
    * ARPA's omitted-field default). Entries that exist only to carry a
    * backoff weight (a trigram context never observed as a continuation)
    * get the SRILM placeholder prob −99. Standard-scoring equivalence —
    * score(ARPA roundtrip) ≡ [[knScoreAgainstModel]] per row — is
    * spec-pinned on an OOV corpus.
    *
    * Shape: all three sections assemble as DataFrames (one global sort
    * on (order, gram) into a single text part — an export of a
    * model-bounded artifact, the documented bounded-output class); the
    * three header counts are 1-row aggregates. Probabilities print
    * through Spark's shortest-round-trip double repr, so import parses
    * the identical bits back.
    */
  def knExportArpa(model: KnModel, dir: String): Unit = {
    val ln10 = math.log(10.0)
    val spark = model.grams.sparkSession
    import org.apache.spark.sql.functions.{log => slog}
    // γ expressions over the persisted stat tables (same algebra knP3Of/
    // knP2Of embed)
    val gamma3 = (col("__k3d1") * col("__n1").cast("double") +
      col("__k3d2") * col("__n2").cast("double") +
      col("__k3d3") * col("__n3").cast("double")) / col("__ctot").cast("double")
    val gamma2 = (col("__k2d1") * col("__m1").cast("double") +
      col("__k2d2") * col("__m2").cast("double") +
      col("__k2d3") * col("__m3").cast("double")) / col("__cc2tot").cast("double")
    def log10(c: Column): Column = slog(c) / ln10
    def num(c: Column): Column = c.cast("string")
    // ---- 3-gram section: every reference trigram type, interpolated prob
    val sec3 = model.grams.select(lit(3).as("__ord"), col("__g").as("__key"),
      concat(num(col("__lp") / ln10), lit("\t"), col("__g")).as("__line"))
    // ---- 2-gram section: observed continuation bigrams ∪ trigram contexts
    val keys2 = model.bg.select(col("__vw").as("__b"))
      .union(model.ctx3.select(col("__uv").as("__b"))).distinct()
    val sec2base = keys2
      .withColumn("__p", split(col("__b"), " "))
      .withColumn("__a", element_at(col("__p"), 1))
      .withColumn("__w2", element_at(col("__p"), 2))
      .drop("__p")
      .join(model.bg.select(col("__vw").as("__b"), col("__cc2")), Seq("__b"), "left")
      .join(model.ctx2.withColumnRenamed("__v", "__a"), Seq("__a"), "left")
      .join(model.uni.withColumnRenamed("__w", "__w2"), Seq("__w2"), "left")
      .join(model.ctx3.withColumnRenamed("__uv", "__b"), Seq("__b"), "left")
      .crossJoin(broadcast(model.d2)).crossJoin(broadcast(model.d3))
      .crossJoin(broadcast(model.tRow))
    val p2log = log10(knP2Of(col("__cc2")))
    val bo3 = when(col("__ctot").isNotNull, log10(gamma3))
    val sec2 = sec2base.select(lit(2).as("__ord"), col("__b").as("__key"),
      concat(
        coalesce(num(p2log), lit("-99.0")), lit("\t"), col("__b"),
        when(bo3.isNotNull, concat(lit("\t"), num(bo3))).otherwise(lit(""))
      ).as("__line"))
    // ---- 1-gram section: every token of every trigram type
    val words = model.grams
      .select(explode(split(col("__g"), " ")).as("__w1")).distinct()
      .join(model.uni.withColumnRenamed("__w", "__w1"), Seq("__w1"), "left")
      .join(model.ctx2.withColumnRenamed("__v", "__w1"), Seq("__w1"), "left")
      .crossJoin(broadcast(model.d2)).crossJoin(broadcast(model.tRow))
    val p1log = log10(col("__cc1").cast("double") / col("__T"))
    val bo2 = when(col("__cc2tot").isNotNull, log10(gamma2))
    val sec1 = words.select(lit(1).as("__ord"), col("__w1").as("__key"),
      concat(
        coalesce(num(p1log), lit("-99.0")), lit("\t"), col("__w1"),
        when(bo2.isNotNull, concat(lit("\t"), num(bo2))).otherwise(lit(""))
      ).as("__line"))
    // ---- headers / markers, then one globally-ordered text part
    val (n1, n2, n3) = (words.count(), keys2.count(), model.grams.count())
    def fixed(rows: (Int, String, String)*): DataFrame = {
      import spark.implicits._
      rows.toSeq.toDF("__ord", "__key", "__line")
    }
    val header = fixed(
      (0, "0", "\\data\\"),
      (0, "1", s"ngram 1=$n1"), (0, "2", s"ngram 2=$n2"), (0, "3", s"ngram 3=$n3"),
      (0, "4", ""), (0, "5", "\\1-grams:"))
    val mark2 = fixed((1, "￿", ""), (1, "￿0", "\\2-grams:"))
    val mark3 = fixed((2, "￿", ""), (2, "￿0", "\\3-grams:"))
    val tail = fixed((3, "￿", ""), (3, "￿0", "\\end\\"))
    header.unionByName(sec1).unionByName(mark2).unionByName(sec2)
      .unionByName(mark3).unionByName(sec3).unionByName(tail)
      .orderBy(col("__ord"), col("__key"))
      .select(col("__line"))
      // BOUNDED ARTIFACT: the model tables are bounded by n-gram TYPES
      // (not corpus size), and ARPA is a single-file interchange format by
      // definition — the one-task write is the contract, not a scale
      // bottleneck. Same discipline as the other driver-side artifact
      // sites; a model too big for one task is a model too big for ARPA.
      .coalesce(1)
      .write.mode("overwrite").text(dir)
  }

  /** An ARPA trigram model parsed back into join-ready tables. Orders
    * are recovered from the gram's token count, so section markers need
    * no stateful parse; probs ≤ −98.5 are the SRILM "placeholder only"
    * convention and count as absent.
    */
  final case class ArpaModel(uni: DataFrame, bi: DataFrame, tri: DataFrame)

  def knImportArpa(spark: SparkSession, dir: String): ArpaModel = {
    val lines = spark.read.text(dir)
      .filter(length(col("value")) > 0 &&
        !col("value").startsWith("\\") && !col("value").startsWith("ngram "))
      .withColumn("__f", split(col("value"), "\t"))
      .select(
        element_at(col("__f"), 2).as("__g"),
        element_at(col("__f"), 1).cast("double").as("__lp10"),
        when(size(col("__f")) >= 3, element_at(col("__f"), 3).cast("double"))
          .as("__bo10"))
      .withColumn("__n", size(split(col("__g"), " ")))
      .withColumn("__lp10",
        when(col("__lp10") <= -98.5, lit(null).cast("double")).otherwise(col("__lp10")))
    ArpaModel(
      uni = lines.filter(col("__n") === 1).select(col("__g"), col("__lp10"), col("__bo10")),
      bi = lines.filter(col("__n") === 2).select(col("__g"), col("__lp10"), col("__bo10")),
      tri = lines.filter(col("__n") === 3).select(col("__g"), col("__lp10")))
  }

  /** Score documents against an imported [[ArpaModel]] with STANDARD
    * ARPA backoff semantics (Katz-style lookup: listed n-gram prob, else
    * context backoff weight × the (n−1)-gram's prob, weight 1 when the
    * context is unlisted) — the reference implementation every ARPA
    * consumer runs. Same output contract as [[knScoreAgainstModel]];
    * grams whose final word has no real unigram prob drop from the
    * average (this engine's documented continuation-OOV rule). The spec
    * pins score(export → import → this) ≈ the native graded-backoff
    * serve on an OOV corpus — the external-interop loop closed end to
    * end.
    */
  def knScoreArpa(
      raw: DataFrame,
      arpa: ArpaModel,
      idCol: String,
      textCol: String): DataFrame = {
    val ln10 = math.log(10.0)
    val keyed = knGramKeys(knDocTrigrams(raw, idCol, textCol))
      .join(arpa.tri.select(col("__g"), col("__lp10").as("__t3")), Seq("__g"), "left")
      .join(arpa.bi.select(col("__g").as("__vw"), col("__lp10").as("__p2")),
        Seq("__vw"), "left")
      .join(arpa.bi.select(col("__g").as("__uv"), col("__bo10").as("__bo3")),
        Seq("__uv"), "left")
      .join(arpa.uni.select(col("__g").as("__v"), col("__bo10").as("__bo2")),
        Seq("__v"), "left")
      .join(arpa.uni.select(col("__g").as("__w"), col("__lp10").as("__p1")),
        Seq("__w"), "left")
    val p2fallback = coalesce(col("__p2"),
      coalesce(col("__bo2"), lit(0.0)) + col("__p1"))
    val lp10 = coalesce(col("__t3"),
      coalesce(col("__bo3"), lit(0.0)) + p2fallback)
    knPerDoc(
      keyed.select(col(idCol), col("__c"), (lp10 * ln10).as("__lp"))
        .filter(col("__lp").isNotNull),
      idCol)
  }

  /** Score documents against a trained/loaded [[KnModel]] with FULL
    * graded backoff — row-identical (bit-for-bit, OOV grams included) to
    * running [[knTrigramLogLikelihood]] against the training reference,
    * because both paths are the same [[knScoreGraded]] plan: in-model
    * grams pay one gram-keyed hash join; the OOV remainder anti-joins out
    * and backs off through the persisted count tables (trigram →
    * discounted-0 + γ3·p2 → p2 → p1; continuation-OOV grams drop).
    */
  def knScoreAgainstModel(
      raw: DataFrame,
      model: KnModel,
      idCol: String,
      textCol: String): DataFrame =
    knScoreGraded(knDocTrigrams(raw, idCol, textCol), idCol,
      model.grams, model.grams.select(col("__g")), model.ctx3, model.bg,
      model.ctx2, model.uni, model.d3, model.d2, model.tRow)

  /** Per-doc distinct-gram occurrence counts — the corpus side of every
    * KN scoring path.
    */
  private def knDocTrigrams(raw: DataFrame, idCol: String, textCol: String): DataFrame =
    raw.select(col(idCol), explode(TextAnalysis.ngramsAll(col(textCol), 3)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))

  /** Per-doc average over scored gram occurrences — the serving tail of
    * every KN scoring path.
    */
  private def knPerDoc(scoredGrams: DataFrame, idCol: String): DataFrame =
    scoredGrams.groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_grams"),
        round(sum(col("__c") * col("__lp")) / sum(col("__c")), 4).as("avg_logp"))

  /** Gram-key projection shared by the reference type table and the
    * unseen backoff path: context (uv), continuation bigram (vw), middle
    * and final tokens.
    */
  private def knGramKeys(df: DataFrame): DataFrame = df
      .withColumn("__p", split(col("__g"), " "))
      .withColumn("__uv", array_join(slice(col("__p"), 1, 2), " "))
      .withColumn("__vw", array_join(slice(col("__p"), 2, 2), " "))
      .withColumn("__v", element_at(col("__p"), 2))
      .withColumn("__w", element_at(col("__p"), 3))
      .drop("__p")

  /** The interpolated KN probability expressions, over the post-join
    * column layout every scoring path produces (__ctot, __n1-3, __k3d1-3
    * from ctx3+d3; __cc2tot, __m1-3, __k2d1-3 from ctx2+d2; __cc1, __T
    * from uni+tRow; missing levels coalesce per the scaladoc). Static
    * column-name
    * expressions so the composed plan, the model build, and the
    * parquet-served backoff all evaluate the IDENTICAL tree.
    */
  private def knP1: Column = col("__cc1").cast("double") / col("__T")

  private def knP2Of(cc2: Column): Column = {
    def d2sel(c: Column) = when(c === 1, col("__k2d1"))
      .when(c === 2, col("__k2d2")).otherwise(col("__k2d3"))
    val gamma2 = (col("__k2d1") * col("__m1").cast("double") +
      col("__k2d2") * col("__m2").cast("double") +
      col("__k2d3") * col("__m3").cast("double")) / col("__cc2tot").cast("double")
    when(col("__cc2tot").isNotNull,
      greatest(coalesce(cc2.cast("double"), lit(0.0)) - d2sel(coalesce(cc2, lit(0L))),
        lit(0.0)) / col("__cc2tot").cast("double") + gamma2 * knP1).otherwise(knP1)
  }

  private def knP3Of(c3: Column, p2: Column): Column = {
    def d3sel(c: Column) = when(c === 1, col("__k3d1"))
      .when(c === 2, col("__k3d2")).otherwise(col("__k3d3"))
    val gamma3 = (col("__k3d1") * col("__n1").cast("double") +
      col("__k3d2") * col("__n2").cast("double") +
      col("__k3d3") * col("__n3").cast("double")) / col("__ctot").cast("double")
    when(col("__ctot").isNotNull,
      greatest(coalesce(c3.cast("double"), lit(0.0)) - d3sel(coalesce(c3, lit(0L))),
        lit(0.0)) / col("__ctot").cast("double") + gamma3 * p2).otherwise(p2)
  }

  /** Everything [[knTrigramLogLikelihood]]'s backoff path needs beyond
    * the model itself: the reference type/stat tables and discount rows.
    */
  private final case class KnParts(
      model: DataFrame, tri: DataFrame, ctx3: DataFrame, bg: DataFrame,
      ctx2: DataFrame, uni: DataFrame, d3: DataFrame, d2: DataFrame,
      tRow: DataFrame)

  private def knParts(reference: DataFrame, textCol: String): KnParts = {
    // Reference trigram types with their counts and key projections.
    // NOTE (r21 measured): tri feeds five consumers whose pruned copies
    // re-run the scan+explode+agg subtree (7 scans in one composed plan),
    // but a localCheckpoint(false) boundary here measured SLOWER at sf0.1
    // (string-heavy block write + a materialization barrier vs fully
    // parallel recompute on idle cores) — recompute is deliberate; the
    // train-once artifact path (knTrainModel/KnModel) is the shape that
    // amortizes the reference scans at production scale.
    val tri = knGramKeys(reference
      .select(explode(TextAnalysis.ngramsAll(col(textCol), 3)).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__c3")))
      // No-op null filter on every derived key (3-token grams can never
      // produce a null key), added so ALL of tri's consumers share ONE
      // canonical subtree below the gram exchange (r22, guide §2.4):
      // without it each downstream join infers ITS key's isnotnull and
      // pushes a consumer-specific filter below the exchange, so the
      // scan + explode + partial-agg re-executed per consumer (7 scans
      // per composed plan) instead of collapsing to ReusedExchange. With
      // the filter in place the constraint already holds and nothing
      // consumer-specific is pushed down.
      // __c3 >= 1 is a tautology (group counts are positive) that keeps
      // the count in every pruned copy: consumers that drop __c3 (bg and
      // its children) otherwise specialize the aggregate to a bare
      // distinct, splitting the subtree into two variants again.
      .filter(col("__g").isNotNull && col("__uv").isNotNull &&
        col("__vw").isNotNull && col("__v").isNotNull &&
        col("__w").isNotNull && col("__c3") >= 1L)
    // per-context stats at order 3: total count + discount type counts
    val ctx3 = tri.groupBy(col("__uv")).agg(
      sum(col("__c3")).as("__ctot"),
      sum(when(col("__c3") === 1, 1L).otherwise(0L)).as("__n1"),
      sum(when(col("__c3") === 2, 1L).otherwise(0L)).as("__n2"),
      sum(when(col("__c3") >= 3, 1L).otherwise(0L)).as("__n3"))
    // bigram CONTINUATION types: tri rows are distinct grams, so the
    // distinct-u count per (v, w) is a plain row count
    val bg = tri.groupBy(col("__vw"), col("__v"), col("__w"))
      .agg(count(lit(1)).as("__cc2"))
    val ctx2 = bg.groupBy(col("__v")).agg(
      sum(col("__cc2")).as("__cc2tot"),
      sum(when(col("__cc2") === 1, 1L).otherwise(0L)).as("__m1"),
      sum(when(col("__cc2") === 2, 1L).otherwise(0L)).as("__m2"),
      sum(when(col("__cc2") >= 3, 1L).otherwise(0L)).as("__m3"))
    val uni = bg.groupBy(col("__w")).agg(count(lit(1)).as("__cc1"))
    val tRow = uni.agg(sum(col("__cc1")).cast("double").as("__T"))
    // count-of-counts → the three modified discounts, per order
    def coc(counts: DataFrame, c: Column, p: String): DataFrame = counts.agg(
      sum(when(c === 1, 1L).otherwise(0L)).cast("double").as(s"__${p}t1"),
      sum(when(c === 2, 1L).otherwise(0L)).cast("double").as(s"__${p}t2"),
      sum(when(c === 3, 1L).otherwise(0L)).cast("double").as(s"__${p}t3"),
      sum(when(c === 4, 1L).otherwise(0L)).cast("double").as(s"__${p}t4"))
    def dRow(cocRow: DataFrame, p: String): DataFrame = {
      val (t1, t2, t3, t4) = (col(s"__${p}t1"), col(s"__${p}t2"),
        col(s"__${p}t3"), col(s"__${p}t4"))
      // zero-guarded divisions (ANSI mode raises DIVIDE_BY_ZERO) — for
      // estimable corpora every guard holds and the branch is the plain
      // division, value-identical to the oracle's
      def safe(num: Column, den: Column): Column =
        when(den > 0.0, num / den).otherwise(lit(0.0))
      val y = safe(t1, t1 + lit(2.0) * t2)
      val d1e = lit(1.0) - lit(2.0) * y * safe(t2, t1)
      val d2e = lit(2.0) - lit(3.0) * y * safe(t3, t2)
      val d3e = lit(3.0) - lit(4.0) * y * safe(t4, t3)
      // KenLM's --discount_fallback semantics: when an order's
      // count-of-counts can't estimate the discounts (a t1..t3 of zero)
      // or the estimates leave their [0, k] range (which breaks the
      // telescoping clamp), that WHOLE ORDER uses the documented
      // fallback discounts 0.5 / 1.0 / 1.5
      val ok = t1 > 0.0 && t2 > 0.0 && t3 > 0.0 &&
        d1e >= 0.0 && d1e <= 1.0 && d2e >= 0.0 && d2e <= 2.0 &&
        d3e >= 0.0 && d3e <= 3.0
      cocRow.select(
        when(ok, d1e).otherwise(lit(0.5)).as(s"__${p}d1"),
        when(ok, d2e).otherwise(lit(1.0)).as(s"__${p}d2"),
        when(ok, d3e).otherwise(lit(1.5)).as(s"__${p}d3"))
    }
    val coc3 = coc(tri, col("__c3"), "k3")
    val coc2 = coc(bg, col("__cc2"), "k2")
    val d3 = dRow(coc3, "k3")
    val d2 = dRow(coc2, "k2")
    // the model: one log-prob per reference trigram type (KenLM's layout)
    val model = tri
      .join(ctx3, "__uv")
      .join(bg, Seq("__vw", "__v", "__w"))
      .join(ctx2, "__v")
      .join(uni, "__w")
      .crossJoin(broadcast(d3)).crossJoin(broadcast(d2)).crossJoin(broadcast(tRow))
      .select(col("__g"), log(knP3Of(col("__c3"), knP2Of(col("__cc2")))).as("__lp"))
    KnParts(model, tri, ctx3, bg, ctx2, uni, d3, d2, tRow)
  }

  /** Data selection by score quantile: keep rows whose `score` is at or
    * above the corpus' `1 − keepFrac` quantile — the thresholding step that
    * turns [[importanceScores]] (or any quality/perplexity score) into an
    * actual selected subset. The threshold is DATA-dependent, not a
    * constant, so "keep the best 25%" holds whatever the score
    * distribution looks like.
    *
    * Scale shape: one aggregation computes the quantile, the 1-row result
    * broadcasts, and the keep decision is a per-row filter on the scan —
    * no sort, no shuffle of the corpus. The exact interpolated
    * `percentile` agg is the oracle-checkable form (single sort-based agg
    * per group — fine up to huge-but-not-100TB score columns); at full
    * scale swap `percentile` for `percentile_approx` (t-digest, partial+
    * final hash agg) exactly as `q_percentiles`/`q_approx_percentiles`
    * pair.
    *
    * Engine stability: scores quantize to 10⁻⁴ integer units and the
    * boundary test runs in exact integers (threshold ×4 covers the
    * quarter-unit interpolation grid) — ROUNDING the interpolated
    * threshold instead constructs x.xxxx5 decimal ties that Spark and
    * DuckDB round in opposite directions (the q_outliers_mad failure
    * class). Scores are therefore compared at 10⁻⁴ resolution — exactly
    * the resolution the scoring operators already emit.
    *
    * The ×4 grid is EXACT only when (n−1)·(1−keepFrac) has a fractional
    * part on the quarter grid (0, ¼, ½, ¾) — true for the keepFrac ∈
    * {0.25, 0.5, 0.75} usages this library registers. For an arbitrary
    * keepFrac (say 0.3) the interpolated quantile is not a quarter-unit
    * multiple and `round(·*4)` re-introduces a rounded threshold — still
    * deterministic WITHIN Spark, but the cross-engine tie guarantee above
    * no longer applies; snap keepFrac to the quarter grid when oracle
    * exactness matters.
    */
  def selectTopByScore(df: DataFrame, score: Column, keepFrac: Double): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"selectTopByScore: keepFrac must be in (0, 1], got $keepFrac")
    val scq = round(score * 10000, 0).cast("long")
    val thr = df.agg(
      round(percentile(scq, lit(1.0 - keepFrac)) * 4, 0).cast("long").as("__thrq"))
    df.crossJoin(broadcast(thr))
      .filter(scq * 4 >= col("__thrq"))
      .drop("__thrq")
  }

  /** Benchmark decontamination: training documents sharing at least one
    * token n-gram with any document of a benchmark/eval set, with the count
    * of shared distinct n-grams — the pre-training hygiene step that keeps
    * eval answers out of the training corpus. Real contamination is a
    * copied SPAN, so n is conventionally 8-13 tokens; short n over a small
    * vocabulary flags coincidental collisions.
    *
    * Scale shape: both sides reduce to per-document DISTINCT n-grams
    * (codegen'd [[TextAnalysis.shingles]]) before anything shuffles; the
    * benchmark side collapses to a global DISTINCT gram set, which is tiny
    * next to a 100 TB corpus (benchmarks are MBs), so AQE broadcasts it and
    * the corpus side is a single scan + broadcast probe + one hash agg on
    * the id — the corpus' exploded grams never shuffle on the gram. With a
    * benchmark too big to broadcast it degrades to one hash-partitioned
    * equi-join on the gram, still linear.
    */
  def contaminatedDocs(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    require(n > 0, "contaminatedDocs: n must be positive")
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(TextAnalysis.shingles(col(textCol), n)).as("__gram"))
    val benchGrams = grams(bench).select(col("__gram")).distinct()
    // shingles() is per-document distinct, so after the inner join each
    // (id, gram) pair is unique — a plain count IS the distinct-gram count,
    // no countDistinct expansion needed
    grams(train).join(benchGrams, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** Semantic decontamination — the embedding analog of
    * [[contaminatedDocs]]: training rows whose embedding lies within
    * cosine `threshold` of ANY benchmark/eval row, with the hit count and
    * the strongest similarity. N-gram overlap misses paraphrased eval
    * answers; embedding proximity catches them (the contamination variant
    * studied in open eval-hygiene work, e.g. rephrased-benchmark probes).
    *
    * Output: one row per contaminated train id — (`train_id`,
    * `n_eval_hits`, `max_cos` rounded to 4 dp). Dropping these ids from
    * the corpus is a left-anti join on the result.
    *
    * Scale shape: the eval side is an evaluation benchmark — thousands of
    * rows against a 100 TB corpus — so it is broadcast once and the corpus
    * is touched in ONE pass: a broadcast nested-loop join whose per-row
    * work is |eval| codegen'd [[graft.functions.VectorFunctions.dot]]
    * products, then a map-side-combinable hash agg on the train id. The
    * corpus never shuffles. An eval set too large to broadcast is the
    * [[graft.operators.Dedup.embeddingNearDupLSH]] regime instead — bucket
    * both sides by hyperplane signature and verify within buckets.
    */
  def semanticContaminated(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val t = train.select(col(idCol).as("train_id"), toDoubleArray(col(vecCol)).as("__tv"))
      .withColumn("__tn", l2Norm(col("__tv")))
    val e = eval.select(toDoubleArray(col(vecCol)).as("__ev"))
      .withColumn("__en", l2Norm(col("__ev")))
    t.crossJoin(broadcast(e))
      .withColumn("__cos", dot(col("__tv"), col("__ev")) / (col("__tn") * col("__en")))
      .filter(col("__cos") >= threshold)
      .groupBy(col("train_id"))
      .agg(
        count(lit(1)).as("n_eval_hits"),
        round(max(col("__cos")), 4).as("max_cos"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4 — public
    * method): within each partition key (CCNet partitions by language),
    * rank rows by `score` descending and deal them into `nBuckets`
    * equal-size buckets — bucket 1 is the most reference-like "head"
    * (highest LM score = lowest perplexity), the last bucket the "tail".
    * Downstream, CCNet keeps head+middle or weights the buckets; that is a
    * plain filter on `bucket`.
    *
    * Rank-based (`ntile`), not threshold-based, so bucket SIZES are exact
    * (±1 row) whatever the score distribution looks like — the property
    * CCNet's equal-thirds split is defined by — and `tieBreak` makes the
    * deal a total order, hence deterministic and engine-reproducible
    * (ntile's remainder rule — first `count % n` buckets get the extra
    * row — is SQL-standard on both Spark and DuckDB).
    *
    * Scale: one shuffle on the partition keys + a per-key sort — the cost
    * profile of any per-key window. A single language spanning most of a
    * 100 TB corpus is a skewed partition; CCNet itself buckets per
    * (lang, shard) — add the shard column to `partitionKeys` and sizes
    * stay exact within each shard. When approximate membership suffices,
    * [[perplexityBucketsApprox]] assigns by broadcast quantile boundaries
    * with no sort at all.
    */
  def perplexityBuckets(
      df: DataFrame,
      partitionKeys: Seq[Column],
      score: Column,
      tieBreak: Column,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"perplexityBuckets: nBuckets must be >= 2, got $nBuckets")
    val w = (if (partitionKeys.isEmpty) Window.orderBy(score.desc, tieBreak.asc)
             else Window.partitionBy(partitionKeys: _*).orderBy(score.desc, tieBreak.asc))
    df.withColumn("bucket", ntile(nBuckets).over(w))
  }

  /** [[perplexityBuckets]]' no-sort scale companion: per-key approx
    * score boundaries at quantiles 1/n … (n−1)/n (t-digest, partial+final
    * hash agg), broadcast, then bucket = 1 + how many boundaries the row's
    * score falls below — a per-row filter over an (nBuckets−1)-element
    * array. Buckets are approximately equal-size (t-digest error), which
    * is what a selection gate needs; use the exact form when the
    * equal-thirds contract must hold to the row.
    */
  def perplexityBucketsApprox(
      df: DataFrame,
      partitionKeys: Seq[String],
      score: Column,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"perplexityBucketsApprox: nBuckets must be >= 2, got $nBuckets")
    require(partitionKeys.nonEmpty, "perplexityBucketsApprox: partitionKeys must be non-empty")
    val probs = array((1 until nBuckets).map(i => lit(i.toDouble / nBuckets)): _*)
    val bounds = df.groupBy(partitionKeys.map(col): _*)
      .agg(percentile_approx(score, probs, lit(10000)).as("__bnds"))
    // boundaries ascend with the quantile, so a score below j of them sits
    // j buckets away from the head: >= all boundaries -> bucket 1 (head),
    // below all -> bucket nBuckets (tail). A NULL score lands in the tail
    // bucket, matching the exact form (desc ordering sorts nulls last) —
    // without the branch the null predicate would count 0 boundaries and
    // crown every unscored row "head"
    df.join(broadcast(bounds), partitionKeys)
      .withColumn("bucket",
        when(score.isNull, lit(nBuckets))
          .otherwise(lit(1) + size(filter(col("__bnds"), b => score < b))).cast("int"))
      .drop("__bnds")
  }

  /** Greedy token-budget selection: order rows by `score` descending
    * (ties broken by `tieBreak`) and keep the maximal prefix whose token
    * sum stays within `budget` — "take the best documents until the
    * training budget is full", the selection rule data-constrained
    * pretraining actually runs (a budget of tokens, not a fraction of
    * rows — [[selectTopByScore]]'s contract). Emits `cum_tokens` (the
    * running total through each kept row) so the caller can see how full
    * the budget ran.
    *
    * With `partitionKeys` the budget applies PER KEY — the production
    * shape, since budgets are set per domain/language by the mixture
    * (compose with [[temperatureRates]] to derive them), and each key's
    * cumsum window sorts only its own stratum. An empty `partitionKeys`
    * is the single-global-ordering oracle anchor — same posture as
    * `sample_shuffle`'s global rank: correct, but one ordered spine at
    * 100 TB; shard first, or use the threshold form below.
    *
    * No-sort alternative at extreme scale: binary-search a score
    * threshold t such that sum(tokens | score ≥ t) ≤ budget — each probe
    * is one agg over the scan ([[selectTopByScore]]'s broadcast-threshold
    * shape); the prefix is then approximate at the threshold boundary
    * rather than exact.
    */
  def selectByTokenBudget(
      df: DataFrame,
      partitionKeys: Seq[Column],
      score: Column,
      tokens: Column,
      tieBreak: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"selectByTokenBudget: budget must be positive, got $budget")
    selectByTokenBudget(df, partitionKeys, score, tokens, tieBreak, lit(budget))
  }

  /** [[selectByTokenBudget]] with a PER-ROW budget column — in practice a
    * per-key constant joined in upstream, which is how a mixture drives
    * selection: [[temperatureRates]] allocates each domain's token budget
    * (rate·mass) and this fills each budget best-first. A null or
    * non-positive budget fails loudly, like the token guard.
    */
  def selectByTokenBudget(
      df: DataFrame,
      partitionKeys: Seq[Column],
      score: Column,
      tokens: Column,
      tieBreak: Column,
      budget: Column): DataFrame = {
    // a negative token count would make the cumsum non-monotone (the kept
    // set stops being a prefix) and a null row would ride along for free —
    // both are data bugs; fail loudly like dupClusters does on bad ids
    val tok = when(tokens.isNull.or(tokens < 0),
      raise_error(concat(lit("selectByTokenBudget: tokens must be non-negative, got "),
        coalesce(tokens.cast("string"), lit("NULL")))))
      .otherwise(tokens)
    val bud = when(budget.isNull.or(budget <= 0),
      raise_error(concat(lit("selectByTokenBudget: budget must be positive, got "),
        coalesce(budget.cast("string"), lit("NULL")))))
      .otherwise(budget)
    val w = (if (partitionKeys.isEmpty) Window.orderBy(score.desc, tieBreak.asc)
             else Window.partitionBy(partitionKeys: _*).orderBy(score.desc, tieBreak.asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tok).over(w))
      .filter(col("cum_tokens") <= bud)
  }

  /** Temperature-scaled mixture rates (the multilingual/domain rebalancing
    * rule of mT5/XLM-R — sample source g with p_g ∝ n_g^(1/T) — given
    * UniMax-style downsampling-only normalization): per-source keep rate
    *
    *   rate_g = (n_min / n_g)^(1 − 1/T)
    *
    * where n_g is the source's token mass and n_min the smallest source's.
    * T = 1 keeps the natural mixture (all rates 1); T → ∞ approaches equal
    * token counts per source (rate ∝ 1/n_g); the largest sources are
    * always downsampled hardest and the smallest source is never
    * downsampled — no upsampling, so rates are valid keep probabilities.
    *
    * Emits one row per source: (group, n_tokens, rate_bp, rate), with
    * `rate_bp` the rate in integer basis points (floor(rate·10⁴)) — the
    * form [[temperatureSample]] compares against the md5 bucket, and the
    * cross-engine-exact one: for T = 2 the whole chain (int→double cast,
    * division, sqrt, ×10⁴, floor) is correctly-rounded IEEE arithmetic,
    * bit-identical on any engine. Other T go through `pow` (libm,
    * last-ulp differences possible across engines — deterministic within
    * Spark, just not an oracle-exact contract).
    *
    * Scale: one map-side-combined hash agg (|sources| rows — a bounded
    * model artifact, like a codebook) + a 1-row min agg. In a production
    * loop the rate table is computed once from corpus stats and reused
    * across runs.
    */
  def temperatureRates(
      df: DataFrame,
      group: Column,
      tokens: Column,
      temperature: Double): DataFrame = {
    require(temperature >= 1.0,
      s"temperatureRates: temperature must be >= 1 (downsampling-only), got $temperature")
    val n = df.groupBy(group.as("group")).agg(sum(tokens).as("n_tokens"))
    // n_min ranges over POSITIVE masses only: a source with zero (or null)
    // token mass has nothing to sample — it gets rate 0 below — and letting
    // it into the min would zero every other source's rate (0/n_g) and make
    // its own ratio 0/0
    val mn = n.filter(col("n_tokens") > 0).agg(min(col("n_tokens")).as("__mn"))
    val ratio = col("__mn").cast("double") / col("n_tokens").cast("double")
    val raw = if (temperature == 2.0) sqrt(ratio)
              else pow(ratio, 1.0 - 1.0 / temperature)
    n.crossJoin(broadcast(mn))
      .withColumn("rate_bp",
        when(col("n_tokens") > 0, floor(raw * 10000).cast("long")).otherwise(lit(0L)))
      .select(col("group"), col("n_tokens"), col("rate_bp"),
        (col("rate_bp") / 10000.0).as("rate"))
  }

  /** Apply [[temperatureRates]] as a deterministic per-row sample: keep a
    * row when its md5 bucket (0–9999, 32 md5 bits mod 10⁴ — negligible
    * modulo bias) falls under its source's `rate_bp`. Same
    * deterministic-not-rand() rationale as [[weightedSample]], at 10⁻⁴
    * rate resolution. Expected kept token mass per source ∝ n_g^(1/T) —
    * the temperature mixture realized.
    *
    * Plan: the tiny rate table broadcast-joins on the group key and the
    * keep decision is a per-row codegen'd filter — the corpus is scanned
    * once for stats (precomputable artifact) and once for the probe, and
    * never shuffles.
    */
  def temperatureSample(
      df: DataFrame,
      key: Column,
      group: Column,
      tokens: Column,
      temperature: Double): DataFrame = {
    val rates = temperatureRates(df, group, tokens, temperature)
      .select(col("group").as("__grp"), col("rate_bp").as("__rate_bp"))
    df.join(broadcast(rates), group === col("__grp"))
      .filter(md5Bucket10k(key) < col("__rate_bp"))
      .drop("__grp", "__rate_bp")
  }

  /** 0–9999: the basis-point-rate form ([[temperatureSample]]). */
  private def md5Bucket10k(key: Column): Column = md5Bucket(key, 8, 10000)

  /** Cluster-balanced selection: cap the kept documents per SEMANTIC
    * CLUSTER (k-means over an embedding column) instead of per metadata
    * domain — the diversity-preserving downsampling a pretraining mix
    * runs when one topic dominates the crawl (the cluster-quota shape of
    * SemDeDup-style pipelines; [[capPerKey]] with a learned key). Within
    * each cluster the keepers are the top `maxPerCluster` by
    * (`scoreCol` desc, id asc) — highest-quality representatives, ties
    * deterministic.
    *
    * Returns `docs`' columns plus the `cell` assignment. Clustering
    * reuses [[Similarity.kmeansCells]] (deterministic md5 seeds,
    * broadcast-codebook map-side argmin assignment); `nlist <= 0` sizes
    * the cell count by expected occupancy ([[Similarity.autoCells]] — one
    * column-less count at plan time, the documented auto-sizing
    * carve-out from build-time laziness). The per-cluster cut is
    * [[capPerKey]]: with `saltBuckets > 1` a hot cluster pre-caps in
    * (cell, salt) slices so no single task sorts a mega-cluster.
    *
    * SCALE NOTE — the right nlist policy is the OPPOSITE of SemDeDup's:
    * flat k-means assignment costs n·nlist, so occupancy-pinned auto
    * cells (nlist ∝ n) make the assignment n²/occupancy. SemDeDup pays
    * that to LINEARIZE its in-cell pair stage (Σ|cell|², the dominant
    * term); a cluster quota has NO pair stage, so a FIXED nlist — the
    * paper-style "50k clusters at web scale" — keeps the whole operator
    * linear in n, and `trainSample > 0` drops the per-iteration
    * distributed Lloyd jobs for a driver fit over a bounded
    * md5-deterministic sample + one codegen'd broadcast-codebook
    * assignment scan (the production shape; measured: auto cells were
    * 4.0× at 10× data, fixed-nlist sampled-fit re-measured linear).
    * `nlist <= 0` auto sizing remains for moderate-n diversity parity
    * with [[Dedup.semanticDedup]].
    *
    * With `nlist = 1` every document lands in one cell and this IS the
    * global top-`maxPerCluster` cut — the exact-regime anchor the spec
    * pins, the same pattern as IVF's full-probe ≡ brute-force gate.
    */
  def selectClusterBalanced(
      docs: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      scoreCol: String,
      nlist: Int,
      maxPerCluster: Int,
      iters: Int = 2,
      targetOccupancy: Int = 250,
      saltBuckets: Int = 1,
      trainSample: Int = 0): DataFrame = {
    val effNlist =
      if (nlist > 0) nlist
      else Similarity.autoCells(emb.count(), targetOccupancy)
    val cells = Similarity.kmeansCells(emb, idCol, vecCol, effNlist, iters, trainSample)
    val assigned = docs.join(cells.select(col(idCol), col("cell")), Seq(idCol))
    capPerKey(assigned, col("cell"),
      Seq(col(scoreCol).desc, col(idCol).asc), maxPerCluster,
      col(idCol), saltBuckets)
  }

  /** Per-key quota cap: keep at most `maxPerKey` rows per `key`, choosing
    * the FIRST `maxPerKey` under `order` — the domain-frequency cap of
    * web-crawl curation ("no domain contributes more than N documents"),
    * the counterpart of rate-based downsampling ([[temperatureSample]])
    * when the policy is an absolute ceiling rather than a proportion.
    *
    * `order` must be a TOTAL order (end it with a unique id) — that is
    * what makes the kept set deterministic AND what makes the salted
    * two-phase plan below exactly equivalent to the direct window.
    *
    * Scale shape: the textbook `row_number ≤ N` window puts each key's
    * whole row set on one reducer — a 10%-of-corpus hot domain becomes a
    * single-task sort. With `saltBuckets > 1` the cap runs in two phases:
    * phase 1 caps at `maxPerKey` within (key, salt) — salt is a
    * deterministic md5 bucket of the tie-break id, so the shuffle spreads
    * a hot key over `saltBuckets` reducers and each emits ≤ maxPerKey
    * rows; phase 2 re-caps the ≤ saltBuckets·maxPerKey survivors per key.
    * Because `order` is total, "top-N of the per-salt top-Ns" IS the
    * global top-N — the two plans return identical rows, asserted in
    * ScalaTest. Phase 2's input is bounded by keys·salt·N, so the hot-key
    * sort everyone fears never materializes.
    */
  def capPerKey(
      df: DataFrame,
      key: Column,
      order: Seq[Column],
      maxPerKey: Int,
      tieBreakId: Column,
      saltBuckets: Int = 1): DataFrame = {
    require(maxPerKey > 0, s"capPerKey: maxPerKey must be positive, got $maxPerKey")
    require(order.nonEmpty, "capPerKey: order must be non-empty (and total)")
    require(saltBuckets >= 1, s"capPerKey: saltBuckets must be >= 1, got $saltBuckets")
    val capped =
      if (saltBuckets == 1) df
      else {
        val salt = md5Bucket(tieBreakId, 4, saltBuckets)
        val w1 = Window.partitionBy(key, salt).orderBy(order: _*)
        df.withColumn("__rk1", row_number().over(w1))
          .filter(col("__rk1") <= maxPerKey)
          .drop("__rk1")
      }
    val w = Window.partitionBy(key).orderBy(order: _*)
    capped.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerKey)
      .drop("__rk")
  }
}
