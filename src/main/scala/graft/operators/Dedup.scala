package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every near-dup algorithm here is CANDIDATE GENERATION via a
  * bucketable key (LSH band / simhash block / blocking key) followed by
  * exact verification WITHIN buckets. The only shuffles are hash-partitioned
  * joins on the bucket keys — never an all-pairs cross join — so cost is
  * O(n · bucket_size), not O(n²), and survives a 1000-executor scale-up.
  * All hashing is xxhash64 (Catalyst expression, codegen'd, deterministic
  * across runs/executors — no RNG at execution time).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per key (deterministic winner, unlike
    * dropDuplicates which keeps an arbitrary row). One hash-agg shuffle.
    */
  def exactByKey(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(idCol).as(idCol.toString))

  /** MinHash signature: array of `numHashes` minima of per-shingle hashes,
    * sig[k] = min over shingles s of xxhash64(k, s).
    *
    * Structured as ONE fold over the shingle array maintaining all K minima
    * (not K folds each re-walking shingles): a higher-order function
    * evaluates its ARGUMENT once per row but its lambda body once per
    * element — nesting the shingle expression inside a per-k lambda
    * re-tokenizes the document K times (measured 100× slowdown).
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    aggregate(
      sh,
      transform(sequence(lit(0), lit(numHashes - 1)), _ => lit(Long.MaxValue)),
      (acc, s) =>
        zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
          (m, k) => least(m, xxhash64(k, s))))

  /** LSH banding: `bands` hashes, each chaining `rowsPerBand` signature
    * entries. Two docs sharing any band hash become a candidate pair.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b =>
        struct(
          b.as("band"),
          aggregate(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), lit(0L),
            (acc, x) => xxhash64(acc, x)).as("bucket")))

  /** MinHash+LSH near-dup pairs with exact Jaccard verification.
    *
    * Pipeline: shingle → signature → explode band buckets → self-join on
    * (band, bucket) → distinct candidate pairs → exact Jaccard on distinct
    * shingle sets → filter ≥ threshold.
    *
    * With numHashes=128, bands=32 (r=4), P(candidate) at J=0.5 is
    * 1-(1-0.5⁴)³² ≈ 0.87, at J=0.8 ≈ 1.0 — standard near-dup tuning.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df
      .select(col(idCol).as("doc_id"),
        TextAnalysis.shingles(col(textCol), shingleSize).as("sh"))
      .select(col("doc_id"), col("sh"), minhashSignature(col("sh"), numHashes).as("sig"))
    val buckets = sig
      .select(col("doc_id"), explode(bandHashes(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    val candidates = buckets.as("l")
      .join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val withSets = candidates
      .join(sig.select(col("doc_id"), col("sh").as("sh_a")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sig.select(col("doc_id"), col("sh").as("sh_b")), col("doc_b") === col("doc_id")).drop("doc_id")
    withSets
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over shingles: bit j is set iff the sum over shingles of
    * ±1 (sign of hash bit j) is non-negative.
    */
  def simhash64(text: Column, shingleSize: Int = 3): Column =
    simhashFromHashes(transform(TextAnalysis.shingles(text, shingleSize), s => xxhash64(s)))

  /** One fold over the hash array maintaining all 64 bit-votes (see
    * [[minhashSignature]] for why the loop nesting matters).
    */
  def simhashFromHashes(hashes: Column): Column = {
    val votes = aggregate(
      hashes,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(63)),
          (v, j) => v + when(call_function("shiftright", h, j)
            .bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v >= 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-dup candidates: split the 64-bit hash into 4 16-bit
    * blocks; by pigeonhole, any pair with Hamming distance ≤ 3 shares at
    * least one intact block → bucket-join on (block_idx, block_value),
    * then exact Hamming verification.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sh64"))
    val blocks = hashed.select(
      col("doc_id"), col("sh64"),
      explode(
        transform(sequence(lit(0), lit(3)),
          b => struct(b.as("blk"),
            call_function("shiftright", col("sh64"), b * 16)
              .bitwiseAND(0xFFFFL).as("v")))).as("b"))
      .select(col("doc_id"), col("sh64"), col("b.blk").as("blk"), col("b.v").as("v"))
    blocks.as("l")
      .join(blocks.as("r"),
        col("l.blk") === col("r.blk") && col("l.v") === col("r.v") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.sh64").bitwiseXOR(col("r.sh64"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard within blocking groups (same lang/source/size
    * bucket). The blocking key bounds the quadratic term; oracle-able in SQL.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockingKeys: Seq[Column],
      shingleSize: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val base = df.select(
      col(idCol).as("doc_id") +:
        TextAnalysis.shingles(col(textCol), shingleSize).as("sh") +:
        blockingKeys: _*)
    val keyNames = blockingKeys.map(_.toString)
    base.as("l")
      .join(base.as("r"),
        keyNames.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
          col("l.doc_id") < col("r.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("l.sh"), col("r.sh"))).cast("double") /
          size(array_union(col("l.sh"), col("r.sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact all-pairs embedding near-dup (cosine ≥ threshold). Quadratic —
    * correctness reference and oracle target only; the scale path is
    * [[embeddingNearDupLSH]].
    */
  def embeddingNearDupExact(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = emb.select(col(idCol).as("vid"), toDoubleArray(col(vecCol)).as("vec"))
      .withColumn("nrm", l2Norm(col("vec")))
    v.as("l").join(v.as("r"), col("l.vid") < col("r.vid"))
      .withColumn("cos_sim", dot(col("l.vec"), col("r.vec")) / (col("l.nrm") * col("r.nrm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("l.vid").as("vec_a"), col("r.vid").as("vec_b"),
        round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Random-hyperplane LSH near-dup: bucket by sign-pattern of `planes`
    * projections, verify exact cosine within buckets. Linear + bucket joins.
    */
  def embeddingNearDupLSH(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Seq[Seq[Double]]): DataFrame = {
    val v = emb.select(col(idCol).as("vid"), toDoubleArray(col(vecCol)).as("vec"))
      .withColumn("nrm", l2Norm(col("vec")))
    val sigCol = Similarity.hyperplaneSignature(col("vec"), planes)
    val bucketed = v.withColumn("bucket", sigCol)
    bucketed.as("l").join(bucketed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vid") < col("r.vid"))
      .withColumn("cos_sim", dot(col("l.vec"), col("r.vec")) / (col("l.nrm") * col("r.nrm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("l.vid").as("vec_a"), col("r.vid").as("vec_b"),
        round(col("cos_sim"), 4).as("cos_sim"))
  }
}
