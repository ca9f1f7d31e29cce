package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the oracle target). Scale
  * path: random-hyperplane LSH bucketing with multiprobe — candidates come
  * from a hash-partitioned bucket join, so the cross product never
  * materializes. Hyperplanes are generated from a seeded RNG at PLAN time
  * (deterministic literals in the plan; nothing random at execution).
  */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
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
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qvec"), col("cvec")))
    topKScored(scored, k)
  }

  /** Per-query top-k with a map-side pre-prune: rank within each (query,
    * input partition) first — cheap, no shuffle — keep local top-k, THEN
    * shuffle only ≤ k rows per (query, partition) for the global rank.
    * Equivalent result, ~k×partitions rows shuffled instead of the corpus.
    */
  private[operators] def topKScored(scored: DataFrame, k: Int): DataFrame = {
    val localW = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    val globalW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("local_rank", row_number().over(localW))
      .filter(col("local_rank") <= k)
      .withColumn("rank", row_number().over(globalW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 4).as("cos_sim"), col("rank"))
  }

  /** LSH-bucketed ANN top-k with multiprobe: a query probes its own bucket
    * plus every bucket at Hamming distance 1 (flip each plane bit). The join
    * is hash-partitioned on bucket id — linear scale-out. Recall < 1.0 by
    * construction; verified against brute force in tests.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val dim = 64
    val planes = randomPlanes(numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("cvec"))
      .withColumn("bucket", hyperplaneSignature(col("cvec"), planes))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("bucket0", hyperplaneSignature(col("qvec"), planes))
    // multiprobe: own bucket + flip each of the numPlanes bits
    val probes = q.select(col("query_id"), col("qvec"),
      explode(concat(array(col("bucket0")),
        (0 until numPlanes).map(i => array(col("bucket0").bitwiseXOR(lit(1L << i))))
          .reduce(concat(_, _)))).as("bucket"))
    val scored = probes.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qvec"), col("cvec")))
    topKScored(scored, k)
  }
}
