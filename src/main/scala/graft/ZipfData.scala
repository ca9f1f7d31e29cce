package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Natural-Zipf corpus generator: the scale fixture the TF-IDF cosine
  * family needs and the testdata corpus cannot provide. The driver's
  * synthetic `documents` table has a ~30-word vocabulary, which makes
  * EVERY term a corpus-wide heavy hitter (df ≈ N) — the regime where no
  * exact index prune can win because most pairs genuinely share most
  * terms (SCALE.md records the measured negative result for Bayardo
  * prefix pruning there). Real web text is the opposite shape: a Zipf
  * head of a few ubiquitous terms and a long rare tail that carries all
  * the discriminative tf-idf weight. This generator produces that shape
  * deterministically so `Dedup.tfidfCosinePairsPrefix` (Bayardo, Ma &
  * Srikant, WWW 2007) can be MEASURED on the corpus class it was built
  * for — the unblocked path a real crawl needs, where no (lang, source)
  * blocking crutch exists (`lang` is constant here on purpose).
  *
  * Construction (all pure codegen'd expressions, no execution-time RNG —
  * xxhash64 streams replace the generator's dice, so output is
  * bit-reproducible at any parallelism):
  *
  *   - Term ranks are drawn from the continuous Zipf(s=1) inverse CDF:
  *     u ~ U(0,1) → rank = floor((V+1)^u), giving
  *     P(rank = k) = ln(1 + 1/k) / ln(V+1) ≈ (1/k)/ln(V+1) — the head
  *     term lands in essentially every document, mid ranks in a
  *     constant fraction, the tail in O(1) documents each.
  *   - Vocabulary GROWS with the corpus (V = 15·nDocs by default): new
  *     documents bring new rare types, the same new-content assumption
  *     the ScaleData Caesar replicas encode (type space linear, tail
  *     per-type frequency flat, head frequency ∝ N). A FIXED vocabulary
  *     would make tail dfs grow ∝ N and re-manufacture the dense
  *     pathology at scale instead of modeling a crawl.
  *   - Near-duplicate plant: doc_id ≡ 5 (mod 17), doc_id ≥ 17 is a copy
  *     of doc_id−13 (≡ 9 mod 17, never itself a dup) with ~5% of token
  *     positions resampled — weighted cosine ≈ 0.9+ against its base,
  *     while unplanted pairs share only near-zero-idf head terms. The
  *     pair query at threshold 0.8 has real work to find.
  *   - Document length 60–179 tokens, hash-chosen per doc.
  *
  * Usage: runMain graft.ZipfData <destDir> <nDocs> [vocab]
  * Writes <destDir>/documents.parquet with the testdata documents schema
  * (doc_id BIGINT, text, lang, source, n_chars BIGINT).
  */
object ZipfData {

  /** The corpus as a plan (pure expressions — bit-reproducible at any
    * parallelism; main() writes it, specs assert on it directly).
    */
  def corpus(spark: SparkSession, nDocs: Long, vocabOpt: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val vocab: Long = vocabOpt.getOrElse(15L * nDocs)
    require(nDocs > 17 && vocab > 1, "need nDocs > 17 (dup plant) and vocab > 1")
    // u in (0, 1): 30 hash bits, offset half a step so u is never 0
    def u(cols: Column*): Column =
      (pmod(xxhash64(cols: _*), lit(1L << 30)).cast("double") + 0.5) / (1L << 30).toDouble
    // inverse CDF of continuous Zipf(s=1) over [1, vocab]
    def rank(uu: Column): Column =
      least(lit(vocab), floor(pow(lit(vocab + 1.0), uu)).cast("long"))

    val isDup = col("doc_id") % 17 === 5 && col("doc_id") >= 17
    spark.range(0, nDocs, 1, 32).select(col("id").as("doc_id"))
      .withColumn("__seed", when(isDup, col("doc_id") - 13).otherwise(col("doc_id")))
      .withColumn("__len", (lit(60) + pmod(xxhash64(lit("len"), col("__seed")), lit(120))).cast("int"))
      .withColumn("__toks", transform(sequence(lit(0), col("__len") - 1), p => {
        val mutate = isDup && pmod(xxhash64(lit("mut"), col("doc_id"), p), lit(20)) === 0
        concat(lit("t"), when(mutate, rank(u(lit("mutv"), col("doc_id"), p)))
          .otherwise(rank(u(lit("tok"), col("__seed"), p))))
      }))
      .withColumn("text", concat_ws(" ", col("__toks")))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        element_at(array(lit("web"), lit("news"), lit("wiki"), lit("forum")),
          (pmod(xxhash64(lit("src"), col("doc_id")), lit(4)) + 1).cast("int")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ZipfData <destDir> <nDocs> [vocab]")
    val dest = args(0)
    val nDocs = args(1).toLong
    val vocab: Option[Long] = if (args.length > 2) Some(args(2).toLong) else None

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    corpus(spark, nDocs, vocab)
      .repartition(32).write.mode("overwrite").parquet(s"$dest/documents.parquet")
    println(s"[zipfdata] $dest/documents.parquet written: nDocs=$nDocs " +
      s"vocab=${vocab.getOrElse(15L * nDocs)}")
    spark.stop()
  }
}
