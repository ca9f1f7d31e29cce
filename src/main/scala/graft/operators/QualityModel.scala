package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier step of the GPT-3 §A.2 /
  * LLaMA / CCNet data pipelines (public methods): train a classifier to
  * distinguish REFERENCE text (a curated corpus: wiki, books) from raw
  * crawl, then keep documents the model scores reference-like. This is the
  * learned complement of the heuristic gates ([[TextAnalysis.gopherRules]],
  * [[TextAnalysis.withQuality]]): heuristics catch structural garbage,
  * the classifier catches fluent-but-off-domain text.
  *
  * Features are a hashed bag of words (fasttext-style): token →
  * `pmod(hash(token), numFeatures)` with Spark SQL's `hash()` (murmur3,
  * seed 42) on BOTH the train and serve paths, so they can never skew.
  * (spark.ml's `HashingTF` hashes with a different murmur byte-walk than
  * the SQL `hash()` expression — measured to disagree — so the labeled
  * sample's vectors are assembled from SQL-hashed buckets instead of
  * `HashingTF`; the assembly UDF touches only the bounded training
  * sample, never the corpus.)
  *
  * Scale design, in two halves:
  *  - TRAIN ([[trainQualityClassifier]]): spark.ml logistic regression —
  *    each L-BFGS iteration is one treeAggregate over the labeled set
  *    (distributed, partial-aggregated, no driver data funnel); labeled
  *    sets are corpus SAMPLES, not the corpus. The model that comes out
  *    is a bounded artifact: `numFeatures` doubles + an intercept, the
  *    same class of thing as a PQ codebook.
  *  - SCORE ([[scoreQuality]]): the weight vector rides ONE broadcast
  *    1-row DataFrame; the logit is a codegen'd `aggregate` over the
  *    token array (`element_at` into the broadcast array at
  *    `pmod(hash(token), numFeatures)`) — a pure per-row projection over
  *    the corpus scan, no UDF, no shuffle, nothing model-sized in the
  *    plan text (a `typedlit` of the weights would inline 10⁵ doubles
  *    into the plan — the plan-size hotspot class).
  *
  * Native-vs-ml equivalence (same hash, same arithmetic) is spec-asserted
  * to 1e-6 against `model.transform`.
  */
object QualityModel {

  /** The trained artifact: hashed-BOW weights + intercept. */
  final case class QualityLR(weights: Array[Double], intercept: Double) {
    def numFeatures: Int = weights.length
  }

  /** Deterministic synthetic-negative generator: every token maps to an
    * x-prefixed hex word (disjoint vocabulary, same document shape). The
    * ONE definition of the negative class the registered query and its
    * specs all share — a pipeline with a real raw-crawl sample should use
    * that instead.
    */
  def syntheticNoise(text: Column): Column =
    array_join(transform(TextAnalysis.wsTokens(text),
      t => concat(lit("x"), substring(md5(t), 1, 6))), " ")

  /** Train P(reference-like | hashed BOW) on positives (curated/reference
    * docs) vs negatives (raw corpus sample). Tokenization is
    * [[TextAnalysis.wsTokens]] — the same split the native scorer applies,
    * so train and serve can never skew. Returns the bounded model artifact.
    */
  def trainQualityClassifier(
      positives: DataFrame,
      negatives: DataFrame,
      textCol: String,
      numFeatures: Int = 1 << 16,
      maxIter: Int = 20,
      regParam: Double = 0.01): QualityLR = {
    require(numFeatures > 0, "trainQualityClassifier: numFeatures must be positive")
    val labeled = positives.select(TextAnalysis.wsTokens(col(textCol)).as("toks"),
        lit(1.0).as("label"))
      .unionByName(negatives.select(TextAnalysis.wsTokens(col(textCol)).as("toks"),
        lit(0.0).as("label")))
    // buckets via SQL hash() — identical to the serve path by construction
    val bucketed = labeled.withColumn("__buckets",
      transform(col("toks"), t => pmod(hash(t), lit(numFeatures)).cast("int")))
    val toVec = udf((buckets: Seq[Int]) => {
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      buckets.foreach(b => m.update(b, m.getOrElse(b, 0.0) + 1.0))
      Vectors.sparse(numFeatures, m.toSeq.sortBy(_._1))
    })
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("label").setFeaturesCol("features")
    val model = lr.fit(bucketed.withColumn("features", toVec(col("__buckets"))))
    QualityLR(model.coefficients.toArray, model.intercept)
  }

  /** Score every row with the trained model, natively: adds
    * `quality_logit` and `quality_prob` (= sigmoid(logit), rounded to
    * 10⁻⁴ — the resolution the other scoring operators emit). The weight
    * array joins as a broadcast 1-row DataFrame and the per-token lookup
    * is `element_at(w, pmod(hash(token), numFeatures) + 1)` — hash() IS
    * HashingTF's murmur3-seed-42 term hash, so this computes exactly the
    * ml pipeline's logit without a Vector UDT or predict UDF anywhere
    * near the corpus scan.
    */
  def scoreQuality(df: DataFrame, textCol: String, model: QualityLR): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = Seq(Tuple1(model.weights.toSeq)).toDF("__w")
    val n = lit(model.numFeatures)
    val logit = aggregate(
      TextAnalysis.wsTokens(col(textCol)),
      lit(model.intercept),
      (acc, t) => acc + element_at(col("__w"), (pmod(hash(t), n) + 1).cast("int")))
    df.crossJoin(broadcast(wDf))
      .withColumn("quality_logit", logit)
      .withColumn("quality_prob",
        round(lit(1.0) / (lit(1.0) + exp(-col("quality_logit"))), 4))
      .drop("__w")
  }

  /** Train-and-filter composition: keep rows scoring at least
    * `minProb` — the one-call form of the pipeline step. The Pareto
    * sampling GPT-3 applies on top (keep with probability f(score)) is
    * [[Pipeline.weightedSample]] on the bucketed score.
    */
  def classifierFilter(
      df: DataFrame,
      textCol: String,
      positives: DataFrame,
      negatives: DataFrame,
      minProb: Double,
      numFeatures: Int = 1 << 16,
      maxIter: Int = 20): DataFrame = {
    val model = trainQualityClassifier(positives, negatives, textCol, numFeatures, maxIter)
    scoreQuality(df, textCol, model).filter(col("quality_prob") >= minProb)
  }
}
