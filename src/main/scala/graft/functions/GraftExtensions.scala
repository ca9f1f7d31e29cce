package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's native expressions, injected via
  * `SparkSessionExtensions` so SQL users (and thrift/connect clients) get
  * the same codegen'd kernels as the DataFrame API:
  *
  *   spark.sql("SELECT graft_dot(a, b)")            -- DotProduct
  *   spark.sql("SELECT graft_shingles(tokens, 3)")  -- Shingles
  *   spark.sql("SELECT graft_minhash(sh, 128)")     -- MinHashSig
  *   spark.sql("SELECT graft_simhash(sh)")          -- SimHash64
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`, or
  * call [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  // usage strings surface via DESCRIBE FUNCTION — preconditions SQL callers
  // can't read from scaladoc (notably graft_intersect_count's sorted input)
  // must be stated here
  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  private[functions] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info(classOf[DotProduct], "graft_dot",
        "_FUNC_(a, b) - Dot product of two equal-length DOUBLE arrays."),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_shingles",
      info(classOf[Shingles], "graft_shingles",
        "_FUNC_(tokens, n) - Distinct n-grams (space-joined) of a STRING array; n must be an integer literal."),
      (args: Seq[Expression]) => Shingles(args(0), intLit(args(1), "shingle size"))),
    ("graft_minhash",
      info(classOf[MinHashSig], "graft_minhash",
        "_FUNC_(shingles, k) - MinHash signature (k BIGINT minima) of a STRING array; k must be an integer literal."),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "numHashes"))),
    ("graft_simhash",
      info(classOf[SimHash64], "graft_simhash",
        "_FUNC_(shingles) - 64-bit SimHash of a STRING array."),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("graft_intersect_count",
      info(classOf[IntersectCountSorted], "graft_intersect_count",
        "_FUNC_(a, b) - Count of common elements of two BIGINT arrays. " +
          "PRECONDITION: both arrays must be sorted ascending with no duplicates " +
          "(e.g. sort_array over distinct hashes); unsorted or duplicated input " +
          "yields undefined counts, not an error."),
      (args: Seq[Expression]) => IntersectCountSorted(args(0), args(1))),
    ("graft_ngrams",
      info(classOf[Shingles], "graft_ngrams",
        "_FUNC_(tokens, n) - ALL n-grams (occurrence multiset, document order, " +
          "space-joined) of a STRING array; n must be an integer literal."),
      (args: Seq[Expression]) => Shingles(args(0), intLit(args(1), "ngram size"), distinct = false)),
    ("graft_vector_avg",
      info(classOf[VectorAvg], "graft_vector_avg",
        "_FUNC_(vec) - Aggregate: element-wise mean of DOUBLE arrays " +
          "(null vectors ignored; mismatched lengths raise)."),
      (args: Seq[Expression]) => VectorAvg(args(0))),
    ("graft_topk",
      info(classOf[TopKPairs], "graft_topk",
        "_FUNC_(score, id, k) - Aggregate: the k best (id BIGINT, score DOUBLE) " +
          "pairs per group as array<struct<id,score>>, ordered (score DESC, id ASC); " +
          "k must be an integer literal. Null scores/ids are ignored."),
      (args: Seq[Expression]) => TopKPairs(args(0), args(1), intLit(args(2), "k"))),
    ("graft_freq_items",
      info(classOf[FrequentItems], "graft_freq_items",
        "_FUNC_(item, k, outK) - Aggregate: Misra-Gries heavy hitters over STRING " +
          "items — k counters kept (est_count undercounts by at most n/(k+1), never " +
          "overcounts), top outK reported as array<struct<item,est_count>> ordered " +
          "(est_count DESC, item ASC); k and outK must be integer literals. " +
          "Null items are ignored."),
      (args: Seq[Expression]) => FrequentItems(args(0), intLit(args(1), "k"), intLit(args(2), "outK"))),
    ("graft_normalize",
      info(classOf[UnicodeNormalize], "graft_normalize",
        "_FUNC_(text, form) - Unicode-normalize a string; form must be a string " +
          "literal, one of 'NFC', 'NFD', 'NFKC', 'NFKD'."),
      (args: Seq[Expression]) => UnicodeNormalize(args(0), strLit(args(1), "normal form"))))

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  /** Register the functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
