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
      (args: Seq[Expression]) => UnicodeNormalize(args(0), strLit(args(1), "normal form"))),
    // URL parsing surface — the registry needs REAL catalyst trees (a
    // functions-API Column wraps unresolved column nodes that never
    // re-analyze inside a registered-function expansion), so these mirror
    // Web.host / Web.registeredDomain with the catalyst classes directly.
    // canonicalizeUrl stays Column-API-only: its higher-order array
    // lambdas cannot be re-bound through this path at all.
    ("graft_jaro_winkler",
      info(JaroWinkler.getClass, "graft_jaro_winkler",
        "_FUNC_(a, b) - Jaro-Winkler similarity in [0,1] (prefix scale 0.1 " +
          "capped at 4, boost only above jaro 0.7; either side empty returns 0)."),
      (args: Seq[Expression]) => JaroWinkler.JaroWinklerExpr(args(0), args(1))),
    ("graft_damerau_levenshtein",
      info(DamerauLevenshtein.getClass, "graft_damerau_levenshtein",
        "_FUNC_(a, b) - Unrestricted (Lowrance-Wagner) Damerau-Levenshtein edit " +
          "distance: adjacent transposition costs 1; matches DuckDB's full variant."),
      (args: Seq[Expression]) =>
        DamerauLevenshtein.DamerauLevenshteinExpr(args(0), args(1))),
    ("graft_url_host",
      info(graft.operators.Web.getClass, "graft_url_host",
        "_FUNC_(url) - Lower-cased host of an absolute URL (port excluded); NULL when unparseable."),
      (args: Seq[Expression]) => urlHostExpr(args(0))),
    ("graft_reg_domain",
      info(graft.operators.Web.getClass, "graft_reg_domain",
        "_FUNC_(host) - Registered domain (eTLD+1) of a lower-cased host; multi-part " +
          "public suffixes (co.uk style) keep three labels."),
      (args: Seq[Expression]) => regDomainExpr(args(0))))

  /** Catalyst mirror of [[graft.operators.Web.host]]. */
  private def urlHostExpr(url: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, NullIf, RegExpExtract}
    Lower(new NullIf(
      RegExpExtract(url, Literal(graft.operators.Web.UrlPattern), Literal(2)),
      Literal("")))
  }

  /** Catalyst mirror of [[graft.operators.Web.registeredDomain]]. */
  private def regDomainExpr(h: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{And, CaseWhen, EqualTo, In, Literal, Not, RegExpExtract}
    def ext(p: String) = RegExpExtract(h, Literal(p), Literal(1))
    val last2 = ext("([^.]+\\.[^.]+)$")
    val last3 = ext("([^.]+\\.[^.]+\\.[^.]+)$")
    val sfx2 = ext("[^.]+\\.([^.]+\\.[^.]+)$")
    CaseWhen(Seq(
      (EqualTo(last2, Literal("")), h),
      (And(
        In(sfx2, graft.operators.Web.MultiPartSuffixes.map(s => Literal(s): Expression)),
        Not(EqualTo(last3, Literal("")))), last3)),
      Some(last2))
  }

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
