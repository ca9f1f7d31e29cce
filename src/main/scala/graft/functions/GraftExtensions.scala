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

  private[functions] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_shingles",
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => Shingles(args(0), intLit(args(1), "shingle size"))),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "numHashes"))),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("graft_intersect_count",
      new ExpressionInfo(classOf[IntersectCountSorted].getName, "graft_intersect_count"),
      (args: Seq[Expression]) => IntersectCountSorted(args(0), args(1))))

  /** Register the functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
