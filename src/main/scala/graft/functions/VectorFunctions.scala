package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `ArrayType` columns built from Spark's higher-order
  * functions (`zip_with`/`aggregate`/`transform`) — these are Catalyst
  * expressions, stay inside whole-stage codegen, and need no UDF or
  * serialization, unlike `udf((a, b) => ...)`.
  *
  * The fold order of `aggregate` is the list order, so results are
  * deterministic and match a sequential reference implementation (DuckDB's
  * list_cosine_similarity) to ~1e-16.
  */
object VectorFunctions {

  /** Cast array<float> (parquet `list<float>`) to array<double> for stable math. */
  def toDoubleArray(c: Column): Column = transform(c, _.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). Inputs must be non-zero. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
