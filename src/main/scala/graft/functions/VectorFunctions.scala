package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `ArrayType` columns. The dot product — the hot
  * primitive — is a native codegen'd Catalyst expression
  * ([[DotProduct]]); the rest composes it. No UDFs, no serialization.
  *
  * Loop order is ascending-index in both the native expression and the HOF
  * fallback, so results are deterministic and match a sequential reference
  * implementation (DuckDB's list_cosine_similarity) to ~1e-16.
  */
object VectorFunctions {

  /** Cast array<float> (parquet `list<float>`) to array<double> for stable math. */
  def toDoubleArray(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Native codegen'd dot product (inputs must be array<double>). */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  /** HOF formulation, kept as a cross-check for the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a| * |b|). Inputs must be non-zero. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
