package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass corpus/column profiler — the "what is actually in this table"
  * census a pipeline runs before trusting a new data drop: per column, row
  * count, null count, distinct count, and numeric min/max.
  *
  * Everything is computed in a SINGLE aggregate over ONE scan of the
  * table (map-side combined), then pivoted to one row per column with an
  * `inline` — profiling k columns never rescans the table k times.
  *
  * `exact = true` uses `countDistinct`, which Catalyst plans via Expand:
  * the scan's rows are replicated once per distinct-aggregated column
  * before the partial agg — exact, and the oracle anchor, but the k×
  * row-multiplication is real at corpus scale. `exact = false` swaps in
  * `approx_count_distinct` (HLL++, one mergeable sketch per column, no
  * Expand) — the 100 TB shape, identical output schema.
  *
  * Output: `col_name`, `n_rows`, `n_nulls`, `n_distinct`, `min_num`,
  * `max_num` (the latter two NULL for non-numeric columns; numerics are
  * cast to double — min/max carry parquet values through unchanged, no
  * arithmetic, so the cast is the only representation step).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: cols must be non-empty")
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c")) ++
      (if (isNum(c))
         Seq(min(col(c)).cast("double").as(s"__mn_$c"),
           max(col(c)).cast("double").as(s"__mx_$c"))
       else
         Seq(lit(null).cast("double").as(s"__mn_$c"),
           lit(null).cast("double").as(s"__mx_$c")))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"),
        col(s"__mx_$c").as("max_num"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
