package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as single calls, composed scalably. */
object Relational {

  /** As-of join, "last event of `matchType` at or before each row", within
    * a key. NOT implemented as a range join (quadratic blow-up on hot keys);
    * instead a single partition-by-key sort carries the last matching id
    * forward — one shuffle on the key, linear work, no state explosion.
    */
  def lastMatchAsOf(
      events: DataFrame,
      keyCol: Column,
      orderCol: Column,
      isMatch: Column,
      carryCol: Column,
      outName: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn(outName,
      last(when(isMatch, carryCol), ignoreNulls = true).over(w))
  }

  /** Range (interval) join of facts against a small set of ranges — the
    * ranges side is broadcast so the theta-join is a single pass over the
    * facts (BroadcastNestedLoopJoin), no shuffle of the big side.
    */
  def rangeJoin(facts: DataFrame, ranges: DataFrame, value: Column, lo: Column, hi: Column): DataFrame =
    facts.join(broadcast(ranges), value >= lo && value < hi)
}
