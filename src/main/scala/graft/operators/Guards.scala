package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{assert_true, broadcast, lit}

/** In-plan contract guards.
  *
  * An operator whose correctness rests on a data contract (a sketch's
  * exact regime, a bounded grid) should FAIL LOUDLY in the same plan that
  * violates it, not silently return estimates that diverge from an exact
  * oracle. The guard idiom: aggregate the contract quantity to ONE row,
  * broadcast-cross it onto the result, and filter on
  * `assert_true(cond, msg).isNull` — `assert_true` is NULL while the
  * contract holds (the filter keeps every row) and raises otherwise.
  * Riding the plan as a FILTER is what makes the guard never-prunable:
  * column pruning would happily elide an unused guard column, but a
  * filter predicate always executes. The 1-row cross is an
  * IdentityBroadcastMode broadcast — free at any scale.
  */
object Guards {

  /** Attach a loud in-plan assertion to `result`.
    *
    * @param result the operator output to gate
    * @param guard  a ONE-ROW aggregate carrying the contract quantities
    *               referenced by `cond` (its columns are dropped from the
    *               output after the check, so name them `__`-prefixed to
    *               avoid colliding with result columns)
    * @param cond   the contract: rows pass while it holds
    * @param msg    the error surfaced when the contract is violated
    */
  def inPlanAssert(
      result: DataFrame,
      guard: DataFrame,
      cond: Column,
      msg: String): DataFrame =
    inPlanAssert(result, guard, cond, lit(msg))

  /** [[inPlanAssert]] with a COLUMN message — for guards whose error
    * should carry the observed contract quantity (build it with `concat`
    * over the guard columns; it only evaluates on violation).
    */
  def inPlanAssert(
      result: DataFrame,
      guard: DataFrame,
      cond: Column,
      msg: Column): DataFrame = {
    val guardCols = guard.columns.toSeq
    result.crossJoin(broadcast(guard))
      .filter(assert_true(cond, msg).isNull)
      .drop(guardCols: _*)
  }
}
