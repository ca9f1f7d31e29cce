package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd expression — the
  * record-linkage verifier for TYPO-class noise (Winkler 1990; the
  * U.S. Census Bureau's string comparator). Complements the banded
  * levenshtein in [[graft.operators.Linkage]]: edit distance counts
  * operations, Jaro-Winkler rewards shared prefixes and tolerates
  * transpositions, which is what human-keyed name fields actually
  * exhibit. Spark has levenshtein built in but no Jaro-Winkler; this
  * fills that hole without a UDF (stays inside whole-stage codegen — the
  * generated code calls the static helper, no boxing, no Row encoding).
  *
  * Exact textbook semantics, bit-compatible with DuckDB's
  * `jaro_winkler_similarity` (probed empirically, same IEEE op order):
  * match window ⌊max(|a|,|b|)/2⌋−1; transpositions = half the
  * out-of-order matches; Winkler boost `+ p·0.1·(1−jaro)` with common
  * prefix p capped at 4, applied only when jaro > 0.7; either side
  * empty → 0. Comparison is per UTF-16 code unit (≡ code points on the
  * BMP; a byte-oriented engine agrees on ASCII data).
  *
  * Scale shape: pure per-row CPU on the verify side of a blocked
  * linkage join — O(|a|·window) time, two small boolean arrays per
  * call, no shuffle, no state.
  */
object JaroWinkler {

  /** Static entry point shared by interpreted eval and generated code. */
  def similarity(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString
    val b = s2.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** `graft_jaro_winkler(a, b)` — similarity in [0, 1]. */
  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = DataTypes.DoubleType

    override protected def nullSafeEval(l: Any, r: Any): Any =
      similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.functions.JaroWinkler.similarity($l, $r);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinklerExpr =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
