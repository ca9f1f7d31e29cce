package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein distance as a native codegen'd
  * expression — edit distance where an adjacent-character TRANSPOSITION
  * costs one operation instead of two, the error model of human-keyed
  * text ("smtih" is one slip, not two). Spark ships only `levenshtein`;
  * this fills the gap without a UDF, completing the linkage verifier
  * family ([[JaroWinkler]] for prefix-weighted similarity, banded
  * levenshtein for operation counts, this for transposition-aware
  * counts).
  *
  * Deliberately the FULL Lowrance-Wagner 1975 recurrence (last-occurrence
  * dictionary), NOT the cheaper optimal-string-alignment restriction:
  * DuckDB's `damerau_levenshtein` is the full variant (probed:
  * DL("CA","ABC") = 2, where OSA gives 3), and matching it bit-for-bit is
  * what makes the oracle gate meaningful. Integer arithmetic throughout —
  * no cross-engine float risk at all. Comparison is per UTF-16 code unit
  * (≡ code points on the BMP; agrees with byte-oriented engines on
  * ASCII).
  *
  * Scale shape: pure per-row CPU on the verify side of a blocked linkage
  * join — O(|a|·|b|) time and space per call (the full variant's
  * dictionary needs the matrix), fine for name-length fields; no shuffle,
  * no state.
  */
object DamerauLevenshtein {

  /** Static entry point shared by interpreted eval and generated code. */
  def distance(s1: UTF8String, s2: UTF8String): Long = {
    val a = s1.toString
    val b = s2.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0) return l2.toLong
    if (l2 == 0) return l1.toLong
    val inf = l1 + l2
    // (l1+2) x (l2+2) matrix, indices shifted by 2: d(i)(j) holds the
    // distance between a[0,i-1) and b[0,j-1) at storage (i+1)(j+1)
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k = { val v = last.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      last.put(a.charAt(i - 1), i)
      i += 1
    }
    d((l1 + 1) * w + l2 + 1).toLong
  }

  /** `graft_damerau_levenshtein(a, b)` — full DL distance. */
  case class DamerauLevenshteinExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = DataTypes.LongType

    override protected def nullSafeEval(l: Any, r: Any): Any =
      distance(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.functions.DamerauLevenshtein.distance($l, $r);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
      copy(left = newLeft, right = newRight)
  }

  def damerauLevenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshteinExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
