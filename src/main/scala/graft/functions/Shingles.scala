package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a token array, space-joined, in document order — the
  * distinct SET (shingles, first-occurrence order) or the full occurrence
  * MULTISET. Native codegen'd expression.
  *
  * The HOF formulation (`transform(sequence(1, size(t)-n+1), i =>
  * concat_ws(" ", slice(t, i, n)))`) re-evaluates the full `t` subtree —
  * typically `split(text)` — for every gram position, i.e. it re-tokenizes
  * the document once per gram (O(tokens²) regex work; measured 4× the
  * whole DSIR query cost); this expression walks the token array once.
  * Fewer than `n` tokens yields an empty array.
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def inputTypes = Seq(ArrayType(StringType))

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet dedups preserving order; ArrayList keeps every occurrence
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](m - n + 1)
    var i = 0
    while (i + n <= m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val sepRef = ctx.addReferenceObj("sep", sep, utf8)
      val coll = ctx.freshName("coll")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val newColl =
        if (distinct) "new java.util.LinkedHashSet()"
        else s"new java.util.ArrayList(java.lang.Math.max($m - $n + 1, 0))"
      s"""
         |int $m = $a.numElements();
         |java.util.Collection $coll = $newColl;
         |for (int $i = 0; $i + $n <= $m; $i++) {
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $coll.add($utf8.concatWs($sepRef, $parts));
         |}
         |${ev.value} = new $gad($coll.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  /** Distinct n-gram shingles of an array<string> token column. */
  def shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(tokens), n))

  /** ALL n-grams (occurrence multiset, document order) of a token column. */
  def ngramsAll(tokens: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(tokens), n, distinct = false))
}
