package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams ("shingles") of a token array, space-joined, in
  * first-occurrence order. Native codegen'd expression.
  *
  * The HOF formulation (`transform(sequence(1, size(t)-n+1), i =>
  * concat_ws(" ", element_at(t, i), ...))`) re-evaluates the full `t`
  * subtree — typically `split(text)` — for every `element_at`, i.e. it
  * re-tokenizes the document ~3× per shingle; this expression walks the
  * token array once. Fewer than `n` tokens yields an empty array.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def inputTypes = Seq(ArrayType(StringType))

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val sepRef = ctx.addReferenceObj("sep", sep, utf8)
      val seen = ctx.freshName("seen")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      s"""
         |int $m = $a.numElements();
         |java.util.LinkedHashSet $seen = new java.util.LinkedHashSet();
         |for (int $i = 0; $i + $n <= $m; $i++) {
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $seen.add($utf8.concatWs($sepRef, $parts));
         |}
         |${ev.value} = new $gad($seen.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  /** Distinct n-gram shingles of an array<string> token column. */
  def shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(tokens), n))
}
