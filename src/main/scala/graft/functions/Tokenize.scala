package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word tokenizer: maximal runs of `[a-z0-9]` bytes, equivalent to
  * `regexp_extract_all(text, '[a-z0-9]+', 0)` (the DuckDB oracle form)
  * but a single branch-per-byte scan instead of a JDK regex Matcher.
  *
  * The class is ASCII-only by construction, so scanning BYTES is exact on
  * any UTF-8 input: every byte of a multi-byte code point is ≥ 0x80 and
  * never matches, i.e. non-ASCII text separates tokens exactly as the
  * regex does, and each matched run is a valid single-byte-per-char UTF-8
  * substring. Tokenization is the inner loop of every text-family query
  * (TF-IDF, term frequencies, quality stats all explode it over the full
  * corpus); the regex Matcher showed up as the dominant cost of the whole
  * family at sf0.1, and at 100 TB it is pure per-row CPU — no shuffle to
  * hide behind.
  */
object Tokenize {

  /** `graft_word_tokens(text)` — array of the [a-z0-9]+ runs of `text`. */
  case class WordTokens(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val out = new java.util.ArrayList[UTF8String]()
      var i = 0
      val n = bytes.length
      while (i < n) {
        val b = bytes(i)
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
          val start = i
          i += 1
          while (i < n && {
            val c = bytes(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
          }) i += 1
          out.add(UTF8String.fromBytes(bytes, start, i - start))
        } else i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      nullSafeCodeGen(ctx, ev, v => {
        val bytes = ctx.freshName("bytes")
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val b = ctx.freshName("b")
        val c = ctx.freshName("c")
        val start = ctx.freshName("start")
        s"""
           |byte[] $bytes = $v.getBytes();
           |java.util.ArrayList $out = new java.util.ArrayList();
           |int $n = $bytes.length;
           |int $i = 0;
           |while ($i < $n) {
           |  byte $b = $bytes[$i];
           |  if (($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9')) {
           |    int $start = $i;
           |    $i++;
           |    while ($i < $n) {
           |      byte $c = $bytes[$i];
           |      if (($c >= 'a' && $c <= 'z') || ($c >= '0' && $c <= '9')) { $i++; } else break;
           |    }
           |    $out.add($utf8.fromBytes($bytes, $start, $i - $start));
           |  } else {
           |    $i++;
           |  }
           |}
           |${ev.value} = new $gad($out.toArray());
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): WordTokens =
      copy(child = newChild)
  }

  /** `graft_word_token_count(text)` — COUNT of [a-z0-9]+ runs without
    * materializing the token array: the `size(wordTokens(text))` fast
    * path quality-stat queries take (no per-token allocation at all).
    */
  case class WordTokenCount(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(StringType)
    override def dataType: DataType = DataTypes.IntegerType

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var count = 0
      var inRun = false
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        val m = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
        if (m && !inRun) count += 1
        inRun = m
        i += 1
      }
      count
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val bytes = ctx.freshName("bytes")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val m = ctx.freshName("m")
        val inRun = ctx.freshName("inRun")
        val cnt = ctx.freshName("cnt")
        s"""
           |byte[] $bytes = $v.getBytes();
           |int $cnt = 0;
           |boolean $inRun = false;
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  byte $b = $bytes[$i];
           |  boolean $m = ($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9');
           |  if ($m && !$inRun) $cnt++;
           |  $inRun = $m;
           |}
           |${ev.value} = $cnt;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): WordTokenCount =
      copy(child = newChild)
  }

  def wordTokens(text: Column): Column =
    ColumnBridge.column(WordTokens(ColumnBridge.expression(text)))

  def wordTokenCount(text: Column): Column =
    ColumnBridge.column(WordTokenCount(ColumnBridge.expression(text)))
}
