package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding ENCODE kernel: apply a trained merge table (see
  * [[graft.operators.Bpe.train]]) to text, greedily merging the
  * lowest-rank adjacent symbol pair per word until none applies — the
  * standard BPE inference loop (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", Algorithm 1; the same
  * loop GPT-2's public encoder runs per word).
  *
  * Execution shape: the merge-rank table rides the serialized expression to
  * every task (it is codebook-sized — 10²..10⁴ entries — the broadcast-a-
  * small-model pattern, like the PQ codebooks and the CCNet classifier
  * weights); encoding is pure per-row CPU inside whole-stage codegen, no
  * shuffle, no state. A per-task word→tokens memo exploits Zipf: the few
  * thousand distinct frequent words cover most of the corpus, so the
  * quadratic-in-word-length merge loop runs once per DISTINCT word per
  * task, not once per occurrence.
  *
  * Words are the same maximal `[a-z0-9]+` byte runs as [[Tokenize]] — one
  * pre-tokenizer across the whole text family.
  */
object BpeEncode {

  /** Greedy BPE of one word under `ranks` (pair "a b" → merge priority;
    * lower merges first). Returns the symbol sequence.
    */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = word.toCharArray.map(_.toString)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestI)
        merged(bestI) = syms(bestI) + syms(bestI + 1)
        System.arraycopy(syms, bestI + 2, merged, bestI + 1, syms.length - bestI - 2)
        syms = merged
      }
    }
    syms
  }

  /** Per-task state: the rank table in a flat java map (O(1) probes, no
    * boxing churn) plus the Zipf memo. Built once per (expression
    * instance, task-deserialized copy).
    */
  final class Kernel(merges: Array[(String, String)]) extends Serializable {
    @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        m.put(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i))
        i += 1
      }
      m
    }
    @transient private lazy val memo = new java.util.HashMap[String, Array[String]]()

    private def wordTokens(word: String): Array[String] = {
      var cached = memo.get(word)
      if (cached == null) {
        cached = encodeWord(word, ranks)
        // bound the memo: Zipf's head is what pays; an adversarial stream
        // of unique words must not grow the map without limit
        if (memo.size < 65536) memo.put(word, cached)
      }
      cached
    }

    /** All BPE tokens of `text` (words = [a-z0-9]+ byte runs). */
    def encode(text: UTF8String): Array[UTF8String] = {
      val out = new java.util.ArrayList[UTF8String]()
      foreachWord(text) { w =>
        val toks = wordTokens(w)
        var i = 0
        while (i < toks.length) { out.add(UTF8String.fromString(toks(i))); i += 1 }
      }
      out.toArray(new Array[UTF8String](out.size))
    }

    /** Token COUNT without materializing the array. */
    def encodeCount(text: UTF8String): Int = {
      var n = 0
      foreachWord(text)(w => n += wordTokens(w).length)
      n
    }

    private def foreachWord(text: UTF8String)(f: String => Unit): Unit = {
      val bytes = text.getBytes
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
          f(new String(bytes, start, i - start, java.nio.charset.StandardCharsets.US_ASCII))
        } else i += 1
      }
    }
  }

  /** `graft_bpe_tokens(text)` — BPE token array under the trained merges. */
  case class BpeTokens(child: Expression, kernel: Kernel)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(kernel.encode(input.asInstanceOf[UTF8String])
        .asInstanceOf[Array[Any]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("bpeKernel", kernel, classOf[Kernel].getName)
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new $gad((Object[]) $k.encode($v));")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeTokens =
      copy(child = newChild)
  }

  /** `graft_bpe_token_count(text)` — COUNT of BPE tokens, no array. */
  case class BpeTokenCount(child: Expression, kernel: Kernel)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = DataTypes.IntegerType

    override protected def nullSafeEval(input: Any): Any =
      kernel.encodeCount(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("bpeKernel", kernel, classOf[Kernel].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.encodeCount($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
      copy(child = newChild)
  }

  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text),
      new Kernel(merges.toArray)))

  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text),
      new Kernel(merges.toArray)))
}
