package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer ENCODE kernel: Viterbi segmentation of each word
  * under a trained piece table (see [[graft.operators.Unigram.train]]) —
  * the inference loop of the unigram language-model tokenizer (Kudo 2018,
  * "Subword Regularization", §3; the `unigram` model type of the public
  * SentencePiece library). Each word is segmented into the piece sequence
  * maximizing Σ log p(piece), by dynamic programming over the word's
  * substring lattice.
  *
  * Execution shape mirrors [[BpeEncode]]: the piece table rides the
  * serialized expression to every task (vocab-sized — the
  * broadcast-a-small-model pattern), encoding is per-row CPU inside
  * whole-stage codegen, no shuffle, and a bounded per-task word→pieces
  * memo exploits Zipf so the DP runs once per DISTINCT word per task.
  *
  * Characters absent from the vocabulary are regular lattice nodes at
  * `unkLogp` = (min piece log-prob − 10) — SentencePiece's unknown-score
  * convention — competing in the max like any piece, so encoding is
  * TOTAL on any input. Ties in the DP take the LONGEST candidate piece
  * (deterministic; matches the intuition that equal-scoring finer splits
  * add no information).
  *
  * Words are the same maximal `[a-z0-9]+` byte runs as [[Tokenize]] — one
  * pre-tokenizer across the whole text family.
  */
object UnigramEncode {

  /** Viterbi segmentation of one word under `logp` (piece → log-prob).
    * `maxLen` bounds candidate piece length; unknown single characters
    * cost `unkLogp`.
    */
  def encodeWord(
      word: String,
      logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int,
      unkLogp: Double): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of the piece ending at i
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      // longest candidate first: on ties the longest piece wins (strict >
      // afterwards keeps the first maximum). An out-of-vocabulary single
      // character is a REGULAR lattice node at unkLogp — it competes in
      // the max like any piece (SentencePiece's unknown handling), it is
      // not a fallback used only when no piece path reaches i.
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val lp = logp.get(word.substring(j, i))
        val cand =
          if (lp != null) best(j) + lp.doubleValue
          else if (j == i - 1) best(j) + unkLogp
          else Double.NegativeInfinity
        if (cand > best(i)) {
          best(i) = cand
          back(i) = j
        }
        j += 1
      }
      i += 1
    }
    // walk back
    var k = n
    var count = 0
    while (k > 0) { count += 1; k = back(k) }
    val out = new Array[String](count)
    k = n
    var c = count - 1
    while (k > 0) { out(c) = word.substring(back(k), k); c -= 1; k = back(k) }
    out
  }

  /** Per-task state: piece table in a flat java map plus the Zipf memo —
    * same discipline as [[BpeEncode.Kernel]].
    */
  final class Kernel(pieces: Array[(String, Double)]) extends Serializable {
    @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        m.put(pieces(i)._1, java.lang.Double.valueOf(pieces(i)._2)); i += 1
      }
      m
    }
    @transient private lazy val maxLen: Int = {
      var m = 1
      var i = 0
      while (i < pieces.length) {
        if (pieces(i)._1.length > m) m = pieces(i)._1.length; i += 1
      }
      m
    }
    @transient private lazy val unkLogp: Double = {
      var mn = 0.0
      var i = 0
      while (i < pieces.length) { if (pieces(i)._2 < mn) mn = pieces(i)._2; i += 1 }
      mn - 10.0
    }
    @transient private lazy val memo = new java.util.HashMap[String, Array[String]]()

    private def wordPieces(word: String): Array[String] = {
      var cached = memo.get(word)
      if (cached == null) {
        cached = encodeWord(word, table, maxLen, unkLogp)
        if (memo.size < 65536) memo.put(word, cached)
      }
      cached
    }

    /** All unigram-LM pieces of `text` (words = [a-z0-9]+ byte runs). */
    def encode(text: UTF8String): Array[UTF8String] = {
      val out = new java.util.ArrayList[UTF8String]()
      foreachWord(text) { w =>
        val toks = wordPieces(w)
        var i = 0
        while (i < toks.length) { out.add(UTF8String.fromString(toks(i))); i += 1 }
      }
      out.toArray(new Array[UTF8String](out.size))
    }

    /** Piece COUNT without materializing the array. */
    def encodeCount(text: UTF8String): Int = {
      var n = 0
      foreachWord(text)(w => n += wordPieces(w).length)
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

  /** `graft_unigram_tokens(text)` — piece array under the trained table. */
  case class UnigramTokens(child: Expression, kernel: Kernel)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(kernel.encode(input.asInstanceOf[UTF8String])
        .asInstanceOf[Array[Any]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("unigramKernel", kernel, classOf[Kernel].getName)
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new $gad((Object[]) $k.encode($v));")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramTokens =
      copy(child = newChild)
  }

  /** `graft_unigram_token_count(text)` — COUNT of pieces, no array. */
  case class UnigramTokenCount(child: Expression, kernel: Kernel)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = DataTypes.IntegerType

    override protected def nullSafeEval(input: Any): Any =
      kernel.encodeCount(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("unigramKernel", kernel, classOf[Kernel].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.encodeCount($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
      copy(child = newChild)
  }

  def unigramTokens(text: Column, pieces: Seq[(String, Double)]): Column =
    ColumnBridge.column(UnigramTokens(ColumnBridge.expression(text),
      new Kernel(pieces.toArray)))

  def unigramTokenCount(text: Column, pieces: Seq[(String, Double)]): Column =
    ColumnBridge.column(UnigramTokenCount(ColumnBridge.expression(text),
      new Kernel(pieces.toArray)))
}
