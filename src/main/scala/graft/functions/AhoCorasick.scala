package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching via the Aho-Corasick automaton
  * (Aho & Corasick 1975, CACM — public textbook algorithm): ONE pass over
  * each document finds every occurrence of every pattern, instead of N
  * per-pattern `contains` scans. This is the blocklist-filter kernel of
  * web-corpus curation — C4 drops any page containing a phrase from the
  * "List of Dirty, Naughty, Obscene or Otherwise Bad Words" (Raffel et
  * al. 2020 §2.2); at thousands of patterns the per-pattern scan is
  * O(N·len) per document while the automaton stays O(len + matches).
  *
  * Matching is over UTF-8 BYTES, exact (no case folding — normalize
  * upstream with [[graft.operators.TextAnalysis]] if needed). The
  * reported statistic is the count of DISTINCT patterns present (the
  * doc-level semantics the C4 filter needs — "contains any banned
  * phrase", not occurrence totals), which also keeps the DuckDB oracle a
  * plain `position(p IN text) > 0` per pattern.
  *
  * Scale shape: the automaton is built once on the driver from the
  * bounded pattern list and rides the serialized expression to every
  * task (the broadcast-a-small-model pattern); evaluation is pure
  * per-row CPU inside whole-stage codegen, no shuffle.
  */
object AhoCorasick {

  /** Trie + BFS failure links over bytes. Dictionary-suffix chains are
    * pre-collapsed: each node stores the list of pattern ids that END at
    * it, including via suffix links, so the scan never walks fail chains
    * at match time.
    */
  final class Kernel(patterns0: Array[String]) extends Serializable {
    require(patterns0.nonEmpty, "AhoCorasick: empty pattern list")
    require(patterns0.forall(_.nonEmpty), "AhoCorasick: empty pattern")

    // a repeated pattern would get two ids ending at the same trie node and
    // distinctMatches would count it twice — dedupe preserves the
    // per-DISTINCT-pattern semantics the oracle's per-pattern strpos encodes
    private val patterns: Array[String] = patterns0.distinct

    val numPatterns: Int = patterns.length

    // built lazily per task after deserialization (the automaton is
    // derived state; only the pattern list ships)
    @transient private lazy val automaton: (Array[Array[Int]], Array[Array[Int]]) = {
      val bytes = patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val next = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
      val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      // trie
      for (pi <- bytes.indices) {
        var s = 0
        for (b <- bytes(pi)) {
          val c = b & 0xff
          if (next(s)(c) < 0) {
            next(s)(c) = next.length
            next += Array.fill(256)(-1)
            ends += Nil
          }
          s = next(s)(c)
        }
        ends(s) = pi :: ends(s)
      }
      // BFS failure links, converting next() into a total goto function
      val fail = new Array[Int](next.length)
      val queue = new java.util.ArrayDeque[Int]()
      for (c <- 0 until 256) {
        val v = next(0)(c)
        if (v < 0) next(0)(c) = 0
        else { fail(v) = 0; queue.add(v) }
      }
      while (!queue.isEmpty) {
        val u = queue.poll()
        // collapse the dictionary-suffix chain into this node's end list
        ends(u) = ends(u) ++ ends(fail(u))
        for (c <- 0 until 256) {
          val v = next(u)(c)
          if (v < 0) next(u)(c) = next(fail(u))(c)
          else { fail(v) = next(fail(u))(c); queue.add(v) }
        }
      }
      (next.toArray, ends.map(_.toArray).toArray)
    }

    /** Count of DISTINCT patterns occurring in `text`. */
    def distinctMatches(text: UTF8String): Int = {
      val (next, ends) = automaton
      val seen = new Array[Boolean](numPatterns)
      var found = 0
      var s = 0
      val bytes = text.getBytes
      var i = 0
      while (i < bytes.length && found < numPatterns) {
        s = next(s)(bytes(i) & 0xff)
        val e = ends(s)
        var j = 0
        while (j < e.length) {
          if (!seen(e(j))) { seen(e(j)) = true; found += 1 }
          j += 1
        }
        i += 1
      }
      found
    }

    /** Does `text` contain ANY pattern? Early-exits on first match. */
    def anyMatch(text: UTF8String): Boolean = {
      val (next, ends) = automaton
      var s = 0
      val bytes = text.getBytes
      var i = 0
      while (i < bytes.length) {
        s = next(s)(bytes(i) & 0xff)
        if (ends(s).length > 0) return true
        i += 1
      }
      false
    }
  }

  /** `graft_ac_distinct_matches(text)` — # distinct blocklist patterns. */
  case class AcDistinctMatches(child: Expression, kernel: Kernel)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = DataTypes.IntegerType

    override protected def nullSafeEval(input: Any): Any =
      kernel.distinctMatches(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("acKernel", kernel, classOf[Kernel].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.distinctMatches($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): AcDistinctMatches =
      copy(child = newChild)
  }

  /** `graft_ac_any_match(text)` — true iff any pattern occurs. */
  case class AcAnyMatch(child: Expression, kernel: Kernel)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = DataTypes.BooleanType

    override protected def nullSafeEval(input: Any): Any =
      kernel.anyMatch(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("acKernel", kernel, classOf[Kernel].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $k.anyMatch($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): AcAnyMatch =
      copy(child = newChild)
  }

  def acDistinctMatches(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcDistinctMatches(ColumnBridge.expression(text),
      new Kernel(patterns.toArray)))

  def acAnyMatch(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcAnyMatch(ColumnBridge.expression(text),
      new Kernel(patterns.toArray)))
}
