package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, Tokenize}

/** Byte-pair-encoding TRAINER (Sennrich et al. 2016, Algorithm 1): learn a
  * merge table from corpus word frequencies, then serve it through the
  * codegen'd [[graft.functions.BpeEncode]] kernel. Token budgeting against
  * a real subword vocabulary is how an LLM-data pipeline actually counts
  * "tokens" — whitespace counts (TextAnalysis.tokenCount) under-count
  * rare/morphology-heavy text and over-count boilerplate; the reference has
  * no tokenizer surface at all (its payloads are opaque dicts).
  *
  * Scale shape: training reduces the corpus to its word-frequency head —
  * one explode + hash agg with map-side combine, then a bounded-heap
  * top-`maxWords` (TakeOrdered — no global sort) collected to the driver.
  * That bounded table (the Zipf head carries virtually all pair mass) is
  * what the merge loop iterates on, exactly the sampled-codebook pattern
  * the PQ trainer uses. The merge table itself is codebook-sized and rides
  * the expression to executors; the corpus is encoded in one codegen'd
  * pass, never shuffled.
  */
object Bpe {

  /** Learn `numMerges` merges from the corpus' top-`maxWords` word-
    * frequency head. Deterministic: ties in pair frequency break to the
    * lexicographically smallest pair, and the head itself is taken by
    * (count desc, word asc).
    */
  def train(
      df: DataFrame,
      textCol: Column,
      numMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    val head = df.select(explode(Tokenize.wordTokens(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainLocal(head, numMerges)
  }

  /** The driver-side merge loop over a (word, count) table. Public for
    * spec-level checks against the textbook example.
    */
  def trainLocal(
      wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (w.toCharArray.map(_.toString), c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        // deterministic argmax: highest count, then lexicographically
        // smallest pair (HashMap iteration order must not leak through)
        val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
          case (acc, (p, c)) => acc match {
            case Some((bp, bc)) if bc > c => acc
            case Some((bp, bc)) if bc == c &&
              (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2)) => acc
            case _ => Some((p, c))
          }
        }.get._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
      }
    }
    merges.toSeq
  }

  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** BPE token array / count columns under a trained merge table. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    BpeEncode.bpeTokens(text, merges)
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    BpeEncode.bpeTokenCount(text, merges)
}
