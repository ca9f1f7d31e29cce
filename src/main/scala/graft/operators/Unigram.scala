package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Tokenize, UnigramEncode}

/** Unigram language-model tokenizer TRAINER (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", §3.2; the `unigram` model of the public
  * SentencePiece library): seed a large candidate vocabulary from frequent
  * substrings, fit piece probabilities by EM over each word's segmentation
  * lattice (forward-backward posteriors — full expectation, not Viterbi
  * counts), and alternately prune the vocabulary toward the target size.
  * Serving goes through the codegen'd [[graft.functions.UnigramEncode]]
  * Viterbi kernel. Together with [[Bpe]] this covers both halves of the
  * subword-tokenizer family a data pipeline meets in the wild (BPE = GPT
  * lineage, unigram LM = T5/SentencePiece lineage).
  *
  * Scale shape, same as [[Bpe.train]]: the corpus reduces to its
  * word-frequency head — one explode + hash agg with map-side combine, a
  * bounded-heap top-`maxWords` collected to the driver (the documented
  * bounded-artifact collect; the Zipf head carries virtually all piece
  * mass) — and EM runs driver-side over that bounded table. The trained
  * piece table is codebook-sized and rides the encode expression to
  * executors; the corpus itself is encoded in one shuffle-free pass.
  *
  * Deviation from SentencePiece, documented: pruning drops the pieces
  * with the LOWEST EM expected count (never single characters, which keep
  * encoding total) instead of SentencePiece's leave-one-out loss ranking
  * — the expected count is the loss ranking's dominant term, and the
  * monotone-likelihood spec pins what matters: every EM pass is a true EM
  * step, so corpus log-likelihood never decreases within a vocabulary.
  */
object Unigram {

  /** Train a piece table of ≤ `vocabSize` pieces from the corpus'
    * top-`maxWords` word-frequency head. Deterministic end to end: the
    * head is taken by (count desc, word asc), seeding by (score desc,
    * piece asc), pruning by (expected count asc, piece desc), and every
    * float reduction runs in sorted-key order.
    */
  def train(
      df: DataFrame,
      textCol: Column,
      vocabSize: Int,
      maxWords: Int = 50000,
      maxPieceLen: Int = 8,
      emIters: Int = 2,
      shrink: Double = 0.8): Seq[(String, Double)] = {
    val head = df.select(explode(Tokenize.wordTokens(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainLocal(head, vocabSize, maxPieceLen, emIters, shrink)
  }

  /** The driver-side seed → EM → prune loop over a (word, count) table.
    * Public for spec-level checks (reference equivalence, monotone
    * likelihood).
    */
  def trainLocal(
      wordCounts: Seq[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int = 8,
      emIters: Int = 2,
      shrink: Double = 0.8): Seq[(String, Double)] = {
    require(vocabSize > 0, "unigram: vocabSize must be positive")
    require(maxPieceLen >= 1, "unigram: maxPieceLen must be >= 1")
    require(shrink > 0 && shrink < 1, "unigram: shrink must be in (0, 1)")
    if (wordCounts.isEmpty) return Seq.empty

    // ---- seed: frequent substrings scored count·len (the SentencePiece
    // seeding heuristic: long frequent substrings are the valuable
    // candidates), all single characters always included
    val subCounts = mutable.HashMap.empty[String, Long]
    for ((w, f) <- wordCounts; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + maxPieceLen))
      subCounts.update(w.substring(i, j), subCounts.getOrElse(w.substring(i, j), 0L) + f)
    val chars = subCounts.keysIterator.filter(_.length == 1).toSeq.sorted
    val seedBudget = math.max(vocabSize * 4, chars.size)
    val multi = subCounts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c * p.length, p) }
      .take(seedBudget - chars.size).map(_._1)
    var vocab: Array[String] = (chars ++ multi).sorted.toArray

    // init probs ∝ raw substring counts (normalized in sorted order)
    var logp: mutable.HashMap[String, Double] = {
      val tot = vocab.map(subCounts(_).toDouble).sum
      mutable.HashMap(vocab.map(p => p -> math.log(subCounts(p) / tot)): _*)
    }

    // ---- EM + prune rounds
    def emPass(): mutable.HashMap[String, Double] = {
      val expected = mutable.HashMap.empty[String, Double]
      for ((w, f) <- wordCounts) {
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(n) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            val lp = logp.get(w.substring(j, i))
            if (lp.isDefined && alpha(j) != Double.NegativeInfinity)
              alpha(i) = logAdd(alpha(i), alpha(j) + lp.get)
            j += 1
          }
          i += 1
        }
        i = n - 1
        while (i >= 0) {
          var j = i + 1
          val jMax = math.min(n, i + maxPieceLen)
          while (j <= jMax) {
            val lp = logp.get(w.substring(i, j))
            if (lp.isDefined && beta(j) != Double.NegativeInfinity)
              beta(i) = logAdd(beta(i), lp.get + beta(j))
            j += 1
          }
          i -= 1
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          i = 0
          while (i < n) {
            var j = i + 1
            val jMax = math.min(n, i + maxPieceLen)
            while (j <= jMax) {
              val piece = w.substring(i, j)
              val lp = logp.get(piece)
              if (lp.isDefined && alpha(i) != Double.NegativeInfinity &&
                  beta(j) != Double.NegativeInfinity) {
                val post = math.exp(alpha(i) + lp.get + beta(j) - z) * f
                if (post > 0) expected.update(piece, expected.getOrElse(piece, 0.0) + post)
              }
              j += 1
            }
            i += 1
          }
        }
      }
      expected
    }

    var done = false
    while (!done) {
      var it = 0
      var expected: mutable.HashMap[String, Double] = null
      while (it < emIters) {
        expected = emPass()
        // totality floor: a single character whose expected count
        // underflows to 0.0 (emPass keeps only posterior > 0) must not
        // silently drop from the vocabulary — encode would then stay total
        // only via the unk fallback, changing scores. Re-insert at a floor
        // count before normalizing so "single chars are never pruned"
        // holds through the M-step too, not just the prune step.
        for (c <- chars) if (!expected.contains(c)) expected.update(c, 1e-12)
        // M-step in sorted-key order (float sums must not depend on hash
        // iteration order)
        val keys = expected.keysIterator.toArray.sorted
        var tot = 0.0
        for (k <- keys) tot += expected(k)
        logp = mutable.HashMap(keys.map(k => k -> math.log(expected(k) / tot)): _*)
        it += 1
      }
      val multiCount = logp.keysIterator.count(_.length > 1)
      val charCount = logp.size - multiCount
      if (logp.size <= math.max(vocabSize, charCount)) done = true
      else {
        // prune the weakest multi-char pieces by EM expected count; single
        // chars are load-bearing (totality) and never pruned
        val target = math.max(vocabSize - charCount,
          (multiCount * shrink).toInt.min(multiCount - 1))
        val keepMulti = logp.iterator.filter(_._1.length > 1).toSeq
          .sortBy { case (p, lp) => (-expected.getOrElse(p, 0.0), p) }
          .take(math.max(target, 0)).map(_._1).toSet
        logp = logp.filter { case (p, _) => p.length == 1 || keepMulti(p) }
      }
    }
    logp.toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  /** Corpus log-likelihood of a (word, count) table under a piece table —
    * Σ f · log Σ_segmentations Π p(piece): the quantity EM must never
    * decrease. Public for the monotonicity spec.
    */
  def corpusLogLikelihood(
      wordCounts: Seq[(String, Long)],
      pieces: Seq[(String, Double)],
      maxPieceLen: Int = 8): Double = {
    val logp = pieces.toMap
    var ll = 0.0
    for ((w, f) <- wordCounts) {
      val n = w.length
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          logp.get(w.substring(j, i)).foreach { lp =>
            if (alpha(j) != Double.NegativeInfinity)
              alpha(i) = logAdd(alpha(i), alpha(j) + lp)
          }
          j += 1
        }
        i += 1
      }
      if (alpha(n) != Double.NegativeInfinity) ll += f * alpha(n)
    }
    ll
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Unigram-LM piece array / count columns under a trained table. */
  def tokens(text: Column, pieces: Seq[(String, Double)]): Column =
    UnigramEncode.unigramTokens(text, pieces)
  def tokenCount(text: Column, pieces: Seq[(String, Double)]): Column =
    UnigramEncode.unigramTokenCount(text, pieces)
}
