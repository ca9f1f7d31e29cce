package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: find, for every dirty record, its
  * best fuzzy match in a clean reference table — the classic
  * "link the crawl's author strings to the canonical author list" step.
  *
  * All-pairs edit distance is O(|L|·|R|) and dead at scale; the standard
  * shape (Christen, "Data Matching", 2012) is BLOCK → VERIFY → RESOLVE:
  *   1. q-gram blocking: each name emits the q-grams of its tail; records
  *      sharing any gram land in one candidate block. A single edit
  *      disturbs at most q grams, so near matches almost always share one.
  *   2. frequency capping: grams more common than `maxGramFreq` (the
  *      '0000'-style stop-grams) are dropped BEFORE the join — this is the
  *      skew guard: without it one hot gram turns the block join into a
  *      quadratic straggler. The cap bounds per-gram fanout at
  *      |L|·maxGramFreq.
  *   3. verify: codegen'd `levenshtein` on the DISTINCT candidate pairs
  *      only; keep dist ≤ maxDist.
  *   4. resolve: best match per left record, total order (dist, right id).
  *
  * Plan at 100 TB: gram explode (narrow, ids + name lengths only) →
  * hash-partition both sides on gram → pair dedup (hash agg on two id
  * longs) → id-keyed name reattach → per-pair scalar verify →
  * per-left-id window for the argmin. No broadcast of either corpus, no
  * all-pairs product anywhere; every exchange is keyed on gram or pair
  * id, and no fanout exchange carries a string payload.
  */
object Linkage {

  /** Q-grams of the last `tailLen` chars of `name` (the discriminative
    * zone for id-suffixed names; pass the whole string by raising
    * `tailLen`). Pure array expression — no UDF.
    */
  private def tailGrams(name: Column, gramWidth: Int, tailLen: Int): Column = {
    val tail = name.substr(
      greatest(length(name) - (tailLen - 1), lit(1)), lit(tailLen))
    transform(
      sequence(lit(1), greatest(length(tail) - (gramWidth - 1), lit(1))),
      i => tail.substr(i, lit(gramWidth)))
  }

  /** Best fuzzy match in `right` for every record of `left`.
    *
    * Inputs are (id, name) shaped via the four column args; names are
    * compared case-insensitively. Output: (left_id, right_id, dist) — one
    * row per left record that found a candidate within `maxDist`; ties
    * resolve on smallest right_id (total order, cross-engine stable).
    */
  def bestMatch(
      left: DataFrame, leftId: Column, leftName: Column,
      right: DataFrame, rightId: Column, rightName: Column,
      gramWidth: Int = 4,
      tailLen: Int = 8,
      maxGramFreq: Long = 200L,
      maxDist: Int = 2): DataFrame = {
    // length filter: levenshtein(a,b) >= |len(a)-len(b)|, so pairs whose
    // lengths differ by more than maxDist can never verify — pruning them
    // BEFORE the distinct shrinks the pair-dedup exchange (output-neutral)
    val pairs = candidatePairs(left, leftId, leftName, right, rightId, rightName,
      gramWidth, tailLen, maxGramFreq, maxLenDiff = Some(maxDist))
    // 3-arg levenshtein runs the BANDED O(maxDist·n) DP and bails with -1
    // past the threshold — the verify step's cost tracks the budget, not
    // the name length; kept rows carry the exact distance either way
    val verified = pairs
      .withColumn("dist", levenshtein(col("__ln"), col("__rn"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
    val w = Window.partitionBy(col("left_id")).orderBy(col("dist"), col("right_id"))
    verified.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("left_id"), col("right_id"), col("dist"))
  }

  /** [[bestMatch]] with a Jaro-Winkler verifier — same BLOCK step, but the
    * verify/resolve favors shared prefixes and transpositions (human-keyed
    * typos) instead of raw edit count. Keeps candidates with similarity ≥
    * `minSim`; best match per left record = argmax, ties on smallest
    * right_id. Output: (left_id, right_id, sim) with sim rounded to 6dp —
    * the ROUNDED value also drives the argmax ordering, so the resolve is
    * stable cross-engine even if a foreign implementation differs in the
    * last float bits.
    *
    * Length prune (output-neutral): matches are bounded by the shorter
    * string — m ≤ min(|a|,|b|) gives jaro ≤ (2 + min/max)/3 and, with the
    * full prefix boost, jw ≤ 0.8 + 0.2·min/max. So for `minSim` > 0.8 a
    * pair whose length ratio min/max < (minSim − 0.8)/0.2 can never
    * verify, and the verify work is skipped for it up front (for
    * minSim = 0.9 that drops every pair off by more than 2× in length).
    * The oracle SQL runs without the prune — identical output either way
    * is exactly the neutrality claim.
    */
  def bestMatchJw(
      left: DataFrame, leftId: Column, leftName: Column,
      right: DataFrame, rightId: Column, rightName: Column,
      gramWidth: Int = 4,
      tailLen: Int = 8,
      maxGramFreq: Long = 200L,
      minSim: Double = 0.9): DataFrame = {
    // jw ≤ 0.8 + 0.2·min/max (see scaladoc): below-ratio pairs can never
    // reach minSim, so they are pruned inside the BLOCK step (before the
    // pair dedup — see candidatePairs) and never verified. The 1e-9 slack
    // keeps the float division from clipping an exactly-on-the-bound pair.
    val pairs = candidatePairs(left, leftId, leftName, right, rightId, rightName,
      gramWidth, tailLen, maxGramFreq, maxLenDiff = None,
      minLenRatio = if (minSim > 0.8) Some((minSim - 0.8) / 0.2 - 1e-9) else None)
    val verified = pairs
      .withColumn("sim",
        round(graft.functions.JaroWinkler.jaroWinkler(col("__ln"), col("__rn")), 6))
      .filter(col("sim") >= minSim)
    val w = Window.partitionBy(col("left_id"))
      .orderBy(col("sim").desc, col("right_id"))
    verified.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("left_id"), col("right_id"), col("sim"))
  }

  /** The shared BLOCK step: distinct candidate pairs
    * (left_id, __ln, right_id, __rn) from q-gram blocking with stop-gram
    * capping, optionally length-pruned for edit-bounded verifiers.
    *
    * The heavy exchanges — the per-gram fanout join and the pair-dedup
    * hash agg — carry `(id, length(name))`, NEVER the name strings: the
    * gram join's output is Σ(per-gram |L|·|R|) rows and the dedup keys
    * hash far cheaper as two longs than as two longs plus two strings.
    * Names re-attach AFTER the dedup via two id-keyed joins against the
    * (|L|- and |R|-sized) name tables — broadcastable when a side is a
    * dimension, plain shuffle-hash on id otherwise, either way touching
    * |pairs| + |names| rows instead of widening every fanout row. The
    * length prunes still run BEFORE the dedup (lengths ride the gram
    * rows), so pruned pairs never reach the pair exchange at all.
    */
  private def candidatePairs(
      left: DataFrame, leftId: Column, leftName: Column,
      right: DataFrame, rightId: Column, rightName: Column,
      gramWidth: Int, tailLen: Int, maxGramFreq: Long,
      maxLenDiff: Option[Int], minLenRatio: Option[Double] = None): DataFrame = {
    val l = left.select(leftId.as("left_id"), lower(leftName).as("__ln"))
    val r = right.select(rightId.as("right_id"), lower(rightName).as("__rn"))

    def explodeGrams(df: DataFrame, idCol: String, nameCol: String, lenCol: String) =
      df.select(col(idCol), length(col(nameCol)).as(lenCol),
          explode(tailGrams(col(nameCol), gramWidth, tailLen)).as("__g"))
        .dropDuplicates(idCol, "__g")

    val lg = explodeGrams(l, "left_id", "__ln", "__ll")
    val rg = explodeGrams(r, "right_id", "__rn", "__rl")

    // stop-gram removal: frequency measured on the reference side (the
    // side a production pipeline has profiled ahead of time)
    val hot = rg.groupBy(col("__g")).agg(count(lit(1)).as("__f"))
      .filter(col("__f") > maxGramFreq)
      .select(col("__g"))
    val lgCold = lg.join(broadcast(hot), Seq("__g"), "left_anti")
    val rgCold = rg.join(broadcast(hot), Seq("__g"), "left_anti")

    val joined = lgCold.join(rgCold, "__g")
    val diffPruned = maxLenDiff match {
      case Some(d) => joined.filter(abs(col("__ll") - col("__rl")) <= d)
      case None => joined
    }
    val pruned = minLenRatio match {
      case Some(ratio) =>
        val lenL = col("__ll").cast("double")
        val lenR = col("__rl").cast("double")
        diffPruned.filter(least(lenL, lenR) / greatest(lenL, lenR) >= lit(ratio))
      case None => diffPruned
    }
    pruned
      .select(col("left_id"), col("right_id"))
      .distinct()
      .join(l, "left_id")
      .join(r, "right_id")
      .select(col("left_id"), col("__ln"), col("right_id"), col("__rn"))
  }
}
