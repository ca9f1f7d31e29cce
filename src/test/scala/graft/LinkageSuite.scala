package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

/** Specs for q-gram blocked record linkage (operators/Linkage.scala). The
  * linkage_blocked oracle checks cross-engine exactness; these check match
  * quality and the no-all-pairs plan shape.
  */
class LinkageSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bestMatch: single-char typos resolve to the true record; exact ties prefer smallest id") {
    val clean = Seq(
      (1L, "Jonathan Smithers"), (2L, "Jonathan Smythers"), (3L, "Abigail Winterbottom"),
      (4L, "Christoph Gutenberg"), (5L, "Margarete Llewellyn"))
      .toDF("id", "name")
    val dirty = Seq(
      (11L, "Jonathan Smifhers"),    // 1 sub → id 1 (dist 1) or id 2 (dist 2)
      (13L, "Abigail Winterbottom"), // exact
      (14L, "Christoph Gutenbergg"), // 1 insert
      (15L, "Margarete Llewelyn"))   // 1 delete
      .toDF("id", "name")
    val m = Linkage.bestMatch(
        dirty, col("id"), col("name"), clean, col("id"), col("name"),
        tailLen = 20, maxGramFreq = 100)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(m(11L) === ((1L, 1)))
    assert(m(13L) === ((3L, 0)))
    assert(m(14L) === ((4L, 1)))
    assert(m(15L) === ((5L, 1)))
  }

  test("blocking recall on the perturbed-customer workload stays high; matches are sound") {
    val cust = graft.core.Tables.customer(spark, TestSpark.sf0001)
    val clean = cust.select(col("c_custkey"), col("c_name"))
    val nameL = lower(col("c_name"))
    val pos = lit(10) + pmod(col("c_custkey"), lit(9))
    val m3 = pmod(col("c_custkey"), lit(3))
    val dirtyName = when(m3 === 0,
        concat(nameL.substr(lit(1), pos - 1), lit("x"), nameL.substr(pos + 1, lit(100))))
      .when(m3 === 1, concat(nameL.substr(lit(1), pos - 1), nameL.substr(pos + 1, lit(100))))
      .otherwise(concat(nameL.substr(lit(1), pos - 1), lit("z"), nameL.substr(pos, lit(100))))
    val dirty = cust.select(col("c_custkey").as("d_id"), dirtyName.as("d_name"))

    val out = Linkage.bestMatch(dirty, col("d_id"), col("d_name"),
      clean, col("c_custkey"), col("c_name")).collect()
    val n = clean.count()
    // every emitted match is within the verify budget
    assert(out.forall(_.getInt(2) <= 2), "verify must enforce maxDist")
    // blocking recall: the vast majority of 1-edit names find SOME match...
    assert(out.length > n * 0.8, s"blocking recall collapsed: ${out.length}/$n")
    // ...and of those, the bulk resolve to their own source record (ties on
    // digit-substitution can legitimately prefer a smaller custkey)
    val self = out.count(r => r.getLong(0) == r.getLong(1))
    assert(self > out.length * 0.7, s"self-match rate too low: $self/${out.length}")
  }

  test("stop-gram floor: all-hot records stay blockable; reference name-dedup resolves to min id") {
    // 30 DISTINCT reference names share one 8-char tail (" waxwing"), so
    // every tail gram has df=30 > cap=5 — under the bare global cap a
    // 1-edit dirty copy would lose every shared block key (its own novel
    // grams match nothing on the reference) and silently go unmatched.
    // The rarest-hot floor keeps both sides blockable: ties on df break
    // on the gram string, identically for the pair's shared grams.
    val clean = ((1 to 30).map(i => (i.toLong, s"bird$i waxwing")) :+
      (99L, "unique flycatcher")).toDF("id", "name")
    val dirty = Seq((101L, "bird1 waxwinq"), (102L, "unique flycatcherr")).toDF("id", "name")
    val m = Linkage.bestMatch(
        dirty, col("id"), col("name"), clean, col("id"), col("name"),
        maxGramFreq = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(m.get(101L) === Some((1L, 1)),
      s"all-hot dirty record must still block to its origin via floored grams: $m")
    assert(m.get(102L) === Some((99L, 1)), s"cold-path record must still match: $m")
  }

  test("plan: no cartesian / broadcast-nested-loop anywhere (block join only)") {
    val clean = (1 to 50).map(i => (i.toLong, f"Record#$i%06d")).toDF("id", "name")
    val dirty = (1 to 50).map(i => (i.toLong + 1000, f"Record#$i%06d")).toDF("id", "name")
    val plan = Linkage.bestMatch(dirty, col("id"), col("name"),
        clean, col("id"), col("name"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"linkage must never fall back to all-pairs:\n$plan")
  }

  test("jaroWinkler: textbook reference values, DuckDB-probed (bit-level)") {
    import graft.functions.JaroWinkler.jaroWinkler
    // expected values are DuckDB 1.0 jaro_winkler_similarity outputs for
    // the same pairs — the linkage_jw oracle depends on this agreement
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DwAyNE", "DuANE", 0.8400000000000001),   // case-sensitive match
      ("a", "ab", 0.8500000000000001),           // boost above 0.7
      ("CRATE", "TRACE", 0.7333333333333334),    // no common prefix: no boost
      ("abqqqqqq", "abzzzzzz", 0.5),             // jaro ≤ 0.7: boost suppressed
      ("aaaaax", "aaaaay", 0.9333333333333333),  // prefix capped at 4
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("ab", "ba", 0.0),                         // window 0: no matches
      ("", "", 0.0), ("", "a", 0.0))             // empty → 0, the DuckDB rule
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("sim", jaroWinkler(col("a"), col("b")))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((a, b, want) <- cases)
      assert(got((a, b)) === want, s"jaroWinkler($a, $b)")
    // SQL registration serves the identical kernel
    graft.functions.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA')").collect()(0).getDouble(0)
    assert(viaSql === 0.9611111111111111)
  }

  test("bestMatchJw: typos resolve by prefix-weighted argmax; threshold filters junk") {
    val clean = Seq(
      (1L, "Jonathan Smithers"), (2L, "Jonathan Smythers"), (3L, "Abigail Winterbottom"),
      (4L, "Zzzz Qqqq"))
      .toDF("id", "name")
    val dirty = Seq(
      (11L, "Jonathan Smitehrs"),    // transposition → id 1 over id 2
      (13L, "Abigail Winterbottom"), // exact → sim 1.0
      (15L, "Totally Unrelated"))    // below minSim → dropped
      .toDF("id", "name")
    val m = Linkage.bestMatchJw(
        dirty, col("id"), col("name"), clean, col("id"), col("name"),
        tailLen = 20, maxGramFreq = 100, minSim = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(11L)._1 === 1L, s"transposed name must match its source: $m")
    assert(m(13L) === (3L, 1.0), s"exact match at sim 1.0: $m")
    assert(!m.contains(15L), s"sub-threshold candidates must drop: $m")
  }

  test("damerauLevenshtein: full-variant textbook values; transposition beats plain levenshtein") {
    import graft.functions.DamerauLevenshtein.damerauLevenshtein
    import org.apache.spark.sql.functions.levenshtein
    val cases = Seq(
      // (a, b, full DL) — CA/ABC is the full-vs-OSA discriminator: the
      // full Lowrance-Wagner distance is 2 (OSA would say 3); DuckDB-probed
      ("CA", "ABC", 2L),
      ("ab", "ba", 1L),
      ("abcd", "acbd", 1L),
      ("smtih", "smith", 1L),
      ("kitten", "sitting", 3L),
      ("", "abc", 3L),
      ("abc", "", 3L),
      ("same", "same", 0L))
    val out = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(col("a"), col("b"), damerauLevenshtein(col("a"), col("b")).as("d"),
        levenshtein(col("a"), col("b")).cast("long").as("lev"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    cases.foreach { case (a, b, d) =>
      assert(out((a, b))._1 === d, s"DL($a, $b) must be $d, got ${out((a, b))}")
    }
    // a pure adjacent swap is 1 for DL but 2 for levenshtein
    assert(out(("ab", "ba")) === ((1L, 2L)))
    // DL never exceeds levenshtein
    assert(out.values.forall { case (d, l) => d <= l })

    // SQL surface agrees with the Column API
    graft.functions.GraftExtensions.register(spark)
    val sql = spark.sql("SELECT graft_damerau_levenshtein('smtih', 'smith')")
      .collect()(0).getLong(0)
    assert(sql === 1L, "registered SQL function must route to the same expression")
  }
}
