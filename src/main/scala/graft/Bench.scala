package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query at the
  * SPARK_GRAFT_SF_DIR scale factor and print ONE JSON line.
  *
  * Timing methodology: each query is fully materialized through the noop
  * sink (count() would let Catalyst prune columns/work and under-measure).
  * A warmup pass at sf0.001 first absorbs JVM/classloader/codegen warmup so
  * the reported numbers reflect query execution, not startup.
  *
  * Each query is timed over TWO full passes and reports the per-query MIN.
  * A single pass attributes neighbor effects to whichever query runs next —
  * GC of broadcasts/localCheckpoint blocks accumulated by earlier queries,
  * OS page-cache warmup, a background compaction — and those showed up in
  * round 9 as a phantom 3–4× "regression" on three text queries that
  * vanished on re-run (isolated AND full-suite reruns both matched the
  * round-8 numbers). min-of-2 reports each query's steady-state cost,
  * which is what capacity planning at 100 TB actually needs; `System.gc()`
  * between passes gives the ContextCleaner a chance to release the
  * previous pass's dropped broadcasts so pass 2 isn't paying pass 1's
  * garbage either.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args = query-name filter for local iteration; the driver
    // invokes with no args and gets the full suite
    val selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup at the smallest sf: JIT, codegen, parquet reader init
    selected.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try materialize(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }

    // A failed query must NOT masquerade as a fast one: analysis errors
    // raise in milliseconds, and round 10 reported a broken query at
    // 0.06 s for a whole round before anyone noticed. Track failures and
    // surface them in the JSON so the caller sees them without reading
    // stderr.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timedPass(): Seq[(String, Double)] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    System.gc()
    val pass1 = timedPass()
    System.gc()
    val pass2 = timedPass().toMap
    val results = pass1.map { case (name, t1) =>
      name -> math.min(t1, pass2.getOrElse(name, t1))
    }
    // The driver keeps only the LAST ~2000 chars of stdout. With 125
    // queries the full per-query map is ~3.5 KB, so the line was always
    // truncated mid-JSON and both r9/r10 recorded "parsed": null. The full
    // map goes to target/bench.json (and is printed first for humans); the
    // FINAL stdout line is a budget-fitted variant that keeps the slowest
    // queries (the ones that matter for triage) and drops the fastest,
    // recording how many were dropped, so the tail always holds one
    // complete parseable JSON line even after sbt's "[success]" trailer.
    def fmt(v: Double): String = f"$v%.2f"
    def lineFor(rs: Seq[(String, Double)], omitted: Int): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      val fl = if (failed.nonEmpty)
        failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
      else ""
      val total = results.map(_._2).sum // total always covers ALL queries
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$om$fl,"sf":"$sfDir"}"""
    }
    val full = lineFor(results, 0)
    println(full)
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    val budget = 1600 // leaves headroom for sbt's closing lines in the tail
    val fitted =
      if (full.length <= budget) full
      else {
        val bySlow = results.sortBy(-_._2)
        // largest prefix of the slowest-first ordering that fits the budget
        val keep = (bySlow.length to 1 by -1).view
          .map(n => bySlow.take(n).sortBy(_._1))
          .map(rs => lineFor(rs, results.length - rs.length))
          .find(_.length <= budget)
          .getOrElse(lineFor(Seq.empty, results.length))
        keep
      }
    if (fitted != full) println(fitted)
    spark.stop()
  }
}
