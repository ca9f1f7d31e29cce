package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scale-curve data generator: writes a deterministic N× replica of a
  * testdata scale-factor directory, used to MEASURE how each operator's
  * cost grows with data volume (SCALE.md records the curves). Not part of
  * the query surface — an experiment harness like [[Explain]].
  *
  * Replication follows how real corpora grow, so the scaled workload keeps
  * the original's character instead of manufacturing pathologies:
  *
  *   - FACT tables (customer/supplier/part/orders/lineitem/events/
  *     documents/embeddings) are replicated with all key columns offset by
  *     `replica * 100_000_000` — foreign-key joins stay 1:N with the same
  *     fan-out, and `pmod`-derived cohorts keep their selectivity (the
  *     offset is a multiple of every modulus the queries use).
  *   - DIMENSION tables (region/nation) and low-cardinality domains
  *     (event_type, lang, source, brand) are NOT grown — at 100 TB the
  *     region table still has 5 rows.
  *   - TEXT columns (names, document text) are passed through a
  *     per-replica Caesar substitution: every LETTER q-gram/shingle/token
  *     differs across replicas while each replica's INTERNAL
  *     near-dup/linkage structure is preserved exactly. (Digits pass
  *     through unchanged — id-suffixed name tails like `Customer#00042`
  *     keep identical digit q-grams across replicas; those grams are
  *     corpus-wide stop-grams, exactly the class the linkage
  *     `maxGramFreq` cap absorbs, and the measured linkage curves in
  *     SCALE.md analyze that transition explicitly.) Naive
  *     copy-with-new-ids would make every document a near-duplicate of
  *     its clones and every name an exact linkage match —
  *     candidate-pair counts would then grow quadratically in the
  *     replica count, a workload the original data does not have. Real
  *     corpus growth adds mostly-new content; the substitution models
  *     that.
  *   - EMBEDDINGS are cyclically rotated per replica — norms and
  *     within-replica distances are exactly preserved, cross-replica
  *     vectors land in new LSH/IVF regions.
  *
  * The transforms COLLIDE past their periods: the embedding rotation
  * repeats every 16 replicas (vectors are 16-dimensional) and the Caesar
  * shift collides from replica 25 on (the never-identity fallback maps
  * i = 25 to shift 7, the same text as replica 7), so a factor past the
  * shortest period would mint bit-identical cross-replica twins —
  * precisely the clone pathology the generator exists to avoid.
  * `factor` is therefore capped at 16 (x16 of sf0.1 ≈ 1.6× sf1; big
  * enough for any super-linearity hunt — the r14 kNN-join quadratic was
  * unmissable at x10).
  *
  * Usage: runMain graft.ScaleData <srcSfDir> <destDir> <factor>
  */
object ScaleData {
  private val KeyOffset = 100000000L // multiple of every pmod the queries use

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private def caesar(c: org.apache.spark.sql.Column, i: Int) = {
    val s = i % 25 match { case 0 if i > 0 => 7; case k => k } // never identity for i>0
    if (i == 0) c
    else {
      val from = lower + lower.toUpperCase
      val to = (lower.drop(s) + lower.take(s)) + (lower.drop(s) + lower.take(s)).toUpperCase
      translate(c, from, to)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcSfDir> <destDir> <factor>")
    val (src, dest, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1, "factor >= 1")
    require(factor <= 16,
      "factor <= 16: the per-replica transforms repeat past their periods " +
        "(embedding rotation every 16; Caesar shift collides from 25, its " +
        "never-identity fallback mapping i=25 to shift 7) — a larger " +
        "factor would mint bit-identical cross-replica twins and " +
        "manufacture the clone quadratics this generator exists to avoid")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(base: DataFrame)(tf: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => tf(base, i)).reduce(_ union _)

    def off(c: String, i: Int) = (col(c) + lit(i * KeyOffset)).as(c)

    def write(df: DataFrame, name: String): Unit = {
      df.repartition(math.max(4, factor * 4))
        .write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scaledata] $name x$factor written")
    }

    // fixed dims: copied once, never grown
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(replicate(Tables.customer(spark, src)) { (d, i) =>
      d.select(off("c_custkey", i), caesar(col("c_name"), i).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }, "customer")

    write(replicate(Tables.supplier(spark, src)) { (d, i) =>
      d.select(off("s_suppkey", i), caesar(col("s_name"), i).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }, "supplier")

    write(replicate(Tables.part(spark, src)) { (d, i) =>
      d.select(off("p_partkey", i), caesar(col("p_name"), i).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    }, "part")

    write(replicate(Tables.orders(spark, src)) { (d, i) =>
      d.select(off("o_orderkey", i), off("o_custkey", i), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    }, "orders")

    write(replicate(Tables.lineitem(spark, src)) { (d, i) =>
      d.select(off("l_orderkey", i), off("l_partkey", i), off("l_suppkey", i),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
    }, "lineitem")

    write(replicate(Tables.events(spark, src)) { (d, i) =>
      d.select(off("event_id", i), col("ts"), off("user_id", i),
        col("event_type"), col("value"), col("props"))
    }, "events")

    write(replicate(Tables.documents(spark, src)) { (d, i) =>
      d.select(off("doc_id", i), caesar(col("text"), i).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, "documents")

    write(replicate(Tables.embeddings(spark, src)) { (d, i) =>
      val rot = i % 16
      val rotated =
        if (rot == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${rot + 1}, size(embedding) - $rot), " +
          s"slice(embedding, 1, $rot))")
      d.select(off("vec_id", i), rotated.as("embedding"), col("label"))
    }, "embeddings")

    spark.stop()
  }
}
