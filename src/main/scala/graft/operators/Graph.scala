package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Iterative graph algorithms as plain DataFrame plans — the link-analysis
  * companion to the dedup family's connected components (Dedup.scala:342's
  * distributed min-label fixpoint). Web-crawl curation uses this for domain
  * authority: rank hosts by the link graph, weight quality gates by rank.
  *
  * PageRank here is EXACT integer fixed-point (ranks are BIGINTs scaled by
  * 10¹²; every step is integer add/multiply/DIV) — float PageRank
  * accumulates partial sums in partition order and is not reproducible
  * across engines or even runs; integer sums are order-free, so a
  * 1000-executor run, a local[32] run and the single-threaded DuckDB oracle
  * (the same recurrence unrolled as CTEs) agree bit-for-bit.
  *
  * Per-iteration plan: one shuffle join of edges against the rank table on
  * src (edges also carry out-degree, joined once up front), one hash agg on
  * dst, and a broadcast of the two scalar tables (vertex count, dangling
  * mass). The rank table is |V| rows — tiny next to |E| — and re-partitions
  * consistently on vertex, so AQE reuses the exchange layout. For deep
  * iteration counts, `persist` truncates each step (and a production loop
  * would checkpoint every ~10 iters to cut lineage); the edge and vertex
  * tables are persisted once and reused by every iteration.
  */
object Graph {

  /** Rank scale: ranks sum to ~10¹² (floor losses excepted). */
  val Scale: Long = 1000000000000L

  private def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(new IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** PageRank over a directed edge list `(src, dst)` with damping d = 85%.
    *
    * R₀(v) = Scale div N;
    * Rᵢ(v) = ((15·Scale) div 100) div N
    *         + (85·(Σ_{u→v} Rᵢ₋₁(u) div outdeg(u) + D div N)) div 100
    * where D = Σ Rᵢ₋₁ over dangling vertices (no out-edges) — their mass
    * redistributes uniformly, the standard correction.
    *
    * Duplicate edges are collapsed; callers wanting an undirected walk pass
    * the symmetric closure. Output: (vertex, rank_e12) — exact BIGINTs.
    */
  def pageRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    val ed = edges.select(col("src"), col("dst")).distinct().persist()
    val verts = ed.select(col("src").as("vertex"))
      .union(ed.select(col("dst").as("vertex"))).distinct().persist()
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
    val nRow = verts.agg(count(lit(1)).as("n"))

    var ranks = verts.crossJoin(broadcast(nRow))
      .select(col("vertex"), intDiv(lit(Scale), col("n")).as("rank_e12"))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val contribs = ed.join(deg, "src")
        .join(ranks.withColumnRenamed("vertex", "src"), "src")
        .select(col("dst"), intDiv(col("rank_e12"), col("outdeg")).as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      val dangling = ranks
        .join(deg.select(col("src").as("vertex")), Seq("vertex"), "left_anti")
        .agg(coalesce(sum(col("rank_e12")), lit(0L)).as("__dmass"))
      val next = verts.crossJoin(broadcast(nRow)).crossJoin(broadcast(dangling))
        .join(contribs, col("vertex") === col("dst"), "left")
        .select(col("vertex"),
          (intDiv(intDiv(lit(15L * Scale), lit(100L)), col("n")) +
            intDiv(lit(85L) * (coalesce(col("__s"), lit(0L)) +
              intDiv(col("__dmass"), col("n"))), lit(100L))).as("rank_e12"))
        .persist()
      if (prev != null) prev.unpersist()
      prev = ranks
      ranks = next
    }
    ranks
  }
}
