package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch profiling main (not part of the driver contract): stage-level
  * timings for the PQ pipeline.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.core.Tables.embeddings(spark, sfDir)

    if (args.headOption.contains("semdedup")) {
      import graft.operators.Dedup
      // warmup
      Dedup.semanticDedup(emb, "vec_id", "embedding", nlist = 8, threshold = 0.3)
        .write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { round =>
        println(s"[prof] ---- semdedup round $round ----")
        time("kmeansCells alone")(
          Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 2)
            .write.format("noop").mode("overwrite").save())
        time("full semanticDedup")(
          Dedup.semanticDedup(emb, "vec_id", "embedding", nlist = 8, threshold = 0.3)
            .write.format("noop").mode("overwrite").save())
      }
      // stage replica of semanticDedup's internals
      val cells = Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 2)
      val v = emb.select(col("vec_id").as("__id"),
          transform(col("embedding"), x => x.cast("double")).as("__vec"))
        .withColumn("__nrm", sqrt(aggregate(col("__vec"), lit(0.0), (a, x) => a + x * x)))
        .join(cells.select(col("vec_id").as("__id"), col("cell")), Seq("__id"))
        .persist()
      time("assignment persist")(v.count())
      val pairs = v.as("l").join(v.as("r"),
          col("l.cell") === col("r.cell") && col("l.__id") < col("r.__id"))
        .filter(aggregate(zip_with(col("l.__vec"), col("r.__vec"), (a, b) => a * b),
          lit(0.0), (a, x) => a + x) / (col("l.__nrm") * col("r.__nrm")) >= 0.3)
        .select(col("l.__id").as("vec_a"), col("r.__id").as("vec_b"))
      println(s"[prof] pairs count: ${time("pairs")(pairs.count())}")
      time("dupClusters on pairs")(
        Dedup.dupClusters(pairs, "vec_a", "vec_b")
          .write.format("noop").mode("overwrite").save())
      // Measured (sf0.1, 2026-08-13): kmeansCells ~1.0 s, assignment persist
      // ~0.35 s, in-cell pairs ~0.7 s (4105 pairs), dupClusters ~2.4 s of
      // which 8 label-propagation rounds x ~0.17 s (the 0.3-threshold graph
      // has diameter ~8). Accelerated steps were tried and REJECTED:
      // hop+pointer-jump converged in 6 rounds / ~1.5 s, double-hop 5
      // rounds / ~1.6 s, hop+jump+jump 6 rounds / ~2.1 s -- all within
      // noise of the plain loop locally, and each pays 2-3 shuffles of the
      // label table per barrier at cluster scale where the plain hop pays
      // one. O(diameter) with one shuffle per round stays the design.
      v.unpersist()
      spark.stop(); return
    }

    // warmup pass
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      dim = 64, k = 5, m = 16, ksub = 32).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { round =>
      println(s"[prof] ---- round $round ----")
      val cb = time("pqTrain")(
        Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 16, ksub = 32, iters = 2)
          .localCheckpoint())
      val codes = time("pqEncode")(
        Similarity.pqEncode(emb, "vec_id", "embedding", cb, dim = 64, m = 16)
          .localCheckpoint())
      codes.count()
      time("full pqTopK")(
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          dim = 64, k = 5, m = 16, ksub = 32).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
