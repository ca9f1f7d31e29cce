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
