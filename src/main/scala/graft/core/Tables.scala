package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * All engine queries are parameterized by the scale-factor directory so the
  * same plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench). At
  * cluster scale the same call sites point at date/stream-partitioned
  * directories; nothing here assumes single-file inputs.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame   = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame     = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame   = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame     = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame     = load(spark, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively; read it as raw nanos (legacy conf) and truncate to
    * microseconds (Spark timestamp precision). `ts div 1000` keeps the math
    * in integer space — a double division would lose precision at 1.7e18 ns.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // newer Spark reads TIMESTAMP(NANOS) natively as NTZ (the legacy
        // nanos-as-long conf no longer applies) — normalize to TimestampType
        // so timestamp-only functions (unix_micros) keep resolving; the
        // session timezone is pinned UTC everywhere (Verify/Bench/tests), so
        // the wall-clock values are unchanged
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
