package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.MbStream

/** Source connectors (reference protocol: `stream(stream)` + `cancel()`,
  * README.rst:154-163).
  *
  *  - Kafka (reference contrib/kafka.py:6-58) → Spark's built-in kafka
  *    format: [[KafkaIO.source]]. Untestable offline; thin wiring only.
  *    An embedded-broker round-trip spec was evaluated and is NOT
  *    feasible in this build environment: neither kafka-clients, nor
  *    kafka server jars, nor spark-sql-kafka exist in /opt/spark/jars or
  *    the offline dependency cache (zero-egress sandbox), so the
  *    plan-transform specs ([[KafkaIO.project]]/[[KafkaIO.serialize]]
  *    against kafka-shaped frames, mirroring reference
  *    test_kafka.py:19-63) remain the deepest offline-verifiable layer.
  *  - Mongo poll-by-monotonic-key (contrib/mongodb.py:7-87) → generalized
  *    [[TableTailSource]]: incremental reads of any table with a
  *    monotonically increasing key.
  *  - Change-stream source (contrib/mongodb.py:104-121) → a file-source
  *    `readStream` over the table directory IS the CDC path here.
  *  - MQTT/Celery envelopes (contrib/mqtt.py:62-69, celery.py:72-80) are
  *    message-shape specs over the generic append API; no broker client
  *    ships in-engine.
  */
object KafkaIO {
  /** Project Kafka's raw record schema (key/value binary + metadata — the
    * schema `format("kafka")` always yields) to the string envelope the
    * emitters consume. Pure plan transform: testable offline against a
    * kafka-shaped DataFrame, no broker or connector jar needed.
    */
  def project(raw: DataFrame): DataFrame =
    raw.select(col("key").cast("string"), col("value").cast("string"),
      col("topic"), col("partition"), col("offset"), col("timestamp"))

  /** Sink-side serialization: all columns → one JSON `value` column (the
    * shape the kafka writer requires). Pure plan transform, testable offline.
    */
  def serialize(df: DataFrame): DataFrame =
    df.selectExpr("to_json(struct(*)) AS value")

  /** `spark.readStream.format("kafka")` wiring (built-in; S1). Requires the
    * spark-sql-kafka connector on the classpath at runtime.
    */
  def source(spark: SparkSession, servers: String, topic: String, startingOffsets: String = "earliest"): DataFrame =
    project(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load())

  /** Kafka sink wiring (K1): JSON-serialize all columns into `value`. */
  def sink(df: DataFrame, servers: String, topic: String, checkpointDir: String) =
    serialize(df)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}

/** Poll a table with a monotonically increasing key and append new rows to
  * a stream as JSON payloads (reference MongoSource changes(),
  * contrib/mongodb.py:60-75: `idcol > last_seen`, sorted ascending).
  * `poll()` is driven by the caller's cadence (the reference polls every
  * 0.1 s, contrib/mongodb.py:52).
  *
  * `maxRowsPerPoll` bounds driver memory: after an outage, the backlog can
  * be arbitrarily large, and an uncapped poll collects all of it in one
  * array. The cap turns the collect into a sort+limit (TakeOrdered — no
  * full-table sort materializes) and the cursor advances to the max key
  * actually FORWARDED, so the remaining backlog drains loss-free across
  * subsequent polls.
  */
final class TableTailSource(
    spark: SparkSession,
    tablePath: String,
    keyCol: String,
    maxRowsPerPoll: Int = 100000) {
  require(maxRowsPerPoll > 0, "TableTailSource: maxRowsPerPoll must be > 0")

  @volatile private var lastSeen: Long = Long.MinValue
  @volatile private var cancelled: Boolean = false

  def poll(target: MbStream): Int = {
    if (cancelled) return 0
    // Single scan per poll: collect (key, payload) together and advance the
    // cursor from the batch we actually forwarded. A second scan to compute
    // max(key) would race concurrent appends — rows landing between the two
    // scans would move lastSeen past keys never forwarded, dropping them.
    // The ascending orderBy + limit means the cap always keeps the OLDEST
    // pending keys, so the cursor never skips an unforwarded row.
    val collected = spark.read.parquet(tablePath)
      .filter(col(keyCol) > lastSeen && col(keyCol).cast("long").isNotNull)
      .orderBy(col(keyCol))
      .limit(maxRowsPerPoll)
      .select(col(keyCol).cast("long").as("__key"), to_json(struct(col("*"))).as("__payload"))
      .collect()
    if (collected.nonEmpty) {
      // isNotNull filter above guarantees every __key is a concrete long
      // (a non-numeric string key casting to null would otherwise NPE here)
      lastSeen = collected.iterator.map(_.getLong(0)).max
      target.appendAll(collected.toIndexedSeq.map(_.getString(1)))
    }
    collected.length
  }

  /** Reference `source.cancel()` (contrib/mongodb.py:84-86). */
  def cancel(): Unit = cancelled = true
}
