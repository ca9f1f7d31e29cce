package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink connectors (reference protocol: `put(message)`, README.rst:169-186).
  * The engine-native sink is the generic table sink (reference MongoSink
  * `insert_many`, contrib/mongodb.py:90-101): append the emitted window to
  * a parquet table. Kafka sink → [[KafkaIO.sink]].
  */
final class TableSink(targetDir: String) extends Serializable {
  def put(df: DataFrame): Unit =
    df.write.mode("append").parquet(targetDir)
}

/** Replay-safe table sink: each micro-batch writes to its own
  * `batch_id=N` partition with dynamic partition overwrite, so a batch
  * replayed after an emit failure (the runner's undo semantics — Spark
  * re-runs the whole micro-batch from checkpoint) OVERWRITES its previous
  * partial output instead of appending duplicates. This is the idempotent
  * half of "at-least-once delivery + idempotent sink = effectively once";
  * the plain [[TableSink]] documents the duplicate-on-replay behavior the
  * reference also has (undo re-emits into side-effecting sinks,
  * window.py:119-124).
  */
final class IdempotentTableSink(targetDir: String) extends Serializable {
  import org.apache.spark.sql.functions.lit

  def put(df: DataFrame, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(targetDir)
}
