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

/** CDC-apply sink: each micro-batch of updates is MERGED into the target
  * table with latest-wins semantics ([[graft.operators.Relational
  * .upsertLatest]] — update side wins version ties), at HASH-BUCKET
  * granularity: the table is laid out as `bucket=N` partitions
  * (`pmod(xxhash64(keys), nBuckets)`), a batch only READS the buckets its
  * keys hash into (partition pruning) and only REWRITES those buckets
  * (dynamic partition overwrite) — per-batch cost follows the batch's key
  * locality, not the table size.
  *
  * Replay-safe: re-merging an identical batch reproduces each touched
  * bucket byte-for-byte (stored row vs identical update row ties to the
  * update's identical payload), so a checkpoint-replayed batch overwrites
  * its own output — idempotent, same contract as [[IdempotentTableSink]].
  *
  * Size `nBuckets` so one bucket ≈ one comfortable write task; a CDC feed
  * that touches every bucket every batch degrades to a full rewrite — at
  * that churn a log-structured append + compaction
  * ([[Layout.compact]]-style) is the right layout instead.
  */
final class UpsertTableSink(
    targetDir: String,
    keyCols: Seq[String],
    versionCol: String,
    nBuckets: Int) extends Serializable {
  import org.apache.spark.sql.functions._

  import graft.operators.Relational

  require(nBuckets > 0, s"UpsertTableSink: nBuckets must be positive, got $nBuckets")

  def put(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val cols = batch.columns.toSeq :+ "bucket"
    val withB = batch.withColumn("bucket",
      pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong)).cast("int"))
    // a batch touches ≤ nBuckets buckets — a bounded scalar list, not data
    val touched = withB.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val existing =
      try spark.read.parquet(targetDir)
        .filter(col("bucket").isin(touched.map(Int.box): _*))
        .select(cols.map(col): _*)
      catch { case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" =>
        withB.limit(0)
      }
    Relational.upsertLatest(existing, withB.select(cols.map(col): _*),
        keyCols, versionCol)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(targetDir)
  }
}
