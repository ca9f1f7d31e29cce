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
