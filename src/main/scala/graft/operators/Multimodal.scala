package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * environment): `decodeFeaturesStub` produces a deterministic fake feature
  * vector from the bytes. Everything AROUND the stub — schema, batch shape,
  * partition-local processing, metadata propagation — is real and tested,
  * so swapping the stub for a JNI/ONNX decoder changes one function.
  *
  * Scale notes: media rows are large → `binary` payloads should ride in
  * their own column so column pruning skips them unless needed; feature
  * extraction is mapPartitions (one decoder init per partition, batched
  * rows through it — the JVM analogue of `mapInPandas` batch processing).
  */
object Multimodal {

  val FeatureDim = 16

  /** media envelope: payload + typed metadata (the typed-metadata analogue
    * of the reference's schemaless payload dicts).
    */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Build a synthetic media table from any (id, text) source: payload =
    * utf-8 bytes, metadata derived deterministically. Test fixture path.
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol).cast("long"), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col(idCol).cast("long"), lit(48)) * 16 + 16).cast("int").as("height"),
      (length(col(textCol)) * 10).cast("long").as("duration_ms"))

  /** STUB decoder: deterministic fake features from content bytes.
    * Real implementation would decode pixels/samples here; the signature,
    * batching, and output schema are the real contract.
    */
  private def decodeFeaturesStub(content: Array[Byte]): Array[Float] = {
    // ??? — real decode unavailable in this container; deterministic fake:
    // feature j = scaled byte-sum of the j-th stride of the payload.
    val out = new Array[Float](FeatureDim)
    var j = 0
    while (j < FeatureDim) {
      var acc = 0L
      var i = j
      while (i < content.length) { acc += (content(i) & 0xFF); i += FeatureDim }
      out(j) = (acc % 1000L) / 1000.0f
      j += 1
    }
    out
  }

  /** Feature extraction over media rows: partition-local, batched — one
    * decoder context per partition, rows streamed through in groups of
    * `batchSize` (the mapInPandas batch shape).
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("media_type"), col("content"))
      .mapPartitions { rows =>
        // decoder init would happen HERE, once per partition
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val feats = decodeFeaturesStub(r.getAs[Array[Byte]]("content"))
            Row(r.getLong(0), r.getString(1), feats.toSeq)
          }
        }
      }(enc)
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp (every `everyMs`) — pure relational explode, no decode.
    */
  def frameSample(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))

  /** Resize metadata transform (decode-free plumbing): target box with
    * aspect preserved, integer math only.
    */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame =
    media.filter(col("media_type") === "image")
      .withColumn("scale_num", lit(maxDim))
      .withColumn("scale_den", greatest(col("width"), col("height")))
      .select(col("media_id"), col("width"), col("height"),
        (col("width") * col("scale_num") / col("scale_den")).cast("int").as("out_width"),
        (col("height") * col("scale_num") / col("scale_den")).cast("int").as("out_height"))
}
