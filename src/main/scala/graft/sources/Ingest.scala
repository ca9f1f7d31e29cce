package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw-data ingestion for the crawl-to-corpus front door: WARC archives
  * (ISO 28500 — the Common Crawl container format) and JSONL with
  * corrupt-record quarantine. The reference ingests via driver-side Python
  * producers (`stream.append`); at 100 TB ingestion must itself be a
  * distributed scan, which these provide.
  *
  * Scale model: WARC corpora ship as many ~1 GB files; the unit of
  * parallelism is the FILE (the Common Crawl convention — gzip members are
  * not independently splittable without an index), via `binaryFile` which
  * distributes one task per file and never collects archives to the
  * driver. Records parse executor-side into (headers, payload) rows;
  * malformed tails degrade gracefully (records before the corruption are
  * kept, the rest of that file is skipped).
  */
object Ingest {

  /** One parsed WARC record: the standard headers hoisted to columns,
    * remaining headers as a map, payload as opaque binary (decode is the
    * multimodal family's job — [[graft.operators.Multimodal]]).
    */
  case class WarcRecord(
      source_file: String,
      record_idx: Int,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      headers: Map[String, String],
      payload: Array[Byte])

  /** Read WARC (or per-record-gzipped .warc.gz) files under `path` into a
    * DataFrame of [[WarcRecord]]s. One task per file; parsing is
    * executor-side and streaming (no whole-archive copies beyond the
    * binaryFile buffer Spark already holds).
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
    files.as[(String, Array[Byte])].flatMap { case (file, bytes) =>
      val in: InputStream = new ByteArrayInputStream(bytes)
      val stream = if (file.endsWith(".gz")) new GZIPInputStream(in) else in
      parseWarcStream(file, stream)
    }.toDF()
  }

  /** Parse every record in one WARC stream. GZIPInputStream reads
    * multi-member archives (the per-record-gzip layout) as one
    * concatenated stream, so both layouts parse identically.
    */
  private[sources] def parseWarcStream(
      file: String, in: InputStream): Seq[WarcRecord] = {
    val out = ArrayBuffer.empty[WarcRecord]
    var idx = 0
    var ok = true
    while (ok) {
      readRecord(file, idx, in) match {
        case Some(rec) => out += rec; idx += 1
        case None => ok = false
      }
    }
    out.toSeq
  }

  /** Read one record: version line, CRLF headers to the blank line,
    * Content-Length payload bytes, trailing CRLF CRLF. None on clean EOF
    * or on any malformed structure (graceful-degrade contract).
    */
  private def readRecord(
      file: String, idx: Int, in: InputStream): Option[WarcRecord] =
    try {
      var line = readLine(in)
      // tolerate extra blank separators between records
      while (line != null && line.isEmpty) line = readLine(in)
      if (line == null) return None
      if (!line.startsWith("WARC/")) return None
      val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var h = readLine(in)
      while (h != null && h.nonEmpty) {
        val colonAt = h.indexOf(':')
        if (colonAt <= 0) return None
        headers += h.substring(0, colonAt).trim -> h.substring(colonAt + 1).trim
        h = readLine(in)
      }
      if (h == null) return None
      val len = headers.getOrElse("Content-Length", return None).toLong
      val payload = readFully(in, len)
      Some(WarcRecord(
        source_file = file,
        record_idx = idx,
        warc_type = headers.getOrElse("WARC-Type", ""),
        target_uri = headers.getOrElse("WARC-Target-URI", ""),
        warc_date = headers.getOrElse("WARC-Date", ""),
        content_type = headers.getOrElse("Content-Type", ""),
        content_length = len,
        headers = headers.toMap,
        payload = payload))
    } catch {
      case _: EOFException | _: NumberFormatException => None
    }

  /** CRLF (or bare-LF) line in ISO-8859-1; null on immediate EOF. */
  private def readLine(in: InputStream): String = {
    val buf = ArrayBuffer.empty[Byte]
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      buf += b.toByte
      b = in.read()
    }
    if (buf.nonEmpty && buf.last == '\r') buf.dropRightInPlace(1)
    new String(buf.toArray, StandardCharsets.ISO_8859_1)
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"WARC payload too large for one record: $n")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n.toInt - off)
      if (k < 0) throw new EOFException(s"payload truncated at $off/$n")
      off += k
    }
    buf
  }

  /** JSONL ingest with quarantine: parse `path` against `schema` in
    * PERMISSIVE mode, split into (valid rows, quarantined raw lines).
    * The quarantine frame carries the raw line for repair pipelines —
    * dropping malformed input silently is how corpora rot.
    *
    * Splittable text scan (line-delimited JSON parallelizes within a
    * file); the corrupt column prunes away from the valid branch, so the
    * happy path pays nothing for the safety net.
    */
  def readJsonlQuarantine(
      spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val corruptCol = "_corrupt_record"
    val withCorrupt = schema.add(corruptCol, "string")
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache() // one scan serves both branches; PERMISSIVE+filter on the
               // corrupt column over an uncached frame is unreliable
               // (Spark requires referencing it from a cached/materialized
               // frame — SPARK-21610)
    val valid = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (valid, quarantine)
  }
}
