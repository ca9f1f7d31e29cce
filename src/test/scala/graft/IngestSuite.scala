package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

/** Specs for the raw-ingest front door (sources/Ingest.scala): WARC
  * (ISO 28500) container parsing, per-record-gzip layout, graceful
  * truncation, and JSONL quarantine split.
  */
class IngestSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def warcRecord(typ: String, uri: String, payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder
    head ++= "WARC/1.0\r\n"
    head ++= s"WARC-Type: $typ\r\n"
    if (uri.nonEmpty) head ++= s"WARC-Target-URI: $uri\r\n"
    head ++= "WARC-Date: 2026-08-14T00:00:00Z\r\n"
    head ++= "Content-Type: application/http; msgtype=response\r\n"
    head ++= s"Content-Length: ${payload.length}\r\n"
    head ++= "\r\n"
    head.toString.getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
      "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  // payloads include non-UTF8 binary bytes on purpose — WARC payloads are opaque
  private val binPayload = Array[Byte](0x00, 0x7f.toByte, 0xff.toByte, 0xfe.toByte, 65, 66)
  private def records: Seq[Array[Byte]] = Seq(
    warcRecord("warcinfo", "", "software: graft-test\r\n".getBytes(StandardCharsets.ISO_8859_1)),
    warcRecord("response", "https://example.com/a", "<html>hello</html>".getBytes(StandardCharsets.ISO_8859_1)),
    warcRecord("response", "https://example.com/b", binPayload),
    warcRecord("request", "https://example.com/a", "GET /a HTTP/1.1\r\n".getBytes(StandardCharsets.ISO_8859_1)))

  test("warc: plain archive round-trips records, headers and binary payloads") {
    val dir = Files.createTempDirectory("warc_plain")
    Files.write(dir.resolve("crawl-000.warc"), records.flatten.toArray)
    val df = Ingest.readWarc(spark, dir.toString)
    val rows = df.orderBy("record_idx").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ===
      Seq("warcinfo", "response", "response", "request"))
    assert(rows(1).getAs[String]("target_uri") === "https://example.com/a")
    assert(rows(1).getAs[String]("warc_date") === "2026-08-14T00:00:00Z")
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), StandardCharsets.ISO_8859_1)
      === "<html>hello</html>")
    assert(rows(2).getAs[Array[Byte]]("payload").toSeq === binPayload.toSeq,
      "binary payload must survive byte-exact")
    assert(rows(2).getAs[Long]("content_length") === binPayload.length.toLong)
    assert(rows(0).getAs[Map[String, String]]("headers")("Content-Type")
      === "application/http; msgtype=response")
  }

  test("warc: per-record-gzip (.warc.gz, concatenated members) parses identically") {
    val dir = Files.createTempDirectory("warc_gz")
    val out = new ByteArrayOutputStream()
    for (r <- records) { // one gzip member per record — the Common Crawl layout
      val gz = new GZIPOutputStream(out)
      gz.write(r); gz.finish(); gz.close()
    }
    Files.write(dir.resolve("crawl-000.warc.gz"), out.toByteArray)
    val rows = Ingest.readWarc(spark, dir.toString).orderBy("record_idx").collect()
    assert(rows.length === 4)
    assert(rows(2).getAs[Array[Byte]]("payload").toSeq === binPayload.toSeq)
  }

  test("warc: truncated tail keeps the records before the corruption") {
    val dir = Files.createTempDirectory("warc_trunc")
    val whole = records.flatten.toArray
    Files.write(dir.resolve("crawl-001.warc"), whole.dropRight(30)) // cut into last record
    val rows = Ingest.readWarc(spark, dir.toString).collect()
    assert(rows.length === 3, "records before the truncation point must survive")
  }

  test("warc → corpus e2e: crawl archive feeds the text pipeline (strip, langid, dedup, chunk)") {
    import graft.operators.{Dedup, Pipeline, TextAnalysis}
    val dir = Files.createTempDirectory("warc_e2e")
    def page(body: String) =
      s"<html><head><script>var x=1;</script></head><body>$body</body></html>"
    val docs = Seq(
      ("https://a.com/1", page("the quick brown fox jumps over the lazy dog and runs away")),
      ("https://a.com/2", page("the quick brown fox jumps over the lazy dog and runs away")), // dup
      ("https://b.com/1", page("a completely different document about spark query engines")),
      ("https://b.com/2", page("der schnelle braune fuchs springt und die hunde laufen weg")))
    val bytes = docs.flatMap { case (uri, html) =>
      warcRecord("response", uri, html.getBytes(StandardCharsets.ISO_8859_1))
    }.toArray
    Files.write(dir.resolve("crawl-e2e.warc"), bytes)

    // front door: WARC → (uri, text); payload decodes executor-side
    val raw = Ingest.readWarc(spark, dir.toString)
      .filter(col("warc_type") === "response")
      .select(col("target_uri").as("url"),
        col("payload").cast("string").as("html"),
        col("record_idx").cast("long").as("doc_id"))
    // pipeline: markup strip → langid → exact dedup → chunk
    val text = raw.withColumn("text", TextAnalysis.stripMarkup(col("html")))
    val lang = text.withColumn("lang", TextAnalysis.langId(col("text")))
    val kept = Dedup.exactByKey(
        lang.select(md5(col("text").cast("binary")).as("k"), col("doc_id")),
        col("k"), col("doc_id"))
      .join(lang, "doc_id")
    val chunks = Pipeline.chunkTokens(kept, col("doc_id"), col("text"),
      window = 8, stride = 6)

    val keptRows = kept.collect()
    assert(keptRows.length === 3, "exact dedup must fold the duplicate page")
    val langs = kept.select("lang").as[String].collect()
    assert(langs.count(_ == "en") >= 2 && langs.contains("de"),
      s"langid must separate the German page: ${langs.toSeq}")
    assert(kept.filter(col("text").contains("script")).count() === 0,
      "script blocks must die with their content")
    assert(chunks.count() >= 3, "every surviving doc chunks")
  }

  test("jsonl quarantine: valid rows parse, malformed lines land in quarantine verbatim") {
    val dir = Files.createTempDirectory("jsonl")
    val lines = Seq(
      """{"id": 1, "text": "good"}""",
      """{"id": 2, "text": "also good"}""",
      """{"id": 3, "text": "unterminated""",
      """not json at all""",
      """{"id": 4, "text": "fine"}""")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val schema = new StructType().add("id", LongType).add("text", StringType)
    val (valid, quarantine) = Ingest.readJsonlQuarantine(spark, dir.toString, schema)
    assert(valid.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
    val bad = quarantine.select("raw_line").as[String].collect().toSet
    assert(bad === Set("""{"id": 3, "text": "unterminated""", "not json at all"),
      "quarantine must carry the raw lines verbatim for repair")
  }
}
