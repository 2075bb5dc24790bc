package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic WARC lake for the ingestion oracle rows
  * (q122/q123) — `SyntheticMedia`'s decode-inclusive discipline applied to
  * the web-capture source format: every file's bytes are REAL WARC (CRLF
  * headers, Content-Length framing, one gzip member per record — the
  * Common Crawl layout), built in closed form from the documents table, so
  * `Warc.parseRecords` exercises the exact production path while DuckDB
  * re-derives every expected field (URI, byte length, text) from the same
  * table. Each file bundles its docs (`doc_id % nFiles`) in doc_id order
  * behind a leading `warcinfo` record, so multi-record files, multi-member
  * gzip concatenation, AND the record-type filter are all under the hash
  * compare.
  *
  * The generator is the test harness's side of the seam — production
  * ingestion reads real files via `Warc.records`; the parser is the same
  * code either way. */
object SyntheticWarc {

  /** (file_id, payload = `.warc.gz` bytes) over a driver table: docs
    * bundled by `doc_id % nFiles`, one gzip member per record. `wet = true`
    * emits WET-style `conversion` records (extracted text), else `response`
    * captures with `Content-Type: text/plain`. */
  def warcFrame(docs: DataFrame, nFiles: Int = 50,
                wet: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (fid, it) =>
        val bos = new ByteArrayOutputStream(1 << 16)
        def member(rec: Array[Byte]): Unit = {
          val g = new GZIPOutputStream(bos)
          g.write(rec); g.finish()
        }
        member(warcinfo(fid))
        it.toArray.sortBy(_._1).foreach { case (d, text) =>
          member(record(d, text, wet))
        }
        (fid, bos.toByteArray)
      }
      .toDF("file_id", "payload")
  }

  /** One record's uncompressed bytes — also the spec fixtures' builder. */
  def record(d: Long, text: String, wet: Boolean): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val recType = if (wet) "conversion" else "response"
    val header =
      s"WARC/1.0\r\n" +
      s"WARC-Type: $recType\r\n" +
      s"WARC-Record-ID: <urn:graft:doc:$d>\r\n" +
      s"WARC-Target-URI: ${uri(d)}\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    header.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  def uri(d: Long): String = s"http://graft.test/doc/$d"

  /** (file_id, payload) lake of TRUE HTTP response captures — the shape a
    * real Common Crawl `.warc.gz` has (WARC-level content type
    * `application/http; msgtype=response`, payload = full HTTP message) —
    * so q125 puts the envelope math itself under the driver's hash compare.
    * Deterministic per-doc variants cover the parse surface:
    *   - doc_id % 11 == 3 → status `404 Not Found` (else `200 OK`): the
    *     status-line walk and wetDocs' 2xx gate.
    *   - doc_id % 7 == 2 → `application/pdf` body: the HTTP-level (not
    *     WARC-level) media-type filter must drop it.
    *   - else by doc_id % 3:
    *     0 → `text/plain; charset=UTF-8`, Content-Length framing, with two
    *         junk bytes after the body inside the WARC frame (the parser
    *         must truncate to the HTTP Content-Length);
    *     1 → lowercase `content-type: text/html` (header case-insensitivity,
    *         charset-absent UTF-8 default) with `Transfer-Encoding: chunked`
    *         — 13-byte chunks, an extension on the first size line, ending
    *         `0` chunk + trailer;
    *     2 → `text/plain; charset=ISO-8859-1`, body = text + " café"
    *         encoded LATIN-1 (the é is ONE byte, 0xE9 — a parser that
    *         ignores the charset and decodes UTF-8 corrupts it). */
  def httpWarcFrame(docs: DataFrame, nFiles: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (fid, it) =>
        val bos = new ByteArrayOutputStream(1 << 16)
        def member(rec: Array[Byte]): Unit = {
          val g = new GZIPOutputStream(bos)
          g.write(rec); g.finish()
        }
        member(warcinfo(fid))
        it.toArray.sortBy(_._1).foreach { case (d, text) =>
          member(httpRecord(d, text))
        }
        (fid, bos.toByteArray)
      }
      .toDF("file_id", "payload")
  }

  /** (file_id, payload) lake of LINK-RICH HTML captures: plain 200
    * `text/html` responses whose bodies carry the q135 crawl shape — a hub
    * link on the page's own site, a root-relative next link, and a
    * cross-site link — plus the document text. Pages spread over `nSites`
    * hosts (`https://site<d%nSites>.example.com/p/<d>`). The e2e fixture
    * for crawl-to-corpus WITH the host-rank prior and the robots gate: the
    * link structure is real enough to extract/resolve/rank, and every
    * capture still walks the full HTTP envelope path. */
  def htmlWarcFrame(docs: DataFrame, nFiles: Int = 50,
                    nSites: Int = 23): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.count()
    docs.select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (fid, it) =>
        val bos = new ByteArrayOutputStream(1 << 16)
        def member(rec: Array[Byte]): Unit = {
          val g = new GZIPOutputStream(bos)
          g.write(rec); g.finish()
        }
        member(warcinfo(fid))
        it.toArray.sortBy(_._1).foreach { case (d, text) =>
          member(htmlRecord(d, text, n, nSites))
        }
        (fid, bos.toByteArray)
      }
      .toDF("file_id", "payload")
  }

  /** One link-rich HTML capture (see [[htmlWarcFrame]]). */
  def htmlRecord(d: Long, text: String, nDocs: Long, nSites: Int): Array[Byte] = {
    val s = d % nSites
    val esc = text.replace("&", "&amp;").replace("<", "&lt;")
    val html =
      s"""<html><head><title>Page $d</title></head><body><h1>Page $d</h1>
         |<p>$esc</p>
         |<a href="https://site$s.example.com/p/${d % 10}">hub ${d % 10}</a>
         |<a href='/p/${(d * 7 + 1) % nDocs}'>next ${d % 7}</a>
         |<a href="https://site${(d + 1) % nSites}.example.com/p/${(d * 13 + 5) % nDocs}">cross</a>
         |</body></html>""".stripMargin
    val body = html.getBytes(UTF_8)
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
    val header =
      s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:doc:$d>\r\n" +
      s"WARC-Target-URI: https://site$s.example.com/p/$d\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n"
    header.getBytes(UTF_8) ++ http ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** One HTTP response capture's uncompressed WARC bytes (see
    * [[httpWarcFrame]] for the per-doc variant map). */
  def httpRecord(d: Long, text: String): Array[Byte] = {
    val statusLine =
      if (d % 11 == 3) "HTTP/1.1 404 Not Found" else "HTTP/1.1 200 OK"
    val http: Array[Byte] =
      if (d % 7 == 2) {
        val body = s"%PDF-1.4 synthetic $d".getBytes(UTF_8)
        (s"$statusLine\r\n" +
         s"Content-Type: application/pdf\r\n" +
         s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
      } else d % 3 match {
        case 0 =>
          // sub-variant d%7==3: the body is stored AS TRANSMITTED with
          // `Content-Encoding: gzip` (ISO 28500 keeps the wire form) — the
          // parser must gunzip it or the text turns to binary soup
          if (d % 7 == 3) {
            val gz = new ByteArrayOutputStream()
            val g = new GZIPOutputStream(gz)
            g.write(text.getBytes(UTF_8)); g.finish()
            val body = gz.toByteArray
            (s"$statusLine\r\n" +
             s"Content-Type: text/plain; charset=UTF-8\r\n" +
             s"Content-Encoding: gzip\r\n" +
             s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
          } else {
            val body = text.getBytes(UTF_8)
            (s"$statusLine\r\n" +
             s"Content-Type: text/plain; charset=UTF-8\r\n" +
             s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++
              body ++ "\r\n".getBytes(UTF_8) // junk past Content-Length
          }
        case 1 =>
          // sub-variant d%5==2: NO charset anywhere in the headers — the
          // body declares it via <meta charset="ISO-8859-1"> and carries a
          // LATIN-1 é, so only header->meta sniffing decodes it right
          val body =
            if (d % 5 == 2)
              ("<meta charset=\"ISO-8859-1\">" + text + " café")
                .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
            else text.getBytes(UTF_8)
          val chunks = new ByteArrayOutputStream(body.length + 64)
          var off = 0
          var first = true
          while (off < body.length) {
            val n = math.min(13, body.length - off)
            val ext = if (first) ";synthetic=1" else ""
            chunks.write(s"${n.toHexString}$ext\r\n".getBytes(UTF_8))
            chunks.write(body, off, n)
            chunks.write("\r\n".getBytes(UTF_8))
            off += n; first = false
          }
          chunks.write("0\r\nX-Trailer: t\r\n\r\n".getBytes(UTF_8))
          (s"$statusLine\r\n" +
           s"content-type: text/html\r\n" +
           s"Transfer-Encoding: chunked\r\n\r\n").getBytes(UTF_8) ++
            chunks.toByteArray
        case _ =>
          val body = (text + " café")
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          (s"$statusLine\r\n" +
           s"Content-Type: text/plain; charset=ISO-8859-1\r\n" +
           s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
      }
    val header =
      s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:doc:$d>\r\n" +
      s"WARC-Target-URI: ${uri(d)}\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n"
    header.getBytes(UTF_8) ++ http ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def warcinfo(fid: Long): Array[Byte] = {
    val payload = s"software: graft-ingest\r\nfile: $fid\r\n".getBytes(UTF_8)
    val header =
      s"WARC/1.0\r\n" +
      s"WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <urn:graft:file:$fid>\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    header.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }
}
