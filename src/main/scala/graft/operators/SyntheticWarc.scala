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
