package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500, the Common Crawl / web-archive record format) — the
  * canonical arrival format of web-scale training corpora. A WARC file
  * is a sequence of records: a `WARC/1.0` version line, CRLF-separated
  * headers (WARC-Type, WARC-Target-URI, Content-Length, …), a blank
  * line, `Content-Length` bytes of payload, and a CRLF CRLF record
  * separator. Response records carry an HTTP message whose body is the
  * document.
  *
  * Parsing is strict (the codec discipline): framing is driven by
  * Content-Length alone — a wrong length desynchronizes the stream and
  * fails loudly on the next version line, truncated payloads and
  * malformed headers raise, nothing is silently skipped.
  *
  * Scale shape: WARC files arrive as binary blobs (one row per file /
  * file-split); [[records]] explodes them to record rows inside
  * mapPartitions — one parser per partition, payloads never touch the
  * driver, and downstream filtering (by type, by URI) runs on columns.
  */
object Warc {

  final case class WarcRecord(warcType: String, targetUri: String,
      recordId: String, payload: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"WARC: $msg")

  /** Parse one WARC file's bytes into its records (strict framing). */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    def line(): String = {
      val start = off
      while (off + 1 < bytes.length &&
        !(bytes(off) == '\r' && bytes(off + 1) == '\n')) off += 1
      if (off + 1 >= bytes.length) fail(s"unterminated header line at $start")
      val s = new String(bytes, start, off - start, "UTF-8")
      off += 2
      s
    }
    while (off < bytes.length) {
      val version = line()
      if (!version.startsWith("WARC/"))
        fail(s"expected a WARC version line, got '${version.take(40)}'")
      var warcType, targetUri, recordId = ""
      var contentLength = -1L
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        if (i <= 0) fail(s"malformed header '${h.take(60)}'")
        val (k, v) = (h.substring(0, i).trim, h.substring(i + 1).trim)
        k.toLowerCase match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => targetUri = v
          case "warc-record-id" => recordId = v
          case "content-length" => contentLength = v.toLong
          case _ => ()
        }
        h = line()
      }
      if (warcType.isEmpty) fail("record without WARC-Type")
      if (contentLength < 0) fail("record without Content-Length")
      if (off + contentLength > bytes.length)
        fail(s"payload overruns file: need $contentLength at $off")
      val payload = java.util.Arrays.copyOfRange(bytes, off,
        off + contentLength.toInt)
      off += contentLength.toInt
      // record separator: CRLF CRLF
      if (off + 4 > bytes.length ||
        bytes(off) != '\r' || bytes(off + 1) != '\n' ||
        bytes(off + 2) != '\r' || bytes(off + 3) != '\n')
        fail(s"missing record separator at $off (bad Content-Length?)")
      off += 4
      out += WarcRecord(warcType, targetUri, recordId, payload)
    }
    out.result()
  }

  /** Body of an HTTP message payload (headers up to the first blank
    * line dropped); a payload without an HTTP status line is returned
    * whole (resource records).
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 5 ||
      new String(payload, 0, 5, "US-ASCII") != "HTTP/") return payload
    var i = 0
    while (i + 3 < payload.length &&
      !(payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 3 >= payload.length) fail("HTTP payload without a blank line")
    java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
  }

  /** Explode a binary `warc` column into record rows — one parser per
    * partition, driver-free. `body` is the HTTP body for response
    * records (headers stripped), the raw payload otherwise.
    */
  def records(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("warc_type", StringType),
      StructField("target_uri", StringType),
      StructField("payload", BinaryType),
      StructField("body", BinaryType)))
    val enc = Encoders.row(schema)
    df.select(col("doc_id"), col("warc")).mapPartitions { rows =>
      rows.flatMap { r =>
        val raw = r.getAs[Array[Byte]](1)
        // sniff the gzip magic: .warc and .warc.gz arrive intermixed
        val recs =
          if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
            (raw(1) & 0xff) == 0x8b) parseGz(raw)
          else parse(raw)
        recs.map { rec =>
          val body =
            if (rec.warcType == "response") httpBody(rec.payload)
            else rec.payload
          Row(r.getLong(0), rec.warcType, rec.targetUri, rec.payload, body)
        }
      }
    }(enc)
  }

  /** Synthesize a per-document WARC `media` column for the gate: each
    * document becomes a 2-record file (warcinfo + an HTTP response
    * whose body is the text) — the arrival shape of a crawled corpus.
    * `gz = true` ships each file in the Common Crawl `.warc.gz` layout
    * (one gzip member per record, concatenated).
    */
  def withWarcColumn(docs: DataFrame, gz: Boolean = false): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("warc", BinaryType)))
    val enc = Encoders.row(schema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val body = r.getString(1).getBytes("UTF-8")
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n")
          .getBytes("US-ASCII") ++ body
        val recs = Seq(
          WarcRecord("warcinfo", "", s"<urn:uuid:info-$id>",
            "software: graft\r\n".getBytes("US-ASCII")),
          WarcRecord("response", s"http://example.org/doc/$id",
            s"<urn:uuid:resp-$id>", http))
        Row(id, if (gz) writeGz(recs) else write(recs))
      }
    }(enc)
  }

  /** Parse a `.warc.gz` — Common Crawl's actual shipping shape: each
    * record is its OWN gzip member and the members are concatenated (so
    * an index can seek to a record without inflating the prefix). The
    * JDK inflater reads concatenated members transparently; framing
    * after inflation is [[parse]] unchanged.
    */
  def parseGz(bytes: Array[Byte]): Seq[WarcRecord] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    parse(out.toByteArray)
  }

  /** Write records as per-member-gzipped WARC bytes (one gzip member
    * per record, concatenated — the Common Crawl layout).
    */
  def writeGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (r <- records) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(write(Seq(r)))
      // close() = finish() + Deflater.end(); finish() alone retains the
      // native deflater buffer until GC — per-record members over a large
      // corpus would accumulate native memory inside mapPartitions
      gz.close()
    }
    out.toByteArray
  }

  /** Write records as WARC bytes (the test/gate synthesizer — also the
    * round-trip witness for [[parse]]).
    */
  def write(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("UTF-8"))
    for (r <- records) {
      w("WARC/1.0\r\n")
      w(s"WARC-Type: ${r.warcType}\r\n")
      if (r.targetUri.nonEmpty) w(s"WARC-Target-URI: ${r.targetUri}\r\n")
      if (r.recordId.nonEmpty) w(s"WARC-Record-ID: ${r.recordId}\r\n")
      w(s"Content-Length: ${r.payload.length}\r\n")
      w("\r\n")
      out.write(r.payload)
      w("\r\n\r\n")
    }
    out.toByteArray
  }
}
