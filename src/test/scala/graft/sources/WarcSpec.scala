package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  import Warc._

  private val recs = Seq(
    WarcRecord("warcinfo", "", "<urn:uuid:1>", "software: x\r\n".getBytes),
    WarcRecord("response", "http://a.example/p", "<urn:uuid:2>",
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello body".getBytes),
    WarcRecord("resource", "http://a.example/r", "<urn:uuid:3>",
      Array[Byte](0, 1, 2, 254.toByte))) // binary payload, no HTTP framing

  test("write/parse round-trip preserves every record and payload byte") {
    val parsed = parse(write(recs))
    assert(parsed.map(_.warcType) == Seq("warcinfo", "response", "resource"))
    assert(parsed.map(_.targetUri) == Seq("", "http://a.example/p", "http://a.example/r"))
    for ((a, b) <- parsed.zip(recs))
      assert(a.payload.toSeq == b.payload.toSeq)
  }

  test("httpBody strips headers from HTTP payloads, passes others whole") {
    assert(new String(httpBody(recs(1).payload)) == "hello body")
    assert(httpBody(recs(2).payload).toSeq == recs(2).payload.toSeq)
    // empty body after headers
    assert(httpBody("HTTP/1.1 204 No Content\r\n\r\n".getBytes).isEmpty)
  }

  test("strict framing: corruption desynchronizes loudly, never silently skips") {
    val ok = write(recs)
    // truncations at every structural boundary
    for (cut <- Seq(3, 10, ok.length / 2, ok.length - 1))
      intercept[IllegalArgumentException](parse(java.util.Arrays.copyOf(ok, cut)))
    // a wrong Content-Length desynchronizes -> next version line fails
    val bad = new String(ok, "ISO-8859-1")
      .replaceFirst("Content-Length: 13", "Content-Length: 11")
      .getBytes("ISO-8859-1")
    intercept[IllegalArgumentException](parse(bad))
    // malformed header line
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nno-colon-here\r\n\r\n".getBytes))
    // missing WARC-Type / Content-Length
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes))
    intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nWARC-Type: resource\r\n\r\n".getBytes))
  }

  test("warc.gz: per-record gzip members round-trip; member boundaries irrelevant") {
    val gz = writeGz(recs)
    // gzip magic present, and the members are CONCATENATED (more than
    // one member header in the stream)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    assert(gz.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b) >= 3)
    val parsed = parseGz(gz)
    assert(parsed.map(_.warcType) == recs.map(_.warcType))
    for ((a, b) <- parsed.zip(recs)) assert(a.payload.toSeq == b.payload.toSeq)
    // truncated mid-member fails loudly
    intercept[Throwable](parseGz(java.util.Arrays.copyOf(gz, gz.length / 2)))
  }

  test("a payload containing WARC/1.0 text does not confuse the framing") {
    // length-driven framing must sail straight past record-like bytes
    val tricky = Seq(WarcRecord("resource", "u", "<id>",
      "WARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 999\r\n\r\n".getBytes),
      recs(1))
    val parsed = parse(write(tricky))
    assert(parsed.size == 2 && parsed(1).warcType == "response")
  }
}
