package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplate: planted repeated segment found; unique text scores 0") {
    val footer = "all rights reserved by the example corporation inc xyz now"
    // 10 words → two 5-word segments, shared verbatim by docs 1-3
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon $footer"),
      (2L, s"one two three four five six seven eight nine ten $footer"),
      (3L, footer),
      (4L, "totally unique words that never repeat anywhere else at all"))
      .toDF("doc_id", "text")
    val out = TextOps.boilerplate(docs, segWords = 5, minDocs = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 3 is NOTHING BUT the footer: both its segments are boilerplate
    assert(out(3L) == ((3L, 2L, 2L, 1.0)))
    // doc 1: 3 segments (15 words), the last two are the footer
    assert(out(1L)._2 == 3L && out(1L)._3 == 2L)
    // doc 2: 4 segments, footer = segments 3-4
    assert(out(2L)._2 == 4L && out(2L)._3 == 2L)
    // unique doc: zero boilerplate
    assert(out(4L)._3 == 0L && out(4L)._4 == 0.0)
    // partition-invariant
    val rep = TextOps.boilerplate(docs.repartition(4), 5, 2)
    assert(rep.exceptAll(TextOps.boilerplate(docs, 5, 2)).isEmpty)
  }

  test("piiScrub: typed masks, stage-consistent counts, clean text untouched") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "server 192.168.001.042 answered"),
      (3L, "call (555)-123-4567 or 555 987 6543"),
      (4L, "all three: a@b.io and 10.0.0.1 and 555-123-4567"),
      // phone-shaped digits INSIDE an email must not count as a phone
      (5L, "billing 555-123-4567@pay.example.com only"),
      (6L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 0 && out(1L)._4 == 0)
    assert(out(2L)._3 == 1)
    assert(out(3L)._4 == 2, "both phone spellings must match")
    assert((out(4L)._2, out(4L)._3, out(4L)._4) == ((1L, 1L, 1L)))
    assert(out(5L)._2 == 1 && out(5L)._4 == 0,
      "digits consumed by the email mask must not also count as a phone")
    assert(out(6L) == ((6L, 0L, 0L, 0L,
      // untouched text hashes identically to the raw input
      java.security.MessageDigest.getInstance("MD5")
        .digest("no pii here at all".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
    // masks actually landed in the scrubbed text
    val scrub4 = docs.filter(col("doc_id") === 4L)
      .select(org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.regexp_replace(col("text"),
            TextOps.EmailPattern, "<EMAIL>"),
          TextOps.Ipv4Pattern, "<IP>"),
        TextOps.PhonePattern, "<PHONE>"))
      .head().getString(0)
    assert(scrub4 == "all three: <EMAIL> and <IP> and <PHONE>")
  }

  test("boilerplate: segment alignment is positional, not sliding") {
    // the same 5 words NOT aligned to a 5-word boundary must not match
    val seg = "v w x y z"
    val docs = Seq(
      (1L, s"$seg padding padding padding padding padding"),
      (2L, s"offset $seg padding padding padding padding")) // shifted by 1
      .toDF("doc_id", "text")
    val out = TextOps.boilerplate(docs, 5, 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.forall(_._3 == 0L), "misaligned segments must not count as shared")
  }

  test("canonicalizeUrl: each rule fires exactly, payload stays untouched") {
    val cases = Seq(
      // scheme+host lowercase; PATH case preserved
      ("HTTPS://Example.COM/Docs/Page", "https://example.com/Docs/Page"),
      // default ports stripped, non-default kept
      ("http://h.com:80/a", "http://h.com/a"),
      ("https://h.com:443/a", "https://h.com/a"),
      ("http://h.com:8080/a", "http://h.com:8080/a"),
      // https:80 is NOT a default port pair — kept
      ("https://h.com:80/a", "https://h.com:80/a"),
      // fragment dropped
      ("http://h.com/a#sec", "http://h.com/a"),
      // tracking params removed in every position; real params survive
      ("http://h.com/a?utm_source=x", "http://h.com/a"),
      ("http://h.com/a?utm_source=x&id=3", "http://h.com/a?id=3"),
      ("http://h.com/a?id=3&gclid=z&fbclid=y", "http://h.com/a?id=3"),
      // dangling ? then trailing / stripped; host root unifies with bare
      ("http://h.com/", "http://h.com"),
      ("http://h.com/a/", "http://h.com/a"),
      // no scheme://host -> host rules skip; query rules still apply
      ("not a url", "not a url"),
      ("/relative/path?utm_source=x", "/relative/path"))
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalizeUrl(col("u"))).as[String].collect()
    for (((in, want), out) <- cases.zip(got))
      assert(out == want, s"canonicalizeUrl($in)")
  }

  test("compressionRatio: exact vs a direct JDK Deflater replay; ordering holds") {
    // repetitive text << prose << near-random noise — the property that
    // makes the ratio a curation signal. No SQL oracle exists (DuckDB
    // cannot deflate), so the gate is rows-only and THIS replay is the
    // correctness pin: same bytes, same fixed level/strategy, byte-equal.
    var x = 0x9E3779B97F4A7C15L
    val noise = new String(Array.fill(400) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      ('a' + (((x * 0x2545F4914F6CDD1DL) >>> 57) % 26).toInt).toChar
    })
    val docs = Seq(
      (1L, "spam spam spam " * 40),                       // repetitive
      (2L, "The quick brown fox jumps over the lazy dog. " +
        "Colorless green ideas sleep furiously near the riverbank. " * 6),
      (3L, noise),                                        // incompressible-ish
      (4L, ""),                                           // empty edge
      (5L, "héllo wörld ünïcode " * 10))                  // multi-byte UTF-8
      .toDF("doc_id", "text")
    val got = TextOps.compressionRatio(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Double])].collect()
    def jdkDeflate(s: String): Long = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(s.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192)
        var t = 0L
        while (!d.finished()) t += d.deflate(buf)
        t
      } finally d.end()
    }
    val texts = Seq("spam spam spam " * 40,
      "The quick brown fox jumps over the lazy dog. " +
        "Colorless green ideas sleep furiously near the riverbank. " * 6,
      noise, "", "héllo wörld ünïcode " * 10)
    for ((row, t) <- got.zip(texts)) {
      assert(row._2 == t.getBytes("UTF-8").length, s"n_bytes doc ${row._1}")
      assert(row._3 == jdkDeflate(t), s"deflate_bytes doc ${row._1}")
    }
    val byId = got.map(r => r._1 -> r._4).toMap
    assert(byId(4L).isEmpty, "empty doc: 0/0 ratio must be null, not a crash")
    assert(byId(1L).get < 0.1, s"repetitive ratio ${byId(1L)}")
    assert(byId(1L).get < byId(2L).get && byId(2L).get < byId(3L).get,
      s"ordering: ${byId(1L)} < ${byId(2L)} < ${byId(3L)}")
    assert(byId(3L).get > 0.5, s"noise ratio ${byId(3L)}")
  }

  test("compressionRatio digests match the independent CPython zlib " +
      "replay at the dev AND gated scales (pinned)") {
    // Pinned constants = tools/compress_replay.py <sfdir> — the
    // text_compress_ratio gate's machine-checked value oracle (r20,
    // verdict r19 #4): the JDK Deflater at DEFAULT_COMPRESSION/nowrap IS
    // zlib raw deflate at level 6, so CPython's independently-built zlib
    // binding replays the native deflate_len expression byte-for-byte.
    // Digest covers (doc_id, n_bytes, deflate_bytes); the ratio is a
    // derived quotient of the two pinned integers. Environment-lineage
    // pin (deflate length is contractual within a zlib build, which the
    // driver's gate environment is), not a cross-platform constant —
    // DeflateLen.scala documents the boundary.
    val digests = Seq(
      "/root/testdata/sf0.001" -> "adcc13a51509028da1b84c5689a261a5",
      "/root/testdata/sf0.01" -> "d553306f09c8ed799f28e61dc569395a")
    for ((sfdir, want) <- digests) {
      val lines = TextOps.compressionRatio(
          spark.read.parquet(s"$sfdir/documents.parquet")
            .select(col("doc_id"), col("text")))
        .orderBy("doc_id")
        .select(col("doc_id"), col("n_bytes"), col("deflate_bytes"))
        .collect()
        .map(r => s"${r.getLong(0)}\t${r.getLong(1)}\t${r.getLong(2)}")
        .toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((lines.mkString("\n") + "\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(md == want,
        s"$sfdir: deflate digest drifted from the pinned zlib replay")
    }
  }

  test("htmlExtract: element strips, entity decode order, case/injection edges") {
    import spark.implicits._
    val rows = Seq(
      (1L, "<p>plain</p>"),
      // SCRIPT/STYLE drop WITH content, case-insensitive, attrs allowed
      (2L, "<SCRIPT type='x'>var a = 1 < 2;</SCRIPT>kept<Style>b{}</Style>"),
      // comments drop; unclosed tag eats to its '>', never past it
      (3L, "<!-- hidden -->a<div\nclass='x'>b</div>c"),
      // decoded &lt; stays literal text (no tag re-opening), and
      // &amp;lt; decodes to the five chars '&lt;' — not to '<'
      (4L, "x &lt;script&gt; y &amp;lt; z"),
      // title extracted, first title wins
      (5L, "<title>T1</title><title>T2</title>body"),
      (6L, ""))
      .toDF("doc_id", "html")
    val out = TextOps.htmlExtract(rows).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == ("", "plain"))
    assert(out(2L) == ("", "kept"))
    assert(out(3L) == ("", "a b c"))
    assert(out(4L) == ("", "x <script> y &lt; z"))
    // title CONTENT stays in the text flow (it is content; only tags
    // strip) — the title COLUMN takes the first title element
    assert(out(5L)._1 == "T1" && out(5L)._2 == "T1 T2 body")
    assert(out(6L) == ("", ""))
  }

  test("stupidBackoffScore: fluent text outscores scrambled; backoff fires; short docs absent") {
    import spark.implicits._
    // reference model: repeated fluent phrases
    val train = (1L to 50L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val scored = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // in-distribution
      (101L, "dog the over quick lazy fox brown the jumps"), // scrambled: unseen bigrams
      (102L, "zyxw qwerty uiop asdf ghjkl"),                 // OOV everywhere
      (103L, "single")                                        // <2 tokens: no transitions
    ).toDF("doc_id", "text")
    val out = TextOps.stupidBackoffScore(train, scored).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(103L), "a transition-less doc produced a row")
    assert(out(100L)._1 == 8 && out(101L)._1 == 8)
    // fluency ordering: in-distribution > scrambled > OOV
    assert(out(100L)._2 > out(101L)._2,
      s"scrambled text did not score below fluent: $out")
    assert(out(101L)._2 > out(102L)._2,
      s"OOV text did not score lowest: $out")
    // the scrambled doc's bigrams are unseen but its WORDS are known —
    // its backoff path must use the unigram counts, landing strictly
    // above the OOV pseudo-count floor (checked via 102's score above)
  }

  test("urlDedup: variant groups unify, lowest id survives") {
    val docs = Seq(
      (1L, "http://h.com/p?id=1"),
      (2L, "HTTP://H.COM:80/p?id=1#x"),
      (3L, "http://h.com/p?id=1&utm_medium=m"),
      (4L, "http://h.com/other")).toDF("doc_id", "url")
    val out = TextOps.urlDedup(docs, col("url"))
      .as[(Long, String, String, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._3).distinct.sorted.toSeq ==
      Seq("http://h.com/other", "http://h.com/p?id=1"))
    assert(out.map(r => (r._1, r._4)).toSeq ==
      Seq((1L, true), (2L, false), (3L, false), (4L, true)))
  }
}
