package graft.sources

import org.apache.spark.sql.functions.col
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

  // --------------------------------------------- splittable .warc.gz

  /** A multi-megabyte corpus whose bodies PLANT sync bait: raw gzip
    * magic bytes followed by WARC/ text — a mid-split sync scan that
    * trusts the magic alone would lock onto them.
    */
  private def bigCorpus(n: Int): Seq[WarcRecord] = (0 until n).map { i =>
    val bait = Array[Byte](0x1f, 0x8b.toByte, 0x08) ++ "WARC/1.0\r\n".getBytes
    // deterministic noise defeats deflate so the fixture stays multi-MB
    var x = 0x9E3779B97F4A7C15L * (i + 1)
    val noise = Array.fill(600 + i % 700) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      ((x * 0x2545F4914F6CDD1DL) >>> 56).toByte
    }
    val body = (s"doc $i " * (20 + i % 50)).getBytes ++ bait ++ noise ++
      (s"tail $i".getBytes)
    WarcRecord("response", s"http://x.example/$i", s"<urn:uuid:r$i>",
      "HTTP/1.1 200 OK\r\n\r\n".getBytes ++ body)
  }

  test("splitRecords: every split size yields the same records exactly once") {
    val corpus = bigCorpus(3000)
    val gz = writeGz(corpus)
    assert(gz.length > (1 << 20), s"fixture only ${gz.length} bytes")
    val fileLen = gz.length.toLong
    def runAt(splitSize: Int): Seq[(Long, WarcRecord)] = {
      val starts = 0L.until(fileLen, splitSize.toLong)
      starts.flatMap { s =>
        val e = math.min(s + splitSize, fileLen)
        var pos = e // readMore serves bytes after the initial range
        val first = java.util.Arrays.copyOfRange(gz, s.toInt, e.toInt)
        splitRecords(first, s, e, fileLen, n => {
          val m = math.min(pos + n, fileLen)
          val r = java.util.Arrays.copyOfRange(gz, pos.toInt, m.toInt)
          pos = m; r
        }).toSeq
      }
    }
    val whole = runAt(gz.length)
    assert(whole.size == corpus.size)
    for (splitSize <- Seq(64 << 10, 256 << 10, 1 << 20)) {
      val got = runAt(splitSize)
      assert(got.size == corpus.size, s"splitSize=$splitSize")
      // same records, same order, byte-identical payloads, offsets strict
      assert(got.map(_._1) == whole.map(_._1), s"splitSize=$splitSize offsets")
      for (((_, a), b) <- got.zip(corpus))
        assert(a.recordId == b.recordId && a.payload.toSeq == b.payload.toSeq)
      assert(got.map(_._1).sliding(2).forall(w => w.size < 2 || w(0) < w(1)))
      // parallelism is real: >1 split produced records
      val nonEmpty = 0L.until(fileLen, splitSize.toLong).count { s =>
        whole.exists(r => r._1 >= s && r._1 < math.min(s + splitSize, fileLen))
      }
      assert(nonEmpty >= 2, s"splitSize=$splitSize used $nonEmpty splits")
    }
  }

  test("splitRecords: post-sync corruption fails loudly, not as silent skip") {
    val corpus = bigCorpus(200)
    val gz = writeGz(corpus)
    // corrupt a deflate byte of a member in the middle of the file
    val m = gz.clone()
    m(m.length / 2) = (m(m.length / 2) ^ 0x55).toByte
    val fileLen = m.length.toLong
    intercept[Throwable] {
      val got = splitRecords(m, 0, fileLen, fileLen, _ => Array.emptyByteArray).toSeq
      // if the CRC happened to survive the flip (it cannot), the count check
      assert(got.size == corpus.size)
      for (((_, a), b) <- got.zip(corpus)) assert(a.payload.toSeq == b.payload.toSeq)
    }
  }

  test("splitRecords: a member cut off at physical EOF raises from the sync scan too") {
    // The sync scan must distinguish payload bytes that merely look like
    // a member from a GENUINE member start whose file ends mid-member
    // (a truncated crawl tail): skipping the latter silently drops
    // records. Build a file whose LAST member is half-truncated, then
    // sync from inside the second-to-last member so the truncated
    // member start is the only candidate in range.
    val corpus = bigCorpus(40)
    val gz = writeGz(corpus)
    // walk member boundaries with the strict inflater
    var offs = List(0)
    while ({
      val (_, comp) = inflateMember(gz, offs.head)
      val next = offs.head + comp
      if (next < gz.length) { offs = next :: offs; true } else false
    }) ()
    val last = offs.head          // start of the final member
    val prev = offs.tail.head     // start of the second-to-last member
    val lastLen = gz.length - last
    val truncLen = last + math.max(40, lastLen / 2) // header + some deflate
    val m = java.util.Arrays.copyOf(gz, truncLen)
    val fileLen = m.length.toLong
    val start = (prev + 8).toLong // mid-member: forces a sync scan
    val ex = intercept[IllegalArgumentException] {
      splitRecords(java.util.Arrays.copyOfRange(m, start.toInt, m.length),
        start, fileLen, fileLen, _ => Array.emptyByteArray).toSeq
    }
    assert(ex.isInstanceOf[Warc.TruncatedMember], ex.toString)

    // The undecidable tails default to LOUD too (previously silently
    // skipped, dropping the record): truncation INSIDE the final
    // member's gzip header (4 bytes: magic + CM + FLG, no deflate output
    // possible), and truncation before 5 output bytes inflate (header
    // complete + 1 deflate byte).
    for (cut <- Seq(last + 4, -1)) {
      val truncAt = if (cut >= 0) cut else {
        // walk past the fixed 10-byte header (test members carry no
        // optional fields) plus one deflate byte
        last + 11
      }
      val mm = java.util.Arrays.copyOf(gz, truncAt)
      val ex2 = intercept[IllegalArgumentException] {
        splitRecords(java.util.Arrays.copyOfRange(mm, start.toInt, mm.length),
          start, mm.length.toLong, mm.length.toLong,
          _ => Array.emptyByteArray).toSeq
      }
      assert(ex2.isInstanceOf[Warc.TruncatedMember],
        s"cut at $truncAt: $ex2")
    }
  }

  test("readGzSplits: one big file through many Spark tasks, bodies intact") {
    val spark = graft.SparkSpec.session
    val corpus = bigCorpus(2500)
    val gz = writeGz(corpus)
    assert(gz.length > (1 << 20))
    val dir = java.nio.file.Files.createTempDirectory("warc_split").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "big.warc.gz")
    java.nio.file.Files.write(f.toPath, gz)
    val splitSize = 256L << 10
    val nSplits = ((gz.length + splitSize - 1) / splitSize).toInt
    assert(nSplits >= 4, s"fixture spans only $nSplits splits")
    val df = Warc.readGzSplits(spark, f.getAbsolutePath, splitSize)
    val rows = df.selectExpr("rec_offset", "target_uri", "md5(body) AS m")
      .orderBy("rec_offset").collect()
    assert(rows.length == corpus.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((row, rec) <- rows.zip(corpus)) {
      assert(row.getString(1) == rec.targetUri)
      val expect = md.digest(httpBody(rec.payload))
        .map("%02x".format(_)).mkString
      md.reset()
      assert(row.getString(2) == expect, s"body mismatch at ${rec.recordId}")
    }
    // the plan genuinely fans out: as many input partitions as splits
    assert(df.rdd.getNumPartitions >= nSplits)
  }

  test("DSv2 warcgz format: same records, pruning reaches the scan") {
    val spark = graft.SparkSpec.session
    val corpus = bigCorpus(1500)
    val gz = writeGz(corpus)
    val dir = java.nio.file.Files.createTempDirectory("warc_dsv2").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "a.warc.gz")
    java.nio.file.Files.write(f.toPath, gz)
    val df = spark.read.format("warcgz")
      .option("splitSize", 256 << 10)
      .load(f.getAbsolutePath)
    // record-for-record identical to the function-style reader
    val viaFn = Warc.readGzSplits(spark, f.getAbsolutePath, 256L << 10)
      .selectExpr("rec_offset", "record_id", "md5(body) AS m")
    val viaFmt = df.selectExpr("rec_offset", "record_id", "md5(body) AS m")
    assert(viaFmt.exceptAll(viaFn).isEmpty && viaFn.exceptAll(viaFmt).isEmpty)
    assert(df.count() == corpus.size)
    // column pruning reaches the source: a target_uri-only projection
    // must not carry payload/body through the scan
    val pruned = df.select("target_uri")
    val leaf = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("target_uri"), leaf)
    assert(!leaf.contains("payload") && !leaf.contains("body"),
      s"projection leaked into the scan: $leaf")
    assert(pruned.distinct().count() == corpus.size)
  }

  test("DSv2 warcgz: pushed warc_type filter reaches the scan; point reads by rec_offset") {
    val spark = graft.SparkSpec.session
    val mixed = bigCorpus(200).zipWithIndex.map { case (r, i) =>
      if (i % 3 == 0) r.copy(warcType = "metadata") else r
    }
    val gz = writeGz(mixed)
    val dir = java.nio.file.Files.createTempDirectory("warc_pf").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "m.warc.gz")
    java.nio.file.Files.write(f.toPath, gz)
    val df = spark.read.format("warcgz").option("splitSize", 128 << 10)
      .load(f.getAbsolutePath)
    val responses = df.filter(col("warc_type") === "response")
    // the pushed filter is visible on the scan leaf, and the residual
    // re-evaluation keeps results exact
    val leaf = responses.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("type=response"), leaf)
    assert(responses.count() == mixed.count(_.warcType == "response"))
    // rec_offset is a REAL seek address: point-read 5 records by offset
    val sample = df.selectExpr("rec_offset", "record_id")
      .orderBy("rec_offset").collect().grouped(40).map(_.head).toSeq
    val conf = spark.sparkContext.hadoopConfiguration
    for (r <- sample) {
      val rec = Warc.readRecordAt(conf, f.getAbsolutePath, r.getLong(0))
      assert(rec.recordId == r.getString(1), s"offset ${r.getLong(0)}")
    }
  }

  test("DSv2 warcgz streaming: arriving archive files == batch, exactly once") {
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("warc_ms").toFile
    dir.deleteOnExit()
    def land(name: String, ids: Range): Unit = {
      // atomic land: the running stream's listing must never observe a
      // half-written archive
      val tmp = new java.io.File(dir, s".$name.tmp").toPath
      java.nio.file.Files.write(tmp,
        writeGz(ids.map(i => WarcRecord("response", s"http://s/$i",
          s"<urn:uuid:s$i>",
          ("HTTP/1.1 200 OK\r\n\r\nstream doc " + i).getBytes("UTF-8")))))
      java.nio.file.Files.move(tmp, new java.io.File(dir, name).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    land("s1.warc.gz", 0 until 6)
    val q = spark.readStream.format("warcgz")
      .option("splitSize", 1 << 10)
      .load(dir.getAbsolutePath + "/*.warc.gz")
      .selectExpr("record_id", "md5(body) AS m")
      .writeStream.format("memory").queryName("warcgz_ms")
      .outputMode("append").start()
    q.processAllAvailable()
    val afterB1 = spark.table("warcgz_ms").count()
    assert(afterB1 == 6, s"first batch delivered $afterB1")
    land("s2.warc.gz", 6 until 15)
    q.processAllAvailable()
    // already-seen files are NOT reprocessed; new file fully delivered
    q.processAllAvailable()
    val stream = spark.table("warcgz_ms")
    q.stop()
    assert(stream.count() == 15, "exactly-once per landed file")
    val batch = spark.read.format("warcgz")
      .load(dir.getAbsolutePath + "/*.warc.gz")
      .selectExpr("record_id", "md5(body) AS m")
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "streaming face diverged from the batch scan")
  }

  test("streaming crawl pipeline: arriving HTML archives -> extracted curated text == batch") {
    // the round-13 capstone's STREAMING face: the same
    // htmlExtract + qualityScore transforms the batch gate
    // (text_warc_html_curation) hash-checks run unchanged over
    // `readStream.format("warcgz")` — arriving crawl segments become
    // curation verdicts incrementally, exactly once per landed file.
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("warc_hs").toFile
    dir.deleteOnExit()
    def page(i: Int): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><head><title>Doc $i</title><script>t();</script></head>" +
        s"<body><p>crawl doc number $i body text</p></body></html>")
        .getBytes("UTF-8")
    def land(name: String, ids: Range): Unit = {
      // atomic land: see the DSv2 streaming test above
      val tmp = new java.io.File(dir, s".$name.tmp").toPath
      java.nio.file.Files.write(tmp,
        writeGz(ids.map(i => WarcRecord("response", s"http://h/$i",
          s"<urn:uuid:h-$i>", page(i)))))
      java.nio.file.Files.move(tmp, new java.io.File(dir, name).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val pages = df.filter(col("warc_type") === "response")
        .select(regexp_extract(col("record_id"), "-(\\d+)>$", 1)
          .cast("long").as("doc_id"),
          col("body").cast("string").as("html"))
      graft.operators.TextOps.htmlExtract(pages)
        .select(col("doc_id"), col("title"), col("clean_text"))
    }
    land("h1.warc.gz", 0 until 5)
    val q = curate(spark.readStream.format("warcgz")
        .load(dir.getAbsolutePath + "/*.warc.gz"))
      .writeStream.format("memory").queryName("warc_html_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("warc_html_stream").count() == 5)
    land("h2.warc.gz", 5 until 12)
    q.processAllAvailable()
    val stream = spark.table("warc_html_stream")
    q.stop()
    assert(stream.count() == 12, "exactly-once per landed segment")
    // extracted text is correct and identical to the batch pipeline
    val row = stream.filter(col("doc_id") === 7).head()
    assert(row.getString(1) == "Doc 7" &&
      row.getString(2) == "Doc 7 crawl doc number 7 body text")
    val batch = curate(spark.read.format("warcgz")
      .load(dir.getAbsolutePath + "/*.warc.gz"))
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "streaming curation diverged from the batch pipeline")
  }

  test("DSv2 warcgz write: distributed round-trip through the format") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val corpus = bigCorpus(600)
    val dir = java.nio.file.Files.createTempDirectory("warc_w").toFile
    dir.deleteOnExit()
    val rows = corpus.map(r => (r.warcType, r.targetUri, r.recordId, r.payload))
    rows.toDF("warc_type", "target_uri", "record_id", "payload")
      .repartition(3)
      .write.format("warcgz").mode("overwrite").save(dir.getAbsolutePath)
    // several tasks => several objects (the object-store pattern)
    val parts = dir.listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(parts.length == 3, parts.map(_.getName).toSeq.toString)
    // read back through the format: every record, every payload byte
    val back = spark.read.format("warcgz")
      .load(dir.getAbsolutePath + "/*.warc.gz")
      .selectExpr("record_id", "md5(payload) AS m").as[(String, String)]
      .collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = corpus.map { r =>
      val h = md.digest(r.payload).map("%02x".format(_)).mkString
      md.reset(); (r.recordId, h)
    }.toSet
    assert(back == want)
    // overwrite truncates: a second smaller write leaves only its rows
    rows.take(10).toDF("warc_type", "target_uri", "record_id", "payload")
      .repartition(1)
      .write.format("warcgz").mode("overwrite").save(dir.getAbsolutePath)
    assert(spark.read.format("warcgz")
      .load(dir.getAbsolutePath + "/*.warc.gz").count() == 10)
  }

  test("DSv2 warcgz write: a FAILED overwrite leaves the previous contents intact") {
    // Truncation is deferred to BatchWrite.commit and job abort deletes
    // committed task objects, so a job that dies mid-write must leave
    // the destination exactly as it was — never truncated-then-partial.
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_fail").toFile
    dir.deleteOnExit()
    val good = (0 until 20).map(i =>
      ("response", s"http://g/$i", s"<urn:uuid:g$i>", s"ok $i".getBytes))
    good.toDF("warc_type", "target_uri", "record_id", "payload")
      .repartition(2)
      .write.format("warcgz").mode("overwrite").save(dir.getAbsolutePath)
    def objects() = dir.listFiles().filter(_.getName.endsWith(".warc.gz"))
      .map(f => f.getName -> f.length).toMap
    val before = objects()
    assert(before.size == 2)
    // one partition is fine, the other violates the writer's non-null
    // contract → its task fails → the JOB aborts after some tasks may
    // already have committed
    val bad = Seq(
      ("response", "http://b/0", "<urn:uuid:b0>", "fine".getBytes),
      (null: String, "http://b/1", "<urn:uuid:b1>", "boom".getBytes))
    intercept[Exception] {
      bad.toDF("warc_type", "target_uri", "record_id", "payload")
        .repartition(2)
        .write.format("warcgz").mode("overwrite").save(dir.getAbsolutePath)
    }
    val after = objects()
    assert(after == before,
      s"failed overwrite mutated the destination: $before -> $after")
    assert(spark.read.format("warcgz")
      .load(dir.getAbsolutePath + "/*.warc.gz").count() == 20)
  }

  test("warcgz manifest fence: stray committed-task objects are invisible until the next successful commit") {
    // The deferred-truncation protocol writes attempt objects into the
    // LIVE destination; without a fence, a driver death after task
    // commits (or a concurrent read mid-job) surfaces OLD + NEW records
    // mixed. The _committed manifest names the current generation; every
    // reader filters to it.
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_fence").toFile
    dir.deleteOnExit()
    val gen1 = (0 until 20).map(i =>
      ("response", s"http://f/$i", s"<urn:uuid:f$i>", s"g1 $i".getBytes))
    gen1.toDF("warc_type", "target_uri", "record_id", "payload")
      .repartition(2)
      .write.format("warcgz").mode("overwrite").save(dir.getAbsolutePath)
    def manifests() = dir.listFiles.map(_.getName)
      .filter(_.startsWith("_committed")).sorted.toSeq
    assert(manifests() == Seq("_committed.1"),
      s"expected one versioned manifest, got ${manifests()}")
    // simulate a died-before-job-commit overwrite: a complete, VALID
    // object sitting in the destination but absent from the manifest
    val stray = new java.io.File(dir, "part-99999-999.warc.gz")
    java.nio.file.Files.write(stray.toPath, Warc.writeGz(Seq(
      Warc.WarcRecord("response", "http://stray/x", "<urn:uuid:stray>",
        "stray".getBytes))))
    def glob = dir.getAbsolutePath + "/*.warc.gz"
    assert(spark.read.format("warcgz").load(glob).count() == 20,
      "DSv2 read surfaced a manifest-invisible stray")
    assert(Warc.readGzSplits(spark, glob).count() == 20,
      "readGzSplits surfaced a manifest-invisible stray")
    // append unions its objects into the manifest; the stray stays out
    Seq(("response", "http://f/app", "<urn:uuid:fapp>", "g2".getBytes))
      .toDF("warc_type", "target_uri", "record_id", "payload")
      .repartition(1)
      .write.format("warcgz").mode("append").save(dir.getAbsolutePath)
    assert(spark.read.format("warcgz").load(glob).count() == 21)
    // the next successful overwrite clears the stray from disk
    Seq(("response", "http://f/g3", "<urn:uuid:fg3>", "g3".getBytes))
      .toDF("warc_type", "target_uri", "record_id", "payload")
      .repartition(1)
      .write.format("warcgz").mode("overwrite").save(dir.getAbsolutePath)
    assert(!stray.exists, "overwrite did not clear the stray")
    assert(spark.read.format("warcgz").load(glob).count() == 1)
    // publications are versioned (_committed.<epoch>, readers pick the
    // max): nothing was deleted before its successor became visible, and
    // superseded epochs were GC'd after publish — by now three commits
    // ran, so exactly _committed.3 remains
    assert(manifests() == Seq("_committed.3"),
      s"expected the max-epoch manifest only, got ${manifests()}")
    // a bare legacy `_committed` reads as epoch 0: it fences reads until
    // any versioned publication supersedes it
    val legacyFence = java.nio.file.Files.createTempDirectory("warc_lf").toFile
    legacyFence.deleteOnExit()
    Seq(("response", "http://lf/0", "<urn:uuid:lf0>", "lf".getBytes))
      .toDF("warc_type", "target_uri", "record_id", "payload")
      .repartition(1)
      .write.format("warcgz").mode("overwrite")
      .save(legacyFence.getAbsolutePath)
    val obj = legacyFence.listFiles.map(_.getName)
      .filter(_.endsWith(".warc.gz")).head
    legacyFence.listFiles.filter(_.getName.startsWith("_committed"))
      .foreach(_.delete())
    java.nio.file.Files.write(
      new java.io.File(legacyFence, "_committed").toPath,
      (obj + "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(legacyFence, "part-99999-998.warc.gz").toPath,
      Warc.writeGz(Seq(Warc.WarcRecord("response", "http://lf/stray",
        "<urn:uuid:lfs>", "stray".getBytes))))
    assert(spark.read.format("warcgz")
      .load(legacyFence.getAbsolutePath + "/*.warc.gz").count() == 1,
      "legacy bare manifest did not fence the read")
    // a directory never touched by the sink has no manifest: plain files
    // list as before (legacy read path unchanged)
    val legacy = java.nio.file.Files.createTempDirectory("warc_legacy").toFile
    legacy.deleteOnExit()
    java.nio.file.Files.write(
      new java.io.File(legacy, "plain.warc.gz").toPath,
      Warc.writeGz(Seq(Warc.WarcRecord("response", "http://l/0",
        "<urn:uuid:l0>", "legacy".getBytes))))
    assert(spark.read.format("warcgz")
      .load(legacy.getAbsolutePath + "/*.warc.gz").count() == 1)
  }

  test("DSv2 warcgz write: two attempts of one task (retry/speculation) cannot collide") {
    // Spark hands each task ATTEMPT a distinct taskId and lets exactly
    // one attempt per partition commit (commit coordinator); the loser's
    // abort() runs. Simulate that protocol directly: both attempts write
    // the same partition's rows, one commits, one aborts — exactly one
    // object remains and its content is the committed attempt's.
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("warc_spec").toFile
    dir.deleteOnExit()
    val conf = new Warc.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("warc_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("target_uri",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("record_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType)))
    val factory = new WarcGzWriterFactory(dir.getAbsolutePath, conf, schema)
    def row(i: Int): org.apache.spark.sql.catalyst.InternalRow =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString("response"),
          org.apache.spark.unsafe.types.UTF8String.fromString(s"http://s/$i"),
          org.apache.spark.unsafe.types.UTF8String.fromString(s"<urn:uuid:a$i>"),
          s"attempt payload $i".getBytes("UTF-8")))
    // same partitionId, distinct per-attempt taskIds — names must differ
    val a1 = factory.createWriter(0, 101L)
    val a2 = factory.createWriter(0, 202L)
    (0 until 5).foreach(i => { a1.write(row(i)); a2.write(row(i)) })
    val msg = a1.commit() // winner
    a2.abort()            // speculated/retried loser
    val left = dir.listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(left.length == 1, left.map(_.getName).toSeq.toString)
    assert(left.head.getName == new org.apache.hadoop.fs.Path(
      msg.asInstanceOf[WarcGzCommit].file).getName)
    val back = spark.read.format("warcgz")
      .load(dir.getAbsolutePath + "/*.warc.gz")
    assert(back.count() == 5)
  }

  test("manifest publish race: reader retries a GC'd epoch; writer trips on an existing target epoch") {
    import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, FileSystem, FilterFileSystem, Path => HPath}
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = java.nio.file.Files.createTempDirectory("warc_race").toFile
    dir.deleteOnExit()
    val hdir = new HPath(dir.getAbsolutePath)
    val raw = FileSystem.getLocal(conf)
    WarcGzManifest.write(raw, hdir, Set("a.warc.gz")) // epoch 1
    // READER RETRY: resolve-then-open is two steps; simulate the single
    // writer GC'ing the resolved epoch in the gap — the first manifest
    // open deletes the file, publishes the successor, then throws the
    // FileNotFoundException the real race produces. read() must
    // re-resolve and return the SUCCESSOR generation, not fail.
    var fired = false
    val racingFs = new FilterFileSystem(raw) {
      override def open(f: HPath, bufferSize: Int): FSDataInputStream = {
        if (!fired && f.getName.startsWith(WarcGzManifest.Prefix)) {
          fired = true
          raw.delete(f, false)
          WarcGzManifest.write(raw, hdir, Set("b.warc.gz")) // epoch 2
          throw new java.io.FileNotFoundException(f.toString)
        }
        super.open(f, bufferSize)
      }
    }
    assert(WarcGzManifest.read(racingFs, hdir).contains(Set("b.warc.gz")),
      "reader did not re-resolve to the successor epoch after FNFE")
    assert(fired, "race never fired - test wiring broken")
    // WRITER TRIPWIRE: a writer whose listing is stale (hides the newest
    // epoch - what a concurrent publish between list and rename looks
    // like) computes an epoch that already exists; the explicit existence
    // probe must fail loudly on EVERY filesystem (local/POSIX rename
    // would silently overwrite).
    val maxEpoch = dir.listFiles.map(_.getName)
      .collect { case n if n.startsWith("_committed.") =>
        n.stripPrefix("_committed.").toLong }.max
    val contested = s"_committed.${maxEpoch + 1}"
    java.nio.file.Files.write(
      new java.io.File(dir, contested).toPath, "b.warc.gz\n".getBytes)
    val staleFs = new FilterFileSystem(raw) {
      override def listStatus(f: HPath): Array[FileStatus] =
        super.listStatus(f).filterNot(_.getPath.getName == contested)
    }
    val err = intercept[RuntimeException] {
      WarcGzManifest.write(staleFs, hdir, Set("c.warc.gz"))
    }
    assert(err.getMessage.contains("concurrent writer"), err.getMessage)
    // the existing epoch was NOT clobbered by the losing writer
    assert(WarcGzManifest.read(raw, hdir).contains(Set("b.warc.gz")))
  }

  test("vacuumGz reclaims strays and stale manifests; unmanaged dirs are untouched") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_vac").toFile
    dir.deleteOnExit()
    def write(n: Int): Unit =
      (0 until n).map(i => ("response", s"http://v/$i", s"<urn:uuid:v$i>",
          s"gen $i".getBytes))
        .toDF("warc_type", "target_uri", "record_id", "payload")
        .repartition(1)
        .write.format("warcgz").mode("overwrite").save(dir.getAbsolutePath)
    write(4) // epoch 1
    write(3) // epoch 2 (GC removed epoch 1)
    // plant what a crashed job leaves: a complete stray object outside
    // the committed generation, and a stale low-epoch manifest
    java.nio.file.Files.write(
      new java.io.File(dir, "part-99999-7.warc.gz").toPath,
      Warc.writeGz(Seq(Warc.WarcRecord("response", "http://v/stray",
        "<urn:uuid:vs>", "stray".getBytes))))
    java.nio.file.Files.write(
      new java.io.File(dir, "_committed.1").toPath, "ghost.warc.gz\n".getBytes)
    def glob = dir.getAbsolutePath + "/*.warc.gz"
    assert(spark.read.format("warcgz").load(glob).count() == 3)
    val (objs, mfs) = Warc.vacuumGz(spark, dir.getAbsolutePath)
    assert(objs == 1 && mfs == 1, s"vacuum reclaimed ($objs, $mfs)")
    assert(!new java.io.File(dir, "part-99999-7.warc.gz").exists)
    assert(!new java.io.File(dir, "_committed.1").exists)
    // reads unchanged; a second vacuum is a no-op
    assert(spark.read.format("warcgz").load(glob).count() == 3)
    assert(Warc.vacuumGz(spark, dir.getAbsolutePath) == ((0, 0)))
    // an UNMANAGED directory (no manifest) is not this sink's to clean
    val plain = java.nio.file.Files.createTempDirectory("warc_vacp").toFile
    plain.deleteOnExit()
    java.nio.file.Files.write(
      new java.io.File(plain, "keep.warc.gz").toPath,
      Warc.writeGz(Seq(Warc.WarcRecord("response", "http://v/k",
        "<urn:uuid:vk>", "keep".getBytes))))
    assert(Warc.vacuumGz(spark, plain.getAbsolutePath) == ((0, 0)))
    assert(new java.io.File(plain, "keep.warc.gz").exists)
  }
}
