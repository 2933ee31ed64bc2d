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

  /** Raised when a gzip member cannot complete because the supplied
    * bytes end mid-member — i.e. more bytes could legitimately exist
    * past the buffer. Subclass of IllegalArgumentException so every
    * "malformed input fails loudly" contract (and its specs) keeps
    * holding; TYPED so the retry/extend and EOF-classification logic
    * never string-matches exception messages.
    */
  final class TruncatedMember(msg: String)
      extends IllegalArgumentException(msg)

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

  // ----------------------------------------------------- splittable .warc.gz

  /** Inflate ONE gzip member starting at `off`. Returns (inflated bytes,
    * compressed length consumed incl. header and trailer). Strict: magic,
    * CM=8, optional header fields walked exactly, trailer CRC32 and ISIZE
    * verified — corruption or truncation raises, with "truncated" in the
    * message iff more bytes could legitimately exist past `bytes`.
    */
  private[sources] def inflateMember(bytes: Array[Byte], off: Int): (Array[Byte], Int) = {
    def trunc(what: String): Nothing =
      throw new TruncatedMember(s"WARC: gzip member truncated ($what) at $off")
    if (off + 10 > bytes.length) trunc("header")
    if ((bytes(off) & 0xff) != 0x1f || (bytes(off + 1) & 0xff) != 0x8b)
      fail(s"no gzip magic at $off")
    if ((bytes(off + 2) & 0xff) != 8) fail(s"gzip CM ${bytes(off + 2)} != 8")
    val flg = bytes(off + 3) & 0xff
    if ((flg & 0xe0) != 0) fail(s"reserved gzip FLG bits set at $off")
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > bytes.length) trunc("FEXTRA")
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 8) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p > bytes.length) trunc("header fields")
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, p, bytes.length - p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      val crc = new java.util.zip.CRC32()
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            fail(s"bad deflate data at $off: ${e.getMessage}") }
        if (n == 0 && inf.needsInput() && !inf.finished()) trunc("deflate")
        out.write(buf, 0, n)
        crc.update(buf, 0, n)
      }
      val compLen = (p - off) + math.toIntExact(inf.getBytesRead)
      val tOff = off + compLen
      if (tOff + 8 > bytes.length) trunc("trailer")
      def u32le(i: Int): Long =
        (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      if (u32le(tOff) != crc.getValue) fail(s"gzip CRC mismatch at $off")
      if (u32le(tOff + 4) != (out.size() & 0xffffffffL))
        fail(s"gzip ISIZE mismatch at $off")
      (out.toByteArray, compLen + 8)
    } finally inf.end()
  }

  /** Classify a sync candidate whose gzip member runs past physical EOF
    * ([[inflateMember]] raised [[TruncatedMember]] with no file bytes
    * left): TRUE means the candidate is — or cannot be proven not to
    * be — a genuine member start, so the caller re-raises, upholding
    * the contract that truncation never drops records silently. FALSE
    * requires POSITIVE evidence of payload garbage: invalid header
    * bytes, corrupt deflate data, or an inflated prefix that is not
    * "WARC/". The undecidable cases (EOF inside the gzip header, or
    * before 5 output bytes inflate) default to LOUD — previously they
    * were silently skipped, which dropped a genuine final record when
    * the crawl tail was cut inside its header.
    */
  private def truncatedGenuineMember(bytes: Array[Byte], off: Int): Boolean = {
    val n = bytes.length
    // caller verified the 3 magic bytes; FLG reserved bits, if present,
    // separate garbage (set) from a plausible member (clear)
    if (off + 4 <= n && (bytes(off + 3) & 0xe0) != 0) return false
    if (off + 10 > n) return true // EOF inside the fixed header: loud
    val flg = bytes(off + 3) & 0xff
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > n) return true
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 8) != 0) { while (p < n && bytes(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (p < n && bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p >= n) return true // EOF inside the optional header fields: loud
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, p, n - p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](512)
      while (out.size < 5 && !inf.finished()) {
        val got =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return false }
        if (got > 0) out.write(buf, 0, got)
        else if (inf.needsInput()) return true // ran dry at EOF: loud
        else if (inf.needsDictionary()) return false // not a gzip stream
      }
      if (out.size < 5) false // complete sub-5-byte stream: not a record
      else new String(out.toByteArray, 0, 5, "US-ASCII") == "WARC/"
    } finally inf.end()
  }

  /** Iterate the records of one byte-range split [start, end) of a
    * per-record-gzipped WARC file — the mechanism that makes a 1 GB
    * Common Crawl `.warc.gz` readable by many tasks in parallel instead
    * of one-file-one-task.
    *
    * Ownership rule (the standard Hadoop split contract — no record is
    * lost or duplicated): a record belongs to the split containing the
    * FIRST compressed byte of its gzip member. A split that is not at
    * offset 0 first SYNCS: it scans forward for a gzip magic whose
    * member inflates cleanly AND whose content starts with `WARC/` — a
    * candidate that fails either test is payload bytes that merely look
    * like a member, and the scan continues (the same
    * stronger-than-magic validation [[parse]] applies to version lines).
    * After sync every member must be valid — failures raise. Members
    * may EXTEND past `end` (the tail record); `readMore` supplies
    * further file bytes on demand, so a task buffers one split plus at
    * most one record, never the whole file.
    */
  private[sources] def splitRecords(
      first: Array[Byte], start: Long, end: Long, fileLen: Long,
      readMore: Int => Array[Byte]): Iterator[(Long, WarcRecord)] = {
    var data = first // covers [start, start + data.length)
    def covered: Long = start + data.length
    def extend(minBytes: Int): Boolean = {
      if (covered >= fileLen) false
      else {
        // geometric growth keeps the append amortized-linear
        val want = math.min(
          math.max(minBytes.toLong, math.max(1L << 20, data.length / 2L)),
          fileLen - covered).toInt
        val more = readMore(want)
        if (more.length == 0) false
        else { data = data ++ more; true }
      }
    }
    // retry `f` after extending whenever it failed only for lack of bytes
    def withBytes[A](f: => A): A = {
      var r: Option[A] = None
      while (r.isEmpty) {
        try r = Some(f)
        catch {
          case e: TruncatedMember if covered < fileLen =>
            if (!extend(1 << 20)) throw e
        }
      }
      r.get
    }
    var abs = start
    if (start != 0) {
      // sync: first VALIDATED member start in [start, end)
      var synced = false
      while (!synced && abs < end) {
        val idx = (abs - start).toInt
        if (idx + 3 > data.length && !extend(1 << 20)) abs = end // EOF: no member
        else if (idx + 3 > data.length) () // extended; re-test same abs
        else if ((data(idx) & 0xff) == 0x1f && (data(idx + 1) & 0xff) == 0x8b &&
          (data(idx + 2) & 0xff) == 0x08) {
          val ok =
            try {
              val (inflated, _) = withBytes(inflateMember(data, idx))
              inflated.length >= 5 &&
                new String(inflated, 0, 5, "US-ASCII") == "WARC/"
            } catch {
              case e: TruncatedMember =>
                // The FILE ends mid-candidate: either payload bytes near
                // EOF or a genuine member cut off by a truncated crawl
                // tail. [[truncatedGenuineMember]] separates them with a
                // loud default — raising (not skipping) upholds the
                // documented contract that truncation never drops
                // records silently.
                if (covered >= fileLen && truncatedGenuineMember(data, idx))
                  throw e
                false
              case _: IllegalArgumentException => false
            }
          if (ok) synced = true else abs += 1
        } else abs += 1
      }
      if (!synced) return Iterator.empty
    }
    new Iterator[(Long, WarcRecord)] {
      private var cur = abs
      private var pending: List[(Long, WarcRecord)] = Nil
      private def fill(): Unit =
        while (pending.isEmpty && cur < end && cur < fileLen) {
          val here = cur
          val (inflated, compLen) = withBytes(inflateMember(data, (cur - start).toInt))
          pending = parse(inflated).toList.map((here, _))
          cur += compLen
        }
      override def hasNext: Boolean = { fill(); pending.nonEmpty }
      override def next(): (Long, WarcRecord) = {
        fill()
        val h = pending.head; pending = pending.tail; h
      }
    }
  }

  /** Hadoop Configuration is not Serializable; the standard wrapper
    * (write/readFields through Java serialization) ships the driver's
    * conf to tasks so remote filesystems resolve identically there.
    */
  private[sources] final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Read `.warc.gz` files (per-record gzip members) SPLITTABLY: each
    * file is cut into `splitSize` byte ranges, one task per range, and
    * each task syncs to the next member boundary inside its range
    * ([[splitRecords]]). This is the 100 TB ingestion shape — a 1 GB
    * crawl file becomes ~8 parallel tasks at the default 128 MB split,
    * and task memory is bounded by split + one record, independent of
    * file size. Output columns: file, rec_offset (the member's absolute
    * compressed offset — a stable record id usable for seeks), warc_type,
    * target_uri, record_id, payload, body.
    */
  /** VACUUM a `warcgz`-sink directory: reclaim stray objects a crashed
    * job left outside the committed generation, plus stale manifests —
    * see [[WarcGzManifest.vacuum]]. No-op on unmanaged directories.
    */
  def vacuumGz(spark: org.apache.spark.sql.SparkSession, dir: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    WarcGzManifest.vacuum(fs, p)
  }

  def readGzSplits(spark: org.apache.spark.sql.SparkSession, pattern: String,
      splitSize: Long = 128L << 20): DataFrame = {
    require(splitSize > 0, s"splitSize $splitSize")
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(pattern)
    val fs = p.getFileSystem(hconf)
    val files = fs.globStatus(p)
    require(files != null && files.nonEmpty, s"no files match $pattern")
    // committed-generation fence: directories written by the warcgz sink
    // carry a _committed manifest; filtering to it keeps a concurrent or
    // crashed overwrite from surfacing OLD+NEW mixed (WarcGzManifest)
    val splits = WarcGzManifest.filter(fs, files.toSeq.filter(_.isFile)).flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitSize - 1) / splitSize)
      (0L until n).map { i =>
        (st.getPath.toString, i * splitSize, math.min((i + 1) * splitSize, len), len)
      }
    }
    require(splits.nonEmpty,
      s"no regular files match $pattern (glob matched only directories)")
    val ser = new SerializableHadoopConf(hconf)
    val schema = StructType(Seq(
      StructField("file", StringType),
      StructField("rec_offset", LongType),
      StructField("warc_type", StringType),
      StructField("target_uri", StringType),
      StructField("record_id", StringType),
      StructField("payload", BinaryType),
      StructField("body", BinaryType)))
    // one split per task, EXACTLY: parallelize with numSlices == size
    // slices positionally (element i → partition i) — unlike a hash
    // repartition, which can collide two splits onto one task and
    // leave others empty. No shuffle either: the split list is tiny
    // and born on the driver.
    val rows = spark.sparkContext.parallelize(splits, splits.size)
      .flatMap { case (file, start, end, fileLen) =>
        val path = new Path(file)
        val tfs = path.getFileSystem(ser.value)
        val in = tfs.open(path)
        // close at task end even if downstream stops early (limit)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        in.seek(start)
        def readN(n: Int): Array[Byte] = {
          val want = math.min(n.toLong, fileLen - in.getPos).toInt
          if (want <= 0) Array.emptyByteArray
          else {
            val buf = new Array[Byte](want)
            in.readFully(buf)
            buf
          }
        }
        val firstLen = math.min(end, fileLen) - start
        val first = readN(math.toIntExact(firstLen))
        splitRecords(first, start, end, fileLen, readN).map {
          case (off, rec) =>
            val body =
              if (rec.warcType == "response") httpBody(rec.payload)
              else rec.payload
            Row(file, off, rec.warcType, rec.targetUri, rec.recordId,
              rec.payload, body)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Point-read ONE record by its compressed member offset — the seek
    * the `rec_offset` column exists for: an index (doc_id → file,
    * rec_offset) turns a 1 GB archive into O(record) point lookups
    * without inflating any prefix (the per-record-member layout's whole
    * reason to exist). Reads the member incrementally (64 KB chunks),
    * so the cost is the one record's compressed size.
    */
  def readRecordAt(conf: org.apache.hadoop.conf.Configuration,
      file: String, offset: Long): WarcRecord = {
    val path = new org.apache.hadoop.fs.Path(file)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen
    require(offset >= 0 && offset < fileLen, s"offset $offset out of $file")
    val in = fs.open(path)
    try {
      in.seek(offset)
      var data = Array.emptyByteArray
      def pull(n: Int): Boolean = {
        val want = math.min(n.toLong, fileLen - offset - data.length).toInt
        if (want <= 0) false
        else {
          val buf = new Array[Byte](want)
          in.readFully(buf)
          data = data ++ buf
          true
        }
      }
      pull(64 << 10)
      var rec: Option[WarcRecord] = None
      while (rec.isEmpty) {
        try {
          val (inflated, _) = inflateMember(data, 0)
          rec = Some(parse(inflated).head)
        } catch {
          case _: TruncatedMember if pull(data.length) => ()
        }
      }
      rec.get
    } finally in.close()
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
