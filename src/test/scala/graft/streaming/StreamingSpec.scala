package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double) // untyped-path twin of streaming.Event

/** Structured Streaming semantics (SURVEY C9): the same EventStreams
  * functions that the batch pack oracles, driven through MemoryStream —
  * stream results must equal batch results on the same data; watermarks
  * must drop late data; dropDuplicatesWithinWatermark must dedup keys.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(
    f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val base = Seq(
    Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(4), 1, "click", 2.0),
    Ev(3, ts(11), 2, "view", 3.0), Ev(4, ts(14), 1, "click", 4.0),
    Ev(5, ts(21), 2, "view", 5.0), Ev(6, ts(25), 1, "view", 6.0),
    Ev(7, ts(33), 2, "click", 7.0), Ev(8, ts(41), 1, "click", 8.0))

  private def runStream(input: Seq[Seq[Ev]],
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val mem = MemoryStream[Ev](spark)
    val q = f(mem.toDF()).writeStream.format("memory")
      .queryName(s"t${Math.abs(input.hashCode)}").outputMode(mode).start()
    input.foreach { batch => mem.addData(batch); q.processAllAvailable() }
    val out = spark.table(s"t${Math.abs(input.hashCode)}")
    q.stop()
    out
  }

  test("streaming tumbling agg (complete mode) == batch agg on same data") {
    val stream = runStream(Seq(base.take(4), base.drop(4)),
      df => EventStreams.tumblingAgg(df, "10 minutes"), mode = "complete")
    val batch = EventStreams.tumblingAgg(base.toDF(), "10 minutes")
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0)
  }

  test("windowed HLL registers: streaming state == batch registers, estimate matches") {
    // duplicate users across microbatches: merge = max must absorb the
    // second arrival without changing a register
    val evs = Seq(
      Ev(1, ts(1), 10, "c", 0), Ev(2, ts(2), 11, "c", 0),
      Ev(3, ts(3), 12, "c", 0), Ev(4, ts(14), 10, "c", 0),
      Ev(5, ts(15), 13, "c", 0), Ev(6, ts(16), 11, "c", 0))
    val stream = runStream(Seq(evs.take(3), evs.drop(3)),
      df => EventStreams.hllUserRegisters(df, "10 minutes", "1 hour"),
      mode = "complete")
    val batch = EventStreams.hllUserRegisters(evs.toDF(), "10 minutes")
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "streaming register state diverges from the batch registers")
    // estimate over the streamed registers == the batch face's estimate
    val estStream = graft.operators.Sketches.hllEstimate(stream)
      .select(col("grp.start"), col("hll_est")).as[(Timestamp, Double)]
      .collect().toSet
    val estBatch = EventStreams.hllUsersWindowed(evs.toDF(), "10 minutes")
      .select(col("window_start"), col("hll_est")).as[(Timestamp, Double)]
      .collect().toSet
    assert(estStream == estBatch && estStream.size == 2)
  }

  test("stream-static enrichment join (complete mode) == batch on same data") {
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val stream = runStream(Seq(base.take(4), base.drop(4)),
      df => EventStreams.enrichAgg(df, dim), mode = "complete")
    val batch = EventStreams.enrichAgg(base.toDF(), dim)
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0)
  }

  test("enrich dim still broadcasts from size stats with no hint (batch face)") {
    // the forced broadcast() was removed so an over-memory dim degrades
    // to a shuffled join instead of an OOM; this pins the other half of
    // that contract — a dim under the threshold still plans as BHJ
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val df = EventStreams.enrichAgg(events, dim)
    df.collect() // finalize the adaptive plan
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      df.queryExecution.executedPlan.toString.take(1200))
  }

  test("watermark drops data later than the delay") {
    // batch 1 advances event time to 0:41; batch 2 delivers an event at
    // 0:01 — 40 min late, beyond the 10 min watermark → excluded from the
    // (append-mode, finalized) windows
    val late = Ev(99, ts(1), 9, "late", 1.0)
    val out = runStream(Seq(base, Seq(late), Seq(Ev(100, ts(120), 9, "flush", 0.0))),
      df => EventStreams.streamingTumbling(df, "10 minutes", "10 minutes"))
    assert(out.filter(col("event_type") === "late").count() == 0)
  }

  test("dropDuplicatesWithinWatermark removes in-window duplicate keys") {
    val dup = Ev(1, ts(2), 1, "click", 1.0) // same event_id as base(0)
    val out = runStream(Seq(base.take(2) :+ dup, base.drop(2)),
      df => EventStreams.dedupWithinWatermark(df, "30 minutes"))
    assert(out.filter(col("event_id") === 1).count() == 1)
    assert(out.count() == base.length)
  }

  test("stream-stream interval join == batch join on same data") {
    val clicks = base.filter(_.event_type == "click")
    val purchases = base.filter(_.event_type == "view") // stand-in purchases
    val memC = MemoryStream[Ev](spark)
    val memP = MemoryStream[Ev](spark)
    val q = EventStreams.clickPurchaseJoin(memC.toDF(), memP.toDF(), "20 minutes")
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    memC.addData(clicks.take(2)); memP.addData(purchases.take(1))
    q.processAllAvailable()
    memC.addData(clicks.drop(2)); memP.addData(purchases.drop(1))
    q.processAllAvailable()
    // flush watermarks so all joinable pairs emit
    memC.addData(Seq(Ev(900, ts(300), 98, "click", 0.0)))
    memP.addData(Seq(Ev(901, ts(300), 98, "view", 0.0)))
    q.processAllAvailable()
    val got = spark.table("ssjoin").filter(col("user_id") =!= 98)
    val want = EventStreams.clickPurchaseJoin(
      clicks.toDF(), purchases.toDF(), "20 minutes") // same code path, batch mode
      .filter(col("user_id") =!= 98)
    q.stop()
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("flatMapGroupsWithState sessionization == session_window on same data") {
    // events for two users; sessions split by >10-min gaps; a final
    // far-future event advances the watermark so timeouts flush the
    // remaining open sessions
    val evs = base.map(e => Event(e.event_id, e.ts, e.user_id, e.event_type, e.value))
    val flush = Event(999, ts(600), 99, "flush", 0.0)
    val mem = MemoryStream[Event](spark)
    val q = StatefulSessions.sessionize(mem.toDS(), gapMinutes = 10)
      .toDF().writeStream.format("memory").queryName("statesess")
      .outputMode("append").start()
    mem.addData(evs.take(4)); q.processAllAvailable()
    mem.addData(evs.drop(4)); q.processAllAvailable()
    mem.addData(Seq(flush)); q.processAllAvailable()
    mem.addData(Seq(flush.copy(event_id = 1000, ts = ts(1200)))); q.processAllAvailable()
    val got = spark.table("statesess")
      .filter(col("user_id") =!= 99)
      .select(col("user_id"), col("session_start"), col("n"))
    val want = EventStreams.sessionAgg(base.toDF(), "10 minutes")
      .select(col("user_id"), col("session_start"), col("n"))
    q.stop()
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming session windows (complete mode) == batch session windows") {
    val stream = runStream(Seq(base.take(5), base.drop(5)),
      df => EventStreams.sessionAgg(df, "10 minutes"), mode = "complete")
    val batch = EventStreams.sessionAgg(base.toDF(), "10 minutes")
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0)
  }

  test("online dedup index: streaming state across microbatches == batch face") {
    // duplicates split ACROSS batch boundaries: the bucket for digest of
    // "aa" receives docs in batches 1, 2 and 3 and must keep canonical=1
    // while its count grows; a later batch delivering a SMALLER doc_id
    // (digest "cc": 9 then 7) must lower the canonical — exercises the
    // min-merge against carried state, not just first-write
    val docs = Seq(
      KeyedDoc("aa", 1), KeyedDoc("bb", 2),          // batch 1
      KeyedDoc("aa", 3), KeyedDoc("cc", 9),          // batch 2
      KeyedDoc("aa", 5), KeyedDoc("cc", 7), KeyedDoc("dd", 8)) // batch 3
    val mem = MemoryStream[KeyedDoc](spark)
    val q = DedupIndex.run(mem.toDS(), "dedupidx")
    Seq(docs.take(2), docs.slice(2, 4), docs.drop(4)).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    }
    // update mode re-emits a bucket per change: keep the LAST row per h
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy(col("n").desc)
    val got = spark.table("dedupidx")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("h"), col("canonical"), col("n"))
    q.stop()
    val want = DedupIndex.buckets(docs.toDS()).toDF()
      .select(col("h"), col("canonical"), col("n"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.filter(col("h") === "cc" && col("canonical") === 7).count() == 1)
  }

  test("leaderboard: final board after microbatched input == batch face") {
    // scores arrive out of order across 3 batches; a later batch (id 30)
    // dethrones an earlier leader — the merged board must reflect it
    val rows = Seq(
      Scored("a", 1, 5.0), Scored("a", 2, 9.0), Scored("b", 3, 1.0), // b1
      Scored("a", 4, 7.0), Scored("a", 5, 3.0), Scored("b", 6, 2.0), // b2
      Scored("a", 30, 9.5), Scored("a", 7, 1.0), Scored("b", 8, 0.5)) // b3
    val mem = MemoryStream[Scored](spark)
    val q = Leaderboard.run(mem.toDS(), 3, "board")
    val batches = Seq(rows.take(3), rows.slice(3, 6), rows.drop(6))
    var before = 0L
    batches.foreach { b =>
      before = spark.table("board").count()
      mem.addData(b); q.processAllAvailable()
    }
    // update mode re-emits per batch: the rows appended by the LAST batch
    // are the final board
    val all = spark.table("board").collect()
    q.stop()
    val finalBoard = all.drop(before.toInt)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = Leaderboard.top(rows.toDS(), 3).collect()
      .map(r => (r.event_type, r.rank, r.event_id)).toSet
    assert(finalBoard == want, s"$finalBoard vs $want")
    // the dethroning actually happened
    assert(want.contains(("a", 1L, 30L)))
  }

  test("streaming BPE tokenization == batch on the same documents") {
    // the LLM-pipeline streaming shape: documents arrive, a PRE-TRAINED
    // merge table tokenizes them per micro-batch. encodeDocs is a
    // stateless mapPartitions, so it runs unchanged on a streaming frame
    // and must agree with the batch face row-for-row.
    import graft.operators.Bpe
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest widest widest"),
      (2L, "the newest of the new lows and the widest of the wide"),
      (3L, "unrelated words entirely"),
      (4L, "low lower lowest newest new"))
    val merges = Bpe.train(docs.toDF("doc_id", "text"), numMerges = 12,
      minCount = 1L)
    val mem = MemoryStream[(Long, String)](spark)
    val q = Bpe.encodeDocs(mem.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    Seq(docs.take(2), docs.drop(2)).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    }
    val stream = spark.table("bpe_stream")
    val batch = Bpe.encodeDocs(docs.toDF("doc_id", "text"), merges)
    assert(stream.count() == 4)
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "streaming tokenization diverged from the batch face")
    q.stop()
  }

  test("streaming WARC arrival: newly landed .warc.gz files == batch read") {
    // crawl files LAND over time; the file source's exactly-once file
    // tracking + the stateless record explode give streaming ingestion
    // for free — pinned equal to the batch face over the same files
    import graft.sources.Warc
    val dir = java.nio.file.Files.createTempDirectory("warc_stream").toFile
    dir.deleteOnExit()
    def writeFile(name: String, ids: Range): Unit = {
      val recs = ids.map { i =>
        Warc.WarcRecord("response", s"http://x/$i", s"<urn:uuid:resp-$i>",
          ("HTTP/1.1 200 OK\r\n\r\nbody of document " + i).getBytes("UTF-8"))
      }
      // atomic land (tmp + rename): file sources contractually assume
      // atomic placement; a direct write races the running stream's
      // directory listing
      val tmp = new java.io.File(dir, s".$name.tmp").toPath
      java.nio.file.Files.write(tmp, Warc.writeGz(recs))
      java.nio.file.Files.move(tmp, new java.io.File(dir, name).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    writeFile("b1.warc.gz", 0 until 5)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val arriving = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.warc.gz")
      .load(dir.getAbsolutePath)
      .select(xxhash64(col("path")).as("doc_id"), col("content").as("warc"))
    val q = Warc.records(arriving)
      .select(col("target_uri"), md5(col("body")).as("m"))
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    writeFile("b2.warc.gz", 5 until 12)
    q.processAllAvailable()
    val stream = spark.table("warc_stream")
    q.stop()
    val batch = Warc.records(
        spark.read.format("binaryFile").option("pathGlobFilter", "*.warc.gz")
          .load(dir.getAbsolutePath)
          .select(xxhash64(col("path")).as("doc_id"),
            col("content").as("warc")))
      .select(col("target_uri"), md5(col("body")).as("m"))
    assert(stream.count() == 12)
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "streaming WARC ingestion diverged from the batch face")
  }

  test("streaming count-min sketch == batch on the same documents") {
    // CMS cells are INTEGER sums, so the sketch is exactly streamable:
    // a streaming groupBy over the cell explode accumulates the same
    // cells the batch face computes, whatever the micro-batching.
    import graft.operators.Sketches
    val docs = Seq(
      (1L, "a b c a a"), (2L, "b c d"), (3L, "a d d e"), (4L, "e e e b"))
    val mem = MemoryStream[(Long, String)](spark)
    val q = Sketches.countMin(mem.toDF().toDF("doc_id", "text"),
        col("text"), depth = 4, width = 64)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    Seq(docs.take(2), docs.drop(2)).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    }
    val stream = spark.table("cms_stream")
    val batch = Sketches.countMin(docs.toDF("doc_id", "text"),
      col("text"), depth = 4, width = 64)
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "streaming sketch diverged from the batch face")
    q.stop()
  }
}
