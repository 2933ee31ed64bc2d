package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end file-source → file-sink streaming (SURVEY C9 e2e):
  * exactly-once across a kill-and-resume (same checkpoint), idempotent
  * empty restarts, and foreachBatch last-wins upsert.
  */
class FilePipelineSpec extends SparkSpec {

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_fp_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def localFs: org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

  private def writeNdjson(dir: String, name: String, lines: Seq[String]): Unit = {
    val f = new File(dir, name)
    Files.writeString(f.toPath, lines.mkString("", "\n", "\n"))
  }

  private def ev(id: Long, min: Int, user: Long, typ: String, v: Double): String =
    s"""{"event_id":$id,"ts":"2024-01-01T${"%02d".format(min / 60)}:${"%02d".format(min % 60)}:00.000Z","user_id":$user,"event_type":"$typ","value":$v}"""

  test("file→file pipeline is exactly-once across kill and resume") {
    val in = tmpDir("in"); val out = tmpDir("out"); val ckpt = tmpDir("ckpt")

    // batch 1: two input files → run to completion ("crash" = clean stop
    // after commit; the checkpoint records both files as consumed)
    writeNdjson(in, "a.json", Seq(ev(1, 1, 1, "click", 1.0), ev(2, 4, 1, "view", 2.0)))
    writeNdjson(in, "b.json", Seq(ev(3, 11, 2, "click", 3.0)))
    val q1 = FilePipelines.eventsNdjsonToParquet(spark, in, out, ckpt)
    q1.awaitTermination()

    val after1 = spark.read.parquet(out)
    assert(after1.count() == 3)

    // resume with NO new input: nothing is reprocessed, output unchanged
    val q2 = FilePipelines.eventsNdjsonToParquet(spark, in, out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 3)

    // resume with new input: only the new file is processed; every
    // event_id appears exactly once across the whole run
    writeNdjson(in, "c.json", Seq(ev(4, 21, 2, "view", 4.0), ev(5, 25, 1, "click", 5.0)))
    val q3 = FilePipelines.eventsNdjsonToParquet(spark, in, out, ckpt)
    q3.awaitTermination()
    val fin = spark.read.parquet(out)
    assert(fin.count() == 5)
    assert(fin.select(countDistinct(col("event_id"))).head().getLong(0) == 5)
    // the enrich column survived the restart boundary
    assert(fin.filter(col("day") =!= lit("2024-01-01").cast("date")).count() == 0)
  }

  test("streaming FHIR transform == batch transform, exactly-once across restart") {
    import graft.fhir.{FhirIO, FhirSchemas, Transformers}
    val fixture = java.nio.file.Paths.get("/root/repo/fixtures/fhir/Specimen.ndjson")
    val lines = java.nio.file.Files.readAllLines(fixture)
    val in = tmpDir("fin"); val out = tmpDir("fout"); val ckpt = tmpDir("fckpt")

    // batch 1: first half of the fixture, then "crash"
    writeNdjson(in, "a.ndjson", lines.subList(0, 30).toArray.map(_.toString).toSeq)
    FilePipelines.fhirTransformStream(spark, in, out, ckpt, FhirSchemas.specimen)(
      Transformers.specimen).awaitTermination()

    // resume with the second half
    writeNdjson(in, "b.ndjson", lines.subList(30, lines.size).toArray.map(_.toString).toSeq)
    FilePipelines.fhirTransformStream(spark, in, out, ckpt, FhirSchemas.specimen)(
      Transformers.specimen).awaitTermination()

    // streamed output == one batch transform over the whole fixture,
    // every resource exactly once (same re-read schema on both sides)
    val streamed = FhirIO.readNdjson(spark, out, FhirSchemas.specimen)
    val batch = Transformers.specimen(
      FhirIO.readNdjson(spark, fixture.toString, FhirSchemas.specimen))
    val streamedN = streamed.select("id").distinct().count()
    assert(streamed.count() == lines.size && streamedN == lines.size)
    // compare a projected scalar face (struct-typed frames compare poorly)
    def face(df: org.apache.spark.sql.DataFrame) = df.select(col("id"),
      element_at(col("processing"), 1).getField("procedure")
        .getField("coding").getItem(0).getField("code").as("proc0"),
      col("collection").getField("bodySite").getField("text").as("site"))
    assert(face(streamed).exceptAll(face(batch)).count() == 0 &&
      face(batch).exceptAll(face(streamed)).count() == 0)
  }

  test("foreachBatch upsert merges last-wins by key across restarts") {
    val in = tmpDir("uin"); val target = tmpDir("utgt") + "/table"
    val ckpt = tmpDir("uckpt")

    writeNdjson(in, "a.json", Seq(
      ev(1, 1, 1, "click", 10.0), ev(2, 2, 1, "view", 20.0), ev(3, 3, 2, "click", 30.0)))
    FilePipelines.eventsUpsertStream(spark, in, target, ckpt).awaitTermination()
    assert(spark.read.parquet(target).count() == 3)

    // second run: update key 2 (later ts wins), insert key 4
    writeNdjson(in, "b.json", Seq(ev(2, 9, 1, "view", 99.0), ev(4, 8, 2, "view", 40.0)))
    FilePipelines.eventsUpsertStream(spark, in, target, ckpt).awaitTermination()
    val t = spark.read.parquet(target)
    assert(t.count() == 4)
    assert(t.filter(col("event_id") === 2).head().getAs[Double]("value") == 99.0)

    // replaying the same merge converges (last-wins idempotence): merge
    // batch-2's rows again directly — table state unchanged
    import spark.implicits._
    val replay = Seq((2L, java.sql.Timestamp.valueOf("2024-01-01 00:09:00"), 1L, "view", 99.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:08:00"), 2L, "view", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    FilePipelines.upsertBatch(replay, target)
    val t2 = spark.read.parquet(target)
    assert(t2.count() == 4)
    assert(t2.filter(col("event_id") === 2).head().getAs[Double]("value") == 99.0)
  }

  test("upsert swap is crash-safe: both interrupted-swap windows recover") {
    import spark.implicits._
    val target = tmpDir("ctgt") + "/table"
    def row(id: Long, min: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), 1L, "click", v)
    def batch(rows: (Long, java.sql.Timestamp, Long, String, Double)*) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    FilePipelines.upsertBatch(batch(row(1, 1, 1.0), row(2, 2, 2.0)), target)
    assert(spark.read.parquet(target).count() == 2)

    // window 1: crash BETWEEN the two renames — the live generation is
    // parked at .old, target is missing. The next (replayed) upsert must
    // restore it and merge, losing nothing.
    val tDir = new File(target); val oldDir = new File(target + ".old")
    assert(tDir.renameTo(oldDir))
    FilePipelines.upsertBatch(batch(row(2, 9, 9.0), row(3, 3, 3.0)), target)
    val afterRecovery = spark.read.parquet(target)
    assert(afterRecovery.count() == 3) // 1 recovered, 2 updated, 3 inserted
    assert(afterRecovery.filter(col("event_id") === 1).count() == 1)
    assert(afterRecovery.filter(col("event_id") === 2)
      .head().getAs[Double]("value") == 9.0)
    assert(!oldDir.exists())

    // window 2: crash AFTER the new generation landed but before cleanup —
    // a stale .old remains next to a complete target. It must be dropped,
    // never merged back.
    batch(row(99, 1, 99.0)).write.parquet(target + ".old")
    FilePipelines.upsertBatch(batch(row(4, 4, 4.0)), target)
    val t2 = spark.read.parquet(target)
    assert(t2.count() == 4)
    assert(t2.filter(col("event_id") === 99).count() == 0)
    assert(!oldDir.exists())
  }

  test("streaming crawl-quality monitor == batch after every landed segment") {
    // the stream_warc_quality gate's STREAMING face: the SAME
    // warcQualityByLang over readStream.format("warcgz") in complete
    // output mode — per-language counts + exact-decimal mean quality must
    // equal the batch answer over the files landed so far, after EVERY
    // arriving segment (davg's decimal partials make micro-batch merge
    // order invisible).
    import graft.sources.Warc
    import spark.implicits._
    val dir = tmpDir("warcq")
    def page(i: Int): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><head><title>Doc $i</title><script>t();</script></head>" +
        s"<body><p>the quick crawl document number $i of the corpus " +
        ("text and filler words of the stream " * (1 + i % 3)) +
        s"</p></body></html>").getBytes("UTF-8")
    def land(name: String, ids: Range): Unit = {
      // land ATOMICALLY (tmp + rename): file stream sources contractually
      // assume atomic placement — a direct write races the source's
      // directory listing, which can observe (and mark processed) a
      // half-written gz (flaked once under a slow host)
      val tmp = new File(dir, s".$name.tmp").toPath
      java.nio.file.Files.write(tmp,
        Warc.writeGz(ids.map(i => Warc.WarcRecord("response", s"http://q/$i",
          s"<urn:uuid:page-$i>", page(i)))))
      java.nio.file.Files.move(tmp, new File(dir, name).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val dim = (0L until 12L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def face(df: org.apache.spark.sql.DataFrame) =
      FilePipelines.warcQualityByLang(df, dim)
    land("seg1.warc.gz", 0 until 5)
    val q = face(spark.readStream.format("warcgz").load(s"$dir/*.warc.gz"))
      .writeStream.format("memory").queryName("warc_quality_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def batch = face(spark.read.format("warcgz").load(s"$dir/*.warc.gz"))
      def stream = spark.table("warc_quality_stream")
      assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
        "stream != batch after first segment")
      land("seg2.warc.gz", 5 until 12)
      q.processAllAvailable()
      assert(stream.count() == 2) // en + de, complete-mode snapshot
      assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
        "stream != batch after second segment")
    } finally q.stop()
  }

  test("streaming Bloom novelty == batch face; replayed last batch is idempotent") {
    import graft.operators.Dedup
    import spark.implicits._
    val in = tmpDir("bnin"); val state = tmpDir("bnstate")
    val out = tmpDir("bnout"); val ckpt = tmpDir("bnckpt")
    def dj(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val segs = Seq(
      Seq((0L, "alpha beta gamma"), (1L, "delta epsilon zeta")),
      Seq((10L, "eta theta iota"), (11L, "kappa lambda mu")),
      Seq((20L, "alpha beta gamma"), // dup of doc 0, earlier segment → seen
        (21L, "nu xi omicron"), // novel
        (22L, "nu xi omicron"))) // dup WITHIN its own segment → novel
    // land one file per segment with well-separated mtimes so the file
    // source's oldest-first ordering matches segment order
    val t0 = System.currentTimeMillis() - 60000
    segs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(in, s"s$i.json", seg.map { case (id, t) => dj(id, t) })
      assert(new File(in, s"s$i.json").setLastModified(t0 + i * 10000))
    }
    FilePipelines.bloomNoveltyStream(spark, in, state, out, ckpt)
      .awaitTermination()
    // partition discovery turns batch=N dirs into a batch column
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("batch").cast("long").as("segment"), col("seen"))
    val batchDocs = segs.zipWithIndex.flatMap { case (seg, i) =>
      seg.map { case (id, t) => (id, t, i.toLong) }
    }.toDF("doc_id", "text", "segment")
    val want = Dedup.bloomNovelBySegment(batchDocs, col("segment"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming verdicts != batch face")
    // the planted semantics actually fired
    val bySeen = got.as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(bySeen(20L), "cross-segment duplicate must read seen")
    assert(!bySeen(21L) && !bySeen(22L),
      "novel doc and within-segment duplicate must read novel")
    // foreachBatch is at-least-once: replaying the LAST batch (the only
    // one the checkpoint can replay) must reproduce identical verdicts
    // and state — epoch GC retains exactly the prior epoch a replay needs
    val lastId = segs.size - 1L
    val epochBefore = graft.util.BloomState.read(localFs, s"$state/epoch=$lastId").toSet
    val verdictsBefore = spark.read.parquet(s"$out/batch=$lastId").collect().toSet
    FilePipelines.bloomMergeBatch(
      segs.last.toDF("doc_id", "text"), state, out, lastId)
    assert(spark.read.parquet(s"$out/batch=$lastId").collect().toSet
      == verdictsBefore, "replayed batch changed its verdicts")
    assert(graft.util.BloomState.read(localFs, s"$state/epoch=$lastId").toSet
      == epochBefore, "replayed batch changed the published filter")
    // GC kept only the crash-window epoch and the live one
    val epochs = new File(state).list().filter(_.startsWith("epoch=")).sorted
    assert(epochs.toSeq == Seq(s"epoch=${lastId - 1}", s"epoch=$lastId"))
  }

  test("streaming partition-scoped merge: replacements win, replay converges, untouched days untouched") {
    import graft.operators.Layout
    import spark.implicits._
    val root = tmpDir("smrg")
    val table = s"$root/table"; val in = s"$root/in"; val ckpt = s"$root/ckpt"
    new File(in).mkdirs()
    val base = Seq(
      (1L, "a", 1.0, java.sql.Date.valueOf("2024-01-01")),
      (2L, "b", 2.0, java.sql.Date.valueOf("2024-01-02")))
      .toDF("event_id", "event_type", "value", "day")
    base.write.partitionBy("day").parquet(table)
    def fileState(dir: String): Set[(String, Long)] = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.lastModified())).toSet
    }
    val day2Before = fileState(s"$table/day=2024-01-02")
    val seg1 = Seq((3L, "c", 3.0, java.sql.Date.valueOf("2024-01-01")))
      .toDF("event_id", "event_type", "value", "day")
    val seg2 = Seq((1L, "a", 100.0, java.sql.Date.valueOf("2024-01-01")))
      .toDF("event_id", "event_type", "value", "day") // replaces key 1
    val t0 = System.currentTimeMillis() - 60000
    Seq(seg1, seg2).zipWithIndex.foreach { case (seg, i) =>
      val tmp = s"$root/_t$i"
      seg.coalesce(1).write.parquet(tmp)
      val part = new File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new File(in, s"s$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + i * 10000))
    }
    FilePipelines.mergeUpsertStream(spark, in, table, ckpt,
      seg1.schema, "event_id", "day").awaitTermination()
    def rows() = spark.read.parquet(table)
      .select(col("event_id"), col("event_type"), col("value"),
        col("day").cast("string"))
      .as[(Long, String, Double, String)].collect().toSet
    val want = Set(
      (1L, "a", 100.0, "2024-01-01"), // replaced, not duplicated
      (3L, "c", 3.0, "2024-01-01"),
      (2L, "b", 2.0, "2024-01-02"))
    assert(rows() == want, s"merged table wrong: ${rows()}")
    // untouched day's files never rewritten across both merges
    assert(fileState(s"$table/day=2024-01-02") == day2Before,
      "untouched partition rewritten by streaming merge")
    // at-least-once replay of the last batch converges (no duplicates)
    Layout.mergeIntoPartitioned(spark, table, seg2, "event_id", "day")
    assert(rows() == want, "replayed merge batch changed the table")
  }

  test("packed delivery: stream == batch driving, replay idempotent, epochs append-only") {
    import spark.implicits._
    def doc(id: Long, words: Int): String =
      s"""{"doc_id":$id,"text":"${Seq.tabulate(words)(i => s"w$i").mkString(" ")}"}"""
    val in = tmpDir("pdin"); val store = tmpDir("pdstore")
    val ckpt = tmpDir("pdckpt")
    // two curated segments; word counts sized so documents SPAN the
    // 16-token boundary (spanning is the operator's point)
    val seg0 = Seq(doc(1, 40), doc(3, 100), doc(5, 10))
    val seg1 = Seq(doc(7, 70), doc(9, 30))
    writeNdjson(in, "seg0.json", seg0)
    assert(new File(in, "seg0.json").setLastModified(
      System.currentTimeMillis() - 60000))
    writeNdjson(in, "seg1.json", seg1)
    FilePipelines.curationPackedStream(spark, in, store, ckpt, seqLen = 16)
      .awaitTermination()
    def snapshot() = spark.read.parquet(store)
      .select(col("epoch").cast("long"), col("seq_id"), col("doc_key"),
        col("tok_start"), col("tok_end"), col("tokens_in_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val streamed = snapshot()
    assert(streamed.nonEmpty)
    // stream == batch: the same segments through packedDeliveryBatch on
    // a fresh store land the identical (epoch, seq, doc, span) rows
    val store2 = tmpDir("pdstore2")
    Seq(seg0, seg1).zipWithIndex.foreach { case (seg, i) =>
      val batch = spark.read.schema(FilePipelines.docSchema)
        .json(seg.toDS())
      assert(FilePipelines.packedDeliveryBatch(batch, store2, i.toLong,
        seqLen = 16))
    }
    val batched = spark.read.parquet(store2)
      .select(col("epoch").cast("long"), col("seq_id"), col("doc_key"),
        col("tok_start"), col("tok_end"), col("tokens_in_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(batched == streamed, "stream and batch driving diverged")
    // epoch-scoped contract: each epoch's stream starts at offset 0
    assert(streamed.filter(_._4 == 0L).map(_._1) == Set(0L, 1L),
      "an epoch's token stream did not start at offset 0")
    // spanning really happened inside an epoch
    assert(streamed.exists(r => r._5 - r._4 > 16),
      "no document spanned a sequence boundary — fixture not load-bearing")
    // replay idempotence: a blind retry of the last batch (marker
    // present) is a no-op; with the marker lost, the deterministic
    // staging + fingerprint + clear-then-promote promotion converge to the
    // identical store
    val lastBatch = spark.read.schema(FilePipelines.docSchema)
      .json(seg1.toDS())
    assert(!FilePipelines.packedDeliveryBatch(lastBatch, store2, 1L,
      seqLen = 16))
    assert(new File(s"$store2/_committed/batch-1").delete())
    assert(FilePipelines.packedDeliveryBatch(lastBatch, store2, 1L,
      seqLen = 16))
    val replayed = spark.read.parquet(store2)
      .select(col("epoch").cast("long"), col("seq_id"), col("doc_key"),
        col("tok_start"), col("tok_end"), col("tokens_in_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(replayed == streamed, "marker-lost replay changed the store")
  }

  test("incremental-ingest admission: stream == batch driving, replay idempotent, epoch GC") {
    import graft.operators.{Dedup, Sketches}
    import spark.implicits._
    val root = tmpDir("ing")
    val in = s"$root/in"; val idx = s"$root/idx"; val state = s"$root/bloom"
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new File(in).mkdirs()
    val hist = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again"),
      (1L, "pack my box with five dozen liquor jugs right now"))
      .toDF("doc_id", "text")
    Dedup.writeLshIndex(hist, idx)
    Sketches.bloomBits(hist, col("text")).write.json(s"$state/epoch=-1")
    def dj(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val segs = Seq(
      // batch 0: fresh → admit, appended to the index
      Seq((10L, "a completely fresh document about spark streaming state")),
      // batch 1: verbatim copy of 10 → seen (bloom published by batch 0)
      //          and near at 1.0 (10 was appended); 12 fresh → admit
      Seq((11L, "a completely fresh document about spark streaming state"),
        (12L, "another new document mentioning watermarks and triggers")),
      // batch 2: 13 = one-word mutant of 10 → near-dup ONLY IF batch 0's
      //          admitted doc landed in the index; 14 = mutant of history
      Seq((13L, "a completely fresh document about spark streaming stuff"),
        (14L, "pack my box with five dozen liquor jugs right here")))
    val t0 = System.currentTimeMillis() - 60000
    segs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(in, s"s$i.json", seg.map { case (id, t) => dj(id, t) })
      assert(new File(in, s"s$i.json").setLastModified(t0 + i * 10000))
    }
    FilePipelines.ingestAdmissionStream(spark, in, idx, state, out, ckpt)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("seen_exact"), col("near_dup"), col("admit"))
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) == ((false, false, true)), s"10: ${got(10L)}")
    assert(got(11L) == ((true, true, false)), s"11: ${got(11L)}")
    assert(got(12L) == ((false, false, true)), s"12: ${got(12L)}")
    assert(got(13L) == ((false, true, false)),
      s"13: ${got(13L)} — batch-0 admitted doc not probeable: append lost")
    assert(got(14L) == ((false, true, false)), s"14: ${got(14L)}")

    // stream == batch driving: the same segments through the batch face
    // on fresh dirs give identical verdicts
    val idx2 = s"$root/idx2"; val state2 = s"$root/bloom2"; val out2 = s"$root/out2"
    Dedup.writeLshIndex(hist, idx2)
    Sketches.bloomBits(hist, col("text")).write.json(s"$state2/epoch=-1")
    segs.zipWithIndex.foreach { case (seg, i) =>
      FilePipelines.ingestAdmissionBatch(seg.toDF("doc_id", "text"),
        idx2, state2, out2, i.toLong)
    }
    val streamRows = spark.read.parquet(out).collect().toSet
    val batchRows = spark.read.parquet(out2).collect().toSet
    assert(streamRows == batchRows, "stream verdicts != batch driving")

    // at-least-once replay of the LAST batch: verdicts, index and bloom
    // state must not move — (a) committed-marker short-circuit, (b) even
    // with the marker lost, the verdict _SUCCESS guard + committed append
    // + idempotent epoch overwrite converge with no duplicated rows
    val lastId = segs.size - 1L
    val setsN = spark.read.parquet(s"$idx/sets").count()
    val bandsN = spark.read.parquet(s"$idx/bands").count()
    val verdicts = spark.read.parquet(s"$out/batch=$lastId").collect().toSet
    val epoch = graft.util.BloomState.read(localFs, s"$state/epoch=$lastId").toSet
    val lastDf = segs.last.toDF("doc_id", "text")
    FilePipelines.ingestAdmissionBatch(lastDf, idx, state, out, lastId)
    val marker = new File(s"$out/_committed/batch-$lastId")
    assert(marker.exists())
    assert(marker.delete())
    FilePipelines.ingestAdmissionBatch(lastDf, idx, state, out, lastId)
    assert(spark.read.parquet(s"$idx/sets").count() == setsN,
      "replay duplicated index sets rows")
    assert(spark.read.parquet(s"$idx/bands").count() == bandsN,
      "replay duplicated index bands rows")
    assert(spark.read.parquet(s"$out/batch=$lastId").collect().toSet == verdicts,
      "replay changed verdicts")
    assert(graft.util.BloomState.read(localFs, s"$state/epoch=$lastId").toSet == epoch,
      "replay changed the published filter")
    assert(marker.exists(), "replay did not re-commit")
    // no doc ever appears twice in the index
    assert(spark.read.parquet(s"$idx/sets").groupBy("doc_id").count()
      .filter(col("count") > 1).isEmpty, "duplicated doc in index sets")
    // epoch GC: exactly the crash-window epoch and the live one remain
    val eps = new File(state).list().filter(_.startsWith("epoch=")).sorted
    assert(eps.toSeq == Seq(s"epoch=${lastId - 1}", s"epoch=$lastId"), eps.toSeq)
  }

  test("semantic admission: stream == batch driving, replay idempotent, sequential growth load-bearing") {
    import graft.operators.Similarity
    import spark.implicits._
    val root = tmpDir("sem")
    val in = s"$root/in"; val idx = s"$root/idx"; val out = s"$root/out"
    new File(in).mkdirs()
    // tiny unit vectors: history along e1/e2; seg0 admits a fresh e3
    // direction; seg1 plants a near-dup OF THE SEG0 VECTOR (near only
    // if batch 0's append landed), a near-dup of history, and a fresh
    // e4 direction
    def v(xs: Double*): Seq[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat)
    }
    val hist = Seq(
      (0L, v(1, 0, 0, 0), 0), (1L, v(0.95, 0.3, 0, 0), 0),
      (2L, v(0, 1, 0, 0), 1), (3L, v(0.3, 0.95, 0, 0), 1))
      .toDF("vec_id", "embedding", "label")
    Similarity.writeIvfIndex(
      (hist.select(col("vec_id"), col("embedding"), col("label").as("cell")),
        hist.select(col("label").as("cell"),
          col("embedding").cast("array<double>").as("centroid"))
          .groupBy("cell").agg(expr("transform(aggregate(collect_list(centroid), " +
            "array_repeat(0d, 4), (a, x) -> zip_with(a, x, (p, q) -> p + q)), " +
            "s -> round(s / 2, 6))").as("centroid"))),
      idx)
    val seg0 = Seq((10L, v(0, 0, 1, 0))).toDF("vec_id", "embedding")
    val seg1 = Seq(
      (11L, v(0, 0.05, 0.999, 0)), // near seg0's 10 — ONLY IF it landed
      (12L, v(0.999, 0.05, 0, 0)), // near history 0
      (13L, v(0, 0, 0, 1)))        // fresh
      .toDF("vec_id", "embedding")
    val t0 = System.currentTimeMillis() - 60000
    Seq(seg0, seg1).zipWithIndex.foreach { case (seg, i) =>
      val tmp = s"$root/_t$i"
      seg.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new File(in, s"seg$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + i * 10000))
    }
    FilePipelines.semanticAdmissionStream(spark, in, idx, out, s"$root/ckpt",
      threshold = 0.9, nprobe = 2).awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("vec_id"), col("near_dup"), col("admit"))
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((false, true)), s"10: ${got(10L)}")
    assert(got(11L) == ((true, false)),
      s"11: ${got(11L)} — seg0's admitted vector not probeable: append lost")
    assert(got(12L) == ((true, false)), s"12: ${got(12L)}")
    assert(got(13L) == ((false, true)), s"13: ${got(13L)}")
    // stream == batch driving on fresh dirs
    val idx2 = s"$root/idx2"; val out2 = s"$root/out2"
    Similarity.writeIvfIndex(
      (hist.select(col("vec_id"), col("embedding"), col("label").as("cell")),
        Similarity.readIvfIndex(spark, idx)._2), idx2)
    Seq(seg0, seg1).zipWithIndex.foreach { case (seg, i) =>
      FilePipelines.semanticAdmissionBatch(seg, idx2, out2, i.toLong,
        threshold = 0.9, nprobe = 2)
    }
    assert(spark.read.parquet(out).collect().toSet ==
      spark.read.parquet(out2).collect().toSet,
      "stream verdicts != batch driving")
    // replay of the LAST batch: marker short-circuit, then marker-lost
    // convergence — verdicts and index rows unchanged, no vector twice
    val n1 = spark.read.parquet(s"$idx/cells").count()
    val verdicts = spark.read.parquet(s"$out/batch=1").collect().toSet
    FilePipelines.semanticAdmissionBatch(seg1, idx, out, 1L,
      threshold = 0.9, nprobe = 2)
    val marker = new File(s"$out/_committed/batch-1")
    assert(marker.exists() && marker.delete())
    FilePipelines.semanticAdmissionBatch(seg1, idx, out, 1L,
      threshold = 0.9, nprobe = 2)
    assert(spark.read.parquet(s"$idx/cells").count() == n1,
      "replay duplicated index rows")
    assert(spark.read.parquet(s"$out/batch=1").collect().toSet == verdicts,
      "replay changed verdicts")
    assert(spark.read.parquet(s"$idx/cells").groupBy("vec_id").count()
      .filter(col("count") > 1).isEmpty, "a vector landed twice in the index")
    // the scale shape: the verdict probe dynamically PRUNES the
    // cell-partitioned index scan to the probed cells — history is
    // never re-scanned whole per micro-batch. Pinned on a
    // realistically-sized index (DPP's cost check rightly declines on
    // the 4-vector toy above; the 500-vector/10-cell store is the same
    // fixture the topKIvf DPP pin uses).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val realIdx = s"$root/idx_real"
    Similarity.writeIvfIndex(
      (emb.select(col("vec_id"), col("embedding"), col("label").as("cell")),
        emb.groupBy(col("label").as("cell"))
          .agg(first(col("embedding")).cast("array<double>").as("centroid"))),
      realIdx)
    val plan = FilePipelines.semanticVerdicts(spark, realIdx,
        emb.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
    // two-regime probe (round 18): an OVER-CAP batch — a backlog replay
    // arriving as one oversized "micro-batch" — must NOT be broadcast:
    // the probe side takes the shuffle equi-join on cell instead, so an
    // outage recovery cannot OOM the driver. Verdicts are identical
    // either way (same join, different strategy).
    val bigBatch = emb.select(col("vec_id"), col("embedding"))
    val overCap = FilePipelines.semanticVerdicts(spark, realIdx, bigBatch,
      probeBroadcastCap = 4)
    val overPlan = overCap.queryExecution.executedPlan.toString
    assert(!overPlan.contains("dynamicpruning"),
      "over-cap batch still took the broadcast regime")
    val smallSide = FilePipelines.semanticVerdicts(spark, realIdx, bigBatch)
    assert(overCap.exceptAll(smallSide).isEmpty
        && smallSide.exceptAll(overCap).isEmpty,
      "regimes diverged on verdicts")
  }

  test("two concurrent streaming pipelines on disjoint state: no cross-talk in markers, epochs, or caches") {
    // the operational reality of a 100 TB cluster: more than one
    // pipeline runs at once in one session. Admission ingest (LSH index
    // + Bloom epochs + committed verdicts) and packed delivery
    // (committed epoch appends) run CONCURRENTLY against disjoint
    // dirs; each must land exactly what it lands when run alone, and
    // neither's _committed/_staging/state files may appear in the
    // other's tree. Scratch.scoped is per-thread (round 16), so the two
    // foreachBatch threads releasing their own scratch must not evict
    // each other's mid-batch caches — divergent output would expose it.
    import graft.operators.{Dedup, Sketches}
    import spark.implicits._
    val root = tmpDir("conc")
    def dj(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    // pipeline A: admission ingest
    val aIn = s"$root/a_in"; val aIdx = s"$root/a_idx"
    val aState = s"$root/a_bloom"; val aOut = s"$root/a_out"
    new File(aIn).mkdirs()
    val hist = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again"),
      (1L, "pack my box with five dozen liquor jugs right now"))
      .toDF("doc_id", "text")
    val aSegs = Seq(
      Seq((10L, "a completely fresh document about spark streaming state")),
      Seq((11L, "a completely fresh document about spark streaming state"),
        (12L, "another new document mentioning watermarks and triggers")),
      Seq((13L, "a completely fresh document about spark streaming stuff")))
    def seedA(idx: String, state: String): Unit = {
      Dedup.writeLshIndex(hist, idx)
      Sketches.bloomBits(hist, col("text")).write.json(s"$state/epoch=-1")
    }
    seedA(aIdx, aState)
    // pipeline B: packed delivery
    val bIn = s"$root/b_in"; val bStore = s"$root/b_store"
    new File(bIn).mkdirs()
    val bSegs = Seq(
      Seq(dj(1, Seq.tabulate(40)(i => s"w$i").mkString(" ")),
        dj(3, Seq.tabulate(100)(i => s"v$i").mkString(" "))),
      Seq(dj(5, Seq.tabulate(70)(i => s"u$i").mkString(" "))))
    val t0 = System.currentTimeMillis() - 60000
    aSegs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(aIn, s"s$i.json", seg.map { case (id, t) => dj(id, t) })
      assert(new File(aIn, s"s$i.json").setLastModified(t0 + i * 10000))
    }
    bSegs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(bIn, s"s$i.json", seg)
      assert(new File(bIn, s"s$i.json").setLastModified(t0 + i * 10000))
    }
    // start BOTH, then await both — the micro-batches interleave on
    // separate streaming threads in this one session
    val qa = FilePipelines.ingestAdmissionStream(spark, aIn, aIdx, aState,
      aOut, s"$root/a_ckpt")
    val qb = FilePipelines.curationPackedStream(spark, bIn, bStore,
      s"$root/b_ckpt", seqLen = 16)
    qa.awaitTermination(); qb.awaitTermination()
    // each pipeline == itself run ALONE on fresh dirs
    val aIdx2 = s"$root/a2_idx"; val aState2 = s"$root/a2_bloom"
    val aOut2 = s"$root/a2_out"
    seedA(aIdx2, aState2)
    aSegs.zipWithIndex.foreach { case (seg, i) =>
      FilePipelines.ingestAdmissionBatch(seg.toDF("doc_id", "text"),
        aIdx2, aState2, aOut2, i.toLong)
    }
    assert(spark.read.parquet(aOut).collect().toSet ==
      spark.read.parquet(aOut2).collect().toSet,
      "concurrent admission verdicts != solo run")
    val bStore2 = s"$root/b2_store"
    bSegs.zipWithIndex.foreach { case (seg, i) =>
      val batch = spark.read.schema(FilePipelines.docSchema).json(seg.toDS())
      assert(FilePipelines.packedDeliveryBatch(batch, bStore2, i.toLong,
        seqLen = 16))
    }
    assert(spark.read.parquet(bStore).collect().toSet ==
      spark.read.parquet(bStore2).collect().toSet,
      "concurrent packed store != solo run")
    // state isolation: every marker/state artifact sits in its own tree
    // — B's store has only its own epochs + markers, A's out has only
    // verdict batches, and neither tree contains the other's dirs
    val bDirs = new File(bStore).list().toSet
    assert(bDirs.filter(!_.startsWith("_")).forall(_.startsWith("epoch=")),
      s"foreign dirs in the packed store: $bDirs")
    val aOutDirs = new File(aOut).list().toSet
    assert(aOutDirs.filter(!_.startsWith("_")).forall(_.startsWith("batch=")),
      s"foreign dirs in the admission out tree: $aOutDirs")
    assert(!new File(aOut, "epoch=0").exists()
      && !new File(bStore, "batch=0").exists())
    // no stuck in-flight staging anywhere (both pipelines committed)
    Seq(aIdx, aOut, bStore).foreach { d =>
      val st = new File(d, "_staging")
      assert(!st.exists() || st.list().isEmpty, s"stuck staging under $d")
    }
  }

  test("backlog replay == sequential arrival: a cold-directory " +
      "AvailableNow run rebuilds the exact state live drip built, for " +
      "every committed-state pipeline") {
    // the restart-after-outage reality check (verdict r17 #7): a
    // pipeline that was down while segments accumulated must, on one
    // cold AvailableNow start, converge to the SAME verdicts/state the
    // live per-segment drip would have produced — batch boundaries are
    // preserved by maxFilesPerTrigger=1 and ordering by file mtime, and
    // all cross-batch state flows through the committed markers. The
    // crawl face shares ingestAdmissionBatch's committed-state
    // machinery verbatim, so the admission pin covers it.
    import graft.operators.{Dedup, Similarity, Sketches}
    import spark.implicits._
    val t0 = System.currentTimeMillis() - 120000
    def place(in: String, name: String, df: org.apache.spark.sql.DataFrame,
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_bl_seg").toFile
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      new File(in).mkdirs()
      val dst = new File(in, s"$name.parquet")
      Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(mtime))
    }

    // ---- 1. IVF dense-index ingest: state = the celled layout
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val even = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val vsegs = Seq(
      emb.filter(col("vec_id") % 4 === 1).select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") % 4 === 3).select(col("vec_id"), col("embedding")))
    def ivfState(idx: String) = spark.read.parquet(s"$idx/cells")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val ivfSeq = tmpDir("blIvfSeq")
    Similarity.writeIvfIndex(even, 8, s"$ivfSeq/idx")
    vsegs.zipWithIndex.foreach { case (seg, i) =>
      place(s"$ivfSeq/in", s"seg$i", seg, t0 + i * 10000)
      FilePipelines.ivfIngestStream(spark, s"$ivfSeq/in", s"$ivfSeq/idx",
        s"$ivfSeq/ckpt").awaitTermination()
    }
    val ivfCold = tmpDir("blIvfCold")
    Similarity.writeIvfIndex(even, 8, s"$ivfCold/idx")
    vsegs.zipWithIndex.foreach { case (seg, i) =>
      place(s"$ivfCold/in", s"seg$i", seg, t0 + i * 10000) }
    FilePipelines.ivfIngestStream(spark, s"$ivfCold/in", s"$ivfCold/idx",
      s"$ivfCold/ckpt").awaitTermination()
    assert(ivfState(s"$ivfSeq/idx") == ivfState(s"$ivfCold/idx"),
      "ivf ingest: backlog replay != sequential arrival")

    // ---- 2. semantic admission: state = verdicts + the grown index
    def v(xs: Double*): Seq[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat)
    }
    val hist = Seq(
      (0L, v(1, 0, 0, 0), 0), (1L, v(0.95, 0.3, 0, 0), 0),
      (2L, v(0, 1, 0, 0), 1), (3L, v(0.3, 0.95, 0, 0), 1))
      .toDF("vec_id", "embedding", "label")
    def semIdx(path: String): Unit = Similarity.writeIvfIndex(
      (hist.select(col("vec_id"), col("embedding"), col("label").as("cell")),
        hist.select(col("label").as("cell"),
          col("embedding").cast("array<double>").as("centroid"))
          .groupBy("cell").agg(expr("transform(aggregate(collect_list(centroid), " +
            "array_repeat(0d, 4), (a, x) -> zip_with(a, x, (p, q) -> p + q)), " +
            "s -> round(s / 2, 6))").as("centroid"))),
      path)
    val ssegs = Seq(
      Seq((10L, v(0, 0, 1, 0))).toDF("vec_id", "embedding"),
      Seq((11L, v(0, 0.05, 0.999, 0)), (12L, v(0.999, 0.05, 0, 0)),
        (13L, v(0, 0, 0, 1))).toDF("vec_id", "embedding"))
    def semState(root: String) = (
      spark.read.parquet(s"$root/out").collect().toSet,
      spark.read.parquet(s"$root/idx/cells")
        .select("vec_id").as[Long].collect().toSet)
    val semSeq = tmpDir("blSemSeq"); semIdx(s"$semSeq/idx")
    ssegs.zipWithIndex.foreach { case (seg, i) =>
      place(s"$semSeq/in", s"seg$i", seg, t0 + i * 10000)
      FilePipelines.semanticAdmissionStream(spark, s"$semSeq/in",
        s"$semSeq/idx", s"$semSeq/out", s"$semSeq/ckpt").awaitTermination()
    }
    val semCold = tmpDir("blSemCold"); semIdx(s"$semCold/idx")
    ssegs.zipWithIndex.foreach { case (seg, i) =>
      place(s"$semCold/in", s"seg$i", seg, t0 + i * 10000) }
    FilePipelines.semanticAdmissionStream(spark, s"$semCold/in",
      s"$semCold/idx", s"$semCold/out", s"$semCold/ckpt").awaitTermination()
    assert(semState(semSeq) == semState(semCold),
      "semantic admission: backlog replay != sequential arrival")

    // ---- 3. LSH+Bloom incremental-ingest admission (NDJSON segments):
    // state = verdicts + grown LSH index + newest bloom epoch
    def dj(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val dsegs = Seq(
      Seq(dj(10L, "a completely fresh document about spark streaming state")),
      Seq(dj(11L, "a completely fresh document about spark streaming state"),
        dj(12L, "another new document mentioning watermarks and triggers")))
    val histDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again"),
      (1L, "pack my box with five dozen liquor jugs right now"))
      .toDF("doc_id", "text")
    def ingState(root: String) = (
      spark.read.parquet(s"$root/out").collect().toSet,
      spark.read.parquet(s"$root/idx/sets").collect().toSet,
      spark.read.parquet(s"$root/idx/bands").collect().toSet)
    def ingInit(root: String): Unit = {
      Dedup.writeLshIndex(histDocs, s"$root/idx")
      Sketches.bloomBits(histDocs, col("text"))
        .write.json(s"$root/bloom/epoch=-1")
    }
    val ingSeq = tmpDir("blIngSeq"); ingInit(ingSeq)
    new File(s"$ingSeq/in").mkdirs()
    dsegs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(s"$ingSeq/in", s"s$i.json", seg)
      assert(new File(s"$ingSeq/in", s"s$i.json").setLastModified(t0 + i * 10000))
      FilePipelines.ingestAdmissionStream(spark, s"$ingSeq/in",
        s"$ingSeq/idx", s"$ingSeq/bloom", s"$ingSeq/out", s"$ingSeq/ckpt")
        .awaitTermination()
    }
    val ingCold = tmpDir("blIngCold"); ingInit(ingCold)
    new File(s"$ingCold/in").mkdirs()
    dsegs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(s"$ingCold/in", s"s$i.json", seg)
      assert(new File(s"$ingCold/in", s"s$i.json").setLastModified(t0 + i * 10000))
    }
    FilePipelines.ingestAdmissionStream(spark, s"$ingCold/in",
      s"$ingCold/idx", s"$ingCold/bloom", s"$ingCold/out", s"$ingCold/ckpt")
      .awaitTermination()
    assert(ingState(ingSeq) == ingState(ingCold),
      "incremental ingest: backlog replay != sequential arrival")

    // ---- 4. packed delivery: state = the epoch-partitioned store
    def pdoc(id: Long, words: Int): String =
      s"""{"doc_id":$id,"text":"${Seq.tabulate(words)(i => s"w$i").mkString(" ")}"}"""
    val psegs = Seq(Seq(pdoc(1, 40), pdoc(3, 100)), Seq(pdoc(7, 70)))
    def pdState(root: String) = spark.read.parquet(s"$root/store")
      .select(col("epoch").cast("long"), col("seq_id"), col("doc_key"),
        col("tok_start"), col("tok_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val pdSeq = tmpDir("blPdSeq")
    new File(s"$pdSeq/in").mkdirs()
    psegs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(s"$pdSeq/in", s"s$i.json", seg)
      assert(new File(s"$pdSeq/in", s"s$i.json").setLastModified(t0 + i * 10000))
      FilePipelines.curationPackedStream(spark, s"$pdSeq/in",
        s"$pdSeq/store", s"$pdSeq/ckpt", seqLen = 16).awaitTermination()
    }
    val pdCold = tmpDir("blPdCold")
    new File(s"$pdCold/in").mkdirs()
    psegs.zipWithIndex.foreach { case (seg, i) =>
      writeNdjson(s"$pdCold/in", s"s$i.json", seg)
      assert(new File(s"$pdCold/in", s"s$i.json").setLastModified(t0 + i * 10000))
    }
    FilePipelines.curationPackedStream(spark, s"$pdCold/in",
      s"$pdCold/store", s"$pdCold/ckpt", seqLen = 16).awaitTermination()
    assert(pdState(pdSeq) == pdState(pdCold),
      "packed delivery: backlog replay != sequential arrival")

    // ---- 5. streaming merge-upsert: state = the keyed table
    val mbase = Seq(
      (1L, "a", 1.0, java.sql.Date.valueOf("2024-01-01")),
      (2L, "b", 2.0, java.sql.Date.valueOf("2024-01-02")))
      .toDF("event_id", "event_type", "value", "day")
    val mseg0 = Seq((3L, "c", 3.0, java.sql.Date.valueOf("2024-01-01")))
      .toDF("event_id", "event_type", "value", "day")
    val mseg1 = Seq((1L, "a", 100.0, java.sql.Date.valueOf("2024-01-01")))
      .toDF("event_id", "event_type", "value", "day")
    val msegs = Seq(mseg0, mseg1)
    def muState(root: String) = spark.read.parquet(s"$root/table")
      .select(col("event_id"), col("event_type"), col("value"),
        col("day").cast("string"))
      .as[(Long, String, Double, String)].collect().toSet
    val muSeq = tmpDir("blMuSeq")
    mbase.write.partitionBy("day").parquet(s"$muSeq/table")
    msegs.zipWithIndex.foreach { case (seg, i) =>
      place(s"$muSeq/in", s"seg$i", seg, t0 + i * 10000)
      FilePipelines.mergeUpsertStream(spark, s"$muSeq/in", s"$muSeq/table",
        s"$muSeq/ckpt", mseg0.schema, "event_id", "day").awaitTermination()
    }
    val muCold = tmpDir("blMuCold")
    mbase.write.partitionBy("day").parquet(s"$muCold/table")
    msegs.zipWithIndex.foreach { case (seg, i) =>
      place(s"$muCold/in", s"seg$i", seg, t0 + i * 10000) }
    FilePipelines.mergeUpsertStream(spark, s"$muCold/in", s"$muCold/table",
      s"$muCold/ckpt", mseg0.schema, "event_id", "day").awaitTermination()
    assert(muState(muSeq) == muState(muCold),
      "merge upsert: backlog replay != sequential arrival")
    assert(muState(muSeq) == Set(
      (1L, "a", 100.0, "2024-01-01"), (2L, "b", 2.0, "2024-01-02"),
      (3L, "c", 3.0, "2024-01-01")))
  }

  test("refit-under-ingest: stream appends during the fit are delta-" +
      "reassigned on swap; fence refuses promotions; recovery drops a " +
      "crashed fence") {
    import graft.operators.Similarity
    val root = tmpDir("refitlive")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val even = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val odd = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    val idx = s"$root/idx"
    Similarity.writeIvfIndex(even, ncells = 8, idx)
    // one embedding segment waiting in the stream's inbox
    val tmpSeg = s"$root/_segtmp"
    odd.coalesce(1).write.mode("overwrite").parquet(tmpSeg)
    val part = new File(tmpSeg).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = new File(s"$root/in/seg0.parquet")
    dst.getParentFile.mkdirs()
    Files.move(part.toPath, dst.toPath)
    // the REAL ingest stream lands its committed append INSIDE the fit
    // window (after the snapshot + staged fit, before the fence) — the
    // interleaving the old stop-the-world refit could never survive
    Similarity.refitIvfIndexLive(spark, idx, ncells = 8, iters = 2,
      afterFit = () =>
        FilePipelines.ivfIngestStream(spark, s"$root/in", idx,
          s"$root/ckpt").awaitTermination())
    val cells = spark.read.parquet(s"$idx/cells")
    assert(cells.count() == even.count() + odd.count(),
      "a batch committed during the fit was lost across the swap")
    assert(cells.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "a vector landed twice across snapshot + delta")
    // exhaustive probe over the refit index == brute force on the union
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val loaded = Similarity.readIvfIndex(spark, idx)
    val viaIdx = Similarity.topKIvf(emb.select(col("vec_id"), col("embedding")),
      queries, 10, nprobe = 8, index = Some(loaded))
    val brute = Similarity.topKBruteForce(
      emb.select(col("vec_id"), col("embedding")), queries, 10)
    assert(viaIdx.exceptAll(brute).isEmpty && brute.exceptAll(viaIdx).isEmpty,
      "refit-under-ingest index diverged from brute force under " +
        "exhaustive probing")
    // fence semantics: while up, a committed append refuses LOUDLY at
    // the staging gate (an at-least-once scheduler retries after)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.util.CommittedAppend.raiseFence(fs, idx)
    val extra = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 900000).as("vec_id"), col("embedding"))
    val e = intercept[IllegalStateException](
      Similarity.appendToIvfIndexCommitted(spark, idx, extra, 77L))
    assert(e.getMessage.contains("fence"), e.getMessage)
    // a crash inside the fenced window leaves the fence up — recovery
    // owns dropping it, and the retried batch then lands exactly once
    Similarity.recoverIvfIndex(spark, idx)
    assert(Similarity.appendToIvfIndexCommitted(spark, idx, extra, 77L))
    assert(spark.read.parquet(s"$idx/cells").count() ==
      even.count() + odd.count() + 5)
  }
}
