package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val queries = corpus.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  test("brute-force top-k: k rows per query, scores descending") {
    val tk = Similarity.topKBruteForce(corpus, queries, 10).cache()
    assert(tk.groupBy("query_id").count().filter(col("count") =!= 10).count() == 0)
    val nonMonotonic = tk.as("a").join(tk.as("b"),
      col("a.query_id") === col("b.query_id") &&
        col("a.rank") + 1 === col("b.rank") &&
        col("a.score") < col("b.score"))
    assert(nonMonotonic.count() == 0)
  }

  test("IVF finds planted near-duplicates at rank 1 (same-cell guarantee)") {
    // plant: queries = perturbed copies of vecs 0..9 (dim0 zeroed,
    // cosine ≈ 0.99 to the original) — a real IVF must put each mutant in
    // its original's cell and return the original first
    val planted = corpus.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("query_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, lit(0.0f)).otherwise(x)).as("qvec"))
    val ivf = Similarity.topKIvf(corpus, planted, 10, ncells = 8, nprobe = 2)
    val rank1 = ivf.filter(col("rank") === 1 &&
      col("vec_id") === col("query_id") - 5000)
    assert(rank1.count() == 10)
  }

  test("IVF recall beats the scanned-fraction baseline on isotropic data") {
    // the synthetic embeddings have no cluster structure (same-label and
    // cross-label cosine distributions coincide), so cell-probing recall
    // is bounded by data geometry; require it to at least beat random
    // cell selection (nprobe/ncells = 25%) by a wide margin
    val brute = Similarity.topKBruteForce(corpus, queries, 10)
      .select(col("query_id"), col("vec_id"))
    val ivf = Similarity.topKIvf(corpus, queries, 10, ncells = 8, nprobe = 2)
      .select(col("query_id"), col("vec_id"))
    val nBrute = brute.count()
    val hit = brute.join(ivf, Seq("query_id", "vec_id"), "left_semi").count()
    assert(nBrute > 0 && hit.toDouble / nBrute >= 0.30,
      s"IVF recall ${hit.toDouble / nBrute} ($hit/$nBrute)")
  }

  test("IVF-bucketed near-dups: full recall vs the exact all-pairs oracle") {
    // corpus ∪ dim0-zeroed mutants (the gate query's shape): every ≥0.9
    // pair the exact broadcast oracle finds must also come out of the
    // bucketed path, with identical rounded scores
    val base = corpus.select(col("vec_id"), col("embedding"))
    val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val all = base.unionByName(mutants)
    val exact = Similarity.cosineNearDups(all, 0.9)
    val ivf = Similarity.cosineNearDupsIvf(all, 0.9)
    assert(exact.count() > 0)
    assert(exact.exceptAll(ivf).count() == 0 && ivf.exceptAll(exact).count() == 0)
  }

  test("RHP-LSH near-dups: recall >= 0.95 and exact scores on found pairs") {
    val base = corpus.select(col("vec_id"), col("embedding"))
    val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val all = base.unionByName(mutants)
    val exact = Similarity.cosineNearDups(all, 0.9).cache()
    val rhp = Similarity.cosineNearDupsRhp(all, 0.9).cache()
    val nExact = exact.count()
    val hit = exact.join(rhp, Seq("va", "vb"), "left_semi").count()
    assert(nExact > 0 && hit.toDouble / nExact >= 0.95,
      s"RHP recall ${hit.toDouble / nExact} ($hit/$nExact)")
    // precision is exact: every emitted pair appears in the oracle with
    // the identical rounded score
    assert(rhp.exceptAll(exact).count() == 0)
  }

  test("ivfIndexCached fits the quantizer once per (session, tag)") {
    val c = corpus.select(col("vec_id"), col("embedding"))
    val a = Similarity.ivfIndexCached(spark, "spec-cache-test")(c)
    val b = Similarity.ivfIndexCached(spark, "spec-cache-test")(
      sys.error("by-name corpus must not be re-evaluated on a cache hit"))
    assert(a eq b)
  }

  test("ivfIndex accepts array<double> embeddings (not only array<float>)") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dbl = corpus.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
    val (assigned, cents) = Similarity.ivfIndex(dbl, ncells = 4)
    assert(cents.count() == 4)
    assert(assigned.count() == dbl.count())
    // same quantizer as the float corpus: identical cell assignment
    val (assignedF, _) = Similarity.ivfIndex(
      corpus.select(col("vec_id"), col("embedding")), ncells = 4)
    val a = assigned.select("vec_id", "cell")
    val b = assignedF.select("vec_id", "cell")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("cosine is symmetric and self-similarity is 1") {
    val e = corpus.limit(5).select(col("vec_id"), col("embedding"))
    val self = e.select(round(Similarity.cosine(col("embedding"), col("embedding")), 9))
      .collect().map(_.getDouble(0))
    assert(self.forall(_ == 1.0))
  }

  test("PQ encode: m codes per vector, all within the codebook range") {
    val cb = Similarity.pqCodebooks(corpus, m = 8, kcodes = 16)
    val enc = Similarity.pqEncode(corpus, cb).cache()
    assert(enc.filter(size(col("codes")) =!= 8).count() == 0)
    val outOfRange = enc
      .select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 16)
    assert(outOfRange.count() == 0)
    assert(enc.count() == corpus.count())
  }

  test("PQ+rerank finds planted near-duplicates at rank 1") {
    val planted = corpus.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("query_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, lit(0.0f)).otherwise(x)).as("qvec"))
    val pq = Similarity.topKPq(corpus, planted, 10)
    val rank1 = pq.filter(col("rank") === 1 &&
      col("vec_id") === col("query_id") - 5000)
    assert(rank1.count() == 10)
  }

  test("PQ recall vs brute force; returned scores are exact") {
    val brute = Similarity.topKBruteForce(corpus, queries, 10)
      .select(col("query_id"), col("vec_id"), col("score")).cache()
    val pq = Similarity.topKPq(corpus, queries, 10)
      .select(col("query_id"), col("vec_id"), col("score")).cache()
    val nBrute = brute.count()
    val hit = brute.drop("score")
      .join(pq.drop("score"), Seq("query_id", "vec_id"), "left_semi").count()
    // isotropic data (see the IVF recall note): 16^8 effective cells +
    // 4k-deep exact rerank keeps recall far above the IVF floor
    assert(nBrute > 0 && hit.toDouble / nBrute >= 0.60,
      s"PQ recall ${hit.toDouble / nBrute} ($hit/$nBrute)")
    // phase-2 scores are the exact cosine: any (query, vec) present in
    // both results carries the identical rounded score
    val mismatch = pq.join(brute, Seq("query_id", "vec_id"))
      .filter(pq("score") =!= brute("score"))
    assert(mismatch.count() == 0)
  }

  test("SQ8: codes in range, rerank recall vs brute force, exact rerank scores, " +
      "persisted index round-trips, TopKPerKey replan") {
    val (lo, hi) = Similarity.sq8Stats(corpus)
    assert(lo.length == hi.length && lo.indices.forall(i => lo(i) <= hi(i)))
    // every code is an 8-bit value — the 1-byte-per-dim claim
    val codes = Similarity.sq8Encode(corpus, lo, hi)
    val outOfRange = codes
      .filter(exists(col("codes"), c => c < 0 || c > 255)).count()
    assert(outOfRange == 0, s"$outOfRange vectors carry out-of-range codes")
    // production path: approx shortlist + exact rerank; affine 8-bit
    // error is tiny next to PQ's, so recall stays near-exact even on
    // the isotropic corpus
    val brute = Similarity.topKBruteForce(corpus, queries, 10)
      .select(col("query_id"), col("vec_id"), col("score")).cache()
    val sq = Similarity.topKSq8(corpus, queries, 10)
      .select(col("query_id"), col("vec_id"), col("score")).cache()
    val nBrute = brute.count()
    val hit = brute.drop("score")
      .join(sq.drop("score"), Seq("query_id", "vec_id"), "left_semi").count()
    assert(nBrute > 0 && hit.toDouble / nBrute >= 0.90,
      s"SQ8 recall ${hit.toDouble / nBrute} ($hit/$nBrute)")
    // rerank scores are the exact cosine
    val mismatch = sq.join(brute, Seq("query_id", "vec_id"))
      .filter(sq("score") =!= brute("score"))
    assert(mismatch.count() == 0)
    // persisted index: load + query == fit + query (pure-ADC regime so
    // the codes themselves are load-bearing in the comparison)
    val dir = s"${System.getProperty("java.io.tmpdir")}/sq8idx_${spark.sparkContext.applicationId}"
    Similarity.writeSq8Index(corpus, dir)
    val (loadedCodes, lo2, hi2) = Similarity.readSq8Index(spark, dir)
    assert(lo2.sameElements(lo) && hi2.sameElements(hi),
      "bounds did not round-trip bit-exactly")
    val fresh = Similarity.topKSq8(corpus, queries, 10, rerank = 0,
      stats = Some((lo, hi)))
    val loaded = Similarity.topKSq8(corpus, queries, 10, rerank = 0,
      stats = Some((lo2, hi2)), encodedIndex = Some(loadedCodes))
    assert(fresh.exceptAll(loaded).isEmpty && loaded.exceptAll(fresh).isEmpty)
    // the ranking window replans onto the native bounded heap
    val plan = sq.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(2000))
  }

  test("SQ8 append: frozen bounds, clamped drift codes, grown == fresh-encode") {
    val half = corpus.filter(col("vec_id") < 250)
    val rest = corpus.filter(col("vec_id") >= 250)
    val dir = s"${System.getProperty("java.io.tmpdir")}/sq8app_${spark.sparkContext.applicationId}"
    Similarity.writeSq8Index(half, dir)
    Similarity.appendToSq8Index(spark, dir, rest)
    val (codes, lo, hi) = Similarity.readSq8Index(spark, dir)
    // the grown code table == encoding the full corpus under the SAME
    // frozen half-corpus bounds
    val fresh = Similarity.sq8Encode(corpus, lo, hi)
    assert(codes.exceptAll(fresh).isEmpty && fresh.exceptAll(codes).isEmpty,
      "grown code table != fresh encode under frozen bounds")
    // drift really happened AND really clamped: appended dims exist
    // strictly outside the frozen half-corpus bounds (so an unclamped
    // encode would emit codes < 0 or > 255), yet every stored code is
    // in 0..255 — together these prove the saturation path ran
    val loL = typedLit(lo); val hiL = typedLit(hi)
    val oob = rest.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .filter(col("x").cast("double") < element_at(loL, col("i") + 1) ||
        col("x").cast("double") > element_at(hiL, col("i") + 1)).count()
    assert(oob > 0, "no appended value drifted outside the frozen bounds — clamp untested")
    assert(codes.filter(exists(col("codes"),
      c => c < 0 || c > 255)).count() == 0)
  }

  test("SQ8 committed append + compaction: retries exactly-once, one sorted code file") {
    val half = corpus.filter(col("vec_id") < 250)
    val rest = corpus.filter(col("vec_id") >= 250)
    val dir = s"${System.getProperty("java.io.tmpdir")}/sq8cmt_${spark.sparkContext.applicationId}"
    Similarity.writeSq8Index(half, dir)
    // wide-regime staging for this 250-vec batch (see the PQ lifecycle
    // test): the adaptive default would stage one file
    spark.conf.set("spark.graft.append.rowsPerStagedFile", "64")
    assert(Similarity.appendToSq8IndexCommitted(spark, dir, rest, 1L))
    val n1 = spark.read.parquet(s"$dir/codes").count()
    assert(n1 == corpus.count())
    // parallel encode (r20): one promoted file per non-empty range slice
    assert(new java.io.File(s"$dir/codes").listFiles()
      .count(f => f.getName.startsWith("batch-1-")
        && f.getName.endsWith(".parquet")) > 1,
      "committed SQ8 append still single-file")
    assert(!Similarity.appendToSq8IndexCommitted(spark, dir, rest, 1L))
    val marker = new java.io.File(s"$dir/_committed/batch-1")
    assert(marker.exists() && marker.delete())
    assert(Similarity.appendToSq8IndexCommitted(spark, dir, rest, 1L))
    assert(spark.read.parquet(s"$dir/codes").count() == n1,
      "marker-lost retry duplicated code rows")
    val before = spark.read.parquet(s"$dir/codes").collect().toSet
    Similarity.compactSq8Index(spark, dir)
    val files = new java.io.File(s"$dir/codes").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"codes not compacted to one file: $files")
    assert(spark.read.parquet(s"$dir/codes").collect().toSet == before,
      "compaction changed the code table")
    spark.conf.unset("spark.graft.append.rowsPerStagedFile")
  }

  test("recoverSq8Index: a torn compaction swap is restorable WITHOUT running another compaction") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/sq8rec_${spark.sparkContext.applicationId}"
    Similarity.writeSq8Index(corpus, dir)
    val before = spark.read.parquet(s"$dir/codes").collect().toSet
    // torn swapIn: live parked as .old, stage gone, nothing renamed in —
    // every read/probe of codes/ now fails until recovery runs
    assert(new java.io.File(s"$dir/codes")
      .renameTo(new java.io.File(s"$dir/codes.old")))
    Similarity.recoverSq8Index(spark, dir)
    assert(spark.read.parquet(s"$dir/codes").collect().toSet == before,
      "recoverSq8Index did not restore the parked generation")
    // idempotent: safe to call any time
    Similarity.recoverSq8Index(spark, dir)
    assert(spark.read.parquet(s"$dir/codes").collect().toSet == before)
  }

  test("committed append rejects a retry whose re-staged content differs (fingerprint guard)") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/sq8fp_${spark.sparkContext.applicationId}"
    val half = corpus.filter(col("vec_id") < 250)
    val restA = corpus.filter(col("vec_id") >= 250 && col("vec_id") < 400)
    val restB = corpus.filter(col("vec_id") >= 400)
    Similarity.writeSq8Index(half, dir)
    assert(Similarity.appendToSq8IndexCommitted(spark, dir, restA, 1L))
    // lose the marker (the crash window a blind retry replays), then
    // retry the SAME batch id with DIFFERENT rows — the caller-bug /
    // changed-config case that would silently replace one generation's
    // content with another's: the recorded fingerprint must fail it
    // loudly instead
    assert(new java.io.File(s"$dir/_committed/batch-1").delete())
    val e = intercept[IllegalStateException] {
      Similarity.appendToSq8IndexCommitted(spark, dir, restB, 1L)
    }
    assert(e.getMessage.contains("fingerprint"), e.getMessage)
    // an HONEST deterministic retry of the same batch still lands clean
    assert(Similarity.appendToSq8IndexCommitted(spark, dir, restA, 1L))
    assert(spark.read.parquet(s"$dir/codes").count() ==
      half.count() + restA.count(),
      "fingerprint-guarded retry duplicated or lost rows")
  }

  test("PQ lifecycle: frozen-codebook committed appends retry exactly-once, compact to one file, torn swap recovers") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/pqcmt_${spark.sparkContext.applicationId}"
    val half = corpus.filter(col("vec_id") < 250)
    val rest = corpus.filter(col("vec_id") >= 250)
    Similarity.writePqIndex(half, Similarity.pqCodebooks(half), dir)
    // pin the adaptive-width slice knob low so this 250-vec batch
    // exercises the wide (backfill) staging regime (r21: default 32768
    // rows/file stages micro-batches as ONE file)
    spark.conf.set("spark.graft.append.rowsPerStagedFile", "64")
    assert(Similarity.appendToPqIndexCommitted(spark, dir, rest, 1L))
    val n1 = spark.read.parquet(s"$dir/codes").count()
    assert(n1 == corpus.count())
    // grown code table == one big encode under the SAME frozen codebooks
    // (frozen-codebook appends commute — the contract the gate leans on)
    val (codes, cb) = Similarity.readPqIndex(spark, dir)
    val fresh = Similarity.pqEncode(corpus, cb)
    assert(codes.exceptAll(fresh).isEmpty && fresh.exceptAll(codes).isEmpty,
      "grown code table != fresh encode under frozen codebooks")
    // parallel encode (r20, verdict r19 #3): the staged codes range-
    // partition on vec_id — a backfill batch writes through every core,
    // one promoted file per non-empty range slice
    val batchFiles = new java.io.File(s"$dir/codes").listFiles()
      .count(f => f.getName.startsWith("batch-1-")
        && f.getName.endsWith(".parquet"))
    assert(batchFiles > 1,
      s"committed PQ append still single-file ($batchFiles)")
    // blind retry no-op; marker-lost retry converges via clear-then-promote
    assert(!Similarity.appendToPqIndexCommitted(spark, dir, rest, 1L))
    val marker = new java.io.File(s"$dir/_committed/batch-1")
    assert(marker.exists() && marker.delete())
    assert(Similarity.appendToPqIndexCommitted(spark, dir, rest, 1L))
    assert(spark.read.parquet(s"$dir/codes").count() == n1,
      "marker-lost retry duplicated PQ code rows")
    // compaction: one sorted file, identical content
    val before = spark.read.parquet(s"$dir/codes").collect().toSet
    Similarity.compactPqIndex(spark, dir)
    val files = new java.io.File(s"$dir/codes").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"codes not compacted to one file: $files")
    assert(spark.read.parquet(s"$dir/codes").collect().toSet == before,
      "compaction changed the PQ code table")
    // torn swap: live parked as .old — recoverPqIndex restores it
    assert(new java.io.File(s"$dir/codes")
      .renameTo(new java.io.File(s"$dir/codes.old")))
    Similarity.recoverPqIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/codes").collect().toSet == before,
      "recoverPqIndex did not restore the parked generation")
    // the grown index answers the PRUNED production regime (default
    // rerank): recall floor vs brute force, exact returned scores.
    // Re-read: the pre-compaction `codes` plan is bound to file names
    // the generation swap replaced.
    val (codesNow, _) = Similarity.readPqIndex(spark, dir)
    val got = Similarity.topKPq(corpus, queries, 10,
      codebooks = Some(cb), encodedIndex = Some(codesNow))
    val brute = Similarity.topKBruteForce(
      corpus.select(col("vec_id"), col("embedding")), queries, 10)
    val hit = got.select("query_id", "vec_id")
      .intersect(brute.select("query_id", "vec_id")).count()
    assert(hit >= (brute.count() * 6) / 10,
      s"grown-index pruned recall too low: $hit / ${brute.count()}")
    spark.conf.unset("spark.graft.append.rowsPerStagedFile")
  }

  test("IVF×SQ8: exhaustive probe == pure-ADC SQ8; pruned rows keep exact ADC scores") {
    // probing every cell makes the composed operator score every pair —
    // it must then equal the single-effect SQ8 ranking exactly
    val adc = Similarity.topKSq8(corpus, queries, 10, rerank = 0).cache()
    val full = Similarity.topKIvfSq8(corpus, queries, 10,
      ncells = 8, nprobe = 8)
    assert(full.exceptAll(adc).isEmpty && adc.exceptAll(full).isEmpty,
      "exhaustive IVF×SQ8 diverged from pure-ADC SQ8")
    // pruned regime: any (query, vec) it returns carries the identical
    // decoded-cosine score (pruning changes WHICH rows, never a score)
    val pruned = Similarity.topKIvfSq8(corpus, queries, 10,
        ncells = 8, nprobe = 2)
      .select(col("query_id"), col("vec_id"), col("score")).cache()
    val allScores = adc.select(col("query_id"), col("vec_id"), col("score"))
    val joined = pruned.as("p").join(allScores.as("a"),
      Seq("query_id", "vec_id"), "inner")
    val mismatch = joined.filter(col("p.score") =!= col("a.score")).count()
    assert(mismatch == 0, s"$mismatch pruned rows changed their ADC score")
    assert(pruned.count() > 0)
  }

  test("PQ index persists as data: load + query == fit + query") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/pqidx_${spark.sparkContext.applicationId}"
    val cb = Similarity.pqCodebooks(corpus)
    Similarity.writePqIndex(corpus, cb, dir)
    val (codes, cbLoaded) = Similarity.readPqIndex(spark, dir)
    // codebook roundtrips bit-exactly (toString/parse of doubles is lossless)
    assert(cbLoaded.length == cb.length &&
      cb.indices.forall(s => cbLoaded(s).length == cb(s).length &&
        cb(s).indices.forall(c => cbLoaded(s)(c).sameElements(cb(s)(c)))))
    val fresh = Similarity.topKPq(corpus, queries, 10, codebooks = Some(cb))
    val loaded = Similarity.topKPq(corpus, queries, 10,
      codebooks = Some(cbLoaded), encodedIndex = Some(codes))
    assert(fresh.exceptAll(loaded).isEmpty && loaded.exceptAll(fresh).isEmpty)
  }

  test("IVF index persists cell-partitioned: load + query == fit + query, " +
      "and probes prune partitions dynamically") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/ivfidx_${spark.sparkContext.applicationId}"
    Similarity.writeIvfIndex(corpus, ncells = 8, dir)
    val idx = Similarity.readIvfIndex(spark, dir)
    val fresh = Similarity.topKIvf(corpus, queries, 10, ncells = 8)
    val loaded = Similarity.topKIvf(corpus, queries, 10, ncells = 8,
      index = Some(idx))
    assert(fresh.exceptAll(loaded).isEmpty && loaded.exceptAll(fresh).isEmpty)
    // the probe join against the cell-PARTITIONED store plans a dynamic
    // partition prune: only the probed cells' directories are read —
    // at scale THIS is why the index is laid out by cell
    val plan = loaded.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
  }

  test("writeIvfIndex persists a PREFITTED index: kmeansFit round-trips through disk") {
    // kmeansFit exists because the driver-sample quantizer stops being
    // representative at SemDeDup scale — so the persisted-index path must
    // accept it (round-14 verdict #4: the corpus-arg overload hardcoded a
    // fresh sample fit). Same (assigned, cents) contract, PRUNED probes:
    // cells and centroids must survive the parquet/JSON round-trip exactly.
    val base = corpus.select(col("vec_id"), col("embedding"))
    val fit = Similarity.kmeansFit(base, k = 8, iters = 2)
    val dir = s"${System.getProperty("java.io.tmpdir")}/kmidx_${spark.sparkContext.applicationId}"
    Similarity.writeIvfIndex(fit, dir)
    val loaded = Similarity.readIvfIndex(spark, dir)
    val fresh = Similarity.topKIvf(base, queries, 10, nprobe = 2,
      index = Some(fit))
    val viaDisk = Similarity.topKIvf(base, queries, 10, nprobe = 2,
      index = Some(loaded))
    assert(fresh.exceptAll(viaDisk).isEmpty && viaDisk.exceptAll(fresh).isEmpty,
      "kmeansFit-built index changed results through persistence")
  }

  test("appendToIvfIndex: frozen-quantizer append; exhaustive probe over the grown index is exact") {
    // production index maintenance: new vectors assigned by the
    // PERSISTED centroids, landed as appended files - and because an
    // exhaustive probe scores every cell, correctness must not depend on
    // WHICH cell the frozen quantizer chose for the appendees.
    val dir = s"${System.getProperty("java.io.tmpdir")}/ivfapp_${spark.sparkContext.applicationId}"
    val half1 = corpus.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val half2 = corpus.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(half1, ncells = 8, dir)
    Similarity.appendToIvfIndex(half2, dir)
    val idx = Similarity.readIvfIndex(spark, dir)
    // the loaded index covers BOTH generations
    assert(idx._1.count() == half1.count() + half2.count())
    // exhaustive probe == brute force over the full corpus
    val viaIdx = Similarity.topKIvf(corpus, queries, 10, ncells = 8,
      nprobe = 8, index = Some(idx))
    val brute = Similarity.topKBruteForce(
      corpus.select(col("vec_id"), col("embedding")), queries, 10)
    assert(viaIdx.exceptAll(brute).isEmpty && brute.exceptAll(viaIdx).isEmpty,
      "append changed results vs brute force under exhaustive probing")
    // appended rows share the centroid geometry: a pruned probe still
    // partition-prunes the grown layout
    val pruned = Similarity.topKIvf(corpus, queries, 10, ncells = 8,
      nprobe = 2, index = Some(idx))
    assert(pruned.queryExecution.executedPlan.toString.contains("dynamicpruning"))
  }

  test("committed IVF append + compaction: blind retries exactly-once, one file per cell, probe identity") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/ivfcmt_${spark.sparkContext.applicationId}"
    val half1 = corpus.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val half2 = corpus.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(half1, ncells = 8, dir)
    assert(Similarity.appendToIvfIndexCommitted(spark, dir, half2, 1L))
    val n1 = spark.read.parquet(s"$dir/cells").count()
    assert(n1 == half1.count() + half2.count())
    // blind retry: no-op; marker-lost retry: wholesale replace keeps rows single
    assert(!Similarity.appendToIvfIndexCommitted(spark, dir, half2, 1L))
    assert(spark.read.parquet(s"$dir/cells").count() == n1)
    val marker = new java.io.File(s"$dir/_committed/batch-1")
    assert(marker.exists() && marker.delete())
    assert(Similarity.appendToIvfIndexCommitted(spark, dir, half2, 1L))
    assert(spark.read.parquet(s"$dir/cells").count() == n1,
      "marker-lost retry duplicated appended vectors")
    // probe snapshot, compact, probe identity + one file per cell
    def probe() = Similarity.topKIvf(corpus, queries, 10, ncells = 8,
        nprobe = 2, index = Some(Similarity.readIvfIndex(spark, dir)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = probe()
    Similarity.compactIvfIndex(spark, dir)
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { cd =>
      val n = cd.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"${cd.getName}: $n files after compaction")
    }
    assert(spark.read.parquet(s"$dir/cells").count() == n1)
    assert(probe() == before, "compaction changed probe results")
    // torn swap recovers
    assert(new java.io.File(s"$dir/cells")
      .renameTo(new java.io.File(s"$dir/cells.old")))
    Similarity.compactIvfIndex(spark, dir)
    assert(probe() == before, "torn-swap recovery lost rows")
  }

  test("refitIvfIndex == fresh kmeansFit build on the grown corpus; torn two-directory swaps recover in both directions") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/ivfref_${spark.sparkContext.applicationId}"
    val half1 = corpus.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val half2 = corpus.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(half1, ncells = 8, dir)
    Similarity.appendToIvfIndex(half2, dir)
    Similarity.refitIvfIndex(spark, dir, ncells = 8, iters = 2)
    // refit index == a fresh kmeansFit build persisted over the union
    val freshDir = s"${dir}_fresh"
    Similarity.writeIvfIndex(
      Similarity.kmeansFit(half1.unionByName(half2), k = 8, iters = 2),
      freshDir)
    def dump(p: String) = spark.read.parquet(s"$p/cells")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(dump(dir) == dump(freshDir),
      "refit assignment diverged from a fresh build on the union")
    def probe(p: String) = Similarity.topKIvf(corpus, queries, 10,
        nprobe = 2, index = Some(Similarity.readIvfIndex(spark, p)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = probe(freshDir)
    assert(probe(dir) == expected, "refit probe diverged from fresh build")

    // torn window A: crash BEFORE any swap (both stages present) —
    // recovery rolls BACK to the consistent live pair
    val beforeCells = dump(dir)
    spark.read.parquet(s"$dir/cells")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/_refit_cells")
    spark.read.json(s"$dir/centroids")
      .write.mode("overwrite").json(s"$dir/_refit_centroids")
    Similarity.recoverIvfIndex(spark, dir)
    assert(!new java.io.File(s"$dir/_refit_cells").exists()
      && !new java.io.File(s"$dir/_refit_centroids").exists(),
      "roll-back left refit stages behind")
    assert(dump(dir) == beforeCells)

    // torn window B: cells swap committed, centroids swap pending —
    // recovery must roll FORWARD (old centroids never probe new cells).
    // Simulate with a marked centroids stage whose content differs.
    val centsBefore = spark.read.json(s"$dir/centroids")
      .select("centroids").head().getString(0)
    spark.read.json(s"$dir/centroids")
      .write.mode("overwrite").json(s"$dir/_refit_centroids")
    Similarity.recoverIvfIndex(spark, dir)
    assert(!new java.io.File(s"$dir/_refit_centroids").exists(),
      "roll-forward left the centroids stage behind")
    assert(spark.read.json(s"$dir/centroids")
      .select("centroids").head().getString(0) == centsBefore)
    assert(probe(dir) == expected, "recovery changed probe results")
  }

  test("refit beats the drifted frozen index: equal recall, strictly fewer candidates scanned") {
    // planted drift: the appended segment is a TIGHT off-manifold
    // cluster (constant direction + per-vector jitter in one dim). The
    // frozen half-corpus quantizer lumps it into ONE existing cell —
    // drifted probes then scan that cell's original members too — while
    // a refit gives the drifted mass its own cell(s): same recall,
    // strictly smaller candidate sets. That scan-cost-at-equal-recall
    // ratio is exactly what refit buys at 100 TB.
    val dir = s"${System.getProperty("java.io.tmpdir")}/ivfdrift_${spark.sparkContext.applicationId}"
    val base = corpus.select(col("vec_id"), col("embedding"))
    val drifted = corpus.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (_, i) =>
        when(i === 0, lit(20.0f) + pmod(col("vec_id"), lit(7)).cast("float"))
          .otherwise(lit(5.0f))).as("embedding"))
    Similarity.writeIvfIndex(base, ncells = 8, dir)
    Similarity.appendToIvfIndex(drifted, dir)
    val frozen = Similarity.readIvfIndex(spark, dir)
    val dq = drifted.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def recallAndCost(idx: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): (Long, Long) = {
      val got = Similarity.topKIvf(
        base.unionByName(drifted), dq, 10, nprobe = 1, index = Some(idx))
      // recall = returned drifted neighbors (the true top-k of a drifted
      // query is all-drifted: within-cluster cosine ≈ 1)
      val rec = got.filter(col("vec_id") >= 1000000).count()
      // cost = Σ probed-cell sizes over queries
      val sizes = idx._1.groupBy("cell").count()
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("cscore").desc, col("cell"))
      val probed = dq.crossJoin(broadcast(idx._2))
        .withColumn("cscore", Similarity.cosine(col("qvec"), col("centroid")))
        .withColumn("crank", row_number().over(wq))
        .filter(col("crank") <= 1).select("query_id", "cell")
      val cost = probed.join(sizes, "cell").agg(sum("count")).head().getLong(0)
      (rec, cost)
    }
    val (recFrozen, costFrozen) = recallAndCost(frozen)
    // the drift SIGNAL: under frozen centroids the appended cluster
    // piles into few cells — ivfCellStats reads high imbalance, and the
    // refit must bring it down (this is the measurement a deployment's
    // refit policy watches)
    val (_, _, _, imbFrozen) = Similarity.ivfCellStats(spark, dir)
    Similarity.refitIvfIndex(spark, dir, ncells = 8, iters = 2)
    val (_, _, _, imbRefit) = Similarity.ivfCellStats(spark, dir)
    assert(imbFrozen > 1.5, s"drift fixture not imbalanced: $imbFrozen")
    assert(imbRefit < imbFrozen,
      s"refit did not improve cell balance: $imbRefit >= $imbFrozen")
    val (recRefit, costRefit) = recallAndCost(Similarity.readIvfIndex(spark, dir))
    assert(recRefit >= recFrozen,
      s"refit lost recall: $recRefit < $recFrozen (cost $costRefit vs $costFrozen)")
    assert(recRefit > recFrozen || costRefit < costFrozen,
      s"refit did not beat the drifted frozen index on either axis: " +
        s"recall $recRefit vs $recFrozen, cost $costRefit vs $costFrozen")
  }

  test("cellsFor: the cells-∝-corpus rule, floored") {
    assert(Similarity.cellsFor(500) == 8)     // floor regime
    assert(Similarity.cellsFor(4000) == 8)
    assert(Similarity.cellsFor(40000) == 80)  // the r16 probe's scale point
    assert(Similarity.cellsFor(10000000) == 20000)
    assert(Similarity.cellsFor(10000000, perCell = 100000) == 100)
    // clamped, never wrapped negative at extreme corpus sizes
    assert(Similarity.cellsFor(Long.MaxValue) == Int.MaxValue)
  }

  test("minedNegatives: planted positives excluded, k per probe, native TopK") {
    import org.apache.spark.sql.functions.{transform => atransform, _}
    val base = corpus.select(col("vec_id"), col("embedding"))
    val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
      atransform(col("embedding"), (x, i) =>
        when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val probes = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = base.filter(col("vec_id") % 25 =!= 0).unionByName(mutants)
    val negs = Similarity.minedNegatives(full, probes, 5, 0.9)
    val rows = negs.collect()
    // exclusion is load-bearing: each probe's own mutant sits in the
    // corpus at cosine ~0.9997 and must never be returned
    assert(!rows.exists(r => r.getLong(2) == r.getLong(0) + 1000000),
      "a probe's own near-identical mutant leaked into its negatives")
    assert(rows.forall(_.getDouble(3) < 0.9))
    // exactly k per probe; dense ranks 1..k
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 5))
    assert(byQ.values.forall(_.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    // the window idiom replans onto the native bounded-heap operator
    val plan = negs.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan.take(1500))
  }

  test("minedNegativesIvf: exhaustive == brute force; pruned is an exact-score subset") {
    import org.apache.spark.sql.functions.{transform => atransform, _}
    val base = corpus.select(col("vec_id"), col("embedding"))
    val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
      atransform(col("embedding"), (x, i) =>
        when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val probes = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = base.filter(col("vec_id") % 25 =!= 0).unionByName(mutants)
    val brute = Similarity.minedNegatives(full, probes, 5, 0.9)
    // forced-exhaustive regime (nprobe = ncells): row-for-row identical —
    // this equality is what lets the gate hash-check the IVF machinery
    val exhaustive = Similarity.minedNegativesIvf(full, probes, 5, 0.9,
      ncells = 8, nprobe = 8)
    assert(exhaustive.exceptAll(brute).isEmpty &&
      brute.exceptAll(exhaustive).isEmpty,
      "exhaustive IVF mining diverged from the brute-force miner")
    // pruned regime: every returned score is EXACT (the candidate set
    // shrinks; the arithmetic must not), thresholds hold, <= k per probe,
    // and each probe's own mutant is still excluded
    val pruned = Similarity.minedNegativesIvf(full, probes, 5, 0.9,
      ncells = 8, nprobe = 2).collect()
    assert(pruned.forall(_.getDouble(3) < 0.9))
    assert(!pruned.exists(r => r.getLong(2) == r.getLong(0) + 1000000))
    assert(pruned.groupBy(_.getLong(0)).values.forall(_.length <= 5))
    val bruteScores = brute.collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // any (probe, vec) pair the pruned path returns that brute force also
    // ranked must carry the identical rounded score
    for (r <- pruned; b <- bruteScores.get((r.getLong(0), r.getLong(2))))
      assert(r.getDouble(3) == b, s"score drift at ${(r.getLong(0), r.getLong(2))}")
  }

  test("topKIvf: shuffle regime (queries above broadcast cap) is row-identical") {
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val idx = Similarity.ivfIndex(corpus, ncells = 8)
    val bc = Similarity.topKIvf(corpus, queries, 10, index = Some(idx))
    val sh = Similarity.topKIvf(corpus, queries, 10, index = Some(idx),
      queryBroadcastCap = 0)
    assert(sh.exceptAll(bc).isEmpty && bc.exceptAll(sh).isEmpty,
      "query-join regimes diverged")
    // the over-cap candidate join must STAY a shuffle join: the map-side
    // probe subtree's small static size estimate would otherwise let the
    // planner auto-broadcast it, collapsing candidate scoring onto the
    // corpus scan's input splits (measured at sf1: 2-task scoring
    // stages, 4x the gate) — the merge hint pins the exchange on cell
    val shuffleJoinPlan = sh.queryExecution.sparkPlan.toString
    assert(shuffleJoinPlan.contains("SortMergeJoin"),
      s"over-cap probe join lost its merge pin:\n$shuffleJoinPlan")
  }

  test("minedNegativesIvf: shuffle regime (probes above broadcast cap) is row-identical") {
    val base = corpus.select(col("vec_id"), col("embedding"))
    val probes = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = base.filter(col("vec_id") % 25 =!= 0)
    val idx = Similarity.ivfIndex(full, ncells = 8)
    def run(cap: Int) = Similarity.minedNegativesIvf(full, probes, 5, 0.9,
      ncells = 8, nprobe = 2, index = Some(idx), probeBroadcastCap = cap)
    val bc = run(1 << 16)      // probes fit: candidate join broadcasts
    val sh = run(0)            // forced scale regime: shuffle equi-join on cell
    assert(sh.exceptAll(bc).isEmpty && bc.exceptAll(sh).isEmpty,
      "probe-join regimes diverged")
    // the regime switch actually switches the candidate-join strategy.
    // Locally the tiny probe fixture auto-broadcasts from size stats, so
    // model the 100 TB planner state (stats far above the threshold) by
    // disabling auto-broadcast: then only a FORCED hint can broadcast,
    // and the scale regime must plan a shuffle join — the hard-coded
    // probe-side broadcast that died when probes ~ corpus is gone.
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      assert(run(1 << 16).queryExecution.sparkPlan.toString
          .contains("BroadcastHashJoin"),
        "under-cap regime lost its broadcast candidate join")
      assert(!run(0).queryExecution.sparkPlan.toString
          .contains("BroadcastHashJoin"),
        "scale regime still plans a forced broadcast hash join")
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("kmeansFit: Lloyd objective non-increasing, k cells 0..k-1, " +
      "index contract feeds topKIvf") {
    val base = corpus.select(col("vec_id"), col("embedding"))
    def sse(assigned: org.apache.spark.sql.DataFrame,
        cents: org.apache.spark.sql.DataFrame): Double = assigned
      .join(cents, "cell")
      .select(expr("aggregate(zip_with(cast(embedding as array<double>), " +
        "centroid, (x, c) -> (x - c) * (x - c)), 0d, (a, y) -> a + y)").as("d"))
      .agg(sum(col("d"))).head().getDouble(0)
    val (a0, c0) = Similarity.kmeansFit(base, k = 8, iters = 0)
    val (a2, c2) = Similarity.kmeansFit(base, k = 8, iters = 2)
    assert(c2.count() == 8)
    assert(c2.select("cell").orderBy("cell").collect().map(_.getInt(0)).toSeq
      == (0 until 8))
    // Lloyd monotonicity: two iterations cannot worsen the objective
    // (6-dp centroid rounding perturbs below fixture distance scales)
    val before = sse(a0, c0); val after = sse(a2, c2)
    assert(after <= before * 1.0001, s"SSE rose: $before -> $after")
    // the fit IS an index: the (assigned, cents) pair drops into the
    // IVF query path unchanged, and a full probe is exhaustive-exact
    val tk = Similarity.topKIvf(base, queries, 5, ncells = 8, nprobe = 8,
      index = Some((a2, c2)))
    val brute = Similarity.topKBruteForce(base, queries, 5)
    assert(tk.exceptAll(brute).isEmpty && brute.exceptAll(tk).isEmpty,
      "exhaustive probe over the kmeansFit index diverged from brute force")
  }

  test("semDeDup: planted dup groups resolved, one edge-most keeper each; " +
      "kmeans-index path agrees on the planted pairs") {
    // corpus ∪ dim0-zeroed mutants: every base–mutant pair is a ≥0.9
    // near-dup; with a real k-means index the pair must share a cell
    // (the same-cell guarantee the rank-1 test pins), so each pair must
    // land in one component with exactly one keeper.
    val base = corpus.select(col("vec_id"), col("embedding"))
    val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val all = base.unionByName(mutants)
    val out = Similarity.semDeDup(all, 0.9, ncells = 8).cache()
    assert(out.count() == all.count(), "audit frame must cover every vector")
    // every planted pair grouped: mutant and base share a component
    val paired = out.as("a").join(out.as("b"),
      col("a.vec_id") + 1000000 === col("b.vec_id") &&
        col("a.component") === col("b.component"))
    assert(paired.count() == base.count(), "a planted pair was not grouped")
    // exactly one keeper per component, and it is the member LEAST
    // similar to its centroid (vec_id tie-break): min (cent_sim, vec_id)
    val kept = out.filter(col("keep"))
    assert(kept.count() == out.select("component").distinct().count())
    val wrongKeeper = out.groupBy("component")
      .agg(min(struct(col("cent_sim"), col("vec_id"))).as("m"))
      .join(kept.select(col("component"), col("vec_id")), "component")
      .filter(col("m.vec_id") =!= col("vec_id"))
    assert(wrongKeeper.count() == 0, "keeper is not the min-cent_sim member")
    // the SemDeDup contract: every dropped vector has a KEPT near-dup at
    // >= threshold (its component's keeper is transitively connected;
    // check the direct-witness form within the component)
    val dropped = out.filter(!col("keep"))
    val witness = dropped.as("d").join(kept.as("k"),
      col("d.component") === col("k.component") &&
        col("d.vec_id") =!= col("k.vec_id"), "left_anti")
    assert(witness.count() == 0, "a dropped vector lost its whole group")
  }

  test("semDeDup blocked hot-cell regime (nBlocks>1) is output-identical") {
    // ONE giant cell is exactly the skew the triangular block join
    // exists for: force everything into a single cell so every pair is
    // a within-cell pair, then check the blocked enumeration loses no
    // pair and invents none — verdicts, components, keepers identical.
    val base = corpus.select(col("vec_id"), col("embedding"))
    val mutants = base.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val all = base.unionByName(mutants)
    val oneCell = (all.withColumn("cell", lit(0)),
      all.sparkSession.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(0)),
        new org.apache.spark.sql.types.StructType()
          .add("cell", org.apache.spark.sql.types.IntegerType))
        .withColumn("centroid",
          typedLit(Array.fill(64)(0.1))))
    val plain = Similarity.semDeDup(all, 0.9, index = Some(oneCell))
      .orderBy("vec_id").collect().toSeq
    graft.util.Scratch.release(spark)
    val blocked = Similarity.semDeDup(all, 0.9, index = Some(oneCell),
        nBlocks = 4)
      .orderBy("vec_id").collect().toSeq
    graft.util.Scratch.release(spark)
    assert(plain == blocked, "blocked regime diverged from plain")
    // replication sanity: the blocked pair space covers the planted
    // pairs (mutant grouped with base through the single hot cell)
    val kept = blocked.count(_.getBoolean(4))
    assert(kept > 0 && kept < blocked.size)
  }

  test("committed IVF append retry under drifted centroids fails loudly " +
      "(fingerprint covers partition routing)") {
    // the ADVICE r17 scenario: a batch promotes, its marker is lost to
    // operator error, the quantizer is refit in between, and the retry
    // re-stages the SAME (vec_id, embedding) rows under DIFFERENT cell
    // routing. The rows are identical — only the cell= partition
    // DIRECTORIES differ — so a fingerprint that drops partition-derived
    // columns would pass and promotion would land the batch's vectors a
    // second time under new cell= dirs (which clearPromoted, mirroring
    // only the CURRENT staging tree, would not address). The directory
    // fold must turn that into the promised loud failure.
    val dir = s"${System.getProperty("java.io.tmpdir")}/ivfdriftretry_${spark.sparkContext.applicationId}"
    val half1 = corpus.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    val half2 = corpus.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(half1, ncells = 8, dir)
    assert(Similarity.appendToIvfIndexCommitted(spark, dir, half2, 2L))
    val marker = new java.io.File(s"$dir/_committed/batch-2")
    assert(marker.exists() && marker.delete())
    Similarity.refitIvfIndex(spark, dir, ncells = 3, iters = 2)
    val ex = intercept[IllegalStateException] {
      Similarity.appendToIvfIndexCommitted(spark, dir, half2, 2L)
    }
    assert(ex.getMessage.contains("fingerprint"),
      s"wrong failure: ${ex.getMessage}")
  }

  test("refitPqIndex: retrains from co-located cells, refit == fresh-encode; " +
      "refuses without vectors; torn two-directory swaps recover both ways") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/pqref_${spark.sparkContext.applicationId}"
    val half = corpus.filter(col("vec_id") < 250)
      .select(col("vec_id"), col("embedding"))
    val rest = corpus.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
    // composed index root: IVF cells are the raw vector store, PQ codes
    // the compression leg — the shape that makes lossy-code refit possible
    Similarity.writeIvfIndex(half, ncells = 8, dir)
    Similarity.writePqIndex(half, Similarity.pqCodebooks(half), dir)
    assert(Similarity.appendToIvfIndexCommitted(spark, dir, rest, 41L))
    assert(Similarity.appendToPqIndexCommitted(spark, dir, rest, 42L))
    Similarity.refitPqIndex(spark, dir)
    val (codes, cb) = Similarity.readPqIndex(spark, dir)
    // fresh-encode equivalence on the SAME celled corpus read: codebook
    // bit-equal, code table row-equal
    val celled = spark.read.parquet(s"$dir/cells")
      .select(col("vec_id"), col("embedding"))
    val freshDir = s"${dir}_fresh"
    Similarity.writePqIndex(celled, Similarity.pqCodebooks(celled), freshDir)
    val (fCodes, fCb) = Similarity.readPqIndex(spark, freshDir)
    assert(cb.flatten.flatten.toSeq == fCb.flatten.flatten.toSeq,
      "refit codebook != fresh fit on the celled corpus")
    assert(codes.exceptAll(fCodes).isEmpty && fCodes.exceptAll(codes).isEmpty,
      "refit code table != fresh encode")
    assert(codes.count() == half.count() + rest.count())
    // no co-located vectors -> the lossy-codes contract refuses loudly
    val bare = s"${dir}_bare"
    Similarity.writePqIndex(half, Similarity.pqCodebooks(half), bare)
    val e = intercept[IllegalArgumentException](
      Similarity.refitPqIndex(spark, bare))
    assert(e.getMessage.contains("lossy"), e.getMessage)
    // torn window A: crash BEFORE any swap (both stages present) —
    // recovery rolls BACK and drops both stages
    def dumpCodes() = spark.read.parquet(s"$dir/codes")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    val before = dumpCodes()
    spark.read.parquet(s"$dir/codes")
      .write.mode("overwrite").parquet(s"$dir/_refit_codes")
    spark.read.json(s"$dir/codebook")
      .write.mode("overwrite").json(s"$dir/_refit_codebook")
    Similarity.recoverPqIndex(spark, dir)
    assert(!new java.io.File(s"$dir/_refit_codes").exists()
      && !new java.io.File(s"$dir/_refit_codebook").exists(),
      "roll-back left refit stages behind")
    assert(dumpCodes() == before)
    // torn window B: codes swap committed, codebook swap pending —
    // recovery rolls FORWARD (old codebooks never decode new codes)
    val cbBefore = spark.read.json(s"$dir/codebook")
      .select("codebook").head().getString(0)
    spark.read.json(s"$dir/codebook")
      .write.mode("overwrite").json(s"$dir/_refit_codebook")
    Similarity.recoverPqIndex(spark, dir)
    assert(!new java.io.File(s"$dir/_refit_codebook").exists(),
      "roll-forward left the codebook stage behind")
    assert(spark.read.json(s"$dir/codebook")
      .select("codebook").head().getString(0) == cbBefore)
  }

  test("refitSq8Index: retrains bounds from co-located cells, refit == " +
      "fresh write; refuses without vectors; torn swaps recover both ways") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/sq8ref_${spark.sparkContext.applicationId}"
    val half = corpus.filter(col("vec_id") < 250)
      .select(col("vec_id"), col("embedding"))
    val rest = corpus.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(half, ncells = 8, dir)
    Similarity.writeSq8Index(half, dir)
    assert(Similarity.appendToIvfIndexCommitted(spark, dir, rest, 61L))
    assert(Similarity.appendToSq8IndexCommitted(spark, dir, rest, 62L))
    Similarity.refitSq8Index(spark, dir)
    val (codes, lo, hi) = Similarity.readSq8Index(spark, dir)
    val celled = spark.read.parquet(s"$dir/cells")
      .select(col("vec_id"), col("embedding"))
    val freshDir = s"${dir}_fresh"
    Similarity.writeSq8Index(celled, freshDir)
    val (fCodes, fLo, fHi) = Similarity.readSq8Index(spark, freshDir)
    assert(lo.toSeq == fLo.toSeq && hi.toSeq == fHi.toSeq,
      "refit bounds != fresh fit on the celled corpus")
    assert(codes.exceptAll(fCodes).isEmpty && fCodes.exceptAll(codes).isEmpty,
      "refit code table != fresh encode")
    // the drift was REAL: the refit widened at least one bound beyond
    // the half-corpus fit (else saturation never happened and the gate
    // would pass vacuously)
    val (hLo, hHi) = Similarity.sq8Stats(half)
    assert(lo.zip(hLo).exists { case (a, b) => a < b }
        || hi.zip(hHi).exists { case (a, b) => a > b },
      "fixture has no out-of-bounds drift — refit untestable")
    // no co-located vectors -> refuse loudly
    val bare = s"${dir}_bare"
    Similarity.writeSq8Index(half, bare)
    val e = intercept[IllegalArgumentException](
      Similarity.refitSq8Index(spark, bare))
    assert(e.getMessage.contains("lossy"), e.getMessage)
    // torn window A: both stages present -> roll back, stages dropped
    def dumpCodes() = spark.read.parquet(s"$dir/codes")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    val before = dumpCodes()
    spark.read.parquet(s"$dir/codes")
      .write.mode("overwrite").parquet(s"$dir/_refit_codes")
    spark.read.json(s"$dir/bounds")
      .write.mode("overwrite").json(s"$dir/_refit_bounds")
    Similarity.recoverSq8Index(spark, dir)
    assert(!new java.io.File(s"$dir/_refit_codes").exists()
      && !new java.io.File(s"$dir/_refit_bounds").exists())
    assert(dumpCodes() == before)
    // torn window B: codes swapped, bounds pending -> roll forward
    val bBefore = spark.read.json(s"$dir/bounds")
      .select("bounds").head().getString(0)
    spark.read.json(s"$dir/bounds")
      .write.mode("overwrite").json(s"$dir/_refit_bounds")
    Similarity.recoverSq8Index(spark, dir)
    assert(!new java.io.File(s"$dir/_refit_bounds").exists())
    assert(spark.read.json(s"$dir/bounds")
      .select("bounds").head().getString(0) == bBefore)
  }

  test("refitPqIndex under concurrent ingest: a batch committed during the " +
      "retrain survives into the new codes generation (r19 fence+delta)") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/pqing_${spark.sparkContext.applicationId}"
    val half = corpus.filter(col("vec_id") < 250)
      .select(col("vec_id"), col("embedding"))
    val late = corpus.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(half, ncells = 8, dir)
    Similarity.writePqIndex(half, Similarity.pqCodebooks(half), dir)
    // the batch lands in BOTH legs of the composed root mid-retrain —
    // without the fence+delta discipline its codes would be silently
    // erased at swapIn (and the _committed marker makes a retry a no-op)
    Similarity.refitPqIndex(spark, dir, afterFit = () => {
      assert(Similarity.appendToIvfIndexCommitted(spark, dir, late, 91L))
      assert(Similarity.appendToPqIndexCommitted(spark, dir, late, 92L))
    })
    val (codes, cb) = Similarity.readPqIndex(spark, dir)
    assert(codes.count() == half.count() + late.count(),
      "mid-retrain batch missing from the refit codes generation")
    // the delta rows carry NEW-codebook codes (the frozen-codebook
    // append arithmetic under the refit codebooks, exactly replayable)
    val lateCodes = codes.filter(col("vec_id") >= 250)
    val expect = Similarity.pqEncode(late, cb)
    assert(lateCodes.exceptAll(expect).isEmpty
      && expect.exceptAll(lateCodes).isEmpty,
      "delta rows not re-encoded under the refit codebooks")
    // fence dropped on exit; a later committed append proceeds
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!graft.util.CommittedAppend.fenced(fs, dir))
  }

  test("refitSq8Index under concurrent ingest: mid-retrain batch survives " +
      "with frozen-new-bounds encoding") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/sq8ing_${spark.sparkContext.applicationId}"
    val half = corpus.filter(col("vec_id") < 250)
      .select(col("vec_id"), col("embedding"))
    val late = corpus.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(half, ncells = 8, dir)
    Similarity.writeSq8Index(half, dir)
    Similarity.refitSq8Index(spark, dir, afterFit = () => {
      assert(Similarity.appendToIvfIndexCommitted(spark, dir, late, 93L))
      assert(Similarity.appendToSq8IndexCommitted(spark, dir, late, 94L))
    })
    val (codes, lo, hi) = Similarity.readSq8Index(spark, dir)
    assert(codes.count() == half.count() + late.count())
    val lateCodes = codes.filter(col("vec_id") >= 250)
    val expect = Similarity.sq8Encode(late, lo, hi)
    assert(lateCodes.exceptAll(expect).isEmpty
      && expect.exceptAll(lateCodes).isEmpty,
      "delta rows not re-encoded under the refit bounds")
  }

  test("fence owner token: a stale holder's cleanup cannot drop a fence it " +
      "no longer owns") {
    val root = s"${System.getProperty("java.io.tmpdir")}/fence_${spark.sparkContext.applicationId}"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t1 = graft.util.CommittedAppend.raiseFence(fs, root)
    assert(graft.util.CommittedAppend.fenceToken(fs, root).contains(t1))
    // a recovery drops the fence (crash assumption) and a NEW maintainer
    // raises their own window
    graft.util.CommittedAppend.dropFence(fs, root)
    val t2 = graft.util.CommittedAppend.raiseFence(fs, root)
    // the stale holder's exit cleanup must be a no-op on the new fence
    graft.util.CommittedAppend.dropFenceOwned(fs, root, t1)
    assert(graft.util.CommittedAppend.fenced(fs, root),
      "stale holder un-fenced a live maintenance window")
    assert(graft.util.CommittedAppend.fenceToken(fs, root).contains(t2))
    graft.util.CommittedAppend.dropFenceOwned(fs, root, t2)
    assert(!graft.util.CommittedAppend.fenced(fs, root))
  }

  test("ivfCellStats: empty cells table returns zeros, not an NPE") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/ivfempty_${spark.sparkContext.applicationId}"
    corpus.limit(0).select(col("vec_id"), col("embedding"))
      .withColumn("cell", lit(0))
      .write.mode("overwrite").parquet(s"$dir/cells")
    val (ncells, total, maxCell, imb) = Similarity.ivfCellStats(spark, dir)
    assert(ncells == 0L && total == 0L && maxCell == 0L && imb == 1.0)
  }
}
