package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSH / SimHash scale paths vs brute-force ground truth on the
  * corpus+mutants near-dup substrate (sf0.001 for speed).
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
  private lazy val corpus = Dedup.withMutants(docs).cache()

  test("connected components: transitive chains collapse to the min label") {
    import spark.implicits._
    // chain 1-2-3 (1~3 only transitively), island 10-11, singleton absent
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val comp = Dedup.connectedComponents(pairs).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: empty pair set yields an empty labeling") {
    import spark.implicits._
    // a corpus with no near-dups must produce an empty frame, not NPE on
    // the NULL convergence aggregate
    val none = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Dedup.connectedComponents(none).count() == 0)
  }

  test("star CC: matches label propagation on chains, islands, cliques") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L),         // chain + island
      (20L, 21L), (21L, 22L), (20L, 22L),      // clique
      (30L, 31L), (31L, 30L), (32L, 31L)       // duplicate/reversed edges
    ).toDF("da", "db")
    val prop = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
    assert(star(3L) == 1L && star(22L) == 20L && star(32L) == 30L)
  }

  test("star CC: 1000-node path converges within the logarithmic round cap") {
    import spark.implicits._
    // Worst case for label propagation (diameter 999 → 999 rounds, far
    // past the 50-round cap); star contraction must finish in O(log n).
    // Getting every label right IS the round-count assertion.
    val path = (0L until 999L).map(i => (i, i + 1)).toDF("da", "db")
    val star = Dedup.connectedComponentsStar(path).collect()
    assert(star.length == 1000)
    assert(star.forall(_.getLong(1) == 0L))
  }

  test("star CC: empty pair set yields an empty labeling") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Dedup.connectedComponentsStar(none).count() == 0)
  }

  test("adaptive CC: union-find fast path matches star on both branches") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("da", "db")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    // below threshold → single-task union-find
    val local = Dedup.connectedComponentsAdaptive(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expect)
    // threshold 0 → forced onto the star path, same labels
    val viaStar = Dedup.connectedComponentsAdaptive(pairs, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == expect)
    // empty input stays empty
    assert(Dedup.connectedComponentsAdaptive(
      Seq.empty[(Long, Long)].toDF("da", "db")).count() == 0)
  }

  test("persisted LSH index probe: recall >= 0.95, no false positives, pruned scan") {
    val base = docs
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_spec_lsh_idx"
    Dedup.writeLshIndex(base, idx)
    // "new batch": mutants of the first 30 docs — each should rediscover
    // its original in the index
    val probes = Dedup.withMutants(base.filter(col("doc_id") < 30))
      .filter(col("doc_id") >= 1000000L).cache()
    val result = Dedup.probeLshIndex(spark, idx, probes)
    // exact ground truth: brute-force Jaccard between probe and corpus
    val truth = Dedup.jaccardPairs(base.unionByName(probes), 3, 0.5)
      .filter(col("db") >= 1000000L && col("da") < 1000000L)
      .select(col("db").as("q_id"), col("da").as("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = result.select(col("q_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "substrate must contain probe matches")
    assert((got -- truth).isEmpty, s"false positives: ${(got -- truth).take(5)}")
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall")
    // the band equi-join against the partitioned index must plan as a
    // dynamic partition prune — only probed band directories are read
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))

    // LARGE-probe regime: forcing the pushdown cap to 0 must route the
    // signature filter through the distributed semi-join (no driver isin)
    // and return the identical pair set
    val large = Dedup.probeLshIndex(spark, idx, probes, maxPushdownSigs = 0)
    val gotLarge = large.select(col("q_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotLarge == got, s"semi-join regime diverged: " +
      s"only-small=${(got -- gotLarge).take(3)} only-large=${(gotLarge -- got).take(3)}")
    val largePlan = large.queryExecution.executedPlan.toString
    assert(!largePlan.contains(" IN ("), "large regime must not inline an isin")
  }

  test("LSH index append: grown index == fresh full build, appended half probeable") {
    val base = docs.filter(col("doc_id") < 400)
    val tmp = System.getProperty("java.io.tmpdir")
    val full = s"$tmp/graft_spec_lsh_full"
    val grown = s"$tmp/graft_spec_lsh_grown"
    Dedup.writeLshIndex(base, full)
    Dedup.writeLshIndex(base.filter(col("doc_id") < 200), grown)
    Dedup.appendToLshIndex(grown, base.filter(col("doc_id") >= 200))
    // probes: mutants of docs from BOTH halves — the appended half's
    // matches only exist if the appended band/sets files landed
    val probes = Dedup.withMutants(
        base.filter(col("doc_id") < 10 ||
          (col("doc_id") >= 200 && col("doc_id") < 210)))
      .filter(col("doc_id") >= 1000000L).cache()
    def pairs(path: String) =
      Dedup.probeLshIndex(spark, path, probes)
        .select(col("q_id"), col("doc_id"), round(col("jaccard"), 9))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaFull = pairs(full)
    val viaGrown = pairs(grown)
    assert(viaFull == viaGrown, s"grown != full: " +
      s"only-full=${(viaFull -- viaGrown).take(3)} only-grown=${(viaGrown -- viaFull).take(3)}")
    // appended-half mutants rediscover their originals (load-bearing:
    // an append that silently no-opped would still pass equality if the
    // full index were ALSO missing them — pin the matches exist at all)
    val appendedHits = viaGrown.filter { case (q, d, _) =>
      q >= 1000200L && d == q - 1000000L }
    assert(appendedHits.size == 10,
      s"appended-half originals not all found: ${appendedHits.size}/10")
    // partition pruning survives the grown layout (appended files live
    // under the same band= directories)
    val plan = Dedup.probeLshIndex(spark, grown, probes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
  }

  test("committed LSH append: blind retries and crash windows land a batch exactly once") {
    val base = docs.filter(col("doc_id") < 400)
    val tmp = System.getProperty("java.io.tmpdir")
    val app = spark.sparkContext.applicationId
    val full = s"$tmp/graft_spec_lshc_full_$app"
    val idx = s"$tmp/graft_spec_lshc_grown_$app"
    Dedup.writeLshIndex(base, full)
    Dedup.writeLshIndex(base.filter(col("doc_id") < 200), idx)
    val batch = base.filter(col("doc_id") >= 200)
    // staged width is batch-row-count adaptive (r21): at the default
    // 32768 rows/file this 200-doc batch would stage ONE file, so pin
    // the slice knob low for this test — the multi-file promoted layout
    // and every crash window below then exercise the wide regime
    spark.conf.set("spark.graft.append.rowsPerStagedFile", "64")
    assert(Dedup.appendToLshIndexCommitted(spark, idx, batch, 1L),
      "first append must land the batch")
    val sets1 = spark.read.parquet(s"$idx/sets").count()
    val bands1 = spark.read.parquet(s"$idx/bands").count()

    // blind retry of a fully-committed batch: no-op, nothing duplicated
    assert(!Dedup.appendToLshIndexCommitted(spark, idx, batch, 1L))
    assert(spark.read.parquet(s"$idx/sets").count() == sets1,
      "retry duplicated sets rows")
    assert(spark.read.parquet(s"$idx/bands").count() == bands1,
      "retry duplicated bands rows")

    // worst crash window for the plain append: batch fully promoted but
    // the marker write was lost. Retry re-stages and must SKIP every
    // already-promoted file rather than double the rows.
    val marker = new java.io.File(s"$idx/_committed/batch-1")
    assert(marker.exists())
    assert(marker.delete())
    assert(Dedup.appendToLshIndexCommitted(spark, idx, batch, 1L),
      "post-crash retry must re-commit")
    assert(spark.read.parquet(s"$idx/sets").count() == sets1,
      "marker-lost retry duplicated sets rows")
    assert(spark.read.parquet(s"$idx/bands").count() == bands1,
      "marker-lost retry duplicated bands rows")

    // crash MID-promotion: some promoted files present, some missing, no
    // marker — retry must converge to exactly the batch's rows
    assert(marker.delete())
    val lostBand = new java.io.File(s"$idx/bands/band=3/batch-1-0.parquet")
    assert(lostBand.exists(), "expected deterministic promoted band file name")
    assert(lostBand.delete())
    assert(Dedup.appendToLshIndexCommitted(spark, idx, batch, 1L))
    assert(spark.read.parquet(s"$idx/sets").count() == sets1)
    assert(spark.read.parquet(s"$idx/bands").count() == bands1,
      "mid-promotion retry did not restore exactly the missing rows")

    // SPLIT-DRIFT convergence (r20): a range-partitioned staging may
    // split the same rows across files DIFFERENTLY on retry (Spark
    // seeds range sampling by rdd id), so promotion must converge by
    // wholesale replace, never a skip-existing merge. Simulate a prior
    // attempt's leftover under a drifted split: a stray batch file
    // whose rows the fresh staging also carries — the retry must CLEAR
    // it, or those rows land twice.
    assert(marker.delete())
    val firstSet = new java.io.File(s"$idx/sets").listFiles()
      .filter(f => f.getName.startsWith("batch-1-")
        && f.getName.endsWith(".parquet")).minBy(_.getName)
    java.nio.file.Files.copy(firstSet.toPath,
      new java.io.File(s"$idx/sets/batch-1-97.parquet").toPath)
    assert(Dedup.appendToLshIndexCommitted(spark, idx, batch, 1L))
    assert(spark.read.parquet(s"$idx/sets").count() == sets1,
      "retry merged a stale prior-split file instead of replacing it — " +
        "rows duplicated")

    // the recorded content fingerprint covers BOTH staged schemas —
    // one mixed recursive read would silently fingerprint only the
    // first schema's columns (sets and bands differ), letting a retry
    // that drifted one dataset slip through promotion unnoticed
    val fp = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$idx/_committed/fp-batch-1"))
    assert(fp.contains("bands=") && fp.contains("sets="),
      s"fingerprint does not cover both staged subtrees: $fp")

    // the converged index answers probes identically to a fresh full build
    val probes = Dedup.withMutants(
        base.filter(col("doc_id") < 10 ||
          (col("doc_id") >= 200 && col("doc_id") < 210)))
      .filter(col("doc_id") >= 1000000L)
    def pairs(path: String) =
      Dedup.probeLshIndex(spark, path, probes)
        .select(col("q_id"), col("doc_id"), round(col("jaccard"), 9))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(idx) == pairs(full), "converged grown index != fresh full build")
    // staging cleaned up; no probe-visible litter
    assert(!new java.io.File(s"$idx/_staging").exists() ||
      new java.io.File(s"$idx/_staging").list().isEmpty)

    // --- parallel sets encode (r20, verdict r19 #3): the staged sets
    // side range-partitions on doc_id instead of repartition(1), so a
    // backfill-sized batch writes through every core — pin the
    // multi-file promoted layout (one file per non-empty range slice,
    // width = shuffle partitions here) and that band pruning above and
    // probe parity below survive it ---
    def parquets(dir: java.io.File): Array[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
    val batchSetFiles = parquets(new java.io.File(s"$idx/sets"))
      .count(_.getName.startsWith("batch-1-"))
    assert(batchSetFiles > 1,
      s"committed sets append still single-file ($batchSetFiles) — the " +
        "parallel range-partitioned encode is not in effect")

    // --- compaction: one file per band dir, one sets file, probes
    // identical, torn swap recoverable ---
    val bandDirs = new java.io.File(s"$idx/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("band="))
    assert(bandDirs.exists(parquets(_).length > 1),
      "fixture should have multi-file band dirs before compaction")
    val wanted = pairs(idx)
    Dedup.compactLshIndex(spark, idx)
    bandDirs.foreach(bd => assert(parquets(bd).length == 1,
      s"band dir ${bd.getName} not compacted to one file"))
    assert(parquets(new java.io.File(s"$idx/sets")).length == 1,
      "sets not compacted to one file")
    assert(spark.read.parquet(s"$idx/sets").count() == sets1)
    assert(spark.read.parquet(s"$idx/bands").count() == bands1)
    assert(pairs(idx) == wanted, "compaction changed probe results")
    // torn swap: live bands parked as .old with no live dir — recovery
    // (run implicitly by the next compaction) restores it
    val bandsDir = new java.io.File(s"$idx/bands")
    assert(bandsDir.renameTo(new java.io.File(s"$idx/bands.old")))
    Dedup.compactLshIndex(spark, idx)
    assert(pairs(idx) == wanted, "torn-swap recovery lost probe rows")
    assert(!new java.io.File(s"$idx/bands.old").exists())

    // compaction must REFUSE while a committed append is in flight —
    // folding a promoted-but-unmarked batch's files away would let its
    // retry land the batch twice
    val inflight = new java.io.File(s"$idx/_staging/batch=99")
    assert(inflight.mkdirs())
    intercept[IllegalStateException] { Dedup.compactLshIndex(spark, idx) }
    // a committed retry clears stale staging, unsticking the signal
    assert(new java.io.File(s"$idx/_committed/batch-1").exists())
    assert(inflight.renameTo(new java.io.File(s"$idx/_staging/batch=1")))
    assert(!Dedup.appendToLshIndexCommitted(spark, idx, batch, 1L))
    assert(!new java.io.File(s"$idx/_staging/batch=1").exists(),
      "committed retry did not clear its stale staging")
    Dedup.compactLshIndex(spark, idx) // unstuck
    assert(pairs(idx) == wanted)
    spark.conf.unset("spark.graft.append.rowsPerStagedFile")

    // adaptive width, micro-batch regime (default slice size): a tiny
    // batch stages exactly ONE sets file instead of one per shuffle
    // partition — the file-hygiene half of the r21 adaptive policy
    val micro = base.filter(col("doc_id") < 5)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
    assert(Dedup.appendToLshIndexCommitted(spark, idx, micro, 2L))
    assert(parquets(new java.io.File(s"$idx/sets"))
      .count(_.getName.startsWith("batch-2-")) == 1,
      "micro-batch staged more than one sets file under the adaptive width")
  }

  test("edit-distance near-dups: banded blocking loses no qualifying pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dot"),   // dist 1 from 1
      (3L, "the quick brown fox leaps over the lazy dog"),   // dist 3 from 1
      (4L, "completely unrelated text with other words here"),
      (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),   // case-folds to 1
      (6L, "tiny"), (7L, "tinier")                           // short-string path
    ).toDF("doc_id", "text")
    val got = Dedup.editDistanceNearDups(docs, maxDist = 4, prefixLen = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 3L, (1L, 5L) -> 0L,
      (2L, 3L) -> 4L, (2L, 5L) -> 1L, (3L, 5L) -> 3L, (6L, 7L) -> 3L))
  }

  test("native simhash60 == explode-formulated reference, bit for bit") {
    val native = Dedup.simhashSigs(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = Dedup.simhashSigsReference(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == ref)
    assert(native.nonEmpty)
  }

  test("minhash-LSH recall >= 0.95 vs brute-force jaccard, no false positives") {
    val truth = Dedup.jaccardPairs(corpus, 3, 0.5)
      .select(col("da"), col("db")).cache()
    val lsh = Dedup.lshNearDups(corpus, 3, 0.5)
      .select(col("da"), col("db")).cache()
    val nTruth = truth.count()
    assert(nTruth >= 40, s"substrate must contain near-dups, got $nTruth")
    // exact-verify step ⇒ every LSH pair is a true pair
    assert(lsh.join(truth, Seq("da", "db"), "left_anti").count() == 0)
    val found = truth.join(lsh, Seq("da", "db"), "left_semi").count()
    assert(found.toDouble / nTruth >= 0.95,
      s"recall ${found.toDouble / nTruth} below 0.95 ($found/$nTruth)")
  }

  test("minhash signatures are partitioning-invariant") {
    val sig1 = Dedup.minhashSignatures(corpus.repartition(1), 3, 8)
    val sig8 = Dedup.minhashSignatures(corpus.repartition(8), 3, 8)
    assert(sig1.exceptAll(sig8).count() == 0)
  }

  test("simhash: every original↔mutant pair within Hamming 3 is found; sane volume") {
    val pairs = Dedup.simhashNearDups(corpus).cache()
    // banding is exact for Hamming<=3, so pairs == ground truth by
    // construction; sanity: mutant pairs (db = da + 1e6) dominate
    val mutantPairs = pairs.filter(col("db") === col("da") + 1000000L).count()
    val total = pairs.count()
    assert(mutantPairs >= 30, s"expected many original-mutant pairs, got $mutantPairs")
    assert(total <= mutantPairs * 3, s"too many non-mutant pairs: $total vs $mutantPairs")
  }

  test("exact survivors keep lowest doc_id per key") {
    val surv = Dedup.exactSurvivors(docs, substring(col("text"), 1, 30), col("doc_id"))
    val dupCheck = surv.groupBy(md5(substring(col("text"), 1, 30)))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    assert(dupCheck.count() == 0)
  }

  test("native ngram_hashes == xxhash64 over the HOF shingle form") {
    // the fused-loop expression must produce the exact hash SET the
    // interpreted shingle pipeline produced, per document — minhash
    // signatures and band keys are then bit-identical
    val native = docs.select(col("doc_id"),
      explode(Dedup.shingleHashes(col("text"), 3)).as("h"))
    val hof = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    assert(native.exceptAll(hof).count() == 0 && hof.exceptAll(native).count() == 0)
    // short/empty docs: no shingles, no rows, no nulls
    import spark.implicits._
    val edge = Seq((1L, "one two"), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val out = edge.select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).length).toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("native ngram_pos_hashes: positional parity with the string shingle form") {
    // element k must equal xxhash64 of the canonical shingle STRING at
    // 1-based token position k+1 — the byte-range fast path (shingle
    // bytes ARE the text's own range under single-space splitting) may
    // not drift from the string hash, including around multi-space
    // (empty-token) and multibyte-UTF-8 inputs
    val posh = docs.select(col("doc_id"),
      posexplode(call_function("ngram_pos_hashes", col("text"), lit(3)))
        .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("i"), col("h"))
    val strh = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("w")) - 2)).as("i"), col("w"))
      .select(col("doc_id"), col("i"),
        xxhash64(array_join(slice(col("w"), col("i"), lit(3)), " ")).as("h"))
    assert(posh.exceptAll(strh).count() == 0 && strh.exceptAll(posh).count() == 0)
    // edges: empty tokens from double spaces, multibyte chars, short docs
    import spark.implicits._
    val edge = Seq((1L, "a  b c"), (2L, "héllo wörld déjà vu"), (3L, "x y"),
      (4L, "")).toDF("doc_id", "text")
    val e1 = edge.select(col("doc_id"),
      posexplode(call_function("ngram_pos_hashes", col("text"), lit(3)))
        .as(Seq("p0", "h")))
    val e2 = edge.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("w")) - 3)).as("p0"), col("w"))
      .select(col("doc_id"), col("p0"),
        xxhash64(array_join(slice(col("w"), col("p0") + 1, lit(3)), " ")).as("h"))
    assert(e1.exceptAll(e2).count() == 0 && e2.exceptAll(e1).count() == 0)
    assert(e1.count() == 2 + 2 + 0 + 0) // "a  b c" has 4 tokens => 2 shingles
  }

  test("containmentPairs: catches the prefix-quote pairs Jaccard misses; hotCap regime keeps them") {
    // plant near-supersets: each doc's 40%-prefix as a quote
    val base = docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
    val quotes = base
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 10)
      .select((col("doc_id") + 2000000).as("doc_id"),
        array_join(expr("slice(w, 1, size(w)*2 div 5 + 1)"), " ").as("text"))
    val corpus = base.unionByName(quotes)
    val planted = quotes.select((col("doc_id") - 2000000).as("da"),
      col("doc_id").as("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.nonEmpty)
    // containment @0.9 catches every planted pair, at exactly 1.0 (a
    // prefix's shingles are all source shingles)
    val got = Dedup.containmentPairs(corpus, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(planted.forall(p => got.get(p).contains(1.0)),
      s"missing/inexact planted pairs: ${planted.filterNot(p => got.get(p).contains(1.0)).take(5)}")
    // resemblance @0.5 misses every one of them (j ~ 0.4 by construction)
    val jac = Dedup.jaccardPairs(corpus, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.forall(!jac.contains(_)),
      "a planted quote pair cleared the 0.5 Jaccard bar — fixture no longer asymmetric")
    // capped-universe (scale) regime: ubiquitous-shingle removal must
    // not lose the planted pairs (their shingles are doc-specific)
    val capped = Dedup.containmentPairs(corpus, 3, 0.9, hotCap = Some(50))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.forall(capped.contains),
      "hotCap regime lost a planted near-superset pair")
    // the MEASURED auto-cap rule (r17 probe: a constant cap silently
    // breaks at 10x scale — NOTES_r17 §4): ~1% of nDocs, floored at 64.
    // On this fixture the rule-capped run == the exact pair set.
    assert(Dedup.containmentAutoCap(5000) == 64
      && Dedup.containmentAutoCap(50000) == 500
      && Dedup.containmentAutoCap(10000000) == 100000)
    // clamped, never wrapped negative at extreme corpus sizes
    assert(Dedup.containmentAutoCap(Long.MaxValue) == Int.MaxValue)
    assert(Dedup.containmentAutoCap(3L * Int.MaxValue * 100L) == Int.MaxValue)
    val auto = Dedup.containmentPairs(corpus, 3, 0.9,
        hotCap = Some(Dedup.containmentAutoCap(corpus.count())))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = got.keySet
    assert(auto == exact, "auto-capped pair set diverged from exact")
  }

  test("containmentPairs saturation guard: over-budget prefix mass refuses " +
      "loudly in the capped regime; exact regime and default budget unaffected") {
    val corpus = docs.filter(col("doc_id") < 500).select(col("doc_id"), col("text"))
    // a 1-per-doc budget trips on any real prefix mass — the mechanism
    // under test is the loud refusal with the saturation diagnosis (the
    // realistic trigger is the sf10 closed-vocabulary fixture, where
    // trigram mass measured 115x for 10x docs — NOTES_r19 §4)
    val e = intercept[IllegalStateException](
      Dedup.containmentPairs(corpus, 3, 0.9, hotCap = Some(250),
        maxCandidatesPerDoc = 1L).count())
    assert(e.getMessage.contains("SATURATED")
      && e.getMessage.contains("maxCandidatesPerDoc"), e.getMessage)
    // default budget passes this organic-shaped fixture; exact regime
    // (hotCap = None — the oracle twin) never measures, even at budget 1
    assert(Dedup.containmentPairs(corpus, 3, 0.9,
      hotCap = Some(250)).count() ==
      Dedup.containmentPairs(corpus, 3, 0.9, hotCap = None,
        maxCandidatesPerDoc = 1L).count())
  }

  test("electSurvivors: highest quality wins, not lowest id; ties break to lowest id") {
    import spark.implicits._
    val d2 = Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("da", "db")
    val quality = Seq( // component {1,2,3}: best is id 3 (NOT the min id)
      1L -> 0.2, 2L -> 0.5, 3L -> 0.9,
      7L -> 0.4, 8L -> 0.4, // tie -> lowest id (7) survives
      9L -> 0.1).toDF("doc_key", "quality")
    val out = Dedup.electSurvivors(d2, col("doc_id"), pairs, quality)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(3L)._4 && !out(1L)._4 && !out(2L)._4,
      "highest-quality member must win the component")
    assert(out(7L)._4 && !out(8L)._4, "quality tie must break to the lowest id")
    assert(out(9L)._4 && out(9L)._2 == 9L, "singleton survives itself")
    // exactly one survivor per component
    val perComp = out.values.groupBy(_._2).view.mapValues(_.count(_._4))
    assert(perComp.values.forall(_ == 1))
  }

  test("spanCoverage: exact copy => 1.0, partial copy in between, unique => 0") {
    import spark.implicits._
    val base = "a b c d e f g h i j k l m n o p" // 16 words, 9 distinct 8-grams
    val docs = Seq(
      (1L, base),
      (2L, base), // exact copy of 1
      (3L, s"$base q r s t u v w x"), // contains all of 1's spans + own tail
      (4L, "z y x w v u t s r q p o n m l k")) // doc 1's tail words, reversed order
      .toDF("doc_id", "text")
    val cov = Dedup.spanCoverage(docs, col("doc_id"), col("text"), n = 8)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(cov(1L)._4 == 1.0, "exact duplicate must cover fully")
    assert(cov(2L)._4 == 1.0)
    assert(cov(3L)._3 == 9L && cov(3L)._4 > 0 && cov(3L)._4 < 1.0,
      "partial copy shares exactly the copied spans")
    // doc 4 reversed: spans k..p appear only reversed => nothing shared
    assert(cov(4L)._3 == 0L && cov(4L)._4 == 0.0)
    // partition-invariant
    val rep = Dedup.spanCoverage(docs.repartition(4), col("doc_id"), col("text"), 8)
    assert(rep.exceptAll(
      Dedup.spanCoverage(docs, col("doc_id"), col("text"), 8)).isEmpty)
  }

  test("removeSharedSpans: cross-doc spans cut, own repeats kept") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ") // one shared 8-gram
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"x $span y"), // carries the same span
      (3L, "u v w unique only tokens here"), // untouched
      (4L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8")) // own repeat
      .toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(docs, col("doc_id"), col("text"), 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // docs 1/2: exactly the 8 span tokens cut, the rest survives in order
    assert(out(1L)._3 == 8 && out(1L)._4 == md5s("alpha beta gamma delta"))
    assert(out(2L)._3 == 8 && out(2L)._4 == md5s("x y"))
    // doc 3 untouched
    assert(out(3L)._3 == 0 && out(3L)._4 == md5s("u v w unique only tokens here"))
    // doc 4's WITHIN-document repetition is kept by design
    assert(out(4L)._3 == 0, "own refrain must not be cut")
  }

  test("softDedupWeights: each cluster contributes exactly 1.0 of mass") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("da", "db") // {1,2,3} {4} {5}
    val out = Dedup.softDedupWeights(docs, col("doc_id"), pairs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._4).toSeq ==
      Seq(0.333333, 0.333333, 0.333333, 1.0, 1.0))
    assert(out.map(_._3).toSeq == Seq(3L, 3L, 3L, 1L, 1L))
    // per-cluster mass: sum of weights rounds to 1 per component
    val byComp = out.groupBy(_._2).map { case (_, rs) => rs.map(_._4).sum }
    assert(byComp.forall(m => math.abs(m - 1.0) < 1e-3))
  }
}
