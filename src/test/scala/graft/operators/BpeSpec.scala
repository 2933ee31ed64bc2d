package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("merge sequence on the classic hand-computed corpus") {
    // word counts: low×5, lower×2, newest×6, widest×3 — the textbook
    // BPE example. Pair counts round 1: (e,s) 6+3=9, (s,t) 9,
    // (t,</w>) 9, (w,e) 6(newest)+2(lower)... hand-walk:
    //   low:5      l-o 5, o-w 5, w-</w> 5
    //   lower:2    l-o 2, o-w 2, w-e 2, e-r 2, r-</w> 2
    //   newest:6   n-e 6, e-w 6, w-e 6, e-s 6, s-t 6, t-</w> 6
    //   widest:3   w-i 3, i-d 3, d-e 3, e-s 3, s-t 3, t-</w> 3
    // (e,s)=9 (s,t)=9 (t,</w>)=9 tie → lexicographic: (e,s) wins? '<' <
    // 'e' in ASCII, so (t,</w>) has b='</w>' … tie-break is (a asc,
    // b asc): candidates a='e','s','t' → 'e' smallest → (e,s).
    val docs = corpus(
      1L -> (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      2L -> (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val merges = Bpe.train(docs, numMerges = 4, minCount = 1L)
    assert(merges(0) == (("e", "s")))
    // after merging es: (es,t) = 9 and (t,</w>) = 9 → 'es' < 't' → (es,t)
    assert(merges(1) == (("es", "t")))
    // then (est,</w>) = 9 unchallenged (l-o and o-w are 7)
    assert(merges(2) == (("est", "</w>")))
    // remaining max: l-o = o-w = 7 → (l,o)
    assert(merges(3) == (("l", "o")))
  }

  test("firstMergePlan agrees with train's round-1 decision") {
    val docs = corpus(
      1L -> "banana bandana banana",
      2L -> "cabana banana bandana")
    val plan = Bpe.firstMergePlan(docs, minCount = 2L).head()
    val merges = Bpe.train(docs, numMerges = 1, minCount = 2L)
    assert((plan.getString(0), plan.getString(1)) == merges(0))
  }

  test("encodeWord reconstructs the word and respects merge ranks") {
    val ranks = new java.util.HashMap[(String, String), Int]()
    Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"))
      .zipWithIndex.foreach { case (p, r) => ranks.put(p, r) }
    assert(Bpe.encodeWord("newest", ranks).toSeq ==
      Seq("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("lo", "w", "est</w>"))
    // unknown word falls back to characters + </w>
    assert(Bpe.encodeWord("zzz", ranks).toSeq == Seq("z", "z", "z", "</w>"))
    // reconstruction: concatenating tokens always recovers word + </w>
    for (w <- Seq("newest", "lowest", "low", "zzz", "a"))
      assert(Bpe.encodeWord(w, ranks).mkString == w + "</w>")
  }

  test("encodeDocs: counts drop as merges apply; partition-invariant") {
    val docs = corpus(
      1L -> "low low low lower lower newest newest newest widest widest",
      2L -> "the newest of the new lows")
    val merges = Bpe.train(docs, numMerges = 10, minCount = 1L)
    val enc = Bpe.encodeDocs(docs, merges).orderBy("doc_id").collect()
    val raw = Bpe.encodeDocs(docs, Array.empty).orderBy("doc_id").collect()
    for ((e, r) <- enc.zip(raw)) {
      assert(e.getLong(1) < r.getLong(1),
        s"doc ${e.getLong(0)}: merges did not reduce token count")
      assert(e.getLong(2) <= e.getLong(1))
    }
    // repartitioning must not change any result
    val enc4 = Bpe.encodeDocs(docs.repartition(4), merges)
    assert(enc4.exceptAll(Bpe.encodeDocs(docs, merges)).isEmpty)
  }

  test("vocabCap: inactive cap is a no-op; active cap == training on the top-N words") {
    val docs = corpus(
      1L -> (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      2L -> (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val uncapped = Bpe.train(docs, numMerges = 4, minCount = 1L)
    // cap ≥ vocab size (4 distinct words) → identical merge table
    assert(Bpe.train(docs, 4, 1L, vocabCap = 4).toSeq == uncapped.toSeq)
    assert(Bpe.train(docs, 4, 1L, vocabCap = 1000).toSeq == uncapped.toSeq)
    // cap = 2 keeps the top-2 by (cnt desc, w): newest(6), low(5) —
    // must equal training on a corpus containing exactly those words
    // at the same counts
    val top2 = corpus(1L -> (Seq.fill(6)("newest") ++ Seq.fill(5)("low")).mkString(" "))
    assert(Bpe.train(docs, 4, 1L, vocabCap = 2).toSeq ==
      Bpe.train(top2, 4, 1L).toSeq)
    // deterministic tie-break at the cap boundary: equal-count words
    // are kept word-ascending
    val tied = corpus(1L -> "bb aa cc bb aa cc") // all cnt=2
    assert(Bpe.train(tied, 2, 1L, vocabCap = 2).toSeq ==
      Bpe.train(corpus(1L -> "aa bb aa bb"), 2, 1L).toSeq)
  }

  // Pinned constants = tools/bpe_replay.py <sfdir> 30 — an INDEPENDENT
  // reimplementation of train+encode from the algorithm definition. Any
  // silent drift in the merge table, tie-breaks, tokenization, or apply
  // loop flips these digests. Both the dev scale AND the driver's gated
  // scale (sf0.01) are pinned (r20, verdict r19 #4): the text_bpe_tokens
  // gate is rows-only in the DuckDB column by necessity, so THIS is its
  // machine-checked value oracle at the scale the driver actually gates.
  private val tokenDigests = Seq(
    "/root/testdata/sf0.001" -> "02a8ced3a4046ec9f5205f512bc839ec",
    "/root/testdata/sf0.01" -> "486d70d6de57e5ccb6c6b4a0ba642642")
  private val packDigests = Seq(
    "/root/testdata/sf0.001" -> "9d37d4546679bc60263fbe2e7e28884e",
    "/root/testdata/sf0.01" -> "fcb8c5a37811d615816e73429a5a251d")

  private def md5(lines: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("token-stream digests match the independent Python replay at the " +
      "dev AND gated scales (pinned)") {
    for ((sfdir, want) <- tokenDigests) {
      val docs = spark.read.parquet(s"$sfdir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val merges = Bpe.train(docs, numMerges = 30)
      assert(merges.length == 30 && merges(0) == (("e", "r")))
      val ranks = new java.util.HashMap[(String, String), Int]()
      merges.zipWithIndex.foreach { case (p, r) => ranks.put(p, r) }
      val lines = docs.collect().map { r =>
        val toks = r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty)
          .flatMap(Bpe.encodeWord(_, ranks))
        r.getLong(0) -> s"${r.getLong(0)}\t${toks.mkString(" ")}"
      }.sortBy(_._1).map(_._2).toSeq
      assert(md5(lines) == want,
        s"$sfdir: token-stream digest drifted from the pinned replay")
    }
  }

  test("tokenizer-exact packing digests match the independent Python " +
      "replay at the dev AND gated scales (pinned)") {
    // Pinned constants = tools/bpe_replay.py's pack256_digest — the
    // sample_pack_bpe gate's machine-checked value oracle (r20): the
    // replay recomputes BPE token counts from the algorithm definition
    // and replays the global concat-and-cut sequentially, so a drifted
    // merge table, a wrong token count, OR a prefix-sum/span boundary
    // bug in packSequencesGlobalTok all flip these digests — at the
    // driver's gated scale (sf0.01), not just the dev scale.
    for ((sfdir, want) <- packDigests) {
      val docs = spark.read.parquet(s"$sfdir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val merges = Bpe.train(docs, numMerges = 30)
      val counts = Bpe.encodeDocs(docs, merges)
        .select(col("doc_id"), col("n_tokens"))
      val packed = graft.operators.Sampling.packSequencesGlobalTok(
          counts, col("doc_id"), col("n_tokens"), seqLen = 256)
        .orderBy("seq_id", "doc_key")
        .collect()
        .map(r => s"${r.getLong(0)}\t${r.getLong(1)}\t${r.getLong(2)}" +
          s"\t${r.getLong(3)}\t${r.getLong(4)}").toSeq
      assert(md5(packed) == want,
        s"$sfdir: packed-span digest drifted from the pinned replay")
    }
  }

  test("training is deterministic and bounded by available pairs") {
    val docs = corpus(1L -> "ab ab ab")
    // 'ab</w>' has 2 pairs; request more merges than exist
    val merges = Bpe.train(docs, numMerges = 10, minCount = 1L)
    assert(merges.length <= 3)
    assert(merges.toSeq == Bpe.train(docs, 10, 1L).toSeq)
  }
}
