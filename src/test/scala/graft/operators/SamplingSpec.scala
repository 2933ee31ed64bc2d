package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  test("bernoulli rate lands near p and is retry-deterministic") {
    val total = docs.count()
    val kept = Sampling.bernoulli(docs, col("doc_id"), 0.25).count()
    val rate = kept.toDouble / total
    // md5 uniformity over 500 keys: generous ±0.08 band around 0.25
    assert(rate > 0.17 && rate < 0.33, s"rate $rate")
    val again = Sampling.bernoulli(docs, col("doc_id"), 0.25)
      .agg(sum(col("doc_id"))).as[Long].head()
    val first = Sampling.bernoulli(docs, col("doc_id"), 0.25)
      .agg(sum(col("doc_id"))).as[Long].head()
    assert(again == first)
  }

  test("bernoulli samples are nested: p=0.1 subset of p=0.25") {
    val small = Sampling.bernoulli(docs, col("doc_id"), 0.1)
      .select("doc_id")
    val big = Sampling.bernoulli(docs, col("doc_id"), 0.25)
      .select("doc_id")
    assert(small.exceptAll(big).count() == 0)
  }

  test("stratified honors per-stratum rates; unlisted strata kept whole") {
    val rates = Map("en" -> 0.125, "de" -> 0.5)
    val out = Sampling.stratified(docs, col("doc_id"), col("lang"), rates)
    val perLang = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(perLang("zh") == totals("zh")) // unlisted ⇒ rate 1.0
    assert(perLang("en") < totals("en") / 4) // 0.125 ± noise
    assert(perLang("de") < totals("de"))
  }

  test("packSequences: every sequence fits the budget (overflow-free corpus)") {
    val budget = 512
    val packed = Sampling.packSequences(docs, col("doc_id"), col("source"),
      col("text"), budget)
    // invariant: the tokens BEFORE each doc within its sequence stay
    // under budget, i.e. sum(tok) per (source, seq) ≤ budget + last tok
    val bad = packed.groupBy("source", "seq_id")
      .agg(sum(col("tok")).as("seq_toks"), max(col("tok")).as("max_tok"))
      .filter(col("seq_toks") - col("max_tok") >= budget)
    assert(bad.count() == 0)
    // sequences are contiguous from 0 within each source
    val holes = packed.groupBy("source")
      .agg(countDistinct(col("seq_id")).as("n"), max(col("seq_id")).as("mx"))
      .filter(col("mx") =!= col("n") - 1)
    assert(holes.count() == 0)
  }

  test("packSequencesGlobal: full sequences carry exactly seqLen tokens; range-count invariant") {
    val L = 256
    val packed = Sampling.packSequencesGlobal(docs, col("doc_id"),
      col("text"), L).cache()
    // every sequence except the last carries EXACTLY seqLen tokens —
    // concat-and-cut drops and pads nothing
    val maxSeq = packed.agg(max("seq_id")).head().getLong(0)
    val short = packed.groupBy("seq_id")
      .agg(sum(col("tokens_in_seq")).as("t"))
      .filter(col("seq_id") < maxSeq && col("t") =!= L)
    assert(short.isEmpty, "a non-final sequence does not hold seqLen tokens")
    // total conservation: Σ tokens_in_seq == Σ tokenEstimate
    val total = packed.agg(sum("tokens_in_seq")).head().getLong(0)
    val want = docs.select(Sampling.tokenEstimate(col("text")).as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(total == want, s"token mass not conserved: $total != $want")
    // spanning really happens (the boundary math is exercised)
    assert(packed.groupBy("doc_key").count().filter(col("count") > 1)
      .count() > 0, "no document spans a boundary — vacuous fixture")
    // the distributed scan is range-count invariant: 1 range (one
    // sequential scan) == 7 ranges (the two-phase path)
    val one = Sampling.packSequencesGlobal(docs, col("doc_id"),
      col("text"), L, nRanges = 1)
    val seven = Sampling.packSequencesGlobal(docs, col("doc_id"),
      col("text"), L, nRanges = 7)
    assert(one.exceptAll(seven).isEmpty && seven.exceptAll(one).isEmpty,
      "two-phase prefix sum diverges across range counts")
    packed.unpersist()
    graft.util.Scratch.release(spark)
  }

  test("decontaminate finds a planted 8-gram overlap and nothing else") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val train = Seq(
      // shares the 8-gram starting at 'alpha' and at 'beta' (2 hits)
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // same words, one swapped ⇒ no 8-gram in common
      (11L, "alpha beta gamma delta epsilon zeta eta iota theta"),
      (12L, "totally unrelated words that never overlap anything at all"))
      .toDF("doc_id", "text")
    val out = Sampling.decontaminate(train, bench, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 2L))
  }

  test("dsirWeights: target-like docs outscore others; weights are length-comparable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.dsirWeights(docs, docs.filter(col("lang") === "en"),
        col("doc_id"), col("text"))
      .join(docs.select(col("doc_id").as("doc_key"), col("lang")), "doc_key")
    val mean = out.groupBy("lang").agg(avg("dsir_score").as("m"))
      .as[(String, Double)].collect().toMap
    // the en target distribution must prefer en docs over every other
    // language's — the operator's entire reason to exist
    for ((l, m) <- mean if l != "en")
      assert(mean("en") > m, s"en mean ${mean("en")} not above $l mean $m")
    // score is a per-feature MEAN: long docs must not dominate by length
    val lenCorr = out.select(corr(col("n_feats").cast("double"),
      col("dsir_score")).as("c")).as[Double].head()
    assert(math.abs(lenCorr) < 0.9, s"score degenerates to length (corr=$lenCorr)")
  }

  test("scrubContaminatedSpans: exact span boundaries, clean docs kept whole, regimes identical") {
    // benchmark doc = tokens a1..a8 b1..b8; train doc 1 quotes a1..a8 in
    // the middle, doc 2 shares only 7 consecutive tokens (below n), doc 3
    // is clean. Expected: doc 1 loses exactly its 8 quoted tokens, docs
    // 2 and 3 keep every token.
    val bench = Seq((100L, "a1 a2 a3 a4 a5 a6 a7 a8 b1 b2 b3 b4 b5 b6 b7 b8"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "x1 x2 a1 a2 a3 a4 a5 a6 a7 a8 y1 y2"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 z1 z2 z3 z4 z5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))
      .toDF("doc_id", "text")
    def run(cap: Int) =
      Sampling.scrubContaminatedSpans(train, bench, col("doc_id"),
          col("text"), benchBroadcastCap = cap)
        .as[(Long, Long, Long, String)].collect().toSet
    val out = run(1 << 22)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Set(
      (1L, 12L, 8L, m("x1 x2 y1 y2")),
      (2L, 12L, 0L, m("a1 a2 a3 a4 a5 a6 a7 z1 z2 z3 z4 z5")),
      (3L, 12L, 0L, m("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))))
    assert(run(0) == out, "shuffle regime diverges from broadcast regime")
  }

  test("decontaminateSemantic: forced-IVF regime vs broadcast regime on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Double)] =
      df.as[(Long, Double)].collect().toSet
    // (1) verbatim-leak contamination (benchmark ⊆ train): both regimes
    //     EXACTLY identical — every contaminated vector's argmax is its
    //     own copy, which cell-assigns identically (the gate's shape)
    val bench = e.filter(col("vec_id") % 25 === 0)
    val bcSelf = rows(Sampling.decontaminateSemantic(e, bench, 0.9))
    val ivfSelf = rows(Sampling.decontaminateSemantic(e, bench, 0.9,
      benchBroadcastCap = 0)) // forces the no-broadcast scale regime
    assert(bcSelf.nonEmpty && ivfSelf == bcSelf,
      "regimes diverge on the verbatim-leak fixture")
    // (2) weak-match regime (threshold 0.3, disjoint benchmark): IVF is
    //     approximate by construction — every reported row must carry
    //     the EXACT max (no understated survivors) and recall ≥ 0.9
    val train = e.filter(col("vec_id") % 25 =!= 0)
    val bc = rows(Sampling.decontaminateSemantic(train, bench, 0.3))
    val ivf = rows(Sampling.decontaminateSemantic(train, bench, 0.3,
      benchBroadcastCap = 0))
    assert((ivf -- bc).isEmpty, "IVF regime reported a row the exact path lacks")
    assert(ivf.size >= math.ceil(bc.size * 0.9).toInt,
      s"IVF recall ${ivf.size}/${bc.size} below 0.9")
    // (3) the regime switch actually switches: a cap above |bench|
    //     broadcasts and matches the default-cap result
    assert(rows(Sampling.decontaminateSemantic(train, bench, 0.3,
      benchBroadcastCap = 1 << 20)) == bc)
  }

  test("epochOrder: reproducible per-epoch permutations, all distinct keys kept") {
    val keys = (1L to 200L).toDF("doc_id")
    def order(epoch: Int): Seq[Long] =
      Sampling.epochOrder(keys, col("doc_id"), epoch)
        .select("doc_id").as[Long].collect().toSeq
    val e1 = order(1)
    assert(e1.sorted == (1L to 200L), "every key appears exactly once")
    assert(e1 == order(1), "same epoch must reproduce the identical order")
    val e2 = order(2)
    assert(e1 != e2, "different epochs must permute differently")
    assert(e1 != (1L to 200L).toSeq, "order must not be the natural key order")
    // partition-invariant: the order is a SORT, not a partition artifact
    assert(Sampling.epochOrder(keys.repartition(7), col("doc_id"), 1)
      .select("doc_id").as[Long].collect().toSeq == e1)
  }

  test("leakageSafeSplit: no val document has a near-dup in train") {
    // planted near-dup graph: (1,2), (2,3) one chain component; (10,11)
    // another; 20 a singleton
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val split = Sampling.leakageSafeSplit(docs, col("doc_id"), pairs, 0.5)
      .as[(Long, Long, String)].collect().toSeq
    assert(split.size == 6)
    val byDoc = split.map(r => r._1 -> r._3).toMap
    // whole components land on one side
    assert(Set(byDoc(1L), byDoc(2L), byDoc(3L)).size == 1)
    assert(Set(byDoc(10L), byDoc(11L)).size == 1)
    // therefore no pair straddles the split
    for ((a, b) <- Seq((1L, 2L), (2L, 3L), (10L, 11L)))
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) straddles the split")
    // singleton keeps its own id as component
    assert(split.find(_._1 == 20L).get._2 == 20L)
    // deterministic
    assert(Sampling.leakageSafeSplit(docs, col("doc_id"), pairs, 0.5)
      .as[(Long, Long, String)].collect().toSeq.sorted == split.sorted)
    // real corpus: every near-dup pair is split-homogeneous
    val corpus = Dedup.withMutants(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")))
    val p2 = Dedup.jaccardPairs(corpus, 3, 0.5).cache()
    val s2 = Sampling.leakageSafeSplit(corpus, col("doc_id"), p2, 0.25)
    val straddling = p2
      .join(s2.select(col("doc_key").as("da"), col("split").as("sa")), "da")
      .join(s2.select(col("doc_key").as("db"), col("split").as("sb")), "db")
      .filter(col("sa") =!= col("sb"))
    assert(straddling.count() == 0, "a near-dup pair straddles train/val")
    // both sides are populated at valFrac 0.25 on ~1000 components
    val sides = s2.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(sides.getOrElse("val", 0L) > 0 && sides.getOrElse("train", 0L) > 0)
  }

  test("mixtureApply: copies are floor(w) or ceil(w); applied mass nears targets") {
    val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.15,
      "es" -> 0.15, "zh" -> 0.1)
    val applied = Sampling.mixtureApply(docs, col("doc_id"), col("lang"),
      col("text"), targets).cache()
    val plan = Sampling.mixturePlan(docs, col("lang"), col("text"), targets)
      .select(col("stratum"), col("mix_weight")).as[(String, Double)]
      .collect().toMap
    val bad = applied.as[(Long, String, Long)].collect().filter {
      case (_, lang, n) =>
        val w = plan(lang)
        n != math.floor(w).toLong && n != math.ceil(w).toLong
    }
    assert(bad.isEmpty, s"copies outside {floor,ceil}: ${bad.take(3).toSeq}")
    // applied token mass per stratum ≈ target share (fractional Bernoulli
    // expectation; generous ±35% relative band at this corpus size)
    val toks = docs.select(col("doc_id"),
      Sampling.tokenEstimate(col("text")).as("tok"))
    val mass = applied.join(toks, applied("doc_key") === toks("doc_id"))
      .groupBy("stratum").agg(sum(col("n_copies") * col("tok")).as("m"))
      .as[(String, Long)].collect().toMap
    val total = mass.values.sum.toDouble
    targets.foreach { case (lang, share) =>
      val got = mass(lang) / total
      assert(math.abs(got - share) / share < 0.35, s"$lang: $got vs $share")
    }
  }

  test("mixturePlan weights reshape token mass to the target shares") {
    val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.15,
      "es" -> 0.15, "zh" -> 0.1)
    val plan = Sampling.mixturePlan(docs, col("lang"), col("text"), targets)
      .as[(String, Long, Double, Double)].collect()
    val shareSum = plan.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // applying the weight makes every stratum's token mass proportional
    // to its target: weight · toks / total == target (up to rounding)
    val total = plan.map(_._2).sum.toDouble
    plan.foreach { case (lang, toks, _, w) =>
      assert(math.abs(w * toks / total - targets(lang)) < 1e-4, lang)
    }
  }

  test("exactK / stratifiedExactK: exact sizes, heap plans, determinism") {
    val k = Sampling.exactK(docs, col("doc_id"), 50)
    assert(k.count() == 50)
    val kPlan = k.queryExecution.executedPlan.toString
    assert(kPlan.contains("TakeOrderedAndProject"), kPlan.take(1000))
    // per-stratum: min(k, |stratum|) rows each, via the NATIVE TopK plan
    val sk = Sampling.stratifiedExactK(docs, col("doc_id"), col("lang"), 7)
    val sizes = sk.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val strata = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, n) <- strata)
      assert(sizes.getOrElse(lang, 0L) == math.min(7L, n), lang)
    val skPlan = sk.queryExecution.executedPlan.toString
    assert(skPlan.contains("TopKPerKeyFinal"),
      "RewriteWindowTopK must retarget the idiom: " + skPlan.take(1500))
    // reproducible: same rows regardless of partitioning
    val again = Sampling.stratifiedExactK(docs.repartition(9),
      col("doc_id"), col("lang"), 7)
    assert(sk.exceptAll(again).isEmpty && again.exceptAll(sk).isEmpty)
  }

  test("lengthBuckets: power-of-two bounds imply pad efficiency > 0.5") {
    val out = Sampling.lengthBuckets(docs, col("text"))
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    for ((b, n, sum, mx, eff) <- out) {
      // every doc in bucket b has tok in [2^b, 2^(b+1))
      assert(mx < (1L << (b + 1)), s"bucket $b max $mx")
      assert(sum >= n * (1L << b), s"bucket $b sum $sum under min bound")
      // min/max > 1/2 within a power-of-two bucket ⇒ efficiency > 0.5
      assert(eff > 0.5 && eff <= 1.0, s"bucket $b efficiency $eff")
    }
  }

  test("scoreTierSample: tiers are quartiles; sketch mode agrees with exact") {
    import graft.operators.TextOps
    val q = TextOps.qualityScore(docs)
    val rates = Seq(0.1, 0.3, 0.6, 0.9)
    val exact = Sampling.scoreTierSample(q, col("doc_id"), col("quality"), rates)
      .as[(Long, Double, Int, Boolean)].collect()
    // tiers partition the corpus into ~quarters (ties can skew a bucket)
    val sizes = exact.groupBy(_._3).view.mapValues(_.size).toMap
    val total = exact.length.toDouble
    for (t <- 1 to 4)
      assert(sizes.getOrElse(t, 0) > 0.10 * total &&
        sizes.getOrElse(t, 0) < 0.40 * total, s"tier $t: ${sizes.get(t)}")
    // keep-rate ordering follows the tier rates (higher tier keeps more)
    val keepRate = exact.groupBy(_._3).view
      .mapValues(rs => rs.count(_._4).toDouble / rs.size).toMap
    assert(keepRate(1) < keepRate(4), s"$keepRate")
    // the 100 TB path: G-K sketch cuts give (near-)identical tiers
    val sketch = Sampling.scoreTierSample(q, col("doc_id"), col("quality"),
        rates, exact = false)
      .as[(Long, Double, Int, Boolean)].collect()
    val byKey = exact.map(r => r._1 -> r._3).toMap
    val agree = sketch.count(r => byKey(r._1) == r._3)
    assert(agree >= (0.95 * total).toInt,
      s"sketch tiers agree on $agree/${exact.length}")
  }

  test("temperatureMixture: alpha=0.5 boosts small sources, fracs sum to 1") {
    val plan = Sampling.temperatureMixture(docs, col("lang"), col("text"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(plan.length > 1)
    assert(math.abs(plan.map(_._3).sum - 1.0) < 1e-4, "natural fracs sum")
    assert(math.abs(plan.map(_._4).sum - 1.0) < 1e-4, "temp fracs sum")
    // boost is monotone DECREASING in source size: sqrt flattens
    val bySize = plan.sortBy(_._2)
    assert(bySize.head._5 > 1.0, "smallest source is upweighted")
    assert(bySize.last._5 < 1.0, "largest source is downweighted")
    for (w <- bySize.sliding(2) if w.size == 2 && w(0)._2 < w(1)._2)
      assert(w(0)._5 >= w(1)._5 - 1e-9,
        s"boost must not increase with size: ${w.toSeq}")
  }
}
