package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("CMS estimates keep the overestimate guarantee vs exact counts") {
    val words = Seq("the", "a", "row", "value", "zz_never_seen")
    val sketch = Sketches.countMin(docs, col("text"))
    val est = Sketches.cmsEstimate(sketch, words)
      .as[(String, Long)].collect().toMap
    val exact = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    for (w <- words) {
      val e = exact.getOrElse(w, 0L)
      assert(est(w) >= e, s"$w: est ${est(w)} < exact $e — CMS cannot undercount")
    }
    // with a 4x1024 sketch over this tiny vocabulary the estimates
    // should in fact be exact for the common words
    assert(est("the") == exact("the"))
  }

  test("CMS is mergeable: sketch(A ∪ B) == cellwise sum of partials") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val whole = Sketches.countMin(docs, col("text"))
    val merged = Sketches.countMin(a, col("text"))
      .unionByName(Sketches.countMin(b, col("text")))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty,
      "integer cells must make the sketch merge-order-free")
  }

  test("CMS cells are partitioning-invariant") {
    val one = Sketches.countMin(docs, col("text"))
    val rep = Sketches.countMin(docs.repartition(7), col("text"))
    assert(one.exceptAll(rep).isEmpty && rep.exceptAll(one).isEmpty)
  }

  test("hll_bucket_rho: packed native value == the md5 hex-chain spelling, row for row") {
    // real tokens plus adversarial edges (empty string, multibyte, the
    // all-zero-suffix convention can't be planted — parity over the
    // formula covers it: both sides derive from the same md5)
    val vals = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("v"))
      .union(Seq("", "é漢", "0", "a b").toDF("v"))
    val hex = md5(col("v"))
    val suffix = substring(hex, 4, 12)
    val z0 = length(regexp_extract(suffix, "^0*", 0))
    val firstNz = suffix.substr(z0 + 1, lit(1))
    val nz = when(firstNz === "", lit(0)).when(firstNz === "1", 3)
      .when(firstNz.isin("2", "3"), 2)
      .when(firstNz.isin("4", "5", "6", "7"), 1).otherwise(0)
    val chain = (conv(substring(hex, 1, 3), 16, 10).cast("long") * 64 +
      (z0 * 4 + nz + 1)).as("expect")
    val mismatches = vals
      .select(call_function("hll_bucket_rho", col("v")).as("got"), chain)
      .filter(col("got") =!= col("expect")).count()
    assert(mismatches == 0)
  }

  test("hll_ngram_bucket_rho: fused byte-range values == per-shingle-string values, position for position") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(Seq((9001L, "a b"), (9002L, "solo"), (9003L, "é漢 x y z")).toDF("doc_id", "text"))
    val fused = docs.select(col("doc_id"),
      call_function("hll_ngram_bucket_rho", col("text"), lit(3)).as("a"))
    val toks = split(col("text"), " ")
    val allShingles = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))
    val viaStrings = docs.select(col("doc_id"),
      transform(allShingles, s => call_function("hll_bucket_rho", s)).as("b"))
    val diff = fused.join(viaStrings, "doc_id")
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("HLL: ~1.6%-class accuracy, duplicate/partition invariance, max-merge") {
    // planted cardinalities spanning both estimator regimes
    val vals = ((1 to 500).map(i => ("small", s"s$i")) ++
      (1 to 30000).map(i => ("large", s"L$i"))).toDF("grp", "v")
    def est(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      Sketches.hllDistinct(df, col("grp"), col("v"))
        .as[(String, Double)].collect().toMap
    val e = est(vals)
    assert(math.abs(e("small") - 500) / 500.0 < 0.05, s"small: ${e("small")}")
    assert(math.abs(e("large") - 30000) / 30000.0 < 0.05, s"large: ${e("large")}")
    // duplicates cannot move a DISTINCT sketch (register max is
    // idempotent), and neither can the partition layout
    assert(est(vals.unionByName(vals).repartition(7)) == e,
      "duplicated/repartitioned input changed the registers")
    // mergeability: registers of A ∪ B == bucketwise MAX of the halves'
    // registers (union the raw halves — max aggregation IS the merge)
    val a = vals.filter(col("v").startsWith("L") === false)
    val b = vals.filter(col("v").startsWith("L"))
    assert(est(a.unionByName(b)) == e)
  }

  test("Bloom: no false negatives, OR-merge of segments == whole, partition invariance") {
    val hist = docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
    val bloom = Sketches.bloomBits(hist, col("text"))
    // every history doc must probe seen (a Bloom filter cannot false-negative)
    val self = Sketches.bloomProbe(bloom, hist, col("doc_id"), col("text"))
      .as[(Long, Boolean)].collect()
    assert(self.nonEmpty && self.forall(_._2), "history doc not found in its own filter")
    // segment filters OR together into the whole-history filter
    val a = hist.filter(col("doc_id") % 2 === 0)
    val b = hist.filter(col("doc_id") % 2 === 1)
    val merged = Sketches.bloomBits(a, col("text"))
      .unionByName(Sketches.bloomBits(b, col("text")))
      .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
    assert(bloom.exceptAll(merged).isEmpty && merged.exceptAll(bloom).isEmpty,
      "bit_or register merge must equal the whole-corpus filter")
    // duplicates and partition layout cannot move an idempotent-OR sketch
    val rep = Sketches.bloomBits(hist.unionByName(hist).repartition(7), col("text"))
    assert(bloom.exceptAll(rep).isEmpty && rep.exceptAll(bloom).isEmpty)
  }

  test("Bloom: false positives occur at tiny m, deterministically, and only as overclaims") {
    val hist = docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
    val novel = docs.filter(col("doc_id") >= 200).select(col("doc_id"), col("text"))
    // m = 256 bits for 200 keys: heavily loaded, FPs guaranteed
    def verdicts(k: Int, m: Int): Map[Long, Boolean] =
      Sketches.bloomProbe(Sketches.bloomBits(hist, col("text"), k, m),
          novel, col("doc_id"), col("text"), k, m)
        .as[(Long, Boolean)].collect().toMap
    val v = verdicts(4, 256)
    assert(v.values.exists(identity), "a 200-key/256-bit filter must false-positive")
    assert(v == verdicts(4, 256), "verdicts must be deterministic run to run")
    // at the default size the same probes are all clean — FP rate is a
    // sizing choice, not an accuracy ceiling
    val wide = verdicts(4, 32768)
    assert(wide.values.forall(!_), "default-size filter false-positived on this corpus")
  }

  test("foldable function parameters reject null / non-numeric literals with a descriptive error") {
    def msgChain(t: Throwable): String = {
      val sb = new StringBuilder
      var cur: Throwable = t
      while (cur != null) { sb.append(cur.getMessage).append(" | "); cur = cur.getCause }
      sb.toString
    }
    val df = Seq("a b c d").toDF("text")
    val nullErr = intercept[Throwable] {
      df.select(call_function("hll_ngram_bucket_rho", col("text"),
        lit(null).cast("int"))).collect()
    }
    assert(msgChain(nullErr).contains("hll_ngram_bucket_rho"), msgChain(nullErr))
    assert(msgChain(nullErr).contains("NULL"), msgChain(nullErr))
    val strErr = intercept[Throwable] {
      df.select(call_function("ngram_hashes", col("text"), lit("3"))).collect()
    }
    assert(msgChain(strErr).contains("ngram_hashes"), msgChain(strErr))
    assert(msgChain(strErr).contains("numeric literal"), msgChain(strErr))
  }
}
