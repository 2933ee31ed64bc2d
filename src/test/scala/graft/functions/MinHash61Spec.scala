package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The SQL-replayable minhash family: the whole point is EXACT parity
  * with arithmetic DuckDB can express, so every primitive is pinned
  * against an independent reference implementation (BigInt modular
  * arithmetic, direct MessageDigest hex) rather than against itself.
  */
class MinHash61Spec extends AnyFunSuite {

  private val P = BigInt(2).pow(61) - 1

  private def refMd5hex15(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("md5hex15 equals parse-the-hex-string for varied inputs") {
    for (s <- Seq("", "a", "mh-a-0", "mh-b-31", "the quick brown fox",
        "mh-a-1000000", "é漢字 unicode"))
      assert(MinHash61Fn.md5hex15(s) == refMd5hex15(s), s)
  }

  test("affineMod equals BigInt (a*x+b) mod (2^61-1) across the range") {
    val max60 = (1L << 60) - 1
    val vals = Seq(0L, 1L, 2L, 12345L, max60, max60 - 1, max60 / 2,
      (1L << 59) + 17, (1L << 30) * 3 + 7)
    for (a <- vals.map(_ | 1L); x <- vals; b <- vals) {
      val expect = ((BigInt(a) * BigInt(x) + BigInt(b)) mod P).toLong
      assert(MinHash61Fn.affineMod(a, x, b) == expect, s"a=$a x=$x b=$b")
    }
  }

  test("signature equals a per-shingle BigInt min fold") {
    val text = "w0 w1 w2 w3 w4 w5 w6 w7 w0 w1 w2"
    val spark = SparkSpec.session
    val row = spark.sql(
      s"""SELECT minhash61(ngram_hashes_md5('$text', 3), 8) AS mh""")
      .head().getSeq[Long](0)
    // independent replay: distinct shingle strings, md5 hex base hash,
    // BigInt affine min per permutation
    val words = text.split(" ")
    val shingles = words.sliding(3).map(_.mkString(" ")).toSeq.distinct
    val expect = (0 until 8).map { k =>
      val a = BigInt(refMd5hex15(s"mh-a-$k") | 1L)
      val b = BigInt(refMd5hex15(s"mh-b-$k"))
      shingles.map(s => ((a * refMd5hex15(s) + b) mod P).toLong).min
    }
    assert(row == expect)
  }

  test("empty set is null; non-60-bit input fails loudly") {
    val spark = SparkSpec.session
    assert(spark.sql("SELECT minhash61(ngram_hashes_md5('one two', 3), 4) AS mh")
      .head().isNullAt(0))
    val ex = intercept[Exception] {
      spark.sql("SELECT minhash61(array(CAST(-1 AS BIGINT)), 4)").head()
    }
    assert(ex.getMessage.contains("60-bit") ||
      Option(ex.getCause).exists(_.getMessage.contains("60-bit")))
  }

  test("hlin_sum equals a per-token reference fold; order-free") {
    val text = "alpha beta gamma beta  alpha"
    val spark = SparkSpec.session
    val got = spark.sql(s"SELECT hlin_sum('$text', 1024) AS s")
      .head().getLong(0)
    val expect = text.split(" ", -1).map { t =>
      val j = (refMd5hex15(t) % 1024).toInt
      (refMd5hex15(s"qw-$j") >> 20) - (1L << 39)
    }.sum
    assert(got == expect)
    // per-token weights are bounded, so the Long sum cannot overflow
    // for any realistic document (|w| < 2^39, n < 2^24 heads room)
    assert(HashedLinearFn.weights(1024).forall(w => math.abs(w) <= (1L << 39)))
  }

  test("replayable-family LSH finds the same high-jaccard pairs as fast") {
    import graft.operators.Dedup
    val spark = SparkSpec.session
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val corpus = Dedup.withMutants(docs)
    def pairs(fam: Dedup.MinHashFamily) =
      Dedup.lshNearDups(corpus, 3, 0.5, family = fam)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = pairs(Dedup.FastFamily)
    val rep = pairs(Dedup.ReplayableFamily)
    // banding theory is family-independent: each family recalls ≥95% of
    // the union (misses are per-family banding luck on borderline pairs)
    val union = fast ++ rep
    assert(fast.size >= (union.size * 0.95).toInt, s"fast ${fast.size}/${union.size}")
    assert(rep.size >= (union.size * 0.95).toInt, s"replayable ${rep.size}/${union.size}")
  }
}
