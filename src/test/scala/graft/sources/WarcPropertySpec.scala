package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the splittable `.warc.gz` reader — the
  * CodecPropertySpec pattern: seeded generator corpora (with planted
  * gzip-magic+WARC/ sync bait), invariants over EVERY split size from
  * pathological (smaller than any member) to larger-than-file.
  */
class WarcPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(737L + i)))


  private val genCorpus: Gen[Seq[Warc.WarcRecord]] = for {
    n <- Gen.choose(1, 120)
    seed <- Gen.choose(1L, 1000000L)
    baitEvery <- Gen.choose(2, 10)
  } yield (0 until n).map { i =>
    var x = seed * 31 + i
    val len = 5 + (i * 37) % 900
    val body = Array.fill(len) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      ((x * 0x2545F4914F6CDD1DL) >>> 56).toByte
    }
    val bait =
      if (i % baitEvery == 0)
        Array[Byte](0x1f, 0x8b.toByte, 0x08) ++ "WARC/1.0\r\n".getBytes
      else Array.emptyByteArray
    Warc.WarcRecord("resource", s"u://$i", s"<r$i>", body ++ bait)
  }

  test("WARC splits: any corpus, any split size — exact record recovery") {
    for ((corpus, i) <- sample(genCorpus, 30).zipWithIndex) {
      val gz = Warc.writeGz(corpus)
      val fileLen = gz.length.toLong
      // split sizes from pathological (127 B — smaller than any member)
      // to larger-than-file
      val splitSize = Seq(127, 1 << 10, 16 << 10, gz.length + 1)(i % 4)
      val got = 0L.until(fileLen, splitSize.toLong).flatMap { s =>
        val e = math.min(s + splitSize, fileLen)
        var pos = e
        val first = java.util.Arrays.copyOfRange(gz, s.toInt, e.toInt)
        Warc.splitRecords(first, s, e, fileLen, n => {
          val m = math.min(pos + n, fileLen)
          val r = java.util.Arrays.copyOfRange(gz, pos.toInt, m.toInt)
          pos = m; r
        }).toSeq
      }
      assert(got.size == corpus.size, s"corpus $i splitSize $splitSize")
      for (((_, a), b) <- got.zip(corpus)) {
        assert(a.recordId == b.recordId, s"corpus $i splitSize $splitSize")
        assert(java.util.Arrays.equals(a.payload, b.payload))
      }
      assert(got.map(_._1) == got.map(_._1).sorted, "offsets ascending")
    }
  }

  test("canonicalizeUrl: idempotent and normalized on generated URLs") {
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val genUrl: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "Https")
      host <- Gen.oneOf("Example.COM", "a-b.example", "X.Y.Z")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/Docs/Page", "/a/b/", "/p%20q")
      track <- Gen.oneOf("", "utm_source=x", "gclid=1", "fbclid=ab")
      real <- Gen.oneOf("", "id=3", "q=Hello+World")
      frag <- Gen.oneOf("", "#sec", "#a?b")
    } yield {
      val params = Seq(track, real).filter(_.nonEmpty)
      s"$scheme://$host$port$path" +
        (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag
    }
    val urls = sample(genUrl, 120).distinct
    val once = urls.toDF("u")
      .select(graft.operators.TextOps.canonicalizeUrl(col("u")).as("c"))
    val twice = once
      .select(graft.operators.TextOps.canonicalizeUrl(col("c")).as("c"))
    val a = once.as[String].collect()
    val b = twice.as[String].collect()
    for (((o, t), in) <- a.zip(b).zip(urls)) {
      assert(o == t, s"not idempotent for '$in': '$o' -> '$t'")
      assert(!o.contains("#"), s"fragment survived: $in -> $o")
      assert(!o.contains("utm_") && !o.contains("gclid") &&
        !o.contains("fbclid"), s"tracking survived: $in -> $o")
      val sh = o.takeWhile(_ != '/')
      assert(sh == sh.toLowerCase, s"scheme not lowered: $in -> $o")
      // DEFAULT pairs only: http:80 / https:443 must vanish, everything
      // else (incl. the non-default https:80) must survive untouched
      assert(!o.matches("^http://[^/:?#]+:80([/?#].*|$)"),
        s"http default port survived: $in -> $o")
      assert(!o.matches("^https://[^/:?#]+:443([/?#].*|$)"),
        s"https default port survived: $in -> $o")
    }
  }
}
