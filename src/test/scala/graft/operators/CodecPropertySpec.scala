package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the pure-JVM codecs and curation kernels — the
  * TransformerPropertySpec pattern: deterministic seeded samples from
  * scalacheck generators, assertions are invariants (round-trip
  * identity, reconstruction, monotonicity), not example values.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(911L + i)))

  // ---------------------------------------------------------------- FLAC

  private val genPcm: Gen[Array[Int]] = for {
    n <- Gen.choose(1, 700)
    mode <- Gen.oneOf("noise", "smooth", "const", "steps")
    base <- Gen.choose(-30000, 30000)
  } yield mode match {
    case "noise" =>
      var x = base.toLong | 1L
      Array.fill(n) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        ((x * 0x2545F4914F6CDD1DL) >>> 48).toShort.toInt
      }
    case "smooth" => Array.tabulate(n)(i =>
      (base / 2 + 2000 * math.sin(i / 9.0)).toInt.max(-32768).min(32767))
    case "const" => Array.fill(n)(base)
    case "steps" => Array.tabulate(n)(i =>
      (base + (i / 7) * 31).max(-32768).min(32767))
  }

  test("FLAC: every generated signal round-trips bit-exactly (mono + stereo)") {
    for ((pcm, i) <- sample(genPcm, 40).zipWithIndex) {
      val bs = Seq(64, 192, 4096)(i % 3)
      val dec = Flac.decode(Flac.encode(Array(pcm), 8000, blockSize = bs))
      assert(dec.pcm(0).toSeq == pcm.toSeq, s"mono case $i (blockSize $bs)")
    }
    for (Seq(l, r) <- sample(genPcm, 20).grouped(2).toSeq if l.length > 0) {
      val n = math.min(l.length, r.length)
      val dec = Flac.decode(Flac.encode(
        Array(l.take(n), r.take(n)), 44100, blockSize = 128))
      assert(dec.pcm(0).toSeq == l.take(n).toSeq &&
        dec.pcm(1).toSeq == r.take(n).toSeq)
    }
  }

  // ----------------------------------------------------------------- BPE

  private val genWord: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ Seq('ß', '日')))
  } yield cs.mkString

  test("BPE encodeWord: concatenated tokens always reconstruct word + </w>") {
    // rank tables drawn from the words' own substrings so merges fire
    val words = sample(genWord, 60)
    val ranks = new java.util.HashMap[(String, String), Int]()
    var r = 0
    for (w <- words.take(20); i <- 0 until w.length - 1) {
      val k = (w.substring(i, i + 1), w.substring(i + 1, i + 2))
      if (!ranks.containsKey(k)) { ranks.put(k, r); r += 1 }
    }
    for (w <- words) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString == w + Bpe.Eow, s"reconstruction failed for '$w'")
      assert(toks.forall(_.nonEmpty))
    }
  }

  // --------------------------------------------------------------- ADPCM

  private val genBlocks: Gen[Array[Short]] = for {
    nBlocks <- Gen.choose(1, 8)
    vals <- Gen.listOfN(nBlocks * 9, Gen.choose(-32768, 32767))
  } yield vals.map(_.toShort).toArray

  private val genSlow: Gen[Array[Short]] = for {
    nBlocks <- Gen.choose(1, 8)
    start <- Gen.choose(-20000, 20000)
    deltas <- Gen.listOfN(nBlocks * 9 - 1, Gen.choose(-3, 3))
  } yield deltas.scanLeft(start)(_ + _).map(_.toShort).toArray

  test("ADPCM: shape invariants on arbitrary input; tight tracking on slow signals") {
    // arbitrary (incl. full-range jumps): structural invariants only —
    // a step-adaptive codec's error on hostile jumps is transiently
    // range-scale BY DESIGN (the step table must catch up)
    for (samples <- sample(genBlocks, 25)) {
      val dec = Adpcm.decode(Adpcm.encode(samples, 9), 9, samples.length / 9)
      assert(dec.length == samples.length)
      for (b <- samples.indices by 9)
        assert(dec(b) == samples(b), "block-leading samples are verbatim")
      // deterministic: re-encoding yields identical bytes
      assert(java.util.Arrays.equals(
        Adpcm.encode(samples, 9), Adpcm.encode(samples, 9)))
    }
    // slow signals (|delta| <= 3 < the smallest step 7): the quantizer
    // can always follow, so per-sample error stays within one step's
    // bit-serial resolution
    for (samples <- sample(genSlow, 25)) {
      val dec = Adpcm.decode(Adpcm.encode(samples, 9), 9, samples.length / 9)
      for (i <- samples.indices)
        assert(math.abs(dec(i) - samples(i)) <= 8,
          s"slow-signal tracking error at $i: ${dec(i)} vs ${samples(i)}")
    }
  }
}
