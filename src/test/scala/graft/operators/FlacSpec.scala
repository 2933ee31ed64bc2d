package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec conformance.
  *
  * The round-trip tests cover the ENCODER's emission surface (FIXED
  * orders 0–2, Rice method 0, independent channels) through the decoder.
  * The hand-assembled vector covers decoder paths the encoder never
  * emits — LPC prediction, left/side decorrelation, Rice method 1 with
  * multiple partitions and an escaped raw partition, wasted bits — built
  * bit-by-bit from the public spec (RFC 9639), the GifSpec
  * hand-assembled-LZW pattern: the decoder is checked against the
  * FORMAT, not against its own encoder.
  */
class FlacSpec extends AnyFunSuite {

  /** Deterministic 16-bit noise-ish signal (no java.util.Random). */
  private def signal(n: Int, seed: Long): Array[Int] = {
    var x = seed
    Array.fill(n) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      ((x * 0x2545F4914F6CDD1DL) >>> 48).toShort.toInt
    }
  }

  test("mono round-trip is bit-exact across frame boundaries") {
    for (n <- Seq(1, 63, 64, 65, 500)) {
      val pcm = signal(n, seed = n)
      val enc = Flac.encode(Array(pcm), 8000, blockSize = 64)
      val dec = Flac.decode(enc)
      assert(dec.sampleRate == 8000 && dec.channels == 1 && dec.bits == 16)
      assert(dec.totalSamples == n)
      assert(dec.pcm(0).toSeq == pcm.toSeq, s"n=$n")
    }
  }

  test("stereo round-trip is bit-exact; smooth signals compress") {
    val left = Array.tabulate(300)(i => (2000 * math.sin(i / 7.0)).toInt)
    val right = Array.tabulate(300)(i => (1500 * math.cos(i / 11.0)).toInt)
    val enc = Flac.encode(Array(left, right), 44100, blockSize = 128)
    val dec = Flac.decode(enc)
    assert(dec.channels == 2 && dec.pcm(0).toSeq == left.toSeq &&
      dec.pcm(1).toSeq == right.toSeq)
    // FIXED prediction must beat verbatim on smooth content: 300×2
    // 16-bit samples = 1200 raw bytes; require real compression
    assert(enc.length < 1000, s"no compression: ${enc.length} bytes")
  }

  test("constant blocks pick order >= 1 and stay tiny") {
    val pcm = Array.fill(256)(1234)
    val enc = Flac.encode(Array(pcm), 8000, blockSize = 256)
    assert(Flac.decode(enc).pcm(0).toSeq == pcm.toSeq)
    assert(enc.length < 120, s"constant block not compact: ${enc.length}")
  }

  // ---------------------------------------------------------- hand vector

  /** Spec-side MSB-first writer for assembling raw streams. */
  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nb = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nb += 1
      if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def unary(q: Int): Unit = { (0 until q).foreach(_ => bit(0)); bit(1) }
    def align(): Unit = while (nb != 0) bit(0)
    def bytes: Array[Byte] = out.toByteArray
  }

  test("hand-assembled stream: LPC + left/side + Rice-5 partitions + escape + wasted bits") {
    // Expected PCM — left: an order-1 LPC-friendly ramp; side constant 4
    // (so right = left − 4). blockSize 8, stereo, 16-bit.
    val left = Array(1000, 1010, 1005, 1020, 990, 985, 1002, 1001)
    val side = Array.fill(8)(4)
    val right = left.zip(side).map { case (l, s) => l - s }
    val md = java.security.MessageDigest.getInstance("MD5")
    for (i <- 0 until 8; s <- Seq(left(i), right(i)))
      md.update(Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val w = new W
    w.out.write("fLaC".getBytes)
    w.bit(1); w.bits(0, 7); w.bits(34, 24) // last block, STREAMINFO
    w.bits(8, 16); w.bits(8, 16)           // min = max blocksize
    w.bits(0, 24); w.bits(0, 24)
    w.bits(8000, 20); w.bits(1, 3); w.bits(15, 5) // stereo, 16-bit
    w.bits(8, 36)
    md.digest().foreach(b => w.bits(b & 0xff, 8))
    // frame header
    val f = new W
    f.bits(0x3ffe, 14); f.bit(0); f.bit(0)
    f.bits(7, 4)   // blocksize: explicit 16-bit
    f.bits(4, 4)   // 8000 Hz
    f.bits(8, 4)   // LEFT/SIDE
    f.bits(4, 3)   // 16-bit
    f.bit(0)
    f.bits(0, 8)   // frame number 0 (UTF-8 single byte)
    f.bits(8 - 1, 16)
    f.align()
    val hdr = f.bytes
    f.bits(Flac.crc8(hdr, 0, hdr.length), 8)
    // subframe 0 (left, 16 bits): LPC order 1, coef 1 @ precision 5,
    // shift 0 → residual r[i] = L[i] − L[i−1]
    f.bit(0); f.bits(32 + (1 - 1), 6); f.bit(0) // LPC order 1, no wasted
    f.bits(left(0).toLong & 0xffff, 16)          // warmup
    f.bits(5 - 1, 4)                             // qlp precision 5
    f.bits(0, 5)                                 // shift 0
    f.bits(1, 5)                                 // coef = +1
    // residual, method 1 (5-bit params), partition order 1 → 2×4:
    // partition 0 holds entries 1..3 (order eats one), Rice param 3;
    // partition 1 holds entries 4..7, ESCAPED to 6 raw bits
    f.bits(1, 2); f.bits(1, 4)
    val res = (1 until 8).map(i => left(i) - left(i - 1)) // 10,-5,15,-30,-5,17,-1
    f.bits(3, 5)
    for (r <- res.take(3)) {
      val u = if (r >= 0) r.toLong << 1 else ((-r.toLong) << 1) - 1
      f.unary((u >> 3).toInt); f.bits(u & 7, 3)
    }
    f.bits(31, 5) // escape
    f.bits(6, 5)  // 6 raw bits
    for (r <- res.drop(3)) f.bits(r.toLong & 0x3f, 6)
    // subframe 1 (side, 17 bits): CONSTANT with 2 wasted bits →
    // stored value 1 at 15 bits, reconstructed 1 << 2 = 4
    f.bit(0); f.bits(0, 6); f.bit(1); f.unary(1) // wasted = 1 + unary(1) = 2
    f.bits(1, 17 - 2)
    f.align()
    val body = f.bytes
    f.bits(Flac.crc16(body, 0, body.length), 16)
    w.out.write(f.bytes)
    val dec = Flac.decode(w.bytes)
    assert(dec.channels == 2 && dec.totalSamples == 8)
    assert(dec.pcm(0).toSeq == left.toSeq, "left channel (LPC) mismatch")
    assert(dec.pcm(1).toSeq == right.toSeq, "right channel (side) mismatch")
  }

  test("mutation fuzz: every 1-byte corruption throws or decodes identically") {
    val pcm = signal(200, seed = 7)
    val enc = Flac.encode(Array(pcm), 8000, blockSize = 64)
    var threw = 0
    for (i <- enc.indices; flip <- Seq(0x01, 0x80)) {
      val m = enc.clone(); m(i) = (m(i) ^ flip).toByte
      try {
        val dec = Flac.decode(m)
        assert(dec.pcm(0).toSeq == pcm.toSeq,
          s"byte $i flip $flip decoded DIFFERENT pcm without an error")
      } catch { case _: Throwable => threw += 1 }
    }
    assert(threw > enc.length, s"only $threw corruptions detected") // most bytes are load-bearing
  }

  test("truncation and named exclusions fail loudly") {
    val enc = Flac.encode(Array(signal(100, 3)), 8000)
    for (cut <- Seq(3, 10, 41, enc.length - 1))
      intercept[Throwable](Flac.decode(java.util.Arrays.copyOf(enc, cut)))
    intercept[IllegalArgumentException](
      Flac.encode(Array(Array(100000)), 8000)) // not 16-bit
    intercept[IllegalArgumentException](
      Flac.encode(Array.fill(3)(Array(1, 2)), 8000)) // >2 channels
  }

  test("hostile STREAMINFO sample count is rejected BEFORE allocation") {
    // the 36-bit total-samples field is untrusted: a 14-byte header can
    // demand gigabytes of decode buffers; the cap must fire first.
    // STREAMINFO layout puts total-samples at bit offset 108 of the
    // 34-byte block, i.e. low nibble of data byte 13 through byte 17;
    // the block's data starts at file offset 8 (magic + block header)
    val enc = Flac.encode(Array(signal(50, 7)), 8000)
    val m = enc.clone()
    m(8 + 13) = (m(8 + 13) | 0x0F).toByte
    for (k <- 14 to 17) m(8 + k) = 0xFF.toByte // totalSamples = 2^36 - 1
    val ex = intercept[IllegalArgumentException](Flac.decode(m))
    assert(ex.getMessage.contains("cap"), ex.getMessage)
  }
}
