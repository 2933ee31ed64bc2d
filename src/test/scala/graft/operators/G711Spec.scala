package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class G711Spec extends AnyFunSuite {

  test("code-space identity: encode(decode(code)) == code for ALL 256 codes, both laws") {
    for (c <- 0 until 256) {
      // mu-law has the classic negative-zero alias: 0x7f (-0) decodes to
      // 0, which canonically re-encodes as 0xff (+0) — value-identical
      val expectMu = if (c == 0x7f) 0xff else c
      assert(G711.linearToMulaw(G711.mulawToLinear(c)) == expectMu,
        f"mu-law code $c%02x not a fixed point")
      // and the VALUE round-trip is exact for every code, alias included
      assert(G711.mulawToLinear(G711.linearToMulaw(G711.mulawToLinear(c)))
        == G711.mulawToLinear(c))
      assert(G711.linearToAlaw(G711.alawToLinear(c)) == c,
        f"A-law code $c%02x not a fixed point")
    }
  }

  test("known vectors and structural properties") {
    // mu-law: zero codes to 0xFF (all bits inverted), decodes back to 0
    assert(G711.linearToMulaw(0) == 0xff)
    assert(G711.mulawToLinear(0xff) == 0)
    // sign symmetry: decode of sign-flipped code is the negated value
    for (c <- 0 until 128)
      assert(G711.mulawToLinear(c) == -G711.mulawToLinear(c | 0x80))
    // extremes decode to the top quantization level
    assert(G711.mulawToLinear(0x80) == 32124 && G711.mulawToLinear(0x00) == -32124)
    // A-law sign symmetry
    for (c <- 0 until 128)
      assert(G711.alawToLinear(c) == -G711.alawToLinear(c | 0x80))
    // quantization error is bounded by the segment step (<= 1024 for
    // 16-bit inputs under mu-law's 8 segments; A-law similar at >>3)
    var x = 0x2545F491L
    for (_ <- 0 until 2000) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      val s = ((x * 0x9E3779B97F4A7C15L) >>> 48).toShort.toInt
      assert(math.abs(G711.mulawToLinear(G711.linearToMulaw(s)) - s) <= 1024)
      assert(math.abs(G711.alawToLinear(G711.linearToAlaw(s)) - s) <= 1056)
    }
  }

  test("monotonicity: larger magnitudes never code below smaller ones (mu-law)") {
    var prev = G711.linearToMulaw(0) & 0x7f
    for (s <- 1 to 32767 by 7) {
      val m = G711.linearToMulaw(s) & 0x7f
      // mu-law codes are bit-inverted: magnitude up => code (low 7) down
      assert(m <= prev, s"non-monotonic at $s")
      prev = m
    }
  }
}
