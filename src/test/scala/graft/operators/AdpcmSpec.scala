package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AdpcmSpec extends AnyFunSuite {

  test("hand-computed nibble chain decodes per the IMA tables") {
    // state (0, 0): step 7. nibble 5 (+ bits 4|1): diff = 7>>3 + 7 + 7>>2
    // = 0+7+1 = 8 → sample 8, index 0+4 = 4 (step 11)
    assert(Adpcm.step(5, 0, 0) == ((8, 4)))
    // nibble 0xD (sign + 4|1): step 11 → diff = 1+11+2 = 14 → 8-14 = -6,
    // index 4+4 = 8 (step 16)
    assert(Adpcm.step(0xd, 8, 4) == ((-6, 8)))
    // nibble 0: diff = 16>>3 = 2 → -4, index 8-1 = 7
    assert(Adpcm.step(0, -6, 8) == ((-4, 7)))
    // clamping: max positive step at index 88
    assert(Adpcm.step(7, 32000, 88)._1 == 32767)
    assert(Adpcm.step(0xf, -32000, 88)._1 == -32768)
    assert(Adpcm.step(0, 0, 0)._2 == 0) // index clamps at 0
  }

  test("round-trip error is bounded by the local step size") {
    // a lossy codec cannot round-trip exactly, but each reconstructed
    // sample must stay within ~the step of its true value for a smooth
    // signal inside the adaptation range
    val n = 9 * 40
    val samples = Array.tabulate(n)(i =>
      (6000 * math.sin(i / 7.0) + 2000 * math.sin(i / 3.1)).toShort)
    val dec = Adpcm.decode(Adpcm.encode(samples, 9), 9, n / 9)
    assert(dec.length == n)
    // block headers re-seed exactly; interior samples track adaptively
    val errs = samples.zip(dec).map { case (a, b) => math.abs(a - b) }
    assert(errs.zipWithIndex.filter(_._2 % 9 == 0).forall(_._1 == 0),
      "block seed samples must be verbatim")
    // worst case is the adaptation lag after a large inter-block jump
    // (index re-grows one table hop per sample) — bounded well inside a
    // quarter of full scale, far from runaway state divergence
    assert(errs.max < 8192, s"worst error ${errs.max} out of adaptive range")
    val meanErr = errs.map(_.toLong).sum.toDouble / n
    assert(meanErr < 500, s"mean error $meanErr too high for smooth signal")
  }

  test("constant blocks are in the exact subspace (the mm_adpcm contract)") {
    val vals = Array[Short](-32768, -1024, 0, 256, 12345, 32767)
    val samples = vals.flatMap(v => Array.fill(9)(v))
    val dec = Adpcm.decode(Adpcm.encode(samples, 9), 9, vals.length)
    assert(dec.toSeq == samples.toSeq)
  }

  test("WAV container round-trip: fmt extension, fact clamp, padding") {
    val vals = Array.tabulate(16)(i => ((i - 8) * 256).toShort)
    val samples = vals.flatMap(v => Array.fill(9)(v))
    val wav = Multimodal.wavEncodeImaAdpcm(8000, samples, 9)
    val f = Multimodal.AdpcmWavCodec.decode(wav)
    assert(f.getInt(0) == 8000 && f.getInt(1) == 4 && f.getInt(2) == 9)
    assert(f.getLong(3) == 144L)
    val want = math.sqrt(vals.map(v => v.toLong * v).sum.toDouble / 16)
    assert(f.getDouble(4) == want)
    intercept[IllegalArgumentException](
      Multimodal.AdpcmWavCodec.decode("RIFFxxxxWAVE".getBytes))
    // PCM16 WAVs must be rejected by name, not misparsed
    val pcm = Multimodal.wavEncodePcm16(8000, 2, samples)
    intercept[IllegalArgumentException](Multimodal.AdpcmWavCodec.decode(pcm))
  }
}
