package graft.operators

/** Pure-JVM IMA-ADPCM (DVI4 / WAV format tag 0x11) codec: 4-bit adaptive
  * differential PCM, the classic 4:1 compressed-audio format. Each block
  * carries a verbatim int16 predictor seed + step index, then one 4-bit
  * nibble per sample; decode reconstructs samples through the shared
  * step-size/index adaptation tables. A REAL lossy audio codec with full
  * encoder state tracking — the remaining audio exclusion narrows to
  * entropy-coded psychoacoustic formats (MP3-class).
  *
  * Tables are the IMA/DVI reference values (public spec, reproduced in
  * RFC 3551 §4.5.1 and every ADPCM implementation).
  */
object Adpcm {

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampSample(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  private def clampIndex(v: Int): Int =
    if (v < 0) 0 else if (v > 88) 88 else v

  /** Decode one nibble against (predictor, stepIndex); returns the new
    * state. The reconstruction diff uses the standard bit-serial
    * approximation diff = step/8 + (n2?step) + (n1?step/2) + (n0?step/4).
    */
  def step(nibble: Int, predictor: Int, stepIndex: Int): (Int, Int) = {
    val st = StepTable(stepIndex)
    var diff = st >> 3
    if ((nibble & 4) != 0) diff += st
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 1) != 0) diff += st >> 2
    val next =
      if ((nibble & 8) != 0) clampSample(predictor - diff)
      else clampSample(predictor + diff)
    (next, clampIndex(stepIndex + IndexTable(nibble)))
  }

  /** Choose the nibble for a target sample given the state (reference
    * encoder: quantize the difference bit-serially against the step).
    */
  private def quantize(diff0: Int, st: Int): Int = {
    var nibble = if (diff0 < 0) 8 else 0
    var diff = if (diff0 < 0) -diff0 else diff0
    var s = st
    if (diff >= s) { nibble |= 4; diff -= s }
    s >>= 1
    if (diff >= s) { nibble |= 2; diff -= s }
    s >>= 1
    if (diff >= s) { nibble |= 1 }
    nibble
  }

  /** Encode mono samples into IMA blocks: per block a 4-byte header
    * (int16 predictor = first sample verbatim, uint8 step index, one
    * reserved byte) + 4-bit nibbles for the remaining samples, low
    * nibble first. samplesPerBlock must be odd (header sample + 2/byte).
    */
  def encode(samples: Array[Short], samplesPerBlock: Int): Array[Byte] = {
    require(samplesPerBlock >= 3 && samplesPerBlock % 2 == 1,
      s"samplesPerBlock must be odd >= 3, got $samplesPerBlock")
    require(samples.length % samplesPerBlock == 0,
      s"${samples.length} samples not a multiple of $samplesPerBlock")
    val out = new java.io.ByteArrayOutputStream()
    var stepIndex = 0
    var b = 0
    while (b < samples.length) {
      var predictor: Int = samples(b)
      out.write(predictor & 0xff); out.write((predictor >> 8) & 0xff)
      out.write(stepIndex); out.write(0)
      var i = 1
      var lo = -1
      while (i < samplesPerBlock) {
        val target: Int = samples(b + i)
        val nib = quantize(target - predictor, StepTable(stepIndex))
        val (p2, s2) = step(nib, predictor, stepIndex)
        predictor = p2; stepIndex = s2
        if (lo < 0) lo = nib
        else { out.write(lo | (nib << 4)); lo = -1 }
        i += 1
      }
      if (lo >= 0) out.write(lo)
      b += samplesPerBlock
    }
    out.toByteArray
  }

  /** Decode IMA blocks back to mono samples. */
  def decode(data: Array[Byte], samplesPerBlock: Int,
      nBlocks: Int): Array[Short] = {
    val bytesPerBlock = 4 + (samplesPerBlock - 1 + 1) / 2
    require(data.length >= nBlocks * bytesPerBlock,
      s"ADPCM data ${data.length}B < $nBlocks blocks of $bytesPerBlock")
    val out = new Array[Short](nBlocks * samplesPerBlock)
    var n = 0
    var off = 0
    var blk = 0
    while (blk < nBlocks) {
      var predictor =
        ((data(off) & 0xff) | ((data(off + 1) & 0xff) << 8)).toShort.toInt
      var stepIndex = data(off + 2) & 0xff
      require(stepIndex <= 88, s"ADPCM step index $stepIndex > 88")
      out(n) = predictor.toShort; n += 1
      var i = 1
      while (i < samplesPerBlock) {
        val nibIdx = i - 1 // nibbles start after the header sample
        val byte = data(off + 4 + (nibIdx >> 1)) & 0xff
        val nib = if ((nibIdx & 1) == 0) byte & 0xf else byte >> 4
        val (p2, s2) = step(nib, predictor, stepIndex)
        predictor = p2; stepIndex = s2
        out(n) = predictor.toShort; n += 1
        i += 1
      }
      off += bytesPerBlock
      blk += 1
    }
    out
  }
}
