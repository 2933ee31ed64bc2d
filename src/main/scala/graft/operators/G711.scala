package graft.operators

/** Pure-JVM ITU-T G.711 companding — µ-law (PCMU) and A-law (PCMA), the
  * telephony codecs (WAV format tags 7 and 6; healthcare dictation and
  * call-recording corpora are full of them). Logarithmic 8-bit coding of
  * 16-bit PCM: segment (exponent) + mantissa, the classic reference
  * algorithm (CCITT/Sun g711.c lineage, public domain).
  *
  * Both laws satisfy the codec identity `encode(decode(code)) == code`
  * for every 8-bit code — asserted EXHAUSTIVELY in G711Spec — so code
  * bytes are a lossless ground truth even though linear→code→linear is
  * quantized.
  */
object G711 {

  private val Bias = 0x84
  private val Clip = 32635

  /** 16-bit linear → µ-law code byte (0..255). */
  def linearToMulaw(pcm: Int): Int = {
    var s = pcm
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (s >> (exponent + 3)) & 0x0f
    ~(sign | (exponent << 4) | mantissa) & 0xff
  }

  /** µ-law code byte → 16-bit linear (the canonical quantized value). */
  def mulawToLinear(code: Int): Int = {
    val c = ~code & 0xff
    val exponent = (c >> 4) & 7
    val mantissa = c & 0x0f
    val mag = (((mantissa << 3) + Bias) << exponent) - Bias
    if ((c & 0x80) != 0) -mag else mag
  }

  private val SegAEnd =
    Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  /** 16-bit linear → A-law code byte (0..255). */
  def linearToAlaw(pcm: Int): Int = {
    var s = pcm >> 3 // A-law operates on 13-bit magnitudes
    val mask = if (s >= 0) 0xd5 else { s = -s - 1; 0x55 }
    var seg = 0
    while (seg < 8 && s > SegAEnd(seg)) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      val aval = (seg << 4) |
        (if (seg < 2) (s >> 1) & 0x0f else (s >> seg) & 0x0f)
      aval ^ mask
    }
  }

  /** A-law code byte → 16-bit linear. */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case _ => t += 0x108; t <<= seg - 1
    }
    if ((a & 0x80) != 0) t else -t
  }

  def encodeMulaw(samples: Array[Short]): Array[Byte] =
    samples.map(s => linearToMulaw(s.toInt).toByte)

  def decodeMulaw(codes: Array[Byte]): Array[Short] =
    codes.map(c => mulawToLinear(c & 0xff).toShort)

  def encodeAlaw(samples: Array[Short]): Array[Byte] =
    samples.map(s => linearToAlaw(s.toInt).toByte)

  def decodeAlaw(codes: Array[Byte]): Array[Short] =
    codes.map(c => alawToLinear(c & 0xff).toShort)
}
