package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Pure-JVM baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec).
  *
  * Scope — baseline sequential DCT (SOF0/1) AND progressive (SOF2,
  * T.81 Annex G: spectral selection, successive approximation with DC
  * and AC refinement scans, EOB-run batching), 8-bit precision,
  * Huffman entropy coding, 1-component (grayscale) or 3-component
  * (YCbCr, JFIF color matrix) images with general sampling factors in
  * {1,2,4} — 4:4:4, 4:2:2 and 4:2:0 chroma subsampling all decode
  * (interleaved MCU walk per T.81 A.2.3, sample-replication
  * upsampling) — optional restart intervals. Arithmetic coding,
  * hierarchical (SOF5+) and 12-bit precision are rejected with a
  * descriptive `IllegalArgumentException` — honest scope, not silent
  * garbage. Progressive conformance is pinned by JpegSpec's exact
  * progressive==baseline reconstruction equality (both entropy-code
  * the same quantized coefficients).
  *
  * The decoder is general over conforming streams (tables are read from
  * DQT/DHT segments, not assumed); the encoder exists so pipelines
  * without real media can synthesize valid JPEGs deterministically and
  * still value-check the decode path end to end (`TextPack.mm_jpeg`
  * digest-replay oracle, same pattern as the BMP/WAV codecs).
  *
  * IDCT is the naive double-precision separable form of the standard's
  * Annex A.3.3 definition — bit-stable across JVMs (strictfp-free double
  * ops on the same inputs), and for DC-only blocks the reconstruction
  * `round(dequantDC / 8 + 128)` is exact, which is what the oracle
  * replays. Fixtures are tiny; codec throughput is not the design point
  * (the Spark-side plumbing in [[Multimodal]] is).
  *
  * Generalizes the reference's attachment metadata handling
  * (assay.py:123-140) to content-bearing image columns.
  */
object Jpeg {

  /** Decode-side allocation bound: max pixels per image (covers 11585²).
    * 16-bit SOF dims can claim ~4.3e9 pixels; unchecked, the Int
    * plane-size math overflows and a hostile 2-byte edit demands
    * multi-GB buffers from an executor.
    */
  val MaxPixels: Long = 1L << 27

  /** Zigzag index → natural (row-major) index, T.81 Figure A.6. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 Annex K.1 luminance quantization table (natural order). */
  val StdQuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Flat table: every coefficient divisor q. q=8 makes DC-only blocks
    * reconstruct exactly (dequantDC/8 = s), q=1 is near-lossless for any
    * content — both are what the deterministic fixtures/tests want.
    */
  def flatQuant(q: Int): Array[Int] = Array.fill(64)(q)

  // T.81 Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
  private val StdDcLumaCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumaValues = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  /** AC table for the PROGRESSIVE encoder: the baseline standard table
    * has no EOBn symbols (0x10..0xE0 — they only exist in progressive
    * streams, where real encoders ship custom tables). A fixed-8-bit
    * canonical table covering EOB0/EOBn/ZRL plus every (run, size 1-10)
    * keeps the encoder trivial and the stream fully legal; the decoder
    * reads whatever DHT arrives, so nothing special-cases this.
    */
  private val ProgAcValues: Array[Int] =
    (Array(0x00) ++
      (for (r <- 0 to 15; sz <- 1 to 10) yield (r << 4) | sz) ++
      (1 to 14).map(_ << 4) ++ Array(0xf0)).toArray
  private val ProgAcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, ProgAcValues.length, 0, 0, 0, 0, 0, 0, 0, 0)

  private val StdAcLumaCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumaValues = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // 8×8 DCT basis, cosBasis(x)(u) = cos((2x+1)·u·π/16); cNorm(0)=1/√2.
  private val cosBasis: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val cNorm: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Decoded image: `planes` holds gray samples (1 comp) or R,G,B (3
    * comps after the JFIF color transform), each `width*height` row-major.
    */
  final case class Image(width: Int, height: Int, nComp: Int,
      planes: Array[Array[Int]])

  // ------------------------------------------------------------------
  // Entropy-coded-segment bit I/O
  // ------------------------------------------------------------------

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBit((code >>> i) & 1); i -= 1 }
    }
    private def putBit(b: Int): Unit = {
      acc = (acc << 1) | b
      nbits += 1
      if (nbits == 8) {
        out.write(acc)
        if (acc == 0xff) out.write(0x00) // byte stuffing (T.81 F.1.2.3)
        acc = 0; nbits = 0
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flushWithOnes(): Unit = while (nbits != 0) putBit(1)
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "JPEG entropy stream truncated")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "JPEG entropy stream truncated after 0xFF")
          val m = bytes(pos) & 0xff
          require(m == 0x00,
            f"unexpected marker 0xFF$m%02X inside entropy-coded data")
          pos += 1 // drop the stuffed 0x00
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker (T.81 F.2.2.5). */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < bytes.length, "JPEG truncated at restart marker")
      val ok = (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + expected)
      require(ok, f"expected RST$expected%d marker at offset $pos")
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): map `n` received magnitude bits to a signed
    * coefficient value.
    */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  /** Magnitude category of a DC diff / AC value (bit length of |v|). */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // ------------------------------------------------------------------
  // Huffman tables (canonical, T.81 Annex C)
  // ------------------------------------------------------------------

  private final class HuffTable(counts: Array[Int], values: Array[Int]) {
    require(counts.length == 16 && values.length == counts.sum,
      s"malformed Huffman table: ${counts.sum} codes, ${values.length} values")
    // mincode/maxcode/valptr indexed by code length 1..16 (slot 0 unused).
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val syms: Array[Int] = values
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        val n = counts(len - 1)
        if (n > 0) {
          minCode(len) = code
          valPtr(len) = k
          code += n; k += n
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
      require(code <= (1 << 17), "over-subscribed Huffman table")
    }
    def decode(r: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | r.readBit()
        len += 1
        if (maxCode(len) >= 0 && code >= minCode(len) && code <= maxCode(len))
          return syms(valPtr(len) + code - minCode(len))
      }
      throw new IllegalArgumentException("invalid Huffman code in entropy stream")
    }
  }

  /** symbol → (code, length) for encoding, same canonical assignment. */
  private def encoderCodes(counts: Array[Int], values: Array[Int]): Array[Long] = {
    // packed as (code << 8 | len), indexed by symbol (0..255); -1 = absent
    val table = Array.fill[Long](256)(-1L)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < counts(len - 1)) {
        table(values(k)) = (code.toLong << 8) | len
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  // ------------------------------------------------------------------
  // Forward path (encoder)
  // ------------------------------------------------------------------

  /** Separable forward DCT + quantize: a column pass then a row pass
    * (2·8³ multiply-adds per block vs 64² for the direct double sum —
    * the encoder's dominant cost on multi-block fixtures).
    */
  private def fdctQuant(block: Array[Double], quant: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64) // tmp(v,x) = Σ_y block(y,x)·cos(y,v)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) { sum += block(y * 8 + x) * cosBasis(y)(v); y += 1 }
        tmp(v * 8 + x) = sum
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) { sum += tmp(v * 8 + x) * cosBasis(x)(u); x += 1 }
        val f = 0.25 * cNorm(u) * cNorm(v) * sum
        out(v * 8 + u) = Math.round(f / quant(v * 8 + u)).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  /** Per-component sampling factors + level-shifted (−128) component
    * planes at their own resolution (RGB→YCbCr + box-average
    * subsampling for 3-plane input) — shared by the sequential and
    * progressive encoders.
    */
  private def componentPlanes(width: Int, height: Int,
      planes: Array[Array[Int]], hs: Int,
      vs: Int): (Array[(Int, Int)], Array[Array[Double]]) = {
    val nComp = planes.length
    // T.81 convention: Y carries the max so chroma is 1/hs × 1/vs of luma
    val samp: Array[(Int, Int)] =
      if (nComp == 1) Array((1, 1)) else Array((hs, vs), (1, 1), (1, 1))
    val hmax = samp.map(_._1).max
    val vmax = samp.map(_._2).max
    val fullRes: Array[Array[Double]] =
      if (nComp == 1) Array(planes(0).map(_ - 128.0))
      else {
        val (r, g, b) = (planes(0), planes(1), planes(2))
        val y = new Array[Double](width * height)
        val cb = new Array[Double](width * height)
        val cr = new Array[Double](width * height)
        var i = 0
        while (i < width * height) {
          val (rr, gg, bb) = (r(i).toDouble, g(i).toDouble, b(i).toDouble)
          y(i) = 0.299 * rr + 0.587 * gg + 0.114 * bb - 128.0
          cb(i) = -0.168736 * rr - 0.331264 * gg + 0.5 * bb
          cr(i) = 0.5 * rr - 0.418688 * gg - 0.081312 * bb
          i += 1
        }
        Array(y, cb, cr)
      }
    val shifted: Array[Array[Double]] = Array.tabulate(nComp) { c =>
      val (fx, fy) = (hmax / samp(c)._1, vmax / samp(c)._2)
      if (fx == 1 && fy == 1) fullRes(c)
      else {
        val wc = (width * samp(c)._1 + hmax - 1) / hmax
        val hc = (height * samp(c)._2 + vmax - 1) / vmax
        val outp = new Array[Double](wc * hc)
        var yy = 0
        while (yy < hc) {
          var xx = 0
          while (xx < wc) {
            var sum = 0.0
            var n = 0
            var sy = yy * fy
            while (sy < math.min((yy + 1) * fy, height)) {
              var sx = xx * fx
              while (sx < math.min((xx + 1) * fx, width)) {
                sum += fullRes(c)(sy * width + sx)
                n += 1; sx += 1
              }
              sy += 1
            }
            outp(yy * wc + xx) = sum / n
            xx += 1
          }
          yy += 1
        }
        outp
      }
    }
    (samp, shifted)
  }

  private def writeSegment(out: ByteArrayOutputStream, marker: Int,
      payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  /** Encode one or three 8-bit sample planes as a baseline JFIF stream.
    * All components use quant table 0 and Huffman tables 0/0 (legal — the
    * decoder reads table ids from the headers). 3-plane input is R,G,B
    * and is converted to YCbCr here. `chromaSubsample = (2,2)` emits
    * 4:2:0 (chroma box-averaged to half resolution each way), `(2,1)`
    * 4:2:2; grayscale ignores it.
    */
  def encode(width: Int, height: Int, planes: Array[Array[Int]],
      quant: Array[Int] = StdQuantLuma, restartInterval: Int = 0,
      chromaSubsample: (Int, Int) = (1, 1)): Array[Byte] = {
    val nComp = planes.length
    require(nComp == 1 || nComp == 3, s"encode supports 1 or 3 planes, got $nComp")
    require(width > 0 && height > 0 && planes.forall(_.length == width * height),
      "plane size must be width*height")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in [1,255]")
    val (hs, vs) = chromaSubsample
    require((hs == 1 || hs == 2) && (vs == 1 || vs == 2),
      s"chroma subsampling factors must be 1 or 2, got ${hs}x$vs")

    val (samp, shifted) = componentPlanes(width, height, planes, hs, vs)
    val hmax = samp.map(_._1).max
    val vmax = samp.map(_._2).max
    def compW(c: Int): Int = (width * samp(c)._1 + hmax - 1) / hmax
    def compH(c: Int): Int = (height * samp(c)._2 + vmax - 1) / vmax

    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeSegment(out, 0xe0, // APP0 JFIF v1.1, no density/thumbnail
      "JFIF".getBytes(StandardCharsets.US_ASCII) ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xdb, // DQT: Pq=0 (8-bit), Tq=0, zigzag order
      Array(0.toByte) ++ Array.tabulate(64)(i => quant(ZigZag(i)).toByte))
    writeSegment(out, 0xc0, { // SOF0
      val b = Array.newBuilder[Byte]
      b += 8 // precision
      b += ((height >> 8) & 0xff).toByte += (height & 0xff).toByte
      b += ((width >> 8) & 0xff).toByte += (width & 0xff).toByte
      b += nComp.toByte
      var c = 0
      while (c < nComp) {
        b += (c + 1).toByte += ((samp(c)._1 << 4) | samp(c)._2).toByte += 0.toByte
        c += 1
      }
      b.result()
    })
    writeSegment(out, 0xc4, // DHT: DC table 0
      Array(0x00.toByte) ++ StdDcLumaCounts.map(_.toByte) ++ StdDcLumaValues.map(_.toByte))
    writeSegment(out, 0xc4, // DHT: AC table 0
      Array(0x10.toByte) ++ StdAcLumaCounts.map(_.toByte) ++ StdAcLumaValues.map(_.toByte))
    if (restartInterval > 0)
      writeSegment(out, 0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    writeSegment(out, 0xda, { // SOS: all comps use Huffman tables 0/0
      val b = Array.newBuilder[Byte]
      b += nComp.toByte
      var c = 0
      while (c < nComp) { b += (c + 1).toByte += 0x00.toByte; c += 1 }
      b += 0.toByte += 63.toByte += 0.toByte // Ss, Se, Ah/Al
      b.result()
    })

    val dcCodes = encoderCodes(StdDcLumaCounts, StdDcLumaValues)
    val acCodes = encoderCodes(StdAcLumaCounts, StdAcLumaValues)
    def putSym(w: BitWriter, table: Array[Long], sym: Int): Unit = {
      val e = table(sym)
      require(e >= 0, f"symbol 0x$sym%02X not in Huffman table")
      w.put((e >>> 8).toInt, (e & 0xff).toInt)
    }

    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val writer = new BitWriter(out)
    val dcPred = new Array[Int](nComp)
    var rstIdx = 0
    var sinceRestart = 0
    val block = new Array[Double](64)

    def encodeBlock(c: Int, blockX: Int, blockY: Int): Unit = {
      val plane = shifted(c)
      val (wc, hc) = (compW(c), compH(c))
      var y0 = 0
      while (y0 < 8) { // edge blocks replicate the last row/column
        val sy = math.min(blockY * 8 + y0, hc - 1)
        var x0 = 0
        while (x0 < 8) {
          val sx = math.min(blockX * 8 + x0, wc - 1)
          block(y0 * 8 + x0) = plane(sy * wc + sx)
          x0 += 1
        }
        y0 += 1
      }
      val coef = fdctQuant(block, quant)
      val diff = coef(0) - dcPred(c)
      dcPred(c) = coef(0)
      val dcCat = category(diff)
      putSym(writer, dcCodes, dcCat)
      if (dcCat > 0)
        writer.put(if (diff < 0) diff + (1 << dcCat) - 1 else diff, dcCat)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = coef(ZigZag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { putSym(writer, acCodes, 0xf0); run -= 16 } // ZRL
          val size = category(v)
          putSym(writer, acCodes, (run << 4) | size)
          writer.put(if (v < 0) v + (1 << size) - 1 else v, size)
          run = 0
        }
        k += 1
      }
      if (run > 0) putSym(writer, acCodes, 0x00) // EOB
    }

    var m = 0
    while (m < mcusX * mcusY) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        writer.flushWithOnes()
        out.write(0xff); out.write(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
        sinceRestart = 0
      }
      val mx = m % mcusX
      val my = m / mcusX
      var c = 0
      while (c < nComp) { // hc×vc data units per MCU, raster order (A.2.3)
        val (hc, vc) = samp(c)
        var by0 = 0
        while (by0 < vc) {
          var bx0 = 0
          while (bx0 < hc) {
            encodeBlock(c, mx * hc + bx0, my * vc + by0)
            bx0 += 1
          }
          by0 += 1
        }
        c += 1
      }
      sinceRestart += 1
      m += 1
    }
    writer.flushWithOnes()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode as a PROGRESSIVE (SOF2) JFIF stream with the standard
    * successive-approximation scan script: interleaved DC first (Al=1),
    * per-component AC first over 1..63 (Al=1, EOB-run batching), DC
    * refinement, then per-component AC refinement (the correction-bit
    * scan). The quantized coefficients are identical to what
    * [[encode]] emits sequentially, so a conformant decoder
    * reconstructs the two streams bit-identically — which is exactly
    * how JpegSpec pins this encoder/decoder pair against the proven
    * baseline path.
    */
  def encodeProgressive(width: Int, height: Int, planes: Array[Array[Int]],
      quant: Array[Int] = StdQuantLuma,
      chromaSubsample: (Int, Int) = (1, 1)): Array[Byte] = {
    val nComp = planes.length
    require(nComp == 1 || nComp == 3, s"encode supports 1 or 3 planes, got $nComp")
    require(width > 0 && height > 0 && planes.forall(_.length == width * height),
      "plane size must be width*height")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in [1,255]")
    val (hs, vs) = chromaSubsample
    require((hs == 1 || hs == 2) && (vs == 1 || vs == 2),
      s"chroma subsampling factors must be 1 or 2, got ${hs}x$vs")
    val (samp, shifted) = componentPlanes(width, height, planes, hs, vs)
    val hmax = samp.map(_._1).max
    val vmax = samp.map(_._2).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    def compW(c: Int): Int = (width * samp(c)._1 + hmax - 1) / hmax
    def compH(c: Int): Int = (height * samp(c)._2 + vmax - 1) / vmax
    val padW = samp.map(_._1 * mcusX)
    val padH = samp.map(_._2 * mcusY)
    val realW = Array.tabulate(nComp)(c => (compW(c) + 7) / 8)
    val realH = Array.tabulate(nComp)(c => (compH(c) + 7) / 8)

    // all quantized coefficient blocks up front (natural order per
    // block, padded MCU grid — edge blocks replicate, padding blocks
    // replicate the component edge like the sequential path)
    val block = new Array[Double](64)
    val coefArr = Array.tabulate(nComp)(c => new Array[Int](padW(c) * padH(c) * 64))
    for (c <- 0 until nComp; by <- 0 until padH(c); bx <- 0 until padW(c)) {
      val plane = shifted(c)
      val (wc, hc) = (compW(c), compH(c))
      var y0 = 0
      while (y0 < 8) {
        val sy = math.min(by * 8 + y0, hc - 1)
        var x0 = 0
        while (x0 < 8) {
          block(y0 * 8 + x0) = plane(sy * wc + math.min(bx * 8 + x0, wc - 1))
          x0 += 1
        }
        y0 += 1
      }
      System.arraycopy(fdctQuant(block, quant), 0, coefArr(c),
        (by * padW(c) + bx) * 64, 64)
    }

    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    writeSegment(out, 0xe0,
      "JFIF".getBytes(StandardCharsets.US_ASCII) ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xdb,
      Array(0.toByte) ++ Array.tabulate(64)(i => quant(ZigZag(i)).toByte))
    writeSegment(out, 0xc2, { // SOF2
      val b = Array.newBuilder[Byte]
      b += 8
      b += ((height >> 8) & 0xff).toByte += (height & 0xff).toByte
      b += ((width >> 8) & 0xff).toByte += (width & 0xff).toByte
      b += nComp.toByte
      for (c <- 0 until nComp)
        b += (c + 1).toByte += ((samp(c)._1 << 4) | samp(c)._2).toByte += 0.toByte
      b.result()
    })
    writeSegment(out, 0xc4,
      Array(0x00.toByte) ++ StdDcLumaCounts.map(_.toByte) ++ StdDcLumaValues.map(_.toByte))
    writeSegment(out, 0xc4,
      Array(0x10.toByte) ++ ProgAcCounts.map(_.toByte) ++ ProgAcValues.map(_.toByte))
    val dcCodes = encoderCodes(StdDcLumaCounts, StdDcLumaValues)
    val acCodes = encoderCodes(ProgAcCounts, ProgAcValues)

    def sos(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      writeSegment(out, 0xda, {
        val b = Array.newBuilder[Byte]
        b += comps.length.toByte
        comps.foreach(c => b += (c + 1).toByte += 0x00.toByte)
        b += ss.toByte += se.toByte += ((ah << 4) | al).toByte
        b.result()
      })

    def coefAt(c: Int, bi: Int, k: Int): Int = coefArr(c)(bi * 64 + ZigZag(k))

    // ---- scan 1: DC first, interleaved, Al=1 (arithmetic shift) ----
    sos(0 until nComp, 0, 0, 0, 1)
    locally {
      val w = new BitWriter(out)
      val dcPred = new Array[Int](nComp)
      var m = 0
      while (m < mcusX * mcusY) {
        val mx = m % mcusX
        val my = m / mcusX
        for (c <- 0 until nComp; by0 <- 0 until samp(c)._2;
            bx0 <- 0 until samp(c)._1) {
          val bi = (my * samp(c)._2 + by0) * padW(c) + (mx * samp(c)._1 + bx0)
          val v = coefArr(c)(bi * 64) >> 1 // DC point transform: arithmetic
          val diff = v - dcPred(c)
          dcPred(c) = v
          val cat = category(diff)
          val e = dcCodes(cat); w.put((e >>> 8).toInt, (e & 0xff).toInt)
          if (cat > 0)
            w.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
        }
        m += 1
      }
      w.flushWithOnes()
    }

    // ---- per component: AC first 1..63, Al=1 (toward-zero) ----
    for (c <- 0 until nComp) {
      sos(Seq(c), 1, 63, 0, 1)
      val w = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        val e = acCodes(r << 4); w.put((e >>> 8).toInt, (e & 0xff).toInt)
        if (r > 0) w.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      var b = 0
      while (b < realW(c) * realH(c)) {
        val bi = (b / realW(c)) * padW(c) + b % realW(c)
        def tv(k: Int): Int = { // AC point transform: toward zero
          val v = coefAt(c, bi, k)
          if (v >= 0) v >> 1 else -((-v) >> 1)
        }
        var last = 63
        while (last >= 1 && tv(last) == 0) last -= 1
        if (last < 1) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
        else {
          flushEob()
          var run = 0
          var k = 1
          while (k <= last) {
            val v = tv(k)
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val e = acCodes(0xf0); w.put((e >>> 8).toInt, (e & 0xff).toInt)
                run -= 16
              }
              val size = category(v)
              val e = acCodes((run << 4) | size)
              w.put((e >>> 8).toInt, (e & 0xff).toInt)
              w.put(if (v < 0) v + (1 << size) - 1 else v, size)
              run = 0
            }
            k += 1
          }
          if (last < 63) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
        }
        b += 1
      }
      flushEob()
      w.flushWithOnes()
    }

    // ---- DC refinement: Ah=1, Al=0 — one raw bit per block ----
    sos(0 until nComp, 0, 0, 1, 0)
    locally {
      val w = new BitWriter(out)
      var m = 0
      while (m < mcusX * mcusY) {
        val mx = m % mcusX
        val my = m / mcusX
        for (c <- 0 until nComp; by0 <- 0 until samp(c)._2;
            bx0 <- 0 until samp(c)._1) {
          val bi = (my * samp(c)._2 + by0) * padW(c) + (mx * samp(c)._1 + bx0)
          w.put(coefArr(c)(bi * 64) & 1, 1)
        }
        m += 1
      }
      w.flushWithOnes()
    }

    // ---- per component: AC refinement, Ah=1, Al=0 ----
    // correction bits for history-nonzero coefficients buffer until the
    // next symbol (or EOBn flush), mirroring the decoder's walk order
    for (c <- 0 until nComp) {
      sos(Seq(c), 1, 63, 1, 0)
      val w = new BitWriter(out)
      var eobrun = 0
      val pend = scala.collection.mutable.ArrayBuffer.empty[Int]
      def putPend(): Unit = { pend.foreach(w.put(_, 1)); pend.clear() }
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        val e = acCodes(r << 4); w.put((e >>> 8).toInt, (e & 0xff).toInt)
        if (r > 0) w.put(eobrun - (1 << r), r)
        eobrun = 0
        putPend()
      }
      var b = 0
      while (b < realW(c) * realH(c)) {
        val bi = (b / realW(c)) * padW(c) + b % realW(c)
        // last newly-significant position (|v| == 1): beyond it the
        // block contributes only correction bits, batched into the EOB run
        var last = 63
        while (last >= 1 && math.abs(coefAt(c, bi, last)) != 1) last -= 1
        if (last < 1) {
          // no new significance: whole band is history refinement
          var k = 1
          while (k <= 63) {
            val v = coefAt(c, bi, k)
            if (v != 0) pend += (v & 1)
            k += 1
          }
          eobrun += 1
          if (eobrun == 0x7fff) flushEob()
        } else {
          flushEob()
          var run = 0
          var k = 1
          while (k <= last) {
            val v = coefAt(c, bi, k)
            if (math.abs(v) > 1) pend += (v & 1) // history: correction bit
            else if (v == 0) {
              run += 1
              if (run == 16) {
                val e = acCodes(0xf0); w.put((e >>> 8).toInt, (e & 0xff).toInt)
                putPend()
                run = 0
              }
            } else { // |v| == 1: newly significant
              val e = acCodes((run << 4) | 1)
              w.put((e >>> 8).toInt, (e & 0xff).toInt)
              w.put(if (v > 0) 1 else 0, 1)
              putPend()
              run = 0
            }
            k += 1
          }
          // tail: correction bits after the last new coefficient ride
          // with the EOB run
          while (k <= 63) {
            val v = coefAt(c, bi, k)
            if (v != 0) pend += (v & 1)
            k += 1
          }
          // last == 63 ⟹ the final symbol closed the band: no EOB and
          // nothing pended (putPend ran with that symbol)
          if (last < 63) {
            eobrun += 1
            if (eobrun == 0x7fff) flushEob()
          }
        }
        b += 1
      }
      flushEob()
      w.flushWithOnes()
    }

    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private final case class SofComp(id: Int, h: Int, v: Int, tq: Int)

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI marker")
    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0
    var height = 0
    var sofComps: Array[SofComp] = null
    var planes: Array[Array[Int]] = null
    var sawScan = false
    // progressive state: raw quantized coefficients accumulate across
    // scans (natural order per block) on the MCU-PADDED block grid —
    // interleaved DC scans visit padding blocks that non-interleaved AC
    // scans never do; dequant+IDCT of the REAL blocks happens at EOI
    var progressive = false
    var coefs: Array[Array[Int]] = null
    var padBW: Array[Int] = null // padded grid width (blocks) per comp
    var realBW: Array[Int] = null
    var realBH: Array[Int] = null

    def u16(at: Int): Int = {
      require(at + 1 < bytes.length, "JPEG truncated in segment header")
      ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    }
    // Every marker-segment parse below indexes within [pos, pos+len); a
    // truncated stream must fail this single guard, not an array access.
    def segLen(at: Int): Int = {
      val len = u16(at)
      require(len >= 2 && at + len <= bytes.length,
        s"JPEG truncated inside marker segment (declared $len bytes at $at)")
      len
    }

    var pos = 2
    var done = false
    while (!done) {
      require(pos + 1 < bytes.length, "JPEG truncated before EOI")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at offset $pos")
      // fill bytes (bounded: a stream of trailing 0xFF must not run off
      // the array)
      while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      require(pos + 1 < bytes.length, "JPEG truncated in marker fill bytes")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => done = true // EOI
        case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
          () // standalone markers: no payload
        case sofM @ (0xc0 | 0xc1 | 0xc2) => // baseline/extended/progressive
          require(sofComps == null, "duplicate SOF marker")
          progressive = sofM == 0xc2
          val len = segLen(pos)
          require(len >= 8, "malformed SOF segment (too short for header)")
          require((bytes(pos + 2) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(pos + 3)
          width = u16(pos + 5)
          val n = bytes(pos + 7) & 0xff
          require(n == 1 || n == 3, s"unsupported component count $n (1 or 3)")
          require(width > 0 && height > 0, "zero image dimension")
          // hostile-header allocation bound: 16-bit dims can claim up to
          // 65535² ≈ 4.3e9 pixels, overflowing the Int plane-size math
          // below and demanding multi-GB arrays — reject before either
          require(width.toLong * height <= MaxPixels,
            s"image too large (${width}x$height > $MaxPixels pixels)")
          require(len == 8 + 3 * n, "malformed SOF segment length")
          sofComps = Array.tabulate(n) { i =>
            val o = pos + 8 + 3 * i
            val sampling = bytes(o + 1) & 0xff
            val (h, v) = (sampling >> 4, sampling & 15)
            require(Set(1, 2, 4)(h) && Set(1, 2, 4)(v),
              f"unsupported sampling factors 0x$sampling%02X (H,V must be 1, 2 or 4)")
            val tq = bytes(o + 2) & 0xff
            require(tq <= 3, s"bad quant table id $tq in SOF")
            // single-component scans are non-interleaved (T.81 A.2.2):
            // data units raster over the component alone, so declared
            // sampling factors do not shape the scan — normalize to 1×1
            if (n == 1) SofComp(bytes(o) & 0xff, 1, 1, tq)
            else SofComp(bytes(o) & 0xff, h, v, tq)
          }
          val hmax = sofComps.map(_.h).max
          val vmax = sofComps.map(_.v).max
          require(sofComps.forall(c => hmax % c.h == 0 && vmax % c.v == 0),
            "component sampling factors must divide the maxima")
          // each component decodes at its OWN resolution
          // ceil(width·h/hmax) × ceil(height·v/vmax), upsampled at the end
          planes = sofComps.map { c =>
            new Array[Int](
              ((width.toLong * c.h + hmax - 1) / hmax).toInt *
                ((height.toLong * c.v + vmax - 1) / vmax).toInt)
          }
          if (progressive) {
            val mcX = (width + 8 * hmax - 1) / (8 * hmax)
            val mcY = (height + 8 * vmax - 1) / (8 * vmax)
            padBW = sofComps.map(c => mcX * c.h)
            realBW = sofComps.map(c =>
              ((width * c.h + hmax - 1) / hmax + 7) / 8)
            realBH = sofComps.map(c =>
              ((height * c.v + vmax - 1) / vmax + 7) / 8)
            coefs = sofComps.indices.map(ci =>
              new Array[Int](padBW(ci) * (mcY * sofComps(ci).v) * 64)).toArray
          }
          pos += len
        case m if (m >= 0xc3 && m <= 0xcf) && m != 0xc4 && m != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported SOF type 0xFF$m%02X (baseline sequential Huffman only)")
        case 0xc4 => // DHT: one or more tables per segment
          val len = segLen(pos)
          var o = pos + 2
          while (o < pos + len) {
            val tcTh = bytes(o) & 0xff
            val tc = tcTh >> 4
            val th = tcTh & 15
            require(tc <= 1 && th <= 3, f"bad DHT id 0x$tcTh%02X")
            require(o + 17 <= pos + len, "DHT counts overrun segment")
            val counts = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val nv = counts.sum
            require(o + 17 + nv <= pos + len, "DHT overruns segment")
            val values = Array.tabulate(nv)(i => bytes(o + 17 + i) & 0xff)
            val t = new HuffTable(counts, values)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            o += 17 + nv
          }
          pos += len
        case 0xdb => // DQT: one or more tables per segment
          val len = segLen(pos)
          var o = pos + 2
          while (o < pos + len) {
            val pqTq = bytes(o) & 0xff
            require(pqTq >> 4 == 0, "16-bit quant tables not supported (8-bit only)")
            val tq = pqTq & 15
            require(tq <= 3 && o + 65 <= pos + len, "malformed DQT")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(ZigZag(i)) = bytes(o + 1 + i) & 0xff; i += 1 }
            quantTables(tq) = t
            o += 65
          }
          pos += len
        case 0xdd => // DRI
          require(segLen(pos) == 4, "malformed DRI")
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xda => // SOS, then entropy data
          require(sofComps != null, "SOS before SOF")
          val len = segLen(pos)
          require(len >= 3, "malformed SOS segment (too short)")
          val ns = bytes(pos + 2) & 0xff
          require(ns >= 1, "SOS declares zero scan components")
          require(len == 6 + 2 * ns, "malformed SOS segment length")
          val scanTables = Array.tabulate(ns) { i =>
            val o = pos + 3 + 2 * i
            val id = bytes(o) & 0xff
            val ci = sofComps.indexWhere(_.id == id)
            require(ci >= 0, s"scan references unknown component id $id")
            val tdTa = bytes(o + 1) & 0xff
            require((tdTa >> 4) <= 3 && (tdTa & 15) <= 3,
              f"bad Huffman table ids 0x$tdTa%02X in SOS")
            (ci, tdTa >> 4, tdTa & 15)
          }
          val ssOff = pos + 3 + 2 * ns
          val ss = bytes(ssOff) & 0xff
          val se = bytes(ssOff + 1) & 0xff
          val ah = (bytes(ssOff + 2) & 0xff) >> 4
          val al = bytes(ssOff + 2) & 15
          pos += len
          if (!progressive) {
            require(ns == sofComps.length,
              s"scan must cover all $ns components (single interleaved scan only)")
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "non-baseline spectral selection / successive approximation")
            pos = decodeScan(bytes, pos, width, height, sofComps, scanTables,
              quantTables, dcTables, acTables, restartInterval, planes)
          } else {
            // T.81 G.1.1: DC scans have Ss=Se=0 and may interleave; AC
            // scans cover one component over a Ss..Se band; refinement
            // scans step Al down one bit at a time
            if (ss == 0) require(se == 0, "progressive DC scan must have Se=0")
            else require(ns == 1 && ss <= se && se <= 63,
              s"progressive AC scan must be single-component, got Ss=$ss Se=$se ns=$ns")
            require(al <= 13 && (ah == 0 || ah == al + 1),
              s"bad successive approximation Ah=$ah Al=$al")
            pos = decodeProgScan(bytes, pos, width, height, sofComps,
              scanTables, dcTables, acTables, restartInterval,
              coefs, padBW, realBW, realBH, ss, se, ah, al)
          }
          sawScan = true
        case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => // APPn / COM
          pos += segLen(pos)
        case m =>
          throw new IllegalArgumentException(f"unsupported JPEG marker 0xFF$m%02X")
      }
    }
    // must be a SCAN flag, not `planes != null`: SOF alone allocates the
    // planes, and headers-without-SOS would otherwise decode to a silent
    // all-zero image
    require(sawScan, "JPEG contained no image scan")

    if (progressive) {
      // every scan has accumulated its band/bits; dequantize and IDCT
      // the REAL blocks (padding blocks only ever held DC bits no pixel
      // maps to)
      val hmax = sofComps.map(_.h).max
      val vmax = sofComps.map(_.v).max
      val coefNat = new Array[Int](64)
      var ci = 0
      while (ci < sofComps.length) {
        val quant = quantTables(sofComps(ci).tq)
        require(quant != null, "progressive stream missing quant table")
        val cw = (width * sofComps(ci).h + hmax - 1) / hmax
        val chh = (height * sofComps(ci).v + vmax - 1) / vmax
        var by = 0
        while (by < realBH(ci)) {
          var bx = 0
          while (bx < realBW(ci)) {
            val base = (by * padBW(ci) + bx) * 64
            var j = 0
            while (j < 64) { coefNat(j) = coefs(ci)(base + j) * quant(j); j += 1 }
            idctInto(coefNat, planes(ci), cw, chh, bx, by)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
    }

    if (sofComps.length == 1) Image(width, height, 1, planes)
    else { // upsample subsampled components (sample replication), then
      // JFIF YCbCr → RGB
      val hmax = sofComps.map(_.h).max
      val vmax = sofComps.map(_.v).max
      def up(ci: Int): Array[Int] = {
        val c = sofComps(ci)
        val (fx, fy) = (hmax / c.h, vmax / c.v)
        if (fx == 1 && fy == 1) planes(ci)
        else {
          val wc = (width * c.h + hmax - 1) / hmax
          val outp = new Array[Int](width * height)
          var yy = 0
          while (yy < height) {
            val srcRow = (yy / fy) * wc
            var xx = 0
            while (xx < width) {
              outp(yy * width + xx) = planes(ci)(srcRow + xx / fx)
              xx += 1
            }
            yy += 1
          }
          outp
        }
      }
      val (y, cb, cr) = (up(0), up(1), up(2))
      val r = new Array[Int](width * height)
      val g = new Array[Int](width * height)
      val b = new Array[Int](width * height)
      var i = 0
      while (i < width * height) {
        val yy = y(i).toDouble
        val cbv = cb(i) - 128.0
        val crv = cr(i) - 128.0
        r(i) = clamp8(Math.round(yy + 1.402 * crv).toInt)
        g(i) = clamp8(Math.round(yy - 0.344136 * cbv - 0.714136 * crv).toInt)
        b(i) = clamp8(Math.round(yy + 1.772 * cbv).toInt)
        i += 1
      }
      Image(width, height, 3, Array(r, g, b))
    }
  }

  /** Index the complete JPEG frames inside a concatenated (MJPEG-style)
    * stream WITHOUT decoding them: returns the [start, end) byte range of
    * each SOI…EOI image. This is the container-index step of a video
    * frame-sampler — a single O(n) byte walk (segment lengths skipped by
    * their declared size, entropy data scanned for the next non-stuffed,
    * non-RST marker per T.81 B.1.1.5) with no Huffman, IDCT or allocation
    * per frame — so sampling k of n frames costs the full scan ONCE plus
    * k decodes, never n decodes. A naive search for the EOI byte pair
    * would misfire on 0xFFD9 inside a segment payload (e.g. a comment);
    * walking the declared lengths is the correct general scan.
    */
  def frameRanges(bytes: Array[Byte]): Array[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      require(pos + 1 < bytes.length &&
        (bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) == 0xd8,
        s"expected SOI at frame boundary $pos")
      pos += 2
      var done = false
      while (!done) {
        require(pos + 1 < bytes.length, s"frame at $start truncated before EOI")
        require((bytes(pos) & 0xff) == 0xff, f"expected marker at offset $pos")
        while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
        require(pos + 1 < bytes.length, "truncated in marker fill bytes")
        val marker = bytes(pos + 1) & 0xff
        pos += 2
        marker match {
          case 0xd9 => done = true // EOI: frame complete
          case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) => ()
          case 0xda => // SOS: skip header, then entropy data to next marker
            require(pos + 1 < bytes.length, "truncated in SOS header")
            val len = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
            require(len >= 2 && pos + len <= bytes.length,
              s"truncated inside SOS segment at $pos")
            pos += len
            var scanning = true
            while (scanning) {
              require(pos + 1 < bytes.length, "entropy data truncated before EOI")
              if ((bytes(pos) & 0xff) == 0xff) {
                val nxt = bytes(pos + 1) & 0xff
                // 0xFF00 = stuffed data byte; 0xFFD0-D7 = restart marker,
                // both stay inside the scan; anything else ends it
                if (nxt == 0x00 || (nxt >= 0xd0 && nxt <= 0xd7)) pos += 2
                else scanning = false
              } else pos += 1
            }
          case m =>
            // 0x00 only legally appears as a stuffed byte inside entropy
            // data, 0xD8 is SOI (illegal mid-frame), 0xFF is fill — none
            // carries a length. Treating them as segments would silently
            // mis-index a corrupt stream that decode() rejects loudly.
            require(m != 0x00 && m != 0xd8 && m != 0xff,
              f"invalid marker 0xFF$m%02X inside frame")
            // every other marker carries a length-prefixed payload
            require(pos + 1 < bytes.length, "truncated in segment header")
            val len = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
            require(len >= 2 && pos + len <= bytes.length,
              s"truncated inside marker segment at $pos")
            pos += len
        }
      }
      out += ((start, pos))
    }
    out.toArray
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Decode the interleaved MCU stream; returns the offset just past the
    * entropy-coded data (pointing at the next marker).
    */
  private def decodeScan(bytes: Array[Byte], start: Int, width: Int, height: Int,
      sofComps: Array[SofComp], scanTables: Array[(Int, Int, Int)],
      quantTables: Array[Array[Int]], dcTables: Array[HuffTable],
      acTables: Array[HuffTable], restartInterval: Int,
      planes: Array[Array[Int]]): Int = {
    val reader = new BitReader(bytes, start)
    val hmax = sofComps.map(_.h).max
    val vmax = sofComps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component decoded resolution
    val compW = sofComps.map(c => (width * c.h + hmax - 1) / hmax)
    val compH = sofComps.map(c => (height * c.v + vmax - 1) / vmax)
    val dcPred = new Array[Int](sofComps.length)
    val coef = new Array[Int](64)

    def decodeBlock(ci: Int, td: Int, ta: Int, blockX: Int, blockY: Int): Unit = {
      val dcT = dcTables(td)
      val acT = acTables(ta)
      val quant = quantTables(sofComps(ci).tq)
      require(dcT != null && acT != null && quant != null,
        "scan references an undefined Huffman/quant table")
      java.util.Arrays.fill(coef, 0)
      val dcCat = dcT.decode(reader)
      require(dcCat <= 11, s"invalid DC category $dcCat")
      dcPred(ci) += extend(reader.receive(dcCat), dcCat)
      coef(0) = dcPred(ci) * quant(0)
      var k = 1
      while (k < 64) {
        val rs = acT.decode(reader)
        val run = rs >> 4
        val size = rs & 15
        if (size == 0) {
          if (run == 15) k += 16 // ZRL: 16 zeros
          else k = 64 // EOB
        } else {
          k += run
          require(k < 64, "AC coefficient index overruns block")
          val zz = ZigZag(k)
          coef(zz) = extend(reader.receive(size), size) * quant(zz)
          k += 1
        }
      }
      idctInto(coef, planes(ci), compW(ci), compH(ci), blockX, blockY)
    }

    var rstIdx = 0
    var sinceRestart = 0
    var m = 0
    while (m < mcusX * mcusY) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        reader.restart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
        sinceRestart = 0
      }
      val mx = m % mcusX
      val my = m / mcusX
      var s = 0
      while (s < scanTables.length) {
        val (ci, td, ta) = scanTables(s)
        val (hc, vc) = (sofComps(ci).h, sofComps(ci).v)
        var by0 = 0 // hc×vc data units per MCU, raster order (A.2.3)
        while (by0 < vc) {
          var bx0 = 0
          while (bx0 < hc) {
            decodeBlock(ci, td, ta, mx * hc + bx0, my * vc + by0)
            bx0 += 1
          }
          by0 += 1
        }
        s += 1
      }
      sinceRestart += 1
      m += 1
    }
    reader.pos
  }

  /** One progressive scan (T.81 G.2): accumulates raw quantized
    * coefficients into `coefs` (natural order per block, MCU-padded row
    * stride). Four scan kinds: DC first (diff-coded, <<Al), DC refine
    * (one bit per block), AC first (EOB-run + (run,size) over the
    * Ss..Se band, <<Al), AC refine (the correction-bit walk: every
    * already-nonzero coefficient in the band consumes a bit, newly
    * significant ones appear as ±1<<Al). Returns the new byte position.
    */
  private def decodeProgScan(bytes: Array[Byte], start: Int, width: Int,
      height: Int, sofComps: Array[SofComp],
      scanTables: Array[(Int, Int, Int)], dcTables: Array[HuffTable],
      acTables: Array[HuffTable], restartInterval: Int,
      coefs: Array[Array[Int]], padBW: Array[Int], realBW: Array[Int],
      realBH: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Int = {
    val reader = new BitReader(bytes, start)
    val dcPred = new Array[Int](sofComps.length)
    var eobrun = 0
    var rstIdx = 0
    var sinceRestart = 0

    def maybeRestart(): Unit =
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        reader.restart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
        sinceRestart = 0
      }

    def decodeDc(ci: Int, td: Int, bi: Int): Unit = {
      val arr = coefs(ci)
      if (ah == 0) {
        val dcT = dcTables(td)
        require(dcT != null, "DC scan references an undefined Huffman table")
        val cat = dcT.decode(reader)
        require(cat <= 11, s"invalid DC category $cat")
        dcPred(ci) += extend(reader.receive(cat), cat)
        arr(bi * 64) = dcPred(ci) << al
      } else if (reader.receive(1) == 1) {
        arr(bi * 64) |= 1 << al
      }
    }

    def refineNonzero(arr: Array[Int], j: Int): Unit =
      if (reader.receive(1) == 1 && (arr(j) & (1 << al)) == 0)
        arr(j) += (if (arr(j) >= 0) 1 << al else -(1 << al))

    def decodeAcFirst(ci: Int, ta: Int, bi: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val acT = acTables(ta)
      require(acT != null, "AC scan references an undefined Huffman table")
      val arr = coefs(ci)
      val base = bi * 64
      var k = ss
      while (k <= se) {
        val rs = acT.decode(reader)
        val run = rs >> 4
        val size = rs & 15
        if (size == 0) {
          if (run == 15) { // ZRL: 16 zeros must fit in the band
            k += 16
            require(k <= se + 1, "ZRL overruns the scan band")
          } else {
            eobrun = (1 << run) - 1
            if (run > 0) eobrun += reader.receive(run)
            k = se + 1 // EOBn ends this block, run covers the next ones
          }
        } else {
          k += run
          require(k <= se, "AC coefficient index overruns the scan band")
          arr(base + ZigZag(k)) = extend(reader.receive(size), size) << al
          k += 1
        }
      }
    }

    def decodeAcRefine(ci: Int, ta: Int, bi: Int): Unit = {
      val arr = coefs(ci)
      val base = bi * 64
      var k = ss
      if (eobrun > 0) {
        eobrun -= 1
        while (k <= se) { // correction bits only
          val j = base + ZigZag(k)
          if (arr(j) != 0) refineNonzero(arr, j)
          k += 1
        }
        return
      }
      val acT = acTables(ta)
      require(acT != null, "AC scan references an undefined Huffman table")
      while (k <= se) {
        val rs = acT.decode(reader)
        var run = rs >> 4
        val size = rs & 15
        var newVal = 0
        if (size == 0) {
          if (run != 15) { // EOBn: refine the rest of the band, then run
            eobrun = (1 << run) - 1
            if (run > 0) eobrun += reader.receive(run)
            while (k <= se) {
              val j = base + ZigZag(k)
              if (arr(j) != 0) refineNonzero(arr, j)
              k += 1
            }
            return
          } // run == 15: ZRL — skip 16 zero-history positions
        } else {
          require(size == 1, "AC refinement magnitude must be 1")
          newVal = if (reader.receive(1) == 1) 1 << al else -(1 << al)
        }
        // advance past `run` zero-history positions (refining nonzeros
        // on the way), then place the new coefficient if any
        var placed = false
        while (!placed && k <= se) {
          val j = base + ZigZag(k)
          if (arr(j) != 0) refineNonzero(arr, j)
          else if (run == 0) {
            if (newVal != 0) arr(j) = newVal
            placed = true
          } else run -= 1
          k += 1
        }
        // every legal symbol resolves within the band: a (run,1) places
        // its coefficient, a ZRL's 16th zero sets placed with no write
        require(placed, "AC refinement run overran the band")
      }
    }

    if (ss == 0) {
      // DC scan: interleaved over MCUs when multi-component (T.81
      // A.2.3), else the component's own real block grid (A.2.2)
      if (scanTables.length > 1) {
        val hmax = sofComps.map(_.h).max
        val vmax = sofComps.map(_.v).max
        val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
        val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
        var m = 0
        while (m < mcusX * mcusY) {
          maybeRestart()
          val mx = m % mcusX
          val my = m / mcusX
          var s = 0
          while (s < scanTables.length) {
            val (ci, td, _) = scanTables(s)
            val (hc, vc) = (sofComps(ci).h, sofComps(ci).v)
            var by0 = 0
            while (by0 < vc) {
              var bx0 = 0
              while (bx0 < hc) {
                decodeDc(ci, td,
                  (my * vc + by0) * padBW(ci) + (mx * hc + bx0))
                bx0 += 1
              }
              by0 += 1
            }
            s += 1
          }
          sinceRestart += 1
          m += 1
        }
      } else {
        // single-component DC scan of a subsampled comp: own real grid
        val (ci, td, _) = scanTables(0)
        var b = 0
        while (b < realBW(ci) * realBH(ci)) {
          maybeRestart()
          decodeDc(ci, td, (b / realBW(ci)) * padBW(ci) + b % realBW(ci))
          sinceRestart += 1
          b += 1
        }
      }
    } else {
      // AC scan: always the single component's real block grid
      val (ci, _, ta) = scanTables(0)
      var b = 0
      while (b < realBW(ci) * realBH(ci)) {
        maybeRestart()
        val bi = (b / realBW(ci)) * padBW(ci) + b % realBW(ci)
        if (ah == 0) decodeAcFirst(ci, ta, bi)
        else decodeAcRefine(ci, ta, bi)
        sinceRestart += 1
        b += 1
      }
    }
    reader.pos
  }

  /** Separable double IDCT (T.81 A.3.3) + level shift + clamp, written
    * into the plane with edge clipping for partial boundary blocks.
    * Column pass over v, then row pass over u; all-zero coefficient
    * columns are skipped, so EOB-truncated blocks (DC-only in the
    * fixtures) cost one column pass instead of a full double sum.
    */
  private def idctInto(coef: Array[Int], plane: Array[Int], width: Int,
      height: Int, bx: Int, by: Int): Unit = {
    val tmp = new Array[Double](64) // tmp(y0,u) = Σ_v cNorm(v)·coef(v,u)·cos(y0,v)
    var u = 0
    while (u < 8) {
      var nz = false
      var v = 0
      while (v < 8 && !nz) { nz = coef(v * 8 + u) != 0; v += 1 }
      if (nz) { // fresh tmp is zero-initialized, so skipped columns stay 0
        var y0 = 0
        while (y0 < 8) {
          var sum = 0.0
          v = 0
          while (v < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) sum += cNorm(v) * f * cosBasis(y0)(v)
            v += 1
          }
          tmp(y0 * 8 + u) = sum
          y0 += 1
        }
      }
      u += 1
    }
    var y0 = 0
    while (y0 < 8) {
      val py = by * 8 + y0
      if (py < height) {
        var x0 = 0
        while (x0 < 8) {
          val px = bx * 8 + x0
          if (px < width) {
            var sum = 0.0
            u = 0
            while (u < 8) {
              val t = tmp(y0 * 8 + u)
              if (t != 0.0) sum += cNorm(u) * t * cosBasis(x0)(u)
              u += 1
            }
            plane(py * width + px) = clamp8(Math.round(0.25 * sum + 128.0).toInt)
          }
          x0 += 1
        }
      }
      y0 += 1
    }
  }
}
