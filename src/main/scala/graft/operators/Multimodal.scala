package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY C12): media as opaque BinaryType
  * columns + typed metadata, with decode / feature-extraction plumbing.
  *
  * Five REAL codecs run this plumbing end to end — [[Utf8TextCodec]]
  * (strict UTF-8 decode + repair), [[BmpCodec]] (24-bpp uncompressed
  * BMP, pure JVM), [[WavCodec]] (RIFF/WAVE PCM16, pure JVM),
  * [[JpegCodec]] (baseline JPEG: Huffman entropy decode + IDCT, pure JVM
  * — see [[Jpeg]]) and [[PngCodec]] (chunk walk + CRC + real DEFLATE +
  * all five scanline filters — see [[Png]]) — plus REAL video
  * frame-sampling over MJPEG streams ([[sampleVideoFrames]]: marker-aware
  * frame index, selective decode) and REAL inter-frame video via the
  * animated-GIF codec ([[GifCodec]]/[[Gif]]: LZW, interlace, disposal
  * compositing), and REAL lossless compressed audio via [[Flac]]
  * (FIXED/LPC prediction, Rice residuals, MD5-verified).
  * Motion-compensated entropy-coded video (H.264-class) and
  * psychoacoustic lossy audio (MP3-class) stay behind [[StubCodec]] —
  * those codec libraries are not in this environment —
  * but everything Spark-side is identical across all of them: the schema
  * contract, the partition-preserving mapPartitions execution (the Scala
  * analog of a Pandas-UDF `mapInPandas` batch loop: one decoder
  * instantiation per partition, streamed row batches, no driver
  * collection), and deterministic features that tests and oracles pin.
  *
  * Generalizes the reference's attachment handling (contentType/size/url —
  * assay.py:123-140) from metadata-only to content-bearing columns.
  */
object Multimodal {

  /** Decoded-feature schema: what a real image/audio decoder would emit. */
  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("header_hex", StringType),
    StructField("digest", StringType),
    StructField("n_chunks", LongType)))

  /** Pluggable per-partition decoder: `featureType` is the emitted struct,
    * `decode` runs once per blob inside mapPartitions. Implementations are
    * serializable closures shipped to executors; heavyweight codec state
    * belongs in a lazy field so it initializes once per partition, not per
    * row (the mapInPandas iterator contract, JVM-side).
    */
  trait MediaCodec extends Serializable {
    def featureType: StructType
    def decode(bytes: Array[Byte]): Row
  }

  /** STUB decoder — deterministic fake standing in for e.g. JPEG decode +
    * feature extraction (image/audio codecs are not in this environment).
    */
  object StubCodec extends MediaCodec {
    override val featureType: StructType = featureSchema
    override def decode(bytes: Array[Byte]): Row = decodeStub(bytes)
  }

  /** A REAL codec: strict UTF-8 decode with malformed-input detection and
    * replacement-character repair — the text-modality analog of an image
    * decode (bytes in, validated/normalized content + features out).
    */
  object Utf8TextCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("n_chars", LongType),
      StructField("n_lines", LongType),
      StructField("valid_utf8", BooleanType),
      StructField("digest", StringType)))

    override def decode(bytes: Array[Byte]): Row = {
      import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
      val strict = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val (text, valid) =
        try (strict.decode(java.nio.ByteBuffer.wrap(bytes)).toString, true)
        catch {
          case _: CharacterCodingException =>
            (new String(bytes, StandardCharsets.UTF_8), false) // U+FFFD repair
        }
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(bytes).map("%02x".format(_)).mkString
      Row(bytes.length.toLong, text.length.toLong,
        (text.count(_ == '\n') + 1).toLong, valid, digest)
    }
  }

  /** A REAL image codec: 24-bpp uncompressed Windows BMP
    * (BITMAPINFOHEADER), pure JVM — validates the magic, reads the
    * little-endian header, walks the 4-byte-padded pixel rows (bottom-up
    * or top-down), and emits dimensions + exact per-channel means. Paired
    * with [[bmpEncodeGray]]/[[withBmpColumn]] so pipelines without real
    * media can synthesize valid bitmaps deterministically from existing
    * columns and still oracle-check the decoded features.
    */
  object BmpCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bpp", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))

    override def decode(bytes: Array[Byte]): Row = {
      import java.nio.{ByteBuffer, ByteOrder}
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP: bad magic/size")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dataOffset = buf.getInt(10)
      val width = buf.getInt(18)
      val rawHeight = buf.getInt(22) // negative = top-down row order
      val bpp = buf.getShort(28).toInt
      val compression = buf.getInt(30)
      require(bpp == 24 && compression == 0,
        s"unsupported BMP variant: bpp=$bpp compression=$compression")
      // Validate header ints BEFORE any size arithmetic: a hostile
      // dataOffset/width/height must fail this require, not overflow into
      // a passing bound or an ArrayIndexOutOfBounds.
      require(dataOffset >= 54 && width > 0 && rawHeight != 0 &&
        rawHeight != Int.MinValue,
        s"malformed BMP header: dataOffset=$dataOffset width=$width height=$rawHeight")
      val height = math.abs(rawHeight)
      val rowSizeL = ((width.toLong * 3 + 3) / 4) * 4 // BGR rows pad to 4 bytes
      // rowSizeL <= bytes.length first: caps rowSizeL*height at 2^62, so the
      // truncation bound itself cannot overflow Long.
      require(rowSizeL <= bytes.length &&
        bytes.length >= dataOffset.toLong + rowSizeL * height,
        "truncated BMP pixel array")
      val rowSize = rowSizeL.toInt // fits: rowSizeL <= bytes.length <= Int.MaxValue
      var sr, sg, sb = 0L
      var y = 0
      while (y < height) { // channel means are row-order invariant
        val row = dataOffset + y * rowSize
        var x = 0
        while (x < width) {
          val p = row + x * 3
          sb += bytes(p) & 0xff
          sg += bytes(p + 1) & 0xff
          sr += bytes(p + 2) & 0xff
          x += 1
        }
        y += 1
      }
      val n = width.toLong * height
      Row(width, height, bpp,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }
  }

  /** A REAL audio codec: RIFF/WAVE PCM 16-bit, pure JVM — validates the
    * RIFF/WAVE magic, walks the word-aligned chunk list to `fmt ` and
    * `data`, and emits sample rate / channel count / frame count /
    * duration plus exact per-channel RMS. Mono and stereo are supported
    * (`rms_r` = 0.0 for mono). RMS sums squares in Long (16-bit samples:
    * at most 2^30 per frame — exact), divides by the dyadic frame count
    * and takes one IEEE-correctly-rounded sqrt, so an oracle that replays
    * the same integer samples reproduces the doubles bit-for-bit.
    */
  object WavCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_s", DoubleType),
      StructField("rms_l", DoubleType),
      StructField("rms_r", DoubleType)))

    override def decode(bytes: Array[Byte]): Row = {
      import java.nio.{ByteBuffer, ByteOrder}
      require(bytes.length >= 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a WAV: bad RIFF/WAVE magic")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      // Chunk walk: id(4) + size(4LE) + payload, padded to 2-byte words.
      var off = 12
      var fmtOff, dataOff, dataSize = -1
      while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = buf.getInt(off + 4)
        require(size >= 0 && off + 8L + size <= bytes.length,
          s"truncated WAV chunk '$id': size=$size at offset=$off")
        if (id == "fmt ") {
          require(size >= 16, s"WAV fmt chunk too short: $size bytes")
          fmtOff = off + 8
        }
        else if (id == "data") { dataOff = off + 8; dataSize = size }
        off += 8 + size + (size & 1) // odd-sized chunks pad one byte
      }
      require(fmtOff >= 0 && dataOff >= 0, "WAV missing fmt/data chunk")
      val audioFormat = buf.getShort(fmtOff).toInt
      val channels = buf.getShort(fmtOff + 2).toInt
      val sampleRate = buf.getInt(fmtOff + 4)
      val bits = buf.getShort(fmtOff + 14).toInt
      require(audioFormat == 1 && bits == 16,
        s"unsupported WAV variant: format=$audioFormat bits=$bits (PCM16 only)")
      require(channels >= 1 && channels <= 2 && sampleRate > 0,
        s"malformed WAV fmt: channels=$channels rate=$sampleRate")
      val blockAlign = channels * 2
      val nFrames = (dataSize / blockAlign).toLong
      var sqL, sqR = 0L
      var f = 0
      while (f < nFrames) {
        val base = dataOff + f * blockAlign
        val l = buf.getShort(base).toLong
        sqL += l * l
        if (channels == 2) {
          val r = buf.getShort(base + 2).toLong
          sqR += r * r
        }
        f += 1
      }
      def rms(sq: Long): Double =
        if (nFrames == 0) 0.0 else math.sqrt(sq.toDouble / nFrames)
      Row(sampleRate, channels, bits, nFrames,
        nFrames.toDouble / sampleRate, rms(sqL),
        if (channels == 2) rms(sqR) else 0.0)
    }
  }

  /** A REAL compressed-image codec: baseline JPEG (see [[Jpeg]] — marker
    * walk, DQT/DHT table parse, Huffman entropy decode with byte
    * destuffing and restart intervals, dequantize, IDCT, JFIF YCbCr→RGB).
    * Emits dimensions + per-channel means, mirroring [[BmpCodec]] (for
    * grayscale all three means are the gray mean). Paired with
    * [[withJpegColumn]] so the `mm_jpeg` oracle can replay the decoded
    * values from the md5 digest alone.
    */
  object JpegCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("components", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))

    override def decode(bytes: Array[Byte]): Row = {
      val img = Jpeg.decode(bytes)
      val n = img.width.toLong * img.height
      def mean(p: Array[Int]): Double = {
        var s = 0L
        var i = 0
        while (i < p.length) { s += p(i); i += 1 }
        s.toDouble / n
      }
      val (mr, mg, mb) =
        if (img.nComp == 1) { val m = mean(img.planes(0)); (m, m, m) }
        else (mean(img.planes(0)), mean(img.planes(1)), mean(img.planes(2)))
      Row(img.width, img.height, img.nComp, mr, mg, mb)
    }
  }

  /** A REAL lossless compressed-image codec: PNG (see [[Png]] — chunk
    * walk with CRC verification, JDK-Inflater DEFLATE, all five scanline
    * filters). Emits dimensions + per-channel means like [[BmpCodec]]
    * (grayscale reports the gray mean in all three channels). PNG decode
    * is bit-exact by construction, so with [[withPngColumn]] fixtures the
    * oracle replays the means from the md5 digest with no numerical
    * argument needed — the value check covers the container, the zlib
    * stream and every filter reconstruction path.
    */
  object PngCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))

    override def decode(bytes: Array[Byte]): Row = {
      val img = Png.decode(bytes)
      val n = img.width.toLong * img.height
      val sums = new Array[Long](img.channels)
      var i = 0
      // sample() abstracts the depth: 8-bit means stay 0..255, 16-bit
      // means report in the native 0..65535 sample scale
      while (i < img.nSamples) {
        sums(i % img.channels) += img.sample(i)
        i += 1
      }
      // color means only — the alpha channel (2nd of gray+alpha, 4th of
      // RGBA) never contributes to mean_r/g/b
      val (mr, mg, mb) = img.channels match {
        case 1 | 2 => val m = sums(0).toDouble / n; (m, m, m)
        case _ =>
          (sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
      }
      Row(img.width, img.height, img.channels, mr, mg, mb)
    }
  }

  /** Synthesize a valid PNG `media` column: a 2×8 grayscale image whose
    * 16 pixels are the md5(text) digest bytes, with the scanline filter
    * cycling 0→4 down the 8 rows so the decode exercises None, Sub, Up,
    * Average and Paeth (each at least once) on every single document.
    * Lossless ⇒ the decoded mean is exactly Σ(digest bytes)/16, which
    * the oracle replays from the hex digest alone.
    */
  def withPngColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs)(dg => Png.encode(2, 8, 1, dg))

  /** Synthesize an Adam7-INTERLACED RGBA PNG `media` column: 2×8 pixels
    * where pixel i carries (g(i), 255−g(i), g(i) xor 0x55, i·17) — the
    * alpha plane varies but must never reach the color means. Interlace
    * + alpha + all five filters in one stream; every decoded mean
    * replays from the hex digest (xor included — DuckDB has xor()).
    */
  def withPngRgbaColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs) { dg =>
      val px = new Array[Byte](16 * 4)
      for (i <- 0 until 16) {
        val g = dg(i) & 0xff
        px(i * 4) = g.toByte
        px(i * 4 + 1) = (255 - g).toByte
        px(i * 4 + 2) = (g ^ 0x55).toByte
        px(i * 4 + 3) = (i * 17).toByte
      }
      Png.encode(2, 8, 4, px, interlace = true)
    }

  /** Synthesize a palette PNG `media` column: the 16 digest bytes as
    * indices through an identity 256-gray PLTE, so the expansion is
    * index == gray and all three decoded means are Σ digest/16.
    */
  def withPngPaletteColumn(docs: DataFrame): DataFrame = {
    val grayPal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    withDigestColumn(docs)(dg => Png.encodePalette(2, 8, dg, grayPal))
  }

  /** Synthesize a valid baseline-JPEG `media` column: a 32×32 grayscale
    * image of 16 constant 8×8 blocks whose values (raster block order)
    * are the md5(text) digest bytes, encoded with a flat q=8 quant table.
    * Constant blocks quantize to a DC-only spectrum, and with q=8 the
    * reconstruction `round(dequantDC / 8 + 128)` returns the source value
    * EXACTLY (DC coef = 8·(v−128), quantized losslessly) — so the decoded
    * per-channel mean is Σ(digest bytes)/16, which an oracle recomputes
    * from the hex digest alone, no JPEG parser needed. The stream still
    * exercises the full decode surface: marker/table parse, the 16-block
    * DC-prediction chain across all Huffman magnitude categories, EOB,
    * and byte destuffing when padding lands on 0xFF.
    */
  def withJpegColumn(docs: DataFrame): DataFrame = {
    val quant = Jpeg.flatQuant(8)
    withDigestColumn(docs)(dg => Jpeg.encode(32, 32, Array(digestPlane(dg, 0)), quant))
  }

  /** The same DC-exact 16-block image as [[withJpegColumn]], encoded as
    * a PROGRESSIVE (SOF2) stream — DC first + refinement split the
    * values across successive-approximation scans, the AC scans are
    * pure EOB runs, and the decoded means must still replay exactly
    * from the digest.
    */
  def withJpegProgressiveColumn(docs: DataFrame): DataFrame = {
    val quant = Jpeg.flatQuant(8)
    withDigestColumn(docs)(dg =>
      Jpeg.encodeProgressive(32, 32, Array(digestPlane(dg, 0)), quant))
  }

  /** The 32×32 16-constant-block plane for the JPEG/video gates: block
    * bi (raster order) takes digest byte (bi + rot) mod 16 — rot=0 is
    * the still-image layout; the video fixture rotates per frame so each
    * frame is distinct (first pixel = dg(rot)) while the MEAN stays the
    * rotation-invariant Σ(digest)/16 the oracle replays. The block-index
    * math lives HERE only, so no two gates can diverge.
    */
  private def digestPlane(dg: Array[Byte], rot: Int): Array[Int] = {
    val plane = new Array[Int](32 * 32)
    var i = 0
    while (i < 32 * 32) {
      val bi = (i / (32 * 8)) * 4 + (i % 32) / 8 // block row*4 + block col
      plane(i) = dg((bi + rot) % 16) & 0xff
      i += 1
    }
    plane
  }

  /** Shared fixture plumbing for EVERY synthetic media column: the
    * output is always (doc_id, media = build(md5(text) digest bytes))
    * via one partition-preserving mapPartitions. The five format
    * builders (BMP/WAV/JPEG/PNG/MJPEG) differ ONLY in the digest→bytes
    * function, so their gate fixtures cannot diverge in schema or
    * digest derivation — the same single-source-of-truth rule as
    * [[digestPlane]] for the block-index math.
    */
  /** Real animated-GIF decode + inter-frame compositing ([[Gif]]):
    * decodes every frame (LZW, interlace, palettes, transparency), plays
    * the animation under the disposal rules, and reports the FINAL
    * displayed canvas — features no single frame contains.
    */
  object GifCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", LongType),
      StructField("mean_gray", DoubleType),
      StructField("px_override", IntegerType),
      StructField("px_disposal2", IntegerType),
      StructField("px_disposal3", IntegerType),
      StructField("px_last", IntegerType)))

    override def decode(bytes: Array[Byte]): Row = {
      val img = Gif.decode(bytes)
      val canvas = Gif.composite(img)
      require(canvas.length >= 16,
        s"GifCodec probe pixels need a >=16-pixel canvas, " +
          s"got ${img.width}x${img.height}")
      val gray = canvas.map(rgb =>
        ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3)
      Row(img.width, img.height, img.frames.length.toLong,
        gray.map(_.toLong).sum.toDouble / gray.length,
        gray(1), gray(6), gray(9), gray(15))
    }
  }

  /** Synthesize a 5-frame animated GIF per document on a 4×4 canvas
    * (identity 256-gray global palette, bg=0), built so the composited
    * result exercises every inter-frame mechanism AND stays replayable
    * from the digest bytes g(0..15) alone:
    *
    *  - f0: full-canvas g(0..15), INTERLACED (stored rows 0,2,1,3)
    *  - f1: rect(1,1,2×2) = 255−g(0..3), disposal 2 → its rect
    *    (idx 5,6,9,10) restores to background 0 before f2
    *  - f2: rect(0,0,2×2) = [0, g4, 0, g5] with transparent=0 — writes
    *    land only where the value ≠ 0, over a canvas f1's disposal
    *    partially cleared
    *  - f3: rect(0,2,2×2) = g(7..10) through a REVERSED local palette,
    *    disposal 3 → fully reverted before f4 (its values never appear
    *    in the final canvas)
    *  - f4: rect(3,3,1×1) = g6, last frame (disposal never runs)
    *
    * Final canvas (gray): [g0, g4|g1, g2, g3, g4, g5|0, 0, g7, g8, 0, 0,
    * g11, g12, g13, g14, g6] where a|b = a unless a==0 (transparent)
    * then b — integer-exact, so the oracle replays mean and probe pixels
    * from the hex digest with CASE arithmetic.
    */
  def withGifColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs) { dg =>
      val g = dg.map(_ & 0xff)
      Gif.encode(4, 4, 0, Seq(
        Gif.FrameSpec(0, 0, 4, 4, g, disposal = 1, interlace = true),
        Gif.FrameSpec(1, 1, 2, 2, g.take(4).map(255 - _), disposal = 2),
        Gif.FrameSpec(0, 0, 2, 2, Array(0, g(4), 0, g(5)),
          disposal = 1, transparent = 0),
        Gif.FrameSpec(0, 2, 2, 2, g.slice(7, 11).map(v => 255 - v),
          disposal = 3,
          localPalette = Some(Gif.grayPalette(reversed = true))),
        Gif.FrameSpec(3, 3, 1, 1, Array(g(6)))))
    }

  private def withDigestColumn(docs: DataFrame)(
      build: Array[Byte] => Array[Byte]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType)))
    val enc = Encoders.row(outSchema)
    // widen BEFORE synthesis, where a row is (doc_id, 16-byte digest) —
    // the shuffle is ~free and both the builder and every downstream
    // decode map inherit full-width parallelism; a compact corpus'
    // single split would otherwise serialize the whole media pipeline
    // on one core ([[graft.util.Widen]]: no-op on many-split inputs)
    graft.util.Widen.forHeavyMap(
        docs.select(col("doc_id"), unhex(md5(col("text"))).as("dg")))
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), build(r.getAs[Array[Byte]](1))))
      }(enc)
  }

  /** Synthesize a valid 4:2:0 COLOR baseline-JPEG `media` column: the
    * same 32×32 16-block layout as [[withJpegColumn]] but encoded as a
    * three-component YCbCr image with 2×2 chroma subsampling — the
    * dominant real-world JPEG layout, exercising the interleaved
    * multi-block MCU walk, chroma downsample/upsample and the color
    * transform. The fixture is achromatic (r=g=b), so Y equals the gray
    * value exactly and Cb/Cr quantize to zero: decoding reproduces the
    * source values EXACTLY and the oracle replay is the same
    * Σ(digest bytes)/16 as the grayscale gate, with components=3.
    */
  def withJpeg420Column(docs: DataFrame): DataFrame = {
    val quant = Jpeg.flatQuant(8)
    withDigestColumn(docs) { dg =>
      val plane = digestPlane(dg, 0)
      Jpeg.encode(32, 32, Array(plane, plane.clone(), plane.clone()), quant,
        chromaSubsample = (2, 2))
    }
  }

  /** Encode frames as an MJPEG-style stream: complete JPEG images
    * back-to-back (the Motion-JPEG over-AVI/HTTP layout — each frame is
    * independently decodable, found by [[Jpeg.frameRanges]]).
    */
  def mjpegEncode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach(f => out.write(f, 0, f.length))
    out.toByteArray
  }

  /** Synthesize an MJPEG `media` column: `nFrames` concatenated 32×32
    * grayscale JPEGs per document, frame f's blocks being the md5(text)
    * digest rotated by f ([[digestPlane]]) — so every frame is distinct
    * (first pixel = digest byte f) but all share the rotation-invariant
    * mean Σ(digest)/16, both replayable from the hex digest alone.
    */
  def withMjpegColumn(docs: DataFrame, nFrames: Int = 4): DataFrame = {
    val quant = Jpeg.flatQuant(8)
    withDigestColumn(docs) { dg =>
      mjpegEncode((0 until nFrames).map(f =>
        Jpeg.encode(32, 32, Array(digestPlane(dg, f)), quant)))
    }
  }

  /** REAL video frame-sampling: index the frames of each MJPEG blob with
    * the marker-aware [[Jpeg.frameRanges]] scan (O(bytes), no decode),
    * then FULLY DECODE only every `stride`-th frame up to `maxFrames` —
    * the contract [[frameSample]] models with opaque chunks, now with an
    * actual codec: k decodes for k sampled frames, never one per frame.
    * Emits one row per sampled frame with the decoded dimensions, the
    * first-plane mean and the first pixel (both fixture-oracle-able).
    * Runs as partition-preserving mapPartitions like [[extractFeatures]];
    * at GB-blob scale, chunk first and sample per-chunk (see [[chunk]]).
    */
  def sampleVideoFrames(media: DataFrame, stride: Int = 2,
      maxFrames: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_no", LongType),
      StructField("n_frames", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_gray", DoubleType),
      StructField("first_px", IntegerType)))
    val enc = Encoders.row(outSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val ranges = Jpeg.frameRanges(bytes)
          Iterator.range(0, ranges.length, stride).take(maxFrames).map { f =>
            val (s, e) = ranges(f)
            val img = Jpeg.decode(java.util.Arrays.copyOfRange(bytes, s, e))
            val p = img.planes(0)
            var sum = 0L
            var i = 0
            while (i < p.length) { sum += p(i); i += 1 }
            Row(r.getLong(0), f.toLong, ranges.length.toLong,
              img.width, img.height,
              sum.toDouble / (img.width.toLong * img.height), p(0))
          }
        }
      }(enc)
  }

  /** Block-matching MOTION ANALYSIS over an MJPEG stream — the
    * motion-compensation signal of a video curation pipeline (motion
    * magnitude and residual energy separate static slides from real
    * footage, the per-crawl video-quality prior), and the exact full-pel
    * SAD search every motion-compensated codec runs as its first stage.
    * Motion-compensated DECODE (H.264-class entropy coding) remains the
    * documented codec-scope stub; this is the ANALYSIS half a training
    * pipeline computes over frames the engine can already decode.
    *
    * Per consecutive frame pair (each frame decoded ONCE — a
    * partition-preserving mapPartitions like [[sampleVideoFrames]]; at
    * GB-blob scale chunk first, see [[chunk]]) and per `blockSize` block
    * of the target frame: scan displacements (dy, dx) ∈ [−radius ..
    * radius]² at `step` granularity over the PREVIOUS frame's first
    * plane, candidates clipped to the frame (no invented padding), and
    * keep the FIRST SAD minimum in (dy, dx) scan order — a total,
    * engine-independent tie-break. `step = blockSize` is the
    * coarse/aligned first pass of a hierarchical search (the gate's
    * regime: block-aligned candidates over the constant-block fixture
    * make every SAD a pure digest formula the oracle replays);
    * `step = 1` is the exhaustive full-pel search, spec-pinned to
    * recover a planted shift exactly. Emits one row per (target frame,
    * block): (doc_id, frame_no, bx, by, dx, dy, sad).
    */
  def motionEstimate(media: DataFrame, blockSize: Int = 8,
      radius: Int = 8, step: Int = 1): DataFrame = {
    require(blockSize > 0 && radius >= 0 && step > 0,
      s"bad motion search geometry: block=$blockSize r=$radius step=$step")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_no", LongType),
      StructField("bx", IntegerType),
      StructField("by", IntegerType),
      StructField("dx", IntegerType),
      StructField("dy", IntegerType),
      StructField("sad", LongType)))
    val enc = Encoders.row(outSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val ranges = Jpeg.frameRanges(bytes)
          // sliding two-frame decode: the search only ever needs the
          // (prev, cur) pair, so memory stays O(2 frames) however long
          // the stream is (the sampleVideoFrames per-need discipline) —
          // decoding and RETAINING every frame up front would grow the
          // heap with stream length. The iterator advances sequentially,
          // so `cur` becomes the next step's `prev` with no re-decode.
          def decodeAt(i: Int) = {
            val (s, e) = ranges(i)
            Jpeg.decode(java.util.Arrays.copyOfRange(bytes, s, e))
          }
          var carried = -1
          var carriedFrame: Jpeg.Image = null
          (1 until ranges.length).iterator.flatMap { f =>
            val prev = if (carried == f - 1) carriedFrame else decodeAt(f - 1)
            val cur = decodeAt(f)
            carried = f; carriedFrame = cur
            val (w, h) = (cur.width, cur.height)
            val cp = cur.planes(0); val pp = prev.planes(0)
            for (by <- (0 until h / blockSize).iterator;
                 bx <- (0 until w / blockSize).iterator) yield {
              val (x0, y0) = (bx * blockSize, by * blockSize)
              var bestSad = Long.MaxValue; var bestDx = 0; var bestDy = 0
              var dy = -radius
              while (dy <= radius) {
                val ry = y0 + dy
                if (ry >= 0 && ry + blockSize <= h) {
                  var dx = -radius
                  while (dx <= radius) {
                    val rx = x0 + dx
                    if (rx >= 0 && rx + blockSize <= w) {
                      var sad = 0L; var j = 0
                      while (j < blockSize && sad < bestSad) {
                        var i = 0
                        val co = (y0 + j) * w + x0
                        val ro = (ry + j) * w + rx
                        while (i < blockSize) {
                          sad += math.abs(cp(co + i) - pp(ro + i)); i += 1
                        }
                        j += 1
                      }
                      // strict <: the FIRST minimum in (dy, dx) scan
                      // order wins ties (the early-exit row loop can
                      // only overshoot a non-improving sad, never
                      // undershoot the true one)
                      if (sad < bestSad) {
                        bestSad = sad; bestDx = dx; bestDy = dy
                      }
                    }
                    dx += step
                  }
                }
                dy += step
              }
              Row(docId, f.toLong, bx, by, bestDx, bestDy, bestSad)
            }
          }
        }
      }(enc)
  }

  /** Encode interleaved 16-bit PCM samples as a minimal RIFF/WAVE file
    * (44-byte canonical header, little-endian).
    */
  def wavEncodePcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    require(channels >= 1 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Synthesize a valid stereo WAV `media` column: 8 frames of 2-channel
    * 16-bit PCM at 8 kHz whose 16 interleaved samples are the md5(text)
    * digest bytes mapped to `(b - 128) * 256` — deterministic, and an
    * oracle can recompute the decoded per-channel RMS from the hex digest
    * alone (L = even digest bytes, R = odd), no WAV parser needed.
    */
  def withWavColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs) { dg =>
      wavEncodePcm16(8000, 2, dg.map(b => (((b & 0xff) - 128) * 256).toShort))
    }

  /** Encode mono samples as an IMA-ADPCM (format 0x11) RIFF/WAVE file:
    * extended fmt chunk (cbSize=2, samplesPerBlock) + fact chunk with
    * the true sample count + [[Adpcm.encode]] block data.
    */
  def wavEncodeImaAdpcm(sampleRate: Int, samples: Array[Short],
      samplesPerBlock: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val data = Adpcm.encode(samples, samplesPerBlock)
    val blockBytes = 4 + (samplesPerBlock - 1 + 1) / 2
    val buf = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + data.length +
      (data.length & 1)).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes)
      .putInt(4 + 28 + 12 + 8 + data.length + (data.length & 1))
      .put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(20)
      .putShort(0x11) // IMA ADPCM
      .putShort(1).putInt(sampleRate)
      .putInt(sampleRate * blockBytes / samplesPerBlock) // byte rate
      .putShort(blockBytes.toShort) // block align = one ADPCM block
      .putShort(4)                  // bits per (encoded) sample
      .putShort(2)                  // cbSize
      .putShort(samplesPerBlock.toShort)
    buf.put("fact".getBytes).putInt(4).putInt(samples.length)
    buf.put("data".getBytes).putInt(data.length).put(data)
    if ((data.length & 1) == 1) buf.put(0.toByte) // RIFF word padding
    buf.array()
  }

  /** A REAL compressed-audio codec: IMA-ADPCM decode ([[Adpcm]] — block
    * header seed + 4-bit adaptive-delta nibbles through the shared
    * step/index tables). Walks the RIFF chunks (extended fmt, fact,
    * data), decodes every block, reports RMS over the reconstructed
    * PCM — the audio analog of the JPEG/GIF "real codec" gates.
    */
  object AdpcmWavCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType),
      StructField("samples_per_block", IntegerType),
      StructField("n_frames", LongType),
      StructField("rms", DoubleType)))

    override def decode(bytes: Array[Byte]): Row = {
      import java.nio.{ByteBuffer, ByteOrder}
      require(bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a WAV: bad RIFF/WAVE magic")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var off = 12
      var fmtOff, dataOff, dataSize, factSamples = -1
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = buf.getInt(off + 4)
        require(size >= 0 && off + 8L + size <= bytes.length,
          s"truncated WAV chunk '$id': size=$size at offset=$off")
        id match {
          case "fmt " => require(size >= 20, s"ADPCM fmt too short: $size")
            fmtOff = off + 8
          case "fact" => factSamples = buf.getInt(off + 8)
          case "data" => dataOff = off + 8; dataSize = size
          case _ => ()
        }
        off += 8 + size + (size & 1)
      }
      require(fmtOff >= 0 && dataOff >= 0, "WAV missing fmt/data chunk")
      val audioFormat = buf.getShort(fmtOff).toInt
      val channels = buf.getShort(fmtOff + 2).toInt
      val sampleRate = buf.getInt(fmtOff + 4)
      val bits = buf.getShort(fmtOff + 14).toInt
      val samplesPerBlock = buf.getShort(fmtOff + 18).toInt
      require(audioFormat == 0x11 && bits == 4 && channels == 1,
        s"unsupported WAV variant: format=$audioFormat bits=$bits " +
          s"channels=$channels (mono IMA-ADPCM only)")
      require(samplesPerBlock >= 3 && samplesPerBlock % 2 == 1 &&
        sampleRate > 0, s"malformed ADPCM fmt: spb=$samplesPerBlock")
      val blockBytes = 4 + samplesPerBlock / 2
      val nBlocks = dataSize / blockBytes
      val pcm = Adpcm.decode(
        java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + dataSize),
        samplesPerBlock, nBlocks)
      val n = if (factSamples >= 0) math.min(factSamples, pcm.length)
        else pcm.length
      var sq = 0L
      var i = 0
      while (i < n) { val s = pcm(i).toLong; sq += s * s; i += 1 }
      Row(sampleRate, bits, samplesPerBlock, n.toLong,
        if (n == 0) 0.0 else math.sqrt(sq.toDouble / n))
    }
  }

  /** Synthesize an IMA-ADPCM WAV `media` column: 16 constant blocks of
    * 9 samples whose values are the digest bytes mapped to
    * `(b − 128) · 256`. Constant blocks encode EXACTLY (block header
    * carries the first sample verbatim; zero deltas quantize to nibble
    * 0, which at step index 0 reconstructs diff = 7>>3 = 0 and the
    * index stays clamped at 0), so decoded RMS = √(Σ s_b²/16) — the
    * same digest replay as the PCM gate, through a genuinely lossy
    * codec's exact-representable subspace (the same move as the JPEG
    * DC-only blocks).
    */
  def withAdpcmColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs) { dg =>
      val samples = dg.flatMap { b =>
        Array.fill(9)((((b & 0xff) - 128) * 256).toShort)
      }
      wavEncodeImaAdpcm(8000, samples, 9)
    }

  /** A REAL lossless ANIMATED-image codec: APNG decode ([[Apng]] —
    * acTL/fcTL/fdAT grammar with strict sequence validation, per-frame
    * regions through the full [[Png]] filter/DEFLATE machinery,
    * dispose NONE/BACKGROUND/PREVIOUS + blend SOURCE/OVER compositing).
    * Reports the FINAL canvas: channel means plus probe pixels that
    * only come out right if every dispose op fired (the GifCodec
    * pattern, on the lossless sibling format).
    */
  object ApngCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", LongType),
      StructField("num_plays", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_a", DoubleType),
      StructField("px00", IntegerType),
      StructField("px_mid", IntegerType),
      StructField("px11", IntegerType)))

    override def decode(bytes: Array[Byte]): Row = {
      val a = Apng.decode(bytes)
      val canvas = a.canvases.last
      val n = a.width * a.height
      var sr = 0L
      var sa = 0L
      var i = 0
      while (i < n) {
        sr += canvas(i * 4) & 0xff
        sa += canvas(i * 4 + 3) & 0xff
        i += 1
      }
      def r(x: Int, y: Int): Int = canvas((y * a.width + x) * 4) & 0xff
      Row(a.width, a.height, a.canvases.length.toLong, a.numPlays,
        sr.toDouble / n, sa.toDouble / n,
        r(0, 0), r(a.width / 2, a.height / 2),
        r(math.min(1, a.width - 1), math.min(1, a.height - 1)))
    }
  }

  /** Synthesize an APNG `media` column: a 4×4 RGBA canvas whose FINAL
    * composited state exists in no single frame —
    *  f0: full canvas, pixel p = gray g[p], opaque;
    *  f1: 2×2 at (0,0) = inverted digest, dispose BACKGROUND (the
    *      region must come back transparent black);
    *  f2: 2×2 at (2,2) = g[4..7], dispose PREVIOUS (must revert to f0);
    *  f3: 1×1 at (1,1) = g[8].
    * Final canvas: (0,0)/(1,0)/(0,1) cleared to 0, (1,1) = g[8],
    * the (2,2) quadrant reverted to g[10],g[11],g[14],g[15], the rest
    * f0 — every probe and the means replay from the hex digest.
    */
  def withApngColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs) { dg =>
      def rgba(vals: Seq[Int]): Array[Byte] =
        vals.flatMap(v => Seq(v, v, v, 255)).map(_.toByte).toArray
      val g = dg.map(_ & 0xff)
      Apng.encode(4, 4, Seq(
        Apng.Frame(4, 4, 0, 0, disposeOp = 0, blendOp = 0,
          rgba(g.toIndexedSeq)),
        Apng.Frame(2, 2, 0, 0, disposeOp = 1, blendOp = 0,
          rgba(g.take(4).map(255 - _).toIndexedSeq)),
        Apng.Frame(2, 2, 2, 2, disposeOp = 2, blendOp = 0,
          rgba(g.slice(4, 8).toIndexedSeq)),
        Apng.Frame(1, 1, 1, 1, disposeOp = 0, blendOp = 0,
          rgba(Seq(g(8))))))
    }

  /** QOI ("Quite OK Image") — the modern single-pass lossless format:
    * RGB/RGBA literals, 64-entry hash cache INDEX ops, DIFF/LUMA
    * deltas, RUN packing ([[Qoi]]). Lossless, so decoded stats replay
    * exactly for any content.
    */
  object QoiCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("first_px", IntegerType)))

    override def decode(bytes: Array[Byte]): Row = {
      val img = Qoi.decode(bytes)
      val n = img.width * img.height
      var sr = 0L
      var i = 0
      while (i < n) { sr += img.pixels(i * 4) & 0xff; i += 1 }
      Row(img.width, img.height, img.channels,
        sr.toDouble / n, img.pixels(0) & 0xff)
    }
  }

  /** Synthesize a QOI `media` column: a 4×4 opaque gray image whose 16
    * pixels are the digest bytes (the mm_decode shape through the QOI
    * op stream — gray pixels exercise RUN/INDEX/DIFF/LUMA/RGB paths as
    * the deltas dictate).
    */
  def withQoiColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs) { dg =>
      Qoi.encode(4, 4,
        dg.flatMap(b => Seq(b, b, b, 255.toByte)).toArray)
    }

  /** Encode G.711 code bytes as a mono 8-bit RIFF/WAVE file — format
    * tag 7 (µ-law) or 6 (A-law), the telephony WAV shape.
    */
  def wavEncodeG711(sampleRate: Int, codes: Array[Byte],
      alaw: Boolean): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val pad = codes.length & 1
    val buf = ByteBuffer.allocate(44 + codes.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + codes.length + pad).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(if (alaw) 6 else 7)
      .putShort(1).putInt(sampleRate)
      .putInt(sampleRate) // byte rate: 1 byte/sample
      .putShort(1).putShort(8)
    buf.put("data".getBytes).putInt(codes.length).put(codes)
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  /** G.711 telephony audio: µ-law / A-law WAV decode ([[G711]] — the
    * logarithmic companding laws, dispatched on the fmt tag). Reports
    * RMS over the expanded 16-bit PCM; the code→linear expansion is
    * pure integer arithmetic, so the oracle replays it from the code
    * bytes directly (no lossy-subspace carve-out needed: code bytes ARE
    * the ground truth — G711Spec proves encode∘decode is the identity
    * on the code space).
    */
  object G711WavCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("law", StringType),
      StructField("n_samples", LongType),
      StructField("rms", DoubleType)))

    override def decode(bytes: Array[Byte]): Row = {
      import java.nio.{ByteBuffer, ByteOrder}
      require(bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a WAV: bad RIFF/WAVE magic")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var off = 12
      var fmtOff, dataOff, dataSize = -1
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = buf.getInt(off + 4)
        require(size >= 0 && off + 8L + size <= bytes.length,
          s"truncated WAV chunk '$id'")
        id match {
          case "fmt " => require(size >= 16, s"fmt too short: $size"); fmtOff = off + 8
          case "data" => dataOff = off + 8; dataSize = size
          case _ => ()
        }
        off += 8 + size + (size & 1)
      }
      require(fmtOff >= 0 && dataOff >= 0, "WAV missing fmt/data chunk")
      val audioFormat = buf.getShort(fmtOff).toInt
      val channels = buf.getShort(fmtOff + 2).toInt
      val sampleRate = buf.getInt(fmtOff + 4)
      val bits = buf.getShort(fmtOff + 14).toInt
      require((audioFormat == 6 || audioFormat == 7) && channels == 1 && bits == 8,
        s"unsupported WAV variant: format=$audioFormat channels=$channels " +
          s"bits=$bits (mono 8-bit G.711 only)")
      val alaw = audioFormat == 6
      var sq = 0L
      var i = 0
      while (i < dataSize) {
        val c = bytes(dataOff + i) & 0xff
        val s = if (alaw) G711.alawToLinear(c) else G711.mulawToLinear(c)
        sq += s.toLong * s
        i += 1
      }
      Row(sampleRate, if (alaw) "alaw" else "mulaw", dataSize.toLong,
        if (dataSize == 0) 0.0 else math.sqrt(sq.toDouble / dataSize))
    }
  }

  /** Synthesize a µ-law G.711 WAV `media` column: the 16 digest bytes
    * ARE the code bytes — decoded RMS replays from the hex digest
    * through the integer expansion formula alone.
    */
  def withG711Column(docs: DataFrame): DataFrame =
    withDigestColumn(docs)(dg => wavEncodeG711(8000, dg, alaw = false))

  /** A REAL lossless compressed-audio codec: FLAC decode ([[Flac]] —
    * frame sync/CRCs, FIXED/LPC prediction, Rice residuals, STREAMINFO
    * MD5 verification). Reports RMS over the reconstructed channel-0
    * PCM; because FLAC is lossless the value is EXACT for any input —
    * no exact-representable-subspace carve-out needed (contrast
    * [[AdpcmWavCodec]]).
    */
  object FlacCodec extends MediaCodec {
    override val featureType: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("rms", DoubleType)))

    override def decode(bytes: Array[Byte]): Row = {
      val s = Flac.decode(bytes)
      val ch0 = s.pcm(0)
      var sq = 0L
      var i = 0
      while (i < ch0.length) { val v = ch0(i).toLong; sq += v * v; i += 1 }
      Row(s.sampleRate, s.channels, s.totalSamples,
        if (ch0.isEmpty) 0.0 else math.sqrt(sq.toDouble / ch0.length))
    }
  }

  /** Synthesize a FLAC `media` column: 128 mono 16-bit samples — the 16
    * digest bytes mapped to `(b − 128) · 256`, tiled 8× — encoded at
    * blockSize 64 (2 frames: exercises frame numbering, FIXED-order
    * search and nonzero Rice residuals at every period-16 boundary).
    * Losslessness makes the decoded RMS = √(Σ s_b²/16) exactly — the
    * same digest replay as the PCM/ADPCM gates, over arbitrary content
    * rather than a codec-exact subspace.
    */
  def withFlacColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs) { dg =>
      val samples = new Array[Int](128)
      var i = 0
      while (i < 128) {
        samples(i) = ((dg(i % 16) & 0xff) - 128) * 256
        i += 1
      }
      Flac.encode(Array(samples), 8000, blockSize = 64)
    }

  /** Encode a grayscale byte matrix (row-major, top row first) as a
    * 24-bpp bottom-up BMP with standard 54-byte headers.
    */
  def bmpEncodeGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    require(gray.length == width * height,
      s"need $width*$height=${width * height} pixels, got ${gray.length}")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54) // reserved ×2, pixel-array offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = height - 1
    while (y >= 0) { // bottom-up row order
      val rowStart = buf.position()
      var x = 0
      while (x < width) {
        val v = gray(y * width + x)
        buf.put(v).put(v).put(v)
        x += 1
      }
      while (buf.position() < rowStart + rowSize) buf.put(0.toByte)
      y -= 1
    }
    buf.array()
  }

  /** Synthesize a valid BMP `media` column: an 8×2 grayscale bitmap whose
    * 16 pixels are the md5(text) digest bytes — deterministic, and an
    * oracle can recompute the decoded channel means from the hex digest
    * alone, no BMP parser needed.
    */
  def withBmpColumn(docs: DataFrame): DataFrame =
    withDigestColumn(docs)(dg => bmpEncodeGray(8, 2, dg))

  /** STUB decode function (kept for the original feature face). */
  def decodeStub(bytes: Array[Byte]): Row = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(bytes).map("%02x".format(_)).mkString
    val header = bytes.take(4).map("%02X".format(_)).mkString
    Row(bytes.length.toLong, header, digest,
      ((bytes.length + 4095) / 4096).toLong)
  }

  /** Attach a `media` binary column (here derived from text — the corpus
    * has no real media; the column TYPE and downstream plumbing are the
    * point) plus typed metadata.
    */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("content_type"),
        length(col("text")).cast(LongType).as("declared_size")).as("media_meta"))

  /** Chunk/frame-sample analog: slice each media blob into fixed-size
    * chunk ROWS (doc_id, chunk_idx, chunk bytes). This is the shape a
    * video frame-sampler or audio windower produces — one row per unit of
    * decode work — so downstream extraction parallelizes across chunks,
    * not documents (matters when single blobs are GB-scale: no task ever
    * holds more than `chunkSize` of one blob after the explode).
    */
  def chunk(media: DataFrame, chunkSize: Int = 64): DataFrame = {
    val nChunks = ceil(length(col("media")) / chunkSize.toDouble).cast("int")
    media.select(col("doc_id"), col("media"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("media").substr(col("chunk_idx") * chunkSize + 1, lit(chunkSize))
          .as("chunk"))
  }

  /** Deterministic stride frame-sampling over chunk rows: keep every
    * `stride`-th chunk, up to `maxFrames` per document — the video
    * frame-sampler contract (inspect k frames without touching the rest).
    * The filter sits directly on the chunk explode, so skipped frames are
    * discarded before any decode work, and parallelism stays per-frame.
    */
  def frameSample(media: DataFrame, chunkSize: Int = 64, stride: Int = 4,
      maxFrames: Int = 3): DataFrame =
    chunk(media, chunkSize)
      .filter(col("chunk_idx") % stride === 0 &&
        col("chunk_idx") / stride < maxFrames)
      .select(col("doc_id"), (col("chunk_idx") / stride).cast(LongType).as("frame_no"),
        col("chunk").as("frame"))

  /** Feature extraction over the binary column via mapPartitions: the
    * decoder is instantiated once per partition and rows stream through —
    * no shuffle, no driver round-trip, partitioning preserved. This is the
    * batch shape a Pandas-UDF/`mapInPandas` pipeline has in PySpark.
    */
  def extractFeatures(media: DataFrame, codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", codec.featureType)))
    val enc = Encoders.row(outSchema)
    // deliberately NO repartition here: widening would shuffle the
    // binary media itself (the r18 probe measured the synthesized-GIF
    // shuffle DOUBLING the gate) — parallelism is the SOURCE's job
    // (withDigestColumn widens before synthesis, where rows are
    // 24-byte digests; a real store has many splits)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        // per-partition decoder init happens here
        rows.map { r =>
          Row(r.getLong(0), codec.decode(r.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** Box-filter (area-average) DOWNSCALE of a PNG `media` column by
    * integer factors — the mandated RESIZE step of the multimodal
    * pipeline (decode / feature-extract / resize / frame-sample):
    * decode → per-channel fw×fh block mean with FLOOR division
    * (integer-exact, so the resized pixels replay in SQL from the
    * synthesis digest) → RE-ENCODE as real PNG bytes. The mm_resize
    * gate extracts features FROM the resized bytes through the standard
    * codec, so the decode, the block arithmetic, the re-encode and the
    * second decode are all in the hash. Map-side per row, decoder per
    * partition — a scan-rate transform at any corpus scale, like every
    * codec pass here (the thumbnail/downsample preprocessing a
    * multimodal training pipeline runs on arrival).
    */
  def resizePng(media: DataFrame, fw: Int, fh: Int): DataFrame = {
    require(fw >= 1 && fh >= 1, s"factors ${fw}x$fh")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType)))
    val enc = Encoders.row(outSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = Png.decode(r.getAs[Array[Byte]](1))
          require(img.bitDepth == 8,
            s"resizePng: 8-bit images only, got depth ${img.bitDepth}")
          require(img.width % fw == 0 && img.height % fh == 0,
            s"resizePng: ${img.width}x${img.height} not divisible by ${fw}x$fh")
          val ow = img.width / fw
          val oh = img.height / fh
          val ch = img.channels
          val out = new Array[Byte](ow * oh * ch)
          val area = fw * fh
          var oy = 0
          while (oy < oh) {
            var ox = 0
            while (ox < ow) {
              var c = 0
              while (c < ch) {
                var s = 0
                var dy = 0
                while (dy < fh) {
                  var dx = 0
                  while (dx < fw) {
                    s += img.sample(
                      ((oy * fh + dy) * img.width + (ox * fw + dx)) * ch + c)
                    dx += 1
                  }
                  dy += 1
                }
                out((oy * ow + ox) * ch + c) = (s / area).toByte
                c += 1
              }
              ox += 1
            }
            oy += 1
          }
          Row(r.getLong(0), Png.encode(ow, oh, ch, out))
        }
      }(enc)
  }
}
