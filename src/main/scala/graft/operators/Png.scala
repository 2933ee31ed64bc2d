package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Pure-JVM PNG codec (W3C PNG spec / RFC 2083 — public standard).
  *
  * Scope: 8-bit grayscale (color type 0), truecolor (2), palette (3,
  * expanded through PLTE), gray+alpha (4) and RGBA (6), non-interlaced
  * AND Adam7-interlaced — the full common training-corpus surface —
  * with all five scanline filters (None/Sub/Up/Average/Paeth)
  * implemented on both the encode and decode side, chunk CRCs
  * verified, and the zlib stream inflated with the JDK's Inflater
  * (real DEFLATE, not a stub) — at 8-bit or 16-bit depth (big-endian
  * sample pairs; filtering per spec operates on bytes with the wider
  * bpp). Sub-8-bit depths are rejected with descriptive errors,
  * mirroring the Jpeg codec's honesty about progressive/arithmetic
  * streams.
  *
  * Why this design: unlike JPEG, PNG is lossless, so a decode is
  * bit-exact by construction and the digest-replay oracle needs no
  * numerical argument — the interesting surface is the container
  * (chunk walk + CRC), the DEFLATE stream, the filter reconstruction,
  * and the interlace/palette reassembly, each of which fails loudly
  * on hostile input (same byte-mutation fuzz contract as Jpeg/Bmp/Wav).
  *
  * Reference behavior covered: the reference pipeline treats attachments
  * as opaque typed blobs (assay.py:123-140); this codec is part of the
  * mandated multimodal extension (SURVEY C12), not a reference port.
  */
object Png {

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Adam7 pass grid: (x0, y0, dx, dy) per pass (spec §8.2). Shared by
    * encode and decode so the two sides cannot disagree on geometry.
    */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def passDims(w: Int, h: Int, p: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = p
    (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
  }

  /** Decoded image: `pixels` is the unfiltered sample stream, row-major,
    * `channels` interleaved samples per pixel (1 = gray, 2 = gray+alpha,
    * 3 = RGB — including palette-expanded — 4 = RGBA), `bitDepth` 8 or
    * 16 (16-bit samples are big-endian byte PAIRS in `pixels`).
    */
  final case class Image(width: Int, height: Int, colorType: Int,
      channels: Int, pixels: Array[Byte], bitDepth: Int = 8) {
    /** Sample at flat index i (pixel*channels + channel), 0..2^depth-1. */
    def sample(i: Int): Int =
      if (bitDepth == 8) pixels(i) & 0xff
      else ((pixels(i * 2) & 0xff) << 8) | (pixels(i * 2 + 1) & 0xff)
    def nSamples: Int = width.toInt * height * channels
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"PNG: $msg")

  private def u32(bytes: Array[Byte], at: Int): Long = {
    if (at + 4 > bytes.length) fail(s"truncated u32 at $at")
    ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
      ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
  }

  /** Decode a PNG stream. Every failure mode — bad signature, chunk CRC
    * mismatch, malformed zlib data, wrong inflated size, out-of-range
    * filter byte, palette index past PLTE, unsupported variant — raises
    * IllegalArgumentException with a descriptive message (the codec
    * fuzz contract).
    */
  def decode(bytes: Array[Byte]): Image = {
    if (bytes.length < 8 + 25 + 12) fail("stream shorter than signature+IHDR+IEND")
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != Signature(i)) fail(s"bad signature byte $i")
      i += 1
    }

    // --- chunk walk: length(4BE) type(4) data crc(4 over type+data) ---
    var off = 8
    var width, height, colorType, fileCh = -1
    var depth = -1
    var interlaced = false
    var sawIhdr, sawIend, inIdat, idatDone = false
    var palette: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    while (!sawIend) {
      if (off + 12 > bytes.length) fail(s"truncated chunk header at $off")
      val len = u32(bytes, off)
      // bound BEFORE any arithmetic/allocation: hostile lengths must not
      // overflow the offset math or trigger a huge copy
      if (len > bytes.length - off - 12) fail(s"chunk length $len overruns stream")
      val dataAt = off + 8
      val typ = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len.toInt)
      if (crc.getValue != u32(bytes, dataAt + len.toInt))
        fail(s"CRC mismatch in '$typ' chunk at $off")
      typ match {
        case "IHDR" =>
          if (sawIhdr) fail("duplicate IHDR")
          if (off != 8) fail("IHDR is not the first chunk")
          if (len != 13) fail(s"IHDR length $len != 13")
          val w = u32(bytes, dataAt)
          val h = u32(bytes, dataAt + 4)
          val bitDepth = bytes(dataAt + 8) & 0xff
          colorType = bytes(dataAt + 9) & 0xff
          val compression = bytes(dataAt + 10) & 0xff
          val filterMethod = bytes(dataAt + 11) & 0xff
          val interlace = bytes(dataAt + 12) & 0xff
          // validate dims BEFORE the plane-size multiply (same 2^27-pixel
          // cap as Jpeg.decode: a hostile header must not demand GBs).
          // Each axis is bounded FIRST: w and h are full unsigned-32-bit
          // fields, so w*h can wrap past Long.MaxValue and a product-only
          // check would pass exactly the headers it exists to reject.
          if (w <= 0 || h <= 0 || w > (1L << 27) || h > (1L << 27) ||
              w * h > (1L << 27))
            fail(s"unreasonable dimensions ${w}x$h")
          fileCh = colorType match {
            case 0 => 1
            case 2 => 3
            case 3 => 1 // palette indices; expanded to RGB after unfilter
            case 4 => 2
            case 6 => 4
            case t => fail(s"unknown color type $t")
          }
          val depthOk = colorType match {
            case 0 => Set(1, 2, 4, 8, 16)(bitDepth) // grayscale: all depths
            case 3 => Set(1, 2, 4, 8)(bitDepth) // palette: sub-8 + 8
            case _ => bitDepth == 8 || bitDepth == 16
          }
          if (!depthOk)
            fail(s"bit depth $bitDepth invalid for color type $colorType")
          depth = bitDepth
          // re-bound in BYTES now that channels×depth is known: the
          // 2^27-PIXEL cap alone would let a 16-bit RGBA header demand
          // ~2 GiB of buffers before any data validation (sub-byte
          // depths round UP to one byte/sample — the unpacked buffers
          // are byte-per-sample, so depth/8 = 0 would void the guard)
          if (w * h * fileCh * math.max(1L, depth / 8) > (1L << 28))
            fail(s"unreasonable buffer demand ${w}x$h ch=$fileCh depth=$depth")
          if (compression != 0) fail(s"unknown compression method $compression")
          if (filterMethod != 0) fail(s"unknown filter method $filterMethod")
          if (interlace > 1) fail(s"unknown interlace method $interlace")
          interlaced = interlace == 1
          width = w.toInt
          height = h.toInt
          sawIhdr = true
        case "PLTE" =>
          if (!sawIhdr) fail("PLTE before IHDR")
          if (inIdat) fail("PLTE after IDAT")
          if (len == 0 || len % 3 != 0 || len > 768)
            fail(s"PLTE length $len not a multiple of 3 in 3..768")
          if (palette != null) fail("duplicate PLTE")
          palette = java.util.Arrays.copyOfRange(bytes, dataAt, dataAt + len.toInt)
        case "IDAT" =>
          if (!sawIhdr) fail("IDAT before IHDR")
          if (idatDone) fail("IDAT chunks are not consecutive")
          idat.write(bytes, dataAt, len.toInt)
          inIdat = true
        case "IEND" =>
          if (len != 0) fail(s"IEND length $len != 0")
          sawIend = true
        case other =>
          // spec §5.6: IHDR must be the FIRST chunk — even a skippable
          // ancillary chunk before it is a malformed stream
          if (!sawIhdr) fail(s"chunk '$other' before IHDR")
          // spec §5.4: a critical chunk (ancillary bit clear — bit 5 of
          // the first type byte) we don't understand makes the image
          // unreadable; only ancillary chunks (tEXt, pHYs, …) may be
          // skipped (they were CRC-checked above)
          if ((other.charAt(0) & 0x20) == 0)
            fail(s"unknown critical chunk '$other'")
          if (inIdat) idatDone = true // IDAT run ended; another IDAT is an error
      }
      off += 12 + len.toInt
    }
    if (!inIdat) fail("no IDAT chunk")
    if (off != bytes.length) fail(s"${bytes.length - off} trailing bytes after IEND")
    if (colorType == 3 && palette == null) fail("palette image without PLTE")

    // --- zlib inflate into the EXACT expected size (zip-bomb guard:
    // anything past expected+1 probe byte is an error, not an alloc).
    // Interlaced streams carry one filtered sub-image per non-empty
    // Adam7 pass, each with its own per-row filter bytes. ---
    // sub-byte depths (1/2/4, single-channel only) pack samples
    // MSB-first within row bytes; filtering operates on BYTES with
    // bpp = 1 (spec §6: bpp rounds up to one byte)
    val subByte = depth < 8
    val fileBpp = math.max(1, fileCh * depth / 8) // filter bpp, bytes
    def rowBytesFor(w0: Int): Int =
      if (subByte) (w0 * depth + 7) / 8 else w0 * fileBpp
    val expected =
      if (!interlaced) (1 + rowBytesFor(width)) * height
      else Adam7.map { p =>
        val (wp, hp) = passDims(width, height, p)
        if (wp == 0 || hp == 0) 0 else hp * (1 + rowBytesFor(wp))
      }.sum
    val raw = new Array[Byte](expected)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val got =
      try {
        var n = 0
        while (n < expected && !inf.finished()) {
          val k = inf.inflate(raw, n, expected - n)
          if (k == 0 && !inf.finished()) {
            // returning 0 un-finished means the inflater wants something
            // we don't have — more input or a preset dictionary. Either
            // way: loud failure, never a spin.
            if (inf.needsDictionary()) fail("zlib preset dictionary unsupported")
            fail("zlib stream ends early")
          }
          n += k
        }
        if (!inf.finished()) {
          val probe = new Array[Byte](1)
          if (inf.inflate(probe, 0, 1) > 0)
            fail(s"zlib stream larger than expected $expected bytes")
          if (!inf.finished()) fail("zlib stream did not terminate cleanly")
        }
        // compressed bytes past the zlib terminator are not "slack", they
        // are data the image does not account for — reject (strict codec)
        if (inf.getRemaining > 0)
          fail(s"${inf.getRemaining} IDAT bytes after the zlib stream end")
        n
      } catch {
        case e: DataFormatException => fail(s"malformed zlib data: ${e.getMessage}")
      } finally inf.end()
    if (got != expected) fail(s"inflated $got bytes, expected $expected")

    // --- unfilter (spec §6), unpack sub-byte samples, reassemble
    // interlace passes; filePixels holds ONE BYTE PER SAMPLE for
    // sub-byte depths (unpacked), else the raw byte stream ---
    val outBpp = if (subByte) 1 else fileBpp
    val filePixels = new Array[Byte](width * outBpp * height)
    def unpackRow(src: Array[Byte], srcOff: Int, dst: Array[Byte],
        dstOff: Int, w0: Int): Unit = {
      val mask = (1 << depth) - 1
      var x = 0
      while (x < w0) {
        val bit = x * depth
        dst(dstOff + x) =
          (((src(srcOff + (bit >> 3)) & 0xff) >> (8 - depth - (bit & 7))) & mask).toByte
        x += 1
      }
    }
    if (!interlaced) {
      if (!subByte) {
        val consumed = unfilterPass(raw, 0, filePixels, rowBytesFor(width),
          height, fileBpp)
        if (consumed != expected) fail("filtered data size mismatch")
      } else {
        val rb = rowBytesFor(width)
        val packed = new Array[Byte](rb * height)
        val consumed = unfilterPass(raw, 0, packed, rb, height, fileBpp)
        if (consumed != expected) fail("filtered data size mismatch")
        var y = 0
        while (y < height) {
          unpackRow(packed, y * rb, filePixels, y * width, width)
          y += 1
        }
      }
    } else {
      var rawOff = 0
      for (p <- Adam7) {
        val (x0, y0, dx, dy) = p
        val (wp, hp) = passDims(width, height, p)
        if (wp > 0 && hp > 0) {
          val rb = rowBytesFor(wp)
          val packed = new Array[Byte](rb * hp)
          rawOff = unfilterPass(raw, rawOff, packed, rb, hp, fileBpp)
          val sub =
            if (!subByte) packed
            else {
              val u = new Array[Byte](wp * hp)
              var py = 0
              while (py < hp) {
                unpackRow(packed, py * rb, u, py * wp, wp)
                py += 1
              }
              u
            }
          var py = 0
          while (py < hp) {
            var px = 0
            while (px < wp) {
              System.arraycopy(sub, (py * wp + px) * outBpp, filePixels,
                ((y0 + py * dy) * width + (x0 + px * dx)) * outBpp, outBpp)
              px += 1
            }
            py += 1
          }
        }
      }
      if (rawOff != expected) fail("interlaced pass data size mismatch")
    }
    // sub-byte grayscale scales to full 8-bit range (255/(2^d−1) is an
    // exact integer for d = 1, 2, 4); palette indices stay raw
    if (subByte && colorType == 0) {
      val scale = 255 / ((1 << depth) - 1)
      var i = 0
      while (i < filePixels.length) {
        filePixels(i) = ((filePixels(i) & 0xff) * scale).toByte
        i += 1
      }
    }

    // --- palette expansion: indices → RGB through PLTE ---
    if (colorType == 3) {
      val nEntries = palette.length / 3
      val rgb = new Array[Byte](width * height * 3)
      var j = 0
      while (j < filePixels.length) {
        val idx = filePixels(j) & 0xff
        if (idx >= nEntries) fail(s"palette index $idx >= $nEntries entries")
        rgb(j * 3) = palette(idx * 3)
        rgb(j * 3 + 1) = palette(idx * 3 + 1)
        rgb(j * 3 + 2) = palette(idx * 3 + 2)
        j += 1
      }
      Image(width, height, colorType, 3, rgb)
    } else Image(width, height, colorType, fileCh, filePixels,
      if (subByte) 8 else depth) // sub-byte decodes to 8-bit samples
  }

  /** Unfilter one (sub-)image of `h` rows of `rowBytes` bytes with
    * `bpp` bytes per complete pixel (1 for sub-byte depths) from `raw`
    * starting at `off` into `out`; returns the new raw offset. Each
    * stored row is `1 + rowBytes` bytes (filter byte + data).
    */
  private def unfilterPass(raw: Array[Byte], off: Int, out: Array[Byte],
      rowBytes: Int, h: Int, bpp: Int): Int = {
    val stride = 1 + rowBytes
    var y = 0
    while (y < h) {
      val filter = raw(off + y * stride) & 0xff
      val src = off + y * stride + 1
      val dst = y * rowBytes
      val prior = dst - rowBytes // valid only when y > 0
      var x = 0
      filter match {
        case 0 => // None
          System.arraycopy(raw, src, out, dst, rowBytes)
        case 1 => // Sub: Recon(x) = Filt(x) + Recon(x - bpp)
          while (x < rowBytes) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
            out(dst + x) = ((raw(src + x) & 0xff) + left).toByte
            x += 1
          }
        case 2 => // Up: + Prior(x)
          while (x < rowBytes) {
            val up = if (y > 0) out(prior + x) & 0xff else 0
            out(dst + x) = ((raw(src + x) & 0xff) + up).toByte
            x += 1
          }
        case 3 => // Average: + floor((left + up) / 2)
          while (x < rowBytes) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
            val up = if (y > 0) out(prior + x) & 0xff else 0
            out(dst + x) = ((raw(src + x) & 0xff) + (left + up) / 2).toByte
            x += 1
          }
        case 4 => // Paeth predictor
          while (x < rowBytes) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
            val up = if (y > 0) out(prior + x) & 0xff else 0
            val ul = if (x >= bpp && y > 0) out(prior + x - bpp) & 0xff else 0
            out(dst + x) = ((raw(src + x) & 0xff) + paeth(left, up, ul)).toByte
            x += 1
          }
        case f => fail(s"unknown filter type $f in row $y")
      }
      y += 1
    }
    off + h * stride
  }

  /** Paeth predictor (spec §6.6): the neighbor closest to the linear
    * estimate left + up − upleft, ties broken left, up, upleft.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter one (sub-)image per spec §6 (the inverse of
    * [[unfilterPass]]); appends `h` rows of `1 + w*ch` bytes to `out`.
    * `filterFor` receives a running global row counter via `rowBase`.
    */
  private def filterPass(out: ByteArrayOutputStream, pixels: Array[Byte],
      w: Int, h: Int, ch: Int, rowBase: Int, filterFor: Int => Int): Unit = {
    val rowBytes = w * ch
    val bpp = ch
    var y = 0
    while (y < h) {
      val f = filterFor(rowBase + y)
      require(f >= 0 && f <= 4, s"filter $f out of range")
      out.write(f)
      val cur = y * rowBytes
      val prior = cur - rowBytes
      var x = 0
      while (x < rowBytes) {
        val v = pixels(cur + x) & 0xff
        val left = if (x >= bpp) pixels(cur + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels(prior + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) pixels(prior + x - bpp) & 0xff else 0
        val filtered = f match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - (left + up) / 2
          case 4 => v - paeth(left, up, ul)
        }
        out.write(filtered & 0xff)
        x += 1
      }
      y += 1
    }
  }

  /** Extract one Adam7 pass's sub-image from full `pixels`. */
  private def extractPass(pixels: Array[Byte], width: Int, ch: Int,
      p: (Int, Int, Int, Int), wp: Int, hp: Int): Array[Byte] = {
    val (x0, y0, dx, dy) = p
    val sub = new Array[Byte](wp * hp * ch)
    var py = 0
    while (py < hp) {
      var px = 0
      while (px < wp) {
        System.arraycopy(pixels, ((y0 + py * dy) * width + (x0 + px * dx)) * ch,
          sub, (py * wp + px) * ch, ch)
        px += 1
      }
      py += 1
    }
    sub
  }

  /** Encode `pixels` (row-major, `channels` interleaved bytes per pixel:
    * 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA) as an 8-bit PNG, optionally
    * Adam7-interlaced. `filterFor(y)` picks the scanline filter per row
    * (default cycles 0→4 so a round-trip exercises every reconstruction
    * path); the filtered bytes are computed per spec, so any conformant
    * decoder recovers `pixels` exactly.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ % 5, interlace: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(channels >= 1 && channels <= 4, s"channels=$channels (1..4)")
    require(pixels.length == width * channels * height,
      s"need ${width * channels * height} bytes, got ${pixels.length}")
    val colorType = channels match {
      case 1 => 0
      case 2 => 4
      case 3 => 2
      case 4 => 6
    }
    writePng(width, height, colorType, channels, pixels, filterFor,
      interlace, palette = None)
  }

  /** Encode 16-bit samples (0..65535, row-major, `channels` interleaved
    * per pixel) as a 16-bit-depth PNG; samples serialize big-endian.
    */
  def encode16(width: Int, height: Int, channels: Int, samples: Array[Int],
      filterFor: Int => Int = _ % 5, interlace: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(channels >= 1 && channels <= 4, s"channels=$channels (1..4)")
    require(samples.length == width * channels * height,
      s"need ${width * channels * height} samples, got ${samples.length}")
    samples.foreach(v => require(v >= 0 && v <= 0xffff, s"sample $v not u16"))
    val colorType = channels match {
      case 1 => 0
      case 2 => 4
      case 3 => 2
      case 4 => 6
    }
    val bytes = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      bytes(i * 2) = ((samples(i) >> 8) & 0xff).toByte
      bytes(i * 2 + 1) = (samples(i) & 0xff).toByte
    }
    writePng(width, height, colorType, channels, bytes, filterFor,
      interlace, palette = None, depth = 16)
  }

  /** Encode palette indices + a PLTE table (color type 3); `palette` is
    * flat 0xRRGGBB entries, indices must be within it.
    */
  def encodePalette(width: Int, height: Int, indices: Array[Byte],
      palette: Array[Int], filterFor: Int => Int = _ % 5,
      interlace: Boolean = false): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size ${palette.length} not in 1..256")
    require(indices.length == width * height,
      s"need ${width * height} indices, got ${indices.length}")
    indices.foreach(ix => require((ix & 0xff) < palette.length,
      s"index ${ix & 0xff} outside the ${palette.length}-entry palette"))
    writePng(width, height, colorType = 3, channels = 1, indices,
      filterFor, interlace, palette = Some(palette))
  }

  private def writePng(width: Int, height: Int, colorType: Int,
      channels: Int, pixels: Array[Byte], filterFor: Int => Int,
      interlace: Boolean, palette: Option[Array[Int]],
      depth: Int = 8): Array[Byte] = {
    val bpp = channels * (depth / 8) // filter/extract work on BYTES
    val raw = new ByteArrayOutputStream()
    if (!interlace) filterPass(raw, pixels, width, height, bpp, 0, filterFor)
    else {
      var rowBase = 0
      for (p <- Adam7) {
        val (wp, hp) = passDims(width, height, p)
        if (wp > 0 && hp > 0) {
          filterPass(raw, extractPass(pixels, width, bpp, p, wp, hp),
            wp, hp, bpp, rowBase, filterFor)
          rowBase += hp
        }
      }
    }
    assembleStream(width, height, colorType, depth, interlace, palette,
      raw.toByteArray)
  }

  /** Encode 1/2/4-bit samples (grayscale when `palette` is empty,
    * palette indices otherwise) — samples pack MSB-first into row
    * bytes, filtering runs on the packed bytes with bpp = 1.
    */
  def encodeLowDepth(width: Int, height: Int, depth: Int,
      samples: Array[Int], palette: Option[Array[Int]] = None,
      filterFor: Int => Int = _ % 5,
      interlace: Boolean = false): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4, s"depth $depth not in {1,2,4}")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(samples.length == width * height,
      s"need ${width * height} samples, got ${samples.length}")
    val mask = (1 << depth) - 1
    samples.foreach(v => require(v >= 0 && v <= mask,
      s"sample $v exceeds $depth-bit range"))
    palette.foreach { pal =>
      require(pal.length >= 2 && pal.length <= (1 << depth),
        s"palette size ${pal.length} not in 2..${1 << depth}")
      samples.foreach(v => require(v < pal.length,
        s"index $v outside the ${pal.length}-entry palette"))
    }
    def packRows(sub: Array[Int], w0: Int, h0: Int): Array[Byte] = {
      val rb = (w0 * depth + 7) / 8
      val outp = new Array[Byte](rb * h0)
      var y = 0
      while (y < h0) {
        var x = 0
        while (x < w0) {
          val bit = x * depth
          val at = y * rb + (bit >> 3)
          outp(at) = (outp(at) | (sub(y * w0 + x) << (8 - depth - (bit & 7)))).toByte
          x += 1
        }
        y += 1
      }
      outp
    }
    val raw = new ByteArrayOutputStream()
    if (!interlace) {
      val packed = packRows(samples, width, height)
      filterPass(raw, packed, (width * depth + 7) / 8, height, 1, 0, filterFor)
    } else {
      var rowBase = 0
      for (p <- Adam7) {
        val (x0, y0, dx, dy) = p
        val (wp, hp) = passDims(width, height, p)
        if (wp > 0 && hp > 0) {
          val sub = Array.tabulate(wp * hp)(i =>
            samples((y0 + (i / wp) * dy) * width + (x0 + (i % wp) * dx)))
          filterPass(raw, packRows(sub, wp, hp), (wp * depth + 7) / 8, hp,
            1, rowBase, filterFor)
          rowBase += hp
        }
      }
    }
    assembleStream(width, height, if (palette.isDefined) 3 else 0, depth,
      interlace, palette, raw.toByteArray)
  }

  private def assembleStream(width: Int, height: Int, colorType: Int,
      depth: Int, interlace: Boolean, palette: Option[Array[Int]],
      rawFiltered: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    Signature.foreach(out.write)

    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Unit = {
        out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      be32(data.length)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb)
      crc.update(data)
      be32(crc.getValue)
    }

    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte) // deflate, filter method 0
      .put((if (interlace) 1 else 0).toByte)
    chunk("IHDR", ihdr.array())

    palette.foreach { pal =>
      val plte = new Array[Byte](pal.length * 3)
      for ((rgb, k) <- pal.zipWithIndex) {
        plte(k * 3) = ((rgb >> 16) & 0xff).toByte
        plte(k * 3 + 1) = ((rgb >> 8) & 0xff).toByte
        plte(k * 3 + 2) = (rgb & 0xff).toByte
      }
      chunk("PLTE", plte)
    }

    val rawBytes = rawFiltered
    val defl = new Deflater()
    defl.setInput(rawBytes)
    defl.finish()
    val zbuf = new Array[Byte](rawBytes.length + 64)
    val zout = new ByteArrayOutputStream()
    while (!defl.finished()) {
      val k = defl.deflate(zbuf)
      zout.write(zbuf, 0, k)
    }
    defl.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
