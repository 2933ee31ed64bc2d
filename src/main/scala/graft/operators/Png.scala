package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Pure-JVM PNG codec (W3C PNG spec / RFC 2083 — public standard).
  *
  * Scope: non-interlaced, 8-bit, grayscale (color type 0) and truecolor
  * (color type 2) — the common training-corpus cases — with the FULL
  * filter surface: all five scanline filters (None/Sub/Up/Average/Paeth)
  * are implemented on both the encode and decode side, chunk CRCs are
  * verified, and the zlib stream is inflated with the JDK's Inflater
  * (real DEFLATE, not a stub). Palette/alpha/16-bit/Adam7 are rejected
  * with descriptive errors, mirroring the Jpeg codec's honesty about
  * progressive/arithmetic streams.
  *
  * Why this design: unlike JPEG, PNG is lossless, so a decode is
  * bit-exact by construction and the digest-replay oracle needs no
  * numerical argument — the interesting surface is the container
  * (chunk walk + CRC), the DEFLATE stream, and the filter
  * reconstruction, each of which fails loudly on hostile input
  * (same byte-mutation fuzz contract as Jpeg/Bmp/Wav).
  *
  * Reference behavior covered: the reference pipeline treats attachments
  * as opaque typed blobs (assay.py:123-140); this codec is part of the
  * mandated multimodal extension (SURVEY C12), not a reference port.
  */
object Png {

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Decoded image: `pixels` is the unfiltered sample stream, row-major,
    * `channels` interleaved bytes per pixel (1 = gray, 3 = RGB).
    */
  final case class Image(width: Int, height: Int, colorType: Int,
      channels: Int, pixels: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"PNG: $msg")

  private def u32(bytes: Array[Byte], at: Int): Long = {
    if (at + 4 > bytes.length) fail(s"truncated u32 at $at")
    ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
      ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
  }

  /** Decode a PNG stream. Every failure mode — bad signature, chunk CRC
    * mismatch, malformed zlib data, wrong inflated size, out-of-range
    * filter byte, unsupported variant — raises IllegalArgumentException
    * with a descriptive message (the codec fuzz contract).
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
    var width, height, colorType, channels = -1
    var sawIhdr, sawIend, inIdat, idatDone = false
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
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case 3 => fail("palette (color type 3) unsupported")
            case 4 | 6 => fail(s"alpha (color type $colorType) unsupported")
            case t => fail(s"unknown color type $t")
          }
          if (bitDepth != 8) fail(s"bit depth $bitDepth unsupported (8 only)")
          if (compression != 0) fail(s"unknown compression method $compression")
          if (filterMethod != 0) fail(s"unknown filter method $filterMethod")
          if (interlace == 1) fail("Adam7 interlace unsupported")
          if (interlace != 0) fail(s"unknown interlace method $interlace")
          width = w.toInt
          height = h.toInt
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) fail("IDAT before IHDR")
          if (idatDone) fail("IDAT chunks are not consecutive")
          idat.write(bytes, dataAt, len.toInt)
          inIdat = true
        case "IEND" =>
          if (len != 0) fail(s"IEND length $len != 0")
          sawIend = true
        case other =>
          if (!sawIhdr) fail(s"'$other' chunk before IHDR")
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

    // --- zlib inflate into the EXACT expected size (zip-bomb guard:
    // anything past expected+1 probe byte is an error, not an alloc) ---
    val stride = 1 + width * channels // filter byte + samples
    val expected = stride * height
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

    // --- per-row unfilter (spec §6): bpp = bytes per complete pixel ---
    val bpp = channels
    val pixels = new Array[Byte](width * channels * height)
    val rowBytes = width * channels
    var y = 0
    while (y < height) {
      val filter = raw(y * stride) & 0xff
      val src = y * stride + 1
      val dst = y * rowBytes
      val prior = dst - rowBytes // valid only when y > 0
      var x = 0
      filter match {
        case 0 => // None
          System.arraycopy(raw, src, pixels, dst, rowBytes)
        case 1 => // Sub: Recon(x) = Filt(x) + Recon(x - bpp)
          while (x < rowBytes) {
            val left = if (x >= bpp) pixels(dst + x - bpp) & 0xff else 0
            pixels(dst + x) = ((raw(src + x) & 0xff) + left).toByte
            x += 1
          }
        case 2 => // Up: + Prior(x)
          while (x < rowBytes) {
            val up = if (y > 0) pixels(prior + x) & 0xff else 0
            pixels(dst + x) = ((raw(src + x) & 0xff) + up).toByte
            x += 1
          }
        case 3 => // Average: + floor((left + up) / 2)
          while (x < rowBytes) {
            val left = if (x >= bpp) pixels(dst + x - bpp) & 0xff else 0
            val up = if (y > 0) pixels(prior + x) & 0xff else 0
            pixels(dst + x) = ((raw(src + x) & 0xff) + (left + up) / 2).toByte
            x += 1
          }
        case 4 => // Paeth predictor
          while (x < rowBytes) {
            val left = if (x >= bpp) pixels(dst + x - bpp) & 0xff else 0
            val up = if (y > 0) pixels(prior + x) & 0xff else 0
            val ul = if (x >= bpp && y > 0) pixels(prior + x - bpp) & 0xff else 0
            pixels(dst + x) = ((raw(src + x) & 0xff) + paeth(left, up, ul)).toByte
            x += 1
          }
        case f => fail(s"unknown filter type $f in row $y")
      }
      y += 1
    }
    Image(width, height, colorType, channels, pixels)
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

  /** Encode `pixels` (row-major, `channels` interleaved bytes per pixel)
    * as a non-interlaced 8-bit PNG. `filterFor(y)` picks the scanline
    * filter per row (default cycles 0→4 so a round-trip exercises every
    * reconstruction path); the filtered bytes are computed per spec, so
    * any conformant decoder recovers `pixels` exactly.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ % 5): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(channels == 1 || channels == 3, s"channels=$channels (1 or 3)")
    require(pixels.length == width * channels * height,
      s"need ${width * channels * height} bytes, got ${pixels.length}")
    val colorType = if (channels == 1) 0 else 2
    val rowBytes = width * channels
    val bpp = channels

    // filter the scanlines (the inverse of the decode reconstruction)
    val raw = new Array[Byte]((1 + rowBytes) * height)
    var y = 0
    while (y < height) {
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f out of range")
      raw(y * (1 + rowBytes)) = f.toByte
      val dst = y * (1 + rowBytes) + 1
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
        raw(dst + x) = filtered.toByte
        x += 1
      }
      y += 1
    }

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
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.array())

    val defl = new Deflater()
    defl.setInput(raw)
    defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
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
