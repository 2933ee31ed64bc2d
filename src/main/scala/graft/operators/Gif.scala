package graft.operators

/** Pure-JVM animated-GIF (87a/89a) codec: real LZW with dictionary
  * growth/clear/KwKwK, sub-block framing, 4-pass interlace, global and
  * local color tables, GCE transparency, and full inter-frame
  * compositing under disposal methods 0-3 — the first genuinely
  * INTER-FRAME video format in the multimodal surface (each frame is a
  * delta rectangle composited onto the evolving canvas; MJPEG in
  * [[Jpeg]] is intra-only). Motion-compensated entropy-coded codecs
  * (H.264-class, MP3-class) remain the named exclusions.
  *
  * Encoder and decoder are independent implementations of the spec
  * (encoder: dictionary-building compressor; decoder: table
  * reconstruction) and the gate's oracle replays the composited values
  * from the digest bytes alone, so an encoder/decoder bug pair cannot
  * self-confirm; GifSpec additionally decodes a hand-assembled byte
  * vector to pin LZW against the spec rather than the encoder.
  */
object Gif {

  /** One decoded frame: palette INDICES (de-interlaced, raster order)
    * plus the compositing controls that govern how it lands on the
    * canvas.
    */
  final case class Frame(x: Int, y: Int, w: Int, h: Int,
      indices: Array[Int], disposal: Int, transparent: Int,
      interlaced: Boolean, localPalette: Option[Array[Int]])

  /** Decoded stream: logical screen + frames. Palettes are flat arrays
    * of 0xRRGGBB.
    */
  final case class Image(width: Int, height: Int, bgIndex: Int,
      globalPalette: Array[Int], frames: Vector[Frame])

  /** Frame description for the encoder. `transparent` < 0 = opaque. */
  final case class FrameSpec(x: Int, y: Int, w: Int, h: Int,
      indices: Array[Int], disposal: Int = 0, transparent: Int = -1,
      interlace: Boolean = false, localPalette: Option[Array[Int]] = None)

  /** 256-entry identity grayscale palette (index i → gray i). */
  def grayPalette(reversed: Boolean = false): Array[Int] =
    Array.tabulate(256)(i => { val v = if (reversed) 255 - i else i
      (v << 16) | (v << 8) | v })

  // ---------------------------------------------------------------- encode

  def encode(width: Int, height: Int, bgIndex: Int,
      frames: Seq[FrameSpec]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    out.write(0xf7) // global table, 8-bit resolution, 256 entries
    out.write(bgIndex); out.write(0)
    writePalette(out, grayPalette())
    // NETSCAPE2.0 looping application extension — decoders must skip
    // unknown/application extensions via sub-block framing
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); le16(0); out.write(0)
    for (f <- frames) {
      require(f.indices.length == f.w * f.h, "frame pixel count mismatch")
      require(f.x >= 0 && f.y >= 0 && f.x + f.w <= width && f.y + f.h <= height,
        s"frame rect (${f.x},${f.y} ${f.w}x${f.h}) outside ${width}x$height")
      require(f.indices.forall(v => v >= 0 && v <= 255),
        "palette indices must be 0-255 (256+ would alias LZW control codes)")
      // graphic control extension
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transparent >= 0) 1 else 0))
      le16(10) // delay, centiseconds
      out.write(if (f.transparent >= 0) f.transparent else 0)
      out.write(0)
      // image descriptor
      out.write(0x2c)
      le16(f.x); le16(f.y); le16(f.w); le16(f.h)
      // local-table size field is log2(entries)-1; the table written
      // below must match it exactly or every following byte misparses
      val localSizeBits = f.localPalette.map { pal =>
        require(pal.length >= 2 && pal.length <= 256 &&
          Integer.bitCount(pal.length) == 1,
          s"local palette must be a power of two 2..256, got ${pal.length}")
        31 - Integer.numberOfLeadingZeros(pal.length) - 1
      }
      out.write((if (f.localPalette.isDefined) 0x80 else 0) |
        (if (f.interlace) 0x40 else 0) | localSizeBits.getOrElse(0))
      f.localPalette.foreach(writePalette(out, _))
      val rows =
        if (f.interlace) interlaceOrder(f.h).flatMap(r =>
          f.indices.slice(r * f.w, (r + 1) * f.w))
        else f.indices.toSeq
      out.write(8) // LZW minimum code size
      writeSubBlocks(out, lzwEncode(rows.toArray, 8))
    }
    out.write(0x3b)
    out.toByteArray
  }

  private def writePalette(out: java.io.ByteArrayOutputStream,
      pal: Array[Int]): Unit =
    pal.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
    }

  private def writeSubBlocks(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n)
      off += n
    }
    out.write(0)
  }

  /** GIF-variant LZW compress: variable code width (min+1 .. 12 bits,
    * LSB-first packing), clear/EOI codes, dictionary as a (prefix-code,
    * byte) trie, clear emitted on table overflow.
    */
  private[operators] def lzwEncode(pixels: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bits = new BitWriter
    // boxed key/value: a primitive-specialized HashMap would auto-unbox
    // get() misses to 0, silently aliasing every miss to code 0
    var dict = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    def reset(): Unit = {
      dict = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
      nextCode = eoi + 1; codeSize = minCode + 1
    }
    bits.write(clear, codeSize)
    if (pixels.isEmpty) { bits.write(eoi, codeSize); return bits.result() }
    var w = pixels(0)
    var i = 1
    while (i < pixels.length) {
      val k = pixels(i)
      val key = (w.toLong << 12) | k
      val hit = dict.get(key)
      if (hit != null) w = hit.intValue()
      else {
        bits.write(w, codeSize)
        dict.put(key, nextCode)
        nextCode += 1
        if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        if (nextCode == 4096) { bits.write(clear, codeSize); reset() }
        w = k
      }
      i += 1
    }
    bits.write(w, codeSize)
    bits.write(eoi, codeSize)
    bits.result()
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8
      }
    }
    def result(): Array[Byte] = {
      if (nbits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Image = {
    val in = new Reader(bytes)
    val sig = new String(in.take(6), "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF: '$sig'")
    val width = in.le16(); val height = in.le16()
    require(width > 0 && height > 0 && width.toLong * height <= (1 << 26),
      s"hostile GIF dimensions ${width}x$height")
    val packed = in.u8()
    val bg = in.u8(); in.u8() // aspect
    val global =
      if ((packed & 0x80) != 0) readPalette(in, 2 << (packed & 7))
      else grayPalette()
    val frames = Vector.newBuilder[Frame]
    var disposal = 0
    var transparent = -1
    var done = false
    while (!done) {
      in.u8() match {
        case 0x3b => done = true
        case 0x21 => // extension
          val label = in.u8()
          if (label == 0xf9) {
            val size = in.u8()
            require(size == 4, s"GCE size $size")
            val p = in.u8()
            disposal = (p >> 2) & 7
            in.le16() // delay
            val t = in.u8()
            transparent = if ((p & 1) != 0) t else -1
            require(in.u8() == 0, "GCE not terminated")
          } else in.skipSubBlocks() // comment/app/plain-text: framed skip
        case 0x2c =>
          val x = in.le16(); val y = in.le16()
          val w = in.le16(); val h = in.le16()
          require(w > 0 && h > 0 && x + w <= width && y + h <= height,
            s"frame rect ($x,$y ${w}x$h) outside ${width}x$height canvas")
          val p = in.u8()
          val local =
            if ((p & 0x80) != 0) Some(readPalette(in, 2 << (p & 7)))
            else None
          val interlaced = (p & 0x40) != 0
          val minCode = in.u8()
          require(minCode >= 2 && minCode <= 8, s"LZW min code $minCode")
          val data = in.readSubBlocks()
          var idx = lzwDecode(data, minCode, w * h)
          if (interlaced) idx = deinterlace(idx, w, h)
          frames += Frame(x, y, w, h, idx, disposal, transparent,
            interlaced, local)
          disposal = 0; transparent = -1
        case b => sys.error(f"unknown GIF block 0x$b%02x")
      }
    }
    Image(width, height, bg, global, frames.result())
  }

  private def readPalette(in: Reader, n: Int): Array[Int] =
    Array.fill(n) {
      val r = in.u8(); val g = in.u8(); val b = in.u8()
      (r << 16) | (g << 8) | b
    }

  /** GIF LZW decompress with full table reconstruction: variable code
    * width, clear resets, the first-code-after-clear literal rule, and
    * the KwKwK case (a code referencing the entry being built).
    */
  private[operators] def lzwDecode(data: Array[Byte], minCode: Int,
      expect: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Int](expect)
    var n = 0
    // table as prefix links: suffix(code), prefix(code), length implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    val bits = new BitReader(data)
    def emit(code: Int): Int = { // writes the expansion, returns first byte
      var stack = List.empty[Int]
      var c = code
      while (c >= clear) { stack = suffix(c) :: stack; c = prefix(c) }
      stack = c :: stack
      for (v <- stack) {
        require(n < expect, s"LZW output exceeds $expect pixels")
        out(n) = v; n += 1
      }
      c
    }
    var code = bits.read(codeSize)
    while (code != eoi && code >= 0) {
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCode + 1; prev = -1
      } else {
        if (prev < 0) { // first code after clear: literal
          require(code < clear, s"first LZW code $code not a literal")
          emit(code)
          prev = code
        } else {
          val first =
            if (code < nextCode) emit(code)
            else { // KwKwK: code being defined right now = prev + first(prev)
              require(code == nextCode, s"LZW code $code beyond $nextCode")
              var c = prev
              while (c >= clear) c = prefix(c)
              emit(prev)
              require(n < expect, s"LZW output exceeds $expect pixels")
              out(n) = c; n += 1
              c
            }
          if (nextCode < 4096) {
            prefix(nextCode) = prev; suffix(nextCode) = first
            nextCode += 1
            // the decoder's table lags the encoder's by one add (its add
            // for stream position m happens after READING m+1), so it
            // grows at 1<<codeSize where the encoder grows at +1
            if (nextCode == (1 << codeSize) && codeSize < 12)
              codeSize += 1
          }
          prev = code
        }
      }
      code = if (n >= expect) {
        // all pixels delivered: the stream must TERMINATE cleanly —
        // require the next code to be EOI (a CLEAR directly before it is
        // tolerated; its reset width applies to the EOI read) instead of
        // silently accepting trailing entropy data (codec contract:
        // hostile input fails loudly — the PNG decoder's trailing-bytes
        // check is the sibling)
        var fin = bits.read(codeSize)
        if (fin == clear) fin = bits.read(minCode + 1)
        require(fin == eoi, s"LZW stream continues past $expect pixels (code $fin)")
        eoi
      } else bits.read(codeSize)
    }
    require(n == expect, s"LZW stream ended at $n of $expect pixels")
    out
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1; nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      v
    }
  }

  /** 4-pass interlace row order (rows 0,8,16…; 4,12…; 2,6…; 1,3,5…). */
  private[operators] def interlaceOrder(h: Int): Seq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  private def deinterlace(stored: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](stored.length)
    for ((row, i) <- interlaceOrder(h).zipWithIndex)
      System.arraycopy(stored, i * w, out, row * w, w)
    out
  }

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, "truncated GIF")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def le16(): Int = u8() | (u8() << 8)
    def take(n: Int): Array[Byte] = {
      require(pos + n <= bytes.length, "truncated GIF")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    def readSubBlocks(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var n = u8()
      while (n != 0) { out.write(take(n)); n = u8() }
      out.toByteArray
    }
    def skipSubBlocks(): Unit = {
      var n = u8()
      while (n != 0) { take(n); n = u8() }
    }
  }

  // ------------------------------------------------------------- composite

  /** Play the animation: composite every frame onto the logical screen
    * under its disposal method and transparency, returning the final
    * displayed canvas as 0xRRGGBB pixels. Disposal per GIF89a: 0/1 leave,
    * 2 restore the frame rect to the background color, 3 restore the
    * rect to the pre-frame canvas.
    */
  def composite(img: Image): Array[Int] = {
    val bgColor = img.globalPalette(
      math.min(img.bgIndex, img.globalPalette.length - 1))
    val canvas = Array.fill(img.width * img.height)(bgColor)
    for ((f, fi) <- img.frames.zipWithIndex) {
      val pal = f.localPalette.getOrElse(img.globalPalette)
      val saved = if (f.disposal == 3) canvas.clone() else null
      var i = 0
      while (i < f.indices.length) {
        val v = f.indices(i)
        if (v != f.transparent) {
          require(v < pal.length, s"palette index $v out of range")
          canvas((f.y + i / f.w) * img.width + (f.x + i % f.w)) = pal(v)
        }
        i += 1
      }
      // disposal prepares the canvas for the NEXT frame; the final
      // displayed state is after the last draw, so it never runs there
      if (fi < img.frames.length - 1) f.disposal match {
        case 2 =>
          for (r <- 0 until f.h; c <- 0 until f.w)
            canvas((f.y + r) * img.width + (f.x + c)) = bgColor
        case 3 =>
          for (r <- 0 until f.h; c <- 0 until f.w) {
            val p = (f.y + r) * img.width + (f.x + c)
            canvas(p) = saved(p)
          }
        case _ => ()
      }
    }
    canvas
  }
}
