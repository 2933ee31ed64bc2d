package graft.operators

/** Pure-JVM QOI ("Quite OK Image", qoiformat.org — public-domain spec):
  * the modern single-pass lossless image format. Byte-oriented ops over
  * a running pixel + a 64-entry hash-indexed color cache:
  * RGB/RGBA literals, INDEX (cache hit), DIFF (±2 channel deltas),
  * LUMA (green-anchored deltas), RUN (1..62 repeats), with the
  * `(r*3+g*5+b*7+a*11) % 64` cache hash and the 7×0x00,0x01 end marker.
  * Lossless ⇒ decode(encode(x)) == x for ANY pixels — every digest
  * oracle applies directly.
  */
object Qoi {

  final case class QoiImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) // RGBA interleaved, w*h*4

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"QOI: $msg")

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) & 63

  /** Encode RGBA pixels (w*h*4 bytes). `channels` is metadata (3 or 4)
    * recorded in the header, as the spec defines.
    */
  def encode(width: Int, height: Int, pixels: Array[Byte],
      channels: Int = 4): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height * 4,
      s"need ${width * height * 4} RGBA bytes, got ${pixels.length}")
    require(channels == 3 || channels == 4, s"channels=$channels")
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(width); be32(height)
    out.write(channels); out.write(0) // sRGB with linear alpha
    val cache = new Array[Int](64) // packed RGBA; all zero = r=g=b=a=0
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    var i = 0
    val n = width * height
    while (i < n) {
      val r = pixels(i * 4) & 0xff
      val g = pixels(i * 4 + 1) & 0xff
      val b = pixels(i * 4 + 2) & 0xff
      val a = pixels(i * 4 + 3) & 0xff
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val h = hash(r, g, b, a)
        val packed = (r << 24) | (g << 16) | (b << 8) | a
        if (cache(h) == packed) out.write(h) // QOI_OP_INDEX
        else {
          cache(h) = packed
          if (a == pa) {
            val dr = r - pr; val dg = g - pg; val db = b - pb
            val drg = dr - dg; val dbg = db - dg
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
              dbg >= -8 && dbg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(b)
            }
          } else {
            out.write(0xff); out.write(r); out.write(g); out.write(b); out.write(a)
          }
        }
        pr = r; pg = g; pb = b; pa = a
      }
      i += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): QoiImage = {
    if (bytes.length < 14 + 8) fail("stream shorter than header + end marker")
    if (bytes(0) != 'q' || bytes(1) != 'o' || bytes(2) != 'i' || bytes(3) != 'f')
      fail("bad qoif magic")
    def be32(at: Int): Int =
      ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
        ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
    val width = be32(4)
    val height = be32(8)
    val channels = bytes(12) & 0xff
    val colorspace = bytes(13) & 0xff
    if (width <= 0 || height <= 0 || width.toLong * height > (1L << 24))
      fail(s"unreasonable dimensions ${width}x$height")
    if (channels != 3 && channels != 4) fail(s"bad channels $channels")
    if (colorspace > 1) fail(s"bad colorspace $colorspace")
    val n = width * height
    val px = new Array[Byte](n * 4)
    val cache = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var i = 0
    var off = 14
    val dataEnd = bytes.length - 8
    while (i < n) {
      if (off >= dataEnd) fail(s"stream ended at pixel $i of $n")
      val op = bytes(off) & 0xff
      off += 1
      var run = 1
      if (op == 0xfe) { // RGB
        if (off + 3 > dataEnd) fail("truncated RGB op")
        pr = bytes(off) & 0xff; pg = bytes(off + 1) & 0xff
        pb = bytes(off + 2) & 0xff
        off += 3
        cache(hash(pr, pg, pb, pa)) = (pr << 24) | (pg << 16) | (pb << 8) | pa
      } else if (op == 0xff) { // RGBA
        if (off + 4 > dataEnd) fail("truncated RGBA op")
        pr = bytes(off) & 0xff; pg = bytes(off + 1) & 0xff
        pb = bytes(off + 2) & 0xff; pa = bytes(off + 3) & 0xff
        off += 4
        cache(hash(pr, pg, pb, pa)) = (pr << 24) | (pg << 16) | (pb << 8) | pa
      } else (op >> 6) match {
        case 0 => // INDEX
          val v = cache(op & 63)
          pr = (v >>> 24) & 0xff; pg = (v >>> 16) & 0xff
          pb = (v >>> 8) & 0xff; pa = v & 0xff
        case 1 => // DIFF
          pr = (pr + ((op >> 4) & 3) - 2) & 0xff
          pg = (pg + ((op >> 2) & 3) - 2) & 0xff
          pb = (pb + (op & 3) - 2) & 0xff
          cache(hash(pr, pg, pb, pa)) = (pr << 24) | (pg << 16) | (pb << 8) | pa
        case 2 => // LUMA
          if (off + 1 > dataEnd) fail("truncated LUMA op")
          val dg = (op & 63) - 32
          val b2 = bytes(off) & 0xff
          off += 1
          pr = (pr + dg + ((b2 >> 4) & 15) - 8) & 0xff
          pg = (pg + dg) & 0xff
          pb = (pb + dg + (b2 & 15) - 8) & 0xff
          cache(hash(pr, pg, pb, pa)) = (pr << 24) | (pg << 16) | (pb << 8) | pa
        case _ => // RUN
          run = (op & 63) + 1
          if (run > 62) fail(s"run $run > 62 (reserved op)")
      }
      var k = 0
      while (k < run) {
        if (i >= n) fail("ops decode more pixels than the header declares")
        px(i * 4) = pr.toByte; px(i * 4 + 1) = pg.toByte
        px(i * 4 + 2) = pb.toByte; px(i * 4 + 3) = pa.toByte
        i += 1; k += 1
      }
    }
    if (off != dataEnd) fail(s"${dataEnd - off} trailing data bytes before the end marker")
    var k = 0
    while (k < 7) {
      if (bytes(dataEnd + k) != 0) fail("bad end marker")
      k += 1
    }
    if (bytes(dataEnd + 7) != 1) fail("bad end marker terminator")
    QoiImage(width, height, channels, px)
  }
}
