package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Pure-JVM APNG (animated PNG, RFC 2083 + the APNG extension now in the
  * PNG spec third edition): the LOSSLESS animated-image sibling of the
  * GIF codec — acTL/fcTL/fdAT chunk grammar, strict sequence-number
  * validation, per-frame regions with x/y offsets, dispose_op
  * NONE/BACKGROUND/PREVIOUS and blend_op SOURCE/OVER compositing over an
  * RGBA canvas.
  *
  * Per-frame pixel data is literally a PNG image-data stream of the
  * frame's region, so both sides REUSE the complete [[Png]] codec: the
  * encoder builds each frame with [[Png.encode]] (cycling scanline
  * filters — every frame exercises unfiltering) and lifts out its IDAT
  * payload; the decoder re-wraps each frame's payload as a one-frame PNG
  * and runs [[Png.decode]] (CRC walk, Inflater, filters), then
  * composites.
  *
  * Subset (rejected by name, never mis-decoded): canvas color types
  * other than 8-bit RGBA, a hidden default image (an IDAT without a
  * preceding fcTL — our grammar requires frame 0 to BE the default
  * image, the common authoring shape).
  */
object Apng {

  /** One animation frame: an RGBA region (w*h*4 bytes) at (xOff, yOff).
    * disposeOp: 0 = NONE, 1 = BACKGROUND (clear region to transparent
    * black before the next frame), 2 = PREVIOUS (revert region).
    * blendOp: 0 = SOURCE (replace), 1 = OVER (alpha composite).
    */
  final case class Frame(width: Int, height: Int, xOff: Int, yOff: Int,
      disposeOp: Int, blendOp: Int, pixels: Array[Byte])

  /** Decoded animation: `canvases(i)` is the full RGBA canvas as
    * displayed after frame i (post-draw, pre-dispose).
    */
  final case class Anim(width: Int, height: Int, numPlays: Int,
      canvases: IndexedSeq[Array[Byte]])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"APNG: $msg")

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def u32(bytes: Array[Byte], at: Int): Long =
    ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
      ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def be32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(data.length)
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    be32(crc.getValue)
  }

  /** IDAT payload (all IDAT chunks concatenated) of a PNG byte stream. */
  private def idatPayload(png: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var off = 8
    while (off + 8 <= png.length) {
      val len = u32(png, off).toInt
      val typ = new String(png, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") out.write(png, off + 8, len)
      off += 12 + len
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- encode

  /** Encode an APNG. Frame 0 must cover the full canvas at (0,0) — it is
    * the stream's default image (fcTL before IDAT).
    */
  def encode(width: Int, height: Int, frames: Seq[Frame],
      numPlays: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "APNG needs at least one frame")
    val f0 = frames.head
    require(f0.width == width && f0.height == height &&
      f0.xOff == 0 && f0.yOff == 0, "frame 0 must cover the full canvas")
    frames.foreach { f =>
      require(f.pixels.length == f.width * f.height * 4,
        s"frame pixels ${f.pixels.length} != ${f.width}x${f.height} RGBA")
      require(f.xOff >= 0 && f.yOff >= 0 &&
        f.xOff + f.width <= width && f.yOff + f.height <= height,
        "frame region outside the canvas")
      require(f.disposeOp >= 0 && f.disposeOp <= 2 &&
        f.blendOp >= 0 && f.blendOp <= 1, "bad dispose/blend op")
    }
    val out = new ByteArrayOutputStream()
    Signature.foreach(out.write)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(6.toByte) // 8-bit RGBA
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "acTL", java.nio.ByteBuffer.allocate(8)
      .putInt(frames.length).putInt(numPlays).array())
    var seq = 0
    for ((f, i) <- frames.zipWithIndex) {
      val fctl = java.nio.ByteBuffer.allocate(26)
        .putInt(seq).putInt(f.width).putInt(f.height)
        .putInt(f.xOff).putInt(f.yOff)
        .putShort(1).putShort(10) // delay 1/10 s
        .put(f.disposeOp.toByte).put(f.blendOp.toByte)
      writeChunk(out, "fcTL", fctl.array())
      seq += 1
      val payload = idatPayload(
        Png.encode(f.width, f.height, 4, f.pixels))
      if (i == 0) writeChunk(out, "IDAT", payload)
      else {
        val fdat = new Array[Byte](4 + payload.length)
        fdat(0) = ((seq >>> 24) & 0xff).toByte
        fdat(1) = ((seq >>> 16) & 0xff).toByte
        fdat(2) = ((seq >>> 8) & 0xff).toByte
        fdat(3) = (seq & 0xff).toByte
        System.arraycopy(payload, 0, fdat, 4, payload.length)
        writeChunk(out, "fdAT", fdat)
        seq += 1
      }
    }
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // -------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Anim = {
    if (bytes.length < 8 || (0 until 8).exists(i => (bytes(i) & 0xff) != Signature(i)))
      fail("bad signature")
    var off = 8
    var width, height = -1
    var numFrames, numPlays = -1
    var expectSeq = 0
    var sawIend = false
    // per-frame accumulation: (fcTL fields, concatenated payload)
    final class Pending(val w: Int, val h: Int, val x: Int, val y: Int,
        val dispose: Int, val blend: Int) {
      val data = new ByteArrayOutputStream()
    }
    val pendings = scala.collection.mutable.ArrayBuffer[Pending]()
    var current: Pending = null
    while (off + 12 <= bytes.length && !sawIend) {
      val len = u32(bytes, off).toInt
      if (len < 0 || off + 12L + len > bytes.length) fail(s"truncated chunk at $off")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue != u32(bytes, off + 8 + len))
        fail(s"CRC mismatch in '$typ'")
      val dataAt = off + 8
      // spec §5.6: IHDR must be the FIRST chunk, and the fixed-length
      // chunks must carry their full payload (a short fcTL would
      // otherwise mis-parse into the CRC bytes)
      if (width < 0 && typ != "IHDR") fail(s"chunk '$typ' before IHDR")
      typ match {
        case "IHDR" =>
          if (width >= 0) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len != 13")
          width = u32(bytes, dataAt).toInt
          height = u32(bytes, dataAt + 4).toInt
          val depth = bytes(dataAt + 8) & 0xff
          val colorType = bytes(dataAt + 9) & 0xff
          if (depth != 8 || colorType != 6)
            fail(s"unsupported canvas depth=$depth colorType=$colorType (8-bit RGBA subset)")
          if (width <= 0 || height <= 0 || width.toLong * height > (1L << 24))
            fail(s"unreasonable canvas ${width}x$height")
        case "acTL" =>
          if (len != 8) fail(s"acTL length $len != 8")
          if (numFrames >= 0) fail("duplicate acTL")
          if (pendings.nonEmpty) fail("acTL after the first frame")
          numFrames = u32(bytes, dataAt).toInt
          numPlays = u32(bytes, dataAt + 4).toInt
          if (numFrames <= 0) fail(s"acTL num_frames $numFrames")
        case "fcTL" =>
          if (numFrames < 0) fail("fcTL before acTL")
          if (len != 26) fail(s"fcTL length $len != 26")
          val seq = u32(bytes, dataAt).toInt
          if (seq != expectSeq) fail(s"fcTL sequence $seq, expected $expectSeq")
          expectSeq += 1
          val fw = u32(bytes, dataAt + 4).toInt
          val fh = u32(bytes, dataAt + 8).toInt
          val fx = u32(bytes, dataAt + 12).toInt
          val fy = u32(bytes, dataAt + 16).toInt
          val dispose = bytes(dataAt + 24) & 0xff
          val blend = bytes(dataAt + 25) & 0xff
          // u32→Int can go negative (e.g. 0xFFFFFFFF → -1); a negative
          // offset must fail here, not composite in-bounds on a prior row,
          // and the extent sums are compared in Long so they cannot wrap
          if (fw <= 0 || fh <= 0 || fx < 0 || fy < 0 ||
              fx.toLong + fw > width || fy.toLong + fh > height)
            fail(s"frame region ${fw}x$fh+$fx+$fy outside ${width}x$height")
          if (dispose > 2) fail(s"unknown dispose_op $dispose")
          if (blend > 1) fail(s"unknown blend_op $blend")
          current = new Pending(fw, fh, fx, fy, dispose, blend)
          pendings += current
        case "IDAT" =>
          if (current == null || pendings.length != 1)
            fail("IDAT without a leading fcTL (hidden default image unsupported)")
          current.data.write(bytes, dataAt, len)
        case "fdAT" =>
          if (current == null || pendings.length < 2) fail("fdAT before the second fcTL")
          if (len < 4) fail(s"fdAT length $len < 4")
          val seq = u32(bytes, dataAt).toInt
          if (seq != expectSeq) fail(s"fdAT sequence $seq, expected $expectSeq")
          expectSeq += 1
          current.data.write(bytes, dataAt + 4, len - 4)
        case "IEND" =>
          if (len != 0) fail("IEND length != 0")
          sawIend = true
        case other =>
          if ((other.charAt(0) & 0x20) == 0) fail(s"unknown critical chunk '$other'")
      }
      off += 12 + len
    }
    if (!sawIend) fail("no IEND")
    if (off != bytes.length) fail(s"${bytes.length - off} trailing bytes after IEND")
    if (pendings.length != numFrames)
      fail(s"acTL declares $numFrames frames, stream carries ${pendings.length}")
    // decode each frame region through the full PNG machinery
    val frames = pendings.map { p =>
      val mini = new ByteArrayOutputStream()
      Signature.foreach(mini.write)
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(p.w).putInt(p.h)
        .put(8.toByte).put(6.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      writeChunk(mini, "IHDR", ihdr.array())
      writeChunk(mini, "IDAT", p.data.toByteArray)
      writeChunk(mini, "IEND", Array.emptyByteArray)
      val img = Png.decode(mini.toByteArray)
      (p, img.pixels)
    }
    // composite
    val canvas = new Array[Byte](width * height * 4) // transparent black
    val canvases = IndexedSeq.newBuilder[Array[Byte]]
    for ((p, px) <- frames) {
      val snapshot =
        if (p.dispose == 2) java.util.Arrays.copyOf(canvas, canvas.length)
        else null
      var y = 0
      while (y < p.h) {
        var x = 0
        while (x < p.w) {
          val src = (y * p.w + x) * 4
          val dst = ((p.y + y) * width + (p.x + x)) * 4
          if (p.blend == 0) { // SOURCE
            var c = 0
            while (c < 4) { canvas(dst + c) = px(src + c); c += 1 }
          } else { // OVER — APNG spec compositing, exact integer form
            val sa = px(src + 3) & 0xff
            if (sa == 255) {
              var c = 0
              while (c < 4) { canvas(dst + c) = px(src + c); c += 1 }
            } else if (sa > 0) {
              val da = canvas(dst + 3) & 0xff
              // alphas/colors in 1/255 fixed point: oa*255² = sa*255 + da*(255-sa)
              val oa255 = sa * 255 + da * (255 - sa) // out alpha × 255
              var c = 0
              while (c < 3) {
                val sc = px(src + c) & 0xff
                val dc = canvas(dst + c) & 0xff
                // oc = (sc*sa*255 + dc*da*(255-sa)) / (oa*255²) , rounded
                val num = sc * sa * 255 + dc * da * (255 - sa)
                canvas(dst + c) =
                  (if (oa255 == 0) 0 else (num + oa255 / 2) / oa255).toByte
                c += 1
              }
              canvas(dst + 3) = ((oa255 + 127) / 255).toByte
            } // sa == 0: leave dst
          }
          x += 1
        }
        y += 1
      }
      canvases += java.util.Arrays.copyOf(canvas, canvas.length)
      // dispose for the NEXT frame
      p.dispose match {
        case 1 => // BACKGROUND: clear the region
          var yy = 0
          while (yy < p.h) {
            java.util.Arrays.fill(canvas,
              ((p.y + yy) * width + p.x) * 4,
              ((p.y + yy) * width + p.x + p.w) * 4, 0.toByte)
            yy += 1
          }
        case 2 => // PREVIOUS: revert the region
          var yy = 0
          while (yy < p.h) {
            val at = ((p.y + yy) * width + p.x) * 4
            System.arraycopy(snapshot, at, canvas, at, p.w * 4)
            yy += 1
          }
        case _ => ()
      }
    }
    Anim(width, height, numPlays, canvases.result())
  }
}
