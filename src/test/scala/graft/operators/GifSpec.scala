package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {

  test("LZW round-trip: single frame, distinct bytes") {
    val px = Array.tabulate(16)(i => (i * 13 + 7) % 256)
    val bytes = Gif.encode(4, 4, 0, Seq(Gif.FrameSpec(0, 0, 4, 4, px)))
    val img = Gif.decode(bytes)
    assert(img.width == 4 && img.height == 4 && img.frames.length == 1)
    assert(img.frames(0).indices.toSeq == px.toSeq)
  }

  test("LZW round-trip: large frame crosses 9->10->11 bit code growth") {
    val w = 64; val h = 64
    // varied-but-repetitive content so the dictionary grows fast
    val px = Array.tabulate(w * h)(i => (i * i + i / 3) % 251)
    val img = Gif.decode(Gif.encode(w, h, 0,
      Seq(Gif.FrameSpec(0, 0, w, h, px))))
    assert(img.frames(0).indices.toSeq == px.toSeq)
    // constant runs exercise KwKwK chains
    val runs = Array.tabulate(w * h)(i => (i / 97) % 256)
    val img2 = Gif.decode(Gif.encode(w, h, 0,
      Seq(Gif.FrameSpec(0, 0, w, h, runs))))
    assert(img2.frames(0).indices.toSeq == runs.toSeq)
  }

  test("hand-assembled LZW stream decodes per spec (KwKwK, no encoder)") {
    // minCode=2: clear=4, eoi=5, first free=6, initial width 3.
    // Pixels 1,1,1,1 encode as: clear, 1, 6(KwKwK: "11"), 1, eoi
    // widths: 3,3,3,3(code 6 added after reading -> width grows later)
    val codes = Seq((4, 3), (1, 3), (6, 3), (1, 3), (5, 3))
    var acc = 0L; var nbits = 0
    val out = new java.io.ByteArrayOutputStream()
    for ((c, w) <- codes) {
      acc |= c.toLong << nbits; nbits += w
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    if (nbits > 0) out.write((acc & 0xff).toInt)
    val px = Gif.lzwDecode(out.toByteArray, 2, 4)
    assert(px.toSeq == Seq(1, 1, 1, 1))
  }

  test("interlace order for h=4 is rows 0,2,1,3") {
    assert(Gif.interlaceOrder(4) == Seq(0, 2, 1, 3))
    assert(Gif.interlaceOrder(8) == Seq(0, 4, 2, 6, 1, 3, 5, 7))
  }

  test("animation compositing: disposal 2/3, transparency, local palette") {
    val g = Array.tabulate(16)(i => (i * 17 + 3) % 256)
    val bytes = Gif.encode(4, 4, 0, Seq(
      Gif.FrameSpec(0, 0, 4, 4, g, disposal = 1, interlace = true),
      Gif.FrameSpec(1, 1, 2, 2, g.take(4).map(255 - _), disposal = 2),
      Gif.FrameSpec(0, 0, 2, 2, Array(0, g(4), 0, g(5)),
        disposal = 1, transparent = 0),
      Gif.FrameSpec(0, 2, 2, 2, g.slice(7, 11).map(v => 255 - v),
        disposal = 3, localPalette = Some(Gif.grayPalette(reversed = true))),
      Gif.FrameSpec(3, 3, 1, 1, Array(g(6)))))
    val img = Gif.decode(bytes)
    assert(img.frames.length == 5)
    assert(img.frames(0).interlaced && img.frames(3).localPalette.isDefined)
    val gray = Gif.composite(img).map(_ & 0xff) // identity gray: b == gray
    val want = Array(
      g(0), if (g(4) != 0) g(4) else g(1), g(2), g(3),
      g(4), if (g(5) != 0) g(5) else 0, 0, g(7),
      g(8), 0, 0, g(11),
      g(12), g(13), g(14), g(6))
    assert(gray.toSeq == want.toSeq)
  }

  test("non-256-entry local palettes write correct size bits and round-trip") {
    // 4-entry local palette: size field must say 4, not 256, or every
    // byte after the table misparses
    val pal = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff)
    val img = Gif.decode(Gif.encode(2, 2, 0, Seq(
      Gif.FrameSpec(0, 0, 2, 2, Array(0, 1, 2, 3),
        localPalette = Some(pal)))))
    assert(img.frames(0).localPalette.get.toSeq == pal.toSeq)
    assert(Gif.composite(img).toSeq == pal.toSeq)
    // non-power-of-two palettes cannot be encoded in the size field
    intercept[IllegalArgumentException](Gif.encode(2, 2, 0, Seq(
      Gif.FrameSpec(0, 0, 2, 2, Array(0, 1, 2, 0),
        localPalette = Some(pal.take(3))))))
    // encoder rejects out-of-range indices and out-of-canvas rects
    intercept[IllegalArgumentException](Gif.encode(2, 2, 0,
      Seq(Gif.FrameSpec(0, 0, 2, 2, Array(0, 1, 2, 256)))))
    intercept[IllegalArgumentException](Gif.encode(2, 2, 0,
      Seq(Gif.FrameSpec(1, 1, 2, 2, Array(0, 1, 2, 3)))))
  }

  test("malformed streams fail with clear errors, not garbage") {
    val good = Gif.encode(2, 2, 0,
      Seq(Gif.FrameSpec(0, 0, 2, 2, Array(1, 2, 3, 4))))
    intercept[IllegalArgumentException](Gif.decode("GIF89a".getBytes))
    intercept[IllegalArgumentException](
      Gif.decode("JPEG nope definitely not a gif".getBytes))
    // truncation at every prefix: clear error or success, never garbage
    for (n <- 1 until good.length) {
      try {
        val img = Gif.decode(java.util.Arrays.copyOf(good, n))
        assert(img.frames.forall(_.indices.length == 4))
      } catch {
        case _: IllegalArgumentException | _: RuntimeException => ()
      }
    }
    // single-byte mutations: decode must never loop or emit wrong-size
    for (i <- 0 until good.length) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      try {
        val img = Gif.decode(bad)
        img.frames.foreach(f => assert(f.indices.length == f.w * f.h))
      } catch {
        case _: IllegalArgumentException | _: RuntimeException => ()
      }
    }
  }
}
