package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class QoiSpec extends AnyFunSuite {

  private def rgba(vals: Seq[(Int, Int, Int, Int)]): Array[Byte] =
    vals.flatMap { case (r, g, b, a) => Seq(r, g, b, a) }.map(_.toByte).toArray

  test("every op path round-trips bit-exactly") {
    // a pixel sequence forcing RGB, RUN, DIFF, LUMA, INDEX and RGBA ops
    val pixels = rgba(Seq(
      (100, 100, 100, 255), // RGB literal (from the 0,0,0,255 start)
      (100, 100, 100, 255), // RUN
      (100, 100, 100, 255), // RUN (len 2)
      (101, 101, 99, 255),  // DIFF (+1,+1,-1)
      (120, 120, 120, 255), // LUMA (dg=19, drg=0, dbg=0)
      (100, 100, 100, 255), // INDEX (cache hit of the first color)
      (10, 200, 30, 128),   // RGBA (alpha change)
      (10, 200, 30, 128)))  // RUN
    val img = Qoi.decode(Qoi.encode(4, 2, pixels))
    assert(img.width == 4 && img.height == 2 && img.channels == 4)
    assert(img.pixels.toSeq == pixels.toSeq)
  }

  test("deterministic pseudo-random images round-trip at several sizes") {
    var x = 0x243F6A8885A308D3L
    for ((w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 9))) {
      val px = Array.fill(w * h * 4) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        ((x * 0x2545F4914F6CDD1DL) >>> 56).toByte
      }
      val enc = Qoi.encode(w, h, px)
      assert(Qoi.decode(enc).pixels.toSeq == px.toSeq, s"${w}x$h")
    }
    // compressible content actually compresses (runs + cache hits)
    val flat = Array.fill(64 * 64 * 4)(77.toByte)
    assert(Qoi.encode(64, 64, flat).length < 600)
  }

  test("hostile streams fail loudly") {
    val ok = Qoi.encode(2, 2, rgba(Seq((1, 2, 3, 255), (1, 2, 3, 255),
      (9, 9, 9, 255), (200, 1, 2, 4))))
    for (cut <- Seq(3, 13, ok.length - 9, ok.length - 1))
      intercept[IllegalArgumentException](
        Qoi.decode(java.util.Arrays.copyOf(ok, cut)))
    // every 1-byte corruption throws or decodes to a VALID image of the
    // declared size (QOI has no CRC — framing/marker errors must catch
    // the structural breaks; content bytes may legitimately change)
    var threw = 0
    for (i <- ok.indices) {
      val m = ok.clone(); m(i) = (m(i) ^ 0x81).toByte
      try { val d = Qoi.decode(m); assert(d.pixels.length == d.width * d.height * 4) }
      catch { case _: IllegalArgumentException => threw += 1 }
    }
    assert(threw > 0)
    // bad magic / dims
    intercept[IllegalArgumentException](Qoi.decode("qoixAAAA".getBytes ++ ok.drop(8)))
  }
}
