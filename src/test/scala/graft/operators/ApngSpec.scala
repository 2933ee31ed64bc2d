package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ApngSpec extends AnyFunSuite {

  private def gray(vals: Int*): Array[Byte] =
    vals.flatMap(v => Seq(v, v, v, 255)).map(_.toByte).toArray

  private def rgbaAt(canvas: Array[Byte], w: Int, x: Int, y: Int): Seq[Int] =
    (0 until 4).map(c => canvas((y * w + x) * 4 + c) & 0xff)

  test("single full-canvas frame round-trips through the PNG machinery") {
    val px = gray(1 to 12: _*)
    val a = Apng.decode(Apng.encode(4, 3, Seq(
      Apng.Frame(4, 3, 0, 0, 0, 0, px))))
    assert(a.width == 4 && a.height == 3 && a.canvases.length == 1)
    assert(a.canvases.head.toSeq == px.toSeq)
  }

  test("dispose BACKGROUND clears, PREVIOUS reverts, regions offset correctly") {
    val f0 = gray(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120,
      130, 140, 150, 160) // 4×4
    val a = Apng.decode(Apng.encode(4, 4, Seq(
      Apng.Frame(4, 4, 0, 0, 0, 0, f0),
      Apng.Frame(2, 2, 0, 0, 1, 0, gray(200, 201, 202, 203)), // BG dispose
      Apng.Frame(2, 2, 2, 2, 2, 0, gray(210, 211, 212, 213)), // PREV dispose
      Apng.Frame(1, 1, 1, 1, 0, 0, gray(99)))))
    assert(a.canvases.length == 4)
    // frame 1 visible state: (0,0) quadrant overwritten
    assert(rgbaAt(a.canvases(1), 4, 0, 0) == Seq(200, 200, 200, 255))
    // frame 2: (0,0) quadrant CLEARED (f1's background dispose),
    // (2,2) quadrant overwritten
    assert(rgbaAt(a.canvases(2), 4, 0, 0) == Seq(0, 0, 0, 0))
    assert(rgbaAt(a.canvases(2), 4, 2, 2) == Seq(210, 210, 210, 255))
    // frame 3: (2,2) quadrant REVERTED to f0, (1,1) = 99
    val fin = a.canvases(3)
    assert(rgbaAt(fin, 4, 2, 2) == Seq(110, 110, 110, 255))
    assert(rgbaAt(fin, 4, 3, 3) == Seq(160, 160, 160, 255))
    assert(rgbaAt(fin, 4, 1, 1) == Seq(99, 99, 99, 255))
    assert(rgbaAt(fin, 4, 0, 0) == Seq(0, 0, 0, 0)) // still cleared
    assert(rgbaAt(fin, 4, 2, 0) == Seq(30, 30, 30, 255)) // untouched f0
  }

  test("blend OVER composites with exact integer alpha math") {
    val f0 = gray(100, 100, 100, 100) // 2×2 opaque gray 100
    // second frame: alpha 128 white over one pixel, alpha 0 over another,
    // alpha 255 over a third
    val f1 = Array[Byte](
      255.toByte, 255.toByte, 255.toByte, 128.toByte,
      255.toByte, 255.toByte, 255.toByte, 0,
      255.toByte, 255.toByte, 255.toByte, 255.toByte,
      0, 0, 0, 64.toByte)
    val a = Apng.decode(Apng.encode(2, 2, Seq(
      Apng.Frame(2, 2, 0, 0, 0, 0, f0),
      Apng.Frame(2, 2, 0, 0, 0, 1, f1)))) // blend OVER
    val fin = a.canvases(1)
    // (0,0): 255·128·255 + 100·255·127 over α 255 → spec formula, rounded
    val oa255 = 128 * 255 + 255 * (255 - 128)
    val expect00 = (255 * 128 * 255 + 100 * 255 * (255 - 128) + oa255 / 2) / oa255
    assert(rgbaAt(fin, 2, 0, 0) == Seq(expect00, expect00, expect00, 255))
    assert(rgbaAt(fin, 2, 1, 0) == Seq(100, 100, 100, 255), "alpha 0 leaves dst")
    assert(rgbaAt(fin, 2, 0, 1) == Seq(255, 255, 255, 255), "alpha 255 replaces")
    val oa64 = 64 * 255 + 255 * (255 - 64)
    val expect11 = (0 + 100 * 255 * (255 - 64) + oa64 / 2) / oa64
    assert(rgbaAt(fin, 2, 1, 1) == Seq(expect11, expect11, expect11, 255))
  }

  test("grammar violations fail loudly") {
    val ok = Apng.encode(2, 2, Seq(
      Apng.Frame(2, 2, 0, 0, 0, 0, gray(1, 2, 3, 4)),
      Apng.Frame(1, 1, 1, 1, 0, 0, gray(9))))
    assert(Apng.decode(ok).canvases.length == 2)
    // truncations
    for (cut <- Seq(7, 20, 40, ok.length - 1))
      intercept[Throwable](Apng.decode(java.util.Arrays.copyOf(ok, cut)))
    // every 1-byte corruption throws or decodes identically (CRC walk)
    val base = Apng.decode(ok).canvases.last.toSeq
    var threw = 0
    for (i <- ok.indices) {
      val m = ok.clone(); m(i) = (m(i) ^ 0x40).toByte
      try assert(Apng.decode(m).canvases.last.toSeq == base)
      catch { case _: Throwable => threw += 1 }
    }
    assert(threw > ok.length / 2, s"only $threw corruptions detected")
    // encoder-side contract checks
    intercept[IllegalArgumentException](Apng.encode(2, 2, Seq(
      Apng.Frame(1, 1, 0, 0, 0, 0, gray(1))))) // frame 0 not full canvas
    intercept[IllegalArgumentException](Apng.encode(2, 2, Seq(
      Apng.Frame(2, 2, 0, 0, 0, 0, gray(1, 2, 3, 4)),
      Apng.Frame(2, 2, 1, 1, 0, 0, gray(5, 6, 7, 8))))) // region overflows
  }

  test("fcTL with a wrapped-negative offset fails, never composites") {
    // 0xFFFFFFFF parses to Int -1; an unguarded `fx + fw > width` check
    // accepts it and the compositor would index the previous row — the
    // decoder must instead raise on the malformed offset
    val ok = Apng.encode(2, 2, Seq(
      Apng.Frame(2, 2, 0, 0, 0, 0, gray(1, 2, 3, 4)),
      Apng.Frame(1, 1, 1, 1, 0, 0, gray(9))))
    def indexOfType(b: Array[Byte], t: String, from: Int): Int = {
      val pat = t.getBytes("US-ASCII")
      var i = from
      while (i <= b.length - 4 && !(b(i) == pat(0) && b(i + 1) == pat(1) &&
        b(i + 2) == pat(2) && b(i + 3) == pat(3))) i += 1
      require(i <= b.length - 4, s"$t not found"); i
    }
    val first = indexOfType(ok, "fcTL", 0)
    val second = indexOfType(ok, "fcTL", first + 4) // the 1×1 offset frame
    val m = ok.clone()
    for (k <- 0 until 4) m(second + 4 + 12 + k) = 0xFF.toByte // x_offset = -1
    val crc = new java.util.zip.CRC32()
    crc.update(m, second, 4 + 26) // type + data
    val v = crc.getValue
    for (k <- 0 until 4) m(second + 4 + 26 + k) = (v >>> (24 - 8 * k)).toByte
    val ex = intercept[IllegalArgumentException](Apng.decode(m))
    assert(ex.getMessage.contains("frame region"), ex.getMessage)
  }
}
