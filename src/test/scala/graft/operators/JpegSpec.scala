package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Baseline JPEG codec: encoder-independent decode vectors (hand-built
  * streams), exactness on DC-only spectra, destuffing/restart handling,
  * error-bounded lossy roundtrips, and the Spark-side mm_jpeg fixture.
  */
class JpegSpec extends SparkSpec {

  // ---- hand-assembly helpers (independent of the encoder) ------------

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xff.toByte, marker.toByte, ((len >> 8) & 0xff).toByte,
      (len & 0xff).toByte) ++ payload
  }

  // T.81 Annex K tables, re-declared here so the vectors do not depend on
  // the codec's own constants.
  private val dcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcValues = (0 to 11).toArray
  private val acCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acValues = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Minimal single-component 8×8 stream with quant=16 everywhere and the
    * standard Huffman tables; `entropy` is the raw (already stuffed)
    * entropy-coded data.
    */
  private def handJpeg8x8(entropy: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xdb, Array(0x00.toByte) ++ Array.fill(64)(16.toByte)) ++
      seg(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0)) ++
      seg(0xc4, Array(0x00.toByte) ++ dcCounts.map(_.toByte) ++ dcValues.map(_.toByte)) ++
      seg(0xc4, Array(0x10.toByte) ++ acCounts.map(_.toByte) ++ acValues.map(_.toByte)) ++
      seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) ++
      entropy ++ Array(0xff.toByte, 0xd9.toByte)

  // ---- decoder vectors ----------------------------------------------

  test("hand-built stream: DC category 3, EOB — exact pixel value") {
    // Canonical std codes: DC cat3 = '100'; diff=4 bits '100'; AC EOB =
    // '1010'. 10 bits padded with 1s → 0x92 0xBF. DC=4, dequant 64,
    // pixel = round(64/8 + 128) = 136 everywhere.
    val img = Jpeg.decode(handJpeg8x8(Array(0x92.toByte, 0xbf.toByte)))
    assert(img.width == 8 && img.height == 8 && img.nComp == 1)
    assert(img.planes(0).forall(_ == 136))
  }

  test("hand-built stream: byte destuffing (0xFF 0x00 in entropy data)") {
    // DC cat11 = '111111110' (9 bits) + magnitude 1024 = '10000000000'
    // (11 bits) + EOB '1010' = 24 bits = FF 40 0A; the FF must be stuffed
    // on the wire as FF 00. DC=1024, dequant 16384 → clamps to 255.
    val stuffed = Array(0xff.toByte, 0x00.toByte, 0x40.toByte, 0x0a.toByte)
    val img = Jpeg.decode(handJpeg8x8(stuffed))
    assert(img.planes(0).forall(_ == 255))
  }

  // ---- exactness on DC-only spectra ---------------------------------

  test("constant-block image with q=8 roundtrips EXACTLY for all 256 values") {
    // 128×128 = 256 blocks, block i constant at value i: every possible
    // sample value and a DC-prediction chain spanning every magnitude
    // category in both signs.
    val plane = Array.tabulate(128 * 128) { i =>
      (i / (128 * 8)) * 16 + (i % 128) / 8
    }
    val bytes = Jpeg.encode(128, 128, Array(plane), Jpeg.flatQuant(8))
    val img = Jpeg.decode(bytes)
    assert(img.width == 128 && img.height == 128 && img.nComp == 1)
    assert(img.planes(0).sameElements(plane))
  }

  // ---- lossy roundtrips, bounded error ------------------------------

  test("random images with q=1 roundtrip within the coefficient-rounding bound") {
    // Each quantized coef errs ≤ 0.5, so any pixel errs ≤
    // 0.25·0.5·(Σu C(u))² + 0.5(rounding) = 0.25·0.5·(7+1/√2)² + 0.5 < 8.
    val rnd = new java.util.Random(42)
    var sawStuffing = false
    for ((w, h) <- Seq((8, 8), (12, 10), (17, 9), (32, 32))) {
      val plane = Array.fill(w * h)(rnd.nextInt(256))
      val bytes = Jpeg.encode(w, h, Array(plane), Jpeg.flatQuant(1))
      // stuffed FF 00 pairs only arise inside entropy data
      sawStuffing ||= bytes.indices.init.exists(i =>
        (bytes(i) & 0xff) == 0xff && bytes(i + 1) == 0)
      val img = Jpeg.decode(bytes)
      assert(img.width == w && img.height == h)
      val maxErr = img.planes(0).zip(plane).map(p => math.abs(p._1 - p._2)).max
      assert(maxErr <= 8, s"${w}x$h max error $maxErr")
    }
    assert(sawStuffing, "expected at least one stuffed 0xFF00 across the fixtures")
  }

  test("standard luminance quant table: lossy but sane on smooth content") {
    val w = 24; val h = 16
    val plane = Array.tabulate(w * h)(i => 100 + (i % w) * 4 + (i / w) * 2)
    val img = Jpeg.decode(Jpeg.encode(w, h, Array(plane), Jpeg.StdQuantLuma))
    val meanErr = img.planes(0).zip(plane).map(p => math.abs(p._1 - p._2)).sum.toDouble / (w * h)
    assert(meanErr < 6.0, s"mean error $meanErr too large for smooth gradient")
  }

  // ---- restart intervals --------------------------------------------

  test("restart intervals: RST markers emitted, decode identical, predictors reset") {
    val rnd = new java.util.Random(7)
    val plane = Array.fill(32 * 16)(rnd.nextInt(256))
    val plain = Jpeg.encode(32, 16, Array(plane), Jpeg.flatQuant(1))
    val withRst = Jpeg.encode(32, 16, Array(plane), Jpeg.flatQuant(1), restartInterval = 2)
    // 8 MCUs, interval 2 → RST0..RST2 after MCUs 2,4,6
    def hasMarker(bs: Array[Byte], m: Int) = bs.indices.init.exists(i =>
      (bs(i) & 0xff) == 0xff && (bs(i + 1) & 0xff) == m)
    assert(hasMarker(withRst, 0xd0) && hasMarker(withRst, 0xd1) && hasMarker(withRst, 0xd2))
    assert(!hasMarker(plain, 0xd0))
    assert(Jpeg.decode(withRst).planes(0).sameElements(Jpeg.decode(plain).planes(0)))
  }

  // ---- color --------------------------------------------------------

  test("4:4:4 color: achromatic images are exact, chromatic within ±2") {
    // r=g=b ⇒ Cb=Cr=0: DC-only Y with q=8 reconstructs exactly and the
    // color transform is the identity.
    val grayVal = 173
    val gray = Array.fill(16 * 8)(grayVal)
    val achroma = Jpeg.decode(Jpeg.encode(16, 8,
      Array(gray, gray.clone(), gray.clone()), Jpeg.flatQuant(8)))
    assert(achroma.nComp == 3)
    assert(achroma.planes.forall(_.forall(_ == grayVal)))

    val (r, g, b) = (Array.fill(16 * 8)(200), Array.fill(16 * 8)(100), Array.fill(16 * 8)(50))
    val img = Jpeg.decode(Jpeg.encode(16, 8, Array(r, g, b), Jpeg.flatQuant(1)))
    for ((plane, want) <- img.planes.zip(Seq(200, 100, 50)))
      assert(plane.forall(v => math.abs(v - want) <= 2),
        s"channel deviates >2 from $want")
  }

  // ---- chroma subsampling (4:2:0 / 4:2:2) ---------------------------

  test("4:2:0: achromatic constant images are exact; SOF declares 2x2 luma sampling") {
    val grayVal = 91
    val plane = Array.fill(32 * 32)(grayVal)
    val bytes = Jpeg.encode(32, 32, Array(plane, plane.clone(), plane.clone()),
      Jpeg.flatQuant(8), chromaSubsample = (2, 2))
    // SOF component 1 (Y) must carry sampling 0x22, chroma 0x11
    val sofAt = bytes.indices.init.find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
    assert((bytes(sofAt + 11) & 0xff) == 0x22 && (bytes(sofAt + 14) & 0xff) == 0x11)
    val img = Jpeg.decode(bytes)
    assert(img.nComp == 3 && img.width == 32 && img.height == 32)
    assert(img.planes.forall(_.forall(_ == grayVal)))
  }

  test("4:2:0 and 4:2:2: constant color within ±2; odd dims exercise edge MCUs") {
    for ((ss, w, h) <- Seq(((2, 2), 20, 12), ((2, 1), 17, 9), ((1, 2), 16, 10))) {
      val (r, g, b) = (Array.fill(w * h)(200), Array.fill(w * h)(100), Array.fill(w * h)(50))
      val img = Jpeg.decode(Jpeg.encode(w, h, Array(r, g, b),
        Jpeg.flatQuant(1), chromaSubsample = ss))
      assert(img.width == w && img.height == h, s"ss=$ss dims")
      for ((plane, want) <- img.planes.zip(Seq(200, 100, 50)))
        assert(plane.forall(v => math.abs(v - want) <= 2),
          s"ss=$ss channel deviates >2 from $want")
    }
  }

  test("4:2:0: smooth chroma gradient survives downsample+replicate within bounds") {
    val w = 24; val h = 16
    val r = Array.tabulate(w * h)(i => 80 + (i % w) * 3)
    val g = Array.tabulate(w * h)(i => 60 + (i / w) * 4)
    val b = Array.fill(w * h)(120)
    val img = Jpeg.decode(Jpeg.encode(w, h, Array(r, g, b),
      Jpeg.flatQuant(1), chromaSubsample = (2, 2)))
    // luma is full-res (tight bound); chroma error ≤ one 2×2 box of the
    // gradient slope plus coefficient rounding
    for ((plane, want) <- img.planes.zip(Seq(r, g, b))) {
      val errs = plane.zip(want).map(p => math.abs(p._1 - p._2))
      assert(errs.max <= 12 && errs.sum.toDouble / errs.length <= 4.0,
        s"max=${errs.max} mean=${errs.sum.toDouble / errs.length}")
    }
  }

  test("4:2:0 with restart intervals decodes identically to no-restart") {
    val rnd = new java.util.Random(11)
    val w = 48; val h = 32 // 6 MCUs of 16×16
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(256)))
    val plain = Jpeg.decode(Jpeg.encode(w, h, planes, Jpeg.flatQuant(1),
      chromaSubsample = (2, 2)))
    val rst = Jpeg.decode(Jpeg.encode(w, h, planes, Jpeg.flatQuant(1),
      restartInterval = 2, chromaSubsample = (2, 2)))
    for (c <- 0 until 3)
      assert(plain.planes(c).sameElements(rst.planes(c)))
  }

  // ---- hostile / unsupported inputs ---------------------------------

  test("fuzz: every byte mutation and truncation either decodes or fails " +
      "with IllegalArgumentException — never a crash, hang or huge alloc") {
    val rnd = new java.util.Random(7)
    val gray = Jpeg.encode(16, 16,
      Array(Array.fill(16 * 16)(rnd.nextInt(256))), Jpeg.flatQuant(4))
    val color = Jpeg.encode(24, 16,
      Array.fill(3)(Array.fill(24 * 16)(rnd.nextInt(256))),
      Jpeg.flatQuant(4), restartInterval = 1, chromaSubsample = (2, 2))
    for ((stream, label) <- Seq((gray, "gray"), (color, "420"))) {
      for (i <- stream.indices; mut <- Seq(0x00, 0xff, (stream(i) ^ 0x55) & 0xff)
           if (mut & 0xff) != (stream(i) & 0xff)) {
        val m = stream.clone(); m(i) = mut.toByte
        try Jpeg.decode(m)
        catch {
          case _: IllegalArgumentException => () // the contract
          case e: Throwable =>
            fail(f"$label byte $i -> 0x$mut%02x: ${e.getClass.getName}: ${e.getMessage}")
        }
      }
      for (n <- 0 until stream.length) {
        val t = intercept[IllegalArgumentException](
          Jpeg.decode(stream.take(n)))
        assert(t.getMessage != null, s"$label truncation at $n")
      }
    }
  }

  test("hostile SOF dimensions are rejected before allocation") {
    val ok = Jpeg.encode(8, 8, Array(Array.fill(64)(42)), Jpeg.flatQuant(8))
    val sofAt = ok.indices.init.find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    // claim 65535x65535: would overflow Int plane math / demand ~17 GB
    val big = ok.clone()
    big(sofAt + 5) = 0xff.toByte; big(sofAt + 6) = 0xff.toByte // height
    big(sofAt + 7) = 0xff.toByte; big(sofAt + 8) = 0xff.toByte // width
    val e = intercept[IllegalArgumentException](Jpeg.decode(big))
    assert(e.getMessage.contains("too large"))
  }

  test("malformed and unsupported streams fail with clear errors, not garbage") {
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte]()))
    intercept[IllegalArgumentException](Jpeg.decode("GIF89a not a jpeg".getBytes))
    val ok = Jpeg.encode(8, 8, Array(Array.fill(64)(77)), Jpeg.flatQuant(8))
    // flip SOF0 → SOF2 (progressive)
    val prog = ok.clone()
    val sofAt = prog.indices.init.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e1.getMessage.contains("progressive"))
    // sampling factor 3 is outside the supported {1,2,4} set
    val sub = ok.clone()
    sub(sofAt + 11) = 0x33.toByte // component 1 H/V sampling
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(sub))
    assert(e2.getMessage.contains("sampling factors"))
    // truncated entropy data
    intercept[IllegalArgumentException](Jpeg.decode(ok.take(ok.length - 20)))
  }

  // ---- Spark-side fixture + codec -----------------------------------

  test("mm_jpeg fixture: decoded means equal the digest replay; partition-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 40)
    val media = Multimodal.withJpegColumn(docs)
    val feats = Multimodal.extractFeatures(media.repartition(4), Multimodal.JpegCodec)
      .select(col("doc_id"), col("features.*"))
    // ground truth from the digest, computed Spark-side independently
    val want = docs.select(col("doc_id"),
      expr("aggregate(transform(sequence(0, 15), " +
        "i -> conv(substring(md5(text), i*2+1, 2), 16, 10)), 0L, (a, x) -> a + cast(x as long))")
        .as("dsum"))
    val joined = feats.join(want, "doc_id").cache()
    assert(joined.count() == 40)
    val bad = joined.filter(col("width") =!= 32 || col("height") =!= 32 ||
      col("components") =!= 1 ||
      col("mean_r") =!= col("dsum").cast("double") / 16 ||
      col("mean_g") =!= col("mean_r") || col("mean_b") =!= col("mean_r"))
    assert(bad.count() == 0)
    val feats1 = Multimodal.extractFeatures(media.repartition(1), Multimodal.JpegCodec)
      .select(col("doc_id"), col("features.*"))
    assert(feats.exceptAll(feats1).count() == 0)
  }
  test("progressive == baseline: identical reconstruction on every variant") {
    // both encoders quantize the same FDCT output, so a conformant
    // progressive decode must match the baseline decode BIT-FOR-BIT —
    // a conformance check with no tolerance to hide bugs in
    val rnd = new scala.util.Random(7)
    // grayscale: random (dense ACs), smooth gradient, constant
    for ((name, px) <- Seq(
        ("random", Array.fill(24 * 17)(rnd.nextInt(256))),
        ("gradient", Array.tabulate(24 * 17)(i => (i % 24) * 10 % 256)),
        ("constant", Array.fill(24 * 17)(77)))) {
      val base = Jpeg.decode(Jpeg.encode(24, 17, Array(px)))
      val prog = Jpeg.decode(Jpeg.encodeProgressive(24, 17, Array(px)))
      assert(prog.width == base.width && prog.height == base.height)
      assert(prog.planes(0).toSeq == base.planes(0).toSeq, name)
    }
    // q=1 keeps large coefficients: deep magnitudes through the
    // successive-approximation split
    val q1 = Array.fill(64)(1)
    val pxq = Array.fill(16 * 16)(rnd.nextInt(256))
    assert(Jpeg.decode(Jpeg.encodeProgressive(16, 16, Array(pxq), q1)).planes(0).toSeq
      == Jpeg.decode(Jpeg.encode(16, 16, Array(pxq), q1)).planes(0).toSeq)
    // color 4:4:4 and subsampled 4:2:0/4:2:2 (interleaved DC scans over
    // multi-block MCUs + per-component AC grids incl. padding geometry)
    for (sub <- Seq((1, 1), (2, 2), (2, 1))) {
      val rgb = Array.fill(3)(Array.fill(24 * 17)(rnd.nextInt(256)))
      val base = Jpeg.decode(Jpeg.encode(24, 17, rgb, chromaSubsample = sub))
      val prog = Jpeg.decode(Jpeg.encodeProgressive(24, 17, rgb, chromaSubsample = sub))
      for (c <- 0 to 2)
        assert(prog.planes(c).toSeq == base.planes(c).toSeq, s"$sub ch$c")
    }
    // sparse blocks: long EOB runs across blocks (most blocks all-zero
    // in the AC band), plus refinement-only blocks
    val sparse = Array.tabulate(48 * 48)(i => if (i == 100) 255 else 128)
    assert(Jpeg.decode(Jpeg.encodeProgressive(48, 48, Array(sparse))).planes(0).toSeq
      == Jpeg.decode(Jpeg.encode(48, 48, Array(sparse))).planes(0).toSeq)
  }

  test("progressive streams: mutation fuzz never crashes or loops") {
    val px = Array.tabulate(16 * 16)(i => (i * 7) % 256)
    val good = Jpeg.encodeProgressive(16, 16, Array(px))
    // sanity: it IS progressive (SOF2 present, multiple SOS)
    def count(marker: Int) = (0 until good.length - 1).count(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == marker)
    assert(count(0xc2) == 1 && count(0xda) >= 4)
    // same contract as the baseline fuzz test: ONLY the typed error is
    // acceptable — an AIOOBE/NegativeArraySize crash class must fail
    for (i <- good.indices by 3) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x21).toByte
      try { Jpeg.decode(bad); () }
      catch { case _: IllegalArgumentException => () }
    }
    for (n <- 2 until good.length by 7) {
      try { Jpeg.decode(java.util.Arrays.copyOf(good, n)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

}
