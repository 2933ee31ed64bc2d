package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary media plumbing: schema, per-partition decode, deterministic features") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.withMediaColumn(docs)
    assert(media.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(media.repartition(4)).cache()
    assert(feats.count() == docs.count())
    // features must agree with the column-level ground truth
    val check = feats.join(docs, "doc_id")
      .withColumn("want_bytes", length(col("text")).cast("long"))
      .withColumn("want_digest", md5(col("text")))
      .filter(col("features.n_bytes") =!= col("want_bytes") ||
        col("features.digest") =!= col("want_digest"))
    assert(check.count() == 0)
    // partitioning must not change results
    val feats1 = Multimodal.extractFeatures(media.repartition(1))
    assert(feats.exceptAll(feats1).count() == 0)
  }

  test("resizePng: box means exact, identity is lossless, RGB channels independent, guards loud") {
    import spark.implicits._
    // hand-computable 2x2 grayscale: [[10, 20], [30, 40]]
    val px = Array[Byte](10, 20, 30, 40)
    val one = Seq((1L, Png.encode(2, 2, 1, px))).toDF("doc_id", "media")
    def feat(df: org.apache.spark.sql.DataFrame) =
      Multimodal.extractFeatures(df, Multimodal.PngCodec)
        .select(col("features.width"), col("features.height"),
          col("features.channels"), col("features.mean_r"))
        .as[(Int, Int, Int, Double)].head()
    // full 2x2 box -> one pixel = floor((10+20+30+40)/4) = 25
    assert(feat(Multimodal.resizePng(one, 2, 2)) == ((1, 1, 1, 25.0)))
    // identity factors decode to the identical image
    assert(feat(Multimodal.resizePng(one, 1, 1)) == ((2, 2, 1, 25.0)))
    val idPix = Png.decode(Multimodal.resizePng(one, 1, 1)
      .select("media").as[Array[Byte]].head())
    assert(idPix.pixels.toSeq == px.toSeq, "identity resize altered pixels")
    // RGB: channels average independently
    val rgb = Seq((2L, Png.encode(1, 2, 3,
      Array[Byte](100, 0, 50, 20, 40, 70)))).toDF("doc_id", "media")
    val r = Png.decode(Multimodal.resizePng(rgb, 1, 2)
      .select("media").as[Array[Byte]].head())
    assert(r.pixels.toSeq == Seq[Byte](60, 20, 60), s"${r.pixels.toSeq}")
    // non-divisible factors fail loudly, not silently crop
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resizePng(one, 3, 1).collect()
    }
    assert(e.getMessage.contains("not divisible")
      || Option(e.getCause).exists(_.getMessage.contains("not divisible")))
  }

  test("BMP codec: encode/decode round-trip recovers dimensions and exact channel means") {
    val gray = Array.tabulate[Byte](16)(i => (i * 16).toByte) // 0,16,…,240
    val bmp = Multimodal.bmpEncodeGray(8, 2, gray)
    assert(bmp(0) == 'B' && bmp(1) == 'M' && bmp.length == 54 + 2 * 24)
    val f = Multimodal.BmpCodec.decode(bmp)
    assert(f.getInt(0) == 8 && f.getInt(1) == 2 && f.getInt(2) == 24)
    val want = gray.map(_ & 0xff).sum.toDouble / 16
    assert(f.getDouble(3) == want && f.getDouble(4) == want &&
      f.getDouble(5) == want) // grayscale: all channels equal
  }

  test("BMP codec: row padding honored; top-down images and garbage handled") {
    // width 3 → 9-byte rows padded to 12; means must skip the pad bytes
    val bmp3 = Multimodal.bmpEncodeGray(3, 2, Array[Byte](10, 20, 30, 40, 50, 60))
    val f3 = Multimodal.BmpCodec.decode(bmp3)
    assert(f3.getInt(0) == 3 && f3.getDouble(3) == 35.0)
    // top-down variant (negative height): means are row-order invariant
    val td = bmp3.clone()
    val b = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(22, -2)
    assert(Multimodal.BmpCodec.decode(td).getDouble(3) == 35.0)
    intercept[IllegalArgumentException](
      Multimodal.BmpCodec.decode("not a bitmap at all, far too short".getBytes))
    // valid magic but truncated pixel array must fail loudly, not misread
    intercept[IllegalArgumentException](
      Multimodal.BmpCodec.decode(bmp3.take(56)))
  }

  test("WAV codec: encode/decode round-trip recovers rate, frames and exact per-channel RMS") {
    // stereo: L = constant 1000, R = constant -2000 → RMS exactly 1000/2000
    val stereo = Array.tabulate[Short](16)(i => if (i % 2 == 0) 1000 else -2000)
    val wav = Multimodal.wavEncodePcm16(8000, 2, stereo)
    assert(wav.length == 44 + 32)
    val f = Multimodal.WavCodec.decode(wav)
    assert(f.getInt(0) == 8000 && f.getInt(1) == 2 && f.getInt(2) == 16)
    assert(f.getLong(3) == 8L && f.getDouble(4) == 8.0 / 8000)
    assert(f.getDouble(5) == 1000.0 && f.getDouble(6) == 2000.0)
    // mono: frames = samples, rms_r pinned to 0.0
    val mono = Multimodal.WavCodec.decode(
      Multimodal.wavEncodePcm16(44100, 1, Array[Short](3, -4)))
    assert(mono.getInt(1) == 1 && mono.getLong(3) == 2L)
    assert(mono.getDouble(5) == math.sqrt(25.0 / 2) && mono.getDouble(6) == 0.0)
  }

  test("WAV codec: extra chunks walked; malformed input fails loudly") {
    // splice a 6-byte LIST chunk (odd payload 5 → 1 pad byte) before data
    val base = Multimodal.wavEncodePcm16(8000, 1, Array[Short](100, 200))
    val extra = "LIST" .getBytes ++ Array[Byte](5, 0, 0, 0) ++
      "INFOx".getBytes ++ Array[Byte](0)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    val b = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(4, spliced.length - 8) // fix RIFF size
    val f = Multimodal.WavCodec.decode(spliced)
    assert(f.getLong(3) == 2L && f.getDouble(5) == math.sqrt((100 * 100 + 200 * 200) / 2.0))
    intercept[IllegalArgumentException](
      Multimodal.WavCodec.decode("RIFFnot really a wave file......".getBytes))
    // declared data size past the end of the buffer must fail, not misread
    intercept[IllegalArgumentException](Multimodal.WavCodec.decode(base.take(46)))
  }

  test("BMP codec: hostile header ints rejected before size arithmetic") {
    val bmp = Multimodal.bmpEncodeGray(3, 2, Array[Byte](10, 20, 30, 40, 50, 60))
    def mutated(at: Int, v: Int): Array[Byte] = {
      val m = bmp.clone()
      java.nio.ByteBuffer.wrap(m).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(at, v)
      m
    }
    intercept[IllegalArgumentException](
      Multimodal.BmpCodec.decode(mutated(10, -64))) // negative dataOffset
    intercept[IllegalArgumentException](
      Multimodal.BmpCodec.decode(mutated(18, Int.MaxValue / 2))) // huge width
    intercept[IllegalArgumentException](
      Multimodal.BmpCodec.decode(mutated(22, 0))) // zero height
    intercept[IllegalArgumentException](
      Multimodal.BmpCodec.decode(mutated(22, Int.MinValue))) // abs overflow
  }

  test("fuzz: BMP and WAV byte mutations/truncations decode or throw " +
      "IllegalArgumentException — never a crash") {
    val rnd = new java.util.Random(13)
    val bmp = Multimodal.bmpEncodeGray(5, 3,
      Array.fill(15)(rnd.nextInt(256).toByte))
    val wav = Multimodal.wavEncodePcm16(8000, 2,
      Array.fill(32)(rnd.nextInt(65536).toShort))
    val pngGray = Png.encode(5, 3, 1, Array.fill(15)(rnd.nextInt(256).toByte))
    val pngRgb = Png.encode(3, 5, 3, Array.fill(45)(rnd.nextInt(256).toByte))
    for ((stream, codec, label) <- Seq(
        (bmp, Multimodal.BmpCodec, "bmp"),
        (wav, Multimodal.WavCodec, "wav"),
        (pngGray, Multimodal.PngCodec, "png-gray"),
        (pngRgb, Multimodal.PngCodec, "png-rgb"))) {
      for (i <- stream.indices; mut <- Seq(0x00, 0xff, (stream(i) ^ 0x55) & 0xff)
           if (mut & 0xff) != (stream(i) & 0xff)) {
        val m = stream.clone(); m(i) = mut.toByte
        try codec.decode(m)
        catch {
          case _: IllegalArgumentException => () // the contract
          case e: Throwable =>
            fail(f"$label byte $i -> 0x$mut%02x: ${e.getClass.getName}: ${e.getMessage}")
        }
      }
      for (n <- 0 until stream.length)
        try codec.decode(stream.take(n))
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"$label truncation at $n: ${e.getClass.getName}: ${e.getMessage}")
        }
    }
  }

  test("UTF-8 codec: valid text decodes clean; malformed bytes flagged and repaired") {
    val ok = Multimodal.Utf8TextCodec.decode("héllo\nwörld".getBytes("UTF-8"))
    assert(ok.getBoolean(3) && ok.getLong(1) == 11L && ok.getLong(2) == 2L)
    // 0xC3 with no continuation byte = malformed UTF-8
    val bad = Multimodal.Utf8TextCodec.decode(Array[Byte]('a', 0xC3.toByte))
    assert(!bad.getBoolean(3))
    assert(bad.getLong(1) == 2L) // 'a' + U+FFFD replacement
  }

  test("PNG codec: RGB round-trip is bit-exact through every scanline filter") {
    val rnd = new java.util.Random(31)
    // 7 rows with the default 0→4 filter cycle: every filter used, Paeth
    // and Average see both the first-column and first-row edge cases
    val pixels = Array.fill(4 * 3 * 7)(rnd.nextInt(256).toByte)
    val png = Png.encode(4, 7, 3, pixels)
    val img = Png.decode(png)
    assert(img.width == 4 && img.height == 7 && img.channels == 3)
    assert(img.pixels.sameElements(pixels))
    // each filter type forced alone must also round-trip
    for (f <- 0 to 4) {
      val one = Png.decode(Png.encode(4, 7, 3, pixels, filterFor = _ => f))
      assert(one.pixels.sameElements(pixels), s"filter $f")
    }
    // grayscale too, and the codec Row carries the exact mean
    val gray = Array.tabulate[Byte](16)(i => (i * 16).toByte)
    val row = Multimodal.PngCodec.decode(Png.encode(2, 8, 1, gray))
    assert(row.getInt(0) == 2 && row.getInt(1) == 8 && row.getInt(2) == 1)
    assert(row.getDouble(3) == gray.map(_ & 0xff).sum.toDouble / 16)
  }

  test("PNG codec: CRC, zlib and unsupported-variant failures are loud and typed") {
    val png = Png.encode(5, 3, 1, Array.tabulate[Byte](15)(_.toByte))
    // flip one IDAT payload byte: the chunk CRC must catch it
    val idatAt = (8 until png.length - 4).find(i =>
      png(i) == 'I' && png(i + 1) == 'D' && png(i + 2) == 'A' && png(i + 3) == 'T').get
    val bad = png.clone(); bad(idatAt + 6) = (bad(idatAt + 6) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Png.decode(bad))
    assert(e.getMessage.contains("CRC"))
    // interlace / palette / 16-bit rejected by name, not by crash (CRC
    // re-stamped so the IHDR check is what fires)
    def ihdrMutant(at: Int, v: Byte): Array[Byte] = {
      val m = png.clone(); m(8 + 8 + at) = v
      val crc = new java.util.zip.CRC32()
      crc.update(m, 12, 4 + 13)
      val cv = crc.getValue
      for (k <- 0 until 4) m(8 + 8 + 13 + k) = ((cv >>> (24 - 8 * k)) & 0xff).toByte
      m
    }
    // interlace=1 is now SUPPORTED — flipping only the flag makes the
    // filtered-data layout disagree with the passes, a size error
    assert(intercept[IllegalArgumentException](Png.decode(ihdrMutant(12, 1)))
      .getMessage.contains("expected"))
    assert(intercept[IllegalArgumentException](Png.decode(ihdrMutant(12, 2)))
      .getMessage.contains("interlace"))
    // palette color type without a PLTE chunk is rejected by name
    assert(intercept[IllegalArgumentException](Png.decode(ihdrMutant(9, 3)))
      .getMessage.contains("PLTE"))
    // depths 16 and 4 are now supported on grayscale — flipping only
    // the depth flag changes the layout the data must satisfy, a size
    // error; depth 3 is not a PNG depth and is rejected by name
    assert(intercept[IllegalArgumentException](Png.decode(ihdrMutant(8, 16)))
      .getMessage.contains("expected"))
    assert(intercept[IllegalArgumentException](Png.decode(ihdrMutant(8, 4)))
      .getMessage.contains("expected"))
    assert(intercept[IllegalArgumentException](Png.decode(ihdrMutant(8, 3)))
      .getMessage.contains("bit depth"))
  }

  test("PNG codec: 1/2/4-bit depths round-trip, scale and expand correctly") {
    val rnd = new scala.util.Random(17)
    for (depth <- Seq(1, 2, 4); inter <- Seq(false, true)) {
      val mask = (1 << depth) - 1
      // grayscale: decoded samples are the exact 255/(2^d-1) scaling
      val g = Array.fill(11 * 5)(rnd.nextInt(mask + 1))
      val img = Png.decode(Png.encodeLowDepth(11, 5, depth, g, interlace = inter))
      assert(img.channels == 1 && img.bitDepth == 8)
      assert((0 until img.nSamples).map(img.sample).toSeq ==
        g.map(_ * (255 / mask)).toSeq, s"gray d=$depth inter=$inter")
      // palette: indices expand through PLTE
      val pal = Array.tabulate(mask + 1)(i => i * 0x050301)
      val idx = Array.fill(11 * 5)(rnd.nextInt(mask + 1))
      val pimg = Png.decode(Png.encodeLowDepth(11, 5, depth, idx,
        palette = Some(pal), interlace = inter))
      assert(pimg.channels == 3 && pimg.colorType == 3)
      val want = idx.flatMap(i => Seq((pal(i) >> 16) & 0xff,
        (pal(i) >> 8) & 0xff, pal(i) & 0xff))
      assert((0 until pimg.nSamples).map(pimg.sample).toSeq == want.toSeq,
        s"palette d=$depth inter=$inter")
    }
    // width not a multiple of the packing: 1-bit 9-wide rows pad to 2 bytes
    val bits = Array.tabulate(9 * 3)(i => i % 2)
    val b = Png.decode(Png.encodeLowDepth(9, 3, 1, bits))
    assert((0 until b.nSamples).map(b.sample).toSeq == bits.map(_ * 255).toSeq)
    // invalid: sub-8 depth on a truecolor type must be rejected by name
    val good = Png.encodeLowDepth(4, 4, 4, Array.fill(16)(3))
    val m = good.clone(); m(8 + 8 + 9) = 2 // colorType gray->RGB
    val crc = new java.util.zip.CRC32(); crc.update(m, 12, 4 + 13)
    for (k <- 0 until 4)
      m(8 + 8 + 13 + k) = ((crc.getValue >>> (24 - 8 * k)) & 0xff).toByte
    assert(intercept[IllegalArgumentException](Png.decode(m))
      .getMessage.contains("invalid for color type"))
  }

  test("PNG codec: 16-bit depth round-trips at every channel count") {
    val rnd = new scala.util.Random(13)
    for (ch <- Seq(1, 2, 3, 4); inter <- Seq(false, true)) {
      val samples = Array.fill(5 * 3 * ch)(rnd.nextInt(0x10000))
      val img = Png.decode(Png.encode16(5, 3, ch, samples, interlace = inter))
      assert(img.bitDepth == 16 && img.channels == ch)
      assert((0 until img.nSamples).map(img.sample).toSeq == samples.toSeq,
        s"ch=$ch interlace=$inter")
    }
    // PngCodec means report in the native 16-bit scale
    val gray = Array.tabulate(16)(i => i * 4000)
    val f = Multimodal.PngCodec.decode(Png.encode16(2, 8, 1, gray))
    assert(f.getDouble(3) == gray.sum.toDouble / 16)
  }

  test("PNG codec: alpha, palette and Adam7 round-trips") {
    val rnd = new scala.util.Random(11)
    // gray+alpha and RGBA, plain and interlaced, every filter in play
    for (ch <- Seq(2, 4); inter <- Seq(false, true)) {
      val px = Array.fill(7 * 5 * ch)(rnd.nextInt(256).toByte)
      val img = Png.decode(Png.encode(7, 5, ch, px, interlace = inter))
      assert(img.channels == ch && img.width == 7 && img.height == 5)
      assert(img.pixels.toSeq == px.toSeq, s"ch=$ch interlace=$inter")
    }
    // 1×1 and odd sizes: Adam7 passes degenerate correctly
    for ((w, h) <- Seq((1, 1), (2, 3), (9, 9), (8, 8))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val img = Png.decode(Png.encode(w, h, 1, px, interlace = true))
      assert(img.pixels.toSeq == px.toSeq, s"${w}x$h interlaced")
    }
    // palette: indices expand through PLTE to RGB
    val pal = Array(0x112233, 0xff0000, 0x00ff00, 0x0000ff)
    val idx = Array[Byte](0, 1, 2, 3, 3, 2, 1, 0)
    val pimg = Png.decode(Png.encodePalette(4, 2, idx, pal))
    assert(pimg.channels == 3 && pimg.colorType == 3)
    val want = idx.flatMap(i => Seq(
      ((pal(i) >> 16) & 0xff).toByte, ((pal(i) >> 8) & 0xff).toByte,
      (pal(i) & 0xff).toByte))
    assert(pimg.pixels.toSeq == want.toSeq)
    // interlaced palette too
    val pimg2 = Png.decode(Png.encodePalette(4, 2, idx, pal, interlace = true))
    assert(pimg2.pixels.toSeq == want.toSeq)
    // out-of-palette index is a loud decode error: craft 1 entry, index 1
    intercept[IllegalArgumentException](
      Png.encodePalette(1, 1, Array[Byte](1), Array(0x000000)))
  }

  test("PNG codec: forged headers and trailing data rejected, not crashed or skipped") {
    val png = Png.encode(5, 3, 1, Array.tabulate[Byte](15)(_.toByte))
    def restamp(m: Array[Byte], chunkAt: Int, dataLen: Int): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(m, chunkAt + 4, 4 + dataLen)
      val cv = crc.getValue
      for (k <- 0 until 4)
        m(chunkAt + 8 + dataLen + k) = ((cv >>> (24 - 8 * k)) & 0xff).toByte
      m
    }
    // u32 width × u32 height chosen so the product wraps Long negative: a
    // product-only cap would pass and the alloc would crash with a non-IAE
    val huge = png.clone()
    val dims = Array(0xff, 0xff, 0xff, 0xff, 0x80, 0x00, 0x00, 0x01)
    for (k <- dims.indices) huge(16 + k) = dims(k).toByte
    val e = intercept[IllegalArgumentException](Png.decode(restamp(huge, 8, 13)))
    assert(e.getMessage.contains("unreasonable dimensions"))
    // unknown CRITICAL chunk (ancillary bit clear) must fail, not skip;
    // build: sig + IHDR + fake 'QRST' + rest, CRC valid on the fake chunk
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, 8 + 25) // sig + IHDR
    val fake = Array[Byte](0, 0, 0, 1, 'Q', 'R', 'S', 'T', 42)
    out.write(fake, 0, fake.length)
    val crc = new java.util.zip.CRC32(); crc.update(fake, 4, 5)
    for (k <- 0 until 4) out.write(((crc.getValue >>> (24 - 8 * k)) & 0xff).toInt)
    out.write(png, 8 + 25, png.length - 8 - 25)
    assert(intercept[IllegalArgumentException](Png.decode(out.toByteArray))
      .getMessage.contains("critical chunk 'QRST'"))
    // the lowercase (ancillary) sibling of the same chunk is skipped fine
    val anc = out.toByteArray
    anc(8 + 25 + 4) = 'q'
    val img = Png.decode(restamp(anc, 8 + 25, 1))
    assert(img.width == 5 && img.height == 3)
    // bytes after IEND are an error, not slack
    assert(intercept[IllegalArgumentException](Png.decode(png :+ 0.toByte))
      .getMessage.contains("trailing bytes after IEND"))
    // encoder rejects non-positive dimensions even when the pixel-count
    // require would arithmetically pass ((-2)·(-8) = 16)
    intercept[IllegalArgumentException](
      Png.encode(-2, -8, 1, new Array[Byte](16)))
  }

  test("MJPEG index rejects invalid in-frame markers instead of mis-indexing") {
    val f0 = Jpeg.encode(16, 16, Array(Array.fill(256)(40)), Jpeg.flatQuant(8))
    // splice FF00 where a marker is expected: 0x00 is only legal as a
    // stuffed byte inside entropy data — the indexer must reject it like
    // decode() does, not read a fake segment length and walk off course
    val bad = f0.take(2) ++ Array[Byte](0xff.toByte, 0x00, 0x00, 0x04) ++ f0.drop(2)
    assert(intercept[IllegalArgumentException](Jpeg.frameRanges(bad))
      .getMessage.contains("invalid marker"))
  }

  test("MJPEG: marker-aware frame index survives an FFD9 inside a comment segment") {
    val quant = Jpeg.flatQuant(8)
    val f0 = Jpeg.encode(16, 16, Array(Array.fill(256)(40)), quant)
    val f1 = Jpeg.encode(16, 16, Array(Array.fill(256)(200)), quant)
    // splice a COM segment whose payload contains the EOI byte pair right
    // after frame 0's SOI: a naive FFD9 search would end the frame there
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x06,
      0xff.toByte, 0xd9.toByte, 'h', 'i')
    val tricky = f0.take(2) ++ com ++ f0.drop(2)
    val stream = Multimodal.mjpegEncode(Seq(tricky, f1))
    val ranges = Jpeg.frameRanges(stream)
    assert(ranges.length == 2)
    assert(ranges(0) == ((0, tricky.length)))
    assert(ranges(1) == ((tricky.length, stream.length)))
    // the indexed slices decode independently (comment skipped)
    val img0 = Jpeg.decode(stream.slice(ranges(0)._1, ranges(0)._2))
    val img1 = Jpeg.decode(stream.slice(ranges(1)._1, ranges(1)._2))
    assert(img0.planes(0)(0) == 40 && img1.planes(0)(0) == 200)
    // fuzz the indexer with the same contract as the codecs
    for (i <- stream.indices; mut <- Seq(0x00, 0xff)
         if (mut & 0xff) != (stream(i) & 0xff)) {
      val m = stream.clone(); m(i) = mut.toByte
      try Jpeg.frameRanges(m)
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(f"byte $i -> 0x$mut%02x: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("video frame-sampling decodes only the sampled frames, with a full index") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val sampled = Multimodal.sampleVideoFrames(
      Multimodal.withMjpegColumn(docs, nFrames = 4), stride = 2, maxFrames = 2)
      .cache()
    assert(sampled.count() == 40) // frames 0 and 2 per document
    assert(sampled.select("frame_no").distinct().collect()
      .map(_.getLong(0)).sorted.sameElements(Array(0L, 2L)))
    // the index saw all 4 frames even though only 2 were decoded
    assert(sampled.filter(col("n_frames") =!= 4).count() == 0)
    // frame f's first pixel is digest byte f — proves WHICH frame decoded
    val check = sampled.join(docs, "doc_id")
      .withColumn("want", conv(substring(md5(col("text")),
        (col("frame_no") * 2 + 1).cast("int"), lit(2)), 16, 10).cast("int"))
      .filter(col("first_px") =!= col("want"))
    assert(check.count() == 0)
  }

  test("motion estimation: full-pel search recovers a planted aligned shift " +
      "exactly; fixture regime finds the rotation's true motion") {
    import spark.implicits._
    // hand-built 2-frame MJPEG: 16 DISTINCT constant 8x8 blocks (exact
    // JPEG reconstruction), frame 1 = frame 0 shifted RIGHT one block —
    // cur block (by,bx>0) matches prev at dx=-8 with sad 0
    def plane(vals: Int => Int): Array[Int] = Array.tabulate(32 * 32) { i =>
      vals((i / (32 * 8)) * 4 + (i % 32) / 8)
    }
    val v0 = (bi: Int) => bi * 16 + 8
    val v1 = (bi: Int) => if (bi % 4 == 0) 3 else v0(bi - 1)
    val quant = Jpeg.flatQuant(8)
    val stream = Multimodal.mjpegEncode(Seq(
      Jpeg.encode(32, 32, Array(plane(v0)), quant),
      Jpeg.encode(32, 32, Array(plane(v1)), quant)))
    val media = Seq((1L, stream)).toDF("doc_id", "media")
    // exhaustive full-pel regime: 17x17 = 289 candidates per block
    val mv = Multimodal.motionEstimate(media, blockSize = 8, radius = 8,
      step = 1).collect().map(r => (r.getInt(2), r.getInt(3)) ->
        (r.getInt(4), r.getInt(5), r.getLong(6))).toMap
    assert(mv.size == 16)
    for (by <- 0 to 3; bx <- 1 to 3)
      assert(mv((bx, by)) == ((-8, 0, 0L)),
        s"block ($bx,$by): ${mv((bx, by))} — planted shift not recovered")
    // determinism: a second run returns identical vectors (tie-break is
    // the first minimum in (dy, dx) scan order, never map/task order)
    val mv2 = Multimodal.motionEstimate(media, blockSize = 8, radius = 8,
      step = 1).collect().map(r => (r.getInt(2), r.getInt(3)) ->
        (r.getInt(4), r.getInt(5), r.getLong(6))).toMap
    assert(mv == mv2)
    // the gate's coarse regime on the REAL rotating fixture: interior
    // blocks (bx <= 2) recover the rotation's true motion — content
    // moves one block left per frame, so the vector points right at
    // (dx=+8, dy=0) with sad 0
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(10)
    val coarse = Multimodal.motionEstimate(
      Multimodal.withMjpegColumn(docs, nFrames = 4),
      blockSize = 8, radius = 8, step = 8)
    assert(coarse.count() == 10 * 3 * 16)
    // every interior block has a PERFECT match one block right (the
    // rotation guarantees it), so sad must be 0; the exact winning
    // vector is (8, 0) except where a repeated digest byte ties an
    // earlier-scanned candidate at sad 0 — the oracle gate (mm_motion)
    // replays that tie-break per row, the spec pins the invariant part
    val interior = coarse.filter(col("bx") <= 2).cache()
    val n = interior.count()
    assert(interior.filter(col("sad") =!= 0L).count() == 0,
      "an interior block missed its guaranteed zero-SAD match")
    val exact = interior.filter(col("dx") === 8 && col("dy") === 0).count()
    assert(exact * 3 >= n * 2,
      s"only $exact/$n interior blocks found the true motion — " +
        "digest-byte ties cannot plausibly explain this many misses")
  }
}
