package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("BMP codec: conformant container (palette, bottom-up padded rows), " +
      "normalized decode, ImageIO cross-validation both directions") {
    val pixels = "hello multimodal world".getBytes("UTF-8") // 22 < 17*3
    val bmp = Multimodal.BmpCodec.encode(17, 3, pixels)
    // closed form: 54 headers + 1024 palette + 3 rows at stride 20
    assert(Multimodal.BmpCodec.stride(17, 8) == 20)
    assert(bmp.length == 1078 + 3 * 20)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val (w, h, off) = Multimodal.BmpCodec.decode(bmp)
    assert(w == 17 && h == 3 && off == 1078)
    // normalized decode: top-down pixels, zero-filled past the data
    val (dw, dh, dpx) = Multimodal.BmpCodec.decodePixels(bmp)
    assert((dw, dh) == (17, 3) && dpx.length == 51)
    assert(dpx.take(22).sameElements(pixels) && dpx.drop(22).forall(_ == 0))
    // the JDK's own BMP reader agrees pixel-for-pixel — proof the
    // container (palette + bottom-up + padding) is CONFORMANT, not
    // merely self-consistent
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img.getWidth == 17 && img.getHeight == 3)
    // raw raster samples, not getRGB: ImageIO recognizes the identity
    // grayscale palette, converts to TYPE_BYTE_GRAY, and getRGB would
    // then pass samples through ICC gray→sRGB gamma
    for (y <- 0 until 3; x <- 0 until 17)
      assert(img.getRaster.getSample(x, y, 0) == (dpx(y * 17 + x) & 0xff),
        s"ImageIO disagrees at ($x,$y)")
    // and our decoder reads the JDK's own 24-bpp BMPs (bottom-up,
    // padded, BGR) pixel-for-pixel
    val cimg = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 5; x <- 0 until 7)
      cimg.setRGB(x, y, ((x * 41) % 256) << 16 | ((y * 59) % 256) << 8 |
        ((x + 3 * y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(cimg, "bmp", bos)
    val (cw, chh, cpx) = Multimodal.BmpCodec.decodePixels(bos.toByteArray)
    assert((cw, chh) == (7, 5) && cpx.length == 3 * 35)
    for (y <- 0 until 5; x <- 0 until 7) {
      val argb = cimg.getRGB(x, y)
      val p = 3 * (y * 7 + x)
      assert((cpx(p) & 0xff) == ((argb >> 16) & 0xff) &&
        (cpx(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
        (cpx(p + 2) & 0xff) == (argb & 0xff), s"24-bpp mismatch at ($x,$y)")
    }
    // a non-BMP payload must fail loudly, not decode as zeros
    intercept[IllegalArgumentException] {
      Multimodal.BmpCodec.decode("not an image".getBytes("UTF-8"))
    }
  }

  test("WAV codec round-trips PCM fields through a real RIFF chunk walk") {
    val data = "pcm sample bytes".getBytes("UTF-8")
    val wav = Multimodal.WavCodec.encode(8000, 1, 8, data)
    assert(wav.length == 44 + data.length)
    val w = Multimodal.WavCodec.decode(wav)
    assert(w.channels == 1 && w.sampleRate == 8000)
    assert(w.dataOffset == 44 && w.dataLength == data.length)
    assert(wav.slice(44, 44 + data.length).sameElements(data))
    // the decoder walks chunks, not fixed offsets: splice a foreign
    // chunk between fmt and data and the same fields must fall out
    val fmtEnd = 12 + 8 + 16
    val foreign = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    foreign.put("fact".getBytes("US-ASCII")).putInt(4).putInt(0)
    val spliced = wav.take(fmtEnd) ++ foreign.array() ++ wav.drop(fmtEnd)
    // fix the RIFF size for the inserted 12 bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 36 + 12 + data.length)
    val w2 = Multimodal.WavCodec.decode(spliced)
    assert(w2.channels == 1 && w2.sampleRate == 8000)
    assert(w2.dataOffset == 44 + 12 && w2.dataLength == data.length)
    // a non-WAVE payload must fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode("RIFFnope not audio".getBytes("UTF-8"))
    }
  }

  test("PNG codec: pixel-exact round-trip under all five filter types") {
    // deliberately non-smooth pixels so every filter produces wild
    // (mod-256 wrapping) residuals — the unfilter pass must invert all
    val w = 23; val h = 7
    val px = Array.tabulate(w * h)(i => ((i * 37 + (i * i) % 251) & 0xff).toByte)
    (0 to 4).foreach { ft =>
      val png = Multimodal.PngCodec.encode(w, h, px, filterType = ft)
      val (dw, dh, out) = Multimodal.PngCodec.decode(png)
      assert(dw == w && dh == h, s"dims under filter $ft")
      assert(out.sameElements(px), s"pixels must round-trip under filter $ft")
    }
    // the declared stored-block arithmetic the oracle relies on:
    // 8 sig + 25 IHDR + 12+zlen IDAT + 12 IEND, zlen = 6 + 5 + raw
    val png0 = Multimodal.PngCodec.encode(w, h, px)
    assert(png0.length == 57 + 6 + 5 + h * (w + 1))
    // a REAL compressed zlib stream (java Deflater, not stored blocks)
    // must decode identically — the decoder is general, the stored
    // encoder is just the deterministic-size choice
    val raw = new Array[Byte](h * (1 + w))
    (0 until h).foreach { y =>
      raw(y * (1 + w)) = 0
      System.arraycopy(px, y * w, raw, y * (1 + w) + 1, w)
    }
    val defl = new java.util.zip.Deflater(9)
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = defl.deflate(zbuf); defl.end()
    val sig = png0.take(8)
    val ihdrChunk = png0.slice(8, 8 + 25)
    def mkChunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val td = tag.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(td)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(td).putInt(crc.getValue.toInt).array()
    }
    val compressed = sig ++ ihdrChunk ++
      mkChunk("IDAT", zbuf.take(zlen)) ++
      mkChunk("IEND", Array.emptyByteArray)
    val (cw, ch, cpx) = Multimodal.PngCodec.decode(compressed)
    assert(cw == w && ch == h && cpx.sameElements(px))
    // corruption must fail loudly at the CRC, not decode garbage
    val corrupt = png0.clone()
    corrupt(40) = (corrupt(40) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](
      Multimodal.PngCodec.decode(corrupt))
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException](
      Multimodal.PngCodec.decode("not a png at all".getBytes("UTF-8")))
  }

  test("COLOR PNG: RGB, RGBA, palette and gray+alpha decode pixel-exact; " +
      "interlace and 16-bit refuse") {
    def viaImageIO(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // RGB (color type 2) — ImageIO-encoded, compared per channel
    val rgbImg = new java.awt.image.BufferedImage(23, 9,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 9; x <- 0 until 23)
      rgbImg.setRGB(x, y, ((x * 11) % 256 << 16) | ((y * 29) % 256 << 8) |
        ((x * 7 + y * 13) % 256))
    val (rw, rh, rpx) = Multimodal.PngCodec.decode(viaImageIO(rgbImg))
    assert((rw, rh) == (23, 9) && rpx.length == 3 * 23 * 9)
    for (y <- 0 until 9; x <- 0 until 23) {
      val argb = rgbImg.getRGB(x, y)
      val p = 3 * (y * 23 + x)
      assert((rpx(p) & 0xff) == ((argb >> 16) & 0xff) &&
        (rpx(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
        (rpx(p + 2) & 0xff) == (argb & 0xff), s"RGB mismatch at ($x,$y)")
    }
    // RGBA (color type 6) — alpha carried through
    val argbImg = new java.awt.image.BufferedImage(11, 7,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 7; x <- 0 until 11)
      argbImg.setRGB(x, y, ((50 + x * 17) % 256) << 24 |
        ((x * 19) % 256) << 16 | ((y * 31) % 256) << 8 | ((x + y) % 256))
    val (aw, ah, apx) = Multimodal.PngCodec.decode(viaImageIO(argbImg))
    assert((aw, ah) == (11, 7) && apx.length == 4 * 11 * 7)
    for (y <- 0 until 7; x <- 0 until 11) {
      val argb = argbImg.getRGB(x, y)
      val p = 4 * (y * 11 + x)
      assert((apx(p) & 0xff) == ((argb >> 16) & 0xff) &&
        (apx(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
        (apx(p + 2) & 0xff) == (argb & 0xff) &&
        (apx(p + 3) & 0xff) == ((argb >> 24) & 0xff),
        s"RGBA mismatch at ($x,$y)")
    }
    // palette (color type 3): indices map through PLTE to RGB
    val palImg = new java.awt.image.BufferedImage(13, 5,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 5; x <- 0 until 13)
      palImg.setRGB(x, y, ((x * 37) % 256) << 16 | ((y * 53) % 256) << 8)
    val (pw, ph, ppx) = Multimodal.PngCodec.decode(viaImageIO(palImg))
    assert((pw, ph) == (13, 5) && ppx.length == 3 * 13 * 5)
    for (y <- 0 until 5; x <- 0 until 13) {
      val argb = palImg.getRGB(x, y) // already palette-quantized
      val p = 3 * (y * 13 + x)
      assert((ppx(p) & 0xff) == ((argb >> 16) & 0xff) &&
        (ppx(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
        (ppx(p + 2) & 0xff) == (argb & 0xff), s"palette mismatch at ($x,$y)")
    }

    // gray+alpha (color type 4) — hand-built (ImageIO writes gray as
    // type 0); filter 1 rows exercise the bpp=2 left reference
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val td = tag.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(td)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(td).putInt(crc.getValue.toInt).array()
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val (gw, gh) = (6, 3)
    val ga = Array.tabulate(gw * gh * 2)(i =>
      ((i * 23 + 7) % 256).toByte) // interleaved G,A
    val rawGa = new java.io.ByteArrayOutputStream()
    for (y <- 0 until gh) {
      val ft = if (y % 2 == 0) 0 else 1
      rawGa.write(ft)
      for (i <- 0 until gw * 2) {
        val cur = ga(y * gw * 2 + i) & 0xff
        val left = if (ft == 1 && i >= 2) ga(y * gw * 2 + i - 2) & 0xff else 0
        rawGa.write((cur - (if (ft == 1) left else 0)) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(rawGa.toByteArray); defl.finish()
    val zbuf = new Array[Byte](1024)
    val zlen = defl.deflate(zbuf); defl.end()
    def ihdrOf(depth: Int, ct: Int, interlace: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(13).putInt(gw).putInt(gh)
        .put(depth.toByte).put(ct.toByte)
        .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val gaPng = sig ++ chunk("IHDR", ihdrOf(8, 4, 0)) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    val (ggw, ggh, gpx2) = Multimodal.PngCodec.decode(gaPng)
    assert((ggw, ggh) == (gw, gh) && gpx2.toSeq == ga.toSeq)

    // a LYING header still fails loudly: IHDR claiming Adam7 (or 16-bit)
    // over sequential 8-bit scanline data has the wrong raw length and
    // must refuse, never misdecode
    val inter = sig ++ chunk("IHDR", ihdrOf(8, 4, 1)) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    val ei = intercept[IllegalArgumentException](
      Multimodal.PngCodec.decode(inter))
    assert(ei.getMessage.contains("truncated"), ei.getMessage)
    // (16-bit gray over the same bytes is NOT a lie — gray+alpha 8-bit
    // and gray 16-bit share bpp=2, so that reinterpretation decodes to
    // the identical content bytes; use 16-bit RGB for the wrong-length
    // case)
    val deep16 = sig ++ chunk("IHDR", ihdrOf(16, 0, 0)) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.PngCodec.decode(deep16)._3.toSeq == ga.toSeq)
    val deep = sig ++ chunk("IHDR", ihdrOf(16, 2, 0)) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    val ed = intercept[IllegalArgumentException](
      Multimodal.PngCodec.decode(deep))
    assert(ed.getMessage.contains("truncated"), ed.getMessage)
    // invalid depth values and the illegal 16-bit palette refuse by name
    val d3 = sig ++ chunk("IHDR", ihdrOf(3, 0, 0)) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    assert(intercept[IllegalArgumentException](
      Multimodal.PngCodec.decode(d3)).getMessage.contains("bit depth"))
    val p16 = sig ++ chunk("IHDR", ihdrOf(16, 3, 0)) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    assert(intercept[IllegalArgumentException](
      Multimodal.PngCodec.decode(p16)).getMessage.contains("palette"))
  }

  test("INTERLACED (Adam7) and 16-BIT PNG decode pixel-exact vs ImageIO") {
    def viaImageIO(img: java.awt.image.BufferedImage,
                   progressive: Boolean): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val p = w.getDefaultWriteParam
      p.setProgressiveMode(
        if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
        else javax.imageio.ImageWriteParam.MODE_DISABLED)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose(); ios.close()
      bos.toByteArray
    }
    // Adam7 RGB at odd dims (partial passes on both axes) — byte 28 of
    // the container is the IHDR interlace flag: prove we exercised it
    val rgb = new java.awt.image.BufferedImage(13, 11,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 11; x <- 0 until 13)
      rgb.setRGB(x, y, ((x * 41) % 256 << 16) | ((y * 23) % 256 << 8) |
        ((x * 7 + y * 5) % 256))
    val ipng = viaImageIO(rgb, progressive = true)
    assert(ipng(8 + 8 + 12) == 1, "fixture must actually be interlaced")
    val (iw, ih, ipx) = Multimodal.PngCodec.decode(ipng)
    assert((iw, ih) == (13, 11) && ipx.length == 3 * 13 * 11)
    for (y <- 0 until 11; x <- 0 until 13) {
      val argb = rgb.getRGB(x, y)
      val p = 3 * (y * 13 + x)
      assert((ipx(p) & 0xff) == ((argb >> 16) & 0xff) &&
        (ipx(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
        (ipx(p + 2) & 0xff) == (argb & 0xff),
        s"interlaced RGB mismatch at ($x,$y)")
    }
    // tiny interlaced frames: passes that are entirely empty (1x1 has
    // only pass 1; 3x2 skips several) must consume zero scanlines
    for ((tw, th) <- Seq((1, 1), (3, 2), (8, 1), (2, 9))) {
      val t = new java.awt.image.BufferedImage(tw, th,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until th; x <- 0 until tw)
        t.setRGB(x, y, (x * 90 + y * 150 + 9) * 0x010203)
      val png = viaImageIO(t, progressive = true)
      assert(png(28) == 1)
      val (w2, h2, px2) = Multimodal.PngCodec.decode(png)
      assert((w2, h2) == (tw, th))
      for (y <- 0 until th; x <- 0 until tw) {
        val argb = t.getRGB(x, y)
        val p = 3 * (y * tw + x)
        assert((px2(p) & 0xff) == ((argb >> 16) & 0xff) &&
          (px2(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
          (px2(p + 2) & 0xff) == (argb & 0xff),
          s"${tw}x$th interlaced mismatch at ($x,$y)")
      }
    }
    // 16-bit grayscale: content bytes are the big-endian samples
    val g16 = new java.awt.image.BufferedImage(9, 7,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 7; x <- 0 until 9)
      g16.getRaster.setSample(x, y, 0, (x * 8191 + y * 977) % 65536)
    val dpng = viaImageIO(g16, progressive = false)
    assert(dpng(8 + 8 + 8) == 16, "fixture must actually be 16-bit")
    val (dw, dh, dpx) = Multimodal.PngCodec.decode(dpng)
    assert((dw, dh) == (9, 7) && dpx.length == 2 * 9 * 7)
    for (y <- 0 until 7; x <- 0 until 9) {
      val p = 2 * (y * 9 + x)
      val v = ((dpx(p) & 0xff) << 8) | (dpx(p + 1) & 0xff)
      assert(v == g16.getRaster.getSample(x, y, 0),
        s"16-bit gray mismatch at ($x,$y)")
    }
    // 16-bit AND interlaced together (the two generalizations compose)
    val both = viaImageIO(g16, progressive = true)
    assert(both(28) == 1 && both(24) == 16)
    val (bw, bh, bpx) = Multimodal.PngCodec.decode(both)
    assert((bw, bh) == (9, 7) && bpx.toSeq == dpx.toSeq,
      "interlaced 16-bit must decode to the same content bytes")
  }

  test("documents -> mixed WAV/PNG/JPEG/BMP assets -> features: per-kind dispatch") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a" * 130, "web", 130L), // doc_id % 4 == 1 → PNG
      (2L, "b" * 130, "web", 130L), // doc_id % 4 == 2 → JPEG
      (4L, "c" * 50, "web", 50L),   // doc_id % 4 == 0 → WAV
      (7L, "d" * 130, "web", 130L)) // doc_id % 4 == 3 → BMP
      .toDF("doc_id", "text", "source", "n_chars")
    val feats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(docs))
      .collect().sortBy(_.asset_id)
    val pw = 1 + 130 % 64 // = 3
    val ph = (130 + pw - 1) / pw
    assert(feats(0).kind == "image/png")
    assert(feats(0).width == pw && feats(0).height == ph)
    assert(feats(0).n_bytes == 57 + 6 + 5 + ph * (pw + 1))
    // checksum = first 32 DECODED pixels = the text bytes
    assert(feats(0).checksum == 32L * 'a'.toLong)
    assert(feats(1).kind == "image/jpeg")
    // pixel dims = 8x the block grid; every block constant at
    // gray 120 + byte%16 — exact through the flat-quant DCT roundtrip
    assert(feats(1).width == 8 * pw && feats(1).height == 8 * ph)
    // all 130 bytes are 'b' (0x62, %16 = 2, nonzero diff → 2 bytes
    // each; pad blocks too): 316 + 4·blocks − 0
    assert(feats(1).n_bytes == 316 + 4L * pw * ph)
    assert(feats(1).checksum == 32L * (120 + 'b'.toLong % 16))
    assert(feats(2).kind == "audio/wav")
    assert(feats(2).width == 1 && feats(2).height == 50) // (channels, samples)
    assert(feats(2).n_bytes == 44 + 50)
    assert(feats(2).checksum == 32L * 'c'.toLong)
    assert(feats(3).kind == "image/bmp")
    // same height clamp as PNG: every byte held (ceil(130/3) = 44 rows)
    assert(feats(3).width == pw && feats(3).height == ph)
    // conformant container: headers + palette + ph rows at stride 4
    assert(feats(3).n_bytes == 1078 + ph * 4)
    assert(feats(3).checksum == 32L * 'd'.toLong)

    // GIF class (raster residue 3 mod 32): decoded indices through the
    // identity-gray table ARE the text bytes; closed-form size
    val gfeats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(
      Seq((3L, "e" * 130, "web", 130L))
        .toDF("doc_id", "text", "source", "n_chars"))).collect()
    assert(gfeats.head.kind == "image/gif")
    assert(gfeats.head.width == pw && gfeats.head.height == ph)
    assert(gfeats.head.n_bytes == GifCodec.encodedSize(pw * ph))
    assert(gfeats.head.checksum == 32L * 'e'.toLong)
  }

  test("Rice-FLAC residue (doc_id % 32 == 12): the entropy-coded " +
       "container decodes to the text bytes with the closed-form size") {
    val ss = spark
    import ss.implicits._
    val text = "rice residue fixture, mixed CASE so both quotients occur"
    val feats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(
      Seq((12L, text, "web", text.length.toLong))
        .toDF("doc_id", "text", "source", "n_chars"))).collect()
    val n = text.length
    val c64 = text.count(_ >= 64)
    assert(feats.head.kind == "audio/flac")
    assert(feats.head.n_bytes == 42 + 10 + (25 + 8 * n + c64) / 8)
    assert(feats.head.width == 1 && feats.head.height == n)
    assert(feats.head.checksum ==
      text.take(32).map(_.toLong).sum)
  }

  test("empty documents still encode as valid assets (images clamp to one block)") {
    val ss = spark
    import ss.implicits._
    // ceil(0/w) = 0 is not a legal image height: the adapter clamps to
    // one 1x1-pixel PNG / one 8x8 JPEG block, and the q_multimodal
    // oracle mirrors the clamp (GREATEST(1, …) + COALESCE/jcs joins) —
    // this pins the Spark side of that contract on every format branch
    val docs = Seq(
      (0L, "", "web", 0L),  // WAV: empty data region
      (5L, "", "web", 0L),  // doc_id % 4 == 1 → PNG, clamped 1x1
      (6L, "", "web", 0L),  // doc_id % 8 == 6 → COLOR JPEG, one block
      (10L, "", "web", 0L), // doc_id % 16 == 10 → PROGRESSIVE JPEG
      (18L, "", "web", 0L)) // doc_id % 16 == 2 → baseline gray JPEG
      .toDF("doc_id", "text", "source", "n_chars")
    val feats = Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(docs))
      .collect().sortBy(_.asset_id)
    assert(feats(0).kind == "audio/wav" && feats(0).n_bytes == 44 &&
      feats(0).width == 1 && feats(0).height == 0 &&
      feats(0).checksum == 0L)
    assert(feats(1).kind == "image/png" && feats(1).width == 1 &&
      feats(1).height == 1 && feats(1).checksum == 0L)
    // 57 container bytes + zlib(6 + 5·ceil(raw/65535) + raw), raw = 2
    assert(feats(1).n_bytes == 57 + 6 + 5 + 2)
    // COLOR JPEG (id 6): one 8x8 block of pad luma 120, chroma
    // (132, 124) → per-pixel RGB (114, 121, 127); 6 entropy bytes + 2
    // EOI; checksum = 10·(114+121+127) + 114 + 121 (32 RGB bytes)
    assert(feats(2).kind == "image/jpeg" && feats(2).width == 8 &&
      feats(2).height == 8 && feats(2).n_bytes == 326 + 8 &&
      feats(2).checksum == 10L * (114 + 121 + 127) + 114 + 121)
    // PROGRESSIVE JPEG (id 10): one block of pad gray 120 (byte 0 →
    // diff −64, 2 DC bytes, no restarts) + 1 EOB-run byte:
    // 185 + 4·1 − 0 + ceil(1/31)
    assert(feats(3).kind == "image/jpeg" && feats(3).width == 8 &&
      feats(3).height == 8 && feats(3).n_bytes == 185 + 4 + 1 &&
      feats(3).checksum == 32L * 120)
    // baseline gray JPEG (id 18): one block of pad gray 120 (byte 0 →
    // diff -64, 2 code bytes, no restart markers): 316 + 4·1 − 0
    assert(feats(4).kind == "image/jpeg" && feats(4).width == 8 &&
      feats(4).height == 8 && feats(4).n_bytes == 316 + 4 &&
      feats(4).checksum == 32L * 120)
  }

  test("JPEG codec: DC-only blocks round-trip exactly; ImageIO agrees " +
      "pixel-for-pixel; general baseline scans decode") {
    // 1. the deterministic fixture shape: every 8x8 block constant —
    //    our decode must reproduce each gray exactly (flat quant +
    //    DC multiple of 8 → mathematically lossless)
    val grays = Array.tabulate(12)(i => (120 + (i * 7) % 16).toByte)
    val jpg = Multimodal.JpegCodec.encode(4, 3, grays)
    val (w, h, px) = Multimodal.JpegCodec.decode(jpg)
    assert(w == 32 && h == 24)
    for (by <- 0 until 3; bx <- 0 until 4; y <- 0 until 8; x <- 0 until 8)
      assert(px((by * 8 + y) * 32 + bx * 8 + x) == grays(by * 4 + bx),
        s"block ($bx,$by) pixel ($x,$y)")
    // 2. the JDK's OWN JPEG decoder (an independent implementation)
    //    reads our container and produces the same pixels — container
    //    validity end to end: markers, tables, restart cadence, codes
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(ref != null, "ImageIO rejected the encoded JPEG")
    assert(ref.getWidth == 32 && ref.getHeight == 24)
    for (y <- 0 until 24; x <- 0 until 32)
      assert((ref.getRaster.getSample(x, y, 0) & 0xff) ==
        (px(y * 32 + x) & 0xff), s"ImageIO disagrees at ($x,$y)")
    // 3. the general baseline path: ImageIO ENCODES an arbitrary
    //    gradient (real AC coefficients, real quant tables, no
    //    restarts) and our decoder reads it — IDCT precision is
    //    implementation-defined by the spec, so general scans are
    //    checked to ±1 of ImageIO's own decode of the same bytes
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0, (x * 10 + y * 3) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (gw, gh, gpx) = Multimodal.JpegCodec.decode(bytes)
    assert(gw == 24 && gh == 16)
    val again = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 16; x <- 0 until 24) {
      val ours = gpx(y * 24 + x) & 0xff
      val theirs = again.getRaster.getSample(x, y, 0) & 0xff
      assert(math.abs(ours - theirs) <= 1,
        s"general decode off by >1 at ($x,$y): $ours vs $theirs")
    }
    // 4. corrupt containers surface, never pass through as zeros
    intercept[IllegalArgumentException](
      Multimodal.JpegCodec.decode("not a jpeg".getBytes("UTF-8")))
    // 5. a hostile header claiming absurd dims refuses BEFORE any
    //    plane allocation, instead of OOMing the executor: splice
    //    65504x65504 into a valid container's SOF dims
    val huge = jpg.clone()
    // SOF0 body starts after SOI(2)+DQT(69)+marker(2)+len(2)+prec(1)
    val sof = 2 + 69 + 4 + 1
    huge(sof) = 0xff.toByte; huge(sof + 1) = 0xe0.toByte     // height
    huge(sof + 2) = 0xff.toByte; huge(sof + 3) = 0xe0.toByte // width
    val big = intercept[IllegalArgumentException](
      Multimodal.JpegCodec.decode(huge))
    assert(big.getMessage.contains("decode bound"), big.getMessage)
  }

  test("COLOR JPEG: 4:4:4 DC-only containers round-trip exactly, " +
      "ImageIO agrees pixel-for-pixel, and 4:2:0 ImageIO scans decode") {
    // 1. our own container: per-block luma + image-wide chroma
    //    (132, 124) → fixed-point RGB offsets (-6, +1, +7), exact
    val lumas = Array.tabulate(12)(i => (120 + (i * 7) % 16).toByte)
    val jpg = Multimodal.JpegCodec.encodeColor(4, 3, lumas, 132, 124)
    val (w, h, px) = Multimodal.JpegCodec.decode(jpg)
    assert(w == 32 && h == 24)
    assert(px.length == 3 * 32 * 24, "color decode is interleaved RGB")
    for (by <- 0 until 3; bx <- 0 until 4; y <- 0 until 8; x <- 0 until 8) {
      val p = (by * 8 + y) * 32 + bx * 8 + x
      val yv = lumas(by * 4 + bx) & 0xff
      assert((px(3 * p) & 0xff) == yv - 6 &&
        (px(3 * p + 1) & 0xff) == yv + 1 &&
        (px(3 * p + 2) & 0xff) == yv + 7,
        s"block ($bx,$by) pixel ($x,$y)")
    }
    // 2. the JDK's decoder agrees pixel-for-pixel on our container
    //    (same libjpeg fixed-point color convert)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(ref != null, "ImageIO rejected the color JPEG")
    for (y <- 0 until 24; x <- 0 until 32) {
      val rgb = ref.getRGB(x, y)
      val p = y * 32 + x
      assert(((rgb >> 16) & 0xff) == (px(3 * p) & 0xff) &&
        ((rgb >> 8) & 0xff) == (px(3 * p + 1) & 0xff) &&
        (rgb & 0xff) == (px(3 * p + 2) & 0xff),
        s"ImageIO disagrees at ($x,$y)")
    }
    // 3. the general path: ImageIO ENCODES a color gradient (YCbCr,
    //    subsampled chroma — the dominant crawl shape) and our decoder
    //    reads it; IDCT + chroma-upsampling rounding are
    //    implementation-defined, so compare to ImageIO's own decode
    //    of the same bytes within a small tolerance
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 8) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (gw, gh, gpx) = Multimodal.JpegCodec.decode(bytes)
    assert(gw == 24 && gh == 16)
    assert(gpx.length == 3 * 24 * 16)
    val again = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 16; x <- 0 until 24; c <- 0 until 3) {
      val rgb = again.getRGB(x, y)
      val theirs = (rgb >> (16 - 8 * c)) & 0xff
      val ours = gpx(3 * (y * 24 + x) + c) & 0xff
      assert(math.abs(ours - theirs) <= 4,
        s"color decode off by >4 at ($x,$y,$c): $ours vs $theirs")
    }
  }

  test("COLOR JPEG fixture bytes are stuffing-free over the byte domain " +
      "(the oracle's closed-form size arithmetic)") {
    val lumas = Array.tabulate(256)(b => (120 + b % 16).toByte)
    val jpg = Multimodal.JpegCodec.encodeColor(16, 16, lumas, 132, 124)
    val (_, _, px) = Multimodal.JpegCodec.decode(jpg)
    for (i <- 0 until 256) {
      val p = (i / 16 * 8) * 128 + (i % 16) * 8
      assert((px(3 * p) & 0xff) == (lumas(i) & 0xff) - 6)
    }
    // size arithmetic: per MCU 5 bytes when ord%16 in 5..11 (112 of
    // 256) else 6, + 2·255 restart markers + 2 EOI
    assert(Multimodal.JpegCodec.HeaderSizeColor == 326)
    assert(jpg.length == 326 + 8 * 256 - 112)
    // a WIDE MCU (3 × 22 = 66 code bits — more than one 64-bit
    // accumulator holds) must still encode correctly: the packer
    // streams bytes as they fill instead of collecting the whole MCU
    val wide = Multimodal.JpegCodec.encodeColor(1, 2,
      Array(200.toByte, 200.toByte), 200, 200)
    assert(wide.length == 326 + 2 * 9 + 2 + 2) // 9 entropy B/MCU + RST + EOI
    val (ww, wh, wpx) = Multimodal.JpegCodec.decode(wide)
    assert(ww == 8 && wh == 16)
    val wref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(wide))
    for (y <- 0 until 16; x <- 0 until 8) {
      val rgb = wref.getRGB(x, y)
      val p = y * 8 + x
      assert(((rgb >> 16) & 0xff) == (wpx(3 * p) & 0xff) &&
        ((rgb >> 8) & 0xff) == (wpx(3 * p + 1) & 0xff) &&
        (rgb & 0xff) == (wpx(3 * p + 2) & 0xff),
        s"wide-MCU container disagrees with ImageIO at ($x,$y)")
    }
  }

  test("JPEG fixture scan bytes are stuffing-free over the whole byte domain") {
    // the oracle's closed-form size arithmetic assumes no 0xFF ever
    // appears in the entropy segment; prove it for every byte value a
    // document could route into a block (the encoder also throws if
    // one would be emitted)
    val grays = Array.tabulate(256)(b => (120 + b % 16).toByte)
    val jpg = Multimodal.JpegCodec.encode(16, 16, grays)
    val (_, _, px) = Multimodal.JpegCodec.decode(jpg)
    for (i <- 0 until 256)
      assert(px((i / 16 * 8) * 128 + (i % 16) * 8) == grays(i))
    // size arithmetic: all 256 grays here have diff 0 only when
    // b%16 == 8 → 16 one-byte blocks, 240 two-byte blocks (the
    // q_multimodal oracle's constant is HeaderSize, pinned here)
    assert(Multimodal.JpegCodec.HeaderSize == 316)
    assert(jpg.length == Multimodal.JpegCodec.HeaderSize + 4 * 256 - 16)
  }

  test("corrupt-asset quarantine: decodeAll survives broken containers " +
      "with exact reject accounting; the strict path still throws") {
    val ss = spark
    import ss.implicits._
    // one full residue cycle: ids 0..63 cover every codec class twice,
    // every corrupt residue {4,9,18,27} twice and the oversize residue
    // (26) twice
    val docs = (0L until 64L)
      .map(id => (id, "q" * (20 + id.toInt % 7), "web", (20 + id % 7)))
      .toDF("doc_id", "text", "source", "n_chars")
    val rows = Multimodal.decodeAll(Multimodal.assetsWithEdgeCases(docs))
      .collect().sortBy(_.asset_id)
    // count conservation: every input row is exactly one output row
    assert(rows.length === 64)
    val expectReject = (0L until 64L).filter(id =>
      Multimodal.CorruptResidues(id % 32) ||
        id % 32 == Multimodal.OversizeResidue).toSet
    assert(rows.filterNot(_.ok).map(_.asset_id).toSet === expectReject)
    // reject tagging: class + bytes are exact, the codec message rides
    rows.filterNot(_.ok).foreach { r =>
      if (r.asset_id % 32 == Multimodal.OversizeResidue) {
        assert(r.error_class === Some("oversize"))
        assert(r.n_bytes === Multimodal.HostileDimsJpeg.length.toLong)
        // the refusal routes the operator at the bounded-memory path
        assert(r.error.exists(_.contains("decodeDcScaled")), r.error)
      } else {
        assert(r.error_class === Some("decode-error"))
        assert(r.n_bytes === Multimodal.CorruptTruncLen.toLong)
      }
      assert(r.checksum.isEmpty && r.feature.isEmpty)
    }
    // surviving rows decode IDENTICALLY to the strict path on the
    // clean subset — quarantine must not perturb good containers
    val strict = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(
        docs.filter(!col("doc_id").isin(expectReject.toSeq: _*))))
      .collect().sortBy(_.asset_id)
    val okRows = rows.filter(_.ok)
    assert(okRows.map(_.asset_id).toSeq === strict.map(_.asset_id).toSeq)
    okRows.zip(strict).foreach { case (r, f) =>
      assert(r.checksum === Some(f.checksum) &&
        r.width === Some(f.width) && r.height === Some(f.height) &&
        r.n_bytes === f.n_bytes)
    }
    // a clean corpus quarantines NOTHING (no false rejects)
    assert(Multimodal.decodeAll(Multimodal.assetsFromDocuments(docs))
      .filter(r => !r.ok).count() === 0L)
    // an unknown kind is a tagged reject in the quarantine path …
    val alien = Multimodal.decodeAll(
      Seq(Multimodal.Asset(1L, "video/av1", Array[Byte](1, 2), "web", 2L))
        .toDS()).collect()
    assert(alien.head.error_class === Some("unknown-kind"))
    // … and still THROWS on the strict path (a curated fixture corpus
    // must fail loudly, never under-count)
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.extractFeatures(Multimodal.assetsWithEdgeCases(docs))
        .count())
    assert(e.getMessage != null)
  }

  test("0xFF fill bytes before restart markers decode (T.81 B.1.1.2), " +
      "baseline and progressive") {
    // a conformant encoder may pad any marker — restart markers
    // included — with runs of 0xFF fill bytes; the marker walks in the
    // header and between scans already consume them, and the restart
    // resync must too. Insert a fill byte before EVERY RSTn (0xFF
    // 0xD0..0xD7 appears nowhere else in these containers: entropy
    // 0xFF would be stuffed 0xFF00, and no header marker is in that
    // range) and require pixel-identical decodes.
    def padRestarts(jpg: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < jpg.length) {
        val b = jpg(i) & 0xff
        if (b == 0xff && i + 1 < jpg.length &&
            (jpg(i + 1) & 0xff) >= 0xd0 && (jpg(i + 1) & 0xff) <= 0xd7)
          out.write(0xff) // fill, then the marker's own 0xFF follows
        out.write(b)
        i += 1
      }
      out.toByteArray
    }
    val grays = Array.tabulate(256)(b => (120 + b % 16).toByte)
    for (jpg <- Seq(Multimodal.JpegCodec.encode(16, 16, grays),
        Multimodal.JpegCodec.encodeProgressiveGray(16, 16, grays))) {
      val padded = padRestarts(jpg)
      assert(padded.length > jpg.length, "fixture must contain restarts")
      val (w0, h0, px0) = Multimodal.JpegCodec.decode(jpg)
      val (w1, h1, px1) = Multimodal.JpegCodec.decode(padded)
      assert((w1, h1) == (w0, h0) && px1.toSeq == px0.toSeq)
    }
  }

  test("decodeDcScaled: pixel-exact 1/8-scale decode, and the oversize " +
      "path routes through it") {
    // 1. small containers: on flat (DC-only) blocks the 1/8-scale
    //    pixel IS the block value — exact on every container class
    val grays = Array.tabulate(12)(b => (120 + (b * 7) % 16).toByte)
    val gray = Multimodal.JpegCodec.encode(4, 3, grays)
    val (gw, gh, gpx) = Multimodal.JpegCodec.decodeDcScaled(gray)
    assert((gw, gh) == (4, 3) && gpx.toSeq === grays.toSeq)
    val prog = Multimodal.JpegCodec.encodeProgressiveGray(4, 3, grays)
    val (pw, ph, ppx) = Multimodal.JpegCodec.decodeDcScaled(prog)
    assert((pw, ph) == (4, 3) && ppx.toSeq === grays.toSeq)
    // color 4:4:4: scaled RGB triplet == the full decode's block-corner
    // pixel (blocks are flat, chroma constant)
    val color = Multimodal.JpegCodec.encodeColor(4, 3, grays, 132, 124)
    val (_, _, full) = Multimodal.JpegCodec.decode(color)
    val (cw, chh, cpx) = Multimodal.JpegCodec.decodeDcScaled(color)
    assert((cw, chh) == (4, 3))
    for (y <- 0 until 3; x <- 0 until 4; ch <- 0 until 3)
      assert(cpx(3 * (y * 4 + x) + ch) ==
        full(3 * ((8 * y) * 32 + 8 * x) + ch))

    // 2. a frame past the full decoder's 2^26-px bound (16384×8192 =
    //    2^27): decode refuses with the oversize class POINTING AT the
    //    DC path, and the DC path decodes it pixel-exactly in
    //    block-proportional memory — baseline and progressive
    val bigGrays = Array.tabulate(2048 * 1024)(b => (120 + b % 16).toByte)
    for (big <- Seq(Multimodal.JpegCodec.encode(2048, 1024, bigGrays),
        Multimodal.JpegCodec.encodeProgressiveGray(2048, 1024, bigGrays))) {
      val e = intercept[Multimodal.OversizeException](
        Multimodal.JpegCodec.decode(big))
      assert(e.getMessage.contains("decodeDcScaled"), e.getMessage)
      val (bw, bh, bpx) = Multimodal.JpegCodec.decodeDcScaled(big)
      assert((bw, bh) == (2048, 1024))
      assert(java.util.Arrays.equals(bpx, bigGrays))
    }

    // 3. an ImageIO progressive frame (the IJG standard progression:
    //    DC first at Al=1 + DC REFINEMENT at Ah=1 — the successive-
    //    approximation path — plus AC scans the DC decode skips
    //    bytewise): each scaled pixel must equal its block's mean in
    //    the full decode up to per-pixel rounding (AC bases have zero
    //    mean, so DC/8 IS the block mean of the reconstruction)
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = 40 + (x * 3 + y * 5) % 160
      img.getRaster.setSample(x, y, 0, v)
    }
    val jio = encodeProgressive(img)
    val (fw, fh, fpx) = Multimodal.JpegCodec.decode(jio)
    val (sw, sh, spx) = Multimodal.JpegCodec.decodeDcScaled(jio)
    assert((sw, sh) == (8, 6) && (fw, fh) == (64, 48))
    for (by <- 0 until 6; bx <- 0 until 8) {
      var sum = 0.0
      for (y <- 0 until 8; x <- 0 until 8)
        sum += (fpx((8 * by + y) * 64 + 8 * bx + x) & 0xff)
      val mean = sum / 64.0
      val dcv = spx(by * 8 + bx) & 0xff
      assert(math.abs(mean - dcv) <= 2.0,
        s"block ($bx,$by): full-decode mean $mean vs DC-scaled $dcv")
    }
  }

  test("resizeBmp: nearest-neighbor pixels, floor dims, zero-fill past data") {
    // 4x4 image, pixel (x,y) = 10*y + x
    val px = Array.tabulate(16)(i => (10 * (i / 4) + (i % 4)).toByte)
    val bmp = Multimodal.BmpCodec.encode(4, 4, px)
    val half = Multimodal.resizeBmp(bmp, 2)
    val (w, h, hpx) = Multimodal.BmpCodec.decodePixels(half)
    assert(w == 2 && h == 2)
    // out(x,y) = in(2x, 2y): 0, 2, 20, 22
    assert(hpx.toSeq === Seq[Byte](0, 2, 20, 22))
    // factor larger than the image floors to 1x1 (top-left pixel)
    val (w1, h1, _) = Multimodal.BmpCodec.decodePixels(
      Multimodal.resizeBmp(bmp, 9))
    assert(w1 == 1 && h1 == 1)
    // declared dims exceeding the data: sampled pixels past the payload are 0
    val short = Multimodal.BmpCodec.encode(4, 4, Array[Byte](1, 2, 3, 4))
    val rs = Multimodal.resizeBmp(short, 2)
    assert(Multimodal.BmpCodec.decodePixels(rs)._3.toSeq ===
      Seq[Byte](1, 3, 0, 0))
  }

  test("SUB-BYTE PNG (1/2/4-bit) decodes pixel-exact vs ImageIO, " +
       "sequential and interlaced") {
    def write(img: java.awt.image.BufferedImage,
              progressive: Boolean): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val p = w.getDefaultWriteParam
      p.setProgressiveMode(
        if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
        else javax.imageio.ImageWriteParam.MODE_DISABLED)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose(); ios.close()
      bos.toByteArray
    }
    // 1-bit: TYPE_BYTE_BINARY writes depth-1 gray; raw samples 0/1.
    // Odd width exercises the row-padding bits.
    val bin = new java.awt.image.BufferedImage(19, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 7; x <- 0 until 19)
      bin.getRaster.setSample(x, y, 0, (x * 3 + y * 5) % 2)
    for (prog <- Seq(false, true)) {
      val png = write(bin, prog)
      assert(png(24) == 1, s"fixture depth (prog=$prog)")
      val (w1, h1, px1) = Multimodal.PngCodec.decode(png)
      assert((w1, h1) == (19, 7))
      for (y <- 0 until 7; x <- 0 until 19)
        assert((px1(y * 19 + x) & 0xff) == bin.getRaster.getSample(x, y, 0),
          s"1-bit (prog=$prog) mismatch at ($x,$y)")
    }
    // 4-bit palette: a 16-entry IndexColorModel → depth-4 color type 3,
    // decoded through PLTE to RGB (compare against getRGB)
    val cmap = Array.tabulate(16)(i =>
      (i * 17) << 16 | ((15 - i) * 17) << 8 | (i * 5))
    val icm = new java.awt.image.IndexColorModel(4, 16,
      cmap, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val pal = new java.awt.image.BufferedImage(11, 6,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until 6; x <- 0 until 11)
      pal.getRaster.setSample(x, y, 0, (x + y * 3) % 16)
    for (prog <- Seq(false, true)) {
      val png = write(pal, prog)
      assert(png(24) == 4 && png(25) == 3, s"fixture shape (prog=$prog)")
      val (w4, h4, px4) = Multimodal.PngCodec.decode(png)
      assert((w4, h4) == (11, 6) && px4.length == 3 * 11 * 6)
      for (y <- 0 until 6; x <- 0 until 11) {
        val argb = pal.getRGB(x, y)
        val p = 3 * (y * 11 + x)
        assert((px4(p) & 0xff) == ((argb >> 16) & 0xff) &&
          (px4(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
          (px4(p + 2) & 0xff) == (argb & 0xff),
          s"4-bit palette (prog=$prog) mismatch at ($x,$y)")
      }
    }
    // 2-bit gray: hand-built (ImageIO has no 2-bit writer) — packed
    // MSB-first, filter 2 (Up) rows exercise the byte-back reference
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val td = tag.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(td)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(td).putInt(crc.getValue.toInt).array()
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val (gw, gh) = (9, 4) // 9 2-bit samples = 3 row bytes (6 pad bits)
    val samples = Array.tabulate(gw * gh)(i => (i * 7 % 4).toByte)
    def packRow(y: Int): Array[Byte] = {
      val row = new Array[Byte](3)
      for (x <- 0 until gw) {
        val bit = x * 2
        row(bit >> 3) = (row(bit >> 3) |
          (samples(y * gw + x) << (6 - (bit & 7)))).toByte
      }
      row
    }
    val rawOut = new java.io.ByteArrayOutputStream()
    var prevRow = new Array[Byte](3)
    for (y <- 0 until gh) {
      val row = packRow(y)
      if (y % 2 == 0) { rawOut.write(0); rawOut.write(row) }
      else { // filter 2: Up — deltas against the previous packed row
        rawOut.write(2)
        for (i <- 0 until 3)
          rawOut.write((row(i) - prevRow(i)) & 0xff)
      }
      prevRow = row
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(rawOut.toByteArray); defl.finish()
    val zbuf = new Array[Byte](256)
    val zlen = defl.deflate(zbuf); defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(gw).putInt(gh)
      .put(2.toByte).put(0.toByte) // depth 2, gray
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png2 = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    val (w2, h2, px2) = Multimodal.PngCodec.decode(png2)
    assert((w2, h2) == (gw, gh))
    assert(px2.toSeq == samples.toSeq, "2-bit gray raw samples")
    // sub-byte RGB stays illegal
    val bad = sig ++ chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(4).put(4.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
    assert(intercept[IllegalArgumentException](
      Multimodal.PngCodec.decode(bad)).getMessage.contains("legal"))
  }

  test("MP3 containers validate through the quarantine: tag-invariant " +
       "identity, walked metadata, corrupt -> one reject row") {
    val ss = spark
    import ss.implicits._
    def fr(seed: Int) = Mp3Codec.buildFrame(1, 3, 9, 0, 0, mono = false,
      withCrc = false, i => ((i * 13 + seed) % 256).toByte)
    val audio = fr(1) ++ fr(2)
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    val tagged = audio ++ v1 // same frames, extra ID3v1 trailer
    val corrupt = java.util.Arrays.copyOf(audio, audio.length - 5)
    val assets = Seq(
      Multimodal.Asset(1L, "audio/mpeg", audio, "web", 0L),
      Multimodal.Asset(2L, "audio/mpeg", tagged, "web", 0L),
      Multimodal.Asset(3L, "audio/mpeg", corrupt, "web", 0L)).toDS()
    val rows = Multimodal.decodeAll(assets).collect().sortBy(_.asset_id)
    assert(rows(0).ok && rows(1).ok && !rows(2).ok)
    assert(rows(2).error_class.contains("decode-error"))
    // ID3-invariant: the tagged copy shares checksum AND feature with
    // the bare one (the dedup identity is the frame stream)
    assert(rows(0).checksum == rows(1).checksum)
    assert(rows(0).feature.get.toSeq == rows(1).feature.get.toSeq)
    // walked metadata: stereo, 2 frames x 1152 samples
    assert(rows(0).width.contains(2) && rows(0).height.contains(2304))
  }

  test("WebP/Ogg/MP4 container kinds validate through the quarantine " +
       "with metadata-invariant identities") {
    val ss = spark
    import ss.implicits._
    import ContainerWalks._
    // minimal valid containers via the spec builders
    val vp8 = {
      val d = new Array[Byte](26)
      d(0) = 0x10; d(3) = 0x9d.toByte; d(4) = 0x01; d(5) = 0x2a
      d(6) = 9; d(8) = 7 // 9x7
      for (i <- 10 until 26) d(i) = (i * 3).toByte
      val body = "VP8 ".getBytes ++
        Array[Byte](26, 0, 0, 0) ++ d
      val out = new Array[Byte](12 + body.length)
      "RIFF".getBytes.copyToArray(out, 0)
      out(4) = (4 + body.length).toByte
      "WEBP".getBytes.copyToArray(out, 8)
      body.copyToArray(out, 12)
      out
    }
    val ogg = OggCodec.buildPage("opus-ish bytes".getBytes, 2, 0, 5, 0)
    val mp4 = {
      val mvhdBody = new Array[Byte](100)
      mvhdBody(12) = 0; mvhdBody(13) = 0; mvhdBody(14) = 3
      mvhdBody(15) = 0xe8.toByte // timescale 1000
      mvhdBody(19) = 42 // duration 42 -> 42 ms
      Mp4Codec.box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
        Mp4Codec.box("moov", Mp4Codec.box("mvhd", mvhdBody)) ++
        Mp4Codec.box("mdat", "media bytes".getBytes)
    }
    val corruptOgg = ogg.clone(); corruptOgg(30) = (corruptOgg(30) ^ 1).toByte
    val assets = Seq(
      Multimodal.Asset(1L, "image/webp", vp8, "web", 0L),
      Multimodal.Asset(2L, "audio/ogg", ogg, "web", 0L),
      Multimodal.Asset(3L, "audio/mp4", mp4, "web", 0L),
      Multimodal.Asset(4L, "audio/ogg", corruptOgg, "web", 0L)).toDS()
    val rows = Multimodal.decodeAll(assets).collect().sortBy(_.asset_id)
    assert(rows(0).ok && rows(0).width.contains(9) &&
      rows(0).height.contains(7))
    assert(rows(1).ok && rows(1).width.contains(1) &&
      rows(1).height.contains(1))
    assert(rows(2).ok && rows(2).height.contains(42), rows(2))
    assert(!rows(3).ok && rows(3).error_class.contains("decode-error"))
  }

  test("ICO and TIFF ride the quarantine: valid walks admit with dims " +
       "and the metadata-invariant checksum, corrupt ones tag rejects") {
    val ss = spark
    import ss.implicits._
    val png = Multimodal.PngCodec.encode(3, 2,
      Array.tabulate[Byte](6)(i => (i + 1).toByte))
    val ico = ContainerWalks.IcoCodec.build(Seq((3, 2, png)))
    val px = Array.tabulate[Byte](24)(i => (i * 7 + 3).toByte)
    val tiff = ContainerWalks.TiffCodec.build(big = true, 6, 4, Seq(px),
      software = "scanner nine")
    val assets = Seq(
      Multimodal.Asset(1L, "image/x-icon", ico, "web", 0L),
      Multimodal.Asset(2L, "image/tiff", tiff, "web", 0L),
      Multimodal.Asset(3L, "image/x-icon",
        java.util.Arrays.copyOf(ico, 12), "web", 0L),
      Multimodal.Asset(4L, "image/tiff",
        java.util.Arrays.copyOf(tiff, 20), "web", 0L)).toDS()
    val rows = Multimodal.decodeAll(assets).collect().sortBy(_.asset_id)
    assert(rows(0).ok && rows(0).width.contains(3) &&
      rows(0).height.contains(2), "dims from the PNG entry's own IHDR")
    assert(rows(0).checksum.contains(
      png.take(32).map(b => (b & 0xff).toLong).sum))
    assert(rows(1).ok && rows(1).width.contains(6) &&
      rows(1).height.contains(4))
    assert(rows(1).checksum.contains(
      px.take(32).map(b => (b & 0xff).toLong).sum),
      "TIFF checksum must fold strips, never metadata tags")
    assert(!rows(2).ok && rows(2).error_class.contains("decode-error"))
    assert(!rows(3).ok && rows(3).error_class.contains("decode-error"))
  }

  test("resizeAssets passes COLOR BMPs through unchanged (8-bpp only resizes)") {
    val ss = spark
    import ss.implicits._
    // a real 24-bpp BMP via ImageIO — decodePixels yields 3·w·h samples,
    // so resizeBmp's 8-bpp contract doesn't hold; the asset must pass
    // through rather than fail the partition
    val cimg = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 6)
      cimg.setRGB(x, y, (x * 40 << 16) | (y * 60 << 8) | 0x20)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(cimg, "bmp", bos)
    val color = bos.toByteArray
    val gray = Multimodal.BmpCodec.encode(4, 4, Array.tabulate(16)(_.toByte))
    val assets = Seq(
      Multimodal.Asset(1L, "image/bmp", color, "web", 0L),
      Multimodal.Asset(2L, "image/bmp", gray, "web", 0L)).toDS()
    val out = Multimodal.resizeAssets(assets, 2).collect().sortBy(_.asset_id)
    assert(out(0).payload.toSeq == color.toSeq, "color BMP passes through")
    val (w, h, _) = Multimodal.BmpCodec.decodePixels(out(1).payload)
    assert((w, h) == (2, 2), "gray BMP still resizes")
  }

  test("resizeAssets dispatches per kind; frameEnergies is an exact byte model") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (2L, "b" * 100, "web", 100L),           // doc_id % 4 == 2 → gray JPEG
      (7L, "x" * 100, "web", 100L),           // doc_id % 4 == 3 → BMP: w=37, h=3
      (4L, "ab" * 80, "web", 160L),           // doc_id % 4 == 0 → WAV: 160 bytes
      (3L, "y" * 100, "web", 100L))           // doc_id % 32 == 3 → GIF
      .toDF("doc_id", "text", "source", "n_chars")
    val assets = Multimodal.assetsFromDocuments(docs)
    val resized = Multimodal.resizeAssets(assets, 2)
      .collect().sortBy(_.asset_id)
    val (rw, rh, _) = Multimodal.BmpCodec.decode(resized(3).payload)
    assert((rw, rh) == (18, 1), "37x3 halves to 18x1")
    assert(resized(2).payload.toSeq == assets.collect()
      .find(_.asset_id == 4L).get.payload.toSeq, "audio passes through")
    // the fixture GIF's identity-gray table makes it a gray raster:
    // it resizes through the BMP interchange ("y"*100 → 37x3 → 18x1,
    // pixels = the strided text bytes, all 'y')
    assert(resized(1).kind == "image/bmp")
    val (gw2, gh2, gpx) = Multimodal.BmpCodec.decodePixels(resized(1).payload)
    assert((gw2, gh2) == (18, 1) && gpx.forall(_ == 'y'.toByte))
    assert(resized(0).kind == "image/jpeg" && resized(0).payload.toSeq ==
      assets.collect().find(_.asset_id == 2L).get.payload.toSeq,
      "factor 2 is off the 8-px block grid: JPEG passes through")
    // factor 8: the JPEG thumbnails through the DC grid into a REAL
    // BMP — one pixel per block, exact on DC-only containers
    val thumb = Multimodal.resizeAssets(assets, 8)
      .collect().sortBy(_.asset_id).head
    assert(thumb.kind == "image/bmp")
    val (tw, th, tpx) = Multimodal.BmpCodec.decodePixels(thumb.payload)
    val (jw, jh) = (1 + 100 % 64, (100 + 36) / 37) // 37x3 blocks
    assert((tw, th) == (jw, jh), s"got ${(tw, th)}")
    val expected = Multimodal.JpegCodec.decodeDcScaled(
      assets.collect().find(_.asset_id == 2L).get.payload)._3
    assert(tpx.toSeq == expected.toSeq)
    // factor 16: DC grid then nearest-neighbor halving
    val t16 = Multimodal.resizeAssets(assets, 16)
      .collect().sortBy(_.asset_id).head
    val (sw, sh, _) = Multimodal.BmpCodec.decode(t16.payload)
    assert((sw, sh) == (jw / 2, 1), s"got ${(sw, sh)}")
    // frames of 64 over 160 bytes: [64, 64, 32]; every 2nd -> frames 0, 2
    val fe = Multimodal.frameEnergies(assets, 64, 2)
      .collect().sortBy(f => (f.asset_id, f.frame))
    val bytes = ("ab" * 80).getBytes("UTF-8").map(_ & 0xff)
    assert(fe.map(f => (f.asset_id, f.frame, f.n)).toSeq ===
      Seq((4L, 0L, 64L), (4L, 2L, 32L)))
    assert(fe(0).energy === bytes.slice(0, 64).map(_.toLong).sum)
    assert(fe(1).energy === bytes.slice(128, 160).map(_.toLong).sum)
  }

  /** ImageIO's progressive writer (the IJG standard progression) —
    * shared by every progressive cross-validation test. */
  private def encodeProgressive(
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("PROGRESSIVE JPEG fixture containers: exact pixel roundtrip, " +
      "ImageIO agrees, closed-form size over the whole byte domain") {
    // 1. the deterministic fixture shape as a SOF2 container: decoded
    //    pixels must equal the baseline encoder's exactly (same DC-only
    //    blocks through the same flat-quant roundtrip)
    val grays = Array.tabulate(256)(b => (120 + b % 16).toByte)
    val jpg = Multimodal.JpegCodec.encodeProgressiveGray(16, 16, grays)
    val (w, h, px) = Multimodal.JpegCodec.decode(jpg)
    assert(w == 128 && h == 128)
    for (i <- 0 until 256)
      assert(px((i / 16 * 8) * 128 + (i % 16) * 8) == grays(i))
    // 2. closed-form size: with no EOB nibble in a DC scan a block is
    //    ONE byte whenever its category ≤ 5 (byte %16 in 5..11 — 112
    //    of 256), else two; + 2·255 restarts + ceil(256/31) EOB-run
    //    bytes — the q_multimodal oracle's arithmetic
    assert(Multimodal.JpegCodec.SizeProgConst == 185)
    assert(jpg.length == 185 + 4 * 256 - 112 + (256 + 30) / 31)
    // 3. the JDK's decoder (an independent progressive implementation)
    //    agrees pixel-for-pixel on our container
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(ref != null, "ImageIO rejected the progressive JPEG")
    assert(ref.getWidth == 128 && ref.getHeight == 128)
    for (y <- 0 until 128; x <- 0 until 128)
      assert((ref.getRaster.getSample(x, y, 0) & 0xff) ==
        (px(y * 128 + x) & 0xff), s"ImageIO disagrees at ($x,$y)")
    // 4. chunk-boundary block counts: 31 (one full run), 32 (31+1),
    //    47 (31+16: the trailing chunk is itself byte-exact), 1
    for (m <- Seq(1, 15, 16, 31, 32, 47, 62, 63)) {
      val g = Array.tabulate(m)(i => (120 + (i * 3) % 16).toByte)
      val j = Multimodal.JpegCodec.encodeProgressiveGray(m, 1, g)
      val (mw, mh, mpx) = Multimodal.JpegCodec.decode(j)
      assert(mw == 8 * m && mh == 8)
      for (i <- 0 until m) assert(mpx(i * 8) == g(i), s"m=$m block $i")
      val cntSmall = g.count(b => math.abs((b & 0xff) - 128) <= 3)
      assert(j.length == 185 + 4 * m - cntSmall + (m + 30) / 31, s"m=$m")
    }
  }

  test("PROGRESSIVE JPEG: ImageIO-encoded multi-scan frames decode, " +
      "gray and 4:2:0 color, odd dims") {
    // ImageIO writes the IJG standard progression (spectral selection
    // + successive approximation: DC first/refine, AC first/refine,
    // EOB runs) — the dominant shape of real crawled JPEGs after
    // baseline. Our decoder accumulates coefficients across scans and
    // renders once; the referee is ImageIO's OWN decode of the same
    // bytes, so the comparison isolates our scan algebra from
    // implementation-defined IDCT/upsampling rounding.
    def countMarkers(bytes: Array[Byte], m: Int): Int =
      (0 until bytes.length - 1).count(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)

    // gray, odd dims (41×23: the last block row/column is partial)
    val gimg = new java.awt.image.BufferedImage(41, 23,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 23; x <- 0 until 41)
      gimg.getRaster.setSample(x, y, 0, (x * 11 + y * 5) % 256)
    val gbytes = encodeProgressive(gimg)
    assert(countMarkers(gbytes, 0xc2) == 1, "expected a SOF2 frame")
    assert(countMarkers(gbytes, 0xda) >= 3, "expected multiple scans")
    val (gw, gh, gpx) = Multimodal.JpegCodec.decode(gbytes)
    assert(gw == 41 && gh == 23)
    val gref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gbytes))
    for (y <- 0 until 23; x <- 0 until 41) {
      val ours = gpx(y * 41 + x) & 0xff
      val theirs = gref.getRaster.getSample(x, y, 0) & 0xff
      assert(math.abs(ours - theirs) <= 1,
        s"progressive gray off by >1 at ($x,$y): $ours vs $theirs")
    }

    // 4:2:0 color, odd dims (45×29: luma padded grid 6×4 blocks but
    // non-interleaved AC scans cover only ceil(45/8)×ceil(29/8) = 6×4
    // vs chroma ceil(23/8)×ceil(15/8) = 3×2 — exercises the padded vs
    // component-dim block geometries)
    val cimg = new java.awt.image.BufferedImage(45, 29,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 29; x <- 0 until 45)
      cimg.setRGB(x, y, ((x * 5 + 16) << 16) | ((y * 7 + 32) << 8) |
        ((x * 2 + y * 3 + 64) & 0xff))
    val cbytes = encodeProgressive(cimg)
    assert(countMarkers(cbytes, 0xc2) == 1, "expected a SOF2 frame")
    assert(countMarkers(cbytes, 0xda) >= 4, "expected multiple scans")
    val (cw, ch, cpx) = Multimodal.JpegCodec.decode(cbytes)
    assert(cw == 45 && ch == 29)
    assert(cpx.length == 3 * 45 * 29)
    val cref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cbytes))
    for (y <- 0 until 29; x <- 0 until 45; c <- 0 until 3) {
      val rgb = cref.getRGB(x, y)
      val theirs = (rgb >> (16 - 8 * c)) & 0xff
      val ours = cpx(3 * (y * 45 + x) + c) & 0xff
      assert(math.abs(ours - theirs) <= 4,
        s"progressive color off by >4 at ($x,$y,$c): $ours vs $theirs")
    }
  }

  test("PROGRESSIVE JPEG: randomized cross-validation against ImageIO " +
      "over sizes, content and gray/color") {
    // seeded sweep: random pixel content (worst case for scan algebra
    // — every AC band populated, refinement bits everywhere), random
    // dims including partial edge blocks, gray and color. ImageIO
    // decodes its own encoding as the referee; tolerances as in the
    // fixed cases (IDCT/upsampling rounding is implementation-defined)
    val rnd = new scala.util.Random(0xc2c2)
    for (round <- 0 until 6) {
      val w = 8 + rnd.nextInt(72)
      val h = 8 + rnd.nextInt(56)
      val color = round % 2 == 1
      val img = new java.awt.image.BufferedImage(w, h,
        if (color) java.awt.image.BufferedImage.TYPE_INT_RGB
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        if (color) img.setRGB(x, y, rnd.nextInt(1 << 24))
        else img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
      }
      val bytes = encodeProgressive(img)
      val (dw, dh, px) = Multimodal.JpegCodec.decode(bytes)
      assert(dw == w && dh == h, s"round $round dims")
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var worst = 0
      for (y <- 0 until h; x <- 0 until w) {
        if (color) {
          val rgb = ref.getRGB(x, y)
          for (c <- 0 until 3) {
            val d = math.abs(((rgb >> (16 - 8 * c)) & 0xff) -
              (px(3 * (y * w + x) + c) & 0xff))
            worst = math.max(worst, d)
          }
        } else {
          val d = math.abs((ref.getRaster.getSample(x, y, 0) & 0xff) -
            (px(y * w + x) & 0xff))
          worst = math.max(worst, d)
        }
      }
      // random full-spectrum content: allow a slightly wider envelope
      // than the smooth gradients (chroma upsampling at block edges of
      // noise is the worst case for implementation-defined rounding)
      assert(worst <= (if (color) 8 else 2),
        s"round $round ($w x $h, color=$color): worst pixel delta $worst")
    }
  }

  test("fixture precondition: multimodal-routed documents are pure ASCII") {
    // the q_media_frames and q_multimodal DuckDB oracles recompute
    // content-region values with ord(substr(text, p, 1)) — character
    // indexing — while the engine walks BYTES (WAV data region, BMP
    // pixels, decoded PNG pixels). The two agree iff the fixture text
    // is ASCII (1 byte per char, ord == byte). Guard that precondition
    // here so a future non-ASCII fixture fails loudly in this suite
    // instead of as a silent oracle divergence. Since the checksum now
    // covers every kind, EVERY doc must satisfy it.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nonAscii = docs
      .filter(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii === 0L, "multimodal fixture docs must be ASCII")
  }
}
