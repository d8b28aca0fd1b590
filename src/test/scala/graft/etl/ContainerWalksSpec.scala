package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import ContainerWalks._

class ContainerWalksSpec extends AnyFunSuite {

  // ---- WebP -----------------------------------------------------------

  private def riff(chunks: (String, Array[Byte])*): Array[Byte] = {
    val body = chunks.flatMap { case (tag, data) =>
      val hdr = new Array[Byte](8)
      tag.getBytes("US-ASCII").copyToArray(hdr, 0)
      hdr(4) = data.length.toByte
      hdr(5) = (data.length >> 8).toByte
      hdr(6) = (data.length >> 16).toByte
      hdr(7) = (data.length >> 24).toByte
      hdr ++ data ++ (if (data.length % 2 == 1) Array(0.toByte)
        else Array.emptyByteArray)
    }.toArray
    val len = 4 + body.length
    val out = new Array[Byte](8 + 4 + body.length)
    "RIFF".getBytes.copyToArray(out, 0)
    out(4) = len.toByte; out(5) = (len >> 8).toByte
    out(6) = (len >> 16).toByte; out(7) = (len >> 24).toByte
    "WEBP".getBytes.copyToArray(out, 8)
    body.copyToArray(out, 12)
    out
  }

  private def vp8Chunk(w: Int, h: Int, extra: Int = 16): Array[Byte] = {
    val d = new Array[Byte](10 + extra)
    d(0) = 0x10 // frame tag: keyframe (bit0=0), show_frame
    d(3) = 0x9d.toByte; d(4) = 0x01; d(5) = 0x2a
    d(6) = w.toByte; d(7) = ((w >> 8) & 0x3f).toByte
    d(8) = h.toByte; d(9) = ((h >> 8) & 0x3f).toByte
    for (i <- 10 until d.length) d(i) = (i * 7).toByte
    d
  }

  test("WebP: lossy, lossless and extended headers parse; metadata " +
       "chunks are excluded from the content identity") {
    val lossy = riff("VP8 " -> vp8Chunk(321, 207))
    val li = WebpCodec.parse(lossy)
    assert(li.variant == "VP8 " && li.width == 321 && li.height == 207)
    // VP8L: width-1 / height-1 in 14-bit LSB-first fields after 0x2F
    val (lw, lh) = (800, 600)
    val bits = (lw - 1).toLong | ((lh - 1).toLong << 14)
    val vp8l = new Array[Byte](9)
    vp8l(0) = 0x2f
    for (i <- 0 until 4) vp8l(1 + i) = (bits >> (8 * i)).toByte
    val lossless = riff("VP8L" -> vp8l)
    val ll = WebpCodec.parse(lossless)
    assert(ll.variant == "VP8L" && ll.width == 800 && ll.height == 600)
    // VP8X canvas dims; EXIF present but NOT in the content identity
    val vp8x = new Array[Byte](10)
    vp8x(4) = 99.toByte // width-1 = 99
    vp8x(7) = 49.toByte // height-1 = 49
    val exif1 = riff("VP8X" -> vp8x, "VP8 " -> vp8Chunk(100, 50),
      "EXIF" -> "camera one".getBytes)
    val exif2 = riff("VP8X" -> vp8x, "VP8 " -> vp8Chunk(100, 50),
      "EXIF" -> "a wholly different camera".getBytes)
    assert(WebpCodec.parse(exif1).content.toSeq ==
      WebpCodec.parse(exif2).content.toSeq,
      "EXIF must not change the content identity")
    assert(WebpCodec.parse(exif1).width == 100)
    // refusals: bad RIFF size, truncation, bad start code, hostile dims
    val badSize = lossy.clone(); badSize(4) = (badSize(4) + 9).toByte
    assert(intercept[IllegalArgumentException](WebpCodec.parse(badSize))
      .getMessage.contains("tile"))
    intercept[IllegalArgumentException](
      WebpCodec.parse(java.util.Arrays.copyOf(lossy, lossy.length - 4)))
    val badSync = lossy.clone(); badSync(12 + 8 + 4) = 0x77
    assert(intercept[IllegalArgumentException](WebpCodec.parse(badSync))
      .getMessage.contains("start code"))
    val huge = riff("VP8 " -> vp8Chunk(0x3fff, 0x3fff))
    assert(intercept[IllegalArgumentException](WebpCodec.parse(huge))
      .getMessage.contains("2^26"))
  }

  // ---- Ogg ------------------------------------------------------------

  test("Ogg: page walk with REAL CRC-32 validation; the content " +
       "identity is pagination-invariant") {
    val packet = ("vorbis-ish payload bytes " * 40).getBytes("UTF-8")
    // same elementary stream, two paginations
    val onePage = OggCodec.buildPage(packet, 2, 0L, 77L, 0L) ++
      OggCodec.buildPage(Array.emptyByteArray, 4, 1000L, 77L, 1L)
    val (a, b) = packet.splitAt(300)
    val twoPages = OggCodec.buildPage(a, 2, 0L, 77L, 0L) ++
      OggCodec.buildPage(b, 0, 500L, 77L, 1L) ++
      OggCodec.buildPage(Array.emptyByteArray, 4, 1000L, 77L, 2L)
    assert(OggCodec.contentStream(onePage).toSeq ==
      OggCodec.contentStream(twoPages).toSeq,
      "re-pagination must not change the content identity")
    val pages = OggCodec.parse(twoPages)
    assert(pages.size == 3 && pages.forall(_.serial == 77L))
    assert(pages.map(_.seq) == Vector(0L, 1L, 2L))
    // CRC is REAL: flip one body byte → the page refuses by name
    val bad = twoPages.clone()
    bad(40) = (bad(40) ^ 1).toByte
    assert(intercept[IllegalArgumentException](OggCodec.parse(bad))
      .getMessage.contains("CRC-32"))
    // sequence gaps refuse (a dropped page is a corrupt stream)
    val gap = OggCodec.buildPage(a, 2, 0L, 77L, 0L) ++
      OggCodec.buildPage(b, 0, 500L, 77L, 2L)
    assert(intercept[IllegalArgumentException](OggCodec.parse(gap))
      .getMessage.contains("sequence"))
    // must begin with a beginning-of-stream page
    val noBos = OggCodec.buildPage(a, 0, 0L, 77L, 0L)
    assert(intercept[IllegalArgumentException](OggCodec.parse(noBos))
      .getMessage.contains("beginning-of-stream"))
    // truncation mid-page
    intercept[IllegalArgumentException](
      OggCodec.parse(java.util.Arrays.copyOf(twoPages, 50)))
  }

  test("Ogg encode: multi-page pagination with BOS/EOS flags, two " +
       "paginations share the content identity, sizes closed-form") {
    for (n <- Seq(0, 1, 99, 100, 101, 255, 510, 577, 4096, 9000)) {
      val data = Array.tabulate[Byte](n)(i => ((i * 37 + 11) % 251).toByte)
      val a = OggCodec.encode(data, 4096, serial = 7L)
      val b = OggCodec.encode(data, 100, serial = 98765L)
      assert(OggCodec.contentStream(a).toSeq == data.toSeq, s"n=$n")
      assert(OggCodec.contentStream(b).toSeq == data.toSeq)
      val p1 = math.max(1, (n + 4095) / 4096)
      val p2 = math.max(1, (n + 99) / 100)
      assert(a.length == n + 27 * p1 + 17 * (p1 - 1)
        + (n - 4096 * (p1 - 1)) / 255 + 1, s"n=$n")
      assert(b.length == n + 28 * p2, s"n=$n")
      val pages = OggCodec.parse(b)
      assert(pages.size == p2)
      assert((pages.head.headerType & 2) != 0 &&
        (pages.last.headerType & 4) != 0, "BOS and EOS flags")
    }
  }

  test("WebP encodeLossless: dims and content round-trip, EXIF/XMP " +
       "never enter the identity, sizes closed-form") {
    for (n <- Seq(0, 1, 32, 577)) {
      val data = Array.tabulate[Byte](n)(i => (i * 3 + 1).toByte)
      val w = 1 + n % 64
      val h = math.max(1, (n + w - 1) / w)
      val bare = WebpCodec.encodeLossless(w, h, data)
      val tagged = WebpCodec.encodeLossless(w, h, data,
        Seq("EXIF" -> Array.fill[Byte](24)(3),
          "XMP " -> Array.fill[Byte](31)(5)))
      assert(bare.length == 25 + n + (if (n % 2 == 0) 1 else 0), s"n=$n")
      assert(tagged.length == bare.length + 72)
      val bi = WebpCodec.parse(bare)
      val ti = WebpCodec.parse(tagged)
      assert(bi.variant == "VP8L" && bi.width == w && bi.height == h)
      assert(bi.content.length == 5 + n)
      assert(bi.content.toSeq == ti.content.toSeq,
        "metadata chunks must not change the content identity")
    }
  }

  test("VP8X image data (ALPH/ANIM/ANMF) IS the content identity; " +
       "a VP8X carrying only metadata refuses") {
    val vp8x = new Array[Byte](10)
    vp8x(4) = 99.toByte; vp8x(7) = 49.toByte
    val anim = Array[Byte](1, 2, 3, 4, 5, 6)
    val anmf1 = "frame-one-pixels".getBytes
    val anmf2 = "frame-two-pixels".getBytes
    val a = riff("VP8X" -> vp8x, "ANIM" -> anim, "ANMF" -> anmf1,
      "ANMF" -> anmf2, "EXIF" -> "cam1".getBytes)
    val b = riff("VP8X" -> vp8x, "ANIM" -> anim, "ANMF" -> anmf1,
      "ANMF" -> anmf2, "EXIF" -> "another camera".getBytes)
    val c = riff("VP8X" -> vp8x, "ANIM" -> anim,
      "ANMF" -> "DIFFERENT pixels".getBytes, "ANMF" -> anmf2,
      "EXIF" -> "cam1".getBytes)
    assert(WebpCodec.parse(a).content.toSeq ==
      (anim ++ anmf1 ++ anmf2).toSeq)
    assert(WebpCodec.parse(a).content.toSeq ==
      WebpCodec.parse(b).content.toSeq)
    assert(WebpCodec.parse(a).content.toSeq !=
      WebpCodec.parse(c).content.toSeq,
      "different animation frames must NOT share one dedup identity")
    assert(WebpCodec.parse(a).width == 100 && WebpCodec.parse(a).height == 50,
      "VP8X canvas dims")
    assert(intercept[IllegalArgumentException](
      WebpCodec.parse(riff("VP8X" -> vp8x, "EXIF" -> "cam".getBytes)))
      .getMessage.contains("image data"))
    // animation chunks outside a VP8X container are malformed
    assert(intercept[IllegalArgumentException](
      WebpCodec.parse(riff("ANMF" -> anmf1, "VP8 " -> vp8Chunk(9, 9))))
      .getMessage.contains("VP8X"))
  }

  // ---- MP4 ------------------------------------------------------------

  private def mvhd(timescale: Int, duration: Int): Array[Byte] = {
    val body = new Array[Byte](100) // version 0 mvhd body
    body(4 + 8) = (timescale >> 24).toByte
    body(4 + 9) = (timescale >> 16).toByte
    body(4 + 10) = (timescale >> 8).toByte
    body(4 + 11) = timescale.toByte
    body(4 + 12) = (duration >> 24).toByte
    body(4 + 13) = (duration >> 16).toByte
    body(4 + 14) = (duration >> 8).toByte
    body(4 + 15) = duration.toByte
    Mp4Codec.box("mvhd", body)
  }

  test("MP4: box walk tiles exactly, mvhd duration, mdat content " +
       "identity is metadata-invariant") {
    val ftyp = Mp4Codec.box("ftyp",
      "M4A ".getBytes ++ new Array[Byte](8))
    val media = "aac-ish elementary bytes, opaque".getBytes("UTF-8")
    val mdat = Mp4Codec.box("mdat", media)
    val moov1 = Mp4Codec.box("moov", mvhd(44100, 441000) ++
      Mp4Codec.box("udta", "title: crawl one".getBytes))
    val moov2 = Mp4Codec.box("moov", mvhd(44100, 441000) ++
      Mp4Codec.box("udta", "a completely different set of tags".getBytes))
    val f1 = ftyp ++ moov1 ++ mdat
    val f2 = ftyp ++ mdat ++ moov2 // mdat placement also varies
    val i1 = Mp4Codec.parse(f1)
    val i2 = Mp4Codec.parse(f2)
    assert(i1.brand == "M4A " && i1.durationMs == 10000L)
    assert(i1.content.toSeq == media.toSeq)
    assert(i1.content.toSeq == i2.content.toSeq,
      "metadata atoms must not change the content identity")
    // a fragmented layout (the same media split across TWO mdat boxes)
    // shares the identity — the media is ALL mdats in file order
    val (ma, mb) = media.splitAt(11)
    val frag = ftyp ++ moov1 ++ Mp4Codec.box("mdat", ma) ++
      Mp4Codec.box("free", "seg-gap".getBytes) ++ Mp4Codec.box("mdat", mb)
    assert(Mp4Codec.parse(frag).content.toSeq == media.toSeq,
      "mdat fragmentation must not change the content identity")
    // refusals: no leading ftyp, box overrun, missing mvhd, truncation
    assert(intercept[IllegalArgumentException](
      Mp4Codec.parse(mdat ++ ftyp ++ moov1))
      .getMessage.contains("ftyp"))
    val overrun = f1.clone() // inflate the trailing mdat's declared size
    overrun(ftyp.length + moov1.length + 3) =
      (overrun(ftyp.length + moov1.length + 3) + 40).toByte
    assert(intercept[IllegalArgumentException](Mp4Codec.parse(overrun))
      .getMessage.contains("past the payload end"))
    assert(intercept[IllegalArgumentException](
      Mp4Codec.parse(ftyp ++ mdat))
      .getMessage.contains("mvhd"))
    intercept[IllegalArgumentException](
      Mp4Codec.parse(java.util.Arrays.copyOf(f1, f1.length - 3)))
  }

  test("MP4 encode: bare and tagged assemblies share the mdat identity; " +
       "sizes closed-form; a short mvhd refuses instead of reading its " +
       "sibling's bytes") {
    for (n <- Seq(0, 1, 17, 577)) {
      val data = Array.tabulate[Byte](n)(i => (i * 5 + 2).toByte)
      val bare = Mp4Codec.encode(data, n.toLong, tagged = false)
      val tagged = Mp4Codec.encode(data, n.toLong, tagged = true)
      assert(bare.length == 60 + n && tagged.length == 124 + n, s"n=$n")
      val bi = Mp4Codec.parse(bare)
      val ti = Mp4Codec.parse(tagged)
      assert(bi.brand == "isom")
      assert(bi.durationMs == n.toLong && ti.durationMs == n.toLong)
      assert(bi.content.toSeq == data.toSeq)
      assert(bi.content.toSeq == ti.content.toSeq,
        "free/udta atoms and box order must not change the identity")
    }
    // short mvhd: cs=12 passes the tiling check but cannot hold the v0
    // timescale/duration fields — must refuse by name, never read the
    // following sibling box's bytes as the duration
    val ftyp = Mp4Codec.box("ftyp", "isomgrft".getBytes)
    val f = ftyp ++ Mp4Codec.box("moov",
      Mp4Codec.box("mvhd", new Array[Byte](4)) ++
        Mp4Codec.box("udta", new Array[Byte](24))) ++
      Mp4Codec.box("mdat", "x".getBytes)
    assert(intercept[IllegalArgumentException](Mp4Codec.parse(f))
      .getMessage.contains("truncated mvhd"))
    // an empty-body mvhd (cs=8) refuses before reading the version byte
    val f0 = ftyp ++ Mp4Codec.box("moov",
      Mp4Codec.box("mvhd", Array.emptyByteArray) ++
        Mp4Codec.box("udta", new Array[Byte](24))) ++
      Mp4Codec.box("mdat", "x".getBytes)
    assert(intercept[IllegalArgumentException](Mp4Codec.parse(f0))
      .getMessage.contains("truncated mvhd"))
    // a v1 mvhd with only v0-sized fields also refuses
    val v1body = new Array[Byte](20); v1body(0) = 1
    val f1 = ftyp ++ Mp4Codec.box("moov", Mp4Codec.box("mvhd", v1body)) ++
      Mp4Codec.box("mdat", "x".getBytes)
    assert(intercept[IllegalArgumentException](Mp4Codec.parse(f1))
      .getMessage.contains("version 1"))
  }

  // ---- ICO ------------------------------------------------------------

  test("ICO: directory walk with PNG-IHDR/DIB-header entry validation, " +
       "blob-derived dims, hotspot/planes-invariant identity; refusals " +
       "by name") {
    def dib(w: Int, h: Int): Array[Byte] = { // 40-byte BIH + pixel stub
      val b = new Array[Byte](48)
      b(0) = 40
      var i = 0
      while (i < 4) {
        b(4 + i) = (w >> (8 * i)).toByte
        b(8 + i) = ((2 * h) >> (8 * i)).toByte // XOR+AND doubled height
        i += 1
      }
      b
    }
    val png = Multimodal.PngCodec.encode(3, 2,
      Array.tabulate[Byte](6)(i => (i + 1).toByte))
    val big = dib(32, 32)
    val icon = IcoCodec.build(Seq((3, 2, png), (32, 32, big)))
    val cursor = IcoCodec.build(Seq((3, 2, png), (32, 32, big)),
      cursor = true, hotspot = 7)
    val i1 = IcoCodec.parse(icon)
    val ic = IcoCodec.parse(cursor)
    assert(!i1.cursor && ic.cursor && i1.count == 2)
    assert(i1.width == 32 && i1.height == 32,
      "largest entry wins, dims from the blob headers")
    assert(i1.content.toSeq == (png ++ big).toSeq)
    assert(i1.content.toSeq == ic.content.toSeq,
      "hotspot/planes directory fields must not change the identity")
    // dims above the 1-byte directory fields' range come from the blob
    // (the directory byte writes the format's famous 0-means-256 form)
    val huge = IcoCodec.parse(IcoCodec.build(Seq((300, 300, dib(300, 300)))))
    assert(huge.width == 300 && huge.height == 300)
    // refusals: nonzero reserved, bad type, entry overrun, alien blob,
    // a DIB whose height is not the doubled mask value
    val r1 = icon.clone(); r1(0) = 1
    assert(intercept[IllegalArgumentException](IcoCodec.parse(r1))
      .getMessage.contains("reserved"))
    val r2 = icon.clone(); r2(2) = 9
    assert(intercept[IllegalArgumentException](IcoCodec.parse(r2))
      .getMessage.contains("resource type"))
    val r3 = icon.clone(); r3(6 + 8) = (r3(6 + 8) + 64).toByte // entry 0 size
    assert(intercept[IllegalArgumentException](IcoCodec.parse(r3))
      .getMessage.contains("outside"))
    assert(intercept[IllegalArgumentException](IcoCodec.parse(
      IcoCodec.build(Seq((8, 8, "not an image, full stop".getBytes)))))
      .getMessage.contains("neither"))
    val odd = dib(8, 8); odd(8) = 15 // odd height
    assert(intercept[IllegalArgumentException](IcoCodec.parse(
      IcoCodec.build(Seq((8, 8, odd)))))
      .getMessage.contains("doubled"))
    intercept[IllegalArgumentException](
      IcoCodec.parse(java.util.Arrays.copyOf(icon, 10)))
    // hostile amplification: 200 entries all claiming the same blob
    // would inflate a small payload into a 200x content buffer —
    // refused, never allocated
    val blob = dib(8, 8)
    val hdrLen = 6 + 16 * 200
    val hostile = new Array[Byte](hdrLen + blob.length)
    hostile(2) = 1; hostile(4) = 200.toByte
    for (e <- 0 until 200) {
      val b = 6 + 16 * e
      var i = 0
      while (i < 4) {
        hostile(b + 8 + i) = (blob.length >> (8 * i)).toByte
        hostile(b + 12 + i) = (hdrLen >> (8 * i)).toByte
        i += 1
      }
    }
    blob.copyToArray(hostile, hdrLen)
    assert(intercept[IllegalArgumentException](IcoCodec.parse(hostile))
      .getMessage.contains("amplification bound"))
  }

  // ---- TIFF -----------------------------------------------------------

  test("TIFF: both byte orders walk, dims from the primary IFD, the " +
       "strip identity is metadata-tag- and striping-invariant; " +
       "refusals by name") {
    val px = Array.tabulate[Byte](24)(i => (i * 7 + 3).toByte) // 6x4 gray
    for (big <- Seq(false, true)) {
      val t1 = TiffCodec.build(big, 6, 4, Seq(px))
      val info = TiffCodec.parse(t1)
      assert(info.bigEndian == big && info.width == 6 &&
        info.height == 4 && info.nIfds == 1, s"big=$big")
      assert(info.content.toSeq == px.toSeq)
      // re-striped + tagged exports share the identity
      val strips = Seq(px.slice(0, 10), px.slice(10, 24))
      val t2 = TiffCodec.build(big, 6, 4, strips, software = "scanner nine")
      val t3 = TiffCodec.build(big, 6, 4, strips,
        software = "a wholly different export tool")
      assert(TiffCodec.parse(t2).content.toSeq == px.toSeq,
        "re-striping must not change the content identity")
      assert(TiffCodec.parse(t2).content.toSeq ==
        TiffCodec.parse(t3).content.toSeq,
        "Software/DateTime tags must not change the content identity")
      assert(TiffCodec.parse(t2).nIfds == 1)
    }
    // refusals (little-endian container; single strip → IFD at 8 with
    // 7 entries, StripByteCounts value at 90, next-IFD pointer at 94)
    val t = TiffCodec.build(big = false, 6, 4, Seq(px))
    val m1 = t.clone(); m1(2) = 43
    assert(intercept[IllegalArgumentException](TiffCodec.parse(m1))
      .getMessage.contains("magic"))
    val m2 = t.clone(); m2(91) = 1 // strip count 24 -> 280
    assert(intercept[IllegalArgumentException](TiffCodec.parse(m2))
      .getMessage.contains("outside"))
    val m3 = t.clone(); m3(94) = 8 // next IFD -> itself
    assert(intercept[IllegalArgumentException](TiffCodec.parse(m3))
      .getMessage.contains("cycle"))
    // hostile amplification: overlapping strips whose byte counts sum
    // past the payload are refused before any buffer grows. Two-strip
    // LE layout (no software): IFD ends at 98, offset array at 98,
    // count array at 106, data at 114 (100 bytes per strip, 314 total)
    val px2 = Array.tabulate[Byte](100)(i => (i + 1).toByte)
    val t2s = TiffCodec.build(big = false, 10, 10, Seq(px2, px2))
    assert(t2s.length == 314)
    val bomb = t2s.clone()
    bomb(106) = 160.toByte // counts[0] 100 -> 160
    bomb(110) = 160.toByte // counts[1] 100 -> 160
    var i = 0
    while (i < 4) { bomb(102 + i) = 0; i += 1 } // offsets[1] -> 0
    assert(intercept[IllegalArgumentException](TiffCodec.parse(bomb))
      .getMessage.contains("amplification bound"))
    intercept[IllegalArgumentException](
      TiffCodec.parse(java.util.Arrays.copyOf(t, 40)))
    assert(intercept[IllegalArgumentException](
      TiffCodec.parse("II not tiff at all".getBytes))
      .getMessage.contains("magic"))
  }

  test("the quarantine admits valid walks and tags corrupt ones " +
       "(no Spark needed: decode dispatch is exercised in MultimodalSpec)") {
    // sanity: all three content identities are non-empty for real data
    assert(WebpCodec.parse(riff("VP8 " -> vp8Chunk(9, 9))).content.nonEmpty)
    assert(OggCodec.contentStream(
      OggCodec.buildPage("x".getBytes, 2, 0, 1, 0)).nonEmpty)
    assert(Mp4Codec.parse(Mp4Codec.box("ftyp",
      "isom".getBytes ++ new Array[Byte](8)) ++
      Mp4Codec.box("moov", mvhd(1000, 5000)) ++
      Mp4Codec.box("mdat", "av".getBytes)).content.nonEmpty)
  }
}
