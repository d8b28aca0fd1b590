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
