package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class Mp3CodecSpec extends AnyFunSuite {

  private def frame(version: Int = 1, layer: Int = 3, brIdx: Int = 9,
                    srIdx: Int = 0, padding: Int = 0, mono: Boolean = false,
                    withCrc: Boolean = false,
                    seed: Int = 7): Array[Byte] =
    Mp3Codec.buildFrame(version, layer, brIdx, srIdx, padding, mono,
      withCrc, i => ((i * 31 + seed) % 256).toByte)

  test("frame walk by construction: every version x layer, lengths, " +
       "samples, padding, metadata arithmetic") {
    for (v <- Seq(1, 2, 25); l <- Seq(1, 2, 3); brIdx <- Seq(1, 9, 14);
         srIdx <- Seq(0, 1, 2); pad <- Seq(0, 1)) {
      val f1 = frame(v, l, brIdx, srIdx, pad, mono = false, seed = 3)
      val f2 = frame(v, l, brIdx, srIdx, pad, mono = false, seed = 11)
      val info = Mp3Codec.parse(f1 ++ f2)
      assert(info.version == v && info.layer == l && info.channels == 2,
        s"v$v l$l")
      assert(info.frames.size == 2)
      assert(info.frames(0).offset == 0 && info.frames(0).length == f1.length)
      assert(info.frames(1).offset == f1.length &&
        info.frames(1).length == f2.length)
      val spf = if (l == 1) 384 else if (l == 2) 1152
        else if (v == 1) 1152 else 576
      assert(info.totalSamples == 2L * spf, s"v$v l$l")
      assert(info.durationMs == 2L * spf * 1000 / info.sampleRate)
      // a CBR stream's mean bitrate reproduces the header's (within
      // integer frame-length truncation)
      val expected = f1.length * 8.0 * info.sampleRate / spf / 1000
      assert(math.abs(info.bitrateKbps - expected) < 0.01)
    }
  }

  test("ID3v2 and ID3v1 strip: the frame stream is the TAG-INVARIANT " +
       "dedup identity") {
    val audio = frame(seed = 5) ++ frame(seed = 6) ++ frame(seed = 9)
    // ID3v2 with a syncsafe size and some body
    def id3v2(body: Array[Byte]): Array[Byte] = {
      val h = new Array[Byte](10)
      h(0) = 'I'; h(1) = 'D'; h(2) = '3'; h(3) = 4
      h(6) = ((body.length >> 21) & 0x7f).toByte
      h(7) = ((body.length >> 14) & 0x7f).toByte
      h(8) = ((body.length >> 7) & 0x7f).toByte
      h(9) = (body.length & 0x7f).toByte
      h ++ body
    }
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    "crawl two title".getBytes("UTF-8").copyToArray(v1, 3)
    val tagged1 = id3v2("TIT2 first crawl".getBytes("UTF-8")) ++ audio
    val tagged2 = id3v2("TIT2 a different, longer tag body entirely"
      .getBytes("UTF-8")) ++ audio ++ v1
    assert(Mp3Codec.frameStream(tagged1).toSeq == audio.toSeq)
    assert(Mp3Codec.frameStream(tagged2).toSeq == audio.toSeq)
    assert(Mp3Codec.frameStream(tagged1).toSeq ==
      Mp3Codec.frameStream(tagged2).toSeq,
      "re-tagged crawls must share one dedup identity")
    val info = Mp3Codec.parse(tagged2)
    assert(info.id3v2Bytes > 0 && info.id3v1 && info.frames.size == 3)
  }

  test("encodeFrames: closed-form size, verbatim body round-trip, and " +
       "tag invariance under the builders' own ID3 tags") {
    for (n <- Seq(0, 1, 412, 413, 414, 577, 5000)) {
      val data = Array.tabulate[Byte](n)(i => ((i * 131 + 7) % 256).toByte)
      val bare = Mp3Codec.encodeFrames(data)
      val fr = math.max(1, (n + 412) / 413)
      assert(bare.length == 417 * fr, s"n=$n")
      val info = Mp3Codec.parse(bare)
      assert(info.frames.size == fr && !info.id3v1 && info.id3v2Bytes == 0)
      assert(info.version == 1 && info.layer == 3 &&
        info.sampleRate == 44100 && info.channels == 2)
      // frame bodies carry the data verbatim, zero-padded
      val body = info.frames.toArray.flatMap(f =>
        bare.slice(f.offset + 4, f.offset + f.length))
      assert(body.take(n).toSeq == data.toSeq, s"n=$n")
      assert(body.drop(n).forall(_ == 0))
      val tagged = Mp3Codec.id3v2Tag(new Array[Byte](54)) ++ bare ++
        Mp3Codec.id3v1Tag("graft crawl two")
      assert(tagged.length == bare.length + 192)
      assert(Mp3Codec.frameStream(tagged).toSeq == bare.toSeq,
        "re-tagging must not change the dedup identity")
    }
  }

  test("ID3v1 detection is frame-boundary exact: 'TAG' spelled by frame " +
       "body bytes 128 bytes before the end is NOT a tag") {
    // two 417-byte frames: stream end-128 = offset 706, inside frame 2's
    // body (frame 2 spans [417, 834)); plant T A G there as DATA
    val n = 2 * 413
    val data = new Array[Byte](n)
    data(698) = 'T'; data(699) = 'A'; data(700) = 'G' // stream offset 706
    val bare = Mp3Codec.encodeFrames(data)
    assert(bare(706) == 'T' && bare(707) == 'A' && bare(708) == 'G')
    val info = Mp3Codec.parse(bare)
    assert(!info.id3v1 && info.frames.size == 2 &&
      info.frameEnd == bare.length,
      "a mid-frame TAG byte pattern must not truncate the frame stream")
    // ...while a REAL tag at the boundary is still detected
    val tagged = bare ++ Mp3Codec.id3v1Tag("real tag")
    val ti = Mp3Codec.parse(tagged)
    assert(ti.id3v1 && ti.frameEnd == bare.length)
  }

  test("Layer III CRC-16 validates; corruption refuses by name") {
    val f = frame(withCrc = true)
    assert(Mp3Codec.parse(f).frames.size == 1)
    // flip a side-info byte (covered by the CRC)
    val bad = f.clone()
    bad(8) = (bad(8) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Mp3Codec.parse(bad))
    assert(e.getMessage.contains("CRC-16"), e.getMessage)
    // mono MPEG-2 coverage (different side-info length) also validates
    val m = frame(version = 2, withCrc = true, mono = true)
    assert(Mp3Codec.parse(m).channels == 1)
  }

  test("randomized stream fuzz: frame counts x shapes walk exactly; " +
       "random truncation refuses") {
    val rnd = new scala.util.Random(181)
    for (i <- 0 until 30) {
      val v = Seq(1, 2, 25)(rnd.nextInt(3))
      val l = 1 + rnd.nextInt(3)
      val brIdx = 1 + rnd.nextInt(14)
      val srIdx = rnd.nextInt(3)
      val mono = rnd.nextBoolean()
      val crc = l == 3 && rnd.nextBoolean()
      val nFrames = 1 + rnd.nextInt(7)
      val frames = (0 until nFrames).map { k =>
        Mp3Codec.buildFrame(v, l, brIdx, srIdx, rnd.nextInt(2), mono, crc,
          j => ((j * 17 + k * 31 + i) % 256).toByte)
      }
      val payload = frames.reduce(_ ++ _)
      val info = Mp3Codec.parse(payload)
      assert(info.frames.size == nFrames, s"iter $i frame count")
      assert(info.frames.map(_.length).sum == payload.length, s"iter $i tiling")
      assert(info.channels == (if (mono) 1 else 2))
      // any NON-boundary prefix refuses (frame lengths are exact; a cut
      // at an exact frame boundary is a legitimately shorter stream)
      val bounds = info.frames.map(f => f.offset + f.length).toSet
      val cut = Iterator.continually(1 + rnd.nextInt(payload.length - 1))
        .find(c => !bounds(c)).get
      intercept[IllegalArgumentException](
        Mp3Codec.parse(java.util.Arrays.copyOf(payload, cut)))
      // the frame stream is the whole payload when untagged
      assert(Mp3Codec.frameStream(payload).length == payload.length)
    }
  }

  test("malformed streams refuse loudly at the right layer") {
    val good = frame() ++ frame()
    // lost sync
    val sync = good.clone(); sync(0) = 0x12
    assert(intercept[IllegalArgumentException](Mp3Codec.parse(sync))
      .getMessage.contains("sync"))
    // forbidden bitrate index 15
    val br15 = frame().clone(); br15(2) = (br15(2) | 0xf0).toByte
    assert(intercept[IllegalArgumentException](Mp3Codec.parse(br15))
      .getMessage.contains("bitrate"))
    // free format refuses by name
    val free = frame().clone(); free(2) = (free(2) & 0x0f).toByte
    assert(intercept[IllegalArgumentException](Mp3Codec.parse(free))
      .getMessage.contains("free-format"))
    // truncation mid-frame
    assert(intercept[IllegalArgumentException](Mp3Codec.parse(
      java.util.Arrays.copyOf(good, good.length - 10)))
      .getMessage.contains("past the stream end"))
    // a stream that changes sample rate mid-way is not one stream
    val mixed = frame(srIdx = 0) ++ frame(srIdx = 1)
    assert(intercept[IllegalArgumentException](Mp3Codec.parse(mixed))
      .getMessage.contains("consistent"))
    // reserved version id (bits 01)
    val rv = frame().clone(); rv(1) = (rv(1) & ~0x18 | 0x08).toByte
    assert(intercept[IllegalArgumentException](Mp3Codec.parse(rv))
      .getMessage.contains("version"))
    // empty after tags
    intercept[IllegalArgumentException](
      Mp3Codec.parse("xx".getBytes("UTF-8")))
  }
}
