package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  test("encoder round-trip: indices, closed-form size, screen descriptor") {
    val data = "gif literal-lzw fixture content, ascii only".getBytes("UTF-8")
    val (w, h) = (11, 4)
    val px = java.util.Arrays.copyOf(data, w * h)
    val gif = GifCodec.encode(w, h, px)
    assert(gif.length == GifCodec.encodedSize(w * h))
    val (dw, dh, idx) = GifCodec.decode(gif)
    assert((dw, dh) == (w, h))
    assert(idx.toSeq == px.toSeq)
    // the identity-gray table maps index v to (v,v,v)
    val (_, _, rgb) = GifCodec.decodeRgb(gif)
    assert(rgb.length == 3 * w * h)
    for (p <- 0 until w * h; c <- 0 until 3)
      assert(rgb(3 * p + c) == px(p), s"rgb mismatch at px $p ch $c")
    val info = GifCodec.decodeFrames(gif)
    assert(info.width == w && info.height == h && info.frames.size == 1)

    // closed form across the CLEAR cadence boundaries (254 literals)
    for (n <- Seq(1, 2, 253, 254, 255, 508, 509, 1000, 4096)) {
      val p2 = Array.tabulate(n)(i => ((i * 7 + 13) % 256).toByte)
      val g2 = GifCodec.encode(n, 1, p2)
      assert(g2.length == GifCodec.encodedSize(n), s"size mismatch at n=$n")
      assert(GifCodec.decode(g2)._3.toSeq == p2.toSeq, s"content at n=$n")
    }
  }

  test("ImageIO reads our containers; we read ImageIO's (real LZW, " +
       "variable code widths)") {
    // direction 1: a foreign reader accepts the deterministic encoder
    val px = Array.tabulate(37 * 9)(i => ((i * 11 + 5) % 256).toByte)
    val ours = GifCodec.encode(37, 9, px)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ours))
    assert(img.getWidth == 37 && img.getHeight == 9)
    for (y <- 0 until 9; x <- 0 until 37) {
      val v = px(y * 37 + x) & 0xff
      assert((img.getRGB(x, y) & 0xffffff) == (v << 16 | v << 8 | v),
        s"ImageIO disagrees at ($x,$y)")
    }
    // direction 2: ImageIO's writer uses REAL LZW compression (growing
    // code widths, dictionary hits) — decode and compare per pixel
    val src = new java.awt.image.BufferedImage(61, 43,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 43; x <- 0 until 61)
      // long runs + structure → the encoder emits dictionary codes
      src.setRGB(x, y, if ((x / 7 + y / 5) % 2 == 0) 0x000000
        else (x * 16 % 256) << 16 | (y * 24 % 256) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "gif", bos)
    val theirs = bos.toByteArray
    val (tw, th, rgb) = GifCodec.decodeRgb(theirs)
    assert((tw, th) == (61, 43))
    for (y <- 0 until 43; x <- 0 until 61) {
      val argb = src.getRGB(x, y) // palette-quantized already
      val p = 3 * (y * 61 + x)
      assert((rgb(p) & 0xff) == ((argb >> 16) & 0xff) &&
        (rgb(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
        (rgb(p + 2) & 0xff) == (argb & 0xff),
        s"pixel mismatch at ($x,$y)")
    }
  }

  test("randomized ImageIO cross-validation over sizes and content") {
    val rnd = new scala.util.Random(181)
    for (_ <- 0 until 12) {
      val w = 1 + rnd.nextInt(80)
      val h = 1 + rnd.nextInt(60)
      val src = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w)
        src.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, "gif", bos)
      val (tw, th, rgb) = GifCodec.decodeRgb(bos.toByteArray)
      assert((tw, th) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val argb = src.getRGB(x, y)
        val p = 3 * (y * w + x)
        assert((rgb(p) & 0xff) == ((argb >> 16) & 0xff) &&
          (rgb(p + 1) & 0xff) == ((argb >> 8) & 0xff) &&
          (rgb(p + 2) & 0xff) == (argb & 0xff),
          s"${w}x$h mismatch at ($x,$y)")
      }
    }
  }

  test("interlaced and multi-frame GIFs decode (hand-built 4-pass " +
       "interlace; animation via frame walk)") {
    // hand-build an interlaced container: encode non-interlaced, then
    // rewrite the descriptor flag and permute rows into stream order
    val (w, h) = (5, 11)
    val px = Array.tabulate(w * h)(i => ((i * 3 + 40) % 256).toByte)
    val rows = (0 until h by 8) ++ (4 until h by 8) ++
      (2 until h by 4) ++ (1 until h by 2)
    val streamPx = rows.flatMap(y =>
      px.slice(y * w, (y + 1) * w)).toArray
    val plain = GifCodec.encode(w, h, streamPx)
    val inter = plain.clone()
    val descPos = GifCodec.HeaderSize + GifCodec.GctSize
    assert((inter(descPos) & 0xff) == 0x2c)
    inter(descPos + 9) = 0x40.toByte // set the interlace flag
    val (iw, ih, idx) = GifCodec.decode(inter)
    assert((iw, ih) == (w, h))
    assert(idx.toSeq == px.toSeq, "de-interlaced rows in display order")
    // ImageIO agrees on the interlaced container
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(inter))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) >> 16 & 0xff) == (px(y * w + x) & 0xff),
        s"ImageIO interlace disagreement at ($x,$y)")

    // multi-frame: splice a second image block before the trailer
    val f2 = Array.tabulate(w * h)(i => ((i * 5 + 9) % 256).toByte)
    val second = GifCodec.encode(w, h, f2)
    val body2 = java.util.Arrays.copyOfRange(second, descPos,
      second.length - 1) // descriptor + data, no trailer
    val anim = plain.dropRight(1) ++ body2 :+ 0x3b.toByte
    val info = GifCodec.decodeFrames(anim)
    assert(info.frames.size == 2)
    assert(info.frames(0).indices.toSeq == streamPx.toSeq)
    assert(info.frames(1).indices.toSeq == f2.toSeq)
    // decode() = the first frame (the still-image content)
    assert(GifCodec.decode(anim)._3.toSeq == streamPx.toSeq)
  }

  test("randomized round-trip fuzz: dims x content x multi-frame splices") {
    val rnd = new scala.util.Random(1818)
    for (i <- 0 until 40) {
      val w = 1 + rnd.nextInt(180)
      val h = 1 + rnd.nextInt(40)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val gif = GifCodec.encode(w, h, px)
      assert(gif.length == GifCodec.encodedSize(w * h), s"iter $i size")
      val (dw, dh, idx) = GifCodec.decode(gif)
      assert((dw, dh) == (w, h) && idx.toSeq == px.toSeq, s"iter $i content")
      // splice a random second frame: the walk must see both exactly
      if (i % 4 == 0) {
        val px2 = Array.fill(w * h)(rnd.nextInt(256).toByte)
        val descPos = GifCodec.HeaderSize + GifCodec.GctSize
        val second = GifCodec.encode(w, h, px2)
        val anim = gif.dropRight(1) ++
          java.util.Arrays.copyOfRange(second, descPos,
            second.length - 1) :+ 0x3b.toByte
        val info = GifCodec.decodeFrames(anim)
        assert(info.frames.size == 2 &&
          info.frames(1).indices.toSeq == px2.toSeq, s"iter $i splice")
      }
      // random truncation refuses, never misdecodes or over-reads
      val cut = 1 + rnd.nextInt(gif.length - 1)
      intercept[IllegalArgumentException](
        GifCodec.decode(java.util.Arrays.copyOf(gif, cut)))
    }
  }

  test("graphic control: transparency and disposal 0/2/3 compose " +
       "pixel-exact onto the logical screen; ImageIO agrees on the " +
       "per-frame transparency") {
    import GifCodec.AnimFrame
    // 4x2 screen, background gray 9; frame 1 paints the full screen
    // with 10..17, frame 2 is a 2x1 patch at (1,1): 20 painted, 30
    // transparent
    val base = Array.tabulate[Byte](8)(i => (10 + i).toByte)
    def grayCanvas(values: Array[Int]): Seq[Byte] =
      values.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toSeq
    val f1 = AnimFrame(0, 0, 4, 2, base)
    val patch = AnimFrame(1, 1, 2, 1, Array[Byte](20, 30), transparent = 30)

    // disposal 0 (leave): canvas 2 keeps frame 1 under the transparent px
    val g0 = GifCodec.encodeAnimated(4, 2, 9, Seq(f1, patch))
    val (w0, h0, c0) = GifCodec.composeFrames(g0)
    assert(w0 == 4 && h0 == 2 && c0.size == 2)
    assert(c0(0).toSeq == grayCanvas(Array(10, 11, 12, 13, 14, 15, 16, 17)))
    assert(c0(1).toSeq == grayCanvas(Array(10, 11, 12, 13, 14, 20, 16, 17)),
      "transparent index must leave the prior canvas through")

    // disposal 2: the patch region restores to BACKGROUND before frame 3
    val g2 = GifCodec.encodeAnimated(4, 2, 9, Seq(f1,
      patch.copy(disposal = 2),
      AnimFrame(0, 0, 1, 1, Array[Byte](50))))
    val c2 = GifCodec.composeFrames(g2)._3
    assert(c2(1).toSeq == grayCanvas(Array(10, 11, 12, 13, 14, 20, 16, 17)))
    assert(c2(2).toSeq == grayCanvas(Array(50, 11, 12, 13, 14, 9, 9, 17)),
      "disposal 2 must clear the frame region to the background color")

    // disposal 3: the canvas restores to its PRE-FRAME state
    val g3 = GifCodec.encodeAnimated(4, 2, 9, Seq(f1,
      patch.copy(disposal = 3),
      AnimFrame(0, 0, 1, 1, Array[Byte](50))))
    val c3 = GifCodec.composeFrames(g3)._3
    assert(c3(2).toSeq == grayCanvas(Array(50, 11, 12, 13, 14, 15, 16, 17)),
      "disposal 3 must restore the previous canvas")

    // the canvas starts at the background color: a first frame smaller
    // than the screen shows bg around it
    val gSmall = GifCodec.encodeAnimated(3, 1, 7,
      Seq(AnimFrame(1, 0, 1, 1, Array[Byte](42))))
    assert(GifCodec.composeFrames(gSmall)._3.head.toSeq ==
      grayCanvas(Array(7, 42, 7)))

    // ImageIO referee for the GCE parse: frame 2's transparent pixel
    // reads back with alpha 0, the painted one opaque at gray 20
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(g0)))
    val fr2 = rdr.read(1)
    assert((fr2.getRGB(0, 0) >>> 24) == 0xff &&
      (fr2.getRGB(0, 0) & 0xff) == 20)
    assert((fr2.getRGB(1, 0) >>> 24) == 0,
      "ImageIO must see the transparent index as alpha 0")
    rdr.dispose()

    // decode metadata surfaces the GCE fields; reserved disposal refuses
    val info = GifCodec.decodeFrames(g0)
    assert(info.frames(1).transparent == 30 &&
      info.frames(1).disposal == 0 && info.frames(0).transparent == -1)
    val bad = g0.clone()
    // GCE packed byte of frame 1's extension: disposal bits → 4
    val gceOff = 13 + 768 + 3
    assert((bad(gceOff - 3) & 0xff) == 0x21 && (bad(gceOff - 2) & 0xff) == 0xf9)
    bad(gceOff) = (4 << 2).toByte
    assert(intercept[IllegalArgumentException](GifCodec.decodeFrames(bad))
      .getMessage.contains("disposal"))
  }

  test("interlaced animated frames decode back to display row order, " +
       "and the render-tier fixture composes to its closed forms") {
    import GifCodec.AnimFrame
    // 10 rows — every interlace pass non-empty (0,8 / 4 / 2,6 / odd)
    val w = 3
    val h = 10
    val disp = Array.tabulate[Byte](w * h)(i => (i + 1).toByte)
    val g = GifCodec.encodeAnimated(w, h, 0,
      Seq(AnimFrame(0, 0, w, h, disp, interlaced = true)))
    val f = GifCodec.decodeFrames(g).frames.head
    assert(f.indices.toSeq == disp.toSeq,
      "encodeAnimated(interlaced) + deinterlace must round-trip rows")
    // and the STREAM bytes genuinely differ from display order (the
    // permutation is real, not a no-op flag)
    val gSeq = GifCodec.encodeAnimated(w, h, 0,
      Seq(AnimFrame(0, 0, w, h, disp)))
    assert(!java.util.Arrays.equals(g, gSeq))

    // the q_media_gif_render fixture on a worked example: text bytes
    // t = [65, 66, 67, 68, 69] ("ABCDE"), n = 5 → the fixture pins
    // w = 1 + n % 64 = 6, h = 1 — the row-overlap edge where frames
    // 1/2/3 all land on the single row
    val t = "ABCDE".getBytes("US-ASCII")
    val full = java.util.Arrays.copyOf(t, 6)
    val row1 = Array.tabulate[Byte](6)(x =>
      (255 - (if (x < 5) t(x) & 0xff else 0)).toByte)
    val row3 = Array.tabulate[Byte](6)(x =>
      if (x < 5) t(x) else 0xff.toByte)
    val v3 = (64 + ('E'.toInt % 128)).toByte // 64 + 69 = 133
    val anim = GifCodec.encodeAnimated(6, 1, 7, Seq(
      AnimFrame(0, 0, 6, 1, full, transparent = 0, interlaced = true),
      AnimFrame(0, 0, 6, 1, row1, disposal = 2),
      AnimFrame(5, 0, 1, 1, Array(v3), disposal = 3),
      AnimFrame(0, 0, 6, 1, row3, transparent = 255)))
    val (sw, sh, cvs) = GifCodec.composeFrames(anim)
    def gray(values: Int*): Seq[Byte] =
      values.flatMap(v => Seq(v.toByte, v.toByte, v.toByte))
    assert(sw == 6 && sh == 1 && cvs.size == 4)
    // frame 0: text + transparent zero pad over background 7
    assert(cvs(0).toSeq == gray(65, 66, 67, 68, 69, 7))
    // frame 1: the complement row, opaque pad 255
    assert(cvs(1).toSeq == gray(190, 189, 188, 187, 186, 255))
    // frame 2: disposal 2 restored the row to bg, corner painted 133
    assert(cvs(2).toSeq == gray(7, 7, 7, 7, 7, 133))
    // frame 3: disposal 3 un-painted the corner; text punches through
    // transparent-255 pads over the restored background = frame 0
    assert(cvs(3).toSeq == cvs(0).toSeq)
    // and the oracle's position-weighted checksum on frame 0:
    // sum over pixels of (9p-3)·v
    val chk0 = cvs(0).zipWithIndex.map { case (b, j) =>
      (j + 1).toLong * (b & 0xff) }.sum
    val expect0 = Seq(65, 66, 67, 68, 69, 7).zipWithIndex.map {
      case (v, i) => (9L * (i + 1) - 3) * v }.sum
    assert(chk0 == expect0)

    // out-of-domain dims refuse loudly — never a wrapped u16 header
    assert(intercept[IllegalArgumentException](
      GifCodec.encodeAnimated(1, 0x10000, 0,
        Seq(AnimFrame(0, 0, 1, 1, Array[Byte](1)))))
      .getMessage.contains("u16"))
    assert(intercept[IllegalArgumentException](
      GifCodec.encodeAnimated(4, 4, 0,
        Seq(AnimFrame(3, 0, 2, 1, Array[Byte](1, 2)))))
      .getMessage.contains("outside"))
  }

  test("corruption and hostile headers refuse loudly") {
    val px = Array.tabulate(40)(i => (i * 6 % 256).toByte)
    val gif = GifCodec.encode(8, 5, px)
    // truncation at various depths
    for (cut <- Seq(4, 12, 100, gif.length - 2))
      intercept[IllegalArgumentException](
        GifCodec.decode(java.util.Arrays.copyOf(gif, cut)))
    // not a GIF at all
    intercept[IllegalArgumentException](
      GifCodec.decode("definitely not a gif".getBytes("UTF-8")))
    // a frame overflowing the logical screen
    val bad = gif.clone()
    val descPos = GifCodec.HeaderSize + GifCodec.GctSize
    bad(descPos + 5) = 99.toByte // frame width 99 > screen width 8
    val eo = intercept[IllegalArgumentException](GifCodec.decode(bad))
    assert(eo.getMessage.contains("logical screen"), eo.getMessage)
    // hostile dims: a header declaring 2^26+ pixels refuses before
    // any buffer is sized
    val huge = gif.clone()
    huge(6) = 0xff.toByte; huge(7) = 0xff.toByte   // screen w = 65535
    huge(8) = 0xff.toByte; huge(9) = 0xff.toByte   // screen h = 65535
    huge(descPos + 5) = 0xff.toByte; huge(descPos + 6) = 0xff.toByte
    huge(descPos + 7) = 0xff.toByte; huge(descPos + 8) = 0xff.toByte
    val eh = intercept[IllegalArgumentException](GifCodec.decode(huge))
    assert(eh.getMessage.contains("2^26"), eh.getMessage)
    // an LZW code beyond the table
    val lzw = gif.clone()
    // first data sub-block starts after descriptor + min-code byte +
    // length byte; 9-bit codes LSB-first: first code = CLEAR (256) =
    // bits 0..8; corrupt the second code into 0x1FF (= 511, > table)
    val dataPos = descPos + GifCodec.DescriptorSize + 2
    lzw(dataPos + 1) = 0xff.toByte
    lzw(dataPos + 2) = (lzw(dataPos + 2) | 0x03).toByte
    val el = intercept[IllegalArgumentException](GifCodec.decode(lzw))
    assert(el.getMessage.contains("LZW"), el.getMessage)
    // the encoder's own guards
    intercept[IllegalArgumentException](GifCodec.encode(0, 5, px))
    intercept[IllegalArgumentException](GifCodec.encode(8, 5,
      java.util.Arrays.copyOf(px, 39)))
  }
}
