package graft.etl

/** GIF (87a/89a) codec — real bit-level handling for the highest-
  * frequency crawl image container not yet in the registry. Follows
  * the public GIF89a specification (W3C/CompuServe, LZW per the spec's
  * appendix; patents long expired). Reference behavior analog: opaque
  * payloads with per-request validation, never node death
  * (/root/reference/quasar.go:83-95 scopes failures to the request).
  *
  * DECODER (general): signature (87a or 89a), logical screen
  * descriptor, global color table, extension blocks (skipped —
  * ancillary: graphic control, comments, application), and EVERY image
  * frame — local color tables, the 4-pass row interlace, and a full
  * variable-width LZW decode (3–12-bit codes LSB-first, CLEAR / EOI,
  * deferred-clear tolerant, the KwKwK self-reference case). Every
  * frame's index stream is decoded and validated against its color
  * table; total decoded pixels are bounded at 2^26 before any buffer
  * is sized (a hostile header must not OOM an executor).
  *
  * ENCODER (deterministic, oracle-friendly — the JPEG/FLAC-family
  * discipline): single-frame GIF87a, 256-entry identity-grayscale
  * global color table, non-interlaced, LZW as PURE 9-bit LITERALS with
  * a CLEAR every 254 pixels (the classic "uncompressed GIF" technique:
  * the dictionary never reaches the 10-bit boundary, so every code is
  * exactly 9 bits and the stream is byte-deterministic). Closed-form
  * container size ([[encodedSize]]): codes C = nPx + 2 + ⌊(nPx−1)/254⌋,
  * z = ⌈9C/8⌉ data bytes, total = 794 + z + ⌈z/255⌉ — computable by
  * the DuckDB oracle from the source text alone, like the PNG stored-
  * deflate and FLAC VERBATIM forms. Decoded indices through the
  * identity-gray table ARE the input bytes (the BmpCodec convention:
  * indices are the content for dedup/feature purposes). */
object GifCodec {

  /** One decoded frame: placement on the logical screen, its index
    * bytes (row-major, de-interlaced), the palette-mapped interleaved
    * RGB, plus the frame's graphic-control state — `transparent` is
    * the index a renderer must NOT paint (-1 when opaque), `disposal`
    * what happens to the frame's region afterwards (0/1 leave,
    * 2 restore-to-background, 3 restore-to-previous). */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
                         indices: Array[Byte], rgb: Array[Byte],
                         transparent: Int = -1, disposal: Int = 0)

  /** Logical screen dims + every frame, in stream order; `bgRgb` is
    * the logical screen's background color (the descriptor's index
    * through the global table; black when absent or out of range —
    * encoders routinely write junk there, so it is not a refusal). */
  final case class GifInfo(width: Int, height: Int, frames: Vector[Frame],
                           bgRgb: Array[Byte] = new Array[Byte](3))

  /** "GIF87a" signature (6) + logical screen descriptor (7). */
  val HeaderSize = 13
  /** 256-entry global color table, 3 bytes per entry. */
  val GctSize = 768
  /** Image separator + descriptor. */
  val DescriptorSize = 10
  /** Literals between CLEAR codes — keeps every code at 9 bits (the
    * dictionary stays below 512 entries: 258 + 253 added = 511). */
  val ClearEvery = 254

  /** Closed-form size of [[encode]]'s container for nPx pixels —
    * the arithmetic a verification oracle recomputes from the text. */
  def encodedSize(nPx: Int): Int = {
    require(nPx >= 1, "GIF must carry at least one pixel")
    val codes = nPx + 2 + (nPx - 1) / ClearEvery
    val z = (9 * codes + 7) / 8
    HeaderSize + GctSize + DescriptorSize + 1 + z + (z + 254) / 255 + 2
  }

  /** Encode gray pixels (row-major top-down, length w·h) as a
    * single-frame GIF87a with an identity-grayscale table. Byte-
    * deterministic; size = [[encodedSize]](w·h). */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xffff && height <= 0xffff,
      s"bad GIF dims ${width}x$height")
    val nPx = width * height
    require(pixels.length == nPx,
      s"GIF encoder needs exactly w*h pixels (${pixels.length} != $nPx)")
    val data = lzwLiteralData(pixels)
    val z = data.length
    val out = java.nio.ByteBuffer
      .allocate(encodedSize(nPx))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF87a".getBytes("US-ASCII"))
    out.putShort(width.toShort).putShort(height.toShort)
    // GCT present, 8-bit color resolution, 256 entries
    out.put(0xf7.toByte).put(0.toByte).put(0.toByte)
    var c = 0
    while (c < 256) { // identity grayscale, RGB
      out.put(c.toByte).put(c.toByte).put(c.toByte)
      c += 1
    }
    out.put(0x2c.toByte) // image descriptor: full screen, no LCT
    out.putShort(0).putShort(0)
    out.putShort(width.toShort).putShort(height.toShort)
    out.put(0.toByte)
    out.put(8.toByte) // LZW minimum code size
    var off = 0
    while (off < z) { // data sub-blocks of <= 255 bytes
      val len = math.min(255, z - off)
      out.put(len.toByte).put(data, off, len)
      off += len
    }
    out.put(0.toByte)    // block terminator
    out.put(0x3b.toByte) // trailer
    out.array()
  }

  /** Pure-9-bit-literal LZW image data (initial CLEAR, a CLEAR every
    * [[ClearEvery]] literals, EOI) — byte-deterministic, size
    * ⌈9·(n + 2 + ⌊(n−1)/254⌋)/8⌉. */
  private def lzwLiteralData(pixels: Array[Byte]): Array[Byte] = {
    val nPx = pixels.length
    val codes = nPx + 2 + (nPx - 1) / ClearEvery
    val data = new Array[Byte]((9 * codes + 7) / 8)
    var bit = 0L
    def put(code: Int): Unit = { // 9 bits, LSB-first (GIF bit order)
      var i = 0
      while (i < 9) {
        if ((code & (1 << i)) != 0) {
          val p = bit + i
          data((p >> 3).toInt) = (data((p >> 3).toInt) | (1 << (p & 7).toInt))
            .toByte
        }
        i += 1
      }
      bit += 9
    }
    put(256) // initial CLEAR
    var i = 0
    while (i < nPx) {
      if (i > 0 && i % ClearEvery == 0) put(256)
      put(pixels(i) & 0xff)
      i += 1
    }
    put(257) // EOI
    data
  }

  /** One spec-level animated-frame description for [[encodeAnimated]]:
    * placement, gray pixels (DISPLAY row order — the encoder permutes
    * into stream order when `interlaced`), the transparent index
    * (-1 = opaque) and the disposal method. */
  private[graft] final case class AnimFrame(left: Int, top: Int,
      width: Int, height: Int, pixels: Array[Byte],
      transparent: Int = -1, disposal: Int = 0,
      interlaced: Boolean = false)

  /** Display-order rows → 4-pass interlace stream order (the exact
    * inverse of [[deinterlace]]): stream row s carries display row
    * y_s, y_s enumerated pass-by-pass (0 step 8, 4 step 8, 2 step 4,
    * 1 step 2). */
  private def interlaceRows(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var dst = 0
    var pass = 0
    val starts = Array(0, 4, 2, 1)
    val steps = Array(8, 8, 4, 2)
    while (pass < 4) {
      var y = starts(pass)
      while (y < h) {
        System.arraycopy(px, y * w, out, dst * w, w)
        dst += 1
        y += steps(pass)
      }
      pass += 1
    }
    out
  }

  /** Deterministic MULTI-FRAME GIF89a builder for specs and fixtures:
    * identity-gray global table, one graphic-control extension per
    * frame (disposal + transparency), the same 9-bit-literal LZW as
    * [[encode]]. Exercises the decoder's extension and composition
    * paths with hand-computable expected canvases. */
  private[graft] def encodeAnimated(sw: Int, sh: Int, bgIndex: Int,
                                    frames: Seq[AnimFrame]): Array[Byte] = {
    require(sw >= 1 && sh >= 1 && frames.nonEmpty, "empty animation")
    // the descriptor fields are u16 — out-of-domain dims must refuse,
    // never wrap into a lying header (the JPEG-encoder discipline)
    require(sw <= 0xffff && sh <= 0xffff,
      s"GIF logical screen ${sw}x$sh exceeds the u16 descriptor domain")
    frames.foreach(f => require(
      f.left >= 0 && f.top >= 0 && f.width >= 1 && f.height >= 1 &&
        f.left + f.width <= sw && f.top + f.height <= sh,
      s"GIF frame ${f.width}x${f.height} at (${f.left},${f.top}) " +
        s"outside the ${sw}x$sh logical screen"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(sw & 0xff); out.write(sw >> 8)
    out.write(sh & 0xff); out.write(sh >> 8)
    out.write(0xf7); out.write(bgIndex); out.write(0)
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    frames.foreach { f =>
      require(f.pixels.length == f.width * f.height, "frame pixel count")
      // graphic control extension
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transparent >= 0) 1 else 0))
      out.write(0); out.write(0) // delay
      out.write(math.max(0, f.transparent))
      out.write(0) // terminator
      // image descriptor
      out.write(0x2c)
      out.write(f.left & 0xff); out.write(f.left >> 8)
      out.write(f.top & 0xff); out.write(f.top >> 8)
      out.write(f.width & 0xff); out.write(f.width >> 8)
      out.write(f.height & 0xff); out.write(f.height >> 8)
      out.write(if (f.interlaced) 0x40 else 0) // no local table
      out.write(8) // LZW minimum code size
      val data = lzwLiteralData(
        if (f.interlaced) interlaceRows(f.pixels, f.width, f.height)
        else f.pixels)
      var off = 0
      while (off < data.length) {
        val len = math.min(255, data.length - off)
        out.write(len); out.write(data, off, len)
        off += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Render the animation: one logical-screen RGB canvas (3·sw·sh,
    * interleaved) per frame, composed per the GIF89a semantics —
    * transparent indices leave the canvas through, disposal 0/1 leaves
    * the region, 2 restores it to the background color, 3 restores the
    * canvas as it was before the frame painted. The canvas starts at
    * the background color. Returns (sw, sh, canvases). */
  def composeFrames(payload: Array[Byte]): (Int, Int, Vector[Array[Byte]]) = {
    val info = decodeFrames(payload)
    val sw = info.width
    val sh = info.height
    // decodeFrames bounds only the SUMMED FRAME pixels — a tiny GIF can
    // declare a gigapixel logical screen around a 1x1 frame, and the
    // canvas is allocated at screen size, so it needs its own bound
    // (3·sw·sh also overflows Int without it)
    require(sw.toLong * sh <= (1L << 26),
      s"GIF logical screen ${sw}x$sh exceeds the compose bound " +
        "(2^26 pixels)")
    val canvas = new Array[Byte](3 * sw * sh)
    var p = 0
    while (p < sw * sh) {
      canvas(3 * p) = info.bgRgb(0)
      canvas(3 * p + 1) = info.bgRgb(1)
      canvas(3 * p + 2) = info.bgRgb(2)
      p += 1
    }
    val outs = Vector.newBuilder[Array[Byte]]
    info.frames.foreach { f =>
      val saved = if (f.disposal == 3) canvas.clone() else null
      var y = 0
      while (y < f.height) {
        var x = 0
        while (x < f.width) {
          val s = y * f.width + x
          if ((f.indices(s) & 0xff) != f.transparent) {
            val d = 3 * ((f.top + y) * sw + (f.left + x))
            canvas(d) = f.rgb(3 * s)
            canvas(d + 1) = f.rgb(3 * s + 1)
            canvas(d + 2) = f.rgb(3 * s + 2)
          }
          x += 1
        }
        y += 1
      }
      outs += canvas.clone()
      f.disposal match {
        case 2 => // restore the frame's region to the background color
          var yy = 0
          while (yy < f.height) {
            var xx = 0
            while (xx < f.width) {
              val d = 3 * ((f.top + yy) * sw + (f.left + xx))
              canvas(d) = info.bgRgb(0)
              canvas(d + 1) = info.bgRgb(1)
              canvas(d + 2) = info.bgRgb(2)
              xx += 1
            }
            yy += 1
          }
        case 3 =>
          System.arraycopy(saved, 0, canvas, 0, canvas.length)
        case _ => ()
      }
    }
    (sw, sh, outs.result())
  }

  /** The 4-pass GIF row interlace: stream row i → display row. */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var src = 0
    var pass = 0
    val starts = Array(0, 4, 2, 1)
    val steps = Array(8, 8, 4, 2)
    while (pass < 4) {
      var y = starts(pass)
      while (y < h) {
        System.arraycopy(idx, src * w, out, y * w, w)
        src += 1
        y += steps(pass)
      }
      pass += 1
    }
    out
  }

  /** Variable-width LZW decode of a GIF image data stream (sub-blocks
    * already concatenated) into exactly nPixels index bytes. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        nPixels: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"bad GIF LZW minimum code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val initial = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = clear + 2
    var width = minCodeSize + 1
    var prev = -1
    var bit = 0L
    val totalBits = data.length.toLong * 8
    var done = false
    while (!done) {
      require(bit + width <= totalBits,
        s"truncated GIF LZW stream at pixel $outPos/$nPixels")
      var code = 0
      var i = 0
      while (i < width) { // LSB-first
        val p = bit + i
        if (((data((p >> 3).toInt) >> (p & 7).toInt) & 1) != 0) code |= 1 << i
        i += 1
      }
      bit += width
      if (code == clear) { next = clear + 2; width = minCodeSize + 1; prev = -1 }
      else if (code == eoi) done = true
      else {
        require(outPos < nPixels,
          "GIF LZW stream continues past the declared frame size")
        def initOf(c: Int): Byte = if (c < clear) c.toByte else initial(c)
        var sp = 0
        var c = code
        if (code == next) { // KwKwK: string(prev) + first(string(prev))
          require(prev >= 0, "GIF LZW self-reference before any output")
          stack(sp) = initOf(prev)
          sp += 1
          c = prev
        } else require(code < next && code != eoi,
          s"GIF LZW code $code beyond table size $next")
        while (c >= clear + 2) {
          stack(sp) = suffix(c)
          sp += 1
          c = prefix(c)
        }
        require(c < clear, "corrupt GIF LZW chain")
        val first = c.toByte
        stack(sp) = first
        sp += 1
        require(outPos + sp <= nPixels,
          "GIF LZW expansion overruns the declared frame size")
        while (sp > 0) {
          sp -= 1
          out(outPos) = stack(sp)
          outPos += 1
        }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          initial(next) = initOf(prev)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
        // a conformant stream ends with EOI, but stop accepting data
        // codes once the frame is full (some encoders defer the EOI)
        if (outPos == nPixels) {
          // consume a trailing EOI/CLEAR if present; tolerate its absence
          done = true
        }
      }
    }
    require(outPos == nPixels,
      s"GIF frame decoded $outPos of $nPixels pixels")
    out
  }

  /** Full container walk: every frame decoded and validated. */
  def decodeFrames(payload: Array[Byte]): GifInfo = {
    require(payload.length >= HeaderSize + 1,
      s"not a GIF payload (${payload.length} bytes)")
    val sig = new String(payload, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a",
      s"not a GIF payload (signature '$sig')")
    def u16(p: Int): Int = {
      require(p + 2 <= payload.length, "truncated GIF header field")
      (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
    }
    val sw = u16(6)
    val sh = u16(8)
    val packed = payload(10) & 0xff
    require(sw >= 1 && sh >= 1, s"bad GIF screen dims ${sw}x$sh")
    var pos = HeaderSize
    var gct = Array.emptyByteArray
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      require(pos + 3 * n <= payload.length, "truncated GIF color table")
      gct = java.util.Arrays.copyOfRange(payload, pos, pos + 3 * n)
      pos += 3 * n
    }
    val bgIdx = payload(11) & 0xff
    val bgRgb = if (gct.nonEmpty && bgIdx < gct.length / 3)
      java.util.Arrays.copyOfRange(gct, 3 * bgIdx, 3 * bgIdx + 3)
    else new Array[Byte](3)
    val frames = Vector.newBuilder[Frame]
    var totalPx = 0L
    var done = false
    // graphic-control state applies to the NEXT image (GIF89a §23)
    var pendingTransparent = -1
    var pendingDisposal = 0
    while (!done) {
      require(pos < payload.length, "truncated GIF (missing trailer)")
      (payload(pos) & 0xff) match {
        case 0x3b =>
          done = true
        case 0x21 => // extension: label + sub-blocks
          require(pos + 2 <= payload.length, "truncated GIF extension")
          val label = payload(pos + 1) & 0xff
          if (label == 0xf9) {
            // graphic control: disposal + transparency for the next
            // frame — NOT ancillary: skipping it diverges the decoded
            // RGB from what any renderer composes
            require(pos + 7 <= payload.length,
              "truncated GIF graphic control")
            require((payload(pos + 2) & 0xff) == 4,
              s"GIF graphic-control block size " +
                s"${payload(pos + 2) & 0xff} != 4")
            val gp = payload(pos + 3) & 0xff
            pendingDisposal = (gp >> 2) & 7
            require(pendingDisposal <= 3,
              s"reserved GIF disposal method $pendingDisposal")
            pendingTransparent =
              if ((gp & 1) != 0) payload(pos + 6) & 0xff else -1
          } // comment/application/plain-text extensions stay ancillary
          pos += 2
          var sub = -1
          while (sub != 0) {
            require(pos < payload.length, "truncated GIF extension")
            sub = payload(pos) & 0xff
            require(pos + 1 + sub <= payload.length,
              "truncated GIF extension block")
            pos += 1 + sub
          }
        case 0x2c =>
          require(pos + DescriptorSize <= payload.length,
            "truncated GIF image descriptor")
          val left = u16(pos + 1)
          val top = u16(pos + 3)
          val iw = u16(pos + 5)
          val ih = u16(pos + 7)
          val ip = payload(pos + 9) & 0xff
          pos += DescriptorSize
          var ct = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            require(pos + 3 * n <= payload.length,
              "truncated GIF local color table")
            ct = java.util.Arrays.copyOfRange(payload, pos, pos + 3 * n)
            pos += 3 * n
          }
          require(ct.nonEmpty, "GIF frame without any color table")
          require(iw >= 1 && ih >= 1 && left + iw <= sw && top + ih <= sh,
            s"GIF frame ${iw}x$ih at ($left,$top) outside the " +
              s"${sw}x$sh logical screen")
          totalPx += iw.toLong * ih
          require(totalPx <= (1L << 26),
            s"GIF frames total $totalPx px — exceeds the in-row decode " +
              "bound (2^26 pixels)")
          require(pos < payload.length, "truncated GIF image data")
          val minCode = payload(pos) & 0xff
          pos += 1
          val bos = new java.io.ByteArrayOutputStream()
          var sub = -1
          while (sub != 0) {
            require(pos < payload.length, "truncated GIF image data")
            sub = payload(pos) & 0xff
            require(pos + 1 + sub <= payload.length,
              "truncated GIF data sub-block")
            bos.write(payload, pos + 1, sub)
            pos += 1 + sub
          }
          var idx = lzwDecode(bos.toByteArray, minCode, iw * ih)
          if ((ip & 0x40) != 0) idx = deinterlace(idx, iw, ih)
          val n = ct.length / 3
          val rgb = new Array[Byte](3 * iw * ih)
          var p = 0
          while (p < iw * ih) {
            val v = idx(p) & 0xff
            require(v < n, s"GIF index $v past the $n-entry color table")
            rgb(3 * p) = ct(3 * v)
            rgb(3 * p + 1) = ct(3 * v + 1)
            rgb(3 * p + 2) = ct(3 * v + 2)
            p += 1
          }
          frames += Frame(left, top, iw, ih, idx, rgb,
            pendingTransparent, pendingDisposal)
          pendingTransparent = -1
          pendingDisposal = 0
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at $pos")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF payload with no image frame")
    GifInfo(sw, sh, fs, bgRgb)
  }

  /** First frame's INDEX bytes — the content for dedup/feature
    * purposes (the BmpCodec convention; GIF content is inherently
    * palettized, and for the identity-gray table indices ARE the gray
    * values). Crawl GIFs are predominantly single-frame stills;
    * animations are fully validated by the walk and available via
    * [[decodeFrames]]. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val f = decodeFrames(payload).frames.head
    (f.width, f.height, f.indices)
  }

  /** First frame mapped through its color table to interleaved RGB
    * (the PNG-palette convention), for raster interchange. */
  def decodeRgb(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val f = decodeFrames(payload).frames.head
    (f.width, f.height, f.rgb)
  }
}
