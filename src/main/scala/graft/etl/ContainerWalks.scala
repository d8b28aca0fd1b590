package graft.etl

/** Container-structure codecs for the remaining systematic crawl media
  * formats — WebP (RIFF), Ogg, and MP4/ISO-BMFF — at the same honestly-
  * scoped tier as [[Mp3Codec]]: full container validation, dims/
  * duration metadata, and a METADATA-INVARIANT content identity for
  * dedup, without the inner bitstream decode (VP8/Vorbis/AAC carry no
  * in-container referee here — shipping a from-memory entropy decoder
  * validated only by fixtures built from the same tables would be
  * circular). Each walk is verifiable BY CONSTRUCTION: sizes must tile
  * the payload exactly, every structural field is checked, and Ogg
  * pages carry a real CRC-32 the walk validates (a genuine
  * self-referee, like FLAC's CRCs).
  *
  * Content identities (what two crawls of the same media share even
  * when their metadata differs):
  *  - WebP: the image-data chunk payloads in file order — the codec
  *    chunk, plus ALPH/ANIM/ANMF under VP8X (EXIF/XMP/ICCP excluded)
  *  - Ogg: the concatenated segment payloads (the elementary stream —
  *    re-paginated streams share identity)
  *  - MP4: the concatenated mdat payloads in file order
  *    (moov/metadata-atom- and mdat-fragmentation-invariant)
  *
  * Public layouts per the RIFF/WebP container spec, RFC 3533 (Ogg) and
  * ISO/IEC 14496-12 (BMFF). Reference behavior analog: opaque payloads
  * with per-request validation (/root/reference/quasar.go:83-95). */
object ContainerWalks {

  // ===== WebP ===========================================================

  /** Parsed WebP: variant is "VP8 " (lossy), "VP8L" (lossless) or
    * "VP8X" (extended); dims from the variant's own header bits;
    * `content` is the concatenated image-data chunk payloads (codec
    * chunk, plus ALPH/ANIM/ANMF under VP8X) in file order. */
  final case class WebpInfo(variant: String, width: Int, height: Int,
                            content: Array[Byte])

  object WebpCodec {
    private def le16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    private def le24(b: Array[Byte], p: Int): Int =
      le16(b, p) | ((b(p + 2) & 0xff) << 16)
    private def le32(b: Array[Byte], p: Int): Long =
      le24(b, p).toLong | ((b(p + 3) & 0xffL) << 24)

    /** Walk the RIFF container, validate chunk tiling, extract dims
      * from the codec chunk's public header bits. */
    def parse(payload: Array[Byte]): WebpInfo = {
      require(payload.length >= 20 &&
        new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 4, "US-ASCII") == "WEBP",
        s"not a WebP payload (${payload.length} bytes)")
      val riffLen = le32(payload, 4)
      require(8 + riffLen == payload.length,
        s"RIFF size $riffLen does not tile the ${payload.length}-byte " +
          "payload")
      var pos = 12
      var variant: String = null
      var width = -1
      var height = -1
      // Image-data chunks in file order: for plain files the single
      // codec chunk; for VP8X also ALPH/ANIM/ANMF — an animated WebP's
      // pixels live in ANMF sub-chunks, so excluding them would give
      // every animation one shared (empty) dedup identity
      val content = new java.io.ByteArrayOutputStream()
      while (pos < payload.length) {
        require(pos + 8 <= payload.length, s"truncated WebP chunk at $pos")
        val tag = new String(payload, pos, 4, "US-ASCII")
        val len = le32(payload, pos + 4)
        require(len <= Int.MaxValue && pos + 8 + len <= payload.length,
          s"WebP chunk '$tag' declares $len bytes past the payload end")
        val body = pos + 8
        val n = len.toInt
        tag match {
          case "VP8 " =>
            // 3-byte frame tag, then keyframe start code 9D 01 2A, then
            // 14-bit dims in 16-bit LE fields (top 2 bits = scale)
            require(n >= 10, "truncated VP8 frame header")
            require((payload(body) & 1) == 0, "VP8 chunk is not a keyframe")
            require((payload(body + 3) & 0xff) == 0x9d &&
              (payload(body + 4) & 0xff) == 0x01 &&
              (payload(body + 5) & 0xff) == 0x2a, "bad VP8 start code")
            if (variant != "VP8X") { // VP8X canvas dims take precedence
              width = le16(payload, body + 6) & 0x3fff
              height = le16(payload, body + 8) & 0x3fff
            }
            if (variant == null) variant = tag
            content.write(payload, body, n)
          case "VP8L" =>
            // signature 0x2F, then LSB-first: 14-bit width-1, 14-bit
            // height-1, alpha bit, 3-bit version (must be 0)
            require(n >= 5, "truncated VP8L header")
            require((payload(body) & 0xff) == 0x2f, "bad VP8L signature")
            val bits = le32(payload, body + 1)
            if (variant != "VP8X") {
              width = (bits & 0x3fff).toInt + 1
              height = ((bits >> 14) & 0x3fff).toInt + 1
            }
            require(((bits >> 29) & 7) == 0, "reserved VP8L version")
            if (variant == null) variant = tag
            content.write(payload, body, n)
          case "VP8X" =>
            // extended header: 4 flag bytes then 24-bit LE dims minus 1
            require(n == 10, s"VP8X header must be 10 bytes, got $n")
            width = le24(payload, body + 4) + 1
            height = le24(payload, body + 7) + 1
            variant = tag
          case "ALPH" | "ANIM" | "ANMF" =>
            // image data, not metadata: the alpha plane and animation
            // frames ARE what a renderer composes, so they belong to
            // the content identity (an animated WebP's only pixel data
            // is its ANMF payloads)
            require(variant == "VP8X",
              s"'$tag' chunk outside a VP8X container")
            content.write(payload, body, n)
          case _ => () // EXIF / XMP / ICCP — metadata, excluded from
            // the content identity by design
        }
        pos = body + n + (n & 1) // RIFF pads odd chunks
      }
      require(variant != null, "WebP payload without a codec chunk")
      require(width >= 1 && height >= 1, s"bad WebP dims ${width}x$height")
      require(width.toLong * height <= (1L << 26),
        s"WebP dims ${width}x$height exceed the in-row decode bound " +
          "(2^26 pixels)")
      // no escape for VP8X: an extended container whose only chunks are
      // metadata carries no pixels — admitting it would hand every such
      // file one shared empty dedup identity (false merges)
      require(content.size > 0, "WebP payload without image data")
      WebpInfo(variant, width, height, content.toByteArray)
    }

    /** RIFF assembly with the spec's odd-chunk padding. */
    private def riff(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF????WEBP".getBytes("US-ASCII"))
      chunks.foreach { case (tag, body) =>
        out.write(tag.getBytes("US-ASCII"))
        var i = 0
        while (i < 4) { out.write((body.length >> (8 * i)) & 0xff); i += 1 }
        out.write(body)
        if ((body.length & 1) == 1) out.write(0)
      }
      val bytes = out.toByteArray
      val riffLen = bytes.length - 8
      var i = 0
      while (i < 4) { bytes(4 + i) = (riffLen >> (8 * i)).toByte; i += 1 }
      bytes
    }

    /** Deterministic lossless-variant assembler: a VP8L chunk whose
      * payload is the 5-byte public header (signature + 14-bit dims)
      * followed by `data` VERBATIM, plus optional metadata chunks
      * (EXIF/XMP/ICCP). NOT a VP8L pixel encoder — the bitstream body
      * is opaque to the walk by design; what it provides is a
      * conformant container whose size is CLOSED-FORM
      * (12 + 8 + 5 + n + pad + Σ meta) and whose metadata-invariant
      * content identity (5 + n bytes) the oracle can recompute. */
    def encodeLossless(width: Int, height: Int, data: Array[Byte],
                       meta: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
      require(width >= 1 && width <= 0x4000 &&
        height >= 1 && height <= 0x4000,
        s"VP8L dims ${width}x$height exceed the 14-bit fields")
      require(width.toLong * height <= (1L << 26),
        s"dims ${width}x$height exceed the decode bound (2^26 pixels)")
      val body = new Array[Byte](5 + data.length)
      body(0) = 0x2f
      val bits = (width - 1).toLong | ((height - 1).toLong << 14)
      var i = 0
      while (i < 4) { body(1 + i) = (bits >> (8 * i)).toByte; i += 1 }
      data.copyToArray(body, 5)
      riff(("VP8L" -> body) +: meta)
    }
  }

  // ===== Ogg ============================================================

  /** One validated Ogg page. */
  final case class OggPage(offset: Int, headerType: Int, granule: Long,
                           serial: Long, seq: Long, body: Array[Byte])

  object OggCodec {
    /** Ogg's CRC-32: polynomial 0x04C11DB7, init 0, no reflection, no
      * final xor — computed over the page with its CRC field zeroed
      * (RFC 3533 §6). A REAL self-referee: the walk validates every
      * page, and the specs corrupt bytes to prove detection. */
    private[etl] def crc32(bytes: Array[Byte], from: Int, until: Int,
                           zeroFrom: Int, zeroUntil: Int): Long = {
      var crc = 0L
      var i = from
      while (i < until) {
        val b = if (i >= zeroFrom && i < zeroUntil) 0 else bytes(i) & 0xff
        crc ^= b.toLong << 24
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04c11db7L)
            else crc << 1
          crc &= 0xffffffffL
          k += 1
        }
        i += 1
      }
      crc
    }

    /** Walk every page: capture pattern, version, CRC-32, segment
      * tiling, sequence monotonicity per stream. Returns the pages;
      * the concatenated bodies are the content identity. */
    def parse(payload: Array[Byte]): Vector[OggPage] = {
      require(payload.length >= 27, s"not an Ogg payload " +
        s"(${payload.length} bytes)")
      def le32(p: Int): Long =
        (payload(p) & 0xffL) | ((payload(p + 1) & 0xffL) << 8) |
          ((payload(p + 2) & 0xffL) << 16) | ((payload(p + 3) & 0xffL) << 24)
      def le64(p: Int): Long = le32(p) | (le32(p + 4) << 32)
      val pages = Vector.newBuilder[OggPage]
      val lastSeq = scala.collection.mutable.Map.empty[Long, Long]
      var pos = 0
      while (pos < payload.length) {
        require(pos + 27 <= payload.length, s"truncated Ogg page at $pos")
        require(payload(pos) == 'O' && payload(pos + 1) == 'g' &&
          payload(pos + 2) == 'g' && payload(pos + 3) == 'S',
          s"lost Ogg capture pattern at $pos")
        require(payload(pos + 4) == 0, "unsupported Ogg version")
        val headerType = payload(pos + 5) & 0xff
        val granule = le64(pos + 6)
        val serial = le32(pos + 14)
        val seq = le32(pos + 18)
        val declaredCrc = le32(pos + 22)
        val nSegs = payload(pos + 26) & 0xff
        require(pos + 27 + nSegs <= payload.length,
          s"truncated Ogg segment table at $pos")
        var bodyLen = 0
        var i = 0
        while (i < nSegs) {
          bodyLen += payload(pos + 27 + i) & 0xff
          i += 1
        }
        val pageLen = 27 + nSegs + bodyLen
        require(pos + pageLen <= payload.length,
          s"Ogg page at $pos declares $pageLen bytes past the payload end")
        val actual = crc32(payload, pos, pos + pageLen, pos + 22, pos + 26)
        require(actual == declaredCrc,
          s"Ogg page CRC-32 mismatch at $pos")
        lastSeq.get(serial).foreach(prev => require(seq == prev + 1,
          s"Ogg page sequence jump for stream $serial: $prev -> $seq"))
        lastSeq(serial) = seq
        pages += OggPage(pos, headerType,
          granule, serial, seq, java.util.Arrays.copyOfRange(
            payload, pos + 27 + nSegs, pos + pageLen))
        pos += pageLen
      }
      val ps = pages.result()
      require(ps.nonEmpty, "Ogg payload with no page")
      require((ps.head.headerType & 2) != 0,
        "Ogg stream does not begin with a beginning-of-stream page")
      ps
    }

    /** The concatenated segment payloads — the elementary stream, the
      * pagination-invariant content identity. */
    def contentStream(payload: Array[Byte]): Array[Byte] = {
      val pages = parse(payload)
      val out = new java.io.ByteArrayOutputStream()
      pages.foreach(p => out.write(p.body))
      out.toByteArray
    }

    /** Deterministic PAGINATOR: splits `data` into pages of `pageBody`
      * bytes (last page short, possibly empty), BOS flag on the first,
      * EOS on the last, sequential page numbers, real CRC-32 on every
      * page. Content identity ([[contentStream]]) = `data` verbatim,
      * whatever the pagination/serial/granule — which is exactly what
      * the tag-invariance oracle gates. Closed-form size:
      * n + Σ_pages (27 + ⌊body/255⌋ + 1). */
    def encode(data: Array[Byte], pageBody: Int, serial: Long): Array[Byte] = {
      require(pageBody >= 1 && pageBody <= 255 * 254,
        s"page body must be 1..${255 * 254}, got $pageBody")
      val nPages = math.max(1, (data.length + pageBody - 1) / pageBody)
      val out = new java.io.ByteArrayOutputStream()
      var p = 0
      while (p < nPages) {
        val from = p * pageBody
        val until = math.min(data.length, from + pageBody)
        val ht = (if (p == 0) 2 else 0) | (if (p == nPages - 1) 4 else 0)
        out.write(buildPage(
          java.util.Arrays.copyOfRange(data, from, until),
          ht, granule = until.toLong, serial, seq = p.toLong))
        p += 1
      }
      out.toByteArray
    }

    /** Deterministic page builder for specs and fixtures: wraps `body`
      * as one page with a real CRC. */
    private[etl] def buildPage(body: Array[Byte], headerType: Int,
                               granule: Long, serial: Long,
                               seq: Long): Array[Byte] = {
      require(body.length <= 255 * 255, "spec builder: one-page bodies only")
      val nSegs = body.length / 255 + 1
      val page = new Array[Byte](27 + nSegs + body.length)
      "OggS".getBytes("US-ASCII").copyToArray(page, 0)
      page(5) = headerType.toByte
      var i = 0
      while (i < 8) { page(6 + i) = (granule >> (8 * i)).toByte; i += 1 }
      i = 0
      while (i < 4) {
        page(14 + i) = (serial >> (8 * i)).toByte
        page(18 + i) = (seq >> (8 * i)).toByte
        i += 1
      }
      page(26) = nSegs.toByte
      i = 0
      while (i < nSegs) { // lacing: full 255s then the (possibly 0) tail
        page(27 + i) =
          (if (i < nSegs - 1) 255 else body.length % 255).toByte
        i += 1
      }
      body.copyToArray(page, 27 + nSegs)
      val crc = crc32(page, 0, page.length, 22, 26)
      i = 0
      while (i < 4) { page(22 + i) = (crc >> (8 * i)).toByte; i += 1 }
      page
    }
  }

  // ===== ICO / CUR ======================================================

  /** Parsed ICO/CUR: entry count, dims of the largest entry — read
    * from each entry's OWN header (PNG IHDR / DIB BITMAPINFOHEADER),
    * never the 1-byte directory fields, which are notoriously
    * unreliable and cannot express dims above 256 — and the
    * metadata-invariant content identity: the concatenated image blobs
    * in directory order (hotspots, planes and bit-count directory
    * fields excluded: two exports of the same icon differ exactly
    * there). */
  final case class IcoInfo(cursor: Boolean, count: Int, width: Int,
                           height: Int, content: Array[Byte])

  object IcoCodec {
    private def le16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], p: Int): Long =
      le16(b, p).toLong | (le16(b, p + 2).toLong << 16)

    /** Walk the ICONDIR: reserved/type/count, every entry's declared
      * blob bounds-checked AND header-validated — a PNG entry must
      * carry the signature and an IHDR with sane dims, a DIB entry a
      * 40-byte BITMAPINFOHEADER with a positive, EVEN height (the
      * format stores XOR+AND mask rows doubled); anything else
      * refuses by name (the format carries only these two payloads). */
    def parse(payload: Array[Byte]): IcoInfo = {
      require(payload.length >= 6 + 16,
        s"not an ICO payload (${payload.length} bytes)")
      require(le16(payload, 0) == 0, "ICO reserved field nonzero")
      val typ = le16(payload, 2)
      require(typ == 1 || typ == 2, s"bad ICO resource type $typ")
      val count = le16(payload, 4)
      require(count >= 1, "empty ICO directory")
      require(6 + 16 * count <= payload.length,
        "truncated ICO directory")
      val content = new java.io.ByteArrayOutputStream()
      var width = 0 // 0, not -1: a valid 1x1 largest entry (1 > 0*0)
      var height = 0 // must still win the largest-area comparison
      var e = 0
      while (e < count) {
        val base = 6 + 16 * e
        val size = le32(payload, base + 8)
        val off = le32(payload, base + 12)
        require(size >= 16 && off >= 6 + 16L * count &&
          off + size <= payload.length,
          s"ICO entry $e declares [$off, ${off + size}) outside the " +
            s"${payload.length}-byte payload")
        val o = off.toInt
        def be32(p: Int): Long =
          ((payload(p) & 0xffL) << 24) | ((payload(p + 1) & 0xffL) << 16) |
            ((payload(p + 2) & 0xffL) << 8) | (payload(p + 3) & 0xffL)
        val isPng = (payload(o) & 0xff) == 0x89 && payload(o + 1) == 'P' &&
          payload(o + 2) == 'N' && payload(o + 3) == 'G'
        val (ew, eh) =
          if (isPng) {
            require(size >= 24 &&
              new String(payload, o + 12, 4, "US-ASCII") == "IHDR",
              s"ICO entry $e: PNG without a leading IHDR")
            (be32(o + 16), be32(o + 20))
          } else {
            require(le32(payload, o) == 40 && size >= 40,
              s"ICO entry $e is neither a PNG nor a 40-byte-header DIB")
            val w = le32(payload, o + 4)
            val h2 = le32(payload, o + 8)
            require(h2 >= 2 && h2 % 2 == 0,
              s"ICO entry $e: DIB height $h2 is not the doubled " +
                "XOR+AND-mask value")
            (w, h2 / 2)
          }
        // cap each dim BEFORE the product: be32/le32 values reach 2^32,
        // whose product overflows Long and could slip past the bound
        require(ew >= 1 && eh >= 1 && ew <= (1L << 26) &&
          eh <= (1L << 26) && ew * eh <= (1L << 26),
          s"ICO entry $e dims ${ew}x$eh out of bounds")
        if (ew * eh > width.toLong * height) {
          width = ew.toInt; height = eh.toInt
        }
        // 1× amplification bound: the SUM of entry sizes may not exceed
        // the payload (entries could still partially overlap within the
        // slack left by directory/header bytes — that is harmless; what
        // this prevents is a hostile directory whose entries all claim
        // the same region amplifying a small payload into an unbounded
        // content buffer, the executor-OOM class the quarantine exists
        // to catch)
        require(content.size.toLong + size <= payload.length,
          "ICO entries total more bytes than the payload (amplification bound)")
        content.write(payload, o, size.toInt)
        e += 1
      }
      require(width >= 1 && height >= 1, s"bad ICO dims ${width}x$height")
      IcoInfo(typ == 2, count, width, height, content.toByteArray)
    }

    /** Deterministic directory assembler for specs and fixtures: wraps
      * the given (w, h, blob) entries; cursor entries get a fixed
      * hotspot — exactly the field two exports of one icon differ by. */
    def build(entries: Seq[(Int, Int, Array[Byte])],
                           cursor: Boolean = false,
                           hotspot: Int = 0): Array[Byte] = {
      require(entries.nonEmpty, "empty ICO directory")
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      w16(0); w16(if (cursor) 2 else 1); w16(entries.size)
      var off = 6 + 16 * entries.size
      entries.foreach { case (w, h, blob) =>
        out.write(if (w >= 256) 0 else w)
        out.write(if (h >= 256) 0 else h)
        out.write(0); out.write(0)        // colors, reserved
        w16(if (cursor) hotspot else 1)   // planes / hotspot x
        w16(if (cursor) hotspot else 32)  // bit count / hotspot y
        w32(blob.length); w32(off)
        off += blob.length
      }
      entries.foreach { case (_, _, blob) => out.write(blob) }
      out.toByteArray
    }
  }

  // ===== TIFF ===========================================================

  /** Parsed TIFF: byte order, primary-image dims (first IFD), IFD
    * count, and the metadata-invariant content identity — the
    * concatenated strip bytes of every IFD in file order (ASCII
    * metadata tags like Software/DateTime live in the IFDs, never in
    * the strips). */
  final case class TiffInfo(bigEndian: Boolean, width: Int, height: Int,
                            nIfds: Int, content: Array[Byte])

  object TiffCodec {
    /** ImageWidth / ImageLength / StripOffsets / StripByteCounts. */
    private val TagWidth = 256
    private val TagLength = 257
    private val TagStripOffsets = 273
    private val TagStripCounts = 279

    /** Walk both byte orders: magic 42, every IFD's entry table
      * bounds-checked, dims from the first IFD, strip regions
      * bounds-checked and concatenated, IFD cycles refused. Reads
      * SHORT(3)/LONG(4) values, inline or offset per the 4-byte rule. */
    def parse(payload: Array[Byte]): TiffInfo = {
      require(payload.length >= 8,
        s"not a TIFF payload (${payload.length} bytes)")
      val big =
        if (payload(0) == 'M' && payload(1) == 'M') true
        else if (payload(0) == 'I' && payload(1) == 'I') false
        else throw new IllegalArgumentException("bad TIFF byte-order mark")
      def u16(p: Int): Int = {
        require(p + 2 <= payload.length, s"truncated TIFF field at $p")
        if (big) ((payload(p) & 0xff) << 8) | (payload(p + 1) & 0xff)
        else (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
      }
      def u32(p: Int): Long = {
        require(p + 4 <= payload.length, s"truncated TIFF field at $p")
        if (big) (u16(p).toLong << 16) | u16(p + 2)
        else u16(p).toLong | (u16(p + 2).toLong << 16)
      }
      require(u16(2) == 42, "bad TIFF magic")
      var ifdOff = u32(4)
      require(ifdOff != 0, "TIFF with no IFD")
      val content = new java.io.ByteArrayOutputStream()
      var width = -1
      var height = -1
      var nIfds = 0
      var totalVals = 0L // structural-tag values read across the walk
      var totalEntries = 0L // entry-table slots scanned across the walk
      val seen = scala.collection.mutable.Set.empty[Long]
      while (ifdOff != 0) {
        require(seen.add(ifdOff), s"TIFF IFD cycle at offset $ifdOff")
        require(ifdOff + 2 <= payload.length, "truncated TIFF IFD")
        val p = ifdOff.toInt
        val nEntries = u16(p)
        require(nEntries >= 1, "empty TIFF IFD")
        // the cycle set only blocks exact repeats: OVERLAPPING chained
        // IFDs (offsets shifted a byte at a time) could otherwise make
        // one small payload cost quadratic CPU in entry scans
        totalEntries += nEntries
        require(totalEntries <= (1L << 20),
          "TIFF IFD chain scans more entry slots than the decode bound " +
            "(2^20)")
        val end = p + 2 + 12 * nEntries
        require(end + 4 <= payload.length, "truncated TIFF IFD table")
        // SHORT/LONG tag values (inline when they fit in 4 bytes)
        def values(entry: Int): Array[Long] = {
          val typ = u16(entry + 2)
          val n = u32(entry + 4)
          val width = typ match {
            case 3 => 2
            case 4 => 4
            case t => throw new IllegalArgumentException(
              s"TIFF tag ${u16(entry)} has unsupported type $t " +
                "for a structural field")
          }
          require(n >= 1 && n <= (1 << 16), s"bad TIFF tag count $n")
          // overlapping IFD chains (the seen-set only blocks exact
          // repeats) must not turn a small payload into unbounded
          // tag-array allocations
          totalVals += n
          require(totalVals <= (1L << 22),
            "TIFF structural tag values exceed the decode bound (2^22)")
          val at = if (n * width <= 4) entry + 8 else {
            val o = u32(entry + 8)
            require(o + n * width <= payload.length,
              s"TIFF tag ${u16(entry)} values outside the payload")
            o.toInt
          }
          Array.tabulate(n.toInt)(i =>
            if (width == 2) u16(at + 2 * i).toLong else u32(at + 4 * i))
        }
        var stripOffsets: Array[Long] = null
        var stripCounts: Array[Long] = null
        var e = 0
        while (e < nEntries) {
          val entry = p + 2 + 12 * e
          u16(entry) match {
            case TagWidth if nIfds == 0 =>
              width = values(entry).head.toInt
            case TagLength if nIfds == 0 =>
              height = values(entry).head.toInt
            case TagStripOffsets => stripOffsets = values(entry)
            case TagStripCounts => stripCounts = values(entry)
            case _ => () // Software / DateTime / resolution … — metadata,
              // excluded from the content identity by design
          }
          e += 1
        }
        require(stripOffsets != null && stripCounts != null,
          s"TIFF IFD $nIfds carries no strip data")
        require(stripOffsets.length == stripCounts.length,
          "TIFF StripOffsets/StripByteCounts length mismatch")
        var s = 0
        while (s < stripOffsets.length) {
          val off = stripOffsets(s)
          val cnt = stripCounts(s)
          require(cnt >= 0 && off + cnt <= payload.length,
            s"TIFF strip $s declares [$off, ${off + cnt}) outside the " +
              s"${payload.length}-byte payload")
          // 1× amplification bound (same as the ICO directory): the SUM
          // of strip byte counts may not exceed the payload — partial
          // overlap within header slack remains possible and harmless;
          // unbounded content-buffer growth does not
          require(content.size.toLong + cnt <= payload.length,
            "TIFF strips total more bytes than the payload (amplification bound)")
          content.write(payload, off.toInt, cnt.toInt)
          s += 1
        }
        ifdOff = u32(end)
        nIfds += 1
      }
      require(width >= 1 && height >= 1,
        s"TIFF primary IFD dims ${width}x$height")
      require(width.toLong * height <= (1L << 26),
        s"TIFF dims ${width}x$height exceed the in-row decode bound " +
          "(2^26 pixels)")
      TiffInfo(big, width, height, nIfds, content.toByteArray)
    }

    /** Deterministic single-IFD assembler for specs and fixtures: an
      * uncompressed gray image in `strips`, either byte order, plus an
      * optional ASCII Software tag — the metadata two exports of one
      * scan differ by. */
    def build(big: Boolean, w: Int, h: Int,
                           strips: Seq[Array[Byte]],
                           software: String = ""): Array[Byte] = {
      require(strips.nonEmpty, "TIFF needs at least one strip")
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit =
        if (big) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
        else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit =
        if (big) { w16((v >>> 16) & 0xffff); w16(v & 0xffff) }
        else { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      val sw = if (software.isEmpty) Array.emptyByteArray
        else (software + "\u0000").getBytes("US-ASCII")
      val nStrips = strips.size
      val nEntries = 7 + (if (sw.nonEmpty) 1 else 0)
      val ifdEnd = 8 + 2 + 12 * nEntries + 4
      // value areas after the IFD: strip offset/count arrays (when they
      // don't fit inline), the software string, then the strip data
      val offArr = if (nStrips > 1) ifdEnd else -1
      val cntArr = if (nStrips > 1) ifdEnd + 4 * nStrips else -1
      val swOff = ifdEnd + (if (nStrips > 1) 8 * nStrips else 0)
      val dataOff = swOff + sw.length
      val stripOffs = strips.scanLeft(dataOff)(_ + _.length).init
      // header
      out.write(if (big) 'M' else 'I'); out.write(if (big) 'M' else 'I')
      w16(42); w32(8)
      w16(nEntries)
      def entry(tag: Int, typ: Int, n: Int, inline: => Unit): Unit = {
        w16(tag); w16(typ); w32(n)
        val before = out.size()
        inline
        while (out.size() < before + 4) out.write(0)
      }
      entry(TagWidth, 4, 1, w32(w))
      entry(TagLength, 4, 1, w32(h))
      entry(258, 3, 1, w16(8))  // BitsPerSample
      entry(259, 3, 1, w16(1))  // Compression: none
      entry(TagStripOffsets, 4, nStrips, // tags in ascending order (spec)
        if (nStrips == 1) w32(stripOffs.head) else w32(offArr))
      entry(278, 4, 1, w32((h + nStrips - 1) / nStrips)) // RowsPerStrip
      entry(TagStripCounts, 4, nStrips,
        if (nStrips == 1) w32(strips.head.length) else w32(cntArr))
      if (sw.nonEmpty) entry(305, 2, sw.length, w32(swOff)) // Software
      w32(0) // no next IFD
      if (nStrips > 1) {
        stripOffs.foreach(w32)
        strips.foreach(st => w32(st.length))
      }
      out.write(sw)
      strips.foreach(out.write)
      out.toByteArray
    }
  }

  // ===== MP4 / ISO-BMFF =================================================

  /** Parsed MP4: brand from ftyp, movie duration from mvhd (ms), and
    * the concatenated mdat payloads (in file order — a fragmented/
    * multi-mdat file's media is ALL its mdat boxes, not the last one)
    * as the content identity. */
  final case class Mp4Info(brand: String, durationMs: Long,
                           content: Array[Byte])

  object Mp4Codec {
    private def be32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    private def be64(b: Array[Byte], p: Int): Long =
      (be32(b, p) << 32) | be32(b, p + 4)

    /** Walk the top-level box tree (sizes must tile the payload
      * exactly), require a leading ftyp, read mvhd (either version)
      * for the duration, capture mdat. */
    def parse(payload: Array[Byte]): Mp4Info = {
      require(payload.length >= 16, s"not an MP4 payload " +
        s"(${payload.length} bytes)")
      var pos = 0
      var brand: String = null
      var durationMs = -1L
      val content = new java.io.ByteArrayOutputStream()
      var first = true
      while (pos < payload.length) {
        require(pos + 8 <= payload.length, s"truncated MP4 box at $pos")
        var size = be32(payload, pos)
        val typ = new String(payload, pos + 4, 4, "US-ASCII")
        var hdr = 8
        if (size == 1) {
          require(pos + 16 <= payload.length, "truncated MP4 largesize")
          size = be64(payload, pos + 8)
          hdr = 16
        } else if (size == 0) size = payload.length - pos // to end of file
        require(size >= hdr && pos + size <= payload.length,
          s"MP4 box '$typ' declares $size bytes past the payload end")
        if (first) {
          require(typ == "ftyp", s"MP4 payload must lead with ftyp, " +
            s"got '$typ'")
          require(size >= hdr + 8, "truncated ftyp box")
          brand = new String(payload, pos + hdr, 4, "US-ASCII")
          first = false
        }
        if (typ == "mdat")
          content.write(payload, pos + hdr, size.toInt - hdr)
        if (typ == "moov") {
          // scan the moov children for mvhd
          var p = pos + hdr
          val end = pos + size.toInt
          while (p < end) {
            require(p + 8 <= end, "truncated moov child box")
            val cs = be32(payload, p)
            val ct = new String(payload, p + 4, 4, "US-ASCII")
            require(cs >= 8 && p + cs <= end,
              s"moov child '$ct' overruns its parent")
            if (ct == "mvhd") {
              // the version byte and the v-dependent field block must
              // BOTH sit inside this child — a short mvhd (cs >= 8
              // passes the tiling check) would otherwise read its
              // sibling's bytes as the duration, silently
              require(cs >= 12, s"truncated mvhd ($cs bytes)")
              val v = payload(p + 8) & 0xff
              require(cs >= (if (v == 0) 28 else 40),
                s"truncated mvhd: version $v needs " +
                  s"${if (v == 0) 28 else 40} bytes, box has $cs")
              val (scale, dur) =
                if (v == 0) (be32(payload, p + 20), be32(payload, p + 24))
                else (be32(payload, p + 28), be64(payload, p + 32))
              require(scale > 0, "mvhd timescale 0")
              durationMs = dur * 1000 / scale
            }
            p += cs.toInt
          }
        }
        pos += size.toInt
      }
      require(brand != null, "MP4 payload with no ftyp")
      require(durationMs >= 0, "MP4 payload with no moov/mvhd")
      Mp4Info(brand, durationMs, content.toByteArray)
    }

    /** Version-0 mvhd box (28 bytes): zero flags/times, the given
      * timescale and duration. */
    def mvhdBox(timescale: Int, duration: Long): Array[Byte] = {
      require(timescale > 0, "mvhd timescale must be positive")
      require(duration >= 0 && duration <= 0xffffffffL,
        "v0 mvhd duration is a 32-bit field")
      val body = new Array[Byte](20) // version/flags, ctime, mtime, ts, dur
      var i = 0
      while (i < 4) {
        body(12 + i) = (timescale >> (8 * (3 - i))).toByte
        body(16 + i) = (duration >> (8 * (3 - i))).toByte
        i += 1
      }
      box("mvhd", body)
    }

    /** Deterministic assembler: ftyp('isom') + optional free/udta
      * metadata + moov(mvhd, timescale 1000 so durationMs == duration
      * units) + mdat(`data`). The moov-invariant content identity is
      * `data` verbatim; sizes are CLOSED-FORM: bare 60 + n, tagged
      * 124 + n (a 24-byte free box and a 40-byte udta in moov). */
    def encode(data: Array[Byte], durationMs: Long,
               tagged: Boolean): Array[Byte] = {
      val ftyp = box("ftyp", "isomgrft".getBytes("US-ASCII"))
      val mvhd = mvhdBox(1000, durationMs)
      val out = new java.io.ByteArrayOutputStream()
      out.write(ftyp)
      if (tagged) {
        // editor padding + user-data metadata — exactly what two crawls
        // of the same movie differ by
        val junk = Array.tabulate[Byte](16)(i => (0x40 + i).toByte)
        out.write(box("free", junk))
        out.write(box("mdat", data))
        out.write(box("moov", mvhd ++ box("udta",
          Array.tabulate[Byte](32)(i => (0x60 + i % 16).toByte))))
      } else {
        out.write(box("moov", mvhd))
        out.write(box("mdat", data))
      }
      out.toByteArray
    }

    /** Deterministic box builder for specs and fixtures. */
    private[etl] def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length)
      val size = out.length
      out(0) = (size >> 24).toByte; out(1) = (size >> 16).toByte
      out(2) = (size >> 8).toByte; out(3) = size.toByte
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      body.copyToArray(out, 8)
      out
    }
  }
}
