package graft.etl

/** MPEG audio (MP3-family) CONTAINER codec — frame-structure walk,
  * tag handling and validation for the format that dominates crawled
  * audio. Follows the public MPEG-1/2 audio framing (ISO/IEC 11172-3 /
  * 13818-3 header layout and frame-length arithmetic) and the ID3v1/
  * ID3v2 tag conventions.
  *
  * SCOPE — deliberately NOT a PCM decoder. The container's framing,
  * tags, CRC and length arithmetic are small public tables this walk
  * validates end to end, and the specs prove them by construction
  * (frames synthesized at every version/layer/bitrate/samplerate
  * combination must walk exactly; corruption at each layer must refuse
  * by name). Full Layer III PCM decode needs the spec's large Huffman
  * code tables and filterbank window constants, and this environment
  * carries NO independent MP3 decoder to referee them (no ffmpeg, no
  * JLayer, no JDK SPI) — a from-memory table dump validated only by
  * fixtures built from the same tables would be circular, so it is
  * refused rather than shipped unverifiable. What the walk yields is
  * the crawl-pipeline surface that does not need PCM: per-asset
  * validation/quarantine, duration + bitrate + channel metadata, and
  * TAG-INVARIANT dedup — [[frameStream]] strips ID3v2/v1 and returns
  * the raw frame bytes, so the same audio re-tagged by two crawls
  * digests identically (the q_media_dup discipline one rung below
  * decoded-PCM identity: byte-identical FRAMES, metadata excluded).
  *
  * Reference behavior analog: opaque payloads with per-request
  * validation, never node death (/root/reference/quasar.go:83-95). */
object Mp3Codec {

  /** One walked frame: byte offset, byte length, samples it carries. */
  final case class Mp3Frame(offset: Int, length: Int, samples: Int)

  /** Whole-container walk result. `version` is 1, 2, or 25 (MPEG-2.5);
    * `layer` 1–3; `bitrateKbps` is the per-frame mean (CBR streams:
    * the constant; VBR: the true average). `frameBytes` spans the
    * frame stream (tags excluded): [frameStart, frameEnd). */
  final case class Mp3Info(version: Int, layer: Int, sampleRate: Int,
                           channels: Int, frames: Vector[Mp3Frame],
                           frameStart: Int, frameEnd: Int,
                           id3v2Bytes: Int, id3v1: Boolean) {
    def totalSamples: Long = frames.iterator.map(_.samples.toLong).sum
    def durationMs: Long =
      if (sampleRate == 0) 0L else totalSamples * 1000L / sampleRate
    def bitrateKbps: Double = {
      val bytes = frames.iterator.map(_.length.toLong).sum
      val sec = totalSamples.toDouble / sampleRate
      if (sec == 0) 0.0 else bytes * 8 / 1000.0 / sec
    }
  }

  // ---- public header tables (ISO 11172-3 / 13818-3) -------------------

  /** Bitrates in kbps by [version-group][layer][index 1..14]; index 0 is
    * free-format (refused — its frame length is not derivable from the
    * header) and 15 is forbidden. Version group 0 = MPEG-1, 1 = MPEG-2
    * and 2.5 (they share the lower table). */
  private val Bitrates: Array[Array[Array[Int]]] = Array(
    Array( // MPEG-1
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array( // MPEG-2 / 2.5
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  /** Sample rates by version (1 / 2 / 2.5) and the 2-bit index. */
  private def sampleRateOf(version: Int, idx: Int): Int = {
    val base = idx match {
      case 0 => 44100
      case 1 => 48000
      case 2 => 32000
      case _ => throw new IllegalArgumentException(
        "reserved MP3 sample-rate index 3")
    }
    version match {
      case 1 => base
      case 2 => base / 2
      case _ => base / 4
    }
  }

  /** Samples per frame by version and layer. */
  private def samplesPerFrame(version: Int, layer: Int): Int = layer match {
    case 1 => 384
    case 2 => 1152
    case _ => if (version == 1) 1152 else 576
  }

  /** CRC-16 with the MPEG polynomial 0x8005, init 0xFFFF (the framing
    * CRC; FLAC uses the same polynomial with init 0). */
  private[etl] def crc16(bytes: Array[Byte], from: Int, until: Int,
                         init: Int = 0xffff): Int = {
    var crc = init
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** Side-information length for Layer III (the CRC's coverage):
    * MPEG-1 mono 17 / stereo 32; MPEG-2(.5) mono 9 / stereo 17. */
  private def sideInfoLen(version: Int, channels: Int): Int =
    if (version == 1) { if (channels == 1) 17 else 32 }
    else { if (channels == 1) 9 else 17 }

  /** Walk the whole container: leading ID3v2 (syncsafe size), every
    * frame header (version / layer / bitrate / sample rate / padding /
    * channel mode consistency-checked against the first frame), frame
    * lengths by the public arithmetic, Layer III CRC-16 when the
    * protection bit says one is present, trailing ID3v1. Throws on
    * anything malformed — the quarantine tags it per row. */
  def parse(payload: Array[Byte]): Mp3Info = {
    require(payload.length >= 4, s"not an MPEG audio payload " +
      s"(${payload.length} bytes)")
    var pos = 0
    var id3v2 = 0
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      // ID3v2: 10-byte header, syncsafe 28-bit size, optional footer
      val flags = payload(5) & 0xff
      var size = 0
      var i = 6
      while (i < 10) {
        require((payload(i) & 0x80) == 0, "non-syncsafe ID3v2 size byte")
        size = (size << 7) | (payload(i) & 0x7f)
        i += 1
      }
      id3v2 = 10 + size + (if ((flags & 0x10) != 0) 10 else 0)
      require(id3v2 <= payload.length, "ID3v2 tag past the payload end")
      pos = id3v2
    }
    val end0 = payload.length
    // ID3v1 is detected ONLY at a frame boundary with exactly 128 bytes
    // remaining — unambiguous, because a tag's 'T' (0x54) can never be a
    // frame header's 0xFF sync byte. A blind sniff at end-128 could be
    // spoofed by frame-body bytes that happen to spell "TAG", silently
    // truncating the frame stream (and the dedup identity) mid-frame.
    // Deliberate consequence: if the declared frame lengths tile EXACTLY
    // to the payload end ACROSS an end-128 "TAG", the bytes are read as
    // frames — sync-validated exact tiling is stronger evidence than a
    // 3-byte magic, and the refusal alternative would reject legitimate
    // streams whose body coincidentally spells TAG there. A genuinely
    // tag-over-truncated-frame file almost never re-tiles exactly and
    // still refuses at the non-tiling boundary.
    var id3v1 = false
    def id3v1At(p: Int): Boolean = end0 - p == 128 &&
      payload(p) == 'T' && payload(p + 1) == 'A' && payload(p + 2) == 'G'
    val frameStart = pos
    var version = -1
    var layer = -1
    var sampleRate = -1
    var channels = -1
    val frames = Vector.newBuilder[Mp3Frame]
    var n = 0
    while (pos < end0 && !id3v1) {
      if (id3v1At(pos)) { id3v1 = true }
      else {
      val end = end0
      require(pos + 4 <= end, s"truncated MPEG frame header at $pos")
      val h0 = payload(pos) & 0xff
      val h1 = payload(pos + 1) & 0xff
      val h2 = payload(pos + 2) & 0xff
      val h3 = payload(pos + 3) & 0xff
      require(h0 == 0xff && (h1 & 0xe0) == 0xe0,
        s"lost MPEG frame sync at $pos")
      val v = (h1 >> 3) & 3 match {
        case 0 => 25 // MPEG-2.5
        case 2 => 2
        case 3 => 1
        case _ => throw new IllegalArgumentException(
          s"reserved MPEG version id at $pos")
      }
      val l = (h1 >> 1) & 3 match {
        case 1 => 3
        case 2 => 2
        case 3 => 1
        case _ => throw new IllegalArgumentException(
          s"reserved MPEG layer id at $pos")
      }
      val protection = (h1 & 1) == 0 // bit 0 means CRC PRESENT
      val brIdx = (h2 >> 4) & 0xf
      require(brIdx != 15, s"forbidden MPEG bitrate index at $pos")
      require(brIdx != 0, "free-format MPEG stream (bitrate index 0) " +
        "is not supported — frame length is not derivable")
      val srIdx = (h2 >> 2) & 3
      val padding = (h2 >> 1) & 1
      val mode = (h3 >> 6) & 3
      val ch = if (mode == 3) 1 else 2
      require((h3 & 3) != 2, s"reserved MPEG emphasis at $pos")
      val sr = sampleRateOf(v, srIdx)
      val br = Bitrates(if (v == 1) 0 else 1)(l - 1)(brIdx) * 1000
      val len = l match {
        case 1 => (12 * br / sr + padding) * 4
        case 2 => 144 * br / sr + padding
        case _ =>
          if (v == 1) 144 * br / sr + padding
          else 72 * br / sr + padding
      }
      require(pos + len <= end,
        s"MPEG frame at $pos declares $len bytes past the stream end")
      if (n == 0) {
        version = v; layer = l; sampleRate = sr; channels = ch
      } else require(v == version && l == layer && sr == sampleRate &&
        ch == channels,
        s"MPEG stream changes version/layer/rate/channels at frame $n " +
          "(not a single consistent stream)")
      if (protection) {
        require(pos + 6 <= end, s"truncated MPEG CRC at $pos")
        val declared = ((payload(pos + 4) & 0xff) << 8) |
          (payload(pos + 5) & 0xff)
        if (l == 3) {
          // the CRC covers header bytes 2–3 and the side information
          val si = sideInfoLen(v, ch)
          require(pos + 6 + si <= end, "truncated MPEG side info")
          val buf = new Array[Byte](2 + si)
          buf(0) = payload(pos + 2)
          buf(1) = payload(pos + 3)
          System.arraycopy(payload, pos + 6, buf, 2, si)
          require(crc16(buf, 0, buf.length) == declared,
            s"MPEG frame CRC-16 mismatch at $pos")
        } // Layer I/II coverage spans the variable allocation bits —
          // accounted (2 bytes) but not validated
      }
      frames += Mp3Frame(pos, len, samplesPerFrame(v, l))
      pos += len
      n += 1
      }
    }
    require(n > 0, "MPEG payload with no audio frame")
    Mp3Info(version, layer, sampleRate, channels, frames.result(),
      frameStart, pos, id3v2, id3v1)
  }

  /** The tag-stripped FRAME STREAM — the dedup identity: two crawls of
    * the same audio with different ID3 tags return identical bytes. */
  def frameStream(payload: Array[Byte]): Array[Byte] = {
    val info = parse(payload)
    java.util.Arrays.copyOfRange(payload, info.frameStart, info.frameEnd)
  }

  /** Byte length of the fixture framer's frame shape: MPEG-1 Layer III,
    * 128 kbps, 44.1 kHz, no padding, no CRC — 144·128000/44100 = 417. */
  val FrameLen: Int = 417

  /** Deterministic FRAMER: packs `data` into consecutive [[FrameLen]]-
    * byte MPEG-1 Layer III frames (stereo, 128 kbps, 44.1 kHz, no CRC),
    * zero-padding the last. NOT an audio encoder — frame bodies carry
    * the bytes verbatim; what it provides is a conformant frame stream
    * whose size is CLOSED-FORM (417·max(1,⌈n/413⌉)) and whose walk is
    * fully validated, so the tag-invariant dedup identity can be
    * oracle-gated end to end (the q_media_dup discipline). */
  def encodeFrames(data: Array[Byte]): Array[Byte] = {
    val cap = FrameLen - 4 // header bytes are not payload
    val nFrames = math.max(1, (data.length + cap - 1) / cap)
    val out = new Array[Byte](nFrames * FrameLen)
    var f = 0
    while (f < nFrames) {
      val base = f * cap
      val frame = buildFrame(1, 3, 9, 0, 0, mono = false, withCrc = false,
        i => { val j = base + (i - 4)
               if (j < data.length) data(j) else 0 })
      System.arraycopy(frame, 0, out, f * FrameLen, FrameLen)
      f += 1
    }
    out
  }

  /** Deterministic ID3v2.3 tag: real syncsafe-size header wrapping an
    * opaque body (total 10 + body.length bytes). */
  def id3v2Tag(body: Array[Byte]): Array[Byte] = {
    require(body.length < (1 << 28), "ID3v2 body exceeds the syncsafe range")
    val out = new Array[Byte](10 + body.length)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'
    out(3) = 3 // v2.3, no flags (no footer)
    var i = 0
    while (i < 4) {
      out(6 + i) = ((body.length >> (7 * (3 - i))) & 0x7f).toByte
      i += 1
    }
    body.copyToArray(out, 10)
    out
  }

  /** Deterministic ID3v1 tag (always 128 bytes): 'TAG' + title. */
  def id3v1Tag(title: String): Array[Byte] = {
    val out = new Array[Byte](128)
    out(0) = 'T'; out(1) = 'A'; out(2) = 'G'
    val t = title.getBytes("ISO-8859-1")
    System.arraycopy(t, 0, out, 3, math.min(30, t.length))
    out
  }

  /** Deterministic test/fixture builder: one conformant frame of the
    * given shape with an arbitrary (structurally opaque) body. Used by
    * the specs to synthesize streams at every version/layer/rate
    * combination; NOT an audio encoder. */
  private[etl] def buildFrame(version: Int, layer: Int, brIdx: Int,
                              srIdx: Int, padding: Int, mono: Boolean,
                              withCrc: Boolean,
                              fill: Int => Byte): Array[Byte] = {
    val vBits = version match { case 1 => 3; case 2 => 2; case _ => 0 }
    val lBits = layer match { case 1 => 3; case 2 => 2; case _ => 1 }
    val sr = sampleRateOf(version, srIdx)
    val br = Bitrates(if (version == 1) 0 else 1)(layer - 1)(brIdx) * 1000
    val len = layer match {
      case 1 => (12 * br / sr + padding) * 4
      case 2 => 144 * br / sr + padding
      case _ => if (version == 1) 144 * br / sr + padding
                else 72 * br / sr + padding
    }
    val f = new Array[Byte](len)
    f(0) = 0xff.toByte
    f(1) = (0xe0 | (vBits << 3) | (lBits << 1) | (if (withCrc) 0 else 1))
      .toByte
    f(2) = ((brIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
    f(3) = (if (mono) 0xc0 else 0x00).toByte
    var i = if (withCrc) 6 else 4
    while (i < len) { f(i) = fill(i); i += 1 }
    if (withCrc && layer == 3) {
      val si = sideInfoLen(version, if (mono) 1 else 2)
      val buf = new Array[Byte](2 + si)
      buf(0) = f(2); buf(1) = f(3)
      System.arraycopy(f, 6, buf, 2, si)
      val c = crc16(buf, 0, buf.length)
      f(4) = (c >> 8).toByte
      f(5) = c.toByte
    }
    f
  }
}
