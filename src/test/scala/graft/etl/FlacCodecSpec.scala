package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** [[FlacCodec]]: the deterministic VERBATIM encoder round-trips with
  * its closed-form size, and the decoder handles the general shapes
  * (CONSTANT / FIXED + Rice residuals, multi-byte headers, CRC and MD5
  * refusal) a crawl would present. FLAC's STREAMINFO carries the MD5
  * of the unencoded samples, so every successful decode here is
  * self-verified against the spec's own integrity signature — the
  * referee role ImageIO plays for the JPEG family. */
class FlacCodecSpec extends AnyFunSuite {

  test("encoder round-trip: samples, closed-form size, STREAMINFO, MD5") {
    val data = "flac verbatim fixture content, ascii only".getBytes("UTF-8")
    val flac = FlacCodec.encode(8000, data)
    assert(flac.length ==
      FlacCodec.HeaderSize + FlacCodec.FrameOverhead + data.length)
    val f = FlacCodec.decode(flac)
    assert(f.sampleRate == 8000 && f.channels == 1 && f.bps == 8)
    assert(f.totalSamples == data.length)
    assert(f.samples.toSeq == data.map(_.toInt).toSeq)

    // multi-frame: 10000 samples span ceil(10000/4096) = 3 frames
    val big = Array.tabulate(10000)(i => (32 + i % 90).toByte)
    val bigFlac = FlacCodec.encode(8000, big)
    assert(bigFlac.length ==
      FlacCodec.HeaderSize + 3 * FlacCodec.FrameOverhead + big.length)
    val bf = FlacCodec.decode(bigFlac)
    assert(bf.samples.toSeq == big.map(_.toInt).toSeq)

    // empty stream: header only, zero frames
    val empty = FlacCodec.encode(8000, Array.emptyByteArray)
    assert(empty.length == FlacCodec.HeaderSize)
    assert(FlacCodec.decode(empty).totalSamples == 0L)

    // non-ASCII input refuses (a byte >= 128 would flip sign silently)
    intercept[IllegalArgumentException](
      FlacCodec.encode(8000, Array[Byte](-1)))
  }

  test("encodeRice: FIXED order-0 + Rice residual round-trips through " +
       "the full decoder (MD5 referee) with a closed-form size") {
    for (n <- Seq(0, 1, 63, 64, 127, 413, 4096, 4097, 9000)) {
      val data = Array.tabulate[Byte](n)(i => ((i * 29 + 5) % 128).toByte)
      val enc = FlacCodec.encodeRice(8000, data)
      // closed form: 42 + per-frame (10 + ceil((18 + 8·n_i + c_i)/8))
      var expected = FlacCodec.HeaderSize
      var pos = 0
      while (pos < n) {
        val bn = math.min(FlacCodec.BlockSize, n - pos)
        var c = 0
        for (j <- pos until pos + bn) if ((data(j) & 0xff) >= 64) c += 1
        expected += 10 + (25 + 8 * bn + c) / 8
        pos += FlacCodec.BlockSize
      }
      assert(enc.length == expected, s"n=$n")
      val info = FlacCodec.decode(enc)
      assert(info.sampleRate == 8000 && info.channels == 1 && info.bps == 8)
      assert(info.samples.toSeq == data.map(_.toInt).toSeq, s"n=$n")
    }
    // boundary samples: 63 (quotient 0) vs 64 (quotient 1) cost 8 vs 9
    // residual bits — the closed form's c term, one sample at a time
    val low = FlacCodec.encodeRice(8000, Array.fill[Byte](8)(63))
    val high = FlacCodec.encodeRice(8000, Array.fill[Byte](8)(64))
    assert(high.length == low.length + 1)
    // corruption: flip a residual bit → refused (CRC-16 or MD5 layer)
    val enc = FlacCodec.encodeRice(8000,
      "rice coded residual fixture".getBytes("UTF-8"))
    val bad = enc.clone()
    bad(55) = (bad(55) ^ 1).toByte
    intercept[IllegalArgumentException](FlacCodec.decode(bad))
  }

  test("encodeLpc: order-1 quantized-coefficient prediction + Rice " +
       "deltas round-trips through the full decoder with a closed-form " +
       "size") {
    for (n <- Seq(0, 1, 2, 127, 413, 4096, 4097, 9000)) {
      // sawtooth with jumps so deltas span sign and unary cost classes
      val data = Array.tabulate[Byte](n)(i => ((i * 37 + 11) % 128).toByte)
      val enc = FlacCodec.encodeLpc(8000, data)
      var expected = FlacCodec.HeaderSize
      var pos = 0
      while (pos < n) {
        val bn = math.min(FlacCodec.BlockSize, n - pos)
        var cz = 0
        for (j <- pos + 1 until pos + bn) {
          val d = (data(j) & 0xff) - (data(j - 1) & 0xff)
          cz += ((d << 1) ^ (d >> 31)) / 16
        }
        expected += 10 + (37 + 5 * (bn - 1) + cz + 7) / 8
        pos += FlacCodec.BlockSize
      }
      assert(enc.length == expected, s"n=$n")
      val info = FlacCodec.decode(enc)
      assert(info.samples.toSeq == data.map(_.toInt).toSeq, s"n=$n")
    }
    // constant signal: every delta 0 → exactly 5 bits per residual
    val flat = FlacCodec.encodeLpc(8000, Array.fill[Byte](100)(65))
    assert(flat.length == 42 + 10 + (37 + 5 * 99 + 7) / 8)
    assert(FlacCodec.decode(flat).samples.forall(_ == 65))
    // corruption: flip a delta bit → refused (CRC-16 or MD5 layer)
    val enc = FlacCodec.encodeLpc(8000,
      "lpc coded delta fixture".getBytes("UTF-8"))
    val bad = enc.clone()
    bad(56) = (bad(56) ^ 2).toByte
    intercept[IllegalArgumentException](FlacCodec.decode(bad))
  }

  test("corruption fails loudly at the right layer: CRC-8, CRC-16, MD5") {
    val data = "integrity check content".getBytes("UTF-8")
    val flac = FlacCodec.encode(8000, data)
    // frame header byte (the blocksize field) → CRC-8
    val h = flac.clone()
    h(FlacCodec.HeaderSize + 5) = (h(FlacCodec.HeaderSize + 5) ^ 1).toByte
    val e8 = intercept[IllegalArgumentException](FlacCodec.decode(h))
    assert(e8.getMessage.contains("CRC-8"), e8.getMessage)
    // sample byte → CRC-16 (caught before the MD5 layer)
    val b = flac.clone()
    b(FlacCodec.HeaderSize + 9 + 3) = (b(FlacCodec.HeaderSize + 9 + 3) ^ 1).toByte
    val e16 = intercept[IllegalArgumentException](FlacCodec.decode(b))
    assert(e16.getMessage.contains("CRC-16"), e16.getMessage)
    // MD5 signature byte → the decode itself succeeds frame-wise but
    // the stream-level integrity referee refuses
    val m = flac.clone()
    m(8 + 18) = (m(8 + 18) ^ 1).toByte
    val em = intercept[IllegalArgumentException](FlacCodec.decode(m))
    assert(em.getMessage.contains("MD5"), em.getMessage)
    // an all-zero signature means "not computed" and skips the check
    val z = flac.clone()
    java.util.Arrays.fill(z, 8 + 18, 8 + 34, 0.toByte)
    assert(FlacCodec.decode(z).samples.toSeq == data.map(_.toInt).toSeq)
    // truncation dies loudly
    intercept[IllegalArgumentException](
      FlacCodec.decode(java.util.Arrays.copyOf(flac, flac.length - 4)))
    intercept[IllegalArgumentException](
      FlacCodec.decode("not flac at all".getBytes("UTF-8")))
  }

  test("unknown-length streams refuse loudly; truncation at the CRC-8 " +
       "byte names the layer, not an index error") {
    val data = "unknown length stream content".getBytes("UTF-8")
    val flac = FlacCodec.encode(8000, data)
    val si = 8 // STREAMINFO payload offset in an encoder container
    // zero the 36-bit totalSamples field (low nibble of si+13 + si+14..17):
    // RFC 9639 says 0 means "unknown", not "empty" — with frames present
    // the decode must refuse, never silently return zero samples (which
    // would collapse every unknown-length file into one md5("") group)
    val u = flac.clone()
    u(si + 13) = (u(si + 13) & 0xf0).toByte
    java.util.Arrays.fill(u, si + 14, si + 18, 0.toByte)
    val e = intercept[IllegalArgumentException](FlacCodec.decode(u))
    assert(e.getMessage.contains("unknown-length"), e.getMessage)
    // truncating exactly after the byte-aligned frame header — where the
    // CRC-8 byte would be — must hit the named require, not an
    // ArrayIndexOutOfBoundsException (quarantine messages stay readable)
    val cut = java.util.Arrays.copyOf(flac,
      FlacCodec.HeaderSize + 7) // 4 hdr + 1 utf8 + 2 blocksize
    val t = intercept[IllegalArgumentException](FlacCodec.decode(cut))
    assert(t.getMessage.contains("truncated FLAC frame header"), t.getMessage)
  }

  /** Bit-level writer for hand-built frames (test-side only). */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = while (n != 0) put(0, 1)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Build a one-frame 8-bit stream whose subframe bits the caller
    * writes; `samples` is the CHANNEL-INTERLEAVED expected output, and
    * STREAMINFO's md5 covers it, so every decode here is self-verified
    * by the spec's own integrity signature. `chCode` is the frame's
    * channel-assignment nibble (0 mono, 1 independent stereo, 8/9/10
    * decorrelated stereo). */
  private def handStream(samples: Array[Int], chCode: Int = 0,
      channels: Int = 1)(
      writeSubframe: BitWriter => Unit): Array[Byte] = {
    require(samples.length % channels == 0)
    val total = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0 // min/max bs 4096
    val packed = (8000L << 44) | ((channels - 1).toLong << 41) |
      (7L << 36) | total.toLong
    (0 until 8).foreach(b => si(10 + b) = (packed >> (56 - 8 * b)).toByte)
    val raw = samples.map(_.toByte)
    System.arraycopy(
      java.security.MessageDigest.getInstance("MD5").digest(raw), 0, si, 18, 16)
    out.write(si)
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(0xff); hdr.write(0xf8); hdr.write(0x70)
    hdr.write((chCode << 4) | 0x02) // sample size 0b001 (8), reserved 0
    hdr.write(0) // frame 0
    hdr.write((total - 1) >> 8); hdr.write((total - 1) & 0xff)
    val hb = hdr.toByteArray
    hdr.write(FlacCodec.crc8(hb, 0, hb.length))
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(hdr.toByteArray)
    val bw = new BitWriter
    writeSubframe(bw)
    frame.write(bw.bytes)
    val fb = frame.toByteArray
    val c16 = FlacCodec.crc16(fb, 0, fb.length)
    out.write(fb)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    out.toByteArray
  }

  test("general decode: CONSTANT and FIXED+Rice subframes, hand-built, " +
      "MD5-refereed") {
    // CONSTANT: 64 samples all 77
    val const = Array.fill(64)(77)
    val cs = handStream(const) { bw =>
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1) // subframe: CONSTANT
      bw.put(77, 8)
    }
    assert(FlacCodec.decode(cs).samples.toSeq == const.toSeq)

    // FIXED order 2 over a quadratic-ish ramp: residuals are small and
    // Rice-code with param 2; one partition (order 0)
    val n = 32
    val samples = Array.tabulate(n)(i => 10 + i + (i * i) % 3)
    val cooked = samples.clone()
    // residual r(i) = s(i) - 2 s(i-1) + s(i-2)
    val resid = (2 until n).map(i =>
      cooked(i) - 2 * cooked(i - 1) + cooked(i - 2))
    val fs = handStream(samples) { bw =>
      bw.put(0, 1); bw.put(10, 6); bw.put(0, 1) // FIXED order 2
      bw.put(samples(0), 8); bw.put(samples(1), 8) // warmup
      bw.put(0, 2)  // residual method: 4-bit Rice
      bw.put(0, 4)  // partition order 0
      bw.put(2, 4)  // rice param 2
      resid.foreach { r =>
        val u = (r << 1) ^ (r >> 31) // zigzag
        val q = u >>> 2
        var i = 0
        while (i < q) { bw.put(0, 1); i += 1 }
        bw.put(1, 1)
        bw.put(u & 3, 2)
      }
    }
    assert(FlacCodec.decode(fs).samples.toSeq == samples.toSeq)

    // reserved subframe types refuse loudly, not misdecode
    val bad = handStream(const) { bw =>
      bw.put(0, 1); bw.put(2, 6); bw.put(0, 1); bw.put(0, 8) }
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bad))
    assert(e.getMessage.contains("reserved subframe"), e.getMessage)
  }

  test("metadata walk skips foreign blocks; 16-bit samples round-trip " +
      "with a multi-byte MD5") {
    // splice PADDING (type 1) + a VORBIS_COMMENT-shaped block (type 4)
    // between STREAMINFO and the frames: the walk must skip both and
    // still find the audio
    val data = "metadata walk fixture".getBytes("UTF-8")
    val flac = FlacCodec.encode(8000, data)
    val out = new java.io.ByteArrayOutputStream()
    out.write(flac, 0, 8)
    out.write(flac, 8, 34)
    val spliced = out.toByteArray
    spliced(4) = 0x00 // STREAMINFO no longer the last metadata block
    out.reset()
    out.write(spliced)
    out.write(0x01); out.write(0); out.write(0); out.write(4) // PADDING
    out.write(Array[Byte](0, 0, 0, 0))
    out.write(0x84); out.write(0); out.write(0); out.write(3) // last: type 4
    out.write("abc".getBytes("US-ASCII"))
    out.write(flac, 42, flac.length - 42)
    val f = FlacCodec.decode(out.toByteArray)
    assert(f.samples.toSeq == data.map(_.toInt).toSeq)

    // 16-bit mono VERBATIM frame, hand-built: samples beyond the 8-bit
    // domain (incl. negatives), MD5 over little-endian 2-byte samples
    val s16 = Array(1000, -2000, 31000, -32000, 0, 517, -1, 12345,
      -12345, 255, -256, 99, 7, -7, 2, -2)
    val bld = new java.io.ByteArrayOutputStream()
    bld.write("fLaC".getBytes("US-ASCII"))
    bld.write(0x80); bld.write(0); bld.write(0); bld.write(34)
    val si = new Array[Byte](34)
    si(0) = 0x10; si(2) = 0x10
    val packed = (8000L << 44) | (15L << 36) | s16.length.toLong
    (0 until 8).foreach(b => si(10 + b) = (packed >> (56 - 8 * b)).toByte)
    val raw = new Array[Byte](2 * s16.length)
    s16.indices.foreach { i =>
      raw(2 * i) = s16(i).toByte; raw(2 * i + 1) = (s16(i) >> 8).toByte }
    System.arraycopy(
      java.security.MessageDigest.getInstance("MD5").digest(raw), 0, si, 18, 16)
    bld.write(si)
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(0xff); hdr.write(0xf8); hdr.write(0x70)
    hdr.write(0x08) // mono, sample-size code 0b100 (16 bits)
    hdr.write(0)
    hdr.write((s16.length - 1) >> 8); hdr.write((s16.length - 1) & 0xff)
    val hb = hdr.toByteArray
    hdr.write(FlacCodec.crc8(hb, 0, hb.length))
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(hdr.toByteArray)
    val bw = new BitWriter
    bw.put(0, 1); bw.put(1, 6); bw.put(0, 1) // VERBATIM
    s16.foreach(v => bw.put(v & 0xffff, 16))
    frame.write(bw.bytes)
    val fb = frame.toByteArray
    val c16 = FlacCodec.crc16(fb, 0, fb.length)
    bld.write(fb); bld.write(c16 >> 8); bld.write(c16 & 0xff)
    val f16 = FlacCodec.decode(bld.toByteArray)
    assert(f16.bps == 16 && f16.samples.toSeq == s16.toSeq)
  }

  test("LPC subframes: quantized-coefficient prediction under the MD5 " +
      "referee") {
    // order-1 LPC with c0 = 2, shift = 1: prediction = s(i-1) exactly,
    // so residuals are first differences — decoded against the stream's
    // own MD5 signature
    val n = 24
    val samples = Array.tabulate(n)(i => 15 + 3 * i - (i % 5))
    val resid = (1 until n).map(i => samples(i) - samples(i - 1))
    val ls = handStream(samples) { bw =>
      bw.put(0, 1); bw.put(32, 6); bw.put(0, 1) // LPC order 1 (0b100000)
      bw.put(samples(0), 8)                     // warmup
      bw.put(3, 4)                              // coefficient precision 4
      bw.put(1, 5)                              // shift 1
      bw.put(2, 4)                              // c0 = 2
      bw.put(0, 2); bw.put(0, 4); bw.put(3, 4)  // rice4, porder 0, param 3
      resid.foreach { r =>
        val u = (r << 1) ^ (r >> 31)
        var i = 0
        while (i < (u >>> 3)) { bw.put(0, 1); i += 1 }
        bw.put(1, 1)
        bw.put(u & 7, 3)
      }
    }
    assert(FlacCodec.decode(ls).samples.toSeq == samples.toSeq)
    // negative shift is reserved — refuse
    val neg = handStream(samples) { bw =>
      bw.put(0, 1); bw.put(32, 6); bw.put(0, 1)
      bw.put(samples(0), 8); bw.put(3, 4); bw.put(0x1f, 5) // shift = -1
      bw.put(2, 4); bw.put(0, 2); bw.put(0, 4); bw.put(3, 4)
    }
    val e = intercept[IllegalArgumentException](FlacCodec.decode(neg))
    assert(e.getMessage.contains("shift"), e.getMessage)
  }

  test("randomized FIXED/Rice fuzz: random orders, partition orders, " +
      "parameter methods and escapes, every trial MD5-refereed") {
    val seed = System.nanoTime()
    info(s"fuzz seed: $seed")
    val rnd = new scala.util.Random(seed)
    def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)
    (1 to 30).foreach { trial =>
      // smooth-ish 8-bit signal so FIXED predictors leave small
      // residuals (the realistic shape; VERBATIM covers the rest)
      val total = 16 + rnd.nextInt(6) * 16 // multiple of 16 → clean porders
      val samples = new Array[Int](total)
      var v = rnd.nextInt(100) - 50
      samples.indices.foreach { i =>
        v = math.max(-120, math.min(120, v + rnd.nextInt(9) - 4))
        samples(i) = v
      }
      val order = rnd.nextInt(5)
      val coefs = Seq(Seq(), Seq(1), Seq(2, -1), Seq(3, -3, 1),
        Seq(4, -6, 4, -1))(order)
      val resid = (order until total).map(i =>
        samples(i) - coefs.zipWithIndex.map { case (c, j) =>
          c * samples(i - 1 - j) }.sum).toArray
      // partition order: random p with 2^p | total and first partition
      // still holding ≥ 0 residuals after the warmup
      val pMax = Integer.numberOfTrailingZeros(total)
      val pOrder = (0 to math.min(pMax, 3)).filter(p =>
        (total >> p) > order)(rnd.nextInt(
          (0 to math.min(pMax, 3)).count(p => (total >> p) > order)))
      val parts = 1 << pOrder
      val method = rnd.nextInt(2) // 4- or 5-bit rice parameters
      val pbits = if (method == 0) 4 else 5
      val escapeCode = (1 << pbits) - 1
      val stream = handStream(samples) { bw =>
        bw.put(0, 1); bw.put(8 + order, 6); bw.put(0, 1) // FIXED
        (0 until order).foreach(i => bw.put(samples(i) & 0xff, 8))
        bw.put(method, 2)
        bw.put(pOrder, 4)
        var idx = 0
        (0 until parts).foreach { p =>
          val count = (total >> pOrder) - (if (p == 0) order else 0)
          val rs = resid.slice(idx, idx + count)
          idx += count
          if (rnd.nextInt(5) == 0) {
            // escape partition: residuals raw as signed `raw`-bit ints
            val raw = math.max(1, rs.map(r =>
              bitLen(math.abs(r)) + 1).foldLeft(1)(math.max))
            bw.put(escapeCode, pbits)
            bw.put(raw, 5)
            rs.foreach(r => bw.put(r & ((1 << raw) - 1), raw))
          } else {
            val maxU = rs.map(r => (r << 1) ^ (r >> 31)).foldLeft(0)(math.max)
            val k = math.min(math.max(0, bitLen(maxU) - 4), escapeCode - 1)
            bw.put(k, pbits)
            rs.foreach { r =>
              val u = (r << 1) ^ (r >> 31)
              var q = u >>> k
              while (q > 0) { bw.put(0, 1); q -= 1 }
              bw.put(1, 1)
              if (k > 0) bw.put(u & ((1 << k) - 1), k)
            }
          }
        }
      }
      val got = FlacCodec.decode(stream).samples.toSeq
      assert(got == samples.toSeq,
        s"trial $trial (seed $seed, order $order, porder $pOrder, " +
          s"method $method) diverged")
    }
  }

  test("stereo decorrelation: left-side, right-side, mid-side (incl. " +
      "the side channel's extra bit and mid's parity restore)") {
    val m = 16
    val left = Array.tabulate(m)(i => 40 + 2 * i)
    // make left − right odd somewhere so mid-side exercises the
    // parity-restore path (mid drops the sum's low bit)
    val right = Array.tabulate(m)(i => 25 + i)
    val inter = Array.tabulate(2 * m)(i =>
      if (i % 2 == 0) left(i / 2) else right(i / 2))
    def verbatim(bw: BitWriter, xs: Array[Int], bits: Int): Unit = {
      bw.put(0, 1); bw.put(1, 6); bw.put(0, 1) // VERBATIM
      xs.foreach(v => bw.put(v & ((1 << bits) - 1), bits))
    }
    // left-side (chCode 8): ch1 = side = left − right, 9 bits
    val lsStream = handStream(inter, chCode = 8, channels = 2) { bw =>
      verbatim(bw, left, 8)
      verbatim(bw, left.zip(right).map { case (l, r) => l - r }, 9)
    }
    assert(FlacCodec.decode(lsStream).samples.toSeq == inter.toSeq)
    // right-side (chCode 9): ch0 = side (9 bits), ch1 = right
    val rsStream = handStream(inter, chCode = 9, channels = 2) { bw =>
      verbatim(bw, left.zip(right).map { case (l, r) => l - r }, 9)
      verbatim(bw, right, 8)
    }
    assert(FlacCodec.decode(rsStream).samples.toSeq == inter.toSeq)
    // mid-side (chCode 10): ch0 = (l+r)>>1 (8 bits), ch1 = side (9)
    val msStream = handStream(inter, chCode = 10, channels = 2) { bw =>
      verbatim(bw, left.zip(right).map { case (l, r) => (l + r) >> 1 }, 8)
      verbatim(bw, left.zip(right).map { case (l, r) => l - r }, 9)
    }
    assert(FlacCodec.decode(msStream).samples.toSeq == inter.toSeq)
    // independent stereo (chCode 1) still round-trips
    val indStream = handStream(inter, chCode = 1, channels = 2) { bw =>
      verbatim(bw, left, 8)
      verbatim(bw, right, 8)
    }
    assert(FlacCodec.decode(indStream).samples.toSeq == inter.toSeq)
  }
}
