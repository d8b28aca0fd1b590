package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Fixture tier for the CONTAINER codecs ([[Mp3Codec]],
  * [[ContainerWalks]]): every document ships as TWO containers of the
  * SAME content whose metadata/pagination differ — exactly what two
  * independent crawls of one asset look like — so the tag/metadata-
  * invariant dedup identities get a full-hash oracle gate
  * (q_media_dup_tagged) instead of spec-only coverage.
  *
  * Kind by doc_id % 8, variants (asset_id = doc_id·2 + variant):
  *  - 0, 6 audio/mpeg: bare MP3 frame stream vs ID3v2(64 B) + frames +
  *    ID3v1(128 B) — identity = the frame stream
  *  - 1, 7 audio/ogg: 4096-byte pages (serial 7) vs 100-byte pages
  *    (serial 98765, different granules) — identity = the elementary
  *    stream
  *  - 2 image/webp: bare VP8L vs VP8L + EXIF(24 B) + XMP(31 B, odd →
  *    padded) — identity = the VP8L chunk payload
  *  - 3 video/mp4: ftyp+moov+mdat vs ftyp+free+mdat+moov(mvhd+udta) —
  *    identity = the mdat payload
  *  - 4 image/x-icon: icon vs cursor-with-hotspot directories around
  *    ONE entry, the corpus PNG (closed-form size) — identity = the
  *    PNG blob; the two containers are size-identical, differing only
  *    in the directory's type/hotspot metadata fields
  *  - 5 image/tiff: little-endian single-strip vs big-endian two-strip
  *    + Software tag ("scanner nine", 13 B with NUL) — identity = the
  *    concatenated strip bytes (byte order, striping and ASCII tags
  *    are all metadata)
  *
  * Every container size is CLOSED-FORM in the text byte length n (the
  * builders' Scaladoc), so the DuckDB oracle recomputes rep/count/
  * content-length/total-bytes per (kind, text) group having never seen
  * a container. Narrow generation — one flatMap, no shuffle; the 100 TB
  * shape is the downstream digest groupBy's (map-side combined, 16-byte
  * keys), same as q_media_dup. */
object ContainerAssets {
  import ContainerWalks.{IcoCodec, Mp4Codec, OggCodec, TiffCodec, WebpCodec}

  /** Ogg page bodies for the two variants. The tagged variant's 100 is
    * deliberately < 255 (single-lacing pages) and small enough that
    * real corpus texts re-paginate across SEVERAL pages. */
  val OggBareBody = 4096
  val OggRepagBody = 100

  private val exifBody: Array[Byte] =
    "camera-one-metadata-blob".getBytes("US-ASCII") // 24 B, even
  private val xmpBody: Array[Byte] =
    "<x:xmpmeta>crawl two</x:xmpmeta".getBytes("US-ASCII") // 31 B, odd
  require(exifBody.length == 24 && xmpBody.length == 31,
    "metadata chunk sizes are baked into the oracle's closed forms")

  def taggedAssetsFromDocuments(docs: DataFrame): Dataset[Multimodal.Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"),
        col("n_chars").cast("long"))
      .as[(Long, String, String, Long)]
      .flatMap { case (id, text, source, nChars) =>
        val bytes = text.getBytes("UTF-8")
        val w = 1 + bytes.length % 64
        val h = math.max(1, (bytes.length + w - 1) / w)
        val (kind, bare, tagged) = (id % 8) match {
          case 0 | 6 =>
            val frames = Mp3Codec.encodeFrames(bytes)
            ("audio/mpeg", frames,
              Mp3Codec.id3v2Tag(new Array[Byte](54)) ++ frames ++
                Mp3Codec.id3v1Tag("graft crawl two"))
          case 1 | 7 =>
            ("audio/ogg",
              OggCodec.encode(bytes, OggBareBody, serial = 7L),
              OggCodec.encode(bytes, OggRepagBody, serial = 98765L))
          case 2 =>
            // the declared dims are wrap metadata (the VP8L body is
            // opaque to the walk and dims are not in the oracle
            // output) — clamp into the 14-bit header domain so a text
            // past 16384 bytes at w=1 cannot throw in the executor
            val wh = math.min(0x4000, h)
            ("image/webp", WebpCodec.encodeLossless(w, wh, bytes),
              WebpCodec.encodeLossless(w, wh, bytes,
                Seq("EXIF" -> exifBody, "XMP " -> xmpBody)))
          case 3 =>
            ("video/mp4",
              Mp4Codec.encode(bytes, durationMs = bytes.length.toLong,
                tagged = false),
              Mp4Codec.encode(bytes, durationMs = bytes.length.toLong,
                tagged = true))
          case 4 =>
            val png = Multimodal.PngCodec.encode(w, h,
              java.util.Arrays.copyOf(bytes, w * h))
            ("image/x-icon",
              IcoCodec.build(Seq((w, h, png))),
              IcoCodec.build(Seq((w, h, png)), cursor = true, hotspot = 7))
          case _ =>
            ("image/tiff",
              TiffCodec.build(big = false, w, h, Seq(bytes)),
              TiffCodec.build(big = true, w, h,
                Seq(bytes.take(bytes.length / 2),
                  bytes.drop(bytes.length / 2)),
                software = "scanner nine"))
        }
        Seq(Multimodal.Asset(id * 2, kind, bare, source, nChars),
          Multimodal.Asset(id * 2 + 1, kind, tagged, source, nChars))
      }
  }

  /** One deterministic 4-frame animated GIF89a per document — the
    * render-tier fixture (q_media_gif_render) that puts
    * [[GifCodec.composeFrames]] under the full-hash oracle: every
    * composition rule gets a frame whose composed canvas is closed-form
    * in the text bytes t(1..n) (w = 1 + n%64, h = ⌈n/w⌉ clamped ≥ 1,
    * N = w·h, background index 7):
    *  - frame 0: full-screen, INTERLACED stream order, transparent
    *    index 0 — pixels are the text bytes, zero pad transparent, so
    *    canvas(p) = t(p) for p ≤ n and the background 7 elsewhere
    *    (pins de-interlace row placement AND transparency punch-through)
    *  - frame 1: top row, opaque, pixel x = 255 − t(x) (pad 255),
    *    disposal 2 — after emission the row restores to background
    *  - frame 2: 1×1 at the bottom-right corner, value
    *    64 + t(n) % 128, disposal 3 — restore-to-previous
    *  - frame 3: top row again, transparent index 255 — text bytes
    *    punch through, 255 pads leave the restored background, so the
    *    final canvas equals frame 0's exactly (pins disposal 2 AND 3:
    *    either leaking turns frame 3's canvas away from frame 0's).
    * Narrow generation — one map, no shuffle; the render itself is
    * per-row partition-local like every other decode. */
  def animatedGifsFromDocuments(docs: DataFrame): Dataset[Multimodal.Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"),
        col("n_chars").cast("long"))
      .as[(Long, String, String, Long)]
      .map { case (id, text, source, nChars) =>
        import GifCodec.AnimFrame
        val bytes = text.getBytes("UTF-8")
        val n = bytes.length
        val w = 1 + n % 64
        val h = math.max(1, (n + w - 1) / w)
        val full = java.util.Arrays.copyOf(bytes, w * h)
        val row1 = new Array[Byte](w)
        val row3 = new Array[Byte](w)
        var x = 0
        while (x < w) {
          row1(x) = (255 - (if (x < n) bytes(x) & 0xff else 0)).toByte
          row3(x) = if (x < n) bytes(x) else 0xff.toByte
          x += 1
        }
        val v3 = (64 + (if (n >= 1) (bytes(n - 1) & 0xff) % 128 else 0)).toByte
        Multimodal.Asset(id, "image/gif",
          GifCodec.encodeAnimated(w, h, bgIndex = 7, Seq(
            AnimFrame(0, 0, w, h, full, transparent = 0, interlaced = true),
            AnimFrame(0, 0, w, 1, row1, disposal = 2),
            AnimFrame(w - 1, h - 1, 1, 1, Array(v3), disposal = 3),
            AnimFrame(0, 0, w, 1, row3, transparent = 255))),
          source, nChars)
      }
  }

  /** The kind-specific metadata-invariant content identity — the byte
    * stream two crawls of the same media share. Throws on a malformed
    * container (quarantine upstream tags it per row). */
  def contentIdentity(kind: String, payload: Array[Byte]): Array[Byte] =
    kind match {
      case "audio/mpeg"   => Mp3Codec.frameStream(payload)
      case "audio/ogg"    => OggCodec.contentStream(payload)
      case "image/webp"   => WebpCodec.parse(payload).content
      case "video/mp4"    => Mp4Codec.parse(payload).content
      case "image/x-icon" => IcoCodec.parse(payload).content
      case "image/tiff"   => TiffCodec.parse(payload).content
      case other => throw new IllegalArgumentException(
        s"no container identity registered for kind '$other'")
    }

  /** The kind-specific DECODED-METADATA scalar — what the walk's field
    * arithmetic yields, so the oracle can pin it per container: MP3
    * duration in ms (samples-per-frame × frames / rate), Ogg page
    * count, MP4 mvhd duration in ms (timescale division), and
    * width·height for the raster walks (WebP 14-bit LSB fields, ICO
    * PNG-IHDR big-endian, TIFF tag values in either byte order). */
  def decodedMeta(kind: String, payload: Array[Byte]): Long =
    kind match {
      case "audio/mpeg"   => Mp3Codec.parse(payload).durationMs
      case "audio/ogg"    => OggCodec.parse(payload).size.toLong
      case "image/webp"   =>
        val i = WebpCodec.parse(payload); i.width.toLong * i.height
      case "video/mp4"    => Mp4Codec.parse(payload).durationMs
      case "image/x-icon" =>
        val i = IcoCodec.parse(payload); i.width.toLong * i.height
      case "image/tiff"   =>
        val i = TiffCodec.parse(payload); i.width.toLong * i.height
      case other => throw new IllegalArgumentException(
        s"no container metadata registered for kind '$other'")
    }
}
