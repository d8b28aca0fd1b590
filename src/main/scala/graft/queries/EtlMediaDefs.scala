package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Multimodal queries: mixed-container decode, frame sampling,
  * and the corrupt-asset quarantine.
  *
  * One slice of [[EtlQueries.defs]] — the registry, fixtures, memo
  * machinery and shared helpers all live on [[EtlQueries]]; this trait
  * only contributes its family's `QueryDef` entries (split per the
  * round-16 review: one 4.3k-line file hides boundary bugs). */
private[queries] trait EtlMediaDefs { this: EtlQueries.type =>

  private[queries] lazy val mediaDefs: Map[String, QueryDef] = Map(

    // ---- Multimodal ---------------------------------------------------

    // Audio frame sampling over the mixed-media column: every 2nd
    // 64-byte PCM frame's unsigned-byte energy, via the REAL RIFF
    // chunk walk ([[graft.etl.Multimodal.frameEnergies]]). The oracle
    // recomputes from the source text (the WAV data region IS the
    // UTF-8 text bytes — ASCII corpus, so ord() = the byte) — the
    // decode path is proven against an independent byte model.
    "q_media_frames" -> QueryDef(
      s"""WITH a AS (
         |  SELECT doc_id, text, length(text) AS n FROM documents
         |  WHERE doc_id % 4 = 0),
         |pos AS (
         |  SELECT doc_id, (p - 1) // 64 AS frame,
         |    ord(substr(text, CAST(p AS INTEGER), 1)) AS b
         |  FROM (SELECT doc_id, text,
         |          unnest(generate_series(1, n)) AS p FROM a))
         |SELECT doc_id AS asset_id, CAST(frame AS BIGINT) AS frame,
         |  CAST(COUNT(*) AS BIGINT) AS n_bytes, CAST(SUM(b) AS BIGINT) AS energy
         |FROM pos WHERE frame % 2 = 0
         |GROUP BY doc_id, frame ORDER BY asset_id, frame""".stripMargin) { (s, dir) =>
      graft.etl.Multimodal.frameEnergies(
          graft.etl.Multimodal.assetsFromDocuments(docs(s, dir)),
          frameLen = 64, sampleEvery = 2)
        .toDF("asset_id", "frame", "n_bytes", "energy")
        .orderBy("asset_id", "frame")
    },

    // Mixed multi-format decode (WAV / PNG / JPEG / BMP by doc_id % 4,
    // with audio residues 20 (VERBATIM), 12 (FIXED order-0 + Rice
    // residual) and 28 (LPC order-1: quantized-coefficient prediction
    // + Rice deltas) mod 32 shipping FLAC — all three subframe decode
    // paths under the hash gate — and raster residue 3 mod 32 shipping
    // GIF — 9-bit-literal LZW, closed-form size per
    // GifCodec.encodedSize, decoded indices = the text bytes;
    // the JPEG class splits % 16 into BASELINE GRAYSCALE (2),
    // PROGRESSIVE grayscale (10 — a real SOF2 multi-scan frame: DC
    // scan + EOB-run AC scan, decoded by accumulating coefficients
    // across scans) and COLOR 3-component YCbCr 4:4:4 (6, 14)
    // containers), each a REAL container walk — PNG a real zlib
    // inflate + the five-filter unfilter pass, JPEG a real entropy
    // decode (Huffman + restart resync + dequant + IDCT, fixed-point
    // YCbCr→RGB on the color branch). The oracle recomputes every
    // field arithmetically from the known layouts:
    //   n_bytes — WAV 44+n; BMP 1078 (headers + 256-entry grayscale
    //     palette) + hb rows at the 4-byte-aligned stride (the
    //     CONFORMANT container shape: bottom-up padded rows, which is
    //     why the oracle checksum is over DECODED top-down pixels);
    //     PNG 57 + zlen with
    //     zlen = 6 + 5·ceil(raw/65535) + raw, raw = h·(w+1) (stored
    //     deflate blocks are byte-deterministic, which is why the
    //     encoder writes them — the decoder inflates ANY valid zlib);
    //     PROGRESSIVE JPEG 185 const + per-block DC cost (1 byte when
    //     ord%16 in 5..11 — no EOB nibble in a DC scan — else 2) +
    //     ceil(blocks/31) one-byte EOB-run chunks (the whole AC band
    //     is zero; Multimodal.JpegCodec.SizeProgConst pins the
    //     constant);
    //     JPEG 316 header + per-block byte-aligned DC-only codes
    //     (restart interval 1): 1 byte for a zero diff (text byte
    //     % 16 = 8), 2 otherwise, + 2·(blocks−1) restart markers
    //     + 2 EOI ⟹ 316 + 4·blocks − |{i ≤ n : ord%16 = 8}|;
    //   checksum — the first 32 bytes of the DECODED content region:
    //     the document's utf-8 bytes for WAV/PNG/BMP (ASCII corpus, so
    //     ord() = the byte), and for JPEG the first 32 PIXELS — each
    //     8×8 block constant at gray 120 + byte%16, so the sum is
    //     arithmetic over the first four block columns. The oracle
    //     derives all of it from the source text having never seen a
    //     container, so a hash match proves each decode path — incl.
    //     the DCT round-trip — end to end;
    //   dims — BMP (w, ceil(n/w)); PNG (w, ceil(n/w)); JPEG pixel dims
    //     (8w, 8·ceil(n/w)); WAV (1, n).
    "q_multimodal" -> QueryDef(
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents),
         |d AS (
         |  -- GREATEST(1, …) mirrors the adapter's height clamp: an
         |  -- EMPTY document still encodes as a valid 1×1-block image
         |  -- (ceil(0/w) = 0 is not a legal height)
         |  SELECT doc_id, text, n, 1 + n % 64 AS w,
         |         GREATEST(1, (n + (1 + n % 64) - 1) // (1 + n % 64))
         |           AS hp FROM b),
         |cs AS (
         |  SELECT doc_id,
         |    SUM(ord(substr(text, CAST(p AS INTEGER), 1))) AS checksum
         |  FROM d, generate_series(1, 32) s(p) WHERE p <= n
         |  GROUP BY doc_id),
         |j8 AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN ord(substr(text, CAST(p AS INTEGER), 1))
         |      % 16 = 8 THEN 1 ELSE 0 END) AS cnt8
         |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS p
         |        FROM d) t
         |  GROUP BY doc_id),
         |jm AS (
         |  -- COLOR JPEG (doc_id % 8 = 6) byte cost: per-MCU 5 bytes
         |  -- when the luma diff category is small (ord%16 in 5..11,
         |  -- |d| <= 3) else 6 — chroma adds a fixed 28 bits/MCU
         |  SELECT doc_id,
         |    SUM(CASE WHEN ord(substr(text, CAST(p AS INTEGER), 1))
         |      % 16 BETWEEN 5 AND 11 THEN 1 ELSE 0 END) AS cntm
         |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS p
         |        FROM d) t
         |  GROUP BY doc_id),
         |jcs AS (
         |  SELECT d.doc_id,
         |    SUM(120 + CASE WHEN 1 + ((p - 1) % (8 * w)) // 8 <= n
         |      THEN ord(substr(text,
         |        CAST(1 + ((p - 1) % (8 * w)) // 8 AS INTEGER), 1)) % 16
         |      ELSE 0 END) AS checksum
         |  FROM d, generate_series(1, 32) s(p)
         |  GROUP BY d.doc_id),
         |gz AS (
         |  -- GIF (raster residue 3): 9-bit literal LZW data bytes —
         |  -- codes = npx + 2 + (npx-1)//254 (initial CLEAR, a CLEAR
         |  -- every 254 literals, EOI), z = ceil(9*codes/8)
         |  SELECT doc_id,
         |    (9 * (w * hp + 2 + (w * hp - 1) // 254) + 7) // 8 AS zg
         |  FROM d WHERE doc_id % 32 = 3),
         |c6 AS (
         |  -- Rice FLAC (audio residue 12): the order-0 residual's
         |  -- unary quotient is 1 bit for bytes >= 64, 0 below (param
         |  -- 7); per 4096-sample FRAME (matching the encoder's block
         |  -- walk, not assuming one frame): 8 header + 2 CRC +
         |  -- ceil((18 prologue bits + 8·cnt + c64)/8)
         |  SELECT doc_id,
         |    SUM(10 + (25 + 8 * cnt + c64) // 8) AS rice_bytes
         |  FROM (
         |    SELECT doc_id, (p - 1) // 4096 AS f,
         |      COUNT(*) AS cnt,
         |      SUM(CASE WHEN ord(substr(text, CAST(p AS INTEGER), 1))
         |        >= 64 THEN 1 ELSE 0 END) AS c64
         |    FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS p
         |          FROM d) t
         |    GROUP BY doc_id, (p - 1) // 4096) g
         |  GROUP BY doc_id),
         |lz AS (
         |  -- LPC FLAC (audio residue 28): the order-1 residual is the
         |  -- adjacent-char delta; zigzag(d)//16 is the per-delta extra
         |  -- unary cost at Rice param 4. Per 4096-sample FRAME: each
         |  -- block's first sample is the verbatim warmup (no delta),
         |  -- so 37 fixed bits + 5·(cnt−1) + the block's zigzag excess
         |  SELECT doc_id,
         |    SUM(10 + (37 + 5 * (cnt - 1) + cz + 7) // 8) AS lpc_bytes
         |  FROM (
         |    SELECT doc_id, (p - 1) // 4096 AS f, COUNT(*) AS cnt,
         |      SUM(CASE WHEN (p - 1) % 4096 = 0 THEN 0
         |        WHEN dd >= 0 THEN (2 * dd) // 16
         |        ELSE (-2 * dd - 1) // 16 END) AS cz
         |    FROM (SELECT doc_id, p,
         |            ord(substr(text, CAST(p AS INTEGER), 1)) -
         |            CASE WHEN p > 1 THEN
         |              ord(substr(text, CAST(p - 1 AS INTEGER), 1))
         |            ELSE 0 END AS dd
         |          FROM (SELECT doc_id, text,
         |                  unnest(generate_series(1, n)) AS p FROM d) t) t2
         |    GROUP BY doc_id, (p - 1) // 4096) g
         |  GROUP BY doc_id),
         |jcsc AS (
         |  -- color checksum: first 32 INTERLEAVED RGB bytes — byte j
         |  -- is channel (j-1)%3 of pixel 1+(j-1)//3, and the chroma
         |  -- constants (132, 124) land fixed RGB offsets (-6, +1, +7)
         |  -- on the block's luma with no clamping in the ±8 domain
         |  SELECT d.doc_id,
         |    SUM(120 + CASE WHEN 1 + (((j - 1) // 3) % (8 * w)) // 8 <= n
         |      THEN ord(substr(text,
         |        CAST(1 + (((j - 1) // 3) % (8 * w)) // 8 AS INTEGER), 1)) % 16
         |      ELSE 0 END
         |      + CASE (j - 1) % 3 WHEN 0 THEN -6 WHEN 1 THEN 1
         |        ELSE 7 END) AS checksum
         |  FROM d, generate_series(1, 32) s(j)
         |  GROUP BY d.doc_id)
         |SELECT d.doc_id AS asset_id,
         |  CASE WHEN d.doc_id % 32 IN (12, 20, 28) THEN 'audio/flac'
         |       WHEN d.doc_id % 32 = 3 THEN 'image/gif'
         |       WHEN d.doc_id % 4 = 0 THEN 'audio/wav'
         |       WHEN d.doc_id % 4 = 1 THEN 'image/png'
         |       WHEN d.doc_id % 4 = 2 THEN 'image/jpeg'
         |       ELSE 'image/bmp' END AS kind,
         |  -- FLAC (audio residue 20): 42-byte stream head + 11 bytes
         |  -- per frame (sync/codes/number/blocksize/CRC8 + VERBATIM
         |  -- subframe header + CRC16) + the samples themselves —
         |  -- FlacCodec's closed form, ceil(n/4096) frames
         |  CAST(CASE WHEN d.doc_id % 32 = 20
         |         THEN 42 + 11 * ((n + 4095) // 4096) + n
         |       -- Rice / LPC FLAC: 42 stream head + the per-frame sums
         |       -- (empty docs have no frames — COALESCE to the bare head)
         |       WHEN d.doc_id % 32 = 12
         |         THEN 42 + COALESCE(c6.rice_bytes, 0)
         |       WHEN d.doc_id % 32 = 28
         |         THEN 42 + COALESCE(lz.lpc_bytes, 0)
         |       WHEN d.doc_id % 4 = 0 THEN 44 + n
         |       WHEN d.doc_id % 4 = 1 THEN 57 + 6
         |         + 5 * ((hp * (w + 1) + 65534) // 65535) + hp * (w + 1)
         |       -- progressive gray: no EOB nibble in a DC scan, so a
         |       -- block is ONE byte whenever ord%16 in 5..11 (the same
         |       -- cntm the color branch counts), plus the EOB-run bytes
         |       WHEN d.doc_id % 16 = 10 THEN 185 + 4 * w * hp
         |         - COALESCE(jm.cntm, 0) + (w * hp + 30) // 31
         |       WHEN d.doc_id % 8 = 2 THEN 316 + 4 * w * hp
         |         - COALESCE(j8.cnt8, 0)
         |       WHEN d.doc_id % 8 = 6 THEN 326 + 8 * w * hp
         |         - COALESCE(jm.cntm, 0)
         |       -- GIF: 13 header + 768 GCT + 10 descriptor + 1 min-code
         |       -- + z data + ceil(z/255) sub-block lengths + 2
         |       WHEN d.doc_id % 32 = 3 THEN 794 + gz.zg + (gz.zg + 254) // 255
         |       ELSE 1078 + hp *
         |         ((((1 + n % 64) + 3) // 4) * 4) END AS BIGINT) AS n_bytes,
         |  -- LEFT joins + COALESCE: an empty doc has no byte rows but
         |  -- is still a corpus asset (checksum of no content = 0)
         |  CAST(CASE WHEN d.doc_id % 8 = 2 THEN jcs.checksum
         |       WHEN d.doc_id % 8 = 6 THEN jcsc.checksum
         |       ELSE COALESCE(cs.checksum, 0) END AS BIGINT) AS checksum,
         |  CAST(CASE WHEN d.doc_id % 4 = 0 THEN 1
         |       WHEN d.doc_id % 4 = 2 THEN 8 * w
         |       ELSE w END AS INTEGER) AS width,
         |  CAST(CASE WHEN d.doc_id % 4 = 0 THEN n
         |       WHEN d.doc_id % 4 = 1 THEN hp
         |       WHEN d.doc_id % 4 = 2 THEN 8 * hp
         |       ELSE hp END AS INTEGER) AS height
         |FROM d LEFT JOIN cs ON cs.doc_id = d.doc_id
         |       LEFT JOIN j8 ON j8.doc_id = d.doc_id
         |       LEFT JOIN jm ON jm.doc_id = d.doc_id
         |       LEFT JOIN jcs ON jcs.doc_id = d.doc_id
         |       LEFT JOIN jcsc ON jcsc.doc_id = d.doc_id
         |       LEFT JOIN c6 ON c6.doc_id = d.doc_id
         |       LEFT JOIN lz ON lz.doc_id = d.doc_id
         |       LEFT JOIN gz ON gz.doc_id = d.doc_id
         |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.etl.Multimodal.features(s, dir).drop("feature")
    },

    // FORMAT-INVARIANT media dedup: the same audio content shipped as
    // WAV by one crawl and FLAC by another is ONE asset, and no
    // byte-level dedup can see that — the canonical key must be the
    // DECODED sample stream. Every audio container decodes to PCM
    // (RIFF data walk / full FLAC frame decode) and groups by the
    // MD5 of that stream; the group row CARRIES the digest. The
    // oracle computes md5(text) — decoded PCM == the UTF-8 text bytes
    // for both lossless codecs — so the hash gate pins EVERY DECODED
    // BYTE of every audio asset (q_multimodal's checksum covers only
    // the first 32) across both container formats in one grouping.
    // Singleton groups are kept deliberately: the fixture corpus has
    // no exact-duplicate texts at small SFs, and an output filtered
    // to dup groups would hash-match while verifying nothing.
    "q_media_dup" -> QueryDef(
      s"""SELECT md5(text) AS digest, MIN(doc_id) AS rep_asset,
         |  CAST(COUNT(*) AS BIGINT) AS n_assets,
         |  CAST(COUNT(DISTINCT doc_id % 32 IN (12, 20, 28)) AS BIGINT)
         |    AS n_formats
         |FROM documents WHERE doc_id % 4 = 0
         |GROUP BY text
         |ORDER BY rep_asset""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.etl.Multimodal.assetsFromDocuments(docs(s, dir))
        .filter((a: graft.etl.Multimodal.Asset) =>
          a.kind == "audio/wav" || a.kind == "audio/flac")
        .mapPartitions { it =>
          // one digest instance per partition (the repo idiom), reset
          // per row — not one allocation per row inside a .map
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { a =>
            val pcm = a.kind match {
              case "audio/wav" =>
                val w = graft.etl.Multimodal.WavCodec.decode(a.payload)
                java.util.Arrays.copyOfRange(a.payload, w.dataOffset,
                  w.dataOffset + w.dataLength)
              case _ =>
                graft.etl.FlacCodec.decode(a.payload).samples.map(_.toByte)
            }
            md.reset()
            (a.asset_id,
              String.format("%032x", new java.math.BigInteger(1,
                md.digest(pcm))),
              if (a.kind == "audio/flac") 1 else 0)
          }
        }
        .toDF("asset_id", "digest", "is_flac")
        .groupBy("digest")
        .agg(min("asset_id").as("rep_asset"),
          count(lit(1)).as("n_assets"),
          countDistinct("is_flac").as("n_formats"))
        .select("digest", "rep_asset", "n_assets", "n_formats")
        .orderBy("rep_asset")
    },

    // FORMAT-INVARIANT raster dedup — the image counterpart of
    // q_media_dup: the same content shipped as PNG by one crawl, BMP
    // by another and GIF by a third is ONE asset, visible only to a
    // DECODED-content key. All three lossless raster codecs normalize
    // to the identical byte grid (text bytes zero-padded to w·hp: PNG
    // and GIF pad at encode, BMP's decodePixels zero-fills declared
    // dims), so grouping by the decoded digest reproduces grouping by
    // source text exactly — which is what the oracle does, having
    // never seen a container. The digest itself is NOT in the output
    // (padding makes it md5(text||zeros), which DuckDB can't build —
    // VARCHARs can't carry NULs); group equality is proven through
    // rep/count/kind-count instead. JPEG is excluded by construction:
    // its decoded grid is the DCT-quantized gray field, a different
    // content class.
    "q_media_dup_raster" -> QueryDef(
      s"""SELECT MIN(doc_id) AS rep_asset,
         |  CAST(COUNT(*) AS BIGINT) AS n_assets,
         |  CAST(COUNT(DISTINCT CASE WHEN doc_id % 32 = 3 THEN 'gif'
         |    WHEN doc_id % 4 = 1 THEN 'png' ELSE 'bmp' END)
         |    AS BIGINT) AS n_kinds
         |FROM documents WHERE doc_id % 4 IN (1, 3)
         |GROUP BY text
         |ORDER BY rep_asset""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.etl.Multimodal.assetsFromDocuments(docs(s, dir))
        .filter((a: graft.etl.Multimodal.Asset) => a.kind == "image/png" ||
          a.kind == "image/bmp" || a.kind == "image/gif")
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { a =>
            val content = a.kind match {
              case "image/png" =>
                graft.etl.Multimodal.PngCodec.decode(a.payload)._3
              case "image/bmp" =>
                graft.etl.Multimodal.BmpCodec.decodePixels(a.payload)._3
              case _ => graft.etl.GifCodec.decode(a.payload)._3
            }
            md.reset()
            (a.asset_id,
              String.format("%032x", new java.math.BigInteger(1,
                md.digest(content))), a.kind)
          }
        }
        .toDF("asset_id", "digest", "kind")
        .groupBy("digest")
        .agg(min("asset_id").as("rep_asset"),
          count(lit(1)).as("n_assets"),
          countDistinct("kind").as("n_kinds"))
        .select("rep_asset", "n_assets", "n_kinds")
        .orderBy("rep_asset")
    },

    // DC-grid THUMBNAILS: every JPEG-class container (baseline gray,
    // progressive, color YCbCr) through decodeDcScaled — one pixel per
    // 8×8 block, no full pixel planes. The oracle recomputes dims and
    // the first-32-byte checksum arithmetically: at 1/8 scale pixel p
    // IS block p, whose value is 120 + ord(text[p]) % 16 (pad blocks
    // 120); color thumbs interleave RGB with the fixed chroma offsets
    // (−6, +1, +7). This is the ORACLE gate for the bounded-memory
    // oversize path — the same decode the specs prove pixel-exact on
    // 2^27-px frames.
    "q_media_thumbs" -> QueryDef(
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents WHERE doc_id % 4 = 2),
         |d AS (
         |  SELECT doc_id, text, n, 1 + n % 64 AS w,
         |    GREATEST(1, (n + (1 + n % 64) - 1) // (1 + n % 64)) AS hp
         |  FROM b),
         |g AS (
         |  SELECT d.doc_id,
         |    SUM(120 + CASE WHEN p <= n
         |      THEN ord(substr(text, CAST(p AS INTEGER), 1)) % 16
         |      ELSE 0 END) AS checksum
         |  FROM d, generate_series(1, 32) s(p)
         |  WHERE d.doc_id % 8 != 6 AND p <= w * hp
         |  GROUP BY d.doc_id),
         |c AS (
         |  SELECT d.doc_id,
         |    SUM(120 + CASE WHEN 1 + (j - 1) // 3 <= n
         |      THEN ord(substr(text,
         |        CAST(1 + (j - 1) // 3 AS INTEGER), 1)) % 16
         |      ELSE 0 END
         |      + CASE (j - 1) % 3 WHEN 0 THEN -6 WHEN 1 THEN 1
         |        ELSE 7 END) AS checksum
         |  FROM d, generate_series(1, 32) s(j)
         |  WHERE d.doc_id % 8 = 6 AND j <= 3 * w * hp
         |  GROUP BY d.doc_id)
         |SELECT d.doc_id AS asset_id, CAST(w AS INTEGER) AS width,
         |  CAST(hp AS INTEGER) AS height,
         |  CAST(COALESCE(g.checksum, c.checksum) AS BIGINT) AS checksum
         |FROM d LEFT JOIN g ON g.doc_id = d.doc_id
         |       LEFT JOIN c ON c.doc_id = d.doc_id
         |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.etl.Multimodal.dcThumbnails(
          graft.etl.Multimodal.assetsFromDocuments(docs(s, dir)))
        .toDF()
        .select(col("asset_id"), col("width"), col("height"),
          col("checksum"))
        .orderBy("asset_id")
    },

    // TAG/METADATA-INVARIANT container dedup — the oracle gate for the
    // container-codec tier (MP3 framing, Ogg pagination + CRC-32, WebP
    // RIFF walk, MP4 box walk, ICO directory, TIFF IFD walk). Every
    // document ships as TWO containers of the same content that differ
    // exactly the way two independent crawls do — re-tagged (ID3v2/
    // ID3v1), re-paginated (different Ogg page sizes/serials/granules),
    // metadata-appended (EXIF/XMP), box-shuffled (free/udta atoms, moov
    // after mdat), re-typed (icon vs hotspot cursor), or re-exported
    // (byte order + striping + Software tag) — and the query groups by
    // the kind-specific CONTENT identity digest. The oracle groups by
    // source text with every container size recomputed closed-form
    // (the builders' Scaladoc), so a hash match proves all six walks
    // strip exactly the metadata and nothing else:
    // n_variants counts both variants into one group (a walk leaking
    // metadata into the identity splits the group), n_content pins the
    // identity's byte length, sum_bytes pins every encoder's framing
    // arithmetic, and sum_meta pins every walk's DECODED-METADATA
    // arithmetic (MP3 samples-per-frame duration, Ogg page counts, MP4
    // mvhd timescale division, and the WebP/ICO/TIFF dim-field decodes
    // — 14-bit LSB, big-endian IHDR, either-endian tags).
    "q_media_dup_tagged" -> QueryDef(
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents),
         |v AS (
         |  SELECT doc_id, text, n,
         |    1 + n % 64 AS w,
         |    GREATEST(1, (n + (1 + n % 64) - 1) // (1 + n % 64)) AS hp,
         |    CASE CAST(doc_id % 8 AS INTEGER)
         |      WHEN 0 THEN 'audio/mpeg' WHEN 6 THEN 'audio/mpeg'
         |      WHEN 1 THEN 'audio/ogg' WHEN 7 THEN 'audio/ogg'
         |      WHEN 2 THEN 'image/webp' WHEN 3 THEN 'video/mp4'
         |      WHEN 4 THEN 'image/x-icon' ELSE 'image/tiff' END AS kind,
         |    GREATEST(1, (n + 412) // 413) AS fr,
         |    GREATEST(1, (n + 4095) // 4096) AS p1,
         |    GREATEST(1, (n + 99) // 100) AS p2
         |  FROM b),
         |v2 AS (
         |  -- the corpus PNG's closed-form size (q_multimodal's formula):
         |  -- 57 container + zlib(6 + 5·ceil(raw/65535) + raw), raw=hp·(w+1)
         |  SELECT *, 63 + 5 * ((hp * (w + 1) + 65534) // 65535)
         |    + hp * (w + 1) AS png FROM v),
         |s AS (
         |  SELECT doc_id, text, kind,
         |    CAST(CASE kind
         |      WHEN 'audio/mpeg' THEN 417 * fr
         |      WHEN 'image/webp' THEN 5 + n
         |      WHEN 'image/x-icon' THEN png
         |      ELSE n END AS BIGINT) AS n_content,
         |    CAST(CASE kind
         |      -- MP3: bare 417·fr; tagged adds ID3v2 64 + ID3v1 128
         |      WHEN 'audio/mpeg' THEN 834 * fr + 192
         |      -- Ogg: bare 4096-byte pages (17 lacing bytes full, tail
         |      -- ⌊r/255⌋+1); repag 100-byte pages (1 lacing byte each)
         |      WHEN 'audio/ogg' THEN 2 * n + 27 * p1 + 17 * (p1 - 1)
         |        + (n - 4096 * (p1 - 1)) // 255 + 1 + 28 * p2
         |      -- WebP: bare 12 RIFF + 8 + (5+n) + odd pad; tagged adds
         |      -- EXIF 8+24 and XMP 8+31+1 pad = 72
         |      WHEN 'image/webp' THEN 2 * (25 + n + CASE WHEN n % 2 = 0
         |        THEN 1 ELSE 0 END) + 72
         |      -- MP4: bare 60+n; tagged 124+n (free 24 + udta 40)
         |      WHEN 'video/mp4' THEN 184 + 2 * n
         |      -- ICO: icon and cursor directories are SIZE-identical
         |      -- (6 + 16 + png), differing only in type/hotspot fields
         |      WHEN 'image/x-icon' THEN 44 + 2 * png
         |      -- TIFF: LE single-strip 98+n; BE two-strip + Software
         |      -- tag 139+n (8 entries + 16 strip-array + 13 sw bytes)
         |      ELSE 237 + 2 * n END AS BIGINT) AS sum_bytes,
         |    CAST(CASE kind
         |      -- MP3: 1152 samples/frame at 44100 Hz, floor-divided ms
         |      WHEN 'audio/mpeg' THEN 2 * ((1152 * fr * 1000) // 44100)
         |      -- Ogg: bare + repag page counts
         |      WHEN 'audio/ogg' THEN p1 + p2
         |      -- WebP: canvas w·h (height clamped to the 14-bit domain)
         |      WHEN 'image/webp' THEN 2 * w * LEAST(16384, hp)
         |      -- MP4: mvhd duration at timescale 1000 = n ms
         |      WHEN 'video/mp4' THEN 2 * n
         |      -- ICO: the PNG entry's IHDR dims; TIFF: the dims tags
         |      ELSE 2 * w * hp END AS BIGINT) AS sum_meta
         |  FROM v2)
         |SELECT kind, CAST(MIN(doc_id) * 2 AS BIGINT) AS rep_asset,
         |  CAST(2 * COUNT(*) AS BIGINT) AS n_variants,
         |  MIN(n_content) AS n_content,
         |  CAST(SUM(sum_bytes) AS BIGINT) AS sum_bytes,
         |  CAST(SUM(sum_meta) AS BIGINT) AS sum_meta
         |FROM s GROUP BY kind, text
         |ORDER BY rep_asset""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.etl.ContainerAssets.taggedAssetsFromDocuments(docs(s, dir))
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { a =>
            val content =
              graft.etl.ContainerAssets.contentIdentity(a.kind, a.payload)
            md.reset()
            (a.asset_id, a.kind,
              String.format("%032x", new java.math.BigInteger(1,
                md.digest(content))),
              content.length.toLong, a.payload.length.toLong,
              graft.etl.ContainerAssets.decodedMeta(a.kind, a.payload))
          }
        }
        .toDF("asset_id", "kind", "digest", "n_content", "n_bytes", "meta")
        .groupBy("kind", "digest")
        .agg(min("asset_id").as("rep_asset"),
          count(lit(1)).as("n_variants"),
          min("n_content").as("n_content"),
          sum("n_bytes").as("sum_bytes"),
          sum("meta").as("sum_meta"))
        .select("kind", "rep_asset", "n_variants", "n_content",
          "sum_bytes", "sum_meta")
        .orderBy("rep_asset")
    },

    // ANIMATED-GIF RENDERING under the full-hash oracle — the gate for
    // [[graft.etl.GifCodec.composeFrames]], the one decode surface that
    // was spec-only: every document ships as a deterministic 4-frame
    // GIF89a (ContainerAssets.animatedGifsFromDocuments) whose per-frame
    // COMPOSED CANVASES are closed-form in the text bytes, and the query
    // emits one row per (asset, frame) with a POSITION-WEIGHTED checksum
    // Σ (j+1)·byte_j over the full interleaved-RGB canvas. The weighting
    // is the point: frame 0 is stored INTERLACED, so a wrong de-interlace
    // permutes rows and breaks the sum (an unweighted sum would not see
    // it); transparency punch-through (frames 0 and 3), disposal 2
    // (restore-to-background after frame 1) and disposal 3 (restore-to-
    // previous after frame 2) each land a distinct canvas the oracle
    // recomputes per position — frame 3's canvas must equal frame 0's
    // EXACTLY, which fails if either disposal leaks. Scale shape: one
    // narrow map to build, one flatMap to render (per-row, partition-
    // local, 2^26-px canvas bound), no shuffle but the output sort.
    "q_media_gif_render" -> QueryDef(
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, text, n, 1 + n % 64 AS w,
         |    GREATEST(1, (n + (1 + n % 64) - 1) // (1 + n % 64)) AS hp,
         |    CASE WHEN n >= 1
         |      THEN 64 + ord(substr(text, CAST(n AS INTEGER), 1)) % 128
         |      ELSE 64 END AS v3
         |  FROM b),
         |pv AS (
         |  -- one row per canvas position; t = the text byte there (0 in
         |  -- the zero pad) — ASCII corpus, so ord() = the byte
         |  SELECT doc_id, p, npx, w, n, v3,
         |    CASE WHEN p <= n
         |      THEN ord(substr(text, CAST(p AS INTEGER), 1)) ELSE 0 END AS t
         |  FROM (SELECT doc_id, text, n, w, v3, w * hp AS npx,
         |          unnest(generate_series(1, w * hp)) AS p
         |        FROM d) u),
         |sums AS (
         |  -- per-pixel weight 9p-3 = the sum of the pixel's three
         |  -- 1-based interleaved-byte indexes (identity-gray, R=G=B)
         |  SELECT doc_id,
         |    -- frame 0: text grid, transparent pad shows background 7
         |    SUM((9 * p - 3) * (CASE WHEN p <= n THEN t ELSE 7 END))
         |      AS chk0,
         |    -- frame 1: top row overpainted with 255 - t (opaque pad 255)
         |    SUM((9 * p - 3) * (CASE WHEN p <= w THEN 255 - t
         |        WHEN p <= n THEN t ELSE 7 END)) AS chk1,
         |    -- frame 2: row restored to bg, corner pixel painted v3
         |    SUM((9 * p - 3) * (CASE WHEN p = npx THEN v3
         |        WHEN p <= w THEN 7
         |        WHEN p <= n THEN t ELSE 7 END)) AS chk2
         |  FROM pv GROUP BY doc_id)
         |SELECT d.doc_id AS asset_id, CAST(f.f AS BIGINT) AS frame,
         |  CAST(d.w AS INTEGER) AS width, CAST(d.hp AS INTEGER) AS height,
         |  -- frame 3 = frame 0 by construction (disposal 3 restored the
         |  -- corner, transparency left the restored-bg row's pad alone)
         |  CAST(CASE f.f WHEN 0 THEN s.chk0 WHEN 1 THEN s.chk1
         |       WHEN 2 THEN s.chk2 ELSE s.chk0 END AS BIGINT) AS checksum
         |FROM d JOIN sums s ON s.doc_id = d.doc_id,
         |  generate_series(0, 3) f(f)
         |ORDER BY asset_id, frame""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.etl.ContainerAssets.animatedGifsFromDocuments(docs(s, dir))
        .flatMap { a =>
          val (sw, sh, canvases) =
            graft.etl.GifCodec.composeFrames(a.payload)
          canvases.iterator.zipWithIndex.map { case (cv, i) =>
            var j = 0
            var chk = 0L
            while (j < cv.length) {
              chk += (j + 1).toLong * (cv(j) & 0xff)
              j += 1
            }
            (a.asset_id, i.toLong, sw, sh, chk)
          }
        }
        .toDF("asset_id", "frame", "width", "height", "checksum")
        .orderBy("asset_id", "frame")
    },

    // Corrupt-asset QUARANTINE over the mixed-media column: a
    // deterministic subset of containers arrives broken (truncated to
    // 10 bytes mid-header — one residue per codec class, doc_id % 32
    // ∈ {4 WAV, 9 PNG, 18 JPEG, 27 BMP}) or oversized (% 32 = 26: a
    // 15-byte JPEG declaring 2^27 px, past the full decoder's 2^26
    // allocation bound). [[graft.etl.Multimodal.decodeAll]] must
    // SURVIVE the whole corpus — at crawl scale one truncated JPEG
    // must not kill the job through stage retries — and emit exactly
    // one tagged reject row per broken container, never a silent
    // skip. The hash gate proves both directions at once: a codec
    // that falsely rejects a clean container adds a row; weak
    // validation that "decodes" a truncated one loses a row.
    "q_multimodal_rejects" -> QueryDef(
      s"""SELECT doc_id AS asset_id,
         |  CASE WHEN doc_id % 4 = 0 THEN 'audio/wav'
         |       WHEN doc_id % 4 = 1 THEN 'image/png'
         |       WHEN doc_id % 4 = 2 THEN 'image/jpeg'
         |       ELSE 'image/bmp' END AS kind,
         |  CAST(CASE WHEN doc_id % 32 = 26 THEN 15 ELSE 10 END
         |    AS BIGINT) AS n_bytes,
         |  CASE WHEN doc_id % 32 = 26 THEN 'oversize'
         |       ELSE 'decode-error' END AS error_class
         |FROM documents
         |WHERE doc_id % 32 IN (4, 9, 18, 26, 27)
         |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.etl.Multimodal.decodeAll(
          graft.etl.Multimodal.assetsWithEdgeCases(docs(s, dir)))
        .toDF()
        .filter(!col("ok"))
        .select(col("asset_id"), col("kind"), col("n_bytes"),
          col("error_class"))
        .orderBy("asset_id")
    }
  )
}
