package graft.wire

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.core.TimeConsts
import graft.engine.Btrdb

/** The BTrDB gRPC surface mapped onto the engine facade — one decode →
  * engine call → encode function per RPC of the public proto
  * (/root/reference/grpcinterface/btrdb.proto:5-24). Message layouts
  * (field numbers, wire types) are hand-derived from that proto; app-
  * level errors travel in the `stat` field with the reference's bte
  * codes (/root/reference/bte/errors.go: 401 NoSuchPoint, 404
  * NoSuchStream, 416 GenericError, 421 WrongArgs, 426
  * ResourceDepleted), while the gRPC status stays 0 — the reference
  * server's convention (stat is nil on success; any present stat is an
  * error to its clients).
  *
  * Server-streaming RPCs chunk their value lists at [[ChunkSize]] rows
  * per response message, the reference's streaming shape. Two RPCs are
  * intentionally stubbed with app-level errors, mirroring documented
  * divergences (SURVEY §2.A): FaultInject (424 — disabled, as on any
  * production reference node) and GenerateCSV's WINDOWS_QUERY variant
  * (421 — arbitrary-width windows are served by the Windows RPC; the
  * CSV export covers RAW and ALIGNED_WINDOWS).
  */
object BtrdbWire {

  val ChunkSize = 5000

  // ---- uuid bridging --------------------------------------------------
  // The proto carries 16-byte uuids; the engine keys streams by string.
  // 16-byte payloads map to canonical UUID text both ways; any other
  // length is bridged as UTF-8 (the engine accepts arbitrary ids).
  private[wire] def uuidStr(b: Array[Byte]): String =
    if (b.length == 16) {
      val bb = java.nio.ByteBuffer.wrap(b)
      new java.util.UUID(bb.getLong, bb.getLong).toString
    } else new String(b, UTF_8)

  private[wire] def uuidBytes(s: String): Array[Byte] =
    try {
      val u = java.util.UUID.fromString(s)
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
      bb.array()
    } catch { case _: IllegalArgumentException => s.getBytes(UTF_8) }

  private def statusMsg(code: Int, msg: String): PbWriter = {
    val st = new PbWriter
    st.uint32(1, code)
    st.string(2, msg)
    st
  }

  private def errorResponse(e: Throwable): Array[Byte] = {
    val code = e match {
      case _: graft.engine.ResourceExhaustedException => 426
      case _: java.util.NoSuchElementException => 404 // head() on no stream
      case _: IllegalArgumentException => 421
      case _ => 416
    }
    val w = new PbWriter
    w.message(1, statusMsg(code, Option(e.getMessage).getOrElse(e.toString)))
    w.toBytes
  }

  private def verOf(e: Btrdb, uuid: String): (Long, Long) = e.version(uuid)

  private def pin(vmaj: Long): Long =
    if (vmaj == 0L) TimeConsts.LatestGeneration else vmaj

  // ---- shared sub-messages -------------------------------------------

  private def rawPoint(time: Long, value: Double): PbWriter = {
    val p = new PbWriter
    p.sfixed64(1, time); p.double(2, value)
    p
  }

  private def statPoint(time: Long, min: Double, mean: Double, max: Double,
                        count: Long): PbWriter = {
    val p = new PbWriter
    p.sfixed64(1, time); p.double(2, min); p.double(3, mean)
    p.double(4, max); p.fixed64(5, count)
    p
  }

  private def keyValue(k: String, v: String): PbWriter = {
    val m = new PbWriter
    m.string(1, k); m.bytes(2, v.getBytes(UTF_8))
    m
  }

  private def descriptor(d: graft.engine.StreamDescInfo): PbWriter = {
    val m = new PbWriter
    m.bytes(1, uuidBytes(d.uuid))
    m.string(2, d.collection)
    d.tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      m.message(3, keyValue(k, v)) }
    d.annotations.toSeq.sortBy(_._1).foreach { case (k, v) =>
      m.message(4, keyValue(k, v)) }
    m.uint64(5, d.annotationVersion)
    m
  }

  /** Decode `repeated KeyValue` → Map. */
  private def kvMap(readers: Seq[PbReader]): Map[String, String] =
    readers.map { r =>
      var k = ""; var v = ""
      while (r.hasNext) r.readTag() match {
        case (1, _) => k = r.lenString()
        case (2, _) => v = new String(r.lenBytes(), UTF_8)
        case (_, w) => r.skip(w)
      }
      k -> v
    }.toMap

  /** Decode `repeated KeyOptValue` → key → Some(value) | None. */
  private def kovMap(readers: Seq[PbReader]): Map[String, Option[String]] =
    readers.map { r =>
      var k = ""; var v: Option[String] = None
      while (r.hasNext) r.readTag() match {
        case (1, _) => k = r.lenString()
        case (2, _) =>
          val ov = r.lenReader()
          var payload = "" // absent OptValue.value decodes as empty
          while (ov.hasNext) ov.readTag() match {
            case (1, _) => payload = new String(ov.lenBytes(), UTF_8)
            case (_, w) => ov.skip(w)
          }
          v = Some(payload)
        case (_, w) => r.skip(w)
      }
      k -> v
    }.toMap

  /** Version header shared by most responses (fields 2/3). */
  private def withVersion(w: PbWriter, maj: Long, minor: Long): PbWriter = {
    w.uint64(2, maj); w.uint64(3, minor)
    w
  }

  // ---- dispatch -------------------------------------------------------

  /** Handle one unary-or-server-streaming call: strip the gRPC message
    * prefix from `framedBody`, decode, run the engine, return the
    * encoded response message(s). Never throws — failures INCLUDING a
    * malformed/compressed request frame become a single response
    * carrying `stat` (a throw here would be swallowed by the worker
    * pool and the client's RPC would hang to its deadline). */
  def handle(e: Btrdb, method: String,
             framedBody: Array[Byte]): Seq[Array[Byte]] =
    try dispatch(e, method, firstMessage(framedBody))
    catch { case t: Throwable => Seq(errorResponse(t)) }

  /** Extract the first gRPC-framed message (clients of unary and
    * client-unary-streaming RPCs send exactly one): flag byte + u32
    * big-endian length + payload. */
  private def firstMessage(body: Array[Byte]): Array[Byte] = {
    if (body.length < 5) return Array.emptyByteArray
    require(body(0) == 0, "compressed gRPC messages unsupported")
    val len = ((body(1) & 0xff) << 24) | ((body(2) & 0xff) << 16) |
      ((body(3) & 0xff) << 8) | (body(4) & 0xff)
    require(len >= 0 && 5 + len <= body.length, "truncated gRPC message")
    java.util.Arrays.copyOfRange(body, 5, 5 + len)
  }

  private def dispatch(e: Btrdb, method: String,
                       body: Array[Byte]): Seq[Array[Byte]] = method match {

    case "RawValues" =>
      var uuid = ""; var start = 0L; var end = 0L; var vmaj = 0L
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => start = r.fixed64()
        case (3, _) => end = r.fixed64()
        case (4, _) => vmaj = r.varint()
        case (_, w) => r.skip(w)
      }
      val (maj, minor) = verOf(e, uuid)
      val rows = e.rawValues(uuid, start, end, pin(vmaj))
        .collect().map(x => (x.getLong(0), x.getDouble(1)))
      chunked(rows.toSeq, maj, minor)((w, p) => w.message(4, rawPoint(p._1, p._2)))

    case "AlignedWindows" =>
      var uuid = ""; var start = 0L; var end = 0L; var vmaj = 0L; var pw = 0
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => start = r.fixed64()
        case (3, _) => end = r.fixed64()
        case (4, _) => vmaj = r.varint()
        case (5, _) => pw = r.varint().toInt
        case (_, w) => r.skip(w)
      }
      val (maj, minor) = verOf(e, uuid)
      val rows = e.alignedWindows(uuid, start, end, pw, pin(vmaj))
        .select("wstart", "vmin", "vmean", "vmax", "cnt").collect()
        .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2),
          x.getDouble(3), x.getLong(4)))
      chunked(rows.toSeq, maj, minor)((w, p) =>
        w.message(4, statPoint(p._1, p._2, p._3, p._4, p._5)))

    case "Windows" =>
      var uuid = ""; var start = 0L; var end = 0L; var vmaj = 0L
      var width = 0L; var depth = 0
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => start = r.fixed64()
        case (3, _) => end = r.fixed64()
        case (4, _) => vmaj = r.varint()
        case (5, _) => width = r.varint()
        case (6, _) => depth = r.varint().toInt
        case (_, w) => r.skip(w)
      }
      val (maj, minor) = verOf(e, uuid)
      val rows = e.windows(uuid, start, end, width, pin(vmaj), depth)
        .select("wstart", "vmin", "vmean", "vmax", "cnt").collect()
        .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2),
          x.getDouble(3), x.getLong(4)))
      chunked(rows.toSeq, maj, minor)((w, p) =>
        w.message(4, statPoint(p._1, p._2, p._3, p._4, p._5)))

    case "StreamInfo" =>
      var uuid = ""; var omitVersion = false; var omitDescriptor = false
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => omitVersion = r.varint() != 0
        case (3, _) => omitDescriptor = r.varint() != 0
        case (_, w) => r.skip(w)
      }
      val (desc, maj, minor) = e.streamInfo(uuid)
      val w = new PbWriter
      if (!omitVersion) withVersion(w, maj, minor)
      if (!omitDescriptor) w.message(4, descriptor(desc))
      Seq(w.toBytes)

    case "SetStreamAnnotations" =>
      var uuid = ""; var expected = 0L
      var changes = Map.empty[String, Option[String]]
      val kovs = Seq.newBuilder[PbReader]
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => expected = r.varint()
        case (3, _) => kovs += r.lenReader()
        case (_, w) => r.skip(w)
      }
      changes = kovMap(kovs.result())
      e.updateAnnotations(uuid, expected, changes)
      Seq(new PbWriter().toBytes)

    case "Create" =>
      var uuid = ""; var collection = ""
      val tags = Seq.newBuilder[PbReader]; val anns = Seq.newBuilder[PbReader]
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => collection = r.lenString()
        case (3, _) => tags += r.lenReader()
        case (4, _) => anns += r.lenReader()
        case (_, w) => r.skip(w)
      }
      e.createStream(uuid, collection, kvMap(tags.result()),
        kvMap(anns.result()))
      Seq(new PbWriter().toBytes)

    case "ListCollections" =>
      var prefix = ""; var startWith = ""; var limit = 0L
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => prefix = r.lenString()
        case (2, _) => startWith = r.lenString()
        case (3, _) => limit = r.varint()
        case (_, w) => r.skip(w)
      }
      val lim = if (limit <= 0) 10000 else math.min(limit, 10000L).toInt
      val w = new PbWriter
      e.listCollections(prefix, startWith, lim).collect()
        .foreach(row => w.string(2, row.getString(0)))
      Seq(w.toBytes)

    case "LookupStreams" =>
      var collection = ""; var isPrefix = false
      val tags = Seq.newBuilder[PbReader]; val anns = Seq.newBuilder[PbReader]
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => collection = r.lenString()
        case (2, _) => isPrefix = r.varint() != 0
        case (3, _) => tags += r.lenReader()
        case (4, _) => anns += r.lenReader()
        case (_, w) => r.skip(w)
      }
      val base = e.lookupStreams(collection, kovMap(tags.result()),
        kovMap(anns.result()))
      val rows = (if (isPrefix) base
        else base.filter(col("collection") === collection)).collect()
      val descs = rows.map { x =>
        graft.engine.StreamDescInfo(x.getAs[String]("uuid"),
          x.getAs[Long]("sid"), x.getAs[String]("collection"),
          x.getAs[scala.collection.Map[String, String]]("tags").toMap,
          x.getAs[scala.collection.Map[String, String]]("annotations").toMap,
          x.getAs[Long]("annotationVersion"))
      }
      descs.grouped(ChunkSize).map { group =>
        val w = new PbWriter
        group.foreach(d => w.message(2, descriptor(d)))
        w.toBytes
      }.toSeq match {
        case Seq() => Seq(new PbWriter().toBytes)
        case chunks => chunks
      }

    case "Nearest" =>
      var uuid = ""; var time = 0L; var vmaj = 0L; var backward = false
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => time = r.fixed64()
        case (3, _) => vmaj = r.varint()
        case (4, _) => backward = r.varint() != 0
        case (_, w) => r.skip(w)
      }
      val (maj, minor) = verOf(e, uuid)
      e.nearest(uuid, time, backward, pin(vmaj)) match {
        case Some((t, v)) =>
          val w = withVersion(new PbWriter, maj, minor)
          w.message(4, rawPoint(t, v))
          Seq(w.toBytes)
        case None =>
          val w = new PbWriter
          w.message(1, statusMsg(401, "no such point"))
          Seq(w.toBytes)
      }

    case "Changes" =>
      var uuid = ""; var fromMajor = 0L; var toMajor = 0L; var resolution = 0
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => fromMajor = r.varint()
        case (3, _) => toMajor = r.varint()
        case (4, _) => resolution = r.varint().toInt
        case (_, w) => r.skip(w)
      }
      val (maj, minor) = verOf(e, uuid)
      val to = if (toMajor == 0L) maj else toMajor
      val rows = e.changes(uuid, fromMajor, to, resolution)
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      chunked(rows.toSeq, maj, minor) { (w, p) =>
        val cr = new PbWriter
        cr.sfixed64(1, p._1); cr.sfixed64(2, p._2)
        w.message(4, cr)
      }

    case "Insert" =>
      var uuid = ""; var sync = false
      val pts = Seq.newBuilder[(Long, Double)]
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => sync = r.varint() != 0
        case (3, _) =>
          val p = r.lenReader()
          var t = 0L; var v = 0.0
          while (p.hasNext) p.readTag() match {
            case (1, _) => t = p.fixed64()
            case (2, _) => v = p.double()
            case (_, w) => p.skip(w)
          }
          pts += ((t, v))
        case (_, w) => r.skip(w)
      }
      val spark = e.spark
      val df = spark.createDataFrame(pts.result()).toDF("time", "value")
      e.insert(uuid, df)
      val (maj, minor) = if (sync) e.flush(uuid) else verOf(e, uuid)
      Seq(withVersion(new PbWriter, maj, minor).toBytes)

    case "Delete" =>
      var uuid = ""; var start = 0L; var end = 0L
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => uuid = uuidStr(r.lenBytes())
        case (2, _) => start = r.fixed64()
        case (3, _) => end = r.fixed64()
        case (_, w) => r.skip(w)
      }
      val (maj, minor) = e.deleteRange(uuid, start, end)
      Seq(withVersion(new PbWriter, maj, minor).toBytes)

    case "Info" =>
      val info = e.engineInfo()
      val w = new PbWriter
      val mash = new PbWriter
      mash.bool(5, info.healthy)
      w.message(2, mash)
      w.uint32(3, info.majorVersion)
      w.uint32(4, info.minorVersion)
      w.string(5, info.build)
      Seq(w.toBytes)

    case "Flush" =>
      val (maj, minor) = e.flush(uuidField(body))
      Seq(withVersion(new PbWriter, maj, minor).toBytes)

    case "Obliterate" =>
      e.obliterate(uuidField(body))
      Seq(new PbWriter().toBytes)

    case "GetMetadataUsage" =>
      var prefix = ""
      val r = new PbReader(body)
      while (r.hasNext) r.readTag() match {
        case (1, _) => prefix = r.lenString()
        case (_, w) => r.skip(w)
      }
      val w = new PbWriter
      e.keyUsage(prefix).collect().foreach { x =>
        val kc = new PbWriter
        kc.string(1, x.getString(1)); kc.uint64(2, x.getLong(2))
        w.message(if (x.getString(0) == "tag") 2 else 3, kc)
      }
      Seq(w.toBytes)

    case "GenerateCSV" =>
      generateCsv(e, body)

    case "FaultInject" =>
      // mirrors a production reference node: fault injection disabled
      // (bte 424, /root/reference/bte/errors.go)
      val w = new PbWriter
      w.message(1, statusMsg(424, "fault injection disabled"))
      Seq(w.toBytes)

    case m =>
      val w = new PbWriter
      w.message(1, statusMsg(421, s"unknown method $m"))
      Seq(w.toBytes)
  }

  private def uuidField(body: Array[Byte]): String = {
    var uuid = ""
    val r = new PbReader(body)
    while (r.hasNext) r.readTag() match {
      case (1, _) => uuid = uuidStr(r.lenBytes())
      case (_, w) => r.skip(w)
    }
    uuid
  }

  private def chunked[T](rows: Seq[T], maj: Long, minor: Long)
      (emit: (PbWriter, T) => Unit): Seq[Array[Byte]] = {
    if (rows.isEmpty) return Seq(withVersion(new PbWriter, maj, minor).toBytes)
    rows.grouped(ChunkSize).map { group =>
      val w = withVersion(new PbWriter, maj, minor)
      group.foreach(emit(w, _))
      w.toBytes
    }.toSeq
  }

  /** GenerateCSV over the engine's multi-stream align: RAW and
    * ALIGNED_WINDOWS query types (windowSize must be a power of two
    * for the aligned form, as the engine's pyramid levels are);
    * emits the header row then the data rows, chunked. */
  private def generateCsv(e: Btrdb, body: Array[Byte]): Seq[Array[Byte]] = {
    var queryType = 0; var start = 0L; var end = 0L
    var windowSize = 0L
    val streams = Seq.newBuilder[(String, String)] // (uuid, label)
    val r = new PbReader(body)
    while (r.hasNext) r.readTag() match {
      case (1, _) => queryType = r.varint().toInt
      case (2, _) => start = r.varint()
      case (3, _) => end = r.varint()
      case (4, _) => windowSize = r.varint()
      case (7, _) =>
        val sc = r.lenReader()
        var uuid = ""; var label = ""
        while (sc.hasNext) sc.readTag() match {
          case (2, _) => label = sc.lenString()
          case (3, _) => uuid = uuidStr(sc.lenBytes())
          case (_, w) => sc.skip(w)
        }
        streams += ((uuid, if (label.nonEmpty) label else uuid))
      case (_, w) => r.skip(w)
    }
    val (uuids, labels) = streams.result().unzip
    require(uuids.nonEmpty, "no streams requested")
    val frame0 = queryType match {
      case 2 => e.multiAlign(uuids, start, end, labels) // RAW_QUERY
      case 0 => // ALIGNED_WINDOWS_QUERY: windowSize = 2^pw
        val pw = java.lang.Long.numberOfTrailingZeros(windowSize)
        require(windowSize > 0 && (1L << pw) == windowSize,
          s"aligned CSV needs a power-of-two windowSize, got $windowSize")
        e.multiAlignedMeans(uuids, labels, start, end, pw)
      case 1 => throw new IllegalArgumentException(
        "WINDOWS_QUERY CSV unsupported; use the Windows RPC")
      case q => throw new IllegalArgumentException(s"unknown queryType $q")
    }
    val frame = e.csvTimeRendered(frame0) // RFC3339 times, like the file sink
    val rows = frame.collect()
    val header = {
      val w = new PbWriter
      w.bool(2, true)
      frame.columns.foreach(c => w.stringElem(3, c))
      w.toBytes
    }
    // one response message PER ROW — `repeated string row` is one
    // row's cells in the proto, so rows must never share a message
    header +: rows.toSeq.map { row =>
      val w = new PbWriter
      (0 until row.length).foreach { i =>
        w.stringElem(3,
          if (row.isNullAt(i)) "" else String.valueOf(row.get(i)))
      }
      w.toBytes
    }
  }
}
