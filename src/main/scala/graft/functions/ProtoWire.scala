package graft.functions

import java.io.ByteArrayOutputStream
import graft.model._

/** Hand-rolled protobuf wire-format codec for the Envelope message family.
  *
  * /opt/spark/jars ships no spark-protobuf module (SURVEY.md §7 fallback
  * path), so the engine encodes/decodes the two-message subset directly
  * against the public protobuf wire format (varint + length-delimited
  * fields). Field numbers match the reference schema exactly:
  * envelope.pb.go:100-116 (origin=1, eventType=2, timestamp=6,
  * httpStartStop=7, logMessage=8, valueMetric=9, counterEvent=10,
  * error=11, containerMetric=12, deployment=13, job=14, index=15, ip=16,
  * tags=17), log.pb.go:58-63 (message=1, message_type=2, timestamp=3,
  * app_id=4, source_type=5, source_instance=6), http.pb.go:218-234 and
  * uuid.pb.go:24-28 for the HTTP lifecycle event — so bytes interop with
  * any real Loggregator consumer. Every decoder loop skips unknown
  * fields by wire type (forward compatibility, like XXX_unrecognized).
  *
  * Fields are emitted in ascending field-number order (canonical, matches
  * the generated Go marshaler's layout).
  */
object ProtoWire {

  // ---- primitive writers -------------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7f)
  }

  private def tag(field: Int, wireType: Int): Long = (field.toLong << 3) | wireType

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, tag(field, 0)); writeVarint(out, v)
  }

  private def writeBytesField(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeVarint(out, tag(field, 2)); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  private def writeStringField(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    writeBytesField(out, field, s.getBytes("UTF-8"))

  private def writeDoubleField(out: ByteArrayOutputStream, field: Int, d: Double): Unit = {
    writeVarint(out, tag(field, 1))
    val bits = java.lang.Double.doubleToLongBits(d)
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  // ---- message encoders --------------------------------------------------

  def encodeLogMessage(m: LogMessage): Array[Byte] = {
    val out = new ByteArrayOutputStream(m.message.length + 64)
    writeBytesField(out, 1, m.message)
    writeVarintField(out, 2, Envelope.messageTypeCode(m.message_type).toLong)
    writeVarintField(out, 3, m.timestamp)
    m.app_id.foreach(writeStringField(out, 4, _))
    writeStringField(out, 5, m.source_type)
    writeStringField(out, 6, m.source_instance)
    out.toByteArray
  }

  def encodeValueMetric(m: ValueMetric): Array[Byte] = {
    val out = new ByteArrayOutputStream(48)
    writeStringField(out, 1, m.name)
    writeDoubleField(out, 2, m.value)
    writeStringField(out, 3, m.unit)
    out.toByteArray
  }

  def encodeCounterEvent(m: CounterEvent): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    writeStringField(out, 1, m.name)
    writeVarintField(out, 2, m.delta)
    m.total.foreach(writeVarintField(out, 3, _))
    out.toByteArray
  }

  def encodeError(m: ErrorEvent): Array[Byte] = {
    val out = new ByteArrayOutputStream(48)
    writeStringField(out, 1, m.source)
    writeVarintField(out, 2, m.code.toLong)
    writeStringField(out, 3, m.message)
    out.toByteArray
  }

  /** uuid.pb.go:24-28: low=1, high=2 (varint uint64 — Long bits pass
    * through the varint encoder unchanged, so negative Longs round-trip).
    */
  def encodeUuid(u: Uuid): Array[Byte] = {
    val out = new ByteArrayOutputStream(24)
    writeVarintField(out, 1, u.low)
    writeVarintField(out, 2, u.high)
    out.toByteArray
  }

  /** http.pb.go:218-234 field layout (note: no field 11; forwarded=15 is
    * `repeated string` — one length-delimited field per element).
    */
  def encodeHttpStartStop(m: HttpStartStop): Array[Byte] = {
    val out = new ByteArrayOutputStream(128)
    writeVarintField(out, 1, m.startTimestamp)
    writeVarintField(out, 2, m.stopTimestamp)
    writeBytesField(out, 3, encodeUuid(m.requestId))
    writeVarintField(out, 4, Envelope.peerTypeCode(m.peerType).toLong)
    writeVarintField(out, 5, Envelope.methodCode(m.method).toLong)
    writeStringField(out, 6, m.uri)
    writeStringField(out, 7, m.remoteAddress)
    writeStringField(out, 8, m.userAgent)
    writeVarintField(out, 9, m.statusCode.toLong)
    writeVarintField(out, 10, m.contentLength)
    m.applicationId.foreach(u => writeBytesField(out, 12, encodeUuid(u)))
    m.instanceIndex.foreach(i => writeVarintField(out, 13, i.toLong))
    m.instanceId.foreach(writeStringField(out, 14, _))
    m.forwarded.foreach(writeStringField(out, 15, _))
    out.toByteArray
  }

  def encodeContainerMetric(m: ContainerMetric): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeStringField(out, 1, m.applicationId)
    writeVarintField(out, 2, m.instanceIndex.toLong)
    writeDoubleField(out, 3, m.cpuPercentage)
    writeVarintField(out, 4, m.memoryBytes)
    writeVarintField(out, 5, m.diskBytes)
    m.memoryBytesQuota.foreach(writeVarintField(out, 6, _))
    m.diskBytesQuota.foreach(writeVarintField(out, 7, _))
    out.toByteArray
  }

  def encode(e: Envelope): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    writeStringField(out, 1, e.origin)
    writeVarintField(out, 2, Envelope.eventTypeCode(e.eventType).toLong)
    e.timestamp.foreach(writeVarintField(out, 6, _))
    e.httpStartStop.foreach(m => writeBytesField(out, 7, encodeHttpStartStop(m)))
    e.logMessage.foreach(m => writeBytesField(out, 8, encodeLogMessage(m)))
    e.valueMetric.foreach(m => writeBytesField(out, 9, encodeValueMetric(m)))
    e.counterEvent.foreach(m => writeBytesField(out, 10, encodeCounterEvent(m)))
    e.error.foreach(m => writeBytesField(out, 11, encodeError(m)))
    e.containerMetric.foreach(m => writeBytesField(out, 12, encodeContainerMetric(m)))
    e.deployment.foreach(writeStringField(out, 13, _))
    e.job.foreach(writeStringField(out, 14, _))
    e.index.foreach(writeStringField(out, 15, _))
    e.ip.foreach(writeStringField(out, 16, _))
    // map<string,string> = repeated nested {key=1, value=2}
    e.tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val kv = new ByteArrayOutputStream(k.length + v.length + 8)
      writeStringField(kv, 1, k)
      writeStringField(kv, 2, v)
      writeBytesField(out, 17, kv.toByteArray)
    }
    out.toByteArray
  }

  // ---- decoder -----------------------------------------------------------

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    private def need(n: Int): Unit =
      if (n < 0 || pos.toLong + n > buf.length)
        throw new IllegalArgumentException(
          s"truncated or corrupt message: need $n bytes at $pos of ${buf.length}")
    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        need(1)
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint too long")
      }
      acc
    }
    /** Length prefix validated as a LONG before narrowing — a 64-bit
      * length like 2^32+5 must throw, not wrap to 5 and misparse.
      */
    private def readLen(): Int = {
      val n = readVarint()
      if (n < 0 || n > buf.length - pos)
        throw new IllegalArgumentException(
          s"truncated or corrupt message: declared length $n at $pos of ${buf.length}")
      n.toInt
    }
    def readBytes(): Array[Byte] = {
      val n = readLen()
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      r
    }
    def readString(): String = new String(readBytes(), "UTF-8")
    def readFixed64(): Long = {
      need(8)
      var bits = 0L; var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      bits
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => need(8); pos += 8
      case 2 =>
        // NOT `pos += readVarint()`: += reads pos BEFORE readVarint's
        // side effect advances it, silently dropping the length-prefix
        // bytes and misaligning every field after the skipped one.
        val n = readLen()
        pos += n
      case 5 => need(4); pos += 4
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  def decodeUuid(bytes: Array[Byte]): Uuid = {
    val r = new Reader(bytes)
    var low = 0L; var high = 0L
    while (r.hasMore) {
      val t = r.readVarint(); (t >>> 3).toInt match {
        case 1 if (t & 7) == 0 => low = r.readVarint()
        case 2 if (t & 7) == 0 => high = r.readVarint()
        case _ => r.skip((t & 7).toInt)
      }
    }
    Uuid(low, high)
  }

  def decodeHttpStartStop(bytes: Array[Byte]): HttpStartStop = {
    val r = new Reader(bytes)
    var startTs = 0L; var stopTs = 0L
    var requestId = Uuid(0L, 0L)
    var peerType = "Client"; var method = "GET"
    var uri = ""; var remote = ""; var agent = ""
    var status = 0; var contentLength = 0L
    var appId: Option[Uuid] = None
    var instIdx: Option[Int] = None
    var instId: Option[String] = None
    val fwd = Seq.newBuilder[String]
    while (r.hasMore) {
      val t = r.readVarint(); val wt = (t & 7).toInt
      (t >>> 3).toInt match {
        case 1 if wt == 0 => startTs = r.readVarint()
        case 2 if wt == 0 => stopTs = r.readVarint()
        case 3 if wt == 2 => requestId = decodeUuid(r.readBytes())
        case 4 if wt == 0 => peerType = Envelope.peerTypeName(r.readVarint().toInt)
        case 5 if wt == 0 => method = Envelope.methodName(r.readVarint().toInt)
        case 6 if wt == 2 => uri = r.readString()
        case 7 if wt == 2 => remote = r.readString()
        case 8 if wt == 2 => agent = r.readString()
        case 9 if wt == 0 => status = r.readVarint().toInt
        case 10 if wt == 0 => contentLength = r.readVarint()
        case 12 if wt == 2 => appId = Some(decodeUuid(r.readBytes()))
        case 13 if wt == 0 => instIdx = Some(r.readVarint().toInt)
        case 14 if wt == 2 => instId = Some(r.readString())
        case 15 if wt == 2 => fwd += r.readString()
        case _ => r.skip(wt)
      }
    }
    HttpStartStop(startTs, stopTs, requestId, peerType, method, uri, remote,
      agent, status, contentLength, appId, instIdx, instId, fwd.result())
  }

  def decodeLogMessage(bytes: Array[Byte]): LogMessage = {
    val r = new Reader(bytes)
    var message: Array[Byte] = Array.emptyByteArray
    var mtype = "OUT"; var ts = 0L
    var appId: Option[String] = None
    var srcType = ""; var srcInst = ""
    while (r.hasMore) {
      val t = r.readVarint(); val field = (t >>> 3).toInt; val wt = (t & 7).toInt
      field match {
        case 1 if wt == 2 => message = r.readBytes()
        case 2 if wt == 0 => mtype = Envelope.messageTypeName(r.readVarint().toInt)
        case 3 if wt == 0 => ts = r.readVarint()
        case 4 if wt == 2 => appId = Some(r.readString())
        case 5 if wt == 2 => srcType = r.readString()
        case 6 if wt == 2 => srcInst = r.readString()
        case _ => r.skip(wt)
      }
    }
    LogMessage(message, mtype, ts, appId, srcType, srcInst)
  }

  // Every known-field case is GUARDED on its expected wire type: a
  // corrupt or adversarial tag carrying the wrong type falls through to
  // the wire-type-driven skip (the proto-correct lenient behavior), so
  // one bad field can never misalign the rest of the stream — e.g. a
  // varint arriving where a length-delimited string is expected would
  // otherwise consume its payload byte as a length prefix and swallow
  // arbitrary following bytes.
  def decode(bytes: Array[Byte]): Envelope = {
    val r = new Reader(bytes)
    var origin = ""; var eventType = ""
    var ts: Option[Long] = None
    var deployment, job, index, ip: Option[String] = None
    var tags = Map.newBuilder[String, String]
    var httpStartStop: Option[HttpStartStop] = None
    var logMessage: Option[LogMessage] = None
    var valueMetric: Option[ValueMetric] = None
    var counterEvent: Option[CounterEvent] = None
    var error: Option[ErrorEvent] = None
    var containerMetric: Option[ContainerMetric] = None
    while (r.hasMore) {
      val t = r.readVarint(); val field = (t >>> 3).toInt; val wt = (t & 7).toInt
      field match {
        case 1 if wt == 2 => origin = r.readString()
        case 2 if wt == 0 => eventType = Envelope.eventTypeName(r.readVarint().toInt)
        case 6 if wt == 0 => ts = Some(r.readVarint())
        case 7 if wt == 2 => httpStartStop = Some(decodeHttpStartStop(r.readBytes()))
        case 8 if wt == 2 => logMessage = Some(decodeLogMessage(r.readBytes()))
        case 9 =>
          val n = new Reader(r.readBytes())
          var name = ""; var v = 0.0; var unit = ""
          while (n.hasMore) {
            val tt = n.readVarint(); (tt >>> 3).toInt match {
              case 1 if (tt & 7) == 2 => name = n.readString()
              case 2 if (tt & 7) == 1 => v = java.lang.Double.longBitsToDouble(n.readFixed64())
              case 3 if (tt & 7) == 2 => unit = n.readString()
              case _ => n.skip((tt & 7).toInt)
            }
          }
          valueMetric = Some(ValueMetric(name, v, unit))
        case 10 =>
          val n = new Reader(r.readBytes())
          var name = ""; var delta = 0L; var total: Option[Long] = None
          while (n.hasMore) {
            val tt = n.readVarint(); (tt >>> 3).toInt match {
              case 1 if (tt & 7) == 2 => name = n.readString()
              case 2 if (tt & 7) == 0 => delta = n.readVarint()
              case 3 if (tt & 7) == 0 => total = Some(n.readVarint())
              case _ => n.skip((tt & 7).toInt)
            }
          }
          counterEvent = Some(CounterEvent(name, delta, total))
        case 11 =>
          val n = new Reader(r.readBytes())
          var src = ""; var code = 0; var msg = ""
          while (n.hasMore) {
            val tt = n.readVarint(); (tt >>> 3).toInt match {
              case 1 if (tt & 7) == 2 => src = n.readString()
              case 2 if (tt & 7) == 0 => code = n.readVarint().toInt
              case 3 if (tt & 7) == 2 => msg = n.readString()
              case _ => n.skip((tt & 7).toInt)
            }
          }
          error = Some(ErrorEvent(src, code, msg))
        case 12 =>
          val n = new Reader(r.readBytes())
          var app = ""; var idx = 0; var cpu = 0.0
          var mem = 0L; var disk = 0L
          var memQ, diskQ: Option[Long] = None
          while (n.hasMore) {
            val tt = n.readVarint(); (tt >>> 3).toInt match {
              case 1 if (tt & 7) == 2 => app = n.readString()
              case 2 if (tt & 7) == 0 => idx = n.readVarint().toInt
              case 3 if (tt & 7) == 1 => cpu = java.lang.Double.longBitsToDouble(n.readFixed64())
              case 4 if (tt & 7) == 0 => mem = n.readVarint()
              case 5 if (tt & 7) == 0 => disk = n.readVarint()
              case 6 if (tt & 7) == 0 => memQ = Some(n.readVarint())
              case 7 if (tt & 7) == 0 => diskQ = Some(n.readVarint())
              case _ => n.skip((tt & 7).toInt)
            }
          }
          containerMetric = Some(ContainerMetric(app, idx, cpu, mem, disk, memQ, diskQ))
        case 13 if (t & 7) == 2 => deployment = Some(r.readString())
        case 14 if (t & 7) == 2 => job = Some(r.readString())
        case 15 if (t & 7) == 2 => index = Some(r.readString())
        case 16 if (t & 7) == 2 => ip = Some(r.readString())
        case 17 =>
          val n = new Reader(r.readBytes())
          var k = ""; var v = ""
          while (n.hasMore) {
            val tt = n.readVarint(); (tt >>> 3).toInt match {
              case 1 if (tt & 7) == 2 => k = n.readString()
              case 2 if (tt & 7) == 2 => v = n.readString()
              case _ => n.skip((tt & 7).toInt)
            }
          }
          tags += (k -> v)
        case _ => r.skip(wt)
      }
    }
    Envelope(origin, eventType, ts, deployment, job, index, ip, tags.result(),
      httpStartStop, logMessage, valueMetric, counterEvent, error, containerMetric)
  }
}
