package graft.model

/** The engine's log-record data model — the CF Loggregator envelope shape
  * (reference: sonde-go events/envelope.pb.go:99-118, log.pb.go:57-65,
  * metric.pb.go:22-99, error.pb.go:22-27), expressed as Scala case classes
  * so the typed core is `Dataset[Envelope]` with a Product encoder.
  *
  * Timestamps are Unix NANOseconds (LongType) exactly as the reference
  * carries them (main.go:331); a derived microsecond TimestampType column
  * is added where SQL-surface queries need one (nanos→micros truncation
  * documented in SURVEY.md §1.3).
  */
final case class LogMessage(
    message: Array[Byte],
    message_type: String, // "OUT" | "ERR" (log.pb.go:22-26); reference always OUT
    timestamp: Long, // ingest time, Unix nanos
    app_id: Option[String],
    source_type: String, // reference: always "bosh" (main.go:327)
    source_instance: String) // reference: source file path (main.go:338)

final case class ValueMetric(name: String, value: Double, unit: String)

final case class CounterEvent(name: String, delta: Long, total: Option[Long])

final case class ErrorEvent(source: String, code: Int, message: String)

final case class ContainerMetric(
    applicationId: String,
    instanceIndex: Int,
    cpuPercentage: Double,
    memoryBytes: Long,
    diskBytes: Long,
    memoryBytesQuota: Option[Long],
    diskBytesQuota: Option[Long])

/** 128-bit request id (uuid.pb.go:24-28). Proto `uint64` halves carried as
  * Long BITS — values above 2^63-1 appear negative in Scala but round-trip
  * exactly on the wire (varint encodes the raw two's-complement bits).
  */
final case class Uuid(low: Long, high: Long)

/** Whole-lifecycle HTTP request event (http.pb.go:218-234). Enums carried
  * as their names (`peerType`: Client|Server, http.pb.go:25-26; `method`:
  * GET…VERSION_CONTROL, http.pb.go:59-103); `forwarded` is the repeated
  * X-Forwarded-For chain (http.pb.go:232).
  */
final case class HttpStartStop(
    startTimestamp: Long,
    stopTimestamp: Long,
    requestId: Uuid,
    peerType: String,
    method: String,
    uri: String,
    remoteAddress: String,
    userAgent: String,
    statusCode: Int,
    contentLength: Long,
    applicationId: Option[Uuid],
    instanceIndex: Option[Int],
    instanceId: Option[String],
    forwarded: Seq[String])

final case class Envelope(
    origin: String,
    eventType: String, // enum name; reference produces only "LogMessage" (=5)
    timestamp: Option[Long],
    deployment: Option[String],
    job: Option[String],
    index: Option[String],
    ip: Option[String],
    tags: Map[String, String],
    httpStartStop: Option[HttpStartStop],
    logMessage: Option[LogMessage],
    valueMetric: Option[ValueMetric],
    counterEvent: Option[CounterEvent],
    error: Option[ErrorEvent],
    containerMetric: Option[ContainerMetric])

object Envelope {
  /** eventType enum values (envelope.pb.go:49-60). */
  val EventTypeCodes: Map[String, Int] = Map(
    "HttpStartStop" -> 4, "LogMessage" -> 5, "ValueMetric" -> 6,
    "CounterEvent" -> 7, "Error" -> 8, "ContainerMetric" -> 9)
  val CodeToEventType: Map[Int, String] = EventTypeCodes.map(_.swap)

  /** MessageType enum (log.pb.go:22-26). */
  val MessageTypeCodes: Map[String, Int] = Map("OUT" -> 1, "ERR" -> 2)
  val CodeToMessageType: Map[Int, String] = MessageTypeCodes.map(_.swap)

  /** PeerType enum (http.pb.go:25-26). */
  val PeerTypeCodes: Map[String, Int] = Map("Client" -> 1, "Server" -> 2)
  val CodeToPeerType: Map[Int, String] = PeerTypeCodes.map(_.swap)

  /** HTTP Method enum (http.pb.go:59-103). */
  val MethodCodes: Map[String, Int] = Map(
    "GET" -> 1, "POST" -> 2, "PUT" -> 3, "DELETE" -> 4, "HEAD" -> 5,
    "ACL" -> 6, "BASELINE_CONTROL" -> 7, "BIND" -> 8, "CHECKIN" -> 9,
    "CHECKOUT" -> 10, "CONNECT" -> 11, "COPY" -> 12, "DEBUG" -> 13,
    "LABEL" -> 14, "LINK" -> 15, "LOCK" -> 16, "MERGE" -> 17,
    "MKACTIVITY" -> 18, "MKCALENDAR" -> 19, "MKCOL" -> 20,
    "MKREDIRECTREF" -> 21, "MKWORKSPACE" -> 22, "MOVE" -> 23,
    "OPTIONS" -> 24, "ORDERPATCH" -> 25, "PATCH" -> 26, "PRI" -> 27,
    "PROPFIND" -> 28, "PROPPATCH" -> 29, "REBIND" -> 30, "REPORT" -> 31,
    "SEARCH" -> 32, "SHOWMETHOD" -> 33, "SPACEJUMP" -> 34,
    "TEXTSEARCH" -> 35, "TRACE" -> 36, "TRACK" -> 37, "UNBIND" -> 38,
    "UNCHECKOUT" -> 39, "UNLINK" -> 40, "UNLOCK" -> 41, "UPDATE" -> 42,
    "UPDATEREDIRECTREF" -> 43, "VERSION_CONTROL" -> 44)
  val CodeToMethod: Map[Int, String] = MethodCodes.map(_.swap)

  /** Lenient enum mapping: protobuf preserves unknown enum codes, so the
    * String-name model decodes an unknown code N as "<PREFIX>_N" and
    * encodes that name back to N — a newer producer's enum value
    * round-trips instead of crashing the decode.
    */
  private def lenientName(names: Map[Int, String], prefix: String)(code: Int): String =
    names.getOrElse(code, s"$prefix$code")
  private def lenientCode(codes: Map[String, Int], prefix: String)(name: String): Int =
    codes.getOrElse(name, {
      // accept negative codes too: int32 enum values with bit 31 set are
      // valid protobuf and decode to "<PREFIX>-N" names
      val suffix = name.drop(prefix.length)
      if (name.startsWith(prefix) && suffix.matches("-?\\d+")) suffix.toInt
      else throw new IllegalArgumentException(s"unknown enum name '$name'")
    })

  def eventTypeName(code: Int): String = lenientName(CodeToEventType, "EVENT_TYPE_")(code)
  def eventTypeCode(name: String): Int = lenientCode(EventTypeCodes, "EVENT_TYPE_")(name)
  def messageTypeName(code: Int): String = lenientName(CodeToMessageType, "MESSAGE_TYPE_")(code)
  def messageTypeCode(name: String): Int = lenientCode(MessageTypeCodes, "MESSAGE_TYPE_")(name)
  def peerTypeName(code: Int): String = lenientName(CodeToPeerType, "PEER_TYPE_")(code)
  def peerTypeCode(name: String): Int = lenientCode(PeerTypeCodes, "PEER_TYPE_")(name)
  def methodName(code: Int): String = lenientName(CodeToMethod, "METHOD_")(code)
  def methodCode(name: String): Int = lenientCode(MethodCodes, "METHOD_")(name)

  /** The projection the reference produces per log line (main.go:330-341). */
  def forLogLine(
      origin: String,
      line: Array[Byte],
      ingestNanos: Long,
      sourcePath: String): Envelope =
    Envelope(
      origin = origin,
      eventType = "LogMessage",
      timestamp = None,
      deployment = None, job = None, index = None, ip = None,
      tags = Map.empty,
      httpStartStop = None,
      logMessage = Some(LogMessage(
        message = line,
        message_type = "OUT",
        timestamp = ingestNanos,
        app_id = None,
        source_type = "bosh",
        source_instance = sourcePath)),
      valueMetric = None, counterEvent = None, error = None,
      containerMetric = None)
}
