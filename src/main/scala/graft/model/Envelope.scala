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

final case class Envelope(
    origin: String,
    eventType: String, // enum name; reference produces only "LogMessage" (=5)
    timestamp: Option[Long],
    deployment: Option[String],
    job: Option[String],
    index: Option[String],
    ip: Option[String],
    tags: Map[String, String],
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
