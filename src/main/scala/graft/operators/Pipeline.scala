package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.ProtoWire
import graft.model.Envelope
import org.apache.spark.sql.functions._

/** The reference pipeline's own operators (SURVEY.md §2.2 P1–P4) declared
  * as catalog queries over the testdata: envelope projection and protobuf
  * round-trip. The file-source form of the same path lives in
  * pipeline.EnvelopePipeline (exercised by EnvelopePipelineSpec with real
  * temp files, including the unterminated-final-line case).
  */
object PipelineOps {

  def defs: Seq[QueryDef] = Seq(q40, q41)

  /** P2/P4 as a checked query: documents stand in for log lines; every
    * projected field except the ingest timestamp is deterministic.
    */
  val q40: QueryDef = QueryDef.checked(
    "q40_envelope_project",
    """SELECT doc_id, 'graft' AS origin, 'LogMessage' AS event_type,
      | 'OUT' AS message_type, 'bosh' AS source_type,
      | source AS source_instance, source AS partition_key,
      | length(text) + 1 AS message_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        lit("graft").as("origin"),
        lit("LogMessage").as("event_type"),
        lit("OUT").as("message_type"),
        lit("bosh").as("source_type"),
        col("source").as("source_instance"),
        col("source").as("partition_key"),
        (length(col("text")) + 1).cast("long").as("message_len"))
      .orderBy(col("doc_id"))
  }

  /** P3 round-trip at scale over ALL SIX envelope event types
    * (envelope.pb.go:49-60): each document becomes an envelope whose
    * payload type is doc_id mod 6 — LogMessage carries the text,
    * HttpStartStop carries a synthetic request (incl. the UUID request id
    * and the repeated `forwarded` chain), the metric/error types carry
    * derived values. Deterministic bytes → deterministic summary. Rows-only
    * (protobuf layout is not SQL-expressible); ProtoWireSpec pins golden
    * bytes per message type.
    */
  val q41: QueryDef = QueryDef.rowsOnly("q41_proto_roundtrip") { (s, d) =>
    import s.implicits._
    import graft.model.{CounterEvent, ContainerMetric, ErrorEvent, HttpStartStop, Uuid, ValueMetric}
    val roundtrip = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val base = Envelope.forLogLine(
          origin = "graft",
          line = (text + "\n").getBytes("UTF-8"),
          ingestNanos = 1700000000000000000L + id,
          sourcePath = source)
        val env = (id % 6) match {
          case 0 => base // LogMessage
          case 1 => base.copy(eventType = "HttpStartStop", logMessage = None,
            httpStartStop = Some(HttpStartStop(
              startTimestamp = id, stopTimestamp = id + 7,
              requestId = Uuid(low = id * 1000003L, high = ~id),
              // vary by the GROUP index id/6 — ids in this branch are all
              // ≡1 (mod 6), so id-parity/mod-3 would be constant and the
              // enum variety dead
              peerType = if ((id / 6) % 2 == 0) "Client" else "Server",
              method = if ((id / 6) % 3 == 0) "GET" else "POST",
              uri = s"/docs/$id", remoteAddress = "10.0.0.1:61001",
              userAgent = "graft", statusCode = 200, contentLength = text.length.toLong,
              applicationId = Some(Uuid(id, id + 1)), instanceIndex = Some((id % 4).toInt),
              instanceId = Some(source), forwarded = Seq("10.0.0.2", s"host-$id"))))
          case 2 => base.copy(eventType = "ValueMetric", logMessage = None,
            valueMetric = Some(ValueMetric(s"m$id", id * 0.5, "ms")))
          case 3 => base.copy(eventType = "CounterEvent", logMessage = None,
            counterEvent = Some(CounterEvent(s"c$id", id, Some(id * 2))))
          case 4 => base.copy(eventType = "Error", logMessage = None,
            error = Some(ErrorEvent(source, (id % 100).toInt, s"err$id")))
          case _ => base.copy(eventType = "ContainerMetric", logMessage = None,
            containerMetric = Some(ContainerMetric(source, (id % 8).toInt,
              0.25, id * 10, id * 20, Some(id * 30), None)))
        }
        val bytes = ProtoWire.encode(env)
        val back = ProtoWire.decode(bytes)
        // Array[Byte] fields compare by reference in case-class ==, so
        // compare the message bytes explicitly and the rest with nulled
        // message fields.
        val ok = (env.logMessage, back.logMessage) match {
          case (Some(elm), Some(blm)) =>
            java.util.Arrays.equals(blm.message, elm.message) &&
              blm.copy(message = null) == elm.copy(message = null) &&
              back.copy(logMessage = None) == env.copy(logMessage = None)
          case (None, None) => back == env
          case _ => false
        }
        (id, bytes.length.toLong, if (ok) 1L else 0L)
      }
      .toDF("doc_id", "wire_len", "ok")
    roundtrip.agg(
      count(lit(1)).as("n"),
      sum(col("wire_len")).as("total_wire_bytes"),
      sum(col("ok")).as("n_roundtrip_ok"))
  }
}
