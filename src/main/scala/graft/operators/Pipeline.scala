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

  /** P3 round-trip at scale: encode every document as a LogMessage
    * envelope (fixed per-doc timestamp → deterministic bytes), decode,
    * verify. Wire size is asserted per-row inside the plan; the output is
    * the corpus-level summary. Rows-only (protobuf layout is not
    * SQL-expressible); ProtoWireSpec pins golden bytes.
    */
  val q41: QueryDef = QueryDef.rowsOnly("q41_proto_roundtrip") { (s, d) =>
    import s.implicits._
    val roundtrip = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val env = Envelope.forLogLine(
          origin = "graft",
          line = (text + "\n").getBytes("UTF-8"),
          ingestNanos = 1700000000000000000L + id,
          sourcePath = source)
        val bytes = ProtoWire.encode(env)
        val back = ProtoWire.decode(bytes)
        // Array[Byte] fields compare by reference in case-class ==, so
        // compare the message bytes explicitly and the rest with nulled
        // message fields.
        val blm = back.logMessage.get
        val elm = env.logMessage.get
        val ok = java.util.Arrays.equals(blm.message, elm.message) &&
          blm.copy(message = null) == elm.copy(message = null) &&
          back.copy(logMessage = None) == env.copy(logMessage = None)
        (id, bytes.length.toLong, if (ok) 1L else 0L)
      }
      .toDF("doc_id", "wire_len", "ok")
    roundtrip.agg(
      count(lit(1)).as("n"),
      sum(col("wire_len")).as("total_wire_bytes"),
      sum(col("ok")).as("n_roundtrip_ok"))
  }
}
