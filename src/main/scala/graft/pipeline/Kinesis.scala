package graft.pipeline

import scala.collection.mutable

/** One record bound for the stream: payload + partition key (the reference
  * keys by source file path — batchproducer.go:187-191, main.go:346).
  */
final case class KinesisRecord(data: Array[Byte], partitionKey: String)

/** Per-record result of a PutRecords call (kinesis.go:463-475). */
final case class RecordResult(errorCode: String = "", errorMessage: String = "")

/** Whole-request result: either a request-level error or per-record results. */
final case class PutRecordsResult(
    requestError: Option[String],
    records: Seq[RecordResult]) {
  def failedCount: Int = records.count(_.errorCode.nonEmpty)
}

/** The injectable transport seam — mirrors the reference's `logProducer`
  * test seam (main.go:349-369): production wires an AWS SDK client here;
  * tests wire [[FakeKinesisClient]] with scripted responses. Must be
  * Serializable: instances are constructed per executor task via a factory
  * closure (never shipped with live sockets).
  */
trait KinesisClient extends Serializable {
  def putRecords(records: Seq[KinesisRecord]): PutRecordsResult
}

/** In-memory fake with a scripted response sequence (FIXTURES.md §A.3).
  * Responses are consumed one per call; when the script is exhausted every
  * call succeeds. Thread-confined (one per partition task / test).
  *
  * `sent` records only the ACKNOWLEDGED subset of each call (records whose
  * scripted RecordResult has an empty errorCode) — retried records must
  * not appear twice and failed-then-dropped records must not count as
  * delivered, so delivery assertions built on `allSentRecords` are exact.
  * `attempts` keeps every call's full input for call-shape asserts.
  */
final class FakeKinesisClient(script: Seq[PutRecordsResult] = Nil)
    extends KinesisClient {
  private val remaining = mutable.Queue[PutRecordsResult](script: _*)
  val sent = mutable.ArrayBuffer[Seq[KinesisRecord]]()
  val attempts = mutable.ArrayBuffer[Seq[KinesisRecord]]()
  var calls = 0

  override def putRecords(records: Seq[KinesisRecord]): PutRecordsResult = {
    calls += 1
    attempts += records
    val result =
      if (remaining.nonEmpty) {
        val r = remaining.dequeue()
        if (r.requestError.isEmpty && r.records.isEmpty)
          PutRecordsResult(None, Seq.fill(records.size)(RecordResult()))
        else r
      } else PutRecordsResult(None, Seq.fill(records.size)(RecordResult()))
    if (result.requestError.isEmpty) {
      val acked = records.zipWithIndex.collect {
        case (rec, i) if i >= result.records.size ||
          result.records(i).errorCode.isEmpty => rec
      }
      if (acked.nonEmpty) sent += acked
    }
    result
  }

  def allSentRecords: Seq[KinesisRecord] = sent.toSeq.flatten
}
