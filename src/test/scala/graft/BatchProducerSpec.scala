package graft

import graft.pipeline._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** K1–K7 semantics against the scripted fake client (FIXTURES.md §A.3);
  * sleep is injected so the exact backoff sequence is asserted without
  * wall-clock waits (reference: batchproducer.go:326-336).
  */
class BatchProducerSpec extends AnyFunSuite {

  private def rec(i: Int): Array[Byte] = Array(i.toByte)
  private val noSleep: Long => Unit = _ => ()

  private def requestError = PutRecordsResult(Some("ServiceUnavailable"), Nil)
  private def partialFail(n: Int, failIdx: Set[Int]) = PutRecordsResult(None,
    (0 until n).map(i => if (failIdx(i)) RecordResult("ProvisionedThroughputExceededException") else RecordResult()))

  test("K2 size trigger: a full batch is sent as soon as batchSize is buffered") {
    val client = new FakeKinesisClient()
    val p = new BatchProducer(client, ProducerConfig(batchSize = 10, bufferSize = 100), noSleep)
    (0 until 9).foreach(i => p.add(rec(i), "k"))
    assert(client.calls === 0) // below batch size: nothing sent yet
    p.add(rec(9), "k")
    assert(client.calls === 1)
    assert(client.sent.head.size === 10)
    assert(p.stats.sent === 10 && p.stats.buffered === 0)
  }

  test("K7 flush drains a partial batch") {
    val client = new FakeKinesisClient()
    val p = new BatchProducer(client, ProducerConfig(batchSize = 10), noSleep)
    (0 until 3).foreach(i => p.add(rec(i), "k"))
    assert(p.flush() === 0)
    assert(client.calls === 1 && p.stats.sent === 3)
  }

  test("K4 exponential backoff: 50ms doubling per consecutive request error") {
    val client = new FakeKinesisClient(Seq(requestError, requestError, requestError))
    val sleeps = mutable.ArrayBuffer[Long]()
    val p = new BatchProducer(client, ProducerConfig(batchSize = 5), sleeps += _)
    (0 until 4).foreach(i => p.add(rec(i), "k"))
    p.flush()
    assert(sleeps.toSeq === Seq(50L, 100L, 200L)) // batchproducer.go:326-331
    assert(p.stats.sent === 4) // eventually delivered after script exhausts
    assert(p.stats.requestErrors === 3)
    assert(p.stats.droppedRecords === 0)
  }

  test("K4 failed batch is re-enqueued at the back (order loss accepted)") {
    // add 0,1,2 → send fails → requeued; add 3 → [0,1,2,3] → send [0,1,2]
    // fails again → requeued behind 3 → next sends are [3,0,1], [2,4]:
    // the failed batch drops behind newer records, as in the reference
    // (batchproducer.go:349-354, ordering-loss TODO :413-414).
    val client = new FakeKinesisClient(Seq(requestError, requestError))
    val p = new BatchProducer(client, ProducerConfig(batchSize = 3, bufferSize = 100), noSleep)
    (0 until 5).foreach(i => p.add(rec(i), "k"))
    p.flush()
    val order = client.allSentRecords.map(_.data(0).toInt)
    assert(order === Seq(3, 0, 1, 2, 4))
  }

  test("K5 load shed: drop batch only after ≥5 consecutive errors AND ≥95% full") {
    // Fullness counts the in-flight batch (pre-dequeue): the reference's
    // concurrent Add refills the channel during a failed round trip, so
    // its post-take check still sees a ~full buffer — the synchronous
    // analogue is measuring before the take.
    val client = new FakeKinesisClient(Seq.fill(300)(requestError))
    val p = new BatchProducer(client,
      ProducerConfig(batchSize = 5, bufferSize = 100, addBlockFullnessPct = 200), noSleep)
    (0 until 100).foreach(i => p.add(rec(i), "k"))
    p.flush()
    assert(p.stats.droppedBatches >= 1)
    assert(p.stats.sent + p.stats.droppedRecords === 100)
  }

  test("add() cannot livelock at the DEFAULT config on a dead endpoint") {
    // Regression: with post-dequeue fullness, the default 500/5000
    // (drop@95, block@99) config could never satisfy the shed check —
    // add() spun forever re-enqueueing the same failed batch. The shed
    // exists precisely so Add never hangs indefinitely
    // (batchproducer.go:347).
    val client = new FakeKinesisClient(Seq.fill(100000)(requestError))
    val p = new BatchProducer(client, ProducerConfig(), noSleep)
    (0 until 6000).foreach(i => p.add(rec(i), "k")) // past the 99% block
    assert(p.stats.droppedRecords > 0,
      "persistent failure at a full buffer must shed, not spin")
  }

  test("no shed below the fullness threshold: errors alone never drop") {
    val client = new FakeKinesisClient(Seq.fill(8)(requestError))
    val p = new BatchProducer(client, ProducerConfig(batchSize = 10, bufferSize = 1000), noSleep)
    (0 until 10).foreach(i => p.add(rec(i), "k"))
    p.flush()
    assert(p.stats.droppedBatches === 0 && p.stats.droppedRecords === 0)
    assert(p.stats.sent === 10)
  }

  test("K6 per-record retry then drop after maxAttemptsPerRecord") {
    // record index 2 fails in every batch it appears in
    val script = Seq(
      partialFail(5, Set(2)), // attempt 1 for record 2, others sent
      partialFail(1, Set(0)), // attempt 2 (record 2 alone in retry batch)
      partialFail(1, Set(0))) // attempt 3 → dropped (maxAttempts=3)
    val client = new FakeKinesisClient(script)
    val p = new BatchProducer(client,
      ProducerConfig(batchSize = 5, maxAttemptsPerRecord = 3), noSleep)
    (0 until 5).foreach(i => p.add(rec(i), "k"))
    p.flush()
    assert(p.stats.sent === 4)
    assert(p.stats.droppedRecords === 1)
    assert(p.stats.recordErrors === 3)
    assert(p.stats.buffered === 0)
  }

  test("K4 backoff exponent is capped: sustained failure sleeps 3.2s/request, not hours") {
    val client = new FakeKinesisClient(Seq.fill(20)(requestError))
    val sleeps = mutable.ArrayBuffer[Long]()
    val p = new BatchProducer(client, ProducerConfig(batchSize = 5), sleeps += _)
    (0 until 4).foreach(i => p.add(rec(i), "k"))
    p.flush()
    assert(sleeps.take(7).toSeq === Seq(50L, 100L, 200L, 400L, 800L, 1600L, 3200L))
    assert(sleeps.drop(7).forall(_ === 3200L)) // capped, never 50*2^19
  }

  test("bounded flush returns undelivered count at the deadline") {
    // clock advances 10ms per inspection; every request fails and the
    // buffer stays below the shed threshold → without a deadline this
    // would loop forever (the old DSv2 commit hang)
    var now = 0L
    val clock = () => { now += 10; now }
    val client = new FakeKinesisClient(Seq.fill(1000)(requestError))
    val p = new BatchProducer(client,
      ProducerConfig(batchSize = 10, bufferSize = 1000), noSleep, clock)
    (0 until 10).foreach(i => p.add(rec(i), "k"))
    val left = p.flush(timeoutMillis = 100)
    assert(left === 10) // all still buffered, reported to the caller
  }

  test("fake client records only acknowledged records as sent") {
    val client = new FakeKinesisClient(Seq(partialFail(3, Set(1))))
    val p = new BatchProducer(client,
      ProducerConfig(batchSize = 3, maxAttemptsPerRecord = 2), noSleep)
    (0 until 3).foreach(i => p.add(rec(i), "k"))
    p.flush()
    // record 1 failed once then succeeded on retry: exactly once in sent
    assert(client.allSentRecords.map(_.data(0).toInt).sorted === Seq(0, 1, 2))
    assert(client.attempts.map(_.size).toSeq === Seq(3, 1))
  }

  test("K1 backpressure: buffer never exceeds capacity when client succeeds") {
    val client = new FakeKinesisClient()
    val cfg = ProducerConfig(batchSize = 10, bufferSize = 50)
    val p = new BatchProducer(client, cfg, noSleep)
    (0 until 500).foreach(i => p.add(rec(i), s"k${i % 3}"))
    p.flush()
    assert(p.stats.sent === 500)
    assert(client.allSentRecords.size === 500)
  }
}
