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

/** One record read back from the stream — the GetRecords element shape
  * (public Kinesis API; the reference never reads the stream it writes,
  * so this surface is capability-completion, not parity).
  */
final case class ReadRecord(
    sequenceNumber: String, partitionKey: String, data: Array[Byte],
    arrivalEpochMs: Long)

/** One GetRecords page: records + the continuation iterator (None when
  * the shard is closed and fully consumed). `millisBehindLatest` is
  * None when the response OMITS the metric — the wire field is
  * approximate and optional, and collapsing absent to 0 would make a
  * backlogged shard read as "at the tip" (the admission probe would
  * degrade to one page per trigger); a present 0 is the only true
  * tip signal.
  */
final case class GetRecordsPage(
    records: Seq[ReadRecord], nextIterator: Option[String],
    millisBehindLatest: Option[Long])

/** One shard with its reshard lineage: a split's children carry the
  * parent's id; a merge's child carries both parents (ParentShardId +
  * AdjacentParentShardId on the wire). The source holds a child back
  * until its listed parents are drained, preserving per-key order
  * across a reshard.
  */
final case class ShardInfo(shardId: String, parentIds: Seq[String] = Nil)

/** Read-side client seam (ListShards / GetShardIterator / GetRecords) —
  * same injection discipline as [[KinesisClient]]: production implements
  * it over the signed HTTP transport (AwsKinesisClient), tests use
  * [[FakeKinesisStream]]. A class may implement both traits; the DSv2
  * source requires the read side of whatever the registry hands back.
  */
trait KinesisReadClient extends Serializable {
  def listShards(): Seq[ShardInfo]
  /** `afterSequence` None → TRIM_HORIZON (oldest available); Some(seq) →
    * AFTER_SEQUENCE_NUMBER. None result = shard closed and expired.
    */
  def getShardIterator(
      shardId: String, afterSequence: Option[String]): Option[String]
  def getRecords(iterator: String, limit: Int): GetRecordsPage
}

/** In-memory Kinesis stream implementing BOTH seams — the round-trip
  * fixture: records written through [[KinesisClient.putRecords]] land in
  * `nShards` shards (partition-key hash, every put acknowledged) with
  * monotonically increasing zero-padded sequence numbers, and are served
  * back through the [[KinesisReadClient]] API with iterators encoded as
  * (shard, index) cursors. Thread-safe: the DSv2 sink writes from task
  * threads while the source's driver probe reads.
  */
final class FakeKinesisStream(nShards: Int = 2) extends KinesisClient
    with KinesisReadClient {
  private val lock = new Object
  private val shards =
    mutable.ArrayBuffer.fill(nShards)(mutable.ArrayBuffer[ReadRecord]())
  private val closed = mutable.Set[Int]()
  private val parents = mutable.Map[Int, Seq[String]]()
  private var seq = 0L

  private def shardIdx(partitionKey: String): Int = lock.synchronized {
    // writes route only to OPEN shards (Kinesis reassigns hash ranges
    // on reshard; this fake redistributes by key hash over open shards)
    val open = shards.indices.filterNot(closed)
    require(open.nonEmpty,
      "no open shards — real Kinesis always keeps the hash range covered; " +
        "addShard() before closing the last one")
    open(math.floorMod(partitionKey.hashCode, open.size))
  }

  override def putRecords(records: Seq[KinesisRecord]): PutRecordsResult =
    lock.synchronized {
      records.foreach { r =>
        seq += 1
        shards(shardIdx(r.partitionKey)) +=
          ReadRecord(f"$seq%020d", r.partitionKey, r.data, arrivalEpochMs = seq)
      }
      PutRecordsResult(None, Seq.fill(records.size)(RecordResult()))
    }

  override def listShards(): Seq[ShardInfo] =
    lock.synchronized(shards.indices.map(i =>
      ShardInfo(f"shardId-$i%012d", parents.getOrElse(i, Nil))))

  override def getShardIterator(
      shardId: String, afterSequence: Option[String]): Option[String] =
    lock.synchronized {
      val idx = shardOf(shardId)
      val from = afterSequence match {
        case None => 0
        case Some(s) =>
          val i = shards(idx).indexWhere(_.sequenceNumber == s)
          require(i >= 0, s"unknown sequence number $s in $shardId")
          i + 1
      }
      Some(s"$shardId:$from")
    }

  override def getRecords(iterator: String, limit: Int): GetRecordsPage =
    lock.synchronized {
      val sep = iterator.lastIndexOf(':')
      val idx = shardOf(iterator.substring(0, sep))
      val from = iterator.substring(sep + 1).toInt
      val buf = shards(idx)
      val page = buf.slice(from, from + math.max(1, limit)).toSeq
      val after = from + page.size
      // a CLOSED shard whose records are fully consumed ends: no
      // continuation iterator (the real API's NextShardIterator = null)
      val next =
        if (closed(idx) && after >= buf.size) None
        else Some(s"${iterator.substring(0, sep)}:$after")
      GetRecordsPage(page, next,
        millisBehindLatest = Some((buf.size - after).toLong.max(0)))
    }

  private def shardOf(shardId: String): Int =
    shardId.substring(shardId.lastIndexOf('-') + 1).toInt

  /** Test helper: total records currently stored, per shard. */
  def shardSizes: Seq[Int] = lock.synchronized(shards.map(_.size).toSeq)

  /** Test helper: add a new (empty) shard mid-stream — the reshard
    * split/merge case. `parentIds` records the reshard lineage the
    * source uses to hold the child back until its parents drain.
    */
  def addShard(parentIds: String*): String = lock.synchronized {
    shards += mutable.ArrayBuffer[ReadRecord]()
    val id = f"shardId-${shards.size - 1}%012d"
    if (parentIds.nonEmpty) parents(shards.size - 1) = parentIds.toSeq
    id
  }

  /** Test helper: close a shard — no more writes route to it, and its
    * iterator ends (None) once drained.
    */
  def closeShard(shardId: String): Unit =
    lock.synchronized { closed += shardOf(shardId); () }

  /** Test helper: append a record DIRECTLY to a shard (bypasses the
    * partition-key hash — for planting data in a specific shard).
    */
  def inject(shardId: String, partitionKey: String,
      data: Array[Byte]): Unit = lock.synchronized {
    seq += 1
    shards(shardOf(shardId)) +=
      ReadRecord(f"$seq%020d", partitionKey, data, arrivalEpochMs = seq)
  }
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
