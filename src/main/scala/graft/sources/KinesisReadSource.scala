package graft.sources

import java.util
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.KinesisReadClient

/** Kinesis READ path as a DSv2 micro-batch source — completes the
  * "Kinesis source/sink" pair (the write sink is
  * [[KinesisTableProvider]]; the reference only ever calls PutRecords,
  * kinesis.go:450-460, so this is capability-completion, not parity).
  * Built from the same parts as the sink: the injectable
  * [[graft.pipeline.KinesisReadClient]] seam over the SigV4-signed
  * transport (production = AwsKinesisClient, tests = FakeKinesisStream),
  * looked up by name in [[KinesisClientRegistry]].
  *
  * Offsets are a JSON map shardId → last-consumed sequence number
  * (TailSource's per-file byte-offset map, with opaque ordered strings
  * in place of byte counts): restart-safe, exactly-once per micro-batch,
  * because a (shard, afterSeq, untilSeq] range is immutable in Kinesis
  * and can be replayed deterministically.
  *
  * Per trigger the DRIVER probes each shard (GetShardIterator +
  * GetRecords up to the admission caps) to learn the batch-end sequence
  * numbers — Kinesis has no "what is the latest offset" API, so
  * admission has to read. Executors then re-read their (shard, range)
  * through the same client. The double read is the price of the DSv2
  * offset contract (offsets must be known BEFORE tasks run); it is
  * bounded by the per-trigger caps, and at production scale the knobs
  * that matter are shard count × `maxRecordsPerShardPerTrigger` —
  * per-shard ranges fan out one task per shard, the Kinesis parallelism
  * unit, so a 1000-shard stream reads on 1000 executor slots.
  *
  * Resharding: shards are re-listed every trigger, so new shards are
  * picked up (from TRIM_HORIZON) and closed shards drain to their end.
  * Parent-before-child ordering IS enforced: a child shard (its
  * lineage comes from ListShards' ParentShardId/AdjacentParentShardId)
  * is held back until every listed parent is fully drained — drain
  * state rides in the offset as a `!closed` suffix on the parent's
  * final sequence number, and gating reads the COMMITTED offset, so a
  * child's first records always land in a LATER batch than its
  * parent's last (per-key order across a split/merge is preserved). A
  * parent that has expired out of the listing entirely counts as
  * drained.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-kinesis-source")
  *     .option("client", "myStream")       // KinesisClientRegistry name
  *     .option("maxRecordsPerShardPerTrigger", "1000")
  *     .load()
  *   // → shard_id, sequence_number, partition_key, data, arrival_ts
  * }}}
  */
class KinesisSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kinesis-source"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisReadSource.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisSourceTable(new CaseInsensitiveStringMap(properties))
}

object KinesisReadSource {
  val Schema: StructType = StructType(Seq(
    StructField("shard_id", StringType, nullable = false),
    StructField("sequence_number", StringType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false),
    StructField("arrival_ts", TimestampType, nullable = false)))

  /** Offset-value suffix marking a shard observed closed AND fully
    * consumed (drain state must live in the offset: child-shard gating
    * reads committed state only). '!' cannot appear in a sequence
    * number, so stripping is unambiguous.
    */
  val ClosedSuffix = "!closed"

  def stripClosed(v: String): String = v.stripSuffix(ClosedSuffix)

  def isClosed(v: String): Boolean = v.endsWith(ClosedSuffix)

  /** Resolve the registry entry and require its read side. */
  def readClient(name: String): KinesisReadClient =
    KinesisClientRegistry.factory(name)() match {
      case r: KinesisReadClient => r
      case other => throw new IllegalArgumentException(
        s"client '$name' (${other.getClass.getName}) does not implement " +
          "KinesisReadClient — register an AwsKinesisClient or FakeKinesisStream")
    }
}

private[sources] class KinesisSourceTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-kinesis-source(${options.getOrDefault("client", "")})"
  override def schema(): StructType = KinesisReadSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new KinesisSourceScan(options)
}

private[sources] class KinesisSourceScan(options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = KinesisReadSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KinesisSourceMicroBatchStream(
      clientName = Option(options.get("client")).getOrElse(
        throw new IllegalArgumentException(
          "graft-kinesis-source requires option 'client'")),
      maxRecordsPerShardPerTrigger = options.getOrDefault(
        "maxRecordsPerShardPerTrigger", "10000").toInt,
      pageLimit = options.getOrDefault("pageLimit", "1000").toInt,
      maxFetchCallsPerShard = options.getOrDefault(
        "maxFetchCallsPerShard", "100").toInt,
      pruneClosedUnlistedAfterTriggers = options.getOrDefault(
        "pruneClosedUnlistedAfterTriggers", "3600").toInt)
}

/** Offset = map(shardId → last-consumed sequence number). Same
  * hand-rolled flat-JSON shape as TailOffset, with STRING values
  * (sequence numbers are opaque ordered strings, not counts).
  */
case class KinesisSourceOffset(seqs: Map[String, String]) extends Offset {
  override def json(): String =
    seqs.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + TailOffset.escape(k) + "\":\"" + TailOffset.escape(v) + "\""
    }.mkString("{", ",", "}")
}

object KinesisSourceOffset {
  /** Parse the flat {"shard":"seq",...} shape written by json() —
    * through MiniJson (which throws on malformed input; a hand parser
    * here would be the third string-escape implementation in the repo,
    * and assert()-based structure checks vanish under -da).
    */
  def fromJson(json: String): KinesisSourceOffset =
    KinesisSourceOffset(
      graft.pipeline.MiniJson.parse(json).asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.toString })
}

private[sources] object KinesisSourceMicroBatchStream {
  /** Consecutive empty pages the admission probe will walk past when
    * the service OMITS MillisBehindLatest (gap vs tip undecidable):
    * crosses short leading gaps while bounding the per-trigger call
    * burn of a metric-omitting caught-up shard. See the probe's match
    * arm for the full tradeoff.
    */
  val MaxBlindGapPages = 10
}

private[sources] class KinesisSourceMicroBatchStream(
    clientName: String, maxRecordsPerShardPerTrigger: Int, pageLimit: Int,
    maxFetchCallsPerShard: Int = 100,
    pruneClosedUnlistedAfterTriggers: Int = 3600)
    extends MicroBatchStream with SupportsAdmissionControl {

  private lazy val client = KinesisReadSource.readClient(clientName)

  // Per-shard count of consecutive triggers the shard was absent from
  // ListShards. Only a CLOSED (fully drained, `!closed`-marked) entry
  // is ever pruned, and only after `pruneClosedUnlistedAfterTriggers`
  // consecutive unlisted triggers (default 3600 ≈ an hour at 1 s
  // triggers — sized against API/IAM incident durations, configurable
  // against the stream's retention): a closed entry is pure gating
  // metadata whose worst case after a wrong prune is a re-drain of
  // already-aged-out data, and pruning it keeps the offset map from
  // growing one entry per reshard forever. An OPEN shard's committed
  // sequence is NEVER pruned — the position is irreplaceable, and a
  // ListShards outage longer than any fixed threshold would otherwise
  // restart the shard from TRIM_HORIZON and re-emit every retained
  // record as duplicates (open entries outlive an outage of any
  // length; they cost ~40 bytes each and only exist while the shard
  // has not drained).
  private val unlistedTriggers = mutable.Map[String, Int]()

  override def initialOffset(): Offset = KinesisSourceOffset(Map.empty)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called (SupportsAdmissionControl)")

  /** Admission probe: walk each shard from its committed sequence number
    * up to the caps; the sequence number of the last record seen becomes
    * the shard's batch-end offset. Kinesis can return EMPTY pages with a
    * live continuation iterator while the iterator ages through gaps
    * (trim-horizon starts, sparse retention windows) — the probe keeps
    * walking those as long as the service reports data ahead
    * (millisBehindLatest > 0), bounded by `maxFetchCallsPerShard` per
    * trigger; any page at the TIP (millisBehind 0) ends the probe.
    * Raise the call cap for streams with very deep leading gaps — probe
    * progress through a gap cannot be checkpointed (offsets are sequence
    * numbers; Kinesis has no positionless cursor), so a gap must be
    * crossed within one trigger's call budget. Committed entries for
    * shards that vanished from the listing are carried forward — OPEN
    * entries indefinitely (a listing outage must never reset progress
    * to TRIM_HORIZON), CLOSED ones for `pruneClosedUnlistedAfterTriggers`
    * consecutive unlisted triggers before being pruned as conclusively
    * expired, which is what keeps the offset JSON bounded on a
    * resharding stream (reshards close parents; closed entries are the
    * ones that accumulate).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val committed = start.asInstanceOf[KinesisSourceOffset].seqs
    var rowBudget = Long.MaxValue
    def absorb(l: ReadLimit): Unit = l match {
      case r: ReadMaxRows => rowBudget = math.min(rowBudget, r.maxRows())
      case c: CompositeReadLimit => c.getReadLimits.foreach(absorb)
      case _ => ()
    }
    absorb(limit)
    val out = mutable.Map[String, String]() ++ committed
    val infos = client.listShards()
    val listed = infos.map(_.shardId).toSet
    // prune CLOSED entries for shards that stayed unlisted long enough
    // to be conclusively expired (not a listing hiccup); a listed shard
    // resets its counter; an open entry is never pruned (see the
    // counter's field comment — its committed position is the only
    // thing standing between an outage and a TRIM_HORIZON re-read)
    committed.keysIterator.foreach { shard =>
      if (listed.contains(shard)) unlistedTriggers.remove(shard)
      else {
        val n = unlistedTriggers.getOrElse(shard, 0) + 1
        unlistedTriggers(shard) = n
        if (n >= pruneClosedUnlistedAfterTriggers &&
            committed.get(shard).exists(KinesisReadSource.isClosed)) {
          out.remove(shard)
          unlistedTriggers.remove(shard)
        }
      }
    }
    // parent gating against COMMITTED state only: a child unlocks in
    // the trigger AFTER its parent's drain commits, so parent and
    // child records can never share a micro-batch. An UNLISTED parent
    // is NOT assumed drained while it still has an open committed
    // entry — during a ListShards outage (the exact scenario the
    // never-prune-open rule above defends against) that parent may
    // still hold unread records, and unlocking the child would emit
    // them out of order when the listing recovers. The child stays
    // gated for the same pruneClosedUnlistedAfterTriggers window; past
    // it the parent is treated as conclusively expired (a true
    // retention expiry never relists) and the child proceeds — the
    // documented residual: an outage LONGER than the threshold that
    // then recovers with undrained parent data reorders across the
    // reshard boundary, traded against a child blocked forever on a
    // genuinely expired parent. A parent with NO committed entry was
    // never read at all — there is no drain state to wait on, and an
    // unlisted never-read parent is almost surely pre-retention
    // history; it gates only while still listed.
    def parentDrained(p: String): Boolean = committed.get(p) match {
      case Some(v) => KinesisReadSource.isClosed(v) ||
        (!listed.contains(p) &&
          unlistedTriggers.getOrElse(p, 0) >= pruneClosedUnlistedAfterTriggers)
      case None => !listed.contains(p)
    }
    val eligible = infos.filter { info =>
      !committed.get(info.shardId).exists(KinesisReadSource.isClosed) &&
        info.parentIds.forall(parentDrained)
    }
    // Fair-share the global row budget across eligible shards instead of
    // draining it in listing order: each shard's allowance is the ceiling
    // of remaining-budget / remaining-shards, so under a sustained
    // ReadMaxRows smaller than shardCount × per-shard volume every shard
    // makes progress each trigger (no tail-latency starvation of shards
    // late in the listing); a quiet shard's unused allowance rolls
    // forward to the shards after it.
    var shardsLeft = eligible.size.toLong
    eligible.foreach { info =>
      val shard = info.shardId
      val committedVal = committed.get(shard)
      val allowance =
        if (rowBudget == Long.MaxValue || shardsLeft <= 1) rowBudget
        else rowBudget / shardsLeft + (if (rowBudget % shardsLeft > 0) 1L else 0L)
      shardsLeft -= 1
      var last: String = null
      var sawEnd = false
      var taken = 0
      var calls = 0
      var shardBudget = allowance
      var it = client.getShardIterator(shard,
        committedVal.map(KinesisReadSource.stripClosed).filter(_.nonEmpty))
      if (it.isEmpty) sawEnd = true // iterator expired: closed + aged out
      var open = it.isDefined
      var blindEmpty = 0 // consecutive empty pages with NO behind-metric
      while (open && taken < maxRecordsPerShardPerTrigger && shardBudget > 0 &&
          calls < maxFetchCallsPerShard) {
        val want = math.min(pageLimit.toLong,
          math.min((maxRecordsPerShardPerTrigger - taken).toLong, shardBudget)).toInt
        val page = client.getRecords(it.get, want)
        calls += 1
        if (page.records.nonEmpty) {
          last = page.records.last.sequenceNumber
          taken += page.records.size
          shardBudget -= page.records.size
          if (rowBudget != Long.MaxValue) rowBudget -= page.records.size
        }
        page.nextIterator match {
          // a PRESENT millisBehind 0 on ANY page (empty or not) = tip
          // reached — walking on would spend one guaranteed-empty
          // GetRecords per caught-up shard per trigger (20% of the
          // 5-calls/sec shard quota at 1 s triggers), competing with
          // the executors' reads; any residue behind an approximate 0
          // is picked up next trigger. When the response OMITS the
          // metric (None — optional wire field; real Kinesis documents
          // and always sends it, so None means an alternate/fake
          // implementation), a non-empty page keeps the walk going
          // (records prove data flow; treating omission as 0 would cap
          // a backlogged shard at one page per trigger) and an empty
          // page spends one of [[KinesisSourceMicroBatchStream
          // .MaxBlindGapPages]] blind-gap credits — gap progress is not
          // checkpointable (offsets are sequence numbers), so a leading
          // empty gap must be crossed within one trigger's walk or the
          // shard re-walks it every trigger; the credit bound crosses
          // short gaps while capping what a metric-omitting CAUGHT-UP
          // shard burns per trigger at MaxBlindGapPages + 1 calls (the
          // credit-spending empties plus the page that stops it). A
          // metric-omitting service with leading gaps wider than the
          // credit needs the metric (that is the honest boundary).
          case Some(n) if page.millisBehindLatest.exists(_ > 0) =>
            blindEmpty = 0
            it = Some(n) // keep walking: data ahead (possibly past a gap)
          case Some(n) if page.millisBehindLatest.isEmpty &&
              (page.records.nonEmpty ||
                blindEmpty < KinesisSourceMicroBatchStream.MaxBlindGapPages) =>
            blindEmpty = if (page.records.nonEmpty) 0 else blindEmpty + 1
            it = Some(n) // metric absent: walk on records / gap credits
          case Some(_) => open = false // tip (present 0, or credits spent)
          case None => open = false; sawEnd = true // closed and drained
        }
      }
      val base = if (last != null) last
        else committedVal.map(KinesisReadSource.stripClosed).getOrElse("")
      if (sawEnd)
        out(shard) = base + KinesisReadSource.ClosedSuffix
      else if (last != null) out(shard) = last
    }
    KinesisSourceOffset(out.toMap)
  }

  override def deserializeOffset(json: String): Offset =
    KinesisSourceOffset.fromJson(json)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KinesisSourceOffset].seqs
    val e = end.asInstanceOf[KinesisSourceOffset].seqs
    e.flatMap { case (shard, endVal) =>
      val untilSeq = KinesisReadSource.stripClosed(endVal)
      val after = s.get(shard)
        .map(KinesisReadSource.stripClosed).filter(_.nonEmpty)
      // no partition when the shard made no sequence progress — incl. a
      // drain-mark-only commit (marker added, same final seq) and a
      // never-read shard that went straight to closed ("" + marker)
      if (untilSeq.isEmpty || after.contains(untilSeq)) None
      else Some(KinesisInputPartition(clientName, shard, after, untilSeq, pageLimit))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[KinesisInputPartition]
      new KinesisPartitionReader(
        p.clientName, p.shardId, p.afterSeq, p.untilSeq, p.pageLimit)
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class KinesisInputPartition(
    clientName: String, shardId: String, afterSeq: Option[String],
    untilSeq: String, pageLimit: Int) extends InputPartition

/** Replays one shard's (afterSeq, untilSeq] range — deterministic
  * because a committed Kinesis range is immutable. Emits records in
  * shard order INCLUSIVE of untilSeq, then stops; failing to reach
  * untilSeq (expired range) throws, failing the task so the engine's
  * retry surfaces the data loss instead of silently committing short.
  */
private[sources] class KinesisPartitionReader(
    clientName: String, shardId: String, afterSeq: Option[String],
    untilSeq: String, pageLimit: Int = 1000)
    extends PartitionReader[InternalRow] {

  private lazy val client = KinesisReadSource.readClient(clientName)
  private val shardUtf8 = UTF8String.fromString(shardId)
  private var it: Option[String] = null
  private var page: Iterator[graft.pipeline.ReadRecord] = Iterator.empty
  private var current: graft.pipeline.ReadRecord = _
  private var done = false

  override def next(): Boolean = {
    if (done) return false
    if (it == null) it = client.getShardIterator(shardId, afterSeq)
    var emptyCalls = 0
    while (!page.hasNext) {
      it match {
        case Some(cursor) =>
          val p = client.getRecords(cursor, pageLimit)
          if (p.records.isEmpty) {
            // empty pages mid-range are normal (iterator aging through a
            // gap) — but the TIP without having seen untilSeq means the
            // committed end expired out of retention: surface the loss.
            // MillisBehindLatest is an APPROXIMATE metric, so one
            // empty-at-tip page is not proof of expiry — tolerate a few
            // before declaring the committed range gone; an OMITTED
            // metric (None) is no tip evidence at all and falls through
            // to the plain no-progress cap; a drained CLOSED shard
            // (null next iterator) is conclusive immediately. The call
            // cap guards against a service that reports data behind but
            // never yields it.
            emptyCalls += 1
            if (p.nextIterator.isEmpty)
              throw new java.io.IOException(
                s"$shardId: range ended before sequence $untilSeq (expired?)")
            if (p.millisBehindLatest.exists(_ <= 0) && emptyCalls > 3)
              throw new java.io.IOException(
                s"$shardId: still at the tip before sequence $untilSeq " +
                  s"after $emptyCalls empty pages (expired?)")
            if (emptyCalls > 10000)
              throw new java.io.IOException(
                s"$shardId: no progress toward sequence $untilSeq " +
                  s"after $emptyCalls empty pages")
          }
          page = p.records.iterator
          it = p.nextIterator
        case None =>
          throw new java.io.IOException(
            s"$shardId: shard iterator expired before sequence $untilSeq")
      }
    }
    current = page.next()
    if (current.sequenceNumber == untilSeq) done = true
    else if (BigInt(current.sequenceNumber) > BigInt(untilSeq))
      // sequence numbers are numeric strings; sailing past untilSeq means
      // the committed end expired out of the retention window — surface
      // the loss, never commit short
      throw new java.io.IOException(
        s"$shardId: passed sequence $untilSeq without seeing it (expired?)")
    true
  }

  override def get(): InternalRow =
    InternalRow(
      shardUtf8,
      UTF8String.fromString(current.sequenceNumber),
      UTF8String.fromString(current.partitionKey),
      current.data,
      current.arrivalEpochMs * 1000L) // TimestampType = micros

  override def close(): Unit = ()
}
