package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{AwsKinesisClient, CredentialsProvider, FakeKinesisStream, SigV4}
import graft.sources.{KinesisClientRegistry, KinesisSourceOffset}

/** The Kinesis READ path (VERDICT r4 item #4): offset codec, the signed
  * wire shapes of the three read calls through a scripted transport, and
  * the full DSv2 round trip — records written through the graft-kinesis
  * SINK come back through the graft-kinesis-source SOURCE exactly once,
  * in per-shard order, across multiple capped micro-batches.
  */
class KinesisSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------------- offsets

  test("offset json round-trips, including escapes and empty maps") {
    val o = KinesisSourceOffset(Map(
      "shardId-000000000000" -> "49590338271490256608559692538361571095921575989136588898",
      "we\"ird\\shard" -> "123"))
    assert(KinesisSourceOffset.fromJson(o.json()) == o)
    val empty = KinesisSourceOffset(Map.empty)
    assert(empty.json() == "{}")
    assert(KinesisSourceOffset.fromJson("{}") == empty)
  }

  // ------------------------------------------------------------ wire shapes

  private def scripted(
      responses: Seq[(Int, String)]): (AwsKinesisClient,
      scala.collection.mutable.ArrayBuffer[(String, Map[String, String], String)]) = {
    val calls =
      scala.collection.mutable.ArrayBuffer[(String, Map[String, String], String)]()
    val it = Iterator(responses: _*)
    val client = new AwsKinesisClient(
      streamName = "logs", region = "us-east-1",
      creds = CredentialsProvider.Static(
        SigV4.Credentials("AKIDEXAMPLE", "secret", None)),
      transport = (url, headers, body) => {
        calls += ((url, headers, new String(body, UTF_8)))
        it.next()
      },
      now = () => Instant.parse("2026-01-01T00:00:00Z"))
    (client, calls)
  }

  test("listShards follows NextToken pagination and signs each call") {
    val (client, calls) = scripted(Seq(
      (200, """{"Shards":[{"ShardId":"shardId-000000000000","ParentShardId":null}],"NextToken":"t1"}"""),
      (200, """{"Shards":[{"ShardId":"shardId-000000000002",""" +
        """"ParentShardId":"shardId-000000000000","AdjacentParentShardId":"shardId-000000000001"}]}""")))
    assert(client.listShards() == Seq(
      graft.pipeline.ShardInfo("shardId-000000000000", Nil),
      graft.pipeline.ShardInfo("shardId-000000000002",
        Seq("shardId-000000000000", "shardId-000000000001"))))
    assert(calls.size == 2)
    assert(calls(0)._2("x-amz-target") == "Kinesis_20131202.ListShards")
    assert(calls(0)._3 == """{"StreamName":"logs"}""")
    // NextToken requests must not repeat StreamName (public API rule)
    assert(calls(1)._3 == """{"NextToken":"t1"}""")
    assert(calls.forall(_._2.contains("Authorization")),
      "every control call must be SigV4-signed")
  }

  test("getShardIterator sends TRIM_HORIZON or AFTER_SEQUENCE_NUMBER") {
    val (client, calls) = scripted(Seq(
      (200, """{"ShardIterator":"it-0"}"""),
      (200, """{"ShardIterator":"it-1"}""")))
    assert(client.getShardIterator("shardId-000000000000", None) == Some("it-0"))
    assert(calls(0)._3.contains(""""ShardIteratorType":"TRIM_HORIZON""""))
    assert(!calls(0)._3.contains("StartingSequenceNumber"))
    assert(client.getShardIterator("shardId-000000000000", Some("42")) == Some("it-1"))
    assert(calls(1)._3.contains(""""ShardIteratorType":"AFTER_SEQUENCE_NUMBER""""))
    assert(calls(1)._3.contains(""""StartingSequenceNumber":"42""""))
    assert(calls(1)._2("x-amz-target") == "Kinesis_20131202.GetShardIterator")
  }

  test("getRecords decodes data, arrival time, and the continuation iterator") {
    val b64 = java.util.Base64.getEncoder.encodeToString("payload".getBytes(UTF_8))
    val (client, calls) = scripted(Seq((200,
      s"""{"Records":[{"SequenceNumber":"7","PartitionKey":"pk",""" +
        s""""Data":"$b64","ApproximateArrivalTimestamp":1.7E9}],""" +
        s""""NextShardIterator":"it-next","MillisBehindLatest":250}""")))
    val page = client.getRecords("it-0", 500)
    assert(calls(0)._2("x-amz-target") == "Kinesis_20131202.GetRecords")
    assert(calls(0)._3 == """{"ShardIterator":"it-0","Limit":500}""")
    assert(page.records.size == 1)
    val r = page.records.head
    assert(r.sequenceNumber == "7" && r.partitionKey == "pk")
    assert(new String(r.data, UTF_8) == "payload")
    assert(r.arrivalEpochMs == 1700000000000L)
    assert(page.nextIterator == Some("it-next"))
    assert(page.millisBehindLatest.contains(250L))
  }

  test("a service error surfaces as IOException with the error __type") {
    val (client, _) = scripted(Seq(
      (400, """{"__type":"ExpiredIteratorException","message":"too old"}""")))
    val e = intercept[java.io.IOException](client.getRecords("stale", 10))
    assert(e.getMessage.contains("ExpiredIteratorException"))
  }

  test("explicit JSON null NextShardIterator / ShardIterator map to None, not NPE") {
    val b64 = java.util.Base64.getEncoder.encodeToString("x".getBytes(UTF_8))
    val (client, _) = scripted(Seq(
      (200, s"""{"Records":[{"SequenceNumber":"9","PartitionKey":"p","Data":"$b64"}],""" +
        s""""NextShardIterator":null,"MillisBehindLatest":0}"""),
      (200, """{"ShardIterator":null}""")))
    val page = client.getRecords("it-last", 10)
    assert(page.records.size == 1 && page.nextIterator.isEmpty,
      "a drained closed shard returns records with no continuation")
    assert(client.getShardIterator("shardId-000000000000", None).isEmpty,
      "an expired shard's null iterator maps to None")
  }

  /** A shard whose retained data sits past several EMPTY pages (aged
    * trim-horizon start): real GetRecords returns empty pages with a
    * live continuation and millisBehindLatest > 0 until the iterator
    * reaches the data. The probe must walk through the gap — stopping
    * at the first empty page stalls the source forever.
    */
  private class GapShardClient extends graft.pipeline.KinesisClient
      with graft.pipeline.KinesisReadClient {
    import graft.pipeline.{GetRecordsPage, ReadRecord}
    val shard = "shardId-000000000000"
    override def putRecords(records: Seq[graft.pipeline.KinesisRecord])
        : graft.pipeline.PutRecordsResult =
      fail("read-only fixture")
    private def rec(seq: String, p: String) =
      ReadRecord(seq, "k", p.getBytes(UTF_8), seq.toLong)
    override def listShards(): Seq[graft.pipeline.ShardInfo] =
      Seq(graft.pipeline.ShardInfo(shard))
    override def getShardIterator(
        shardId: String, after: Option[String]): Option[String] = after match {
      case None => Some("it-0")
      case Some("1") => Some("it-4")
      case Some("2") => Some("it-5")
      case Some(other) => fail(s"unexpected resume point $other")
    }
    override def getRecords(it: String, limit: Int): GetRecordsPage = it match {
      case "it-0" | "it-1" | "it-2" => // the gap: empty but data ahead
        GetRecordsPage(Nil, Some("it-" + (it.drop(3).toInt + 1)), Some(100L))
      case "it-3" =>
        GetRecordsPage(Seq(rec("1", "a"), rec("2", "b")), Some("it-5"), Some(0L))
      case "it-4" =>
        GetRecordsPage(Seq(rec("2", "b")), Some("it-5"), Some(0L))
      case "it-5" => GetRecordsPage(Nil, Some("it-5"), Some(0L)) // the tip
      case other => fail(s"unexpected iterator $other")
    }
  }

  test("probe and reader cross an empty-page gap instead of stalling") {
    KinesisClientRegistry.register("gap-stream", () => new GapShardClient)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kgap").toString
    val q = spark.readStream.format("graft-kinesis-source")
      .option("client", "gap-stream")
      .load()
      .selectExpr("sequence_number", "CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName("kgap_out")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("kgap_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("1", "a"), ("2", "b")),
      s"records beyond the gap must be read exactly once: $got")
  }

  test("an omitted MillisBehindLatest maps to None — absent is not tip") {
    val (client, _) = scripted(Seq(
      (200, """{"Records":[],"NextShardIterator":"it-next"}""")))
    val page = client.getRecords("it-0", 10)
    assert(page.millisBehindLatest.isEmpty,
      "the optional wire metric must stay absent, not collapse to 0")
  }

  /** A service whose GetRecords responses OMIT MillisBehindLatest
    * entirely: the probe must keep walking while pages carry records
    * (records prove data flow) and, on empty pages, walk on through up
    * to MaxBlindGapPages blind-gap credits before stopping — under the
    * old absent→0 mapping every page read as "tip reached" and a
    * backlogged shard degraded to one page per trigger. (The p3
    * self-loop below therefore costs the probe MaxBlindGapPages + 1
    * calls at the tip — the documented price of a metric-omitting
    * service.)
    */
  private class NoMetricClient extends graft.pipeline.KinesisClient
      with graft.pipeline.KinesisReadClient {
    import graft.pipeline.{GetRecordsPage, ReadRecord}
    val shard = "shardId-000000000000"
    override def putRecords(records: Seq[graft.pipeline.KinesisRecord])
        : graft.pipeline.PutRecordsResult =
      fail("read-only fixture")
    private def rec(seq: String, p: String) =
      ReadRecord(seq, "k", p.getBytes(UTF_8), seq.toLong)
    override def listShards(): Seq[graft.pipeline.ShardInfo] =
      Seq(graft.pipeline.ShardInfo(shard))
    override def getShardIterator(
        shardId: String, after: Option[String]): Option[String] = after match {
      case None => Some("p0")
      case Some("3") => Some("p3") // reader resume past the final record
      case Some(other) => fail(s"unexpected resume point $other")
    }
    override def getRecords(it: String, limit: Int): GetRecordsPage = it match {
      case "p0" => GetRecordsPage(Seq(rec("1", "a")), Some("p1"), None)
      case "p1" => GetRecordsPage(Seq(rec("2", "b")), Some("p2"), None)
      case "p2" => GetRecordsPage(Seq(rec("3", "c")), Some("p3"), None)
      case "p3" => GetRecordsPage(Nil, Some("p3"), None)
      case other => fail(s"unexpected iterator $other")
    }
  }

  test("absent millisBehindLatest: probe walks record-bearing pages in ONE trigger") {
    KinesisClientRegistry.register("nometric-stream", () => new NoMetricClient)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-knm").toString
    val q = spark.readStream.format("graft-kinesis-source")
      .option("client", "nometric-stream")
      .load()
      .selectExpr("CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName("knm_out")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination(30000)
    val got = spark.table("knm_out").collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b", "c"),
      s"one trigger must admit every record-bearing page, got: $got")
  }

  /** Listing-visibility wrapper: hides chosen shards from ListShards
    * while leaving reads intact — the ListShards-outage fixture.
    */
  private class HidableStream(val inner: FakeKinesisStream)
      extends graft.pipeline.KinesisClient with graft.pipeline.KinesisReadClient {
    @volatile var hidden: Set[String] = Set.empty
    override def putRecords(records: Seq[graft.pipeline.KinesisRecord])
        : graft.pipeline.PutRecordsResult = inner.putRecords(records)
    override def listShards(): Seq[graft.pipeline.ShardInfo] =
      inner.listShards().filterNot(s => hidden(s.shardId))
    override def getShardIterator(
        shardId: String, after: Option[String]): Option[String] =
      inner.getShardIterator(shardId, after)
    override def getRecords(it: String, limit: Int): graft.pipeline.GetRecordsPage =
      inner.getRecords(it, limit)
  }

  /** Latest committed source-offset JSON from a streaming checkpoint
    * (offsets/<batchId>: version line, metadata line, then one offset
    * line per source — ours is the only source).
    */
  private def latestOffsetJson(ckpt: String): String = {
    val dir = new java.io.File(ckpt, "offsets")
    val f = dir.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    val src = scala.io.Source.fromFile(f)
    try src.getLines().toSeq.last finally src.close()
  }

  test("an OPEN shard's committed offset survives any ListShards outage; " +
      "a CLOSED one prunes after the threshold") {
    val stream = new HidableStream(new FakeKinesisStream(nShards = 2))
    KinesisClientRegistry.register("hide-stream", () => stream)
    val s0 = "shardId-000000000000"
    val s1 = "shardId-000000000001"
    stream.inner.inject(s0, "k0", "a".getBytes(UTF_8))
    stream.inner.inject(s1, "k1", "b".getBytes(UTF_8))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-khide").toString
    val q = spark.readStream.format("graft-kinesis-source")
      .option("client", "hide-stream")
      .option("pruneClosedUnlistedAfterTriggers", "1") // worst case: 1 trigger
      .load()
      .selectExpr("CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName("khide_out")
      .option("checkpointLocation", ckpt)
      .start()
    // force at least one more committed trigger after a state change
    def kick(tag: Int): Unit = {
      stream.inner.inject(s1, "k1", s"kick$tag".getBytes(UTF_8))
      q.processAllAvailable()
    }
    try {
      q.processAllAvailable() // both shards committed
      stream.hidden = Set(s0) // outage: s0 vanishes while OPEN
      kick(1); kick(2)        // well past the 1-trigger threshold
      assert(latestOffsetJson(ckpt).contains(s0),
        "an OPEN shard's position is irreplaceable — never pruned, " +
          s"got: ${latestOffsetJson(ckpt)}")
      // close + drain s0, then hide it again: NOW it may prune
      stream.hidden = Set.empty
      stream.inner.inject(s0, "k0", "last".getBytes(UTF_8))
      stream.inner.closeShard(s0)
      q.processAllAvailable() // drains s0, commits the !closed marker
      assert(latestOffsetJson(ckpt).contains(s0 + "\":"),
        "drained shard carries its closed marker before the outage")
      stream.hidden = Set(s0)
      kick(3); kick(4)
      assert(!latestOffsetJson(ckpt).contains(s0),
        "a CLOSED (drained) entry prunes once conclusively expired, " +
          s"got: ${latestOffsetJson(ckpt)}")
    } finally q.stop()
  }

  test("a reshard child stays gated while its UNLISTED parent still has " +
      "an open committed entry (outage must not reorder the split)") {
    val stream = new HidableStream(new FakeKinesisStream(nShards = 1))
    KinesisClientRegistry.register("gate-stream", () => stream)
    val p = "shardId-000000000000"
    stream.inner.inject(p, "k", "p1".getBytes(UTF_8))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kgate").toString
    val q = spark.readStream.format("graft-kinesis-source")
      .option("client", "gate-stream")
      .load()
      .selectExpr("shard_id", "CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName("kgate_out")
      .option("checkpointLocation", ckpt)
      .start()
    def rows(): Set[(String, String)] = spark.table("kgate_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    try {
      q.processAllAvailable() // p committed, still OPEN (no close marker)
      val child = stream.inner.addShard(p)
      stream.inner.inject(child, "k", "c1".getBytes(UTF_8))
      stream.hidden = Set(p) // ListShards outage hides the undrained parent
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows() == Set((p, "p1")),
        "an unlisted parent with an open committed entry may still hold " +
          s"unread records — the child must stay gated: ${rows()}")
      // outage ends; the parent closes and drains, then the child flows
      stream.hidden = Set.empty
      stream.inner.closeShard(p)
      q.processAllAvailable()
      assert(rows() == Set((p, "p1"), (child, "c1")),
        s"child must flow once the recovered parent's drain committed: ${rows()}")
    } finally q.stop()
  }

  test("a shard added mid-stream is picked up; a closed shard drains cleanly") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = new FakeKinesisStream(nShards = 1)
    KinesisClientRegistry.register("reshard-stream", () => stream)
    stream.inject("shardId-000000000000", "k0", "before".getBytes(UTF_8))

    val ckpt = java.nio.file.Files.createTempDirectory("graft-krs").toString
    val q = spark.readStream.format("graft-kinesis-source")
      .option("client", "reshard-stream")
      .load()
      .selectExpr("shard_id", "CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName("krs_out")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // reshard: a new shard appears and receives records; the old shard
      // closes after one final record and must drain to its end
      val newShard = stream.addShard()
      stream.inject(newShard, "k1", "child-1".getBytes(UTF_8))
      stream.inject("shardId-000000000000", "k0", "parent-last".getBytes(UTF_8))
      stream.closeShard("shardId-000000000000")
      q.processAllAvailable()
      stream.inject(newShard, "k1", "child-2".getBytes(UTF_8))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("krs_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("shardId-000000000000", "before"),
      ("shardId-000000000000", "parent-last"),
      ("shardId-000000000001", "child-1"),
      ("shardId-000000000001", "child-2")),
      s"new shard picked up, closed shard drained exactly once: $got")
  }

  test("a child shard is held back until its parent drains (split ordering)") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = new FakeKinesisStream(nShards = 1)
    KinesisClientRegistry.register("split-stream", () => stream)
    val parent = "shardId-000000000000"
    stream.inject(parent, "k", "p1".getBytes(UTF_8))

    val ckpt = java.nio.file.Files.createTempDirectory("graft-ksplit").toString
    val q = spark.readStream.format("graft-kinesis-source")
      .option("client", "split-stream")
      .load()
      .selectExpr("shard_id", "CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName("ksplit_out")
      .option("checkpointLocation", ckpt)
      .start()
    def rows(): Set[(String, String)] = spark.table("ksplit_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    try {
      q.processAllAvailable()
      // split: child appears WITH data while the parent still has an
      // unread record and is not yet closed
      val child = stream.addShard(parent)
      stream.inject(child, "k", "c1".getBytes(UTF_8))
      stream.inject(parent, "k", "p2".getBytes(UTF_8))
      q.processAllAvailable()
      assert(rows() == Set((parent, "p1"), (parent, "p2")),
        s"child must stay gated while the parent is open: ${rows()}")
      // parent closes; the trigger that observes the drain commits the
      // marker, and the child unlocks on the NEXT trigger
      stream.closeShard(parent)
      q.processAllAvailable()
      assert(rows() == Set((parent, "p1"), (parent, "p2"), (child, "c1")),
        s"child must flow once the parent's drain committed: ${rows()}")
    } finally q.stop()
  }

  // -------------------------------------------------------------- round trip

  test("round trip: sink-written records come back exactly once, in shard order") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark
    import s.implicits._

    val stream = new FakeKinesisStream(nShards = 2)
    KinesisClientRegistry.register("rt-stream", () => stream)

    // phase 1: write through the graft-kinesis SINK
    val in = MemoryStream[(Array[Byte], String)]
    val wCkpt = java.nio.file.Files.createTempDirectory("graft-krt-w").toString
    val wq = in.toDF().toDF("data", "partition_key")
      .writeStream.format("graft-kinesis")
      .option("client", "rt-stream")
      .option("checkpointLocation", wCkpt)
      .start()
    val sentKeys = (1 to 25).map(i => (s"payload-$i".getBytes(UTF_8), s"key-$i"))
    try {
      in.addData(sentKeys.take(10): _*)
      wq.processAllAvailable()
      in.addData(sentKeys.drop(10): _*)
      wq.processAllAvailable()
    } finally wq.stop()
    assert(stream.shardSizes.sum == 25, s"sink must deliver all: ${stream.shardSizes}")

    // phase 2: read back through the SOURCE, capped to force >1 batch/shard
    val rCkpt = java.nio.file.Files.createTempDirectory("graft-krt-r").toString
    val rq = spark.readStream.format("graft-kinesis-source")
      .option("client", "rt-stream")
      .option("maxRecordsPerShardPerTrigger", "4")
      .load()
      .selectExpr("shard_id", "sequence_number", "partition_key",
        "CAST(data AS STRING) AS payload")
      .writeStream.format("memory").queryName("krt_out")
      .option("checkpointLocation", rCkpt)
      .start()
    try {
      rq.processAllAvailable()
      // new data arriving AFTER the reader started is picked up too
      stream.putRecords(Seq(
        graft.pipeline.KinesisRecord("late".getBytes(UTF_8), "key-late")))
      rq.processAllAvailable()
    } finally rq.stop()

    val got = spark.table("krt_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.length == 26, s"exactly-once: got ${got.length}")
    assert(got.map(_._4).toSet ==
      (1 to 25).map(i => s"payload-$i").toSet + "late")
    // per-shard order: sequence numbers strictly increase in arrival order
    got.groupBy(_._1).foreach { case (shard, rows) =>
      val seqs = rows.map(_._2).toSeq
      assert(seqs == seqs.sorted,
        s"$shard emitted out of order: $seqs")
      assert(seqs.distinct.size == seqs.size, s"$shard duplicated a sequence")
    }
    // the 4-per-shard-per-trigger cap forced multiple micro-batches
    assert(rq.recentProgress.count(_.numInputRows > 0) >= 2,
      "capped admission must spread the backlog over several batches")
  }
}
