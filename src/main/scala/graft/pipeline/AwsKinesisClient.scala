package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.Base64

/** Pure-JVM Kinesis PutRecords client (K8) behind the [[KinesisClient]]
  * seam — no AWS SDK. Speaks the public Kinesis HTTP API the reference's
  * vendored client uses (go-kinesis kinesis.go:450-460): POST to the
  * regional endpoint `https://kinesis.<region>.amazonaws.com` with
  * `X-Amz-Target: Kinesis_20131202.PutRecords`, an
  * `application/x-amz-json-1.1` body, SigV4-signed ([[SigV4]]).
  *
  * The transport is injectable so every layer above the socket is
  * unit-tested offline (AwsKinesisClientSpec): request shape, signing
  * headers, response mapping (per-record ErrorCode vs request-level
  * error). The default transport is `java.net.http.HttpClient`.
  *
  * Wire shapes (public API):
  * {{{
  *   → {"StreamName":"s","Records":[{"Data":"<base64>","PartitionKey":"k"}]}
  *   ← {"FailedRecordCount":1,"Records":[
  *        {"SequenceNumber":"...","ShardId":"..."} |
  *        {"ErrorCode":"...","ErrorMessage":"..."}]}
  * }}}
  */
final class AwsKinesisClient(
    streamName: String,
    region: String,
    creds: CredentialsProvider,
    transport: AwsKinesisClient.Transport = AwsKinesisClient.httpTransport,
    now: () => Instant = () => Instant.now(),
    endpointOverride: Option[String] = None)
    extends KinesisClient with KinesisReadClient {

  def this(streamName: String, region: String, creds: SigV4.Credentials) =
    this(streamName, region, CredentialsProvider.Static(creds))

  private val url = endpointOverride
    .getOrElse(s"https://kinesis.$region.amazonaws.com/") // kinesis.go:31
  // The SIGNED host must be the host actually sent on the wire — signing
  // the regional endpoint while an override (LocalStack, VPC endpoint)
  // sends its own Host header guarantees SignatureDoesNotMatch.
  private val host = {
    val u = java.net.URI.create(url)
    u.getHost + (if (u.getPort > 0) s":${u.getPort}" else "")
  }

  override def putRecords(records: Seq[KinesisRecord]): PutRecordsResult = {
    val body = requestJson(records).getBytes(UTF_8)
    // resolve per request: renewable providers (instance metadata,
    // AssumeRole) hand back fresh keys after their expiry
    val at = now()
    val signed = SigV4.sign(
      method = "POST", host = host, path = "/", query = Nil,
      headers = Map(
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "Kinesis_20131202.PutRecords"),
      body = body, region = region, service = "kinesis",
      creds = creds.credentials(at), now = at)
    try {
      val (status, respBody) = transport(url, signed, body)
      parseResponse(status, respBody)
    } catch {
      case e: java.io.IOException =>
        PutRecordsResult(Some(s"transport: ${e.getMessage}"), Nil)
    }
  }

  /** One signed control call: target + JSON body → parsed 2xx object.
    * Non-2xx throws IOException with the service `__type` (read-side
    * errors fail the Spark task; the engine's retry replays the batch —
    * contrast putRecords, whose per-record errors feed the K4–K6
    * retry/drop machinery instead).
    */
  private def callJson(target: String, bodyJson: String): Map[String, Any] = {
    val body = bodyJson.getBytes(UTF_8)
    val at = now()
    val signed = SigV4.sign(
      method = "POST", host = host, path = "/", query = Nil,
      headers = Map(
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> s"Kinesis_20131202.$target"),
      body = body, region = region, service = "kinesis",
      creds = creds.credentials(at), now = at)
    val (status, respBody) = transport(url, signed, body)
    val json = try MiniJson.parse(respBody) catch { case _: Exception => null }
    if (status / 100 != 2) {
      val errType = json match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].get("__type")
          .map(_.toString).getOrElse(s"HTTP $status")
        case _ => s"HTTP $status"
      }
      throw new java.io.IOException(s"$target: $errType")
    }
    json match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new java.io.IOException(s"$target: unparseable response")
    }
  }

  /** All shards of the stream with reshard lineage (ParentShardId +
    * AdjacentParentShardId), following ListShards pagination.
    */
  override def listShards(): Seq[ShardInfo] = {
    val out = scala.collection.mutable.ArrayBuffer[ShardInfo]()
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      // NextToken requests must NOT repeat StreamName (public API rule)
      val body = token match {
        case Some(t) => s"""{"NextToken":${MiniJson.quote(t)}}"""
        case None => s"""{"StreamName":${MiniJson.quote(streamName)}}"""
      }
      val obj = callJson("ListShards", body)
      obj.get("Shards") match {
        case Some(l: List[_]) => l.foreach {
          case s: Map[_, _] =>
            val sm = s.asInstanceOf[Map[String, Any]]
            sm.get("ShardId").flatMap(Option(_)).foreach { id =>
              val ps = Seq("ParentShardId", "AdjacentParentShardId")
                .flatMap(k => sm.get(k).flatMap(Option(_)).map(_.toString))
              out += ShardInfo(id.toString, ps)
            }
          case _ => ()
        }
        case _ => ()
      }
      // flatMap(Option(_)): the service may serialize an explicit JSON
      // null ("NextToken":null) — Some(null).map(_.toString) would NPE
      token = obj.get("NextToken").flatMap(Option(_)).map(_.toString)
    }
    out.toSeq
  }

  override def getShardIterator(
      shardId: String, afterSequence: Option[String]): Option[String] = {
    val body = afterSequence match {
      case Some(seq) =>
        s"""{"StreamName":${MiniJson.quote(streamName)},"ShardId":${MiniJson.quote(shardId)},""" +
          s""""ShardIteratorType":"AFTER_SEQUENCE_NUMBER","StartingSequenceNumber":${MiniJson.quote(seq)}}"""
      case None =>
        s"""{"StreamName":${MiniJson.quote(streamName)},"ShardId":${MiniJson.quote(shardId)},""" +
          s""""ShardIteratorType":"TRIM_HORIZON"}"""
    }
    try callJson("GetShardIterator", body).get("ShardIterator")
      .flatMap(Option(_)).map(_.toString)
    catch {
      // The service's ACTUAL expiry signal is a 4xx, not a null
      // iterator: InvalidArgumentException when a committed sequence
      // number has aged past retention, ResourceNotFoundException when
      // the shard is gone. The trait contract (Kinesis.scala) maps
      // "closed and expired" to None so the source marks the shard
      // drained and moves on — without this mapping the driver would
      // re-throw on every trigger and the query would wedge on a
      // position that can never become valid again. A TRIM_HORIZON
      // request (no committed position) failing is a real error and
      // still propagates.
      case e: java.io.IOException if afterSequence.isDefined &&
          Option(e.getMessage).exists(m =>
            m.contains("InvalidArgumentException") ||
              m.contains("ResourceNotFoundException")) => None
    }
  }

  override def getRecords(iterator: String, limit: Int): GetRecordsPage = {
    val body =
      s"""{"ShardIterator":${MiniJson.quote(iterator)},"Limit":${math.max(1, limit)}}"""
    val obj = callJson("GetRecords", body)
    val recs = obj.get("Records") match {
      case Some(l: List[_]) => l.collect { case r: Map[_, _] =>
        val rm = r.asInstanceOf[Map[String, Any]]
        ReadRecord(
          sequenceNumber = rm.get("SequenceNumber").map(_.toString).getOrElse(""),
          partitionKey = rm.get("PartitionKey").map(_.toString).getOrElse(""),
          data = rm.get("Data").map(d =>
            Base64.getDecoder.decode(d.toString)).getOrElse(Array.emptyByteArray),
          // epoch SECONDS with fraction on the wire → ms
          arrivalEpochMs = rm.get("ApproximateArrivalTimestamp") match {
            case Some(d: Double) => (d * 1000.0).toLong
            case _ => 0L
          })
      }
      case _ => Nil
    }
    GetRecordsPage(
      records = recs,
      // a closed, fully-drained shard returns "NextShardIterator":null
      // on the wire (documented API) — must map to None, not NPE
      nextIterator = obj.get("NextShardIterator").flatMap(Option(_))
        .map(_.toString),
      // absent on the wire stays ABSENT (None): the metric is optional
      // and approximate — mapping omission to 0 would read as "tip
      // reached" and stall a backlogged shard at one page per trigger
      millisBehindLatest = obj.get("MillisBehindLatest") match {
        case Some(d: Double) => Some(d.toLong)
        case _ => None
      })
  }

  private def requestJson(records: Seq[KinesisRecord]): String = {
    val sb = new StringBuilder
    sb.append("""{"StreamName":""").append(MiniJson.quote(streamName))
      .append(""","Records":[""")
    records.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) sb.append(',')
      sb.append("""{"Data":""")
        .append(MiniJson.quote(Base64.getEncoder.encodeToString(r.data)))
        .append(""","PartitionKey":""").append(MiniJson.quote(r.partitionKey))
        .append('}')
    }
    sb.append("]}")
    sb.toString
  }

  private def parseResponse(status: Int, body: String): PutRecordsResult = {
    val json = try MiniJson.parse(body) catch {
      case _: Exception => null
    }
    if (status / 100 != 2) {
      val errType = json match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get("__type")
            .map(_.toString).getOrElse(s"HTTP $status")
        case _ => s"HTTP $status"
      }
      return PutRecordsResult(Some(errType), Nil)
    }
    json match {
      case m: Map[_, _] =>
        val obj = m.asInstanceOf[Map[String, Any]]
        val recs = obj.get("Records") match {
          case Some(l: List[_]) => l.map {
            case r: Map[_, _] =>
              val rm = r.asInstanceOf[Map[String, Any]]
              RecordResult(
                errorCode = rm.get("ErrorCode").map(_.toString).getOrElse(""),
                errorMessage = rm.get("ErrorMessage").map(_.toString).getOrElse(""))
            case _ => RecordResult()
          }
          case _ => Nil
        }
        PutRecordsResult(None, recs)
      case _ =>
        PutRecordsResult(Some("unparseable response"), Nil)
    }
  }
}

object AwsKinesisClient {
  /** (url, headers, body) → (status, response body). */
  type Transport = (String, Map[String, String], Array[Byte]) => (Int, String)

  /** Production transport on the JDK HTTP client (HTTPS + connection
    * reuse; one client per JVM).
    */
  lazy val httpTransport: Transport = {
    val client = java.net.http.HttpClient.newHttpClient()
    (url, headers, body) => {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      // HttpClient sets Host itself and rejects it as a user header
      headers.filterNot(_._1.equalsIgnoreCase("host"))
        .foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  /** Register a factory under `name` for the DSv2 sink option
    * `client=<name>` (KinesisClientRegistry seam).
    */
  def register(
      name: String, streamName: String, region: String,
      creds: SigV4.Credentials): Unit =
    register(name, streamName, region, CredentialsProvider.Static(creds))

  /** Provider variant: renewable credentials (instance metadata /
    * AssumeRole via [[CredentialsProvider.chain]]) behind the same seam.
    */
  def register(
      name: String, streamName: String, region: String,
      creds: CredentialsProvider): Unit =
    graft.sources.KinesisClientRegistry.register(name,
      () => new AwsKinesisClient(streamName, region, creds))
}

/** Minimal JSON reader for the PutRecords response shape (objects, arrays,
  * strings, numbers, booleans, null). Tolerant of whitespace; throws on
  * malformed input. Numbers parse to Double (the response carries only
  * FailedRecordCount ints — lossless well past 2^31).
  */
private[graft] object MiniJson {
  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append("\\u%04x".format(c.toInt))
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.pos == s.length, s"trailing JSON at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def ws(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1
    def expect(c: Char): Unit = {
      require(pos < s.length && s(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    def value(): Any = {
      ws()
      require(pos < s.length, "unexpected end of JSON")
      s(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at $pos")
      pos += word.length; v
    }
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      val m = Map.newBuilder[String, Any]
      if (pos < s.length && s(pos) == '}') { pos += 1; return m.result() }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':')
        m += (k -> value()); ws()
        if (pos < s.length && s(pos) == ',') pos += 1 else more = false
      }
      expect('}'); m.result()
    }
    def arr(): List[Any] = {
      expect('['); ws()
      val b = List.newBuilder[Any]
      if (pos < s.length && s(pos) == ']') { pos += 1; return b.result() }
      var more = true
      while (more) {
        b += value(); ws()
        if (pos < s.length && s(pos) == ',') pos += 1 else more = false
      }
      expect(']'); b.result()
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          s(pos) match {
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case c => sb.append(c)
          }
        } else sb.append(s(pos))
        pos += 1
      }
      pos += 1
      sb.toString
    }
    def num(): Double = {
      val start = pos
      while (pos < s.length && ("+-.eE0123456789".indexOf(s(pos).toInt) >= 0)) pos += 1
      s.substring(start, pos).toDouble
    }
  }
}
