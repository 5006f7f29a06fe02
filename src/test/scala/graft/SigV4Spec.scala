package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import graft.pipeline._
import graft.pipeline.{MiniJson => MiniJson}
import org.scalatest.funsuite.AnyFunSuite

/** SigV4 signing against the published AWS signature test-suite vectors
  * (credential AKIDEXAMPLE, region us-east-1, 2015-08-30T12:36:00Z), plus
  * the PutRecords client's request shape and response mapping through an
  * injected transport — everything above the socket, tested offline.
  */
class SigV4Spec extends AnyFunSuite {

  private val testCreds = SigV4.Credentials(
    "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
  private val testTime = Instant.parse("2015-08-30T12:36:00Z")

  test("AWS test vector get-vanilla: exact signature") {
    val signed = SigV4.sign(
      method = "GET", host = "example.amazonaws.com", path = "/",
      query = Nil, headers = Map.empty, body = Array.emptyByteArray,
      region = "us-east-1", service = "service",
      creds = testCreds, now = testTime)
    assert(signed("Authorization") ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/service/aws4_request, " +
        "SignedHeaders=host;x-amz-date, " +
        "Signature=5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")
    assert(signed("x-amz-date") === "20150830T123600Z")
  }

  test("AWS test vector get-vanilla-query-order-key-case: query canonicalization") {
    val signed = SigV4.sign(
      method = "GET", host = "example.amazonaws.com", path = "/",
      query = Seq("Param2" -> "value2", "Param1" -> "value1"),
      headers = Map.empty, body = Array.emptyByteArray,
      region = "us-east-1", service = "service",
      creds = testCreds, now = testTime)
    assert(signed("Authorization").endsWith(
      "Signature=b97d918cfa904a5beff61c982a1b6f458b799221646efd99d3219ec94cdf2500"))
  }

  test("POST with body: payload hash and extra headers enter the signature") {
    val body = "Action=ListUsers&Version=2010-05-08".getBytes(UTF_8)
    def auth(b: Array[Byte], ct: String) = SigV4.sign(
      method = "POST", host = "iam.amazonaws.com", path = "/",
      query = Nil, headers = Map("content-type" -> ct),
      body = b, region = "us-east-1", service = "iam",
      creds = testCreds, now = testTime)("Authorization")
    val a = auth(body, "application/x-www-form-urlencoded; charset=utf-8")
    assert(a.contains(
      "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request"))
    assert(a.contains("SignedHeaders=content-type;host;x-amz-date"))
    // body and header values are load-bearing: changing either must
    // change the signature (they feed the canonical request hash)
    assert(a !== auth("Action=ListUsers&Version=X".getBytes(UTF_8),
      "application/x-www-form-urlencoded; charset=utf-8"))
    assert(a !== auth(body, "text/plain"))
  }

  test("capitalized caller header keys collide with generated ones, never duplicate") {
    val signed = SigV4.sign(
      method = "GET", host = "example.amazonaws.com", path = "/",
      query = Nil,
      headers = Map("Host" -> "attacker.example", "X-Amz-Date" -> "19990101T000000Z"),
      body = Array.emptyByteArray,
      region = "us-east-1", service = "service",
      creds = testCreds, now = testTime)
    // generated values win; the canonical form carries each header once
    assert(signed("host") === "example.amazonaws.com")
    assert(signed("x-amz-date") === "20150830T123600Z")
    assert(signed("Authorization").contains("SignedHeaders=host;x-amz-date,"))
  }

  test("whitespace-padded header values: signed form == sent form") {
    val padded = SigV4.sign(
      method = "GET", host = "example.amazonaws.com", path = "/",
      query = Nil, headers = Map("x-custom" -> "  v  "),
      body = Array.emptyByteArray,
      region = "us-east-1", service = "service",
      creds = testCreds, now = testTime)
    val clean = SigV4.sign(
      method = "GET", host = "example.amazonaws.com", path = "/",
      query = Nil, headers = Map("x-custom" -> "v"),
      body = Array.emptyByteArray,
      region = "us-east-1", service = "service",
      creds = testCreds, now = testTime)
    // the wire map must carry the SAME value that was signed (trimmed):
    // signing trimmed but sending padded guarantees SignatureDoesNotMatch
    assert(padded("x-custom") === "v")
    assert(padded("Authorization") === clean("Authorization"))
  }

  test("session token is signed as x-amz-security-token") {
    val signed = SigV4.sign(
      method = "GET", host = "example.amazonaws.com", path = "/",
      query = Nil, headers = Map.empty, body = Array.emptyByteArray,
      region = "us-east-1", service = "service",
      creds = testCreds.copy(sessionToken = Some("tok")), now = testTime)
    assert(signed("x-amz-security-token") === "tok")
    assert(signed("Authorization").contains(
      "SignedHeaders=host;x-amz-date;x-amz-security-token"))
  }

  // ---- PutRecords client over a fake transport ---------------------------

  private def clientWith(
      respond: (String, Map[String, String], Array[Byte]) => (Int, String)) = {
    val captured = scala.collection.mutable.ArrayBuffer[(String, Map[String, String], String)]()
    val c = new AwsKinesisClient(
      streamName = "logs", region = "ap-southeast-2",
      creds = CredentialsProvider.Static(testCreds),
      transport = (url, headers, body) => {
        captured += ((url, headers, new String(body, UTF_8)))
        respond(url, headers, body)
      },
      now = () => testTime)
    (c, captured)
  }

  private val okResponse =
    """{"FailedRecordCount":0,"Records":[
      |{"SequenceNumber":"1","ShardId":"shardId-000000000000"},
      |{"SequenceNumber":"2","ShardId":"shardId-000000000001"}]}""".stripMargin

  test("PutRecords request shape: endpoint, target header, base64 body, signed") {
    val (c, captured) = clientWith((_, _, _) => (200, okResponse))
    val res = c.putRecords(Seq(
      KinesisRecord("hi".getBytes(UTF_8), "k1"),
      KinesisRecord(Array[Byte](0, 1, 2), "k2")))
    assert(res.requestError.isEmpty && res.failedCount === 0)
    val (url, headers, body) = captured.head
    assert(url === "https://kinesis.ap-southeast-2.amazonaws.com/") // kinesis.go:31
    assert(headers("x-amz-target") === "Kinesis_20131202.PutRecords")
    assert(headers("content-type") === "application/x-amz-json-1.1")
    assert(headers("Authorization").startsWith(
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/ap-southeast-2/kinesis/aws4_request"))
    val parsed = MiniJson.parse(body).asInstanceOf[Map[String, Any]]
    assert(parsed("StreamName") === "logs")
    val recs = parsed("Records").asInstanceOf[List[Map[String, Any]]]
    assert(recs.map(_("PartitionKey")) === List("k1", "k2"))
    assert(recs.head("Data") === "aGk=") // base64("hi")
    assert(recs(1)("Data") === "AAEC")
  }

  test("partial failure maps per-record ErrorCode") {
    val resp =
      """{"FailedRecordCount":1,"Records":[
        |{"SequenceNumber":"1","ShardId":"s"},
        |{"ErrorCode":"ProvisionedThroughputExceededException",
        | "ErrorMessage":"slow down"}]}""".stripMargin
    val (c, _) = clientWith((_, _, _) => (200, resp))
    val res = c.putRecords(Seq(
      KinesisRecord("a".getBytes(UTF_8), "k"),
      KinesisRecord("b".getBytes(UTF_8), "k")))
    assert(res.requestError.isEmpty)
    assert(res.failedCount === 1)
    assert(res.records.map(_.errorCode) ===
      Seq("", "ProvisionedThroughputExceededException"))
    assert(res.records(1).errorMessage === "slow down")
  }

  test("request-level errors: HTTP error type, transport exception") {
    val (c1, _) = clientWith((_, _, _) =>
      (400, """{"__type":"SerializationException"}"""))
    assert(c1.putRecords(Seq(KinesisRecord("a".getBytes(UTF_8), "k")))
      .requestError === Some("SerializationException"))
    val (c2, _) = clientWith((_, _, _) => throw new java.io.IOException("conn refused"))
    assert(c2.putRecords(Seq(KinesisRecord("a".getBytes(UTF_8), "k")))
      .requestError === Some("transport: conn refused"))
  }

  test("AwsKinesisClient drives BatchProducer end-to-end through the seam") {
    var calls = 0
    val (c, _) = clientWith((_, _, _) => { calls += 1; (200, okResponse) })
    val p = new BatchProducer(c, ProducerConfig(batchSize = 2), _ => ())
    (0 until 4).foreach(i => p.add(Array(i.toByte), "k"))
    p.flush()
    assert(p.stats.sent === 4 && calls === 2)
  }

  // ---- credential providers (K9 chain) over scripted transports ----------

  test("fromEnv: both spellings accepted, reference error cases preserved") {
    def env(m: Map[String, String]): String => Option[String] = m.get
    assert(CredentialsProvider.fromEnv(env(Map.empty)).isLeft)
    assert(CredentialsProvider.fromEnv(
      env(Map("AWS_ACCESS_KEY_ID" -> "a"))).isLeft) // secret missing
    assert(CredentialsProvider.fromEnv(
      env(Map("AWS_SECRET_ACCESS_KEY" -> "s"))).isLeft) // access missing
    val both = CredentialsProvider.fromEnv(env(Map(
      "AWS_ACCESS_KEY" -> "oldstyle", "AWS_ACCESS_KEY_ID" -> "newstyle",
      "AWS_SECRET_KEY" -> "sec", "AWS_SECURITY_TOKEN" -> "tok")))
    val c = both.toOption.get.credentials(testTime)
    assert(c.accessKeyId === "oldstyle") // AWS_ACCESS_KEY wins, as in the reference
    assert(c.secretAccessKey === "sec")
    assert(c.sessionToken === Some("tok"))
  }

  private val metadataJson =
    """{"Code":"Success","AccessKeyId":"ASIAMETA","SecretAccessKey":"metasecret",
      |"Token":"metatoken","Expiration":"2015-08-30T18:00:00Z"}""".stripMargin

  test("instance metadata: role lookup, creds fetch, renewal only after expiry") {
    var fetches = 0
    val get: CredentialsProvider.HttpGet = {
      case url if url.endsWith("security-credentials") => (200, "my-role\n")
      case url if url.endsWith("security-credentials/my-role") =>
        fetches += 1; (200, metadataJson)
      case url => fail(s"unexpected url $url")
    }
    var t = testTime
    val p = CredentialsProvider.instanceMetadata(get, now = () => t)
    assert(fetches === 1) // warmed up at construction
    val c = p.credentials(t)
    assert(c.accessKeyId === "ASIAMETA" && c.sessionToken === Some("metatoken"))
    p.credentials(t.plusSeconds(3600))
    assert(fetches === 1) // still before the 18:00Z expiry → cached
    t = Instant.parse("2015-08-30T18:00:00Z")
    p.credentials(t) // expiry is not after now → refetch
    assert(fetches === 2)
  }

  test("instance metadata: no role attached fails at construction") {
    val get: CredentialsProvider.HttpGet = {
      case url if url.endsWith("security-credentials") => (404, "not found")
      case _ => (404, "")
    }
    assertThrows[java.io.IOException] {
      CredentialsProvider.instanceMetadata(get, now = () => testTime)
    }
  }

  private def stsXml(expiry: String) =
    s"""<AssumeRoleResponse><AssumeRoleResult><Credentials>
       |<AccessKeyId>ASIASTS</AccessKeyId>
       |<SecretAccessKey>stssecret</SecretAccessKey>
       |<SessionToken>ststoken</SessionToken>
       |<Expiration>$expiry</Expiration>
       |</Credentials></AssumeRoleResult></AssumeRoleResponse>""".stripMargin

  test("AssumeRole: signed STS call, XML creds, renewal after expiry") {
    var calls = 0
    val captured = scala.collection.mutable.ArrayBuffer[(String, Map[String, String])]()
    val transport: AwsKinesisClient.Transport = (url, headers, body) => {
      calls += 1; captured += ((url, headers))
      assert(body.isEmpty) // empty-body POST, as the reference sends
      (200, stsXml("2015-08-30T13:36:00Z"))
    }
    var t = testTime
    val p = CredentialsProvider.assumeRole(
      "arn:aws:iam::123456789012:role/writer", "graft-session", "us-east-1",
      CredentialsProvider.Static(testCreds), transport, () => t)
    assert(calls === 1)
    val (url, headers) = captured.head
    assert(url === "https://sts.us-east-1.amazonaws.com/?Action=AssumeRole" +
      "&RoleArn=arn%3Aaws%3Aiam%3A%3A123456789012%3Arole%2Fwriter" +
      "&RoleSessionName=graft-session&Version=2011-06-15")
    assert(headers("Authorization").contains("/20150830/us-east-1/sts/aws4_request"))
    val c = p.credentials(t)
    assert(c === SigV4.Credentials("ASIASTS", "stssecret", Some("ststoken")))
    t = t.plusSeconds(7200) // past the 13:36Z expiry
    p.credentials(t)
    assert(calls === 2)
  }

  test("AssumeRole: HTTP 200 with no credentials in body is a failure") {
    val transport: AwsKinesisClient.Transport =
      (_, _, _) => (200, "<AssumeRoleResponse></AssumeRoleResponse>")
    assertThrows[java.io.IOException] {
      CredentialsProvider.assumeRole("arn", "s", "us-east-1",
        CredentialsProvider.Static(testCreds), transport, () => testTime)
    }
  }

  test("chain: explicit keys => static; no keys => metadata; role wraps either") {
    val get: CredentialsProvider.HttpGet = {
      case url if url.endsWith("security-credentials") => (200, "r")
      case _ => (200, metadataJson)
    }
    val stsTransport: AwsKinesisClient.Transport = (_, headers, _) => {
      // the STS call must be signed by the BASE provider's key
      assert(headers("Authorization").contains("Credential=ASIAMETA/"))
      (200, stsXml("2015-08-30T13:36:00Z"))
    }
    val static = CredentialsProvider.chain(
      Some("AKID"), Some("sec"), None, "s", "us-east-1", get, stsTransport,
      () => testTime)
    assert(static.credentials(testTime).accessKeyId === "AKID")
    val meta = CredentialsProvider.chain(
      None, None, None, "s", "us-east-1", get, stsTransport, () => testTime)
    assert(meta.credentials(testTime).accessKeyId === "ASIAMETA")
    val wrapped = CredentialsProvider.chain(
      None, None, Some("arn:role"), "s", "us-east-1", get, stsTransport,
      () => testTime)
    assert(wrapped.credentials(testTime).accessKeyId === "ASIASTS")
  }

  test("renewed provider credentials reach the PutRecords signature") {
    var t = testTime
    var which = "FIRSTKEY"
    val provider = new CredentialsProvider.Cached({ at =>
      (SigV4.Credentials(which, "sec"), at.plusSeconds(60))
    })
    val captured = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
    val c = new AwsKinesisClient(
      streamName = "logs", region = "us-east-1", creds = provider,
      transport = (_, headers, _) => { captured += headers; (200, okResponse) },
      now = () => t)
    c.putRecords(Seq(KinesisRecord("a".getBytes(UTF_8), "k")))
    assert(captured.head("Authorization").contains("Credential=FIRSTKEY/"))
    which = "SECONDKEY"
    t = t.plusSeconds(120) // past the cached expiry → provider refreshes
    c.putRecords(Seq(KinesisRecord("a".getBytes(UTF_8), "k")))
    assert(captured(1)("Authorization").contains("Credential=SECONDKEY/"))
  }

  test("MiniJson round-trips the response grammar") {
    val v = MiniJson.parse(
      """{"a":[1,2.5,-3e2],"b":{"c":"x\ny A"},"d":true,"e":null}""")
      .asInstanceOf[Map[String, Any]]
    assert(v("a") === List(1.0, 2.5, -300.0))
    assert(v("b").asInstanceOf[Map[String, Any]]("c") === "x\ny A")
    assert(v("d") === true)
    assert(v("e") === null)
  }
}
