package graft.pipeline

import java.time.Instant

/** Credential providers for SigV4 signing — the rest of K9 beyond static
  * keys: EC2 instance-metadata credentials and STS AssumeRole, the two
  * renewable sources the reference supports (go-kinesis
  * auth_metadata.go:25, auth_assumerole.go:16), plus the selection logic
  * its caller applies (main.go:62-79: explicit keys ⇒ static, else
  * instance metadata; optionally wrapped in AssumeRole).
  *
  * All network access goes through injectable transports (a GET function
  * for the metadata service, the [[AwsKinesisClient.Transport]] shape for
  * STS), so the whole chain — fallback order, renewal-on-expiry, warm-up
  * failure propagation — is unit-tested offline against scripted
  * responses (SigV4Spec), same as the PutRecords client.
  */
trait CredentialsProvider {
  /** Credentials valid for signing at `now`. Renewable providers refresh
    * here when their cached key has expired; the call is thread-safe.
    */
  def credentials(now: Instant): SigV4.Credentials
}

object CredentialsProvider {

  /** GET transport: url ⇒ (status, body). */
  type HttpGet = String => (Int, String)

  /** Fixed keys that never renew (reference auth_static.go:19-27). */
  final case class Static(creds: SigV4.Credentials) extends CredentialsProvider {
    override def credentials(now: Instant): SigV4.Credentials = creds
  }

  /** Static keys from environment variables, accepting both spellings the
    * reference does (auth_static.go:10-15, 30-55): AWS_ACCESS_KEY then
    * AWS_ACCESS_KEY_ID; AWS_SECRET_KEY then AWS_SECRET_ACCESS_KEY;
    * optional AWS_SECURITY_TOKEN. Left = the reference's error cases
    * (nothing set / one of the pair missing).
    */
  def fromEnv(env: String => Option[String] = sys.env.get)
      : Either[String, CredentialsProvider] = {
    val access = env("AWS_ACCESS_KEY").orElse(env("AWS_ACCESS_KEY_ID"))
    val secret = env("AWS_SECRET_KEY").orElse(env("AWS_SECRET_ACCESS_KEY"))
    val token = env("AWS_SECURITY_TOKEN")
    (access, secret) match {
      case (None, None) if token.isEmpty => Left("no credential env variables set")
      case (None, _) => Left("access key env variable missing")
      case (_, None) => Left("secret key env variable missing")
      case (Some(a), Some(s)) =>
        Right(Static(SigV4.Credentials(a, s, sessionToken = token)))
    }
  }

  /** Thread-safe expiring cache around a temporary-credential fetch,
    * warmed up at construction (reference
    * auth_cachedmutexedwarmedup.go:13-22: constructing the provider
    * performs one fetch so a broken source fails fast, and the
    * underlying fetch runs again only once the returned expiry has
    * passed).
    */
  final class Cached(fetch: Instant => (SigV4.Credentials, Instant))
      extends CredentialsProvider {
    private var current: SigV4.Credentials = _
    private var expiration: Instant = Instant.MIN
    override def credentials(now: Instant): SigV4.Credentials = synchronized {
      if (current == null || !expiration.isAfter(now)) {
        val (c, exp) = fetch(now)
        current = c
        expiration = exp
      }
      current
    }
  }
  private def warmed(fetch: Instant => (SigV4.Credentials, Instant),
      now: () => Instant): Cached = {
    val c = new Cached(fetch)
    c.credentials(now()) // warm-up: first fetch at construction, throws on failure
    c
  }

  /** EC2 instance-metadata credentials (reference auth_metadata.go:25-52):
    * GET `/latest/meta-data/iam/security-credentials` names the instance
    * role, GET `.../<role>` returns JSON
    * `{AccessKeyId, SecretAccessKey, Token, Expiration}` with an RFC 3339
    * expiry; renewal re-resolves the role each time (role attachments can
    * change under a running instance).
    */
  def instanceMetadata(
      get: HttpGet = httpGet,
      endpoint: String = "http://169.254.169.254",
      now: () => Instant = () => Instant.now()): CredentialsProvider = {
    val credsUrl = s"$endpoint/latest/meta-data/iam/security-credentials"
    warmed({ _ =>
      val role = get(credsUrl) match {
        case (200, body) =>
          body.linesIterator.map(_.trim).find(_.nonEmpty)
            .getOrElse(throw new java.io.IOException("no IAM role attached"))
        case (status, _) =>
          throw new java.io.IOException(s"metadata role lookup: HTTP $status")
      }
      get(s"$credsUrl/$role") match {
        case (200, body) =>
          val m = MiniJson.parse(body).asInstanceOf[Map[String, Any]]
          def field(k: String): String = m.get(k).map(_.toString).getOrElse(
            throw new java.io.IOException(s"metadata creds missing $k"))
          (SigV4.Credentials(field("AccessKeyId"), field("SecretAccessKey"),
            sessionToken = m.get("Token").map(_.toString)),
            Instant.parse(field("Expiration")))
        case (status, _) =>
          throw new java.io.IOException(s"metadata creds fetch: HTTP $status")
      }
    }, now)
  }

  /** STS AssumeRole wrap (reference auth_assumerole.go:16-88): a signed
    * empty-body POST to the regional STS endpoint with the AssumeRole
    * query, authenticated by `base`; the XML response's temporary
    * credentials are cached until their expiry. The signed query is the
    * sorted form (Action, RoleArn, RoleSessionName, Version — the same
    * canonical order the reference's url.Values.Encode produces).
    */
  def assumeRole(
      roleArn: String,
      sessionName: String,
      region: String,
      base: CredentialsProvider,
      transport: AwsKinesisClient.Transport = postTransport,
      now: () => Instant = () => Instant.now()): CredentialsProvider =
    warmed({ at =>
      val host = s"sts.$region.amazonaws.com"
      val query = Seq(
        "Action" -> "AssumeRole",
        "RoleArn" -> roleArn,
        "RoleSessionName" -> sessionName,
        "Version" -> "2011-06-15")
      val signed = SigV4.sign(
        method = "POST", host = host, path = "/", query = query,
        headers = Map.empty, body = Array.emptyByteArray,
        region = region, service = "sts",
        creds = base.credentials(at), now = at)
      val qs = query.map { case (k, v) =>
        s"${SigV4.uriEscape(k, keepSlash = false)}=${SigV4.uriEscape(v, keepSlash = false)}"
      }.mkString("&")
      val (status, body) = transport(s"https://$host/?$qs", signed,
        Array.emptyByteArray)
      if (status != 200)
        throw new java.io.IOException(s"AssumeRole: HTTP $status")
      def xmlField(tag: String): String = {
        val m = s"<$tag>([^<]*)</$tag>".r.findFirstMatchIn(body)
        m.map(_.group(1)).getOrElse("")
      }
      val secret = xmlField("SecretAccessKey")
      // the reference's sanity check (auth_assumerole.go:78-80): an OK
      // status with no credentials in the body is still a failure
      if (secret.isEmpty)
        throw new java.io.IOException("AssumeRole: no credentials in response")
      (SigV4.Credentials(xmlField("AccessKeyId"), secret,
        sessionToken = Some(xmlField("SessionToken")).filter(_.nonEmpty)),
        Instant.parse(xmlField("Expiration")))
    }, now)

  /** The reference caller's provider selection (main.go:62-79): explicit
    * keys ⇒ static, otherwise instance metadata; then, when a role ARN is
    * configured, wrap whichever base was chosen in AssumeRole.
    */
  def chain(
      accessKey: Option[String],
      secretKey: Option[String],
      roleArn: Option[String],
      sessionName: String,
      region: String,
      get: HttpGet = httpGet,
      transport: AwsKinesisClient.Transport = postTransport,
      now: () => Instant = () => Instant.now()): CredentialsProvider = {
    val base = accessKey match {
      case Some(a) =>
        // fail FAST on a half-configured static pair (the fromEnv
        // rule): an empty secret would sign every request with key
        // "AWS4" and surface only as runtime SignatureDoesNotMatch
        // with no hint of the misconfiguration
        val sk = secretKey.getOrElse(throw new IllegalArgumentException(
          "accessKey set but secretKey missing — static credentials " +
            "need both (or neither, to use instance metadata)"))
        Static(SigV4.Credentials(a, sk))
      case None => instanceMetadata(get, now = now)
    }
    roleArn match {
      case Some(arn) => assumeRole(arn, sessionName, region, base, transport, now)
      case None => base
    }
  }

  /** Production GET transport (JDK HTTP client; the metadata service is
    * plain HTTP inside the instance).
    */
  // one client per JVM (the AwsKinesisClient.httpTransport rule) — a
  // fresh HttpClient per metadata GET would leak a selector thread and
  // connection pool on every credential refresh until GC
  private lazy val metadataHttpClient = java.net.http.HttpClient.newHttpClient()

  lazy val httpGet: HttpGet = { url =>
    val resp = metadataHttpClient.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Production POST transport for STS (same wire shape as the Kinesis
    * client's).
    */
  lazy val postTransport: AwsKinesisClient.Transport = AwsKinesisClient.httpTransport
}
