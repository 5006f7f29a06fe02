package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, pure JVM (K9 without the SDK).
  *
  * Implements the public SigV4 algorithm — the same one the reference's
  * vendored signer applies to its Kinesis calls (go-kinesis sign.go:37-48):
  * canonical request → string-to-sign → HMAC-SHA256 key derivation chain →
  * Authorization header. Differences from that vendored code are
  * deliberate modernizations of the same public spec: the timestamp rides
  * in `x-amz-date` (not `Date`), and the payload hash is also exposed for
  * the `x-amz-content-sha256` header.
  *
  * Verified against the published AWS SigV4 test-suite vectors
  * (SigV4Spec) so correctness doesn't depend on live AWS access.
  */
object SigV4 {

  final case class Credentials(
      accessKeyId: String,
      secretAccessKey: String,
      sessionToken: Option[String] = None)

  private val AmzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
  private val DateStampFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)

  /** Locale-FIXED lowercase: a plain toLowerCase under a Turkish-class
    * default locale maps 'I' to dotless ı, producing a non-ASCII header
    * name in both the canonical request and the wire map — every
    * request then fails signature validation. */
  private def canonKey(k: String): String =
    k.toLowerCase(java.util.Locale.ROOT)

  /** SigV4 Trimall: trim AND collapse sequential internal spaces — AWS
    * canonicalizes the received value the same way, so signing the
    * uncollapsed form guarantees SignatureDoesNotMatch on any header
    * value with doubled spaces. Applied before both signing and the
    * returned wire map, so signed == sent. */
  private def canonValue(v: String): String =
    v.trim.replaceAll(" +", " ")

  def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def sha256Hex(data: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(data).map("%02x".format(_)).mkString

  /** RFC 3986 escaping as SigV4 requires (unreserved chars pass through;
    * space is %20, not '+').
    */
  def uriEscape(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".indexOf(c.toInt) >= 0 ||
        (keepSlash && c == '/')) sb.append(c)
      else sb.append("%%%02X".format(b & 0xff))
    }
    sb.toString
  }

  /** Sign a request; returns ALL headers to put on the wire (the input
    * headers plus host, x-amz-date, optional x-amz-security-token, and
    * Authorization). Header names are matched case-insensitively.
    */
  def sign(
      method: String,
      host: String,
      path: String,
      query: Seq[(String, String)],
      headers: Map[String, String],
      body: Array[Byte],
      region: String,
      service: String,
      creds: Credentials,
      now: Instant): Map[String, String] = {

    val amzDate = AmzDateFmt.format(now)
    val dateStamp = DateStampFmt.format(now)

    // lowercase caller keys BEFORE merging: "Host"/"X-Amz-Date" from a
    // caller must collide with (not duplicate) the generated entries, or
    // the canonical request carries the header twice and the signature
    // can never match. Values are trimmed HERE — before both signing and
    // the returned wire map — so signed == sent; trimming only in the
    // canonical step would sign a value different from the transmitted
    // one and guarantee SignatureDoesNotMatch on whitespace-padded input.
    val allHeaders: Map[String, String] =
      headers.map { case (k, v) => canonKey(k) -> canonValue(v) } ++
        Map("host" -> host, "x-amz-date" -> amzDate) ++
        creds.sessionToken.map("x-amz-security-token" -> _)

    val canonicalPath =
      if (path.isEmpty) "/" else uriEscape(path, keepSlash = true)
    val canonicalQuery = query
      .map { case (k, v) => uriEscape(k, false) -> uriEscape(v, false) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")

    val sortedHeaders = allHeaders.toSeq
      .map { case (k, v) => canonKey(k) -> canonValue(v) }
      .sortBy(_._1)
    val canonicalHeaders = sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sortedHeaders.map(_._1).mkString(";")
    val payloadHash = sha256Hex(body)

    val canonicalRequest = Seq(
      method, canonicalPath, canonicalQuery,
      canonicalHeaders, signedHeaders, payloadHash).mkString("\n")

    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq(
      "AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")

    // key derivation chain (identical in every public implementation,
    // incl. the vendored go signer sign.go:66-69)
    val kDate = hmacSha256(s"AWS4${creds.secretAccessKey}".getBytes(UTF_8),
      dateStamp.getBytes(UTF_8))
    val kRegion = hmacSha256(kDate, region.getBytes(UTF_8))
    val kService = hmacSha256(kRegion, service.getBytes(UTF_8))
    val kSigning = hmacSha256(kService, "aws4_request".getBytes(UTF_8))
    val signature = hmacSha256(kSigning, stringToSign.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

    allHeaders + ("Authorization" ->
      (s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
        s"SignedHeaders=$signedHeaders, Signature=$signature"))
  }

  /** The canonical-request and string-to-sign pair, exposed for test
    * vectors that pin intermediate artifacts.
    */
  private[pipeline] def stringToSign(
      method: String, host: String, path: String,
      query: Seq[(String, String)], headers: Map[String, String],
      body: Array[Byte], region: String, service: String,
      now: Instant): String = {
    val amzDate = AmzDateFmt.format(now)
    val dateStamp = DateStampFmt.format(now)
    // same canonicalization ORDER as sign(): caller keys lowercase
    // BEFORE merging, so a mixed-case "Host" collides with the
    // generated entry instead of producing a duplicated header the
    // real signer never emits
    val allHeaders = headers.map { case (k, v) =>
      canonKey(k) -> canonValue(v) } ++
      Map("host" -> host, "x-amz-date" -> amzDate)
    val sortedHeaders = allHeaders.toSeq.sortBy(_._1)
    val canonicalRequest = Seq(
      method,
      if (path.isEmpty) "/" else uriEscape(path, keepSlash = true),
      query.map { case (k, v) => uriEscape(k, false) -> uriEscape(v, false) }
        .sorted.map { case (k, v) => s"$k=$v" }.mkString("&"),
      sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString,
      sortedHeaders.map(_._1).mkString(";"),
      sha256Hex(body)).mkString("\n")
    Seq("AWS4-HMAC-SHA256", amzDate,
      s"$dateStamp/$region/$service/aws4_request",
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
  }
}
