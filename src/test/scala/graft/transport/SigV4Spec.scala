package graft.transport

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SigV4]] to AWS's published worked example (the "Signature
  * Version 4 signing process" documentation in the AWS General
  * Reference): the GET iam ListUsers request with the documented
  * example credentials. Every intermediate artifact — canonical
  * request hash, string to sign, derived signing key, final
  * signature — is asserted against the officially published value, so
  * the implementation is provably the public algorithm and not a
  * lookalike.
  */
class SigV4Spec extends AnyFunSuite {

  // the documented example credentials (public, non-functional)
  private val creds = AwsCredentials("AKIDEXAMPLE",
    "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
  private val amzDate = "20150830T123600Z"
  private val headers = Seq(
    "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
    "host" -> "iam.amazonaws.com",
    "x-amz-date" -> amzDate)

  test("canonical request matches the published example (hash " +
      "f536975d...)") {
    val cr = SigV4.canonicalRequest("GET", "/",
      "Action=ListUsers&Version=2010-05-08", headers, Array.emptyByteArray)
    val expected =
      """GET
        |/
        |Action=ListUsers&Version=2010-05-08
        |content-type:application/x-www-form-urlencoded; charset=utf-8
        |host:iam.amazonaws.com
        |x-amz-date:20150830T123600Z
        |
        |content-type;host;x-amz-date
        |e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"""
        .stripMargin
    assert(cr === expected)
    assert(SigV4.sha256Hex(cr.getBytes(UTF_8)) ===
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("string to sign matches the published example") {
    val cr = SigV4.canonicalRequest("GET", "/",
      "Action=ListUsers&Version=2010-05-08", headers, Array.emptyByteArray)
    val sts = SigV4.stringToSign(amzDate,
      SigV4.credentialScope("20150830", "us-east-1", "iam"), cr)
    assert(sts ===
      """AWS4-HMAC-SHA256
        |20150830T123600Z
        |20150830/us-east-1/iam/aws4_request
        |f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"""
        .stripMargin)
  }

  test("derived signing key matches the published example " +
      "(c4afb1cc...)") {
    val key = SigV4.signingKey(creds.secretAccessKey, "20150830",
      "us-east-1", "iam")
    assert(SigV4.hex(key) ===
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("final signature matches the published example (5d672d79...)") {
    val auth = SigV4.authorization("GET",
      URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      headers, Array.emptyByteArray, amzDate, "us-east-1", "iam", creds)
    assert(auth ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/" +
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06" +
        "b5924a6f2b5d7")
  }

  test("authorization round-trips the server-side parser") {
    val auth = SigV4.authorization("POST", URI.create("http://h:9/"),
      Seq("host" -> "h:9", "x-amz-date" -> amzDate),
      "{}".getBytes(UTF_8), amzDate, "r1", "kinesis", creds)
    val parsed = SigV4.parseAuthorization(auth)
    assert(parsed.isDefined)
    assert(parsed.get.accessKeyId === "AKIDEXAMPLE")
    assert(parsed.get.dateStamp === "20150830")
    assert(parsed.get.region === "r1")
    assert(parsed.get.service === "kinesis")
    assert(parsed.get.signedHeaders === Seq("host", "x-amz-date"))
    assert(parsed.get.signature.length === 64)
  }

  test("uri/query canonicalization: AWS percent-encoding, sorted " +
      "params, header value whitespace collapse") {
    assert(SigV4.uriEncode("a b/c~d-_.", keepSlash = true) ===
      "a%20b/c~d-_.")
    assert(SigV4.uriEncode("a/b") === "a%2Fb")
    // duplicate names sort by encoded value ('%' < '1' in byte order)
    assert(SigV4.canonicalQuery("b=2&a=1&a=%41") === "a=%2541&a=1&b=2")
    val (ch, sh) = SigV4.canonicalHeaders(Seq(
      "X-Amz-Target" -> "  Kinesis_20131202.ListShards  ",
      "Host" -> "example.com"))
    assert(ch === "host:example.com\n" +
      "x-amz-target:Kinesis_20131202.ListShards\n")
    assert(sh === "host;x-amz-target")
  }

  test("credentials never print their secret") {
    assert(!creds.toString.contains("wJalr"))
    assert(!AwsCredentials("a", "SECRETKEYVALUE", Some("SESSIONSECRET"))
      .toString.contains("SECRET"))
  }
}
