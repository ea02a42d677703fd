package graft.transport

import graft.metrics.{CloudWatchReporter, CloudWatchStub, MetricDatum}
import graft.sources.{InMemoryShardService, SubRecord}
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 transport/credential-plane additions: the concrete IMDSv2
  * instance-profile fetcher behind the CredentialsProvider seam, the
  * stale-serve contract of the rotating provider, the KPL encoder's
  * explicit-hash-key + tag support (format now complete both
  * directions), and the CloudWatch-shaped PutMetricData uploader.
  */
class Round12TransportSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---------------------------------------------- KPL EHK + tags ----

  test("KPL encoder EHK + tags: a hand-encoded vector with a non-empty " +
      "explicit-hash-key table, interned EHK reuse, and Tag messages " +
      "(with and without value) decodes to the pinned sub-records and " +
      "our encoder reproduces it bit-for-bit") {
    // AggregatedRecord{pk_table: ["user-7","user-8"], ehk_table: ["42"],
    //   records: [
    //     {pk:0, ehk:0, data:"a", tags:[("source","api"),("flag",-)]},
    //     {pk:1, ehk:0, data:"bb"},
    //     {pk:0, data:"ccc"}]}
    // hand-encoded from the public aggregation-format.md spec
    val vector = hex(
      "f3899ac20a06757365722d370a06757365722d38120234321a1e080010001a01" +
        "61220d0a06736f75726365120361706922060a04666c61671a08080110001a02" +
        "62621a0708001a0363636368a8910619aef4737f5071c89e6b582c")
    val subs = KplAggregation.tryDeaggregate(vector)
    assert(subs.isDefined, "the EHK vector must deaggregate")
    assert(subs.get.map(_.partitionKey) === Seq("user-7", "user-8", "user-7"))
    assert(subs.get.map(s => new String(s.data, UTF_8)) ===
      Seq("a", "bb", "ccc"))
    // the EHK table resolves per record; absence stays None
    assert(subs.get.map(_.explicitHashKey) ===
      Seq(Some("42"), Some("42"), None))
    // tags round-trip, including the value-less Tag
    assert(subs.get.head.tags ===
      Seq("source" -> Some("api"), "flag" -> None))
    assert(subs.get(1).tags.isEmpty && subs.get(2).tags.isEmpty)
    // encoder reproduces the pinned bytes exactly (first-appearance
    // interning for BOTH key tables)
    assert(KplAggregation.aggregate(subs.get) === vector)
  }

  test("KPL encoder back-compat: records without EHKs or tags encode " +
      "bit-identically to the pre-EHK format (the round-11 pinned " +
      "vector), and a dangling EHK index is rejected as a plain record") {
    // the round-11 pinned vector: pk-only records
    val legacy = hex(
      "f3899ac20a05616c7068610a04626574611a0908001a0566697273741a0a0801" +
        "1a067365636f6e641a0908001a05746869726439aac3a0f3194574107cf90e75" +
        "eb1118")
    val subs = Seq(
      SubRecord("alpha", "first".getBytes(UTF_8)),
      SubRecord("beta", "second".getBytes(UTF_8)),
      SubRecord("alpha", "third".getBytes(UTF_8)))
    assert(KplAggregation.aggregate(subs) === legacy)
    // dangling EHK index: ehk_index 1 against a 1-entry EHK table ->
    // verifiably malformed -> plain record (never a fabricated EHK)
    val good = KplAggregation.aggregate(Seq(
      SubRecord("k", "d".getBytes(UTF_8), Some("99"))))
    val body = java.util.Arrays.copyOfRange(good, 4, good.length - 16)
    val patched = body.clone()
    // record message holds 10 00 (ehk_index 0); patch to index 1
    val i = patched.indexOfSlice(Seq[Byte](0x10, 0x00))
    patched(i + 1) = 0x01
    val d = java.security.MessageDigest.getInstance("MD5").digest(patched)
    assert(KplAggregation.tryDeaggregate(
      KplAggregation.Magic ++ patched ++ d).isEmpty)
    // while the unpatched EHK record round-trips
    val rt = KplAggregation.tryDeaggregate(good)
    assert(rt.exists(_.head.explicitHashKey === Some("99")))
  }

  // -------------------------------- rotating provider stale-serve ----

  test("rotating provider serves the stale-but-alive credential when a " +
      "refresh-ahead fetch fails, and only propagates the error once " +
      "the cached credential has hard-expired") {
    var now = 0L
    val creds1 = AwsCredentials("AKSTALE1", "s1")
    var fetches = 0
    var failFetches = false
    val p = new RotatingCredentialsProvider(
      fetch = () => {
        fetches += 1
        if (failFetches) throw new java.io.IOException("imds blip")
        (creds1, 100000L)
      },
      clock = () => now, refreshAheadMs = 10000L)
    assert(p.resolve() === creds1 && fetches === 1)
    // inside the refresh-ahead window the fetch blips: the cached pair
    // is still valid until 100000 -> served, error swallowed
    now = 95000L; failFetches = true
    assert(p.resolve() === creds1)
    assert(fetches === 2, "a refresh must have been attempted")
    // past hard expiry the same blip must propagate
    now = 100001L
    intercept[java.io.IOException] { p.resolve() }
  }

  // ------------------------------------------------ IMDSv2 fetcher ----

  test("IMDSv2 instance-profile flow: token PUT with TTL, role GET, " +
      "credentials JSON with Expiration; a full rotation through the " +
      "IMDS stub re-signs wire requests ahead of expiry, a transient " +
      "IMDS 503 serves the stale key, and the hard-expired stale key " +
      "is rejected by the endpoint once its overlap closes") {
    var now = 0L
    val clock = () => now
    val imds = new ImdsStub(clock)
    val creds1 = AwsCredentials("AKIMDS01", "imds-secret-1", Some("t1"))
    val creds2 = AwsCredentials("AKIMDS02", "imds-secret-2", Some("t2"))
    val store = new InMemoryShardService("wire", Seq("shard-0"))
    val wire = new KinesisWireStub(store)
    try {
      val base = imds.start()
      imds.current = (creds1, 100000L)
      val provider = ImdsCredentialsFetcher.provider(base, clock,
        refreshAheadMs = 10000L)
      wire.requireSigV4 = Some(StubSigV4(creds1, "us-east-1", clock))
      val svc = new HttpShardService(wire.endpoint, "wire",
        RetryPolicy(sleeper = _ => ()),
        Some(SigV4Config("us-east-1", provider, clock)))
      assert(svc.listShards() === Seq("shard-0"))
      assert(imds.tokenHandshakes === 1 && imds.credentialFetches === 1)
      // cached well before expiry: no re-fetch, no second handshake
      now = 50000L
      assert(svc.listShards() === Seq("shard-0"))
      assert(imds.credentialFetches === 1)
      // the instance profile rotates server-side; wire keeps an
      // overlap window (both keys valid) as real AWS does
      imds.current = (creds2, 1000000L)
      wire.requireSigV4 = Some(StubSigV4(creds2, "us-east-1", clock,
        previous = Some(creds1)))
      // transient IMDS blip inside the refresh-ahead margin: request
      // still succeeds on the stale-but-alive creds1
      now = 95000L
      imds.failNextFetches = 1
      assert(svc.listShards() === Seq("shard-0"))
      assert(imds.credentialFetches === 2, "failed fetch was attempted")
      // next resolve re-fetches cleanly and re-signs with creds2
      assert(svc.listShards() === Seq("shard-0"))
      assert(provider.resolve() === creds2)
      // overlap closes; a client pinned to the old key is rejected
      wire.requireSigV4 = Some(StubSigV4(creds2, "us-east-1", clock))
      val stale = new HttpShardService(wire.endpoint, "wire",
        RetryPolicy(sleeper = _ => ()),
        Some(SigV4Config("us-east-1", creds1, clock)))
      val e = intercept[KinesisApiException] { stale.listShards() }
      assert(e.statusCode === 403)
      // the IMDS-backed client keeps working
      assert(svc.listShards() === Seq("shard-0"))
    } finally { imds.stop(); wire.stop() }
  }

  test("IMDSv2 token semantics: metadata GET without a live token is " +
      "401; an expired session token is re-handshaken exactly once " +
      "and the fetch still succeeds") {
    var now = 0L
    val imds = new ImdsStub(() => now)
    try {
      val base = imds.start()
      imds.current = (AwsCredentials("AK", "s"), 500000L)
      // raw GET with no token -> 401 (v2 enforcement)
      val conn = java.net.URI.create(
        base + "/latest/meta-data/iam/security-credentials/").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode === 401)
      val f = new ImdsCredentialsFetcher(base, tokenTtlSeconds = 60,
        clock = () => now)
      assert(f.fetch()._1.accessKeyId === "AK")
      assert(imds.tokenHandshakes === 1)
      // session token expires (60 s TTL); the next fetch re-handshakes
      now = 61000L
      assert(f.fetch()._1.accessKeyId === "AK")
      assert(imds.tokenHandshakes === 2)
    } finally imds.stop()
  }

  // ------------------------------------- CloudWatch-shaped uploader ----

  test("CloudWatch reporter posts PutMetricData-shaped JSON the stub " +
      "parses: summary-level deltas carry the per-stream dimension set, " +
      "detailed adds per-shard rows, requests are SigV4-signed for " +
      "service monitoring, and a down endpoint is counted, not thrown") {
    val cw = new CloudWatchStub
    try {
      val endpoint = cw.start()
      val creds = AwsCredentials("AKCW", "cw-secret")
      val rep = new CloudWatchReporter(endpoint, "graft/kinesis",
        Some(SigV4Config("us-east-1", creds)))
      rep.report(7L, Seq(
        MetricDatum("RecordsFetched", Map("stream" -> "m"), 42L),
        MetricDatum("RecordsFetched",
          Map("stream" -> "m", "shard" -> "shard-0"), 30L),
        MetricDatum("RecordsFetched",
          Map("stream" -> "m", "shard" -> "shard-1"), 12L)))
      val got = cw.all
      assert(got.size === 3)
      assert(got.forall(_.namespace === "graft/kinesis"))
      assert(got.forall(_.metric === "RecordsFetched"))
      // summary row: stream-only dimensions; detailed rows add shard
      assert(got.map(_.dimensions).toSet === Set(
        Map("stream" -> "m"),
        Map("stream" -> "m", "shard" -> "shard-0"),
        Map("stream" -> "m", "shard" -> "shard-1")))
      assert(got.map(_.value).sorted === Seq(12.0, 30.0, 42.0))
      assert(rep.failedUploads === 0L)
      // a dead endpoint: the upload is dropped and counted — metrics
      // must never take down the data path
      cw.stop()
      rep.report(8L, Seq(MetricDatum("X", Map.empty, 1L)))
      assert(rep.failedUploads === 1L)
    } finally ()
  }
}
