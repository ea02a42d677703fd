package graft.metrics

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.transport.{SigV4, SigV4Config}
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** CloudWatch-uploader member of the [[MetricsReporter]] seam
  * (round-11 verdict item 5): a `PutMetricData`-shaped JSON POST — the
  * CloudWatch JSON protocol's `X-Amz-Target:
  * GraniteServiceVersion20100801.PutMetricData` envelope with a
  * `Namespace` and a `MetricData` array of
  * `{MetricName, Dimensions: [{Name, Value}...], Value, Unit}` datums.
  * This is the upload the reference's KCL/KPL metrics config drives
  * (reference main/resources/reference.conf:204-260: namespace,
  * metricsLevel, metricsEnabledDimensions); the dimension vocabulary
  * itself comes from [[DimensionRecorder]] (per-stream at `summary`,
  * per-stream + per-shard at `detailed`).
  *
  * Requests are SigV4-signed for service "monitoring" when a
  * [[SigV4Config]] is supplied — same signing path as the Kinesis wire
  * clients, so credential rotation re-signs metric uploads too. A
  * failed upload is counted and dropped, never thrown: metrics must
  * not take down the data path (the KPL uploader's contract).
  */
final class CloudWatchReporter(
    endpoint: String,
    namespace: String,
    sigV4: Option[SigV4Config] = None,
    connectTimeoutMs: Int = 2000,
    readTimeoutMs: Int = 5000) extends MetricsReporter {

  @volatile var failedUploads: Long = 0L

  private def js(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  override def report(batchId: Long, datums: Seq[MetricDatum]): Unit = {
    if (datums.isEmpty) return
    // CloudWatch caps PutMetricData at 1000 datums per request (the
    // published API limit); chunk like the SDK does
    datums.grouped(1000).foreach { chunk =>
      val body = {
        val arr = chunk.map { d =>
          val dims = d.dimensions.toSeq.sortBy(_._1).map { case (k, v) =>
            s"""{"Name":${js(k)},"Value":${js(v)}}"""
          }.mkString("[", ",", "]")
          s"""{"MetricName":${js(d.metric)},"Dimensions":$dims,""" +
            s""""Value":${d.value}.0,"Unit":"Count"}"""
        }.mkString("[", ",", "]")
        s"""{"Namespace":${js(namespace)},"MetricData":$arr}"""
      }.getBytes(UTF_8)
      try post(body)
      catch { case _: Throwable => failedUploads += 1 }
    }
  }

  private def post(body: Array[Byte]): Unit = {
    val uri = URI.create(endpoint)
    val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setDoOutput(true)
    val baseHeaders = Seq(
      "content-type" -> "application/x-amz-json-1.0",
      "x-amz-target" -> "GraniteServiceVersion20100801.PutMetricData")
    val allHeaders = sigV4 match {
      case Some(cfg) =>
        val date = SigV4.amzDate(cfg.clock())
        val creds = cfg.provider.resolve()
        val signed = baseHeaders ++ Seq(
          "host" -> (uri.getHost +
            (if (uri.getPort > 0) s":${uri.getPort}" else "")),
          "x-amz-date" -> date) ++
          creds.sessionToken.map("x-amz-security-token" -> _).toSeq
        signed :+ ("authorization" -> SigV4.authorization(
          "POST", uri, signed, body, date, cfg.region, "monitoring", creds))
      case None => baseHeaders
    }
    allHeaders.foreach { case (k, v) =>
      if (k != "host") conn.setRequestProperty(k, v)
    }
    conn.getOutputStream.write(body)
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    if (is != null) { is.readAllBytes(); is.close() }
    conn.disconnect()
    if (code != 200) throw new java.io.IOException(
      s"PutMetricData failed: HTTP $code")
  }
}

/** In-process CloudWatch-shaped endpoint (the metrics twin of the
  * Kinesis wire stub): accepts `PutMetricData` JSON posts, records
  * (namespace, metric, dimension-map, value) rows a spec can assert
  * on, and optionally rejects garbage. */
final class CloudWatchStub {
  final case class Received(namespace: String, metric: String,
      dimensions: Map[String, String], value: Double)

  val received =
    new java.util.concurrent.ConcurrentLinkedQueue[Received]()
  @volatile var requests: Int = 0
  private var server: HttpServer = null

  def all: Seq[Received] = {
    import scala.jdk.CollectionConverters._
    received.asScala.toSeq
  }

  def start(): String = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val target = ex.getRequestHeaders.getFirst("X-Amz-Target")
        val ok = "POST" == ex.getRequestMethod &&
          "GraniteServiceVersion20100801.PutMetricData" == target &&
          parse(body)
        val resp = (if (ok) "{}" else
          """{"__type":"InvalidParameterValueException"}""").getBytes(UTF_8)
        ex.sendResponseHeaders(if (ok) 200 else 400, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}/"
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def parse(body: String): Boolean = try {
    requests += 1
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)
    val ns = root.get("Namespace").asText()
    val md = root.get("MetricData")
    require(ns.nonEmpty && md != null && md.isArray)
    md.forEach { d =>
      val dims = Option(d.get("Dimensions")).map { ds =>
        val b = Map.newBuilder[String, String]
        ds.forEach(x => b += (x.get("Name").asText() -> x.get("Value").asText()))
        b.result()
      }.getOrElse(Map.empty)
      received.add(Received(ns, d.get("MetricName").asText(), dims,
        d.get("Value").asDouble()))
    }
    true
  } catch { case _: Throwable => false }
}
