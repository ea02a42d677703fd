package graft.transport

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.{InMemoryShardService, RawShardRecord, ShardPos}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Deterministic fault injection for [[KinesisWireStub]]: what the
  * localstack chaos knobs give the reference's integration suite. All
  * mutations happen-before the requests they affect (test sets, then
  * calls), so plain volatile/concurrent containers suffice.
  */
final class FaultPolicy {
  /** action -> remaining count of requests to fail with `failStatus`. */
  private val failRemaining = TrieMap.empty[String, AtomicInteger]
  @volatile var failStatus: Int = 500
  @volatile var failErrorType: String = "InternalFailure"

  /** Per-PutRecords-request queue of entry indices to fail: the
    * head set applies to the next PutRecords request, then pops —
    * deterministic partial-failure scripting. Failed entries carry
    * `entryErrorCode` (default throttling; set to e.g.
    * "InternalFailure" to script transient non-throttle errors). */
  val throttlePlan = new java.util.concurrent.ConcurrentLinkedQueue[Set[Int]]()
  @volatile var entryErrorCode: String =
    "ProvisionedThroughputExceededException"

  /** When >0, the next N responses to `action` are truncated garbage
    * (malformed JSON) — exercises the client's parse-failure path. */
  private val garbleRemaining = TrieMap.empty[String, AtomicInteger]

  def failNext(action: String, n: Int, status: Int = 500,
      errorType: String = "InternalFailure"): Unit = {
    failStatus = status; failErrorType = errorType
    failRemaining.put(action, new AtomicInteger(n))
  }
  def garbleNext(action: String, n: Int): Unit =
    garbleRemaining.put(action, new AtomicInteger(n))

  private[transport] def shouldFail(action: String): Boolean =
    failRemaining.get(action).exists(_.getAndDecrement() > 0)
  private[transport] def shouldGarble(action: String): Boolean =
    garbleRemaining.get(action).exists(_.getAndDecrement() > 0)
  private[transport] def nextThrottleSet(): Set[Int] =
    Option(throttlePlan.poll()).getOrElse(Set.empty)
}

/** In-process HTTP server speaking the Kinesis-shaped wire protocol of
  * [[KinesisWire]] over an [[InMemoryShardService]] — the zero-egress
  * localstack analogue (reference it/common/KinesisSuite.scala:147-303
  * runs the same suite shape against localstack). Every request and
  * response crosses a real TCP socket through real JSON + base64, so
  * TransportSpec exercises S1/S9 through actual bytes, HTTP error
  * taxonomy, retry/backoff, and PutRecords partial failures.
  *
  * Supported actions: ListShards (paginated), GetShardIterator
  * (TRIM_HORIZON / LATEST / AT_TIMESTAMP / AFTER_SEQUENCE_NUMBER),
  * GetRecords (Limit, NextShardIterator, SHARD_END null), PutRecords
  * (server-side key routing + per-entry error codes).
  */
final class KinesisWireStub(
    val store: InMemoryShardService,
    val faults: FaultPolicy = new FaultPolicy,
    listShardsPageSize: Int = 2) {
  import KinesisWire._

  /** (action, requestBody) log for assertions — e.g. "the retry carried
    * ONLY the failed entries". */
  val requestLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, JsonNode)]()
  def requests(action: String): Seq[JsonNode] =
    requestLog.asScala.toSeq.collect { case (a, b) if a == action => b }

  private val server = HttpServer.create(new InetSocketAddress(0), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.createContext("/", new Handler)
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  // iterator tokens are SERVER-issued and opaque to the client:
  // "g1|shardId|seqNo|subSeqNo" = exclusive lower-bound position
  private def token(shardId: String, pos: ShardPos): String =
    s"g1|$shardId|${pos.seqNo}|${pos.subSeqNo}"
  private def parseToken(t: String): (String, ShardPos) = {
    val parts = t.split('|')
    require(parts.length == 4 && parts(0) == "g1", s"bad iterator: $t")
    (parts(1), ShardPos(BigInt(parts(2)), parts(3).toLong))
  }

  private def posOf(r: RawShardRecord): ShardPos =
    ShardPos(r.seqNo, (r.subRecords.size - 1).toLong)

  private final class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val target = Option(ex.getRequestHeaders.getFirst(TargetHeader))
          .getOrElse("")
        val action = target.stripPrefix(TargetPrefix)
        val body = parse(ex.getRequestBody.readAllBytes())
        requestLog.add((action, body))
        if (faults.shouldFail(action)) {
          respond(ex, faults.failStatus,
            errorBody(faults.failErrorType, "injected fault"))
        } else if (faults.shouldGarble(action)) {
          respond(ex, 200, "{\"Records\": [trunca".getBytes("UTF-8"))
        } else {
          val resp: ObjectNode = action match {
            case "ListShards" => listShards(body)
            case "GetShardIterator" => getShardIterator(body)
            case "GetRecords" => getRecords(body)
            case "PutRecords" => putRecords(body)
            case other => throw new StubError(400,
              "InvalidAction", s"unknown action $other")
          }
          respond(ex, 200, bytes(resp))
        }
      } catch {
        case e: StubError =>
          respond(ex, e.status, errorBody(e.errorType, e.getMessage))
        case e: Exception =>
          respond(ex, 500, errorBody("InternalFailure", e.toString))
      } finally ex.close()

    private def respond(ex: HttpExchange, status: Int,
        body: Array[Byte]): Unit = {
      ex.getResponseHeaders.set("Content-Type", ContentType)
      ex.sendResponseHeaders(status, body.length.toLong)
      ex.getResponseBody.write(body)
    }
  }

  private final class StubError(val status: Int, val errorType: String,
      message: String) extends RuntimeException(message)

  private def listShards(req: JsonNode): ObjectNode = {
    val all = store.listShards()
    val from = Option(req.get("NextToken")).map(_.asText().toInt).getOrElse(0)
    val page = all.slice(from, from + listShardsPageSize)
    val resp = obj()
    val arr = resp.putArray("Shards")
    page.foreach { id =>
      val info = store.shardInfo(id)
      val s = arr.addObject()
      s.put("ShardId", id)
      info.parentIds.headOption.foreach(s.put("ParentShardId", _))
      info.parentIds.drop(1).headOption
        .foreach(s.put("AdjacentParentShardId", _))
      val rng = s.putObject("SequenceNumberRange")
      rng.put("StartingSequenceNumber", "0")
      // EndingSequenceNumber present <=> shard closed (the real API's
      // closed-shard marker)
      if (info.closed) rng.put("EndingSequenceNumber",
        store.latestPosition(id).seqNo.toString)
    }
    if (from + listShardsPageSize < all.size)
      resp.put("NextToken", (from + listShardsPageSize).toString)
    resp
  }

  private def getShardIterator(req: JsonNode): ObjectNode = {
    val shardId = req.get("ShardId").asText()
    if (!store.listShards().contains(shardId))
      throw new StubError(400, "ResourceNotFoundException",
        s"shard $shardId not found")
    val bound: ShardPos = req.get("ShardIteratorType").asText() match {
      case "TRIM_HORIZON" => ShardPos.Beginning
      case "LATEST" => store.latestPosition(shardId)
      case "AT_TIMESTAMP" =>
        // stub extension: integer epoch micros (see KinesisWire docs)
        store.positionAtTimestamp(shardId,
          req.get("Timestamp").asLong())
      case "AFTER_SEQUENCE_NUMBER" =>
        val seq = BigInt(req.get("StartingSequenceNumber").asText())
        // optional sub-sequence (KCL tracks it in its lease table, the
        // wire API does not carry it; the stub accepts it so the
        // position-based seam can resume mid-aggregate)
        val sub = Option(req.get("SubSequenceNumber"))
          .map(_.asLong()).getOrElse(Long.MaxValue)
        ShardPos(seq, sub)
      case other => throw new StubError(400, "ValidationException",
        s"unsupported iterator type $other")
    }
    val resp = obj()
    resp.put("ShardIterator", token(shardId, bound))
    // stub extension 1 (KinesisWire docs): surface the bound position
    val p = resp.putObject("StartingPosition")
    p.put("SequenceNumber", bound.seqNo.toString)
    p.put("SubSequenceNumber", bound.subSeqNo)
    resp
  }

  private def getRecords(req: JsonNode): ObjectNode = {
    val (shardId, from) = parseToken(req.get("ShardIterator").asText())
    val limit = Option(req.get("Limit")).map(_.asInt()).getOrElse(10000)
    val recs = store.read(shardId, from,
      ShardPos(BigInt(2).pow(159), Long.MaxValue))
      .take(limit).toVector
    val resp = obj()
    val arr = resp.putArray("Records")
    recs.foreach { r =>
      val o = arr.addObject()
      o.put("SequenceNumber", r.seqNo.toString)
      o.put("PartitionKey", r.partitionKey)
      o.put("ApproximateArrivalTimestamp", r.arrivalEpochMicros)
      o.put("Data", b64e.encodeToString(encodeData(r.subRecords)))
    }
    val last = recs.lastOption.map(posOf).getOrElse(from)
    val info = store.shardInfo(shardId)
    val drained = info.closed &&
      ShardPos.ordering.gteq(last, store.latestPosition(shardId))
    // null NextShardIterator == SHARD_END (the real API's closed-shard
    // drain signal)
    if (!drained) resp.put("NextShardIterator", token(shardId, last))
    resp.put("MillisBehindLatest", 0L)
    resp
  }

  private def putRecords(req: JsonNode): ObjectNode = {
    val entries = req.get("Records").elements().asScala.toVector
    val throttled = faults.nextThrottleSet()
    val open = store.openShards().toIndexedSeq
    if (open.isEmpty) throw new StubError(400,
      "ResourceNotFoundException", "no open shards")
    val resp = obj()
    val arr = resp.putArray("Records")
    var failed = 0
    entries.zipWithIndex.foreach { case (e, i) =>
      val o = arr.addObject()
      if (throttled.contains(i)) {
        failed += 1
        o.put("ErrorCode", faults.entryErrorCode)
        o.put("ErrorMessage", "injected entry failure")
      } else {
        val key = e.get("PartitionKey").asText()
        val data = b64d.decode(e.get("Data").asText())
        val shard = graft.sources.KeyRouting.shardFor(key, open)
        // an aggregated blob is stored as its sub-records so the
        // in-memory model (and every in-process reader) stays exact;
        // the wire read path re-encodes it (GetRecords above)
        store.appendAssigned(shard, decodeData(key, data))
        o.put("SequenceNumber", store.latestPosition(shard).seqNo.toString)
        o.put("ShardId", shard)
      }
    }
    resp.put("FailedRecordCount", failed)
    resp
  }
}
