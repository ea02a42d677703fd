package graft.transport

import graft.models.ProducerEvent
import graft.sinks.{AsyncRecordClient, AsyncRecordClientFactory,
  ProducerThrottledException, RecordExpiredException}
import scala.collection.mutable

/** PutRecords transport over the Kinesis-shaped wire — the producer
  * flush layer the KPL config rows were deferred on until a wire
  * transport existed (PARITY.md `collectionMaxCount`/`collectionMaxSize`;
  * reference main/resources/reference.conf:101,114):
  *
  *  - '''collection''' (KPL `CollectionMaxCount`/`CollectionMaxSize`):
  *    records buffer until `collectionMaxCount` entries or a record
  *    that would push the request past `collectionMaxSize` bytes, then
  *    ship as ONE PutRecords request
  *  - '''aggregation''' (KPL `AggregationEnabled`, reference.conf:57-92):
  *    per-key-routing-irrelevant sub-record packing happens ABOVE this
  *    layer (ShardServiceAsyncClient's buffers); this client ships each
  *    event as one PutRecords entry — compose them by feeding aggregated
  *    blobs as events
  *  - '''partial-failure retry''' (the KPL retry loop): a PutRecords
  *    response carrying per-entry `ErrorCode`s re-sends ONLY the failed
  *    entries, with the transport's exponential backoff, until each
  *    record's age exceeds `recordTtl` (KPL `RecordTtl` →
  *    [[RecordExpiredException]]). With `failIfThrottled` (KPL
  *    `FailIfThrottled`) a throttled entry fails immediately via
  *    [[ProducerThrottledException]] instead of retrying.
  *
  * Per-record completion callbacks fire at flush with the outcome of
  * the entry that carried the record — the sink's ack-counting drain
  * (S11) works unchanged over the wire.
  */
final class HttpRecordClient(
    service: HttpShardService,
    collectionMaxCount: Int = 500,
    collectionMaxSize: Int = 5242880,
    recordTtlMs: Long = 30000L,
    failIfThrottled: Boolean = false,
    maxFlushRetries: Int = 8,
    backoffBaseMs: Long = 10L,
    sleeper: Long => Unit = Thread.sleep,
    clock: () => Long = System.currentTimeMillis) extends AsyncRecordClient {

  private final case class Pending(event: ProducerEvent,
      onComplete: Option[Throwable] => Unit, enqueuedAt: Long) {
    // WIRE bytes (UTF-8), not UTF-16 chars — a multibyte partition key
    // must count its encoded size toward the request bound
    def wireBytes: Long = event.data.length.toLong +
      event.partitionKey.getBytes("UTF-8").length
  }

  private val buffer = mutable.ArrayBuffer.empty[Pending]
  private var bufferBytes = 0L

  override def put(event: ProducerEvent)(
      onComplete: Option[Throwable] => Unit): Unit = this.synchronized {
    val p = Pending(event, onComplete, clock())
    if (buffer.nonEmpty && bufferBytes + p.wireBytes > collectionMaxSize) {
      // size bound: ship BEFORE overflowing (KPL behavior). If the
      // flush fails, THIS record was never attempted — it must still
      // complete (with the failure) or an ack-counting drain (S11)
      // would wait for a callback that never comes.
      try flush()
      catch { case e: Throwable => onComplete(Some(e)); throw e }
    }
    buffer += p
    bufferBytes += p.wireBytes
    if (buffer.size >= collectionMaxCount) flush()
  }

  private def isThrottle(code: String): Boolean =
    code.endsWith("ProvisionedThroughputExceededException") ||
      code.endsWith("ThrottlingException")

  /** Ship the buffered collection; retry failed entries only. */
  private def flush(): Unit = {
    var pending = buffer.toVector
    buffer.clear()
    bufferBytes = 0L
    var attempt = 0
    while (pending.nonEmpty) {
      // a whole-request transport failure (retries exhausted in the
      // wire client, or a non-retryable 4xx) aborts the flush: every
      // still-pending record must complete with the error before the
      // rethrow, or an ack-counting drain (S11) would leak its window
      // permits and wait forever on callbacks that never fire
      val results =
        try service.putRecords(
          pending.map(p => (p.event.partitionKey, p.event.data)))
        catch { case e: Throwable =>
          pending.foreach(_.onComplete(Some(e)))
          throw e
        }
      // producer-side counters (KPL CloudWatch vocabulary): acked
      // records + payload bytes per landed shard, per-entry retries and
      // error codes, and the request count (collection efficiency)
      service.metrics.record("PutRecordsRequests", null, 1L)
      val failed = pending.zip(results).flatMap {
        case (p, Right(shardId)) =>
          service.metrics.record("UserRecordsPut", shardId, 1L)
          service.metrics.record("UserRecordsDataPut", shardId,
            p.event.data.length.toLong)
          p.onComplete(None); None
        case (p, Left(code)) =>
          service.metrics.record("RetriesPerRecord", null, 1L)
          service.metrics.record(s"ErrorsByCode.$code", null, 1L)
          Some((p, code))
      }
      if (failed.isEmpty) return
      // KPL taxonomy: FailIfThrottled fast-fails THROTTLED entries
      // only; a transient non-throttle error (InternalFailure) is
      // retried regardless — misclassifying a 500 as throttling would
      // drop data one retry would have delivered.
      if (failIfThrottled && failed.exists(f => isThrottle(f._2))) {
        val throttled = failed.filter(f => isThrottle(f._2))
        val e = new ProducerThrottledException(
          s"${throttled.size} record(s) throttled " +
            s"(fail-if-throttled; first: ${throttled.head._2})")
        failed.foreach(_._1.onComplete(Some(e)))
        throw e
      }
      val now = clock()
      val (expired, alive) =
        failed.partition { case (p, _) => now - p.enqueuedAt >= recordTtlMs }
      expired.foreach { case (p, code) =>
        p.onComplete(Some(new RecordExpiredException(
          s"record expired after ${now - p.enqueuedAt} ms in the " +
            s"PutRecords retry loop (recordTtl=$recordTtlMs ms, " +
            s"last error $code)")))
      }
      attempt += 1
      if (attempt > maxFlushRetries) {
        val codes = alive.map(_._2).distinct.mkString(", ")
        val msg = s"PutRecords still failing ${alive.size} record(s) " +
          s"after $maxFlushRetries retries (codes: $codes)"
        val e: RuntimeException =
          if (alive.exists(f => isThrottle(f._2)))
            new ProducerThrottledException(msg)
          else new RuntimeException(msg)
        alive.foreach(_._1.onComplete(Some(e)))
        throw e
      }
      if (alive.nonEmpty) sleeper(backoffBaseMs << (attempt - 1))
      pending = alive.map(_._1)
    }
  }

  /** Ship the buffered collection now (the writer's pre-drain hook). */
  override def flushPending(): Unit = this.synchronized { flush() }

  /** Drain (KinesisProducer.stop flushSync analogue, reference
    * main/producer/KinesisProducer.scala:159-163). */
  override def close(): Unit = this.synchronized { flush() }
}

object HttpRecordClient {
  /** Serializable factory: each partition writer reconstructs its own
    * HTTP client from the self-describing `http|endpoint|stream[|params]`
    * id (no JVM-local registry registration needed — the deployment
    * shape for a real cluster; params carry retry backoff and the
    * SigV4 signing block, see
    * [[graft.sources.ShardServiceRegistry.httpId]]). */
  final case class Factory(
      serviceId: String,
      collectionMaxCount: Int = 500,
      collectionMaxSize: Int = 5242880,
      recordTtlMs: Long = 30000L,
      failIfThrottled: Boolean = false) extends AsyncRecordClientFactory {
    override def create(): AsyncRecordClient = {
      val svc = graft.sources.ShardServiceRegistry.get(serviceId) match {
        case h: HttpShardService => h
        case other => throw new IllegalStateException(
          // redacted: the raw id may carry SigV4 secrets in its params
          s"id ${graft.sources.ShardServiceRegistry.redactId(serviceId)} " +
            s"resolved to a non-wire service: $other")
      }
      new HttpRecordClient(svc,
        collectionMaxCount, collectionMaxSize, recordTtlMs, failIfThrottled)
    }
  }

  /** Factory honoring the producer config's KPL collection block. */
  def factoryFor(conf: graft.config.ProducerConf,
      serviceId: String): Factory =
    Factory(serviceId, conf.collectionMaxCount,
      conf.collectionMaxSize, conf.recordTtl.toMillis, conf.failIfThrottled)
}
