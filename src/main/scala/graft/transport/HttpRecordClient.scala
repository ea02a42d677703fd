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
    def wireBytes: Long =
      event.data.length.toLong + event.partitionKey.length
  }

  private val buffer = mutable.ArrayBuffer.empty[Pending]
  private var bufferBytes = 0L

  override def put(event: ProducerEvent)(
      onComplete: Option[Throwable] => Unit): Unit = this.synchronized {
    val p = Pending(event, onComplete, clock())
    if (buffer.nonEmpty && bufferBytes + p.wireBytes > collectionMaxSize)
      flush() // size bound: ship BEFORE overflowing (KPL behavior)
    buffer += p
    bufferBytes += p.wireBytes
    if (buffer.size >= collectionMaxCount) flush()
  }

  /** Ship the buffered collection; retry failed entries only. */
  private def flush(): Unit = {
    var pending = buffer.toVector
    buffer.clear()
    bufferBytes = 0L
    var attempt = 0
    while (pending.nonEmpty) {
      val results = service.putRecords(
        pending.map(p => (p.event.partitionKey, p.event.data)))
      val failed = pending.zip(results).flatMap {
        case (p, Right(_)) => p.onComplete(None); None
        case (p, Left(code)) => Some((p, code))
      }
      if (failed.isEmpty) return
      if (failIfThrottled) {
        val e = new ProducerThrottledException(
          s"${failed.size} record(s) throttled " +
            s"(fail-if-throttled; first: ${failed.head._2})")
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
        val e = new ProducerThrottledException(
          s"PutRecords still failing ${alive.size} record(s) after " +
            s"$maxFlushRetries retries")
        alive.foreach(_._1.onComplete(Some(e)))
        throw e
      }
      if (alive.nonEmpty) sleeper(backoffBaseMs << (attempt - 1))
      pending = alive.map(_._1)
    }
  }

  /** Drain (KinesisProducer.stop flushSync analogue, reference
    * main/producer/KinesisProducer.scala:159-163). */
  override def close(): Unit = this.synchronized { flush() }
}

object HttpRecordClient {
  /** Serializable factory: each partition writer builds its own HTTP
    * client from the endpoint (no JVM-local registry needed — the
    * deployment shape for a real cluster). */
  final case class Factory(
      endpoint: String,
      streamName: String,
      collectionMaxCount: Int = 500,
      collectionMaxSize: Int = 5242880,
      recordTtlMs: Long = 30000L,
      failIfThrottled: Boolean = false) extends AsyncRecordClientFactory {
    override def create(): AsyncRecordClient =
      new HttpRecordClient(new HttpShardService(endpoint, streamName),
        collectionMaxCount, collectionMaxSize, recordTtlMs, failIfThrottled)
  }

  /** Factory honoring the producer config's KPL collection block. */
  def factoryFor(conf: graft.config.ProducerConf,
      endpoint: String): Factory =
    Factory(endpoint, conf.streamName, conf.collectionMaxCount,
      conf.collectionMaxSize, conf.recordTtl.toMillis, conf.failIfThrottled)
}
