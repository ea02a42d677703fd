package graft.sinks

/** Producer-side rate cap — the analogue of the reference's KPL
  * `RateLimit` setting (reference src/main/resources/reference.conf:283-301:
  * a percentage of the shard backend limit, default 150%). The cap is
  * expressed as records/second per TARGET SHARD within one writer task
  * (see [[ShardRateLimiters]]); this class is the single token bucket
  * backing one (writer, shard) pair.
  *
  * Token bucket with continuous refill and a small burst allowance (1/20 s
  * of the rate) so steady-state throughput lands on the cap without
  * letting a replay burst through a whole second of quota at once — a
  * user replaying history into a provisioned stream is exactly the case
  * this protects. `acquire()` blocks the producing thread, which is the
  * correct Spark backpressure: the task simply produces no faster than
  * the cap, and upstream stages stall with it.
  */
final class RateLimiter(ratePerSec: Double) {
  require(ratePerSec > 0, s"rate limit must be positive; got $ratePerSec")

  private val capacity = math.max(1.0, ratePerSec / 20.0)
  // start with a single permit, not a full bucket: no credit accrues for
  // time before the writer opened, so measured throughput sits on the cap
  // from the first second instead of overshooting by one burst width
  private var allowance = 1.0
  private var last = System.nanoTime()

  /** Non-blocking probe: take a permit iff one is available right now —
    * the KPL `FailIfThrottled` admission (a record the cap cannot admit
    * immediately fails instead of waiting). */
  def tryAcquire(): Boolean = synchronized {
    val now = System.nanoTime()
    allowance = math.min(capacity,
      allowance + (now - last) * 1e-9 * ratePerSec)
    last = now
    if (allowance >= 1.0) { allowance -= 1.0; true } else false
  }

  /** Block until one send permit is available. */
  def acquire(): Unit = synchronized {
    while (true) {
      val now = System.nanoTime()
      allowance = math.min(capacity,
        allowance + (now - last) * 1e-9 * ratePerSec)
      last = now
      if (allowance >= 1.0) { allowance -= 1.0; return }
      // sleep just long enough for the next token (>= 1 ms granularity)
      val waitMs = (((1.0 - allowance) / ratePerSec) * 1e3).toLong
      Thread.sleep(math.max(1L, waitMs))
    }
  }
}

/** Per-target-shard token buckets for one writer task — the reference's
  * KPL `RateLimit` contract is a percentage of the SHARD backend limit
  * (reference.conf:283-301), enforced independently per shard inside each
  * producer instance. Keying by target shard means two hot keys that both
  * route to one shard share that shard's quota, while traffic to other
  * shards is admitted from its own bucket — exactly KPL's per-shard
  * limiter behavior within one KPL instance.
  *
  * Aggregate math across tasks (document, don't hide): with N concurrent
  * writer tasks the worst-case admission for one shard is N × rate —
  * same as N independent KPL instances, where `RateLimit` is likewise a
  * per-instance spike-smoother (deliberately loose at 150% by default)
  * and service-side throttling + retry is the hard backstop. For a hard
  * aggregate bound, configure `rate-limit-per-shard` as
  * shardLimit / expectedWriterTasks; when the upstream is repartitioned
  * by partition key, each shard receives from a bounded task set and the
  * configured rate applies directly.
  *
  * A transport that cannot expose routing ([[AsyncRecordClient.targetShard]]
  * = None) degrades to one shared bucket per writer task — the pre-keying
  * behavior, documented as per-writer semantics.
  */
final class ShardRateLimiters(ratePerSec: Double) {
  private val buckets =
    scala.collection.concurrent.TrieMap.empty[String, RateLimiter]

  /** Block until the target shard's bucket admits one record. */
  def acquire(targetShard: Option[String]): Unit =
    buckets.getOrElseUpdate(targetShard.getOrElse(""),
      new RateLimiter(ratePerSec)).acquire()

  /** Non-blocking probe on the target shard's bucket (`FailIfThrottled`). */
  def tryAcquire(targetShard: Option[String]): Boolean =
    buckets.getOrElseUpdate(targetShard.getOrElse(""),
      new RateLimiter(ratePerSec)).tryAcquire()
}

/** A record the per-shard rate cap could not admit immediately, under
  * producer `fail-if-throttled=true` — KPL `FailIfThrottled`
  * (reference main/producer/KinesisProducerConfig.scala:43). */
final class ProducerThrottledException(msg: String)
    extends RuntimeException(msg)

/** A record that waited at the admission gates (rate cap + in-flight
  * window) past producer `record-ttl-millis` — KPL `RecordTtl`
  * (reference main/producer/KinesisProducerConfig.scala:56): stale
  * records fail rather than going onto the wire. */
final class RecordExpiredException(msg: String)
    extends RuntimeException(msg)

/** KPL-style pre-send admission shared by both sink paths
  * ([[GraftSinkWriter]] and the DSv2 [[GraftKinesisWriteSupport]]):
  * per-shard rate cap (blocking, or fail-fast when `fail-if-throttled`),
  * then the bounded in-flight window, then the record-TTL check on the
  * total time spent waiting. */
object ProducerAdmission {
  def admit(conf: graft.config.ProducerConf,
      rateLimiter: ShardRateLimiters,
      window: java.util.concurrent.Semaphore,
      targetShard: => Option[String]): Unit = {
    val t0 = System.nanoTime()
    if (rateLimiter != null) {
      if (conf.failIfThrottled) {
        if (!rateLimiter.tryAcquire(targetShard))
          throw new ProducerThrottledException(
            "record throttled by rate-limit-per-shard " +
              s"(${conf.rateLimitPerShard.getOrElse(0.0)} rec/s) with " +
              "fail-if-throttled=true")
      } else rateLimiter.acquire(targetShard)
    }
    window.acquire() // backpressure at maxOutstandingRequests
    val waitedNanos = System.nanoTime() - t0
    if (waitedNanos > conf.recordTtl.toNanos) {
      window.release()
      throw new RecordExpiredException(
        f"record expired after ${waitedNanos / 1e9}%.1f s at the " +
          s"admission gates (record-ttl ${conf.recordTtl})")
    }
  }
}
