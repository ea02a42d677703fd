package graft.sinks

/** Producer-side rate cap — the analogue of the reference's KPL
  * `RateLimit` setting (reference src/main/resources/reference.conf:283-301:
  * a percentage of the shard backend limit, default 150%). Here the cap is
  * expressed directly as records/second per writer task (one task writer ≈
  * one producer actor in the reference), configured via the producer
  * option `rate-limit-per-shard`.
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
