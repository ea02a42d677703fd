package graft.config

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

/** Config fallback-merge semantics (FIXTURES.md §6; reference
  * test/consumer/KinesisConsumerSpec.scala:60-113 and ProducerConfSpec).
  */
class GraftConfigSpec extends AnyFunSuite {

  private val options = Map(
    "consumer.default.stream-name" -> "s",
    "consumer.default.batch-timeout-seconds" -> "10",
    "consumer.some-consumer.stream-name" -> "events",
    "consumer.some-consumer.application-name" -> "app",
    "consumer.some-consumer.failed-message-retries" -> "2",
    "producer.default.stream-name" -> "out",
    "producer.p1.max-outstanding-requests" -> "10")

  test("named block overrides default block; defaults survive the merge") {
    val c = ConsumerConf.fromOptions(options, "some-consumer")
    assert(c.streamName == "events")          // named override
    assert(c.batchTimeout == 10.seconds)      // from default block
    assert(c.failedMessageRetries == 2)       // named override
    // untouched reference defaults (reference.conf:412-487)
    assert(c.failureTolerancePercentage == 0.25)
    assert(c.maxRecords == 10000)
    assert(c.checkpointInterval == 2.seconds)
    assert(c.initialPosition == InitialPosition.TrimHorizon)
    assert(c.shutdownTimeout == 25.seconds)
  }

  test("checkpoint namespace is <application>-<stream>") {
    val c = ConsumerConf.fromOptions(options, "some-consumer")
    assert(c.checkpointNamespace == "app-events")
  }

  test("allowed failures = floor(pct/100 * batchSize)") {
    val c = ConsumerConf("s", "a", failureTolerancePercentage = 0.25)
    assert(c.allowedFailures(500) == 1)   // reference default: 1 per 500
    assert(c.allowedFailures(400) == 1)
    assert(c.allowedFailures(399) == 0)   // floor, not round
    val z = ConsumerConf("s", "a", failureTolerancePercentage = 0.0)
    assert(z.allowedFailures(1000000) == 0)
  }

  test("producer conf merge + defaults") {
    val p = ProducerConf.fromOptions(options, "p1")
    assert(p.streamName == "out")
    assert(p.maxOutstandingRequests == 10)
    assert(p.throttlingRetry == 100.millis)
    assert(p.failFast)
    assert(p.drainTimeout == 30.seconds) // default
    val p2 = ProducerConf.fromOptions(
      options + ("producer.p1.drain-timeout-seconds" -> "5"), "p1")
    assert(p2.drainTimeout == 5.seconds)
  }

  test("KPL transport-independent fields: RecordTtl / FailIfThrottled / " +
      "AggregationMaxSize defaults match the reference and parse from " +
      "options (KinesisProducerConfig.scala:27-171)") {
    val p = ProducerConf.fromOptions(options, "p1")
    assert(p.recordTtl == 30.seconds)      // KPL RecordTtl default 30000 ms
    assert(!p.failIfThrottled)             // KPL default false
    assert(p.aggregationMaxSize == 51200)  // KPL default 51200 B
    val p2 = ProducerConf.fromOptions(options ++ Map(
      "producer.p1.record-ttl-millis" -> "2500",
      "producer.p1.fail-if-throttled" -> "true",
      "producer.p1.aggregation-max-size" -> "1024"), "p1")
    assert(p2.recordTtl == 2500.millis)
    assert(p2.failIfThrottled)
    assert(p2.aggregationMaxSize == 1024)
  }

  test("initial position parsing") {
    assert(InitialPosition.parse("latest") == InitialPosition.Latest)
    assert(InitialPosition.parse("TRIM_HORIZON") == InitialPosition.TrimHorizon)
    assert(InitialPosition.parse("AT_TIMESTAMP:1700000000000") ==
      InitialPosition.AtTimestamp(1700000000000L))
    intercept[IllegalArgumentException](InitialPosition.parse("bogus"))
  }
}
