package graft.config

import scala.concurrent.duration._

/** Typed configuration with the reference's fallback-merge semantics: a
  * per-name option block overlaid on a default block
  * (reference main/consumer/KinesisConsumer.scala:60-101,
  * main/producer/ProducerConf.scala:53-86). Spark-style: everything is a
  * flat options map (`spark.readStream.option(...)`), keys
  * `<scope>.default.<key>` overridden by `<scope>.<name>.<key>`.
  */
object OptionsMerge {
  def resolve(options: Map[String, String], scope: String, name: String)
      : Map[String, String] = {
    val defaults = prefixed(options, s"$scope.default.")
    val named = prefixed(options, s"$scope.$name.")
    defaults ++ named
  }
  private def prefixed(m: Map[String, String], p: String) =
    m.collect { case (k, v) if k.startsWith(p) => k.drop(p.length) -> v }
}

/** Consumer-side worker semantics, defaults per the reference's
  * reference.conf (main/resources/reference.conf:412-487, SURVEY.md §2.1
  * "Key numeric semantics").
  */
final case class ConsumerConf(
    streamName: String,
    applicationName: String,
    batchTimeout: FiniteDuration = 10.seconds,
    failedMessageRetries: Int = 1,
    failureTolerancePercentage: Double = 0.25,
    maxRecords: Int = 10000,
    checkpointInterval: FiniteDuration = 2.seconds,
    checkpointBackoff: FiniteDuration = 3.seconds,
    initialPosition: InitialPosition = InitialPosition.TrimHorizon,
    shutdownTimeout: FiniteDuration = 25.seconds,
    /** KCL `retryGetRecordsInSeconds` (reference
      * main/resources/reference.conf:666-675, unset by default): time
      * between GetRecords retries on transport failure — the wire
      * client's backoff base, carried to partition readers inside the
      * self-describing service id ([[graft.sources.ShardServiceRegistry
      * .httpId]]). None = the transport default (100 ms). */
    retryGetRecords: Option[FiniteDuration] = None) {

  /** DynamoDB-table-name rule kept as the checkpoint namespace
    * (reference main/consumer/KinesisConsumer.scala:71-74). */
  def checkpointNamespace: String = s"$applicationName-$streamName"

  /** Allowed in-batch failures: floor(pct/100 * batchSize)
    * (reference main/consumer/ConsumerWorker.scala:525-527). */
  def allowedFailures(batchSize: Long): Long =
    ((failureTolerancePercentage / 100.0) * batchSize).toLong
}

sealed trait InitialPosition
object InitialPosition {
  case object TrimHorizon extends InitialPosition
  case object Latest extends InitialPosition
  final case class AtTimestamp(epochMillis: Long) extends InitialPosition

  def parse(s: String): InitialPosition = s.trim.toUpperCase match {
    case "TRIM_HORIZON" => TrimHorizon
    case "LATEST" => Latest
    case ts if ts.startsWith("AT_TIMESTAMP:") =>
      AtTimestamp(ts.stripPrefix("AT_TIMESTAMP:").toLong)
    case other => throw new IllegalArgumentException(
      s"unknown initial position: $other")
  }
}

/** Producer-side config (reference main/producer/ProducerConf.scala:40-41,
  * main/stream/Kinesis.scala:192-202: default 1000 outstanding,
  * retry delay 100 ms).
  */
final case class ProducerConf(
    streamName: String,
    maxOutstandingRequests: Int = 1000,
    throttlingRetry: FiniteDuration = 100.millis,
    aggregationEnabled: Boolean = true,
    aggregationMaxCount: Int = 500,
    failFast: Boolean = true,
    /** Ack-drain budget on writer close — the analogue of the reference's
      * graceful shutdown timeout (main/resources/reference.conf:432-438). */
    drainTimeout: FiniteDuration = 30.seconds,
    /** Opt-in idempotent producer (SURVEY §7.3.5 extension): name of the
      * row column whose value becomes the record's dedup id; task
      * retries re-sending the same ids are dropped at the transport. */
    idempotencyColumn: Option[String] = None,
    /** Opt-in producer rate cap in records/second per writer task — the
      * reference's KPL `RateLimit` (reference.conf:283-301, a % of the
      * shard backend limit) re-expressed as an absolute per-task cap.
      * None = uncapped (the in-flight window is then the only brake). */
    rateLimitPerShard: Option[Double] = None,
    /** KPL `RecordTtl` (reference main/producer/KinesisProducerConfig
      * .scala:56, default 30 s): a record still waiting at the admission
      * gates (rate cap + in-flight window) past this deadline EXPIRES
      * and fails the task instead of going stale onto the wire. Buffered
      * aggregation wait is separately bounded by the per-micro-batch
      * writer lifecycle (see PARITY.md RecordMaxBufferedTime row). */
    recordTtl: FiniteDuration = 30.seconds,
    /** KPL `FailIfThrottled` (KinesisProducerConfig.scala:43, default
      * false): when true, a record the per-shard rate cap cannot admit
      * immediately fails at once instead of waiting for a token. */
    failIfThrottled: Boolean = false,
    /** KPL `AggregationMaxSize` (reference.conf:77-91, default 51200 B):
      * byte bound on one aggregated wire record — the shard buffer
      * flushes before a record that would push it past this size. */
    aggregationMaxSize: Int = 51200,
    /** KPL `CollectionMaxCount` (reference.conf:101, default 500): max
      * wire records batched into one PutRecords request at the
      * transport flush layer ([[graft.transport.HttpRecordClient]]). */
    collectionMaxCount: Int = 500,
    /** KPL `CollectionMaxSize` (reference.conf:114, default 5242880 B):
      * byte bound on one PutRecords request — the collection buffer
      * flushes before an entry that would push it past this size. */
    collectionMaxSize: Int = 5242880)

object ConsumerConf {
  /** Build from an options map with default/named fallback merge. */
  def fromOptions(options: Map[String, String], name: String): ConsumerConf = {
    val o = OptionsMerge.resolve(options, "consumer", name)
    val stream = o.getOrElse("stream-name",
      throw new IllegalArgumentException("consumer stream-name required"))
    val app = o.getOrElse("application-name", name)
    val base = ConsumerConf(stream, app)
    base.copy(
      batchTimeout = o.get("batch-timeout-seconds")
        .map(_.toInt.seconds).getOrElse(base.batchTimeout),
      failedMessageRetries = o.get("failed-message-retries")
        .map(_.toInt).getOrElse(base.failedMessageRetries),
      failureTolerancePercentage = o.get("failure-tolerance-percentage")
        .map(_.toDouble).getOrElse(base.failureTolerancePercentage),
      maxRecords = o.get("max-records").map(_.toInt).getOrElse(base.maxRecords),
      checkpointInterval = o.get("checkpoint-interval-millis")
        .map(_.toLong.millis).getOrElse(base.checkpointInterval),
      checkpointBackoff = o.get("checkpoint-backoff-millis")
        .map(_.toLong.millis).getOrElse(base.checkpointBackoff),
      initialPosition = o.get("initial-position")
        .map(InitialPosition.parse).getOrElse(base.initialPosition),
      shutdownTimeout = o.get("shutdown-timeout-seconds")
        .map(_.toInt.seconds).getOrElse(base.shutdownTimeout),
      retryGetRecords = o.get("retry-get-records-seconds")
        .map(_.toInt.seconds).orElse(base.retryGetRecords))
  }
}

object ProducerConf {
  def fromOptions(options: Map[String, String], name: String): ProducerConf = {
    val o = OptionsMerge.resolve(options, "producer", name)
    val stream = o.getOrElse("stream-name",
      throw new IllegalArgumentException("producer stream-name required"))
    val base = ProducerConf(stream)
    base.copy(
      maxOutstandingRequests = o.get("max-outstanding-requests")
        .map(_.toInt).getOrElse(base.maxOutstandingRequests),
      throttlingRetry = o.get("throttling-retry-millis")
        .map(_.toLong.millis).getOrElse(base.throttlingRetry),
      aggregationEnabled = o.get("aggregation-enabled")
        .map(_.toBoolean).getOrElse(base.aggregationEnabled),
      aggregationMaxCount = o.get("aggregation-max-count")
        .map(_.toInt).getOrElse(base.aggregationMaxCount),
      failFast = o.get("fail-fast").map(_.toBoolean).getOrElse(base.failFast),
      drainTimeout = o.get("drain-timeout-seconds")
        .map(_.toInt.seconds).getOrElse(base.drainTimeout),
      idempotencyColumn = o.get("idempotency-column"),
      rateLimitPerShard = o.get("rate-limit-per-shard").map(_.toDouble),
      recordTtl = o.get("record-ttl-millis")
        .map(_.toLong.millis).getOrElse(base.recordTtl),
      failIfThrottled = o.get("fail-if-throttled")
        .map(_.toBoolean).getOrElse(base.failIfThrottled),
      aggregationMaxSize = o.get("aggregation-max-size")
        .map(_.toInt).getOrElse(base.aggregationMaxSize),
      collectionMaxCount = o.get("collection-max-count")
        .map(_.toInt).getOrElse(base.collectionMaxCount),
      collectionMaxSize = o.get("collection-max-size")
        .map(_.toInt).getOrElse(base.collectionMaxSize))
  }
}
