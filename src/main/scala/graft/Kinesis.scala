package graft

import graft.config.{ConsumerConf, ProducerConf}
import graft.models.ConsumerEvent
import graft.sinks.{AsyncRecordClientFactory, GraftSinkWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** User-facing facade — the Spark counterpart of the reference's
  * `Kinesis.source(name)` / `Kinesis.sink(name)` entry points
  * (reference main/stream/Kinesis.scala:47-151,169-202): resolve a named
  * config block (with default fallback), wire the source/sink, return the
  * composable Spark object. A reference user's
  * `Kinesis.source("my-consumer")` becomes
  * `Kinesis.source(spark, options, "my-consumer")`.
  */
object Kinesis {

  /** Streaming envelope source for the named consumer config. */
  def source(spark: SparkSession, options: Map[String, String],
      name: String): DataFrame = {
    val conf = ConsumerConf.fromOptions(options, name)
    var reader = spark.readStream.format("graft-kinesis")
      .option("max-records-per-shard", conf.maxRecords.toString)
      .option("initial-position", initialPositionString(conf))
    options.get(s"consumer.$name.service.id")
      .orElse(options.get("consumer.default.service.id"))
      .foreach(id => reader = reader.option("service.id", id))
    reader.load()
  }

  private def initialPositionString(conf: ConsumerConf): String =
    conf.initialPosition match {
      case config.InitialPosition.TrimHorizon => "TRIM_HORIZON"
      case config.InitialPosition.Latest => "LATEST"
      case config.InitialPosition.AtTimestamp(ms) => s"AT_TIMESTAMP:$ms"
    }

  /** Typed view of the envelope (the reference's `ConsumerEvent` level:
    * `Dataset[ConsumerEvent]` with `payloadAsString` available on rows).
    */
  def typed(envelope: DataFrame): Dataset[ConsumerEvent] = {
    val spark = envelope.sparkSession
    import spark.implicits._
    envelope.select(
      col("streamName"), col("shardId"), col("partitionKey"),
      col("seqNo"), col("subSeqNo"), col("data"), col("approxArrivalTs"))
      .as[ConsumerEvent]
  }

  /** Streaming sink writer for the named producer config: rows must have
    * (partitionKey: string, data: binary). */
  def sink(df: DataFrame, options: Map[String, String], name: String,
      clientFactory: AsyncRecordClientFactory): DataStreamWriter[org.apache.spark.sql.Row] = {
    val conf = ProducerConf.fromOptions(options, name)
    df.writeStream.foreach(new GraftSinkWriter(clientFactory, conf))
  }

  /** The reference's `mapAsync` stage (S7, reference
    * main/stream/KinesisSourceGraphStage.scala:109-115: async transform
    * with bounded in-flight futures, emitting IN INPUT ORDER so the
    * commit identity of each element survives the transform).
    *
    * Spark form: `mapPartitions` with a sliding window of at most
    * `parallelism` outstanding futures per partition — up to
    * `parallelism` calls to `f` run concurrently while results are
    * emitted strictly in input order (mapAsync, not mapAsyncUnordered).
    * Pair it with an envelope-typed input
    * (`boundedMapAsync(Kinesis.typed(env), 8)(e => Future(...)(ec))`
    * returning `(e.shardId, e.seqNo, result)`) and the (shardId, seqNo)
    * commit identity rides through a type-changing async transform, which
    * is exactly what the reference's map/mapAsync on `CommittableEvent`
    * guarantees.
    *
    * `f` must be serializable and create/obtain its ExecutionContext on
    * the executor (pass a lazy/static one, not a driver-captured pool).
    */
  def boundedMapAsync[T, U: org.apache.spark.sql.Encoder](
      ds: Dataset[T], parallelism: Int)(
      f: T => scala.concurrent.Future[U]): Dataset[U] = {
    require(parallelism >= 1, s"parallelism must be >= 1; got $parallelism")
    ds.mapPartitions { it =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val inFlight = scala.collection.mutable.Queue.empty[Future[U]]
      new Iterator[U] {
        private def fill(): Unit =
          while (inFlight.size < parallelism && it.hasNext)
            inFlight.enqueue(f(it.next()))
        fill()
        override def hasNext: Boolean = inFlight.nonEmpty
        override def next(): U = {
          val r = Await.result(inFlight.dequeue(), Duration.Inf)
          fill()
          r
        }
      }
    }
  }
}
