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
}
