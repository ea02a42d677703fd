package graft.models

import java.nio.charset.{Charset, StandardCharsets}
import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Record identity: a Kinesis-style compound sequence number. Sequence
  * numbers are 38-digit decimals (beyond Long range); sub-sequence numbers
  * disambiguate producer-aggregated records sharing one sequence number.
  *
  * The reference compares these by *string concatenation*
  * (reference main/models/ConsumerEvent.scala:29-39), which is only correct
  * while the sequence strings have equal length — here ordering is numeric
  * `(BigInt, Long)`, engineering the length hazard out while preserving the
  * semantics for all real data (SURVEY.md §1.2).
  */
final case class CompoundSequenceNumber(seqNo: BigInt, subSeqNo: Long) {
  def isAfter(o: CompoundSequenceNumber): Boolean =
    CompoundSequenceNumber.ordering.compare(this, o) > 0
}

object CompoundSequenceNumber {
  implicit val ordering: Ordering[CompoundSequenceNumber] =
    Ordering.by(c => (c.seqNo, c.subSeqNo))
  def apply(seqNo: String, subSeqNo: Long): CompoundSequenceNumber =
    CompoundSequenceNumber(BigInt(seqNo), subSeqNo)
}

/** A consumed record: the envelope around an opaque binary payload
  * (reference main/models/ConsumerEvent.scala:50-62). `payloadAsString`
  * mirrors the reference's sole decode helper (`:54-61`); richer decoding
  * (from_json / from_csv / cast) happens in DataFrame space.
  */
final case class ConsumerEvent(
    streamName: String,
    shardId: String,
    partitionKey: Option[String],
    seqNo: BigInt,
    subSeqNo: Long,
    data: Array[Byte],
    approxArrivalTs: Timestamp) {
  def sequenceNumber: CompoundSequenceNumber =
    CompoundSequenceNumber(seqNo, subSeqNo)
  def payloadAsString(charset: Charset = StandardCharsets.UTF_8): String =
    new String(data, charset)
}

/** A record to produce: partition key (shard routing unit — records with
  * equal keys preserve order) + opaque payload
  * (reference main/models/ProducerEvent.scala:22-37).
  *
  * `dedupId` is an OPT-IN extension beyond the reference (which is
  * at-least-once and fails fast on send errors,
  * main/stream/KinesisSinkGraphStage.scala:138-143): a caller-supplied
  * idempotency key the transport may use to drop re-sends after a task
  * retry (SURVEY.md §7.3.5 "offer idempotent-producer option").
  */
final case class ProducerEvent(partitionKey: String, data: Array[Byte],
    dedupId: Option[String] = None)

object ProducerEvent {
  def apply(partitionKey: String, payload: String): ProducerEvent =
    ProducerEvent(partitionKey, payload.getBytes(StandardCharsets.UTF_8))
}

/** Canonical ingest envelope schema (SURVEY.md §1.3 / FIXTURES.md §1) —
  * the row shape every source in this engine emits.
  */
object Envelope {
  val schema: StructType = StructType(Seq(
    StructField("streamName", StringType, nullable = false),
    StructField("shardId", StringType, nullable = false),
    StructField("partitionKey", StringType, nullable = true),
    StructField("seqNo", DecimalType(38, 0), nullable = false),
    StructField("subSeqNo", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false),
    StructField("approxArrivalTs", TimestampType, nullable = false)))
}
