package graft.sources

import scala.collection.concurrent.TrieMap

/** Position within a shard: identity of the last-consumed record.
  * Numeric `(BigInt seq, Long sub)` ordering — see
  * [[graft.models.CompoundSequenceNumber]] for why numeric (the reference's
  * string-concat comparison hazard, reference
  * main/models/ConsumerEvent.scala:29-39).
  */
final case class ShardPos(seqNo: BigInt, subSeqNo: Long)

object ShardPos {
  implicit val ordering: Ordering[ShardPos] =
    Ordering.by(p => (p.seqNo, p.subSeqNo))
  /** Below every real position (TRIM_HORIZON start). */
  val Beginning: ShardPos = ShardPos(BigInt(-1), Long.MaxValue)
}

/** One user record inside a (possibly aggregated) wire record. Each
  * sub-record keeps its own partition key, as KPL aggregation does.
  */
final case class SubRecord(partitionKey: String, data: Array[Byte])

/** One wire-level record as fetched from a shard. `subRecords.size > 1`
  * models a producer-aggregated record (KPL aggregation, reference
  * main/resources/reference.conf:57-92): the partition reader deaggregates
  * into sub-records with consecutive `subSeqNo`, mirroring KCL's
  * `UserRecord` handling (reference
  * main/consumer/ConsumerProcessingManager.scala:82-89).
  */
final case class RawShardRecord(
    partitionKey: String,
    seqNo: BigInt,
    arrivalEpochMicros: Long,
    subRecords: Seq[SubRecord])

object RawShardRecord {
  /** Non-aggregated record: one payload, record-level key. */
  def single(partitionKey: String, seqNo: BigInt, arrivalEpochMicros: Long,
      data: Array[Byte]): RawShardRecord =
    RawShardRecord(partitionKey, seqNo, arrivalEpochMicros,
      Seq(SubRecord(partitionKey, data)))
}

/** Deterministic partition-key → shard routing, shared by the producer
  * transport (write side) and the scan's key-based shard pruning (read
  * side). Must stay a single definition: pruning is only sound because
  * both sides compute the identical mapping over the identical shard
  * list order (the analogue of Kinesis' server-side md5 hash-range
  * routing, reference README.md:669-672).
  */
object KeyRouting {
  def shardFor(partitionKey: String, shards: IndexedSeq[String]): String =
    shards(math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(partitionKey), shards.size))
}

/** Pluggable shard transport — the seam where a real Kinesis client
  * (ListShards/GetShardIterator/GetRecords) plugs in. Implementations
  * must be cheap to construct per partition-reader from options; the
  * in-memory implementation below backs tests and local replay.
  */
trait ShardService extends Serializable {
  def streamName: String
  def listShards(): Seq[String]
  /** Position of the last record currently in the shard (LATEST). */
  def latestPosition(shardId: String): ShardPos
  /** Position just before the first record with arrival >= tsMicros. */
  def positionAtTimestamp(shardId: String, tsMicros: Long): ShardPos
  /** Last position reachable from `from` consuming at most `maxRecords`
    * wire records (per-shard admission control, reference `kcl.maxRecords`
    * main/resources/reference.conf:479-482). */
  def positionAfter(shardId: String, from: ShardPos, maxRecords: Int): ShardPos
  /** Ordered records with position in (from, to]. */
  def read(shardId: String, from: ShardPos, to: ShardPos)
      : Iterator[RawShardRecord]
}

/** In-memory shard store: deterministic test/replay twin of a Kinesis
  * stream (localstack analogue of the reference's integration suite,
  * reference it/common/KinesisSuite.scala:147-303). Thread-safe appends;
  * per-shard order preserved.
  */
final class InMemoryShardService(
    override val streamName: String,
    shardIds: Seq[String]) extends ShardService {

  private val shards: Map[String, scala.collection.mutable.ArrayBuffer[RawShardRecord]] =
    shardIds.map(_ -> scala.collection.mutable.ArrayBuffer.empty[RawShardRecord]).toMap

  def append(shardId: String, rec: RawShardRecord): Unit =
    shards(shardId).synchronized { shards(shardId) += rec }

  private val seqGen = new java.util.concurrent.atomic.AtomicLong(0L)
  private val seenKeys: Map[String, scala.collection.mutable.Set[String]] =
    shardIds.map(_ -> scala.collection.mutable.Set.empty[String]).toMap

  /** Producer-side append with service-assigned sequence number —
    * allocation and insertion are atomic under the shard lock, so
    * per-shard order always matches sequence order even with many
    * concurrent writers (as Kinesis itself guarantees).
    *
    * `idempotencyKey`: when present, a key already appended to this
    * shard is silently dropped — the service-side dedup window backing
    * the opt-in idempotent producer (SURVEY.md §7.3.5; a real transport
    * maps this to a server-side token/dedup table).
    */
  def appendAssigned(shardId: String, subRecords: Seq[SubRecord],
      idempotencyKey: Option[String] = None): Unit =
    shards(shardId).synchronized {
      val duplicate = idempotencyKey.exists(k => !seenKeys(shardId).add(k))
      if (!duplicate)
        shards(shardId) += RawShardRecord(subRecords.head.partitionKey,
          BigInt(seqGen.incrementAndGet()),
          System.currentTimeMillis() * 1000L, subRecords)
    }

  override def listShards(): Seq[String] = shardIds

  private def posOf(r: RawShardRecord): ShardPos =
    ShardPos(r.seqNo, (r.subRecords.size - 1).toLong)

  override def latestPosition(shardId: String): ShardPos =
    shards(shardId).synchronized {
      shards(shardId).lastOption.map(posOf).getOrElse(ShardPos.Beginning)
    }

  override def positionAtTimestamp(shardId: String, tsMicros: Long): ShardPos =
    shards(shardId).synchronized {
      val buf = shards(shardId)
      // position of the predecessor of the FIRST record with arrival >=
      // ts: indexWhere, not takeWhile, so an out-of-order arrival later in
      // the shard cannot stop the scan early
      buf.indexWhere(_.arrivalEpochMicros >= tsMicros) match {
        case -1 => buf.lastOption.map(posOf).getOrElse(ShardPos.Beginning)
        case 0 => ShardPos.Beginning
        case i => posOf(buf(i - 1))
      }
    }

  override def positionAfter(shardId: String, from: ShardPos,
      maxRecords: Int): ShardPos =
    shards(shardId).synchronized {
      val after = shards(shardId).iterator
        .filter(r => ShardPos.ordering.gt(posOf(r), from)).take(maxRecords)
      after.foldLeft(from)((_, r) => posOf(r))
    }

  override def read(shardId: String, from: ShardPos, to: ShardPos)
      : Iterator[RawShardRecord] =
    shards(shardId).synchronized {
      shards(shardId).iterator
        .filter { r =>
          val p = posOf(r)
          ShardPos.ordering.gt(p, from) && ShardPos.ordering.lteq(p, to)
        }
        .toVector
    }.iterator
}

/** JVM-local service registry so a Serializable handle (the id string in
  * the options map) can reach partition readers in local/test mode. A
  * cluster deployment instead constructs the client inside each reader
  * from connection options — the [[ShardService]] seam is identical.
  */
object ShardServiceRegistry {
  private val services = TrieMap.empty[String, ShardService]
  def register(service: ShardService): String = {
    val id = java.util.UUID.randomUUID().toString
    services.put(id, service)
    id
  }
  def get(id: String): ShardService =
    services.getOrElse(id,
      throw new IllegalStateException(s"no shard service registered: $id"))
}
